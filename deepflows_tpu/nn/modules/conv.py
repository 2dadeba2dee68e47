"""Conv1d / Conv2d (reference: `DeepFlows/nn/modules/conv.py`).

Square kernels with int stride/padding like the reference; ``groups`` and
``dilation=1`` extensions added (the reference supports neither,
`conv.py:30-35` — its "MobileNetV1" substitutes plain convs for depthwise
ones for that reason, `test/MobileNet.py:18-36`).  Weight (out,in/groups,k[,k])
and bias (1,out,1[,1]) shapes match the reference.
"""

from __future__ import annotations

import math

from ... import tensor
from ...backend import Device, default_accelerator
from .. import functional as F
from .. import init
from ..parameter import Parameter
from .module import Module


class _ConvNd(Module):
    _dims = 2

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        stride: int = 1,
        padding: int = 0,
        groups: int = 1,
        bias: bool = True,
        device=None,
        dtype=None,
    ) -> None:
        super().__init__()
        assert in_channels % groups == 0 and out_channels % groups == 0
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.groups = groups
        self.device = Device(device) if device else default_accelerator()
        kshape = (out_channels, in_channels // groups) + (kernel_size,) * self._dims
        self.weight = Parameter(tensor.empty(kshape, dtype=dtype, device=self.device))
        if bias:
            bshape = (1, out_channels) + (1,) * self._dims
            self.bias = Parameter(tensor.empty(bshape, dtype=dtype, device=self.device))
        else:
            self.bias = None
        self.reset_parameters()

    def reset_parameters(self):
        init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        if self.bias is not None:
            fan_in = (self.in_channels // self.groups) * self.kernel_size**self._dims
            bound = 1 / math.sqrt(fan_in) if fan_in > 0 else 0
            init.uniform_(self.bias, -bound, bound)

    def extra_repr(self) -> str:
        s = (
            f"{self.in_channels}, {self.out_channels}, "
            f"kernel_size={self.kernel_size}, stride={self.stride}, "
            f"padding={self.padding}"
        )
        if self.groups != 1:
            s += f", groups={self.groups}"
        if self.bias is None:
            s += ", bias=False"
        return s


class Conv2d(_ConvNd):
    _dims = 2

    def forward(self, x):
        out = F.conv2d(x, self.weight, self.padding, self.stride, self.groups)
        if self.bias is not None:
            out = out + self.bias
        return out


class Conv1d(_ConvNd):
    _dims = 1

    def forward(self, x):
        out = F.conv1d(x, self.weight, self.padding, self.stride, self.groups)
        if self.bias is not None:
            out = out + self.bias
        return out


class WSConv2d(Conv2d):
    """Scaled Weight-Standardized conv (Brock et al. 2021, NF-ResNets) —
    the architectural lever BENCH_NOTES' ResNet50 step-time accounting
    identified: BatchNorm's per-ACTIVATION normalization traffic is 37% of
    the memory-bound train step, while weight standardization normalizes
    per WEIGHT (out-channel mean/var over fan-in, a few thousand FLOPs per
    filter) and so costs nothing at the HBM roofline.

    ``W_hat = gain * gamma * (W - mean) / sqrt(N * var + eps)`` with N the
    fan-in, computed on the tape every forward (standardization must be
    differentiated through, like torch's parametrized WS); ``gamma`` is
    the activation-dependent signal-preserving constant (sqrt(2/(1-1/pi))
    for ReLU) and ``gain`` a learnable per-out-channel scale.

    No reference analog (the reference has only BatchNorm2d,
    `DeepFlows/nn/modules/batchnorm.py`); used by
    ``models.ResNet*(norm="free")``.
    """

    # signal-preserving gain for ReLU: E[relu(x)^2] = 1/2 - 1/(2*pi) ... var
    # of relu(unit gaussian) is (1 - 1/pi)/2; gamma^2 * that = 1/2 per fan-in
    GAMMA_RELU = math.sqrt(2.0 / (1.0 - 1.0 / math.pi))

    def __init__(self, *args, gamma: float = 1.0, eps: float = 1e-4, **kw):
        super().__init__(*args, **kw)
        self.gamma = float(gamma)
        self.eps = float(eps)
        self.gain = Parameter(
            tensor.ones(
                (self.out_channels, 1, 1, 1),
                dtype=self.weight.dtype,
                device=self.device,
            )
        )

    def standardized_weight(self):
        w = self.weight
        fan_in = (self.in_channels // self.groups) * self.kernel_size**2
        mu = w.mean(axis=(1, 2, 3), keepdims=True)
        centered = w - mu
        var = (centered * centered).mean(axis=(1, 2, 3), keepdims=True)
        scale = (var * float(fan_in) + self.eps) ** -0.5
        return centered * (scale * (self.gain * self.gamma))

    def forward(self, x):
        out = F.conv2d(
            x, self.standardized_weight(), self.padding, self.stride,
            self.groups,
        )
        if self.bias is not None:
            out = out + self.bias
        return out
