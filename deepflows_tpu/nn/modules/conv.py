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
