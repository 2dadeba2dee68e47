"""BatchNorm (reference: `DeepFlows/nn/modules/batchnorm.py`).

Matches the reference numerics: biased variance over (N,H,W) per channel
(`batchnorm.py:31-42`), running stats EMA with momentum 0.1 on ``.data``
(`batchnorm.py:44-46`), eval uses running stats.  Divergence (fix): running
stats are REGISTERED buffers, so they appear in state_dict/checkpoints — the
reference stored them as loose Tensors and silently dropped them on save
(`batchnorm.py:24-25`, SURVEY §5).

Under a compiled train step the EMA update is traced: the new stats are
returned as step outputs and written back by the runner (see
deepflows_tpu/jit.py).
"""

from __future__ import annotations

from ... import tensor
from ...autograd import is_grad_enable
from ...backend import BackendTensor, Device, default_accelerator
from ...tensor import Tensor
from ..parameter import Parameter
from .module import Module


class _BatchNormNd(Module):
    _dims = 2  # spatial dims

    def __init__(
        self,
        num_features: int,
        eps: float = 1e-5,
        momentum: float = 0.1,
        affine: bool = True,
        track_running_stats: bool = True,
        device=None,
        dtype=None,
    ) -> None:
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        self.track_running_stats = track_running_stats
        self.device = Device(device) if device else default_accelerator()
        shape = (1, num_features) + (1,) * self._dims
        kwargs = {"device": self.device, "dtype": dtype}
        if affine:
            self.weight = Parameter(tensor.ones(shape, **kwargs))
            self.bias = Parameter(tensor.zeros(shape, **kwargs))
        else:
            self.weight = None
            self.bias = None
        if track_running_stats:
            self.register_buffer("running_mean", tensor.zeros(shape, **kwargs))
            self.register_buffer("running_var", tensor.ones(shape, **kwargs))
        else:
            self.register_buffer("running_mean", None)
            self.register_buffer("running_var", None)

    def forward(self, x: Tensor) -> Tensor:
        from .. import functional as F

        axes = (0,) + tuple(range(2, 2 + self._dims))
        if self.training or not self.track_running_stats:
            # one fused tape node (kernel batchnorm_train/batchnorm_grad)
            out = F.batch_norm(x, self.weight, self.bias, axes, self.eps)
            if self.training and self.track_running_stats:
                m = self.momentum
                dev = x.device
                self.running_mean.data = BackendTensor._wrap(
                    self.running_mean.data.array * (1 - m) + out.batch_mean * m,
                    dev,
                )
                self.running_var.data = BackendTensor._wrap(
                    self.running_var.data.array * (1 - m) + out.batch_var * m,
                    dev,
                )
            return out
        if not (is_grad_enable() and (x.requires_grad or self.affine)):
            # eval fast path: one fused kernel, constant result
            dev = x.device
            w = self.weight.data.array if self.affine else None
            b = self.bias.data.array if self.affine else None
            y = dev.batchnorm_eval(
                x.data.array,
                w,
                b,
                self.running_mean.data.array,
                self.running_var.data.array,
                self.eps,
            )
            return Tensor(BackendTensor._wrap(y, dev), device=dev)
        x_hat = (x - self.running_mean.detach()) / (
            self.running_var.detach() + self.eps
        ) ** 0.5
        if self.affine:
            return x_hat * self.weight + self.bias
        return x_hat

    def extra_repr(self) -> str:
        return (
            f"num_features={self.num_features}, eps={self.eps}, "
            f"momentum={self.momentum}, affine={self.affine}, "
            f"track_running_stats={self.track_running_stats}"
        )


class BatchNorm2d(_BatchNormNd):
    _dims = 2


class BatchNorm1d(_BatchNormNd):
    """BatchNorm over (N,C) or (N,C,L) — extension; the reference only ships
    BatchNorm2d."""

    _dims = 1

    def forward(self, x: Tensor) -> Tensor:
        if x.ndim == 2:
            expanded = x.reshape(x.shape[0], x.shape[1], 1)
            out = super().forward(expanded)
            return out.reshape(x.shape[0], x.shape[1])
        return super().forward(x)
