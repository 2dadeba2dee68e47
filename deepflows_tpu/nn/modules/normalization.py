"""LayerNorm (torch semantics; no reference analog — the reference stops at
BatchNorm, `DeepFlows/nn/modules/batchnorm.py`).  Composed entirely from
traceable tape ops (mean/mul/sqrt), so forward AND backward compile into the
whole-step program like every other layer; no running stats (eval == train).
Shipped because the transformer family (`models.VisionTransformer`) and any
user migrating modern recipes needs it."""

from __future__ import annotations

from ... import tensor
from ...backend import Device, default_accelerator
from ..parameter import Parameter
from .module import Module


class LayerNorm(Module):
    def __init__(
        self,
        normalized_shape,
        eps: float = 1e-5,
        elementwise_affine: bool = True,
        device=None,
        dtype=None,
    ) -> None:
        super().__init__()
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = float(eps)
        self.elementwise_affine = elementwise_affine
        self.device = Device(device) if device else default_accelerator()
        if elementwise_affine:
            self.weight = Parameter(
                tensor.ones(self.normalized_shape, dtype=dtype, device=self.device)
            )
            self.bias = Parameter(
                tensor.zeros(self.normalized_shape, dtype=dtype, device=self.device)
            )
        else:
            self.weight = None
            self.bias = None

    def forward(self, x):
        nd = len(self.normalized_shape)
        axes = tuple(range(x.ndim - nd, x.ndim))
        mu = x.mean(axes, True)
        xc = x - mu
        var = (xc * xc).mean(axes, True)  # biased, like torch
        y = xc / (var + self.eps).sqrt()
        if self.weight is not None:
            y = y * self.weight + self.bias
        return y

    def extra_repr(self) -> str:
        return (
            f"{self.normalized_shape}, eps={self.eps}, "
            f"elementwise_affine={self.elementwise_affine}"
        )


class RMSNorm(Module):
    """Root-mean-square LayerNorm (torch.nn.RMSNorm semantics, no centering
    and no bias; no reference analog — shipped for the Llama family,
    `models/llama.py`).  Composed from tape ops like LayerNorm, so forward
    and backward compile into the whole-step program."""

    def __init__(
        self,
        normalized_shape,
        eps: float = 1e-6,
        elementwise_affine: bool = True,
        device=None,
        dtype=None,
    ) -> None:
        super().__init__()
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = float(eps)
        self.elementwise_affine = elementwise_affine
        self.device = Device(device) if device else default_accelerator()
        if elementwise_affine:
            self.weight = Parameter(
                tensor.ones(self.normalized_shape, dtype=dtype, device=self.device)
            )
        else:
            self.weight = None

    def forward(self, x):
        nd = len(self.normalized_shape)
        axes = tuple(range(x.ndim - nd, x.ndim))
        ms = (x * x).mean(axes, True)
        y = x / (ms + self.eps).sqrt()
        if self.weight is not None:
            y = y * self.weight
        return y

    def extra_repr(self) -> str:
        return (
            f"{self.normalized_shape}, eps={self.eps}, "
            f"elementwise_affine={self.elementwise_affine}"
        )


class GroupNorm(Module):
    """GroupNorm (torch semantics): normalise (N, C, *spatial) over each
    group of ``C/num_groups`` channels together with all spatial dims.
    Buffer-free (eval == train) — the norm of choice for pipeline stages
    and batch-size-independent training; composed from traceable tape ops
    like LayerNorm."""

    def __init__(
        self,
        num_groups: int,
        num_channels: int,
        eps: float = 1e-5,
        affine: bool = True,
        device=None,
        dtype=None,
    ) -> None:
        super().__init__()
        if num_channels % num_groups:
            raise ValueError(
                f"num_channels {num_channels} not divisible by "
                f"num_groups {num_groups}"
            )
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = float(eps)
        self.affine = affine
        self.device = Device(device) if device else default_accelerator()
        if affine:
            self.weight = Parameter(
                tensor.ones((num_channels,), dtype=dtype, device=self.device)
            )
            self.bias = Parameter(
                tensor.zeros((num_channels,), dtype=dtype, device=self.device)
            )
        else:
            self.weight = None
            self.bias = None

    def forward(self, x):
        N, C = x.shape[0], x.shape[1]
        spatial = x.shape[2:]
        G = self.num_groups
        xg = x.reshape(N, G, -1)  # (N, G, C/G * prod(spatial))
        mu = xg.mean((2,), True)
        xc = xg - mu
        var = (xc * xc).mean((2,), True)
        y = (xc / (var + self.eps).sqrt()).reshape(x.shape)
        if self.weight is not None:
            shape = (1, C) + (1,) * len(spatial)
            y = y * self.weight.reshape(shape) + self.bias.reshape(shape)
        return y

    def extra_repr(self) -> str:
        return (
            f"{self.num_groups}, {self.num_channels}, eps={self.eps}, "
            f"affine={self.affine}"
        )
