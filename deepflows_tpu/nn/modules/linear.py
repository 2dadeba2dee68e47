"""Linear layer (reference: `DeepFlows/nn/modules/linear.py`).

Weight shape is (in_features, out_features) — the reference's convention
(NOT transposed like torch, `linear.py:40`); bias is (1, out_features)
(`linear.py:42`); init is kaiming-uniform(a=√5) with bias bound 1/√fan_in
(`linear.py:48-56`).
"""

from __future__ import annotations

import math

from ... import tensor
from ...backend import Device, default_accelerator
from .. import functional as F
from .. import init
from ..parameter import Parameter
from .module import Module


class Identity(Module):
    """Argument-insensitive pass-through (torch.nn.Identity parity; the
    reference has no analog).  Used by ``nn.fusion.fuse_conv_bn`` to replace
    folded BatchNorm layers without disturbing the parent architecture."""

    def __init__(self, *args, **kwargs) -> None:
        super().__init__()

    def forward(self, input):
        return input


class Linear(Module):
    def __init__(
        self,
        in_features: int,
        out_features: int,
        bias: bool = True,
        device=None,
        dtype=None,
    ) -> None:
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.device = Device(device) if device else default_accelerator()
        self.weight = Parameter(
            tensor.empty((in_features, out_features), dtype=dtype, device=self.device)
        )
        if bias:
            self.bias = Parameter(
                tensor.empty((1, out_features), dtype=dtype, device=self.device)
            )
        else:
            self.bias = None
        self.reset_parameters()

    def reset_parameters(self) -> None:
        init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        if self.bias is not None:
            fan_in = self.in_features
            bound = 1 / math.sqrt(fan_in) if fan_in > 0 else 0
            init.uniform_(self.bias, -bound, bound)

    def forward(self, input):
        return F.linear(input, self.weight, self.bias)

    def extra_repr(self) -> str:
        return (
            f"in_features={self.in_features}, out_features={self.out_features}, "
            f"bias={self.bias is not None}"
        )
