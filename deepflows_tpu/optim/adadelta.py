"""Adadelta (reference: `DeepFlows/optim/adadelta.py`).  Same math with
device-resident state; ``lr`` multiplies the update (default 1.0 — identical
behavior to the reference, which omitted the factor)."""

from __future__ import annotations

from typing import List

from ..tensor import Tensor
from .optimizer import Optimizer


class Adadelta(Optimizer):
    def __init__(
        self,
        params: List[Tensor],
        lr: float = 1.0,
        rho: float = 0.9,
        weight_decay: float = 0.0,
        eps: float = 1e-6,
    ) -> None:
        super().__init__(params)
        self.lr = lr
        self.rho = rho
        self.eps = eps
        self.weight_decay = weight_decay

    def init_state(self):
        return {"s": self._zeros_like_params(), "delta": self._zeros_like_params()}

    def pure_update(self, params, grads, state, lr):
        new_params, new_s, new_d = [], [], []
        for p, g, s, d in zip(params, grads, state["s"], state["delta"]):
            if g is None:
                new_params.append(p)
                new_s.append(s)
                new_d.append(d)
                continue
            if self.weight_decay:
                g = g + p * self.weight_decay
            s = self.rho * s + (1 - self.rho) * g * g
            adjust = ((d + self.eps) ** 0.5) * g / (s + self.eps) ** 0.5
            d = self.rho * d + (1 - self.rho) * adjust * adjust
            new_p = p - lr * adjust
            if hasattr(new_p, "astype") and new_p.dtype != p.dtype:
                new_p = new_p.astype(p.dtype)  # preserve param dtype (bf16)
            new_params.append(new_p)
            new_s.append(s)
            new_d.append(d)
        return new_params, {"s": new_s, "delta": new_d}
