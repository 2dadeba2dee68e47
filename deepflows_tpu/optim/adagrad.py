"""Adagrad (reference: `DeepFlows/optim/adagrad.py`).  Same math; state lives
on device (the reference kept numpy-array state, mixing host/device
arithmetic — `adagrad.py:17`, flagged in SURVEY §2.5)."""

from __future__ import annotations

from typing import List

from ..tensor import Tensor
from .optimizer import Optimizer


class Adagrad(Optimizer):
    def __init__(
        self,
        params: List[Tensor],
        lr: float = 1e-2,
        weight_decay: float = 0.0,
        eps: float = 1e-10,
    ) -> None:
        super().__init__(params)
        self.lr = lr
        self.weight_decay = weight_decay
        self.eps = eps

    def init_state(self):
        return {"s": self._zeros_like_params()}

    def pure_update(self, params, grads, state, lr):
        new_params, new_s = [], []
        for p, g, s in zip(params, grads, state["s"]):
            if g is None:
                new_params.append(p)
                new_s.append(s)
                continue
            if self.weight_decay:
                g = g + p * self.weight_decay
            s = s + g * g
            new_p = p - lr * g / (self.eps + s) ** 0.5
            if hasattr(new_p, "astype") and new_p.dtype != p.dtype:
                new_p = new_p.astype(p.dtype)  # preserve param dtype (bf16)
            new_params.append(new_p)
            new_s.append(s)
        return new_params, {"s": new_s}
