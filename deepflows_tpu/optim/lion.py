"""Lion — EvoLved sign-momentum optimizer (Chen et al. 2023,
"Symbolic Discovery of Optimization Algorithms").

No reference analog; shipped for large-model training recipes: one
momentum slot (half of Adam's state HBM), sign-quantized updates:

    u   = sign(beta1 * m + (1 - beta1) * g)
    p  <- p - lr * (u + weight_decay * p)      (decoupled decay)
    m  <- beta2 * m + (1 - beta2) * g

Differentially tested against a hand numpy twin in
``tests/test_optim_extra.py``.  Same pure traceable core contract as the
other optimizers (`optim/optimizer.py:80-128`)."""

from __future__ import annotations

from typing import List

from ..tensor import Tensor
from .optimizer import Optimizer


def _sign(x):
    # backend-generic sign (works for numpy arrays and jax tracers)
    one = x.dtype.type(1) if hasattr(x.dtype, "type") else 1.0
    return (x > 0) * one - (x < 0) * one


class Lion(Optimizer):
    def __init__(
        self,
        params: List[Tensor],
        lr: float = 1e-4,
        betas=(0.9, 0.99),
        weight_decay: float = 0.0,
    ) -> None:
        super().__init__(params)
        self.lr = lr
        self.beta1, self.beta2 = betas
        self.weight_decay = float(weight_decay)

    def init_state(self):
        return {"m": self._zeros_like_params()}

    def pure_update(self, params, grads, state, lr):
        new_params, new_m = [], []
        for p, g, m in zip(params, grads, state["m"]):
            if g is None:
                new_params.append(p)
                new_m.append(m)
                continue
            gf = g.astype(m.dtype) if g.dtype != m.dtype else g
            u = _sign(m * self.beta1 + gf * (1.0 - self.beta1))
            new_p = p - lr * (u + self.weight_decay * p)
            m = m * self.beta2 + gf * (1.0 - self.beta2)
            if hasattr(new_p, "astype") and new_p.dtype != p.dtype:
                new_p = new_p.astype(p.dtype)
            new_params.append(new_p)
            new_m.append(m)
        return new_params, {"m": new_m}
