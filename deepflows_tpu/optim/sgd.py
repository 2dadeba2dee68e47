"""SGD with momentum / nesterov / weight decay (reference:
`DeepFlows/optim/sgd.py:16-24`; update math matches, including the
``grad + momentum * v_new`` nesterov form)."""

from __future__ import annotations

from typing import List

from ..tensor import Tensor
from .optimizer import Optimizer


class SGD(Optimizer):
    def __init__(
        self,
        params: List[Tensor],
        lr: float = 1e-2,
        momentum: float = 0.0,
        weight_decay: float = 0.0,
        nesterov: bool = False,
    ) -> None:
        super().__init__(params)
        self.lr = lr
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.nesterov = nesterov

    def init_state(self):
        if self.momentum > 0.0:
            return {"v": self._zeros_like_params()}
        return {"v": None}

    def pure_update(self, params, grads, state, lr):
        new_params, new_v = [], []
        vs = state["v"] if state["v"] is not None else [None] * len(params)
        for p, g, v in zip(params, grads, vs):
            if g is None:
                new_params.append(p)
                new_v.append(v)
                continue
            if self.weight_decay:
                g = g + p * self.weight_decay
            if self.momentum > 0.0:
                v = v * self.momentum + g
                update = g + self.momentum * v if self.nesterov else v
                new_v.append(v)
            else:
                update = g
                new_v.append(None)
            new_p = p - lr * update
            if hasattr(new_p, "astype") and new_p.dtype != p.dtype:
                new_p = new_p.astype(p.dtype)  # preserve param dtype (bf16)
            new_params.append(new_p)
        return new_params, {"v": new_v if self.momentum > 0.0 else None}
