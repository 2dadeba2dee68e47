"""RMSprop (torch semantics: optional momentum and centered variants).

No reference analog (`DeepFlows/optim/` has SGD/Adam/Adagrad/Adadelta);
included for recipe portability.  Math follows ``torch.optim.RMSprop``:
coupled weight decay on the gradient, ``eps`` added OUTSIDE the sqrt for
the plain variant and inside ``sqrt(avg - g_avg²)+eps``'s denominator
ordering for the centered one (we mirror torch's ``sqrt().add_(eps)``).
Pure traceable core; state lives on device."""

from __future__ import annotations

from typing import List

from ..tensor import Tensor
from .optimizer import Optimizer


class RMSprop(Optimizer):
    def __init__(
        self,
        params: List[Tensor],
        lr: float = 1e-2,
        alpha: float = 0.99,
        eps: float = 1e-8,
        weight_decay: float = 0.0,
        momentum: float = 0.0,
        centered: bool = False,
    ) -> None:
        super().__init__(params)
        self.lr = lr
        self.alpha = alpha
        self.eps = eps
        self.weight_decay = weight_decay
        self.momentum = momentum
        self.centered = centered

    def init_state(self):
        state = {"square_avg": self._zeros_like_params()}
        if self.momentum:
            state["momentum_buf"] = self._zeros_like_params()
        if self.centered:
            state["grad_avg"] = self._zeros_like_params()
        return state

    def pure_update(self, params, grads, state, lr):
        a = self.alpha
        n = len(params)
        sq = state["square_avg"]
        mom = state.get("momentum_buf", [None] * n)
        gav = state.get("grad_avg", [None] * n)
        new_p, new_sq, new_mom, new_gav = [], [], [], []
        for p, g, s, m, ga in zip(params, grads, sq, mom, gav):
            if g is None:
                new_p.append(p)
                new_sq.append(s)
                new_mom.append(m)
                new_gav.append(ga)
                continue
            if self.weight_decay:
                g = g + p * self.weight_decay
            s = s * a + g * g * (1.0 - a)
            if self.centered:
                ga = ga * a + g * (1.0 - a)
                denom = (s - ga * ga) ** 0.5 + self.eps
            else:
                denom = s**0.5 + self.eps
            if self.momentum:
                m = m * self.momentum + g / denom
                step = m * lr
            else:
                step = g / denom * lr
            out = p - step
            if hasattr(out, "astype") and out.dtype != p.dtype:
                out = out.astype(p.dtype)
            new_p.append(out)
            new_sq.append(s)
            new_mom.append(m)
            new_gav.append(ga)
        out_state = {"square_avg": new_sq}
        if self.momentum:
            out_state["momentum_buf"] = new_mom
        if self.centered:
            out_state["grad_avg"] = new_gav
        return new_p, out_state
