"""AdamW — decoupled weight decay (Loshchilov & Hutter).

No reference analog (the reference stops at Adam, `DeepFlows/optim/adam.py`);
included because reference users migrating real training recipes expect it.
Semantics match ``torch.optim.AdamW``: the decay multiplies the parameter
directly by ``(1 - lr*wd)`` instead of being folded into the gradient, so
the adaptive denominator never sees the decay term.  Same pure traceable
core contract as every other optimizer (state on device, ``lr`` a runtime
scalar, compiled-step safe)."""

from __future__ import annotations

from typing import List

import numpy as np

from ..tensor import Tensor
from .optimizer import Optimizer


class AdamW(Optimizer):
    def __init__(
        self,
        params: List[Tensor],
        lr: float = 1e-3,
        betas=(0.9, 0.999),
        eps: float = 1e-8,
        weight_decay: float = 1e-2,
    ) -> None:
        super().__init__(params)
        self.lr = lr
        self.beta1, self.beta2 = betas
        self.eps = eps
        self.weight_decay = weight_decay

    def init_state(self):
        return {
            "v": self._zeros_like_params(),
            "s": self._zeros_like_params(),
            "t": np.asarray(0, dtype=np.int32),
        }

    def pure_update(self, params, grads, state, lr):
        t = state["t"] + 1
        tf = t.astype(np.float32) if hasattr(t, "astype") else float(t)
        bc1 = 1.0 - self.beta1**tf
        bc2 = 1.0 - self.beta2**tf
        new_params, new_v, new_s = [], [], []
        for p, g, v, s in zip(params, grads, state["v"], state["s"]):
            if g is None:
                new_params.append(p)
                new_v.append(v)
                new_s.append(s)
                continue
            p_dec = p * (1.0 - lr * self.weight_decay) if self.weight_decay else p
            v = v * self.beta1 + g * (1.0 - self.beta1)
            s = s * self.beta2 + g * g * (1.0 - self.beta2)
            update = (v / bc1) / ((s / bc2) ** 0.5 + self.eps) * lr
            new_p = p_dec - update
            if hasattr(new_p, "astype") and new_p.dtype != p.dtype:
                new_p = new_p.astype(p.dtype)
            new_params.append(new_p)
            new_v.append(v)
            new_s.append(s)
        return new_params, {"v": new_v, "s": new_s, "t": t}
