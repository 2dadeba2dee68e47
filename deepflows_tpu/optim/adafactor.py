"""Adafactor — factored second-moment Adam for large-model training
(Shazeer & Stern 2018).

No reference analog (the reference stops at Adam, `DeepFlows/optim/adam.py`);
shipped because it is THE memory-frugal optimizer for big embedding/LM
training: for an (r, c) parameter the second moment is stored as a rank-1
r + c pair instead of r*c — O(n+m) optimizer HBM instead of O(nm).

Semantics match ``torch.optim.Adafactor`` (torch >= 2.5; differentially
tested in ``tests/test_optim_extra.py``):

- ``one_minus_beta2_t = t ** beta2_decay`` (default -0.8),
- ``rho_t = min(lr, 1/sqrt(t))``, ``alpha = max(eps2, RMS(p)) * rho_t``,
- >1-D grads factor over the LAST TWO axes (leading axes are batched):
  row/col mean-square EMAs, ``var = (R @ C) / clamp(mean(R, -2), eps1)``,
- 1-D grads keep a full variance EMA,
- update = ``g * rsqrt(clamp(var, eps1^2))``, clipped by
  ``max(1, RMS(update)/d)``, decoupled weight decay.

Same pure traceable core contract as every other optimizer here (state on
device, ``lr`` a runtime scalar, compiled-step / lazy-mode safe — the whole
update runs as ONE XLA program, `optim/optimizer.py:80-128`).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..tensor import Tensor
from .optimizer import Optimizer


def _rms(x):
    return ((x * x).mean()) ** 0.5


class Adafactor(Optimizer):
    def __init__(
        self,
        params: List[Tensor],
        lr: float = 1e-2,
        beta2_decay: float = -0.8,
        eps: tuple = (None, 1e-3),
        d: float = 1.0,
        weight_decay: float = 0.0,
    ) -> None:
        super().__init__(params)
        if beta2_decay > 0:
            raise ValueError("beta2_decay must be <= 0")
        self.lr = lr
        self.beta2_decay = float(beta2_decay)
        # eps1 None -> float32 machine epsilon (torch: finfo(dtype).eps)
        self.eps1 = float(np.finfo(np.float32).eps if eps[0] is None else eps[0])
        self.eps2 = float(eps[1])
        self.d = float(d)
        self.weight_decay = float(weight_decay)

    def init_state(self):
        rows, cols, variances = [], [], []
        for p in self.params:
            if len(p.shape) > 1:
                rows.append(
                    p.device.fill(p.shape[:-1] + (1,), 0.0, dtype=np.float32)
                )
                cols.append(
                    p.device.fill(
                        p.shape[:-2] + (1, p.shape[-1]), 0.0, dtype=np.float32
                    )
                )
                variances.append(None)
            else:
                rows.append(None)
                cols.append(None)
                variances.append(
                    p.device.fill(p.shape, 0.0, dtype=np.float32)
                )
        return {
            "row": rows,
            "col": cols,
            "var": variances,
            "t": np.asarray(0, dtype=np.int32),
        }

    def pure_update(self, params, grads, state, lr):
        t = state["t"] + 1
        tf = t.astype(np.float32) if hasattr(t, "astype") else np.float32(t)
        w2 = tf**self.beta2_decay  # one_minus_beta2_t
        rho = (1.0 / tf**0.5).clip(max=lr)
        new_params = []
        new_row, new_col, new_var = [], [], []
        for p, g, R, C, V in zip(
            params, grads, state["row"], state["col"], state["var"]
        ):
            if g is None:
                new_params.append(p)
                new_row.append(R)
                new_col.append(C)
                new_var.append(V)
                continue
            gf = g.astype(np.float32) if g.dtype != np.float32 else g
            pf = p.astype(np.float32) if p.dtype != np.float32 else p
            alpha = _rms(pf).clip(min=self.eps2) * rho
            p_dec = pf * (1.0 - lr * self.weight_decay) if self.weight_decay else pf
            g2 = gf * gf
            if len(p.shape) > 1:
                R = R + w2 * (g2.mean(axis=-1, keepdims=True) - R)
                C = C + w2 * (g2.mean(axis=-2, keepdims=True) - C)
                var = (R @ C) / R.mean(axis=-2, keepdims=True).clip(
                    min=self.eps1
                )
            else:
                V = V + w2 * (g2 - V)
                var = V
            upd = gf / (var.clip(min=self.eps1 * self.eps1) ** 0.5)
            denom = (_rms(upd) / self.d).clip(min=1.0)
            new_p = p_dec - (alpha / denom) * upd
            if hasattr(new_p, "astype") and new_p.dtype != p.dtype:
                new_p = new_p.astype(p.dtype)
            new_params.append(new_p)
            new_row.append(R)
            new_col.append(C)
            new_var.append(V)
        return new_params, {
            "row": new_row, "col": new_col, "var": new_var, "t": t,
        }
