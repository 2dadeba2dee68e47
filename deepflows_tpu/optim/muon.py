"""Muon — momentum orthogonalized by Newton-Schulz (Jordan et al. 2024,
"Muon: An optimizer for hidden layers in neural networks").

No reference analog; shipped because it is the strongest known optimizer
for transformer hidden weights — and a natural TPU citizen: the whole
update is five Newton-Schulz iterations of matmuls (MXU work), no
elementwise-heavy state like Adam.

For every >=2-D parameter (conv kernels flattened to (out, -1)):

    m  <- mu * m + g
    u  =  g + mu * m        (nesterov; plain momentum uses m)
    O  =  NS5(u)            (approximate U V^T of u's SVD)
    p  <- p - lr * sqrt(max(1, rows/cols)) * O

NS5 is the quintic iteration ``X <- a X + (b A + c A^2) X, A = X X^T``
with (a, b, c) = (3.4445, -4.7750, 2.0315), after Frobenius
normalisation — coefficients tuned so singular values land near 1 in 5
steps without convergence to exactly 1 (faster in the small-sv regime
that matters).

Parameters with ndim < 2 (biases, norm gains) fall back to AdamW inside
the same optimizer (separate ``adamw_lr``/betas), matching how Muon is
deployed in practice.  Same pure traceable core contract as every other
optimizer here (`optim/optimizer.py:80-128`): the full update — NS
matmuls included — compiles into the one whole-step XLA program.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..tensor import Tensor
from .optimizer import Optimizer

_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def ns_orthogonalize(x, steps: int = 5, eps: float = 1e-7):
    """Newton-Schulz orthogonalization of a 2-D array (numpy or traced
    jnp): returns an approximate nearest-orthogonal factor U V^T."""
    a, b, c = _NS_COEFFS
    transposed = x.shape[0] > x.shape[1]
    if transposed:
        x = x.T
    x = x / (((x * x).sum()) ** 0.5 + eps)
    for _ in range(steps):
        A = x @ x.T
        B = b * A + c * (A @ A)
        x = a * x + B @ x
    return x.T if transposed else x


class Muon(Optimizer):
    def __init__(
        self,
        params: List[Tensor],
        lr: float = 0.02,
        momentum: float = 0.95,
        nesterov: bool = True,
        ns_steps: int = 5,
        weight_decay: float = 0.0,
        adamw_lr: float = 3e-4,
        adamw_betas=(0.9, 0.95),
        adamw_eps: float = 1e-8,
    ) -> None:
        super().__init__(params)
        self.lr = lr
        self.momentum = float(momentum)
        self.nesterov = bool(nesterov)
        self.ns_steps = int(ns_steps)
        self.weight_decay = float(weight_decay)
        # the scheduler mutates self.lr (runtime scalar); the AdamW side
        # keeps a fixed RATIO to it so one schedule drives both
        self.adamw_lr_ratio = float(adamw_lr) / float(lr)
        self.adamw_beta1, self.adamw_beta2 = adamw_betas
        self.adamw_eps = float(adamw_eps)

    def _is_muon(self, p) -> bool:
        return len(p.shape) >= 2

    def init_state(self):
        m, v = [], []
        for p in self.params:
            m.append(p.device.fill(p.shape, 0.0, dtype=np.float32))
            v.append(
                None
                if self._is_muon(p)
                else p.device.fill(p.shape, 0.0, dtype=np.float32)
            )
        return {"m": m, "v": v, "t": np.asarray(0, dtype=np.int32)}

    def pure_update(self, params, grads, state, lr):
        t = state["t"] + 1
        tf = t.astype(np.float32) if hasattr(t, "astype") else np.float32(t)
        bc1 = 1.0 - self.adamw_beta1**tf
        bc2 = 1.0 - self.adamw_beta2**tf
        new_params, new_m, new_v = [], [], []
        for p, g, m, v in zip(params, grads, state["m"], state["v"]):
            if g is None:
                new_params.append(p)
                new_m.append(m)
                new_v.append(v)
                continue
            gf = g.astype(np.float32) if g.dtype != np.float32 else g
            if v is None:  # ----------------------------------- muon branch
                m = m * self.momentum + gf
                u = gf + m * self.momentum if self.nesterov else m
                rows = p.shape[0]
                cols = int(np.prod(p.shape[1:]))
                o = ns_orthogonalize(
                    u.reshape(rows, cols), self.ns_steps
                ).reshape(p.shape)
                scale = max(1.0, rows / cols) ** 0.5
                p_dec = (
                    p * (1.0 - lr * self.weight_decay)
                    if self.weight_decay
                    else p
                )
                new_p = p_dec - (lr * scale) * o
            else:  # ------------------------------------ adamw fallback
                alr = lr * self.adamw_lr_ratio
                m = m * self.adamw_beta1 + gf * (1.0 - self.adamw_beta1)
                v = v * self.adamw_beta2 + gf * gf * (1.0 - self.adamw_beta2)
                p_dec = (
                    p * (1.0 - alr * self.weight_decay)
                    if self.weight_decay
                    else p
                )
                new_p = p_dec - alr * (m / bc1) / ((v / bc2) ** 0.5 + self.adamw_eps)
            if hasattr(new_p, "astype") and new_p.dtype != p.dtype:
                new_p = new_p.astype(p.dtype)
            new_params.append(new_p)
            new_m.append(m)
            new_v.append(v)
        return new_params, {"m": new_m, "v": new_v, "t": t}
