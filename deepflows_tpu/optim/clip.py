"""Gradient clipping (extension; the reference has none).

``clip_grad_norm_`` works eagerly on ``param.grad``; for compiled steps pass
``grad_transform=clip_by_global_norm(max_norm)`` to ``CompiledTrainStep`` —
the clip then runs inside the fused XLA program."""

from __future__ import annotations

from typing import List

from ..backend import BackendTensor
from ..tensor import Tensor


def _global_norm(arrays):
    total = None
    for g in arrays:
        if g is None:
            continue
        s = (g * g).sum()
        total = s if total is None else total + s
    return total**0.5


def clip_grad_norm_(params: List[Tensor], max_norm: float) -> float:
    """Eager in-place clip; returns the pre-clip global norm.  Tolerates
    Tensor-typed grads (normalized to BackendTensor first, like
    Optimizer.step does)."""
    for p in params:
        if p.grad is not None and not isinstance(p.grad, BackendTensor):
            p.grad = p.grad.data  # a Tensor leaked in as grad
    grads = [p.grad.array if p.grad is not None else None for p in params]
    norm = _global_norm(grads)
    if norm is None:
        return 0.0
    scale = max_norm / (norm + 1e-6)
    scale = scale if float(norm) > max_norm else 1.0
    if scale != 1.0:
        for p in params:
            if p.grad is not None:
                p.grad = BackendTensor._wrap(p.grad.array * scale, p.device)
    return float(norm)


def clip_by_global_norm(max_norm: float):
    """grad_transform for CompiledTrainStep: scales all grads so their global
    norm is at most ``max_norm`` (traceable: uses where, not control flow)."""

    def transform(grads):
        import jax.numpy as jnp

        norm = _global_norm(grads)
        if norm is None:
            return grads
        scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-6), 1.0)
        return [None if g is None else g * scale.astype(g.dtype) for g in grads]

    return transform
