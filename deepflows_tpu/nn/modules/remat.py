"""Activation checkpointing (rematerialisation).

``nn.Remat(block)`` wraps any sub-module so that, on the JAX device, the
block's *internal* activations are not kept alive between forward and
backward: the forward runs under ``jax.checkpoint`` (save-nothing policy —
only the block inputs are residuals) and the backward replays the block
before computing its VJP.  Inside a ``CompiledTrainStep`` this trades a
second forward's FLOPs for HBM traffic — the standard memory/bandwidth
lever on TPUs, where e.g. ResNet50-224 training is HBM-bound (see
BENCH_NOTES roofline).  The reference framework has no equivalent (its tape
keeps every intermediate, `DeepFlows/tensor.py:545-578`).

Mechanics: a single multi-parent tape node (like the fused ``_BatchNormOp``)
whose forward is ``jax.vjp(jax.checkpoint(block_fn))`` over a *purified*
array-level run of the wrapped module, and whose ``grad_fn`` calls the saved
VJP once (cached) and routes the cotangents to the input and each parameter.
Buffers (BatchNorm running stats) are threaded functionally: the block
returns their new values and the wrapper rebinds them at the outer trace
level, so the EMA semantics are identical to the unwrapped module.  PRNG:
the block captures one key slot from the step's trace key and replays its
dropout streams identically in the recompute (forward and backward see the
same masks).
"""

from __future__ import annotations

import jax

from ... import random as df_random
from ...autograd import is_grad_enable
from ...backend import BackendTensor
from ...purify import purified_call
from ...tensor import Tensor
from .module import Module


class _RematOp(Tensor):
    """Tape node: checkpointed block forward; parents = (x, *params)."""

    def __init__(self, module: Module, x: Tensor, forward=None):
        dev = x.device
        call = forward if forward is not None else module
        params = [p for _, p in module.named_parameters()]
        buffers = [b for _, b in module.named_buffers()]
        training = module.training

        # one PRNG slot for the whole block; the same key is re-installed on
        # the replay so dropout masks match between forward and recompute
        # (the trace-swapping protocol itself lives in deepflows_tpu.purify)
        block_key = df_random.next_key() if dev.is_jax else None

        def block_fn(param_arrays, buffer_arrays, x_arr):
            return purified_call(
                call, params, buffers, param_arrays, buffer_arrays, x_arr,
                dev, block_key=block_key,
            )

        from ...jit import _TRACE_LOCK

        with _TRACE_LOCK:  # a concurrent trace binds tracers into params
            param_arrays = [p.data.array for p in params]
            buffer_arrays = [b.data.array for b in buffers]
        ckpt = jax.checkpoint(
            lambda pa, xa: block_fn(pa, buffer_arrays, xa)
        )
        (y_arr, new_bufs), vjp = jax.vjp(ckpt, param_arrays, x.data.array)
        self._vjp = vjp
        self._new_bufs = new_bufs

        # rebind buffers at the OUTER level (the EMA the module would have
        # done itself); only meaningful in training mode
        if training:
            for b, arr in zip(buffers, new_bufs):
                b.data = BackendTensor._wrap(arr, dev)

        rg = is_grad_enable() and (
            x.requires_grad or any(p.requires_grad for p in params)
        )
        super().__init__(
            BackendTensor._wrap(y_arr, dev), device=dev, requires_grad=rg
        )
        self._x = x
        self._params = params
        self._gcache = None
        if self.requires_grad:
            x.build_edge(self)
            for p in params:
                p.build_edge(self)

    def grad_fn(self, node, grad):
        if self._gcache is None or self._gcache[0] is not grad:
            import jax.numpy as jnp

            zeros = [jnp.zeros_like(b) for b in self._new_bufs]
            gparams, gx = self._vjp((grad.array, zeros))
            self._gcache = (grad, gparams, gx)
        _, gparams, gx = self._gcache
        if node is self._x:
            return BackendTensor._wrap(gx, self.device)
        for p, g in zip(self._params, gparams):
            if node is p:
                return BackendTensor._wrap(g, self.device)
        raise RuntimeError("remat grad for a non-parent node")


def remat_call(module: Module, x, forward=None):
    """Run ``module``'s forward as ONE checkpointed tape node, without
    wrapping (parameter/buffer names unchanged — safe for checkpoints and
    pretrained mappings).  ``forward`` overrides the callable (e.g. a
    block's un-dispatched ``_forward_impl``).  Falls back to a plain call
    off the JAX device or when grads are off."""
    if (
        getattr(x.device, "is_jax", False)
        and is_grad_enable()
        and module.training
    ):
        return _RematOp(module, x, forward)
    return (forward or module)(x)


class Remat(Module):
    """Wrap ``module`` so its internal activations are rematerialised in
    backward (JAX device + grad enabled); otherwise a transparent pass-
    through.  Typical use: ``Remat(block)`` per residual block, or the
    ``remat=True`` flag on the ResNet constructors."""

    def __init__(self, module: Module):
        super().__init__()
        self.module = module

    def forward(self, x):
        return remat_call(self.module, x)

    def __repr__(self):
        return f"Remat({self.module!r})"
