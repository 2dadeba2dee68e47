"""Optimizer base (reference: `DeepFlows/optim/optimier.py:6-15`).

TPU-first design: every optimizer defines a PURE update
``pure_update(params, grads, state, lr) -> (new_params, new_state)`` over raw
device arrays (works for numpy and jnp, traceable under jit).  The eager
``step()`` is a thin wrapper that feeds the current parameter/grad arrays
through the pure core and rebinds ``param.data`` — so the exact same math
runs inside ``deepflows_tpu.jit.CompiledTrainStep`` as one fused XLA program
(the reference instead launched one CUDA kernel per arithmetic op per
parameter, `optim/adam.py:36-60`).

``lr`` is always a runtime argument to the pure core, so LR schedulers (which
mutate ``optimizer.lr``) never retrigger compilation.
"""

from __future__ import annotations

from typing import List

from ..backend import BackendTensor
from ..tensor import Tensor


class Optimizer:
    def __init__(self, params: List[Tensor]) -> None:
        self.params: List[Tensor] = list(params)
        self._state = None
        self._jit_cache = {}  # grad-None-mask -> jitted masked update

    # ------------------------------------------------------------ pure API
    def init_state(self):
        """State pytree of raw device arrays (per-parameter slots)."""
        return {}

    def pure_update(self, params, grads, state, lr):
        """params/grads: lists of raw arrays (grads entries may be None).
        Returns (new_params, new_state).  Must be trace-safe."""
        raise NotImplementedError

    # ------------------------------------------------------------ eager API
    def _ensure_state(self):
        if self._state is None:
            self._state = self.init_state()

    def step(self):
        from ..jit import _TRACE_LOCK

        self._ensure_state()
        # gather + write back under the trace lock: a concurrent thread's
        # trace (e.g. a serving/viz eval step) temporarily binds tracers
        # into the shared params (see CompiledTrainStep.__call__)
        with _TRACE_LOCK:
            param_arrays = [p.data.array for p in self.params]
            grad_arrays = []
            for p in self.params:
                g = p.grad
                if g is None:
                    grad_arrays.append(None)
                elif isinstance(g, BackendTensor):
                    grad_arrays.append(g.array)
                else:  # a Tensor leaked in as grad
                    grad_arrays.append(g.data.array)
            new_params, self._state = self._dispatch_update(
                param_arrays, grad_arrays, self._state, self.lr
            )
            for p, arr in zip(self.params, new_params):
                p.data = BackendTensor._wrap(arr, p.device)
                # tape hygiene, as the reference's Adam does (`adam.py:61-62`)
                p.children.clear()
                p.parents.clear()
        # lazy mode: the optimizer update is the natural step boundary —
        # flush here (async dispatch) so the device computes THIS step while
        # Python records the next one (torch/XLA's mark_step placement);
        # without it, work only dispatches at the next host readback
        from ..backend import lazy as _lazy

        if _lazy._frag.nodes and _lazy.enabled():
            _lazy.flush()

    def _dispatch_update(self, param_arrays, grad_arrays, state, lr):
        """Eager fast path: when every array lives on the JAX device, run the
        whole update as ONE jitted XLA program (shape-keyed cache; the
        grad-is-None mask is part of the cache key) instead of ~10 tiny
        dispatches per parameter — the reference launched one CUDA kernel per
        arithmetic op per parameter (`DeepFlows/optim/adam.py:36-60`)."""
        all_jax = all(
            hasattr(a, "aval")
            for a in param_arrays + [g for g in grad_arrays if g is not None]
        )
        if not all_jax or not param_arrays:
            return self.pure_update(param_arrays, grad_arrays, state, lr)

        import jax
        import numpy as np

        mask = tuple(g is not None for g in grad_arrays)
        # lazy mode: record the whole update into the pending fragment so
        # forward+backward+optimizer flush as ONE compiled program.  Any
        # lazy input triggers recording: after lazy.enable() mid-program
        # the params are still concrete while the grads are already lazy —
        # feeding those grads to jax.jit would crash at abstractification.
        from ..backend.lazy import LazyArray

        if any(
            isinstance(a, LazyArray)
            for a in param_arrays
            + [g for g in grad_arrays if g is not None]
            + jax.tree.leaves(state)
        ):
            from ..backend import lazy

            rec = self._jit_cache.get(("lazy", mask))
            if rec is None:

                def rec(params, grads_packed, state, lr):
                    it = iter(grads_packed)
                    grads = [next(it) if m else None for m in mask]
                    return self.pure_update(params, grads, state, lr)

                self._jit_cache[("lazy", mask)] = rec
            packed = [g for g in grad_arrays if g is not None]
            return lazy.record_call(
                rec, (param_arrays, packed, state, np.float32(lr)), {}
            )

        jitted = self._jit_cache.get(mask)
        if jitted is None:

            def masked(params, grads_packed, state, lr):
                it = iter(grads_packed)
                grads = [next(it) if m else None for m in mask]
                return self.pure_update(params, grads, state, lr)

            jitted = self._jit_cache[mask] = jax.jit(masked)
        packed = [g for g in grad_arrays if g is not None]
        return jitted(param_arrays, packed, state, np.float32(lr))

    def zero_grad(self):
        for param in self.params:
            param.zero_grad()

    # ------------------------------------------------------------ checkpoint
    def state_dict(self) -> dict:
        self._ensure_state()
        return {"state": self._state, "lr": self.lr}

    def load_state_dict(self, sd: dict) -> None:
        self._state = sd.get("state")
        if "lr" in sd:
            self.lr = sd["lr"]

    def _zeros_like_params(self, dtype=None):
        """Zero state slots.  ``dtype`` defaults to float32 rather than the
        parameter dtype: moment/accumulator state must stay f32 even for
        bf16 parameters (f32 grads promote the first update to f32 anyway —
        a param-dtype init would flip the state dtype after step 1 and force
        a full retrace of compiled steps)."""
        import numpy as np

        dtype = dtype or np.float32
        return [p.device.fill(p.shape, 0.0, dtype=dtype) for p in self.params]
