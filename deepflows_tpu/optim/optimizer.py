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
        self._ensure_state()
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
        new_params, self._state = self.pure_update(
            param_arrays, grad_arrays, self._state, self.lr
        )
        for p, arr in zip(self.params, new_params):
            p.data = BackendTensor._wrap(arr, p.device)
            # tape hygiene, as the reference's Adam does (`adam.py:61-62`)
            p.children.clear()
            p.parents.clear()

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

    def _zeros_like_params(self):
        return [
            p.device.fill(p.shape, 0.0, dtype=p.dtype) for p in self.params
        ]
