"""Exponential moving average of model weights (extension; the reference
has none — torch users reach for timm's ModelEmaV2 / torch.optim.swa_utils).

TPU-shaped: the shadow weights live on device as f32 jax arrays and
``update()`` is ONE jitted XLA program over all of them (donated, so the
EMA costs no extra HBM beyond the shadow copy itself).  The decay is a
runtime scalar — the warmup schedule never retraces.

Works with every step type (eager ``optimizer.step``, CompiledTrainStep,
pipelined/sharded steps, lazy mode): it reads ``p.data.array`` AFTER the
step wrote the update back, under the trace lock (a concurrent trace binds
tracers into shared Parameters — CLAUDE.md invariant).

Usage::

    ema = optim.ModelEMA(model, decay=0.999)
    for xb, yb in loader:
        loss = step(xb, yb)
        ema.update()
    with ema.average_parameters():   # eval with averaged weights
        acc = evaluate_accuracy(model, test_iter)
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

from ..backend import BackendTensor, tpu


class ModelEMA:
    """``decay`` is the asymptotic smoothing factor; with ``warmup=True``
    (default) the effective decay ramps as ``min(decay, (1+t)/(10+t))`` so
    early averages track the fast-moving young weights instead of the
    random init."""

    def __init__(self, model, decay: float = 0.999, warmup: bool = True):
        import jax
        import jax.numpy as jnp

        if not (0.0 <= decay < 1.0):
            raise ValueError(f"decay must be in [0, 1), got {decay}")
        self.model = model
        self.decay = float(decay)
        self.warmup = warmup
        self.num_updates = 0
        self._device = tpu()
        self._named = [(n, p) for n, p in model.named_parameters()]
        from ..jit import _TRACE_LOCK

        self._lock = _TRACE_LOCK
        with self._lock:
            # genuine COPIES: compiled steps DONATE the live param buffers,
            # so aliasing them here would leave the shadow deleted after the
            # first step
            self._shadow = [
                jnp.array(p.data.array, dtype=jnp.float32, copy=True)
                for _, p in self._named
            ]

        def _update(shadow, params, d):
            # shadow + (p - shadow)*(1-d), f32 accumulate regardless of the
            # live params' compute dtype
            return [
                s + (p.astype(jnp.float32) - s) * (1.0 - d)
                for s, p in zip(shadow, params)
            ]

        self._jitted = jax.jit(_update, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _effective_decay(self) -> float:
        if not self.warmup:
            return self.decay
        t = self.num_updates
        return min(self.decay, (1.0 + t) / (10.0 + t))

    def update(self) -> None:
        """Fold the model's current weights into the shadow average (one
        fused dispatch; call once per optimizer step)."""
        d = np.float32(self._effective_decay())
        self.num_updates += 1
        with self._lock:
            from ..backend.lazy import force as _lz

            live = [_lz(p.data.array) for _, p in self._named]
            self._shadow = self._jitted(self._shadow, live, d)

    # ------------------------------------------------------------------
    def copy_to(self, model=None) -> None:
        """Write the averaged weights into ``model`` (default: the tracked
        model), cast to each parameter's live dtype."""
        named = self._named if model is None else list(model.named_parameters())
        if len(named) != len(self._shadow):
            raise ValueError(
                f"model has {len(named)} parameters, EMA tracks "
                f"{len(self._shadow)}"
            )
        import jax.numpy as jnp

        with self._lock:
            for (_, p), s in zip(named, self._shadow):
                # copy so a later donating step can't delete the shadow
                p.data = BackendTensor._wrap(
                    jnp.array(s, dtype=p.data.array.dtype, copy=True), p.device
                )

    @contextmanager
    def average_parameters(self):
        """Temporarily swap the averaged weights into the model (eval with
        EMA weights), restoring the live training weights on exit."""
        import jax.numpy as jnp

        with self._lock:
            saved = [p.data for _, p in self._named]
            for (_, p), s in zip(self._named, self._shadow):
                p.data = BackendTensor._wrap(
                    jnp.array(s, dtype=p.data.array.dtype, copy=True), p.device
                )
        try:
            yield self.model
        finally:
            with self._lock:
                for (_, p), d in zip(self._named, saved):
                    p.data = d

    # ------------------------------------------------------------------
    def state_dict(self) -> dict:
        return {
            "decay": self.decay,
            "warmup": self.warmup,
            "num_updates": self.num_updates,
            "shadow": {
                n: np.asarray(s)
                for (n, _), s in zip(self._named, self._shadow)
            },
        }

    def load_state_dict(self, state: dict) -> None:
        import jax.numpy as jnp

        shadow = state["shadow"]
        missing = [n for n, _ in self._named if n not in shadow]
        if missing:
            raise KeyError(f"EMA state missing parameters: {missing}")
        self.decay = float(state["decay"])
        self.warmup = bool(state["warmup"])
        self.num_updates = int(state["num_updates"])
        self._shadow = [
            jnp.asarray(shadow[n], dtype=jnp.float32) for n, _ in self._named
        ]
