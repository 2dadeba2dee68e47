"""Adam (reference: `DeepFlows/optim/adam.py`): EMA order, bias correction
and update sequence match the reference (`adam.py:47-60`); t starts at 1 and
increments after the step.  The step count lives in the state pytree as a
device scalar so compiled steps never retrace."""

from __future__ import annotations

from typing import List

import numpy as np

from ..tensor import Tensor
from .optimizer import Optimizer


class Adam(Optimizer):
    def __init__(
        self,
        params: List[Tensor],
        lr: float = 1e-3,
        betas=(0.9, 0.999),
        eps: float = 1e-8,
        weight_decay: float = 0.0,
        fused: bool = False,
        stochastic_round: bool = False,
    ) -> None:
        """``fused=True`` routes each parameter's update through the
        hand-written one-kernel Pallas Adam (`ops/pallas_kernels.fused_adam`)
        on the jax device — one VPU kernel per parameter instead of ~10
        elementwise ops (matters for the eager path; inside a compiled step
        XLA fuses either way).

        ``stochastic_round=True`` enables full-bf16 WEIGHT training: bf16
        parameters are updated by the Pallas SR-Adam kernel
        (`ops/pallas_kernels.fused_adam_sr`) — the f32 update is rounded to
        bf16 stochastically (in-kernel TPU PRNG), so sub-ulp updates make
        progress in expectation instead of stalling at round-to-nearest.
        Moments stay f32; non-bf16 params take the normal path."""
        super().__init__(params)
        self.lr = lr
        self.beta1, self.beta2 = betas
        self.eps = eps
        self.weight_decay = weight_decay
        # 'fused' records the REQUEST; the actual routing decision happens in
        # pure_update per call, so moving the model to the jax device after
        # optimizer construction still enables the Pallas path
        self.fused = fused
        self.stochastic_round = stochastic_round

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
        hyper = None
        # fused/SR paths require jax arrays/tracers (numpy state can't feed a
        # Pallas kernel); decided per call, not latched at construction
        any_jax = any(hasattr(p, "aval") for p in params if p is not None)
        use_fused = self.fused and any_jax
        use_sr = self.stochastic_round and any_jax
        if use_fused or use_sr:
            import jax.numpy as jnp

            hyper = jnp.stack(
                [
                    jnp.asarray(lr, jnp.float32),
                    jnp.asarray(self.beta1, jnp.float32),
                    jnp.asarray(self.beta2, jnp.float32),
                    jnp.asarray(self.eps, jnp.float32),
                    jnp.asarray(self.weight_decay, jnp.float32),
                    jnp.asarray(bc1, jnp.float32),
                    jnp.asarray(bc2, jnp.float32),
                ]
            )
        new_params, new_v, new_s = [], [], []
        for i, (p, g, v, s) in enumerate(zip(params, grads, state["v"], state["s"])):
            if g is None:
                new_params.append(p)
                new_v.append(v)
                new_s.append(s)
                continue
            if hyper is not None:
                import jax.numpy as jnp

                if use_sr and p.dtype == jnp.bfloat16:
                    from ..ops.pallas_kernels import fused_adam_sr

                    # per-(step, param) PRNG stream
                    seed = jnp.stack([t.astype(np.int32) * np.int32(1009) + np.int32(i)])
                    p2, v, s = fused_adam_sr(p, g, v, s, hyper, seed)
                    new_params.append(p2)
                    new_v.append(v)
                    new_s.append(s)
                    continue
                if use_fused:
                    from ..ops.pallas_kernels import fused_adam

                    p2, v, s = fused_adam(p, g, v, s, hyper)
                    new_params.append(p2)
                    new_v.append(v)
                    new_s.append(s)
                    continue
                # SR requested but param not bf16: standard math below
            if self.weight_decay:
                g = g + p * self.weight_decay
            v = v * self.beta1 + g * (1.0 - self.beta1)
            s = s * self.beta2 + g * g * (1.0 - self.beta2)
            v_hat = v / bc1
            s_hat = s / bc2
            update = v_hat / (s_hat**0.5 + self.eps) * lr
            new_p = p - update
            if hasattr(new_p, "astype") and new_p.dtype != p.dtype:
                new_p = new_p.astype(p.dtype)  # preserve param dtype (bf16)
            new_params.append(new_p)
            new_v.append(v)
            new_s.append(s)
        return new_params, {"v": new_v, "s": new_s, "t": t}

    # reference-compatible accessors (checkpointing reads v/s/t,
    # `DeepFlows/utils/model_utils.py:60-74`)
    @property
    def v(self):
        self._ensure_state()
        return self._state["v"]

    @property
    def s(self):
        self._ensure_state()
        return self._state["s"]

    @property
    def t(self):
        self._ensure_state()
        return int(self._state["t"]) + 1  # reference t starts at 1
