"""Global configuration for deepflows_tpu.

The reference framework (see /root/reference, SURVEY.md) hard-wires a backend
constant (`DeepFlows/backend_selection.py:4`) and is float32-only
(`DeepFlows/backend/backend_tensor.py:267-269`).  We keep float32 as the
default numerics contract but expose deliberate, documented switches:

- ``default_dtype``: float32 by default; bfloat16 is an opt-in for TPU speed
  once accuracy bars are met (SURVEY.md §7.3 item 7).
- ``use_pallas``: route selected hot ops through hand-written Pallas TPU
  kernels instead of plain jnp/XLA ops (both are TPU-native; XLA's fusions are
  usually optimal under whole-step jit, Pallas wins on some eager paths).
- ``seed``: base seed for parameter init / dropout when the user does not
  provide one.
"""

from __future__ import annotations

import os

import numpy as np


class _Config:
    def __init__(self) -> None:
        self.default_dtype = np.float32
        self.use_pallas: bool = os.environ.get("DEEPFLOWS_USE_PALLAS", "0") == "1"
        self.seed: int = int(os.environ.get("DEEPFLOWS_SEED", "0"))
        # Eager-mode op dispatch goes through jnp which JAX compiles+caches per
        # shape; nothing to configure there.  Whole-step compilation is opt-in
        # via deepflows_tpu.jit.CompiledTrainStep.


config = _Config()
