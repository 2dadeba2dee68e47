"""deepflows_tpu — a TPU-native deep-learning framework.

From-scratch rebuild of the capabilities of the reference DeepFlows project
(see SURVEY.md) on JAX/XLA/Pallas: define-by-run autograd tape that is fully
traceable (whole-training-step compilation via ``deepflows_tpu.jit``), a
device registry with a first-class ``tpu`` device, an ``nn`` layer library,
optimizers + LR schedulers, data pipeline, checkpointing, pretrained-weight
conversion, a model zoo, and mesh-parallel training utilities.

Package surface mirrors the reference root export
(`DeepFlows/__init__.py:1-3`): tensor ops, grad contexts, backend selection.
"""

from .tensor import *  # noqa: F401,F403
from .tensor import Tensor, Graph
from .autograd import (  # noqa: F401
    enable_grad,
    is_grad_enable,
    is_grad_enabled,
    no_grad,
    set_grad_enabled,
)
from .backend_selection import *  # noqa: F401,F403
from .backend_selection import backend_api, BackendTensor, Device, default_device
from .config import config  # noqa: F401

__version__ = "0.1.0"


def manual_seed(seed: int) -> None:
    """Seed every device RNG, the dropout key stream, and the base seed used
    by later-constructed compiled steps."""
    from . import random as _random
    from .backend import all_devices

    config.seed = seed
    for d in all_devices():
        if d.enabled():
            d.manual_seed(seed)
    _random.manual_seed(seed)


# ---------------------------------------------------------------- lazy mode
from .backend import lazy  # noqa: F401,E402  (deferred-execution switch)

import os as _os  # noqa: E402

if _os.environ.get("DEEPFLOWS_LAZY", "") not in ("", "0"):
    # opt-in LazyTensor mode for the whole process: eager device ops record
    # and flush as one compiled program per host readback (see backend/lazy.py)
    lazy.enable()
del _os
