"""Backend selection (reference: `DeepFlows/backend_selection.py`).

The reference hard-wires ``BACKEND = "nd"``; here the single backend package
is the device registry itself (cpu / tpu / cpu_native), selectable per-tensor
via ``device=``.  ``DEEPFLOWS_BACKEND`` forces the *default* device name —
consumed by ``backend.device.default_device()``, which is what ``Tensor``
construction without ``device=`` resolves through.
"""

import os

from . import backend as backend_api
from .backend import BackendTensor, Device, default_device

# informational snapshot at import time (reference surface); the live lookup
# happens in backend.device.default_device(), which re-reads the env var
BACKEND = os.environ.get("DEEPFLOWS_BACKEND", "nd")

__all__ = ["BACKEND", "backend_api", "BackendTensor", "Device", "default_device"]
