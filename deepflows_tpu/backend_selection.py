"""Backend selection (reference: `DeepFlows/backend_selection.py`).

The reference hard-wires ``BACKEND = "nd"``; here the single backend package
is the device registry itself (cpu / tpu / cpu_native), selectable per-tensor
via ``device=``.  ``DEEPFLOWS_BACKEND`` can force the default device name.
"""

import os

from . import backend as backend_api
from .backend import BackendTensor, Device, default_device

BACKEND = os.environ.get("DEEPFLOWS_BACKEND", "nd")

__all__ = ["BACKEND", "backend_api", "BackendTensor", "Device", "default_device"]
