"""Backend package: device registry + NDArray + kernel modules.

Re-exports the device constructors and the ``backend_api`` namespace, the
rebuild of the reference's `DeepFlows/backend/__init__.py` +
`backend_tensor.py` module surface.
"""

from .device import (
    BackendDevice,
    Device,
    all_devices,
    cpu,
    cpu_native,
    cpu_numpy,
    default_accelerator,
    default_device,
    tpu,
)
from .ndarray import (
    BackendTensor,
    Btensor,
    broadcast_to,
    empty,
    expand_dims,
    flip,
    from_numpy,
    full,
    log,
    exp,
    max,
    maximum,
    mean,
    ones,
    ones_like,
    pad,
    reshape,
    summation,
    tanh,
    zeros,
    zeros_like,
)

__all__ = [
    "BackendDevice",
    "Device",
    "all_devices",
    "cpu",
    "cpu_native",
    "cpu_numpy",
    "default_accelerator",
    "default_device",
    "tpu",
    "BackendTensor",
    "Btensor",
    "broadcast_to",
    "empty",
    "expand_dims",
    "flip",
    "from_numpy",
    "full",
    "log",
    "exp",
    "max",
    "maximum",
    "mean",
    "ones",
    "ones_like",
    "pad",
    "reshape",
    "summation",
    "tanh",
    "zeros",
    "zeros_like",
]
