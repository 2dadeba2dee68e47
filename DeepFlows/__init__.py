"""DeepFlows compatibility shim.

Lets the reference project's workload scripts (which do ``import DeepFlows``
/ ``from DeepFlows.tensor import *`` — e.g.
`/root/reference/test/LinearRegression.py:12-14`) run VERBATIM against
deepflows_tpu: same module paths, same names, with ``device='cuda'``
resolving to the TPU device (see `deepflows_tpu/backend/device.py`).
"""

from deepflows_tpu import *  # noqa: F401,F403
from deepflows_tpu import (  # noqa: F401
    BackendTensor,
    Device,
    Graph,
    Tensor,
    backend_api,
    default_device,
    enable_grad,
    is_grad_enable,
    no_grad,
    set_grad_enabled,
)
from deepflows_tpu import nn, optim, utils, models  # noqa: F401
