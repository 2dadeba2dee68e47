"""Device-mesh helpers.

The reference has no distributed machinery at all (SURVEY §2.3: no DP/TP/PP,
no comm backend — the README's `dist/` directory does not exist).  This
package is the TPU-native superset: scale-out is expressed as
``jax.sharding`` annotations over a ``Mesh``, and XLA's SPMD partitioner
inserts the ICI collectives (psum/all-gather/reduce-scatter) — no explicit
transport layer, per the scaling-book recipe.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

P = PartitionSpec


def make_mesh(
    axes: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a Mesh from an ``{axis_name: size}`` dict (row-major over the
    device list).  Defaults to all devices on one ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(f"mesh {axes} needs {n} devices, have {len(devices)}")
    return Mesh(np.array(devices).reshape(shape), names)


def auto_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """data×model mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % model_parallel == 0
    return make_mesh(
        {"data": n // model_parallel, "model": model_parallel}, devs[:n]
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def optimizer_state_shardings(state, slot_sharding, rep):
    """Shardings pytree for an Optimizer state dict: per-parameter list
    entries get ``slot_sharding(i, value)``, scalar entries (step counters)
    are replicated.  Shared by the sharded and pipelined train steps."""
    out = {}
    for k, v in state.items():
        if isinstance(v, list):
            out[k] = [
                None if x is None else slot_sharding(i, x)
                for i, x in enumerate(v)
            ]
        else:
            out[k] = rep
    return out


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
