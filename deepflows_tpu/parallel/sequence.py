"""Sequence parallelism via sharding constraints.

With the transformer family in the zoo there IS a sequence dimension to
shard.  The TPU-native expression (scaling-book recipe, like dp/tp) is not a
transport layer but an annotation: a :class:`ShardConstraint` is an identity
tape op that pins its activation's sharding inside the compiled step, and
the SPMD partitioner inserts the collectives around it — tokens stay
sharded over the ``model`` axis through LayerNorm/MLP (pointwise in the
token dim), and GSPMD materialises the all-gather only where attention
needs the full sequence.

Usage — interleave with transformer blocks::

    mesh = make_mesh({"data": 2, "model": 4})
    sp = sequence_sharding(mesh, axis="model", dim=1)   # (B, L, E) -> shard L
    model = nn.Sequential(sp, block0, sp, block1, sp, ...)
    step = ShardedTrainStep(model, opt, criterion, mesh)

The constraint applies to forward activations AND their cotangents (the
backward pass keeps the same layout).  Off the jax trace (eager concrete
arrays, cpu device) it is the identity.
"""

from __future__ import annotations

import jax as _jax
from jax import core as _jcore
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..autograd import is_grad_enable
from ..backend import BackendTensor
from ..tensor import Tensor

P = PartitionSpec


class _ShardConstraintOp(Tensor):
    """Identity tape node carrying a sharding constraint (forward and
    backward)."""

    def __init__(self, x: Tensor, sharding: NamedSharding):
        self._sharding = sharding
        arr = self._apply(x.data.array)
        super().__init__(
            BackendTensor._wrap(arr, x.device),
            device=x.device,
            requires_grad=is_grad_enable() and x.requires_grad,
        )
        self._x = x
        if self.requires_grad:
            x.build_edge(self)

    def _apply(self, arr):
        if isinstance(arr, _jcore.Tracer):
            return _jax.lax.with_sharding_constraint(arr, self._sharding)
        return arr  # eager / concrete: identity

    def grad_fn(self, node, grad):
        return BackendTensor._wrap(self._apply(grad.array), self.device)


from ..nn.modules.module import Module


class ShardConstraint(Module):
    """Parameter-less Module pinning an activation's sharding (identity off
    the jax trace) — composes inside ``nn.Sequential`` like any layer.
    Stateless; one instance may appear at many points."""

    def __init__(self, mesh: Mesh, spec: PartitionSpec):
        super().__init__()
        self.sharding = NamedSharding(mesh, spec)

    def forward(self, x):
        if not getattr(x.device, "is_jax", False):
            return x
        return _ShardConstraintOp(x, self.sharding)

    def __repr__(self):
        return f"ShardConstraint({self.sharding.spec})"


def sequence_sharding(
    mesh: Mesh, axis: str = "model", dim: int = 1, batch_axis: str = "data"
) -> ShardConstraint:
    """Constraint for (B, L, ...) activations: batch over ``batch_axis``,
    the sequence dim over ``axis``, rest replicated."""
    spec = [None] * (dim + 1)
    spec[0] = batch_axis if batch_axis in mesh.axis_names else None
    spec[dim] = axis
    return ShardConstraint(mesh, P(*spec))
