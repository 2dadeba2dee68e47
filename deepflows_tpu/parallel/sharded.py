"""Mesh-parallel training: ShardedTrainStep / ShardedEvalStep.

A ``CompiledTrainStep`` whose jitted program carries ``jax.sharding``
annotations: the batch is sharded along the ``data`` mesh axis (data
parallelism — gradient reduction becomes an XLA ``psum`` over ICI inserted by
the SPMD partitioner), and parameters can be sharded by rule (tensor
parallelism, e.g. Linear out-features over a ``model`` axis).  Because the
step is ONE global program, BatchNorm statistics are exact global-batch
statistics and optimizer state is sharded to match its parameter.

The reference has no distributed training of any kind (SURVEY §2.3); this is
the TPU-native scale-out path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..jit import CompiledEvalStep, CompiledTrainStep

P = PartitionSpec


def expert_parallel_rules(axis: str = "model", base: Optional[Callable] = None) -> Callable:
    """EP rule: shard MoE stacked-expert tensors (``experts_*``, leading
    expert dim) over ``axis``; everything else falls through to ``base``
    (or replicated).  With this layout each rank computes only its experts
    and the MoE combine's expert-axis sum lowers to a psum."""

    def rule(name: str, shape) -> PartitionSpec:
        leaf = name.rsplit(".", 1)[-1]
        if leaf.startswith("experts_") and len(shape) == 3:
            return P(axis, None, None)
        return base(name, shape) if base is not None else P()

    return rule


def fsdp_rules(
    mesh: Mesh,
    axis: str = "data",
    min_elems: int = 2048,
    base: Optional[Callable] = None,
) -> Callable:
    """ZeRO-3 / FSDP rule: shard every large-enough parameter over the
    ``data`` mesh axis so resident parameter AND optimizer memory drop ~D×
    per device.  In GSPMD this is purely a layout choice: params enter and
    leave the step data-sharded, the partitioner inserts the per-layer
    all-gather where the full value is consumed (forward and backward) and
    turns the gradient ``psum`` into a reduce-scatter, and the optimizer
    update runs on the local shard only — the classic ZeRO-3 schedule,
    derived by the compiler instead of hand-written bucketing (the torch
    FSDP/`reference` has no distributed training at all, SURVEY §2.3).

    The first dim divisible by the axis size is sharded (dim 0 preferred,
    matching FSDP's flat-param convention); params smaller than
    ``min_elems`` (BN affine vectors, biases) stay replicated — gathering
    them costs more latency than the bytes are worth.  ``base`` composes:
    a param already sharded by ``base`` (e.g. tensor-parallel) keeps that
    layout untouched, so ``fsdp_rules(mesh, base=tensor_parallel_rules())``
    gives TP weights + FSDP everything-else.
    """
    d = mesh.shape[axis]

    def rule(name: str, shape) -> PartitionSpec:
        if base is not None:
            spec = base(name, shape)
            if spec != P():
                return spec
        n = 1
        for s in shape:
            n *= s
        if n >= min_elems:
            for i, s in enumerate(shape):
                if s >= d and s % d == 0:
                    return P(*([None] * i), axis, *([None] * (len(shape) - 1 - i)))
        return P()

    return rule


def tensor_parallel_rules(axis: str = "model", shard_conv: bool = True) -> Callable:
    """Default TP rule: shard Linear weights/biases AND conv kernels on
    their out-features/out-channels dim over ``axis``; everything else
    (BN affine vectors, biases shaped (1,C,1,1)) replicated.  XLA's SPMD
    partitioner inserts the collectives — for a channel-sharded conv
    followed by a replicated-op (BN stats) it emits the all-gather; for
    Linear chains it alternates row/col products."""

    def rule(name: str, shape) -> PartitionSpec:
        if len(shape) == 2 and name.endswith("weight"):
            return P(None, axis)  # Linear (in, out) -> shard out
        if len(shape) == 2 and name.endswith("bias"):
            return P(None, axis)
        if shard_conv and len(shape) == 4 and shape[2] > 1 and name.endswith("weight"):
            # conv kernel (out, in, kh, kw) -> shard out-channels; (1,C,1,1)
            # affine/bias vectors are excluded by the kh>1 guard
            return P(axis, None, None, None)
        return rule_conv1x1(name, shape)

    def rule_conv1x1(name: str, shape) -> PartitionSpec:
        if (
            shard_conv
            and len(shape) == 4
            and name.endswith("weight")
            and shape[0] > 1
            and shape[1] > 1
        ):
            # 1x1 conv (out, in, 1, 1): distinguish from (1,C,1,1) vectors
            return P(axis, None, None, None)
        return P()

    return rule


class ShardedTrainStep(CompiledTrainStep):
    def __init__(
        self,
        model,
        optimizer,
        criterion,
        mesh: Mesh,
        data_axis: str = "data",
        param_rules: Optional[Callable] = None,
        donate: bool = True,
        metrics_fn: Optional[Callable] = None,
        compute_dtype=None,
        grad_transform: Optional[Callable] = None,
        accum_steps: int = 1,
        zero_shard_state: bool = False,
    ):
        """``zero_shard_state=True`` enables ZeRO-1-style optimizer-state
        sharding: state slots belonging to REPLICATED parameters are stored
        sharded over the ``data`` axis (dim 0, when divisible) instead of
        replicated per rank — resident optimizer memory drops ~D× and the
        SPMD partitioner inserts the gathers around the update.  State for
        tensor-parallel-sharded params already shards with its param."""
        super().__init__(
            model,
            optimizer,
            criterion,
            donate=donate,
            metrics_fn=metrics_fn,
            compute_dtype=compute_dtype,
            grad_transform=grad_transform,
            accum_steps=accum_steps,
        )
        self.mesh = mesh
        self.data_axis = data_axis

        rep = NamedSharding(mesh, P())
        names = [n for n, _ in model.named_parameters()]
        self._param_shardings = []
        for name, p in zip(names, self._params):
            spec = param_rules(name, p.shape) if param_rules else P()
            self._param_shardings.append(NamedSharding(mesh, spec))
        buffer_shardings = [rep for _ in self._buffers]

        d_size = mesh.shape[data_axis]

        def _slot_sharding(i, x):
            base = self._param_shardings[self._opt_index[i]]
            if not zero_shard_state or base.spec != PartitionSpec():
                return base
            shape = getattr(x, "shape", ())
            if len(shape) >= 1 and shape[0] > 1 and shape[0] % d_size == 0:
                return NamedSharding(
                    mesh, P(data_axis, *([None] * (len(shape) - 1)))
                )
            return base

        from .mesh import optimizer_state_shardings

        opt_state_shardings = optimizer_state_shardings(
            optimizer._state, _slot_sharding, rep
        )

        # pre-place params/buffers/optimizer state onto the mesh so the first
        # call sees the same (committed, sharded) input layout as every later
        # call — avoids a second trace/compile
        from ..backend import BackendTensor

        for p, sh in zip(self._params, self._param_shardings):
            p.data = BackendTensor._wrap(jax.device_put(p.data.array, sh), p.device)
        for b in self._buffers:
            b.data = BackendTensor._wrap(jax.device_put(b.data.array, rep), b.device)
        optimizer._state = jax.tree.map(
            lambda arr, sh: None if arr is None else jax.device_put(arr, sh),
            optimizer._state,
            opt_state_shardings,
            is_leaf=lambda x: x is None,
        )

        batch_sh = NamedSharding(mesh, P(data_axis))
        in_shardings = (
            self._param_shardings,
            buffer_shardings,
            opt_state_shardings,
            rep,  # lr
            rep,  # step idx
            batch_sh,  # x
            batch_sh,  # y
        )
        donate_argnums = (0, 1, 2) if donate else ()
        # pin state outputs to the SAME layouts as the inputs: with sharded
        # conv channels, GSPMD would otherwise emit e.g. channel-sharded BN
        # running stats, and call N+1 would reject the committed layout
        out_shardings = (
            rep,  # loss
            self._param_shardings,
            buffer_shardings,
            opt_state_shardings,
            None,  # metrics: unconstrained (structure is metrics_fn's)
        )
        self._jitted = jax.jit(
            self._pure_step,
            in_shardings=in_shardings,
            out_shardings=out_shardings,
            donate_argnums=donate_argnums,
        )


class ShardedEvalStep(CompiledEvalStep):
    def __init__(self, model, mesh: Mesh, data_axis: str = "data", param_rules=None):
        super().__init__(model)
        rep = NamedSharding(mesh, P())
        names = [n for n, _ in model.named_parameters()]
        param_shardings = [
            NamedSharding(mesh, param_rules(n, p.shape) if param_rules else P())
            for n, p in zip(names, self._params)
        ]
        in_shardings = (
            param_shardings,
            [rep for _ in self._buffers],
            NamedSharding(mesh, P(data_axis)),
        )
        self._jitted = jax.jit(self._pure_forward, in_shardings=in_shardings)
