"""Pipeline parallelism (GPipe-style) over a ``pipe`` mesh axis.

The reference has no distributed machinery at all (SURVEY §2.3) — like
``ShardedTrainStep`` (dp/tp), this is part of the TPU-native scale-out
superset.  Design (the vmap-pipeline formulation, scaling-book ch. "pipeline
parallelism" recipe — no hand-written send/recv):

- A :class:`PipelineStack` holds ``S`` *homogeneous* stage modules whose
  parameters are stacked on a leading stage axis, sharded ``P('pipe', ...)``
  over the mesh — each pipe rank materialises exactly its own stage's
  weights.
- One training step reshapes the global batch into ``M`` microbatches and
  runs ``M + S - 1`` ticks as a ``lax.scan``.  Every tick applies
  ``jax.vmap`` of the (purified, array-level) stage forward across the stage
  axis — under GSPMD each pipe rank computes only its stage — then shifts
  the activation buffer one stage forward with ``jnp.roll`` on the sharded
  axis, which XLA lowers to an ICI ``collective-permute``.  The fill/drain
  bubble (ranks computing on garbage during the first/last ``S-1`` ticks) is
  exactly GPipe's bubble fraction ``(S-1)/(M+S-1)``.
- The whole thing is one differentiable jnp program: the backward schedule
  (reverse fill/drain with reversed collective-permutes) falls out of
  ``jax.grad`` through the scan — no hand-written backward pipeline.

Because the pipelined program is differentiated by ``jax.grad`` at the
array level (not by the tape's reverse walk), stage modules must be
deterministic: Linear/Conv/activations/pools AND BatchNorm are supported —
BN running stats stack ``(S, ...)`` on the pipe axis, thread through the
tick scan, and EMA-update only on each stage's valid ticks (see
``PipelineStack.buffered_stage_fn``); Dropout is not (no per-step trace
key is plumbed; masks would be trace-constant).  The optimizer update
reuses the exact same
``Optimizer.pure_update`` core as every other path, over the stacked
parameters, with optimizer state sharded to match (``P('pipe', ...)``).

Composes with data parallelism: the microbatch batch dim is sharded over
the ``data`` axis, so a ``{'data': D, 'pipe': S}`` mesh runs D replicas of
an S-deep pipeline and the gradient ``psum`` over ``data`` is inserted by
the SPMD partitioner.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..backend import BackendTensor, tpu
from ..backend.lazy import force as _lz
from ..nn.modules.module import Module
from ..nn.parameter import Parameter
from ..purify import purified_call, purify_fn  # noqa: F401  (re-export)
from ..tensor import Tensor

P = PartitionSpec


# --------------------------------------------------------------------------
# purification: tape-API callables -> array-level pure functions
# --------------------------------------------------------------------------
def purify_module(module: Module, role: str = "pipeline stages") -> Callable:
    """Array-level pure forward ``fn(param_arrays, x_array) -> y_array`` for a
    tape Module (one shared trace-swapping core: `deepflows_tpu.purify`).
    Grad recording is off inside (the caller differentiates the jnp program
    with ``jax.grad``); the module must be buffer-free."""
    params = [p for _, p in module.named_parameters()]
    if any(True for _ in module.named_buffers()):
        raise ValueError(
            f"{role} must be buffer-free (BatchNorm running stats "
            "cannot be threaded through the pipeline scan); use GroupNorm-"
            "style normalisation or norm-free stages"
        )
    dev = tpu()

    def fn(param_arrays, x):
        y, _ = purified_call(module, params, [], param_arrays, [], x, dev)
        return y

    return fn


# --------------------------------------------------------------------------
# the stacked-stage container
# --------------------------------------------------------------------------
class PipelineStack(Module):
    """``S`` homogeneous stage modules with parameters stacked on a leading
    stage axis.

    The stacked tensors are registered as this Module's own Parameters (so
    ``.parameters()`` feeds any optimizer and ``state_dict`` checkpoints the
    stack); ``stages[0]`` is kept as the template whose purified forward is
    vmapped across the stage axis at run time.

    Stage homogeneity (same parameter names/shapes, activation shape ==
    input shape) is what lets one SPMD program express the pipeline; it is
    the standard restriction (pipelining identical blocks), not a
    deepflows_tpu limitation.
    """

    def __init__(self, stages: Sequence[Module]):
        super().__init__()
        stages = list(stages)
        if len(stages) < 1:
            raise ValueError("need at least one stage")
        def _structure(s):
            # parameter/buffer structure AND the full module-tree repr
            # (type + extra_repr config): stage 0's forward serves every
            # stage, so [Conv2d] vs [Conv2d, ReLU] with identical params
            # would silently drop the ReLU, and BatchNorm2d(momentum=0.01)
            # vs (momentum=0.1) would silently train with stage 0's
            # momentum — reject both here (repr carries config, not
            # parameter values, so differently-initialised stages pass)
            return (
                [(n, p.shape) for n, p in s.named_parameters()],
                [(n, b.shape) for n, b in s.named_buffers()],
                repr(s),
            )

        struct0 = _structure(stages[0])
        for s in stages[1:]:
            if _structure(s) != struct0:
                raise ValueError(
                    "pipeline stages must be homogeneous (identical module/"
                    f"parameter/buffer structure — stage 0's forward runs "
                    f"every stage); got {_structure(s)} vs {struct0}"
                )
        names0 = [n for n, _ in stages[0].named_parameters()]
        bnames0 = [n for n, _ in stages[0].named_buffers()]
        self.n_stages = len(stages)
        # deliberately NOT a registered submodule: the template provides the
        # purified forward only; its own (stage-0) params must not appear in
        # .parameters() next to the stacked ones
        object.__setattr__(self, "template", stages[0])
        self._param_names = names0
        self._buffer_names = bnames0
        import jax.numpy as jnp

        dev = tpu()
        # traverse each stage's params/buffers ONCE (not once per slot)
        per_stage_params = [[p for _, p in s.named_parameters()] for s in stages]
        per_stage_bufs = [[b for _, b in s.named_buffers()] for s in stages]
        for i, name in enumerate(names0):
            stacked = jnp.stack(
                [_lz(params[i].data.array) for params in per_stage_params]
            )
            # the index prefix keeps mangled names collision-free (e.g.
            # 'conv_1.weight' and 'conv.1.weight' both flatten to the same
            # string — without the index one would silently overwrite the
            # other and truncate the zip in purified stage calls)
            self.register_parameter(
                f"stacked_{i}_{name.replace('.', '_')}",
                Parameter(Tensor(BackendTensor._wrap(stacked, dev))),
            )
        # buffers (BatchNorm running stats) stack the same way: (S, ...) on
        # the pipe axis; they are threaded through the tick scan and updated
        # only on each stage's VALID ticks (bubble computes must not chain
        # the EMA)
        for i, name in enumerate(bnames0):
            stacked = jnp.stack(
                [_lz(bufs[i].data.array) for bufs in per_stage_bufs]
            )
            self.register_buffer(
                f"stacked_{i}_{name.replace('.', '_')}",
                Tensor(BackendTensor._wrap(stacked, dev)),
            )

    def stage_fn(self) -> Callable:
        """Purified buffer-free per-stage forward (template-bound); raises
        if the stages carry buffers — use :meth:`buffered_stage_fn`."""
        return purify_module(self.template)

    def buffered_stage_fn(self, training: bool = True) -> Callable:
        """Purified per-stage forward with buffer threading:
        ``fn(param_arrays, buffer_arrays, x) -> (y, new_buffer_arrays)``.
        The template is flipped to train/eval mode for the duration of each
        (traced) call, so BatchNorm uses batch stats + EMA updates under
        ``training=True`` and running stats under ``training=False``.
        Stages with Dropout are not supported on the pipeline path (no
        per-step trace key is plumbed; masks would be trace-constant)."""
        template = self.template
        params = [p for _, p in template.named_parameters()]
        buffers = [b for _, b in template.named_buffers()]
        dev = tpu()

        def fn(param_arrays, buffer_arrays, x):
            from ..autograd import is_grad_enable, set_grad_enabled

            was_mode = template.training
            was_flag = is_grad_enable()
            # train()/eval() flip the process-global grad flag (reference
            # semantics) — restore both afterwards
            template.train() if training else template.eval()
            try:
                return purified_call(
                    template, params, buffers, param_arrays, buffer_arrays,
                    x, dev,
                )
            finally:
                template.train() if was_mode else template.eval()
                set_grad_enabled(was_flag)

        return fn

    def forward(self, x):
        raise NotImplementedError(
            "PipelineStack is driven by PipelinedTrainStep / its eval_logits "
            "(the pipelined program is array-level, not a tape forward)"
        )


# --------------------------------------------------------------------------
# the pipelined program
# --------------------------------------------------------------------------
def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x_micro,
    *,
    stacked_buffers=None,
    mesh: Optional[Mesh] = None,
    pipe_axis: str = "pipe",
    data_axis: str = "data",
):
    """Run ``M`` microbatches through ``S`` stages; returns stacked outputs
    ``(M, b, ...)`` — or ``(outs, final_buffers)`` when ``stacked_buffers``
    is given (buffered mode: ``stage_fn(params, buffers, x) -> (y, new_b)``,
    e.g. from :meth:`PipelineStack.buffered_stage_fn`).

    ``x_micro``: ``(M, b, *features)``; stage input and output shapes must
    match (homogeneous stages).  Tick ``t`` computes stage ``s`` on
    microbatch ``t - s`` (where valid); ``jnp.roll`` along the stage axis is
    the inter-stage transfer (collective-permute under GSPMD when the axis
    is sharded over ``pipe``).  Buffers (BN running stats) update only on
    each stage's valid ticks, so the EMA chains exactly once per microbatch
    — the same per-microbatch semantics as ``CompiledTrainStep``'s gradient
    accumulation.
    """
    import jax.numpy as jnp
    from jax import lax

    buffered = stacked_buffers is not None
    S = stacked_params[0].shape[0]
    M = x_micro.shape[0]
    if M < 1:
        raise ValueError("need at least one microbatch")

    def _constrain(v, spec):
        if mesh is not None:
            return lax.with_sharding_constraint(v, NamedSharding(mesh, spec))
        return v

    feat = x_micro.shape[1:]
    # bubble safety: fill/drain ticks compute on whatever sits in the buffer
    # and their outputs get ZERO cotangents — but zero COTANGENT does not
    # neutralise NaN PRIMALS (0*NaN=NaN), so an all-zeros initial buffer
    # would poison gradients for any stage not NaN-safe at x=0 (e.g. an
    # L2-normalise dividing 0/0).  Seed the buffer with the first microbatch
    # instead: every bubble compute then runs on real-data-derived values,
    # finite for any stage that is finite on finite inputs.
    state = jnp.broadcast_to(x_micro[0], (S,) + feat).astype(x_micro.dtype)
    # probe the stage output shape statically (must equal input shape)
    x_aval = jax.ShapeDtypeStruct(feat, x_micro.dtype)
    if buffered:
        out_aval, _ = jax.eval_shape(
            stage_fn,
            [a[0] for a in stacked_params],
            [b[0] for b in stacked_buffers],
            x_aval,
        )
    else:
        out_aval = jax.eval_shape(
            stage_fn, [a[0] for a in stacked_params], x_aval
        )
    if tuple(out_aval.shape) != tuple(feat):
        raise ValueError(
            f"stage output shape {out_aval.shape} != input shape {feat}; "
            "pipeline stages must preserve activation shape"
        )
    outs = jnp.zeros((M,) + feat, out_aval.dtype)

    act_spec = P(pipe_axis, data_axis)
    micro_spec = P(None, data_axis)
    sidx = jnp.arange(S, dtype=jnp.int32)

    def tick(carry, t):
        state, outs, bufs = carry
        # inject the current microbatch into the stage-0 slot (clipped index
        # during the drain phase; those ticks' stage-0 work is bubble)
        inj = x_micro[jnp.clip(t, 0, M - 1)]
        state = state.at[0].set(inj)
        state = _constrain(state, act_spec)
        if buffered:
            y, newb = jax.vmap(stage_fn, in_axes=(0, 0, 0))(
                stacked_params, bufs, state
            )
            # stage s's EMA advances only when its tick is valid (it is
            # processing a real microbatch), never on bubble work
            svalid = (t - sidx >= 0) & (t - sidx < M)
            bufs = [
                jnp.where(svalid.reshape((S,) + (1,) * (b.ndim - 1)), nb, b)
                for b, nb in zip(bufs, newb)
            ]
            bufs = [_constrain(b, P(pipe_axis)) for b in bufs]
        else:
            y = jax.vmap(stage_fn, in_axes=(0, 0))(stacked_params, state)
        y = _constrain(y, act_spec)
        # collect the last stage's output: tick t finished microbatch t-(S-1)
        w = t - (S - 1)
        wc = jnp.clip(w, 0, M - 1)
        valid = (w >= 0) & (w < M)
        outs = outs.at[wc].set(jnp.where(valid, y[-1], outs[wc]))
        outs = _constrain(outs, micro_spec)
        # shift activations one stage forward (slot 0 is rewritten next tick)
        state = jnp.roll(y, 1, axis=0)
        return (state, outs, bufs), None

    bufs0 = list(stacked_buffers) if buffered else []
    (state, outs, bufs), _ = lax.scan(
        tick, (state, outs, bufs0), jnp.arange(M + S - 1, dtype=jnp.int32)
    )
    return (outs, bufs) if buffered else outs


# --------------------------------------------------------------------------
# the train step
# --------------------------------------------------------------------------
class PipelinedTrainStep:
    """One fused XLA program per step: microbatched pipeline forward,
    ``jax.grad`` backward (reverse pipeline), optimizer ``pure_update`` on
    the stacked (pipe-sharded) parameters, donated buffers.

    ``optimizer`` must hold exactly ``pre.parameters() + stack.parameters()
    + post.parameters()`` (pre/post optional).  ``criterion`` is a tape-API
    loss (purified internally); ``metrics_fn`` is not supported (use
    :meth:`eval_logits`).

    **Heterogeneous first/last stages** (``pre=``/``post=``): real models are
    embedding -> homogeneous blocks -> head, not pure block stacks.  ``pre``
    maps the raw input (e.g. ``(B, L)`` int tokens) to the block activation
    shape and ``post`` maps the final block activation to logits.  Both run
    OUTSIDE the tick scan as ordinary SPMD programs (batch dim sharded over
    ``data``, parameters replicated across ``pipe``) — mathematically
    identical to GPipe's per-microbatch first/last ranks because both are
    per-sample maps, while the FLOP-dominant block stack still pipelines.
    Replicating the (small) embed/head weights over the pipe axis is the
    idiomatic SPMD formulation (vmap-pipeline recipe); their gradients need
    no extra collective because GSPMD reduces them where the replicated
    params meet the data-sharded activations.  Both must be buffer-free.
    """

    def __init__(
        self,
        stack: PipelineStack,
        optimizer,
        criterion: Callable,
        mesh: Mesh,
        n_micro: int,
        *,
        pre: Optional[Module] = None,
        post: Optional[Module] = None,
        data_axis: str = "data",
        pipe_axis: str = "pipe",
        donate: bool = True,
        grad_transform: Optional[Callable] = None,
        compute_dtype=None,
        param_rules: Optional[Callable] = None,
        schedule: str = "gpipe",
    ):
        """``compute_dtype=jnp.bfloat16`` runs the pipelined forward +
        backward in bf16 (stacked master weights, gradients as seen by the
        optimizer, and optimizer state stay f32) — the same mixed-precision
        contract as ``CompiledTrainStep``.

        ``param_rules(name, per_stage_shape) -> PartitionSpec`` adds
        TENSOR parallelism INSIDE each stage (3-D parallelism: dp×pp×tp on
        one mesh): the returned spec applies to the per-stage trailing dims
        and is prefixed with the ``pipe`` axis on the stacked leading dim —
        e.g. a Linear rule ``P(None, 'model')`` shards each stage's
        out-features over ``model`` while stages stay split over ``pipe``.
        ``name`` is the template-stage parameter name.

        ``schedule`` selects the microbatch schedule:

        - ``"gpipe"`` (default): all-forward scan, ``jax.grad`` reverse —
          per-stage activation residuals are saved for every in-flight
          microbatch, so peak activation memory scales with **M**.
        - ``"1f1b"``: one-forward-one-backward — the step is THREE scans
          (forward-only warmup of ``S-1`` ticks; ``M`` steady ticks doing one
          forward AND one backward stage-apply each; ``S-1`` drain ticks,
          backward only) with gradients accumulated *inside* the scan, so no
          scan carry is ever saved for reverse-mode.  Each stage stashes only
          its in-flight microbatch INPUTS in a ring buffer of
          ``min(2S-1, M)`` slots and recomputes the stage forward under
          ``jax.vjp`` at backward time (Megatron-style per-stage recompute):
          peak activation memory scales with **S**, independent of M.  Tick
          count is ``M + 2(S-1)`` with two stage-applies on the steady ticks
          — the same ``(S-1)/(M+S-1)`` bubble fraction as GPipe (1F1B's win
          is memory, not bubble), paying ~fwd/3 extra FLOPs for the
          recompute.  The loss is computed per-microbatch inside the scan
          (the (M, b, vocab) logits buffer GPipe materialises never exists),
          so ``criterion`` must be a per-sample mean (or sum) reduction —
          every standard loss.  Same PipelineStack/pre/post/compute_dtype/
          param_rules surface as GPipe.
        - ``"interleaved_1f1b"``: virtual pipeline stages (Megatron-style
          interleaving).  The stack's ``S`` stages become ``C = S`` chunks
          laid ROUND-ROBIN over the ``P = mesh[pipe]`` devices (chunk ``c``
          on device ``c mod P``, ``v = S/P`` chunks per device; requires
          ``S % P == 0``), so inter-chunk transfer is always
          device->next-device (one ``ppermute`` per slice) and each device
          computes exactly ONE chunk per schedule slice (1/v of a
          per-device stage) under a partial-manual ``jax.shard_map`` over
          the pipe axis.  Forward of microbatch ``m`` through chunk ``c``
          runs at slice ``c + (m mod P) + C*(m div P)`` (bursts of P
          microbatches per chunk phase — the Megatron interleaved forward
          order); backward mirrors it at 1 chunk/slice with in-slice vjp
          and local gradient accumulation, 1F1B-style.  Executed wall
          (three scans: ``C-1`` forward-only warmup slices at tf/v each,
          steady fwd+bwd slices at (tf+tb)/v, ``C-1`` backward-only drain
          at tb/v) totals ``(vM + P - 1)(tf+tb)/v`` for ``M`` a multiple
          of ``P`` — bubble ``(P-1)/(vM + P-1)``, the standard
          interleaved-1F1B bound, vs non-interleaved ``(P-1)/(M+P-1)``:
          the bubble term divides by ``v``.  Activation stash is a
          2-generation ring per (phase, chunk): ``2*P*v`` microbatch
          inputs per device vs 1F1B's ``2P-1`` — interleaving trades
          activation memory (x ~v) for bubble, as upstream.
          NOTE: the stacked parameters/optimizer state are PHYSICALLY
          permuted to round-robin order at construction (stage ``c`` at
          stacked row ``(c mod P)*v + c div P``); ``eval_logits`` and the
          returned gradients account for it, but a state_dict saved from
          an interleaved run holds the permuted stacking (see
          ``self._stage_perm``)."""
        if schedule not in ("gpipe", "1f1b", "interleaved_1f1b"):
            raise ValueError(f"unknown schedule {schedule!r}")
        self.schedule = schedule
        if pipe_axis not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {pipe_axis!r}")
        if schedule == "interleaved_1f1b":
            n_pipe = mesh.shape[pipe_axis]
            if stack.n_stages % n_pipe:
                raise ValueError(
                    f"interleaved_1f1b needs n_stages ({stack.n_stages}) "
                    f"divisible by mesh {pipe_axis}={n_pipe}"
                )
            self.virtual_stages = stack.n_stages // n_pipe
        elif mesh.shape[pipe_axis] != stack.n_stages:
            raise ValueError(
                f"mesh {pipe_axis}={mesh.shape[pipe_axis]} != "
                f"{stack.n_stages} stages"
            )
        self.stack = stack
        self.optimizer = optimizer
        self.mesh = mesh
        self.n_micro = int(n_micro)
        self.data_axis = data_axis
        self.pipe_axis = pipe_axis
        self.grad_transform = grad_transform
        self.compute_dtype = compute_dtype
        self.pre = pre
        self.post = post
        pre_params = [p for _, p in pre.named_parameters()] if pre else []
        post_params = [p for _, p in post.named_parameters()] if post else []
        stack_params = [p for _, p in stack.named_parameters()]
        self._n_pre = len(pre_params)
        self._n_post = len(post_params)
        self._params = pre_params + stack_params + post_params
        self._buffers = [b for _, b in stack.named_buffers()]
        self._pre_fn = purify_module(pre, "pre stages") if pre else None
        self._post_fn = purify_module(post, "post stages") if post else None
        if [id(p) for p in optimizer.params] != [id(p) for p in self._params]:
            raise ValueError(
                "optimizer must hold exactly pre.parameters() + "
                "stack.parameters() + post.parameters()"
            )
        optimizer._ensure_state()
        if self._buffers:
            self._stage_fn = stack.buffered_stage_fn(training=True)
            self._eval_stage_fn = stack.buffered_stage_fn(training=False)
        else:
            self._stage_fn = stack.stage_fn()
            self._eval_stage_fn = self._stage_fn
        self._criterion = purify_fn(criterion)
        self._call_count = 0

        rep = NamedSharding(mesh, P())
        if param_rules is not None:
            stage_names = stack._param_names
            stack_pspec = []
            for name, p in zip(stage_names, stack_params):
                inner = tuple(param_rules(name, p.shape[1:]))
                if len(inner) > len(p.shape) - 1:
                    raise ValueError(
                        f"param_rules returned a rank-{len(inner)} spec for "
                        f"{name!r} — rules receive the PER-STAGE shape "
                        f"{p.shape[1:]} (the stacked leading 'pipe' dim is "
                        "added automatically)"
                    )
                inner = inner + (None,) * (len(p.shape) - 1 - len(inner))
                stack_pspec.append(NamedSharding(mesh, P(pipe_axis, *inner)))
        else:
            stack_pspec = [
                NamedSharding(mesh, P(pipe_axis, *([None] * (len(p.shape) - 1))))
                for p in stack_params
            ]
        # pre/post (embedding/head) params replicate across the pipe axis —
        # small weights, and GSPMD inserts the gradient reduction
        pspec = [rep] * self._n_pre + stack_pspec + [rep] * self._n_post
        self._param_shardings = pspec
        bspec = [
            NamedSharding(mesh, P(pipe_axis, *([None] * (len(b.shape) - 1))))
            for b in self._buffers
        ]

        from .mesh import optimizer_state_shardings

        opt_sh = optimizer_state_shardings(
            optimizer._state, lambda i, x: pspec[i], rep
        )
        # pre-place params + buffers + optimizer state on the mesh (first
        # call sees the committed layout; avoids a second trace)
        dev = tpu()
        self._stage_perm = None
        self._stage_inv = None

        def _permute_stage_rows(idx: np.ndarray) -> None:
            """Reorder the stacked rows of stage params, buffers, and the
            per-param optimizer slots (moments share the stacked shape)."""
            s0 = self._n_pre
            s1 = s0 + len(stack_params)
            for p in self._params[s0:s1]:
                p.data = BackendTensor._wrap(_lz(p.data.array)[idx], dev)
            for b in self._buffers:
                b.data = BackendTensor._wrap(_lz(b.data.array)[idx], dev)
            n_s = stack.n_stages
            for v_slot in optimizer._state.values():
                if not isinstance(v_slot, list):
                    continue  # scalar entries (step counter) are global
                for i in range(s0, s1):
                    a = v_slot[i]
                    if a is not None and getattr(a, "ndim", 0) >= 1 and a.shape[0] == n_s:
                        v_slot[i] = _lz(a)[idx]

        # the stack remembers its physical row order so rebuilding a step
        # over the SAME live stack (new n_micro/optimizer/schedule) composes
        # instead of double-permuting (review regression)
        prev = getattr(stack, "_stage_layout_perm", None)
        ident = np.arange(stack.n_stages)
        if schedule == "interleaved_1f1b":
            # physical stacked row q holds logical chunk (q%v)*P + q//v, so
            # block sharding over 'pipe' gives device d exactly its
            # round-robin chunks {d, P+d, ..., (v-1)P+d} as a contiguous
            # local block.  The scalar step counter is global.
            v_ = self.virtual_stages
            n_pipe = mesh.shape[pipe_axis]
            perm = np.array(
                [(q % v_) * n_pipe + q // v_ for q in range(stack.n_stages)]
            )
            self._stage_perm = perm
            self._stage_inv = np.argsort(perm)
            eff = perm if prev is None else np.argsort(np.asarray(prev))[perm]
            if not np.array_equal(eff, ident):
                _permute_stage_rows(eff)
            stack._stage_layout_perm = perm
        elif prev is not None:
            # a non-interleaved step over a previously-interleaved stack
            # must see logical stage order again
            _permute_stage_rows(np.argsort(np.asarray(prev)))
            stack._stage_layout_perm = None
        for p, sh in zip(self._params, pspec):
            p.data = BackendTensor._wrap(jax.device_put(_lz(p.data.array), sh), dev)
        for b, sh in zip(self._buffers, bspec):
            b.data = BackendTensor._wrap(jax.device_put(_lz(b.data.array), sh), dev)
        optimizer._state = jax.tree.map(
            lambda arr, sh: None if arr is None else jax.device_put(_lz(arr), sh),
            optimizer._state,
            opt_sh,
            is_leaf=lambda x: x is None,
        )

        batch_sh = NamedSharding(mesh, P(data_axis))
        in_sh = (pspec, bspec, opt_sh, rep, batch_sh, batch_sh)
        out_sh = (rep, pspec, bspec, opt_sh)
        step_fn = {
            "gpipe": self._pure_step,
            "1f1b": self._pure_step_1f1b,
            "interleaved_1f1b": self._pure_step_interleaved,
        }[schedule]
        self._jitted = jax.jit(
            step_fn,
            in_shardings=in_sh,
            out_shardings=out_sh,
            donate_argnums=(0, 1, 2) if donate else (),
        )
        self._eval_jitted = jax.jit(
            self._pure_eval, in_shardings=(pspec, bspec, batch_sh)
        )

    # ------------------------------------------------------------------
    def _split(self, param_arrays):
        n_pre, n_post = self._n_pre, self._n_post
        stack_end = len(param_arrays) - n_post
        return (
            param_arrays[:n_pre],
            param_arrays[n_pre:stack_end],
            param_arrays[stack_end:],
        )

    def _forward(self, param_arrays, buffer_arrays, x, stage_fn):
        pre_arrays, stack_arrays, post_arrays = self._split(param_arrays)
        if self._stage_inv is not None:
            # interleaved storage is round-robin-permuted; the GPipe-style
            # eval pipeline below walks stages in logical order
            stack_arrays = [a[self._stage_inv] for a in stack_arrays]
            buffer_arrays = [b[self._stage_inv] for b in buffer_arrays]
        if self._pre_fn is not None:
            x = self._pre_fn(pre_arrays, x)
        M = self.n_micro
        B = x.shape[0]
        if B % M:
            raise ValueError(f"batch {B} not divisible by n_micro {M}")
        xm = x.reshape((M, B // M) + x.shape[1:])
        res = pipeline_apply(
            stage_fn,
            stack_arrays,
            xm,
            stacked_buffers=buffer_arrays if self._buffers else None,
            mesh=self.mesh,
            pipe_axis=self.pipe_axis,
            data_axis=self.data_axis,
        )
        outs, new_bufs = res if self._buffers else (res, [])
        outs = outs.reshape((B,) + outs.shape[2:])
        if self._post_fn is not None:
            outs = self._post_fn(post_arrays, outs)
        return outs, new_bufs

    def _pure_step(self, param_arrays, buffer_arrays, opt_state, lr, x, y):
        import jax.numpy as jnp

        cd = self.compute_dtype
        x_in = (
            x.astype(cd)
            if cd is not None and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
            else x
        )

        def loss_fn(params):
            # mixed precision: differentiate w.r.t. the f32 masters but run
            # the pipeline on low-precision COPIES (grads arrive f32 via
            # the cast's transpose)
            run = [p.astype(cd) for p in params] if cd is not None else params
            logits, new_bufs = self._forward(
                run, buffer_arrays, x_in, self._stage_fn
            )
            loss = self._criterion(logits, y)
            if cd is not None:
                loss = loss.astype(jnp.float32)
                new_bufs = [
                    nb.astype(b.dtype) for nb, b in zip(new_bufs, buffer_arrays)
                ]
            return loss, new_bufs

        (loss, new_bufs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            param_arrays
        )
        if self.grad_transform is not None:
            grads = self.grad_transform(grads)
        new_params, new_state = self.optimizer.pure_update(
            param_arrays, grads, opt_state, lr
        )
        return loss, new_params, new_bufs, new_state

    @property
    def bubble_fraction(self) -> float:
        """Idle fraction of the schedule grid.

        ``gpipe``/``1f1b``: ``(S-1)/(M+S-1)`` — identical for both
        (non-interleaved 1F1B matches GPipe's bubble; its win is the
        M-independent activation memory).  ``interleaved_1f1b``: the wall
        is ``(C-1)`` fwd-only + ``(C-1)`` bwd-only chunk-slices around the
        steady phase, totalling ``(C + q_last)/v`` full-tick equivalents
        where ``q_last = (M-1) mod P + C*((M-1) div P)`` — for ``M`` a
        multiple of ``P`` this is ``M + (P-1)/v``, i.e. bubble
        ``(P-1)/(vM + P-1)``: the non-interleaved bubble term divided by
        ``v``.  The 1F1B paths additionally pay ~fwd/3 extra FLOPs for
        per-stage recompute."""
        S, M = self.stack.n_stages, self.n_micro
        if self.schedule == "interleaved_1f1b":
            v = self.virtual_stages
            n_pipe = self.mesh.shape[self.pipe_axis]
            q_last = (M - 1) % n_pipe + S * ((M - 1) // n_pipe)
            wall_ticks = (S + q_last) / v  # (C-1)/v fwd + steady + (C-1)/v bwd
            return (wall_ticks - M) / wall_ticks
        return (S - 1) / (M + S - 1)

    def _pure_step_1f1b(self, param_arrays, buffer_arrays, opt_state, lr, x, y):
        """One-forward-one-backward schedule: three scans (warmup / steady /
        drain) with hand-rolled per-stage ``jax.vjp`` backward and in-scan
        gradient accumulation — no reverse-mode through the scan, so peak
        activation memory is bounded by the ``min(2S-1, M)``-slot input
        stash per stage instead of GPipe's M saved microbatch residuals.

        Tick ``t`` (global grid, ``t in [0, M+2S-2)``): stage ``s`` runs the
        FORWARD of microbatch ``t-s`` (where ``0 <= t-s < M``) and the
        BACKWARD of microbatch ``t-2S+2+s`` (where valid).  The last stage
        finishes microbatch ``w = t-(S-1)`` and starts its backward in the
        SAME tick (loss + head vjp computed in-scan, so the (M, b, vocab)
        logits buffer never materialises).  Ring-slot safety: backward of
        microbatch ``m`` at stage ``s`` (tick ``m+2S-2-s``) strictly precedes
        the slot's reuse by ``m+W`` (tick ``m+W+s``) iff ``W >= 2S-1``; with
        ``M <= 2S-2`` slots are never reused.
        """
        import jax.numpy as jnp
        from jax import lax

        S = self.stack.n_stages
        M = self.n_micro
        cd = self.compute_dtype
        mesh, pipe_axis, data_axis = self.mesh, self.pipe_axis, self.data_axis
        buffered = bool(self._buffers)
        stage_fn = self._stage_fn

        def _constrain(v, spec):
            return lax.with_sharding_constraint(v, NamedSharding(mesh, spec))

        n_pipe = mesh.shape[pipe_axis]

        def _stagewise(fn, n_in):
            """vmap ``fn`` over the stage dim, MANUALLY sharded over the
            pipe axis (jax.shard_map partial-auto: 'data' stays GSPMD).
            Without this, the conv-stage vjp's grouped-conv lowering merges
            the pipe-sharded S dim with the data-sharded batch dim (lhs
            S*b pipe-major, rhs b x S*C) and GSPMD falls back to
            "Involuntary full rematerialization" — replicate-then-
            repartition on every backward tick.  Manual pipe sharding makes
            the stage dim LOCAL (size S/n_pipe) inside the vjp, so the
            grouped merge never crosses a sharded dim."""
            vf = jax.vmap(fn, in_axes=(0,) * n_in)
            if S % n_pipe:
                return vf
            spec = P(pipe_axis)
            return jax.shard_map(
                vf,
                mesh=mesh,
                axis_names={pipe_axis},
                in_specs=(spec,) * n_in,
                out_specs=spec,
                check_vma=False,
            )

        x_in = (
            x.astype(cd)
            if cd is not None and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
            else x
        )
        pre_m, stack_m, post_m = self._split(param_arrays)
        if cd is not None:
            pre_run = [p.astype(cd) for p in pre_m]
            stack_run = [p.astype(cd) for p in stack_m]
            post_run = [p.astype(cd) for p in post_m]
        else:
            pre_run, stack_run, post_run = list(pre_m), list(stack_m), list(post_m)

        vjp_pre = None
        if self._pre_fn is not None:
            x1, vjp_pre = jax.vjp(lambda pa: self._pre_fn(pa, x_in), pre_run)
        else:
            x1 = x_in
        B = x1.shape[0]
        if B % M:
            raise ValueError(f"batch {B} not divisible by n_micro {M}")
        b = B // M
        x_micro = x1.reshape((M, b) + x1.shape[1:])
        y_micro = y.reshape((M, b) + y.shape[1:])
        feat = x_micro.shape[1:]

        act_spec = P(pipe_axis, data_axis)
        micro_spec = P(None, data_axis)
        stash_spec = P(None, pipe_axis, data_axis)
        sidx = jnp.arange(S, dtype=jnp.int32)
        # ring capacity 2S-1 regardless of M: with this W, EVERY write to a
        # slot (valid or bubble) provably precedes any pending read of it —
        # a smaller W=M ring would let a bubble write clobber a pending slot
        # within one tick (write runs before the same tick's read)
        W = 2 * S - 1
        track_dx = self._pre_fn is not None

        def head_loss(post_p, yy, yt):
            out = self._post_fn(post_p, yy) if self._post_fn is not None else yy
            return self._criterion(out, yt)

        fstate0 = jnp.broadcast_to(x_micro[0], (S,) + feat).astype(x_micro.dtype)
        stash0 = jnp.broadcast_to(x_micro[0], (W, S) + feat).astype(x_micro.dtype)
        bstate0 = jnp.zeros((S,) + feat, x_micro.dtype)
        outs_dx0 = (
            jnp.zeros((M,) + feat, x_micro.dtype) if track_dx else None
        )
        dstack0 = [jnp.zeros(a.shape, a.dtype) for a in stack_m]
        dpost0 = [jnp.zeros(a.shape, a.dtype) for a in post_m]
        loss0 = jnp.zeros((), jnp.float32)

        def body(carry, t, do_fwd, do_head, do_bwd):
            fstate, bstate, stash, bufs, outs_dx, dstack, dpost, loss_acc = carry
            y_all = None
            if do_fwd:
                inj = x_micro[jnp.clip(t, 0, M - 1)]
                fstate = fstate.at[0].set(inj)
                fstate = _constrain(fstate, act_spec)
                # stash each stage's INPUT; unmasked writes are safe (ring
                # slots are proven free above; bubble values are real-data-
                # derived so recomputes on them stay finite)
                stash = stash.at[jnp.mod(t - sidx, W), sidx].set(fstate)
                stash = _constrain(stash, stash_spec)
                if buffered:
                    y_all, newb = _stagewise(stage_fn, 3)(
                        stack_run, bufs, fstate
                    )
                    svalid = (t - sidx >= 0) & (t - sidx < M)
                    bufs = [
                        jnp.where(
                            svalid.reshape((S,) + (1,) * (b_.ndim - 1)), nb, b_
                        )
                        for b_, nb in zip(bufs, newb)
                    ]
                    bufs = [_constrain(b_, P(pipe_axis)) for b_ in bufs]
                else:
                    y_all = _stagewise(stage_fn, 2)(stack_run, fstate)
                y_all = _constrain(y_all, act_spec)
            if do_head:
                # steady phase only: w = t-(S-1) is exactly in [0, M)
                w = jnp.clip(t - (S - 1), 0, M - 1)
                yw = y_all[S - 1]
                yt = y_micro[w]
                if self._post_fn is not None:
                    lval, vjp_h = jax.vjp(
                        lambda pp, aa: head_loss(pp, aa, yt), post_run, yw
                    )
                    dpost_w, dyw = vjp_h(jnp.asarray(1.0 / M, lval.dtype))
                    dpost = [
                        d + c.astype(d.dtype) for d, c in zip(dpost, dpost_w)
                    ]
                else:
                    lval, vjp_h = jax.vjp(lambda aa: head_loss(None, aa, yt), yw)
                    (dyw,) = vjp_h(jnp.asarray(1.0 / M, lval.dtype))
                loss_acc = loss_acc + lval.astype(jnp.float32) / M
                bstate = bstate.at[S - 1].set(dyw.astype(bstate.dtype))
                bstate = _constrain(bstate, act_spec)
            if do_bwd:
                mb = t - 2 * S + 2 + sidx
                bvalid = (mb >= 0) & (mb < M)
                xin = stash[jnp.mod(mb, W), sidx]
                xin = _constrain(xin, act_spec)

                def stage_vjp(p_s, b_s, xx, dy):
                    f = (
                        (lambda pp, xq: stage_fn(pp, b_s, xq)[0])
                        if buffered
                        else stage_fn
                    )
                    _, vjp_f = jax.vjp(f, p_s, xx)
                    return vjp_f(dy)

                dp_all, dx_all = _stagewise(stage_vjp, 4)(
                    stack_run, bufs, xin, bstate
                )
                dstack = [
                    d
                    + jnp.where(
                        bvalid.reshape((S,) + (1,) * (dp.ndim - 1)), dp, 0
                    ).astype(d.dtype)
                    for d, dp in zip(dstack, dp_all)
                ]
                dx_all = _constrain(dx_all, act_spec)
                if track_dx:
                    m0 = t - 2 * S + 2
                    v0 = (m0 >= 0) & (m0 < M)
                    m0c = jnp.clip(m0, 0, M - 1)
                    outs_dx = outs_dx.at[m0c].set(
                        jnp.where(v0, dx_all[0], outs_dx[m0c])
                    )
                    outs_dx = _constrain(outs_dx, micro_spec)
                bstate = jnp.roll(dx_all, -1, axis=0)
                bstate = _constrain(bstate, act_spec)
            if do_fwd:
                fstate = jnp.roll(y_all, 1, axis=0)
                fstate = _constrain(fstate, act_spec)
            return (
                fstate, bstate, stash, bufs, outs_dx, dstack, dpost, loss_acc
            ), None

        from functools import partial

        carry = (
            fstate0, bstate0, stash0, list(buffer_arrays),
            outs_dx0, dstack0, dpost0, loss0,
        )
        if S > 1:  # warmup: forward only
            carry, _ = lax.scan(
                partial(body, do_fwd=True, do_head=False, do_bwd=False),
                carry,
                jnp.arange(S - 1, dtype=jnp.int32),
            )
        carry, _ = lax.scan(  # steady: one forward + one backward per tick
            partial(body, do_fwd=True, do_head=True, do_bwd=True),
            carry,
            jnp.arange(S - 1, M + S - 1, dtype=jnp.int32),
        )
        if S > 1:  # drain: backward only
            carry, _ = lax.scan(
                partial(body, do_fwd=False, do_head=False, do_bwd=True),
                carry,
                jnp.arange(M + S - 1, M + 2 * S - 2, dtype=jnp.int32),
            )
        _, _, _, bufs, outs_dx, dstack, dpost, loss = carry

        if vjp_pre is not None:
            (dpre_run,) = vjp_pre(outs_dx.reshape((B,) + feat[1:]))
            dpre = [g.astype(m.dtype) for g, m in zip(dpre_run, pre_m)]
        else:
            dpre = []
        grads = dpre + list(dstack) + list(dpost)
        new_bufs = (
            [nb.astype(b_.dtype) for nb, b_ in zip(bufs, buffer_arrays)]
            if cd is not None
            else list(bufs)
        )
        if self.grad_transform is not None:
            grads = self.grad_transform(grads)
        new_params, new_state = self.optimizer.pure_update(
            param_arrays, grads, opt_state, lr
        )
        return loss, new_params, new_bufs, new_state

    def _pure_step_interleaved(
        self, param_arrays, buffer_arrays, opt_state, lr, x, y
    ):
        """Interleaved (virtual-stage) 1F1B: ``C = S`` chunks round-robin
        over ``P`` pipe devices (physical stacked row ``q`` = logical chunk
        ``(q%v)*P + q//v``, so each device's contiguous block is its
        round-robin chunk set), one chunk per device per schedule slice.

        The whole grid runs inside one partial-manual ``jax.shard_map``
        over the pipe axis ('data' and any tensor-parallel axes stay
        auto/GSPMD): per slice each device dynamic-indexes its active
        chunk's parameters, applies the purified stage once, and
        ``ppermute``\\ s the activation to the next device (chunk ``c+1``
        always lives on device ``d+1 mod P``).  Backward mirrors it with
        per-chunk ``jax.vjp`` recompute from a 2-generation input stash
        and in-scan gradient accumulation — 1F1B memory semantics, no
        reverse-mode through any scan.

        Slice algebra (C = v*P; all per-device, d = axis_index):
        forward of microbatch ``m = g*P + r`` through chunk
        ``c = j*P + d`` at slice  ``sigma = c + r + g*C``; backward at
        ``beta = 2(C-1) - c + r + g*C`` (the loss + head vjp run in-slice
        on device P-1 when its last chunk's forward lands, exactly like
        the non-interleaved 1F1B path).  Both maps are bijections from
        slices to (chunk, microbatch) per device, so one dynamic index
        per side suffices.  Stash slot ``(g mod 2, r, j)`` is provably
        free when rewritten: consecutive same-slot writes are 2C slices
        apart while the stashed input is consumed after at most
        ``2(C-1-c) <= 2C-2`` slices."""
        import jax.numpy as jnp
        from jax import lax

        C = self.stack.n_stages
        n_pipe = self.mesh.shape[self.pipe_axis]
        v = self.virtual_stages
        M = self.n_micro
        cd = self.compute_dtype
        mesh, pipe_axis = self.mesh, self.pipe_axis
        buffered = bool(self._buffers)
        stage_fn = self._stage_fn

        x_in = (
            x.astype(cd)
            if cd is not None and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
            else x
        )
        pre_m, stack_m, post_m = self._split(param_arrays)
        if cd is not None:
            pre_run = [p.astype(cd) for p in pre_m]
            stack_run = [p.astype(cd) for p in stack_m]
            post_run = [p.astype(cd) for p in post_m]
        else:
            pre_run, stack_run, post_run = list(pre_m), list(stack_m), list(post_m)

        vjp_pre = None
        if self._pre_fn is not None:
            x1, vjp_pre = jax.vjp(lambda pa: self._pre_fn(pa, x_in), pre_run)
        else:
            x1 = x_in
        B = x1.shape[0]
        if B % M:
            raise ValueError(f"batch {B} not divisible by n_micro {M}")
        b = B // M
        x_micro = x1.reshape((M, b) + x1.shape[1:])
        y_micro = y.reshape((M, b) + y.shape[1:])
        feat = x_micro.shape[1:]
        track_dx = self._pre_fn is not None

        def head_loss(post_p, yy, yt):
            out = self._post_fn(post_p, yy) if self._post_fn is not None else yy
            return self._criterion(out, yt)

        # phase boundaries (module docstring): warmup [0, C-1) fwd-only;
        # steady [C-1, F) fwd+head+bwd; drain [F, F+C-1) bwd-only, where
        # F-1 = sigma(M-1, C-1) is the last forward slice anywhere
        q_last = (M - 1) % n_pipe + C * ((M - 1) // n_pipe)
        F = C + q_last  # exclusive fwd end: sigma_max + 1 = C-1 + q_last + 1

        def _local(stack_loc, bufs_loc, post_p, xm, ym):
            d = lax.axis_index(pipe_axis)

            def fwd_decode(t):
                delta = t - d
                dc = jnp.mod(delta, C)
                jj = dc // n_pipe
                rr = jnp.mod(dc, n_pipe)
                g = delta // C
                m = g * n_pipe + rr
                valid = (delta >= 0) & (m >= 0) & (m < M)
                return jj, rr, g, m, valid

            def bwd_decode(t):
                e = t - 2 * (C - 1) + d
                xx = jnp.mod(e, C)
                rb = jnp.mod(xx, n_pipe)
                k = xx // n_pipe
                jb = jnp.mod(v - k, v)
                gb = (e - rb + jb * n_pipe) // C
                mb = gb * n_pipe + rb
                valid = (gb >= 0) & (mb < M)
                return jb, rb, gb, mb, valid

            def pick(arrs, j):
                return [
                    lax.dynamic_index_in_dim(a, j, axis=0, keepdims=False)
                    for a in arrs
                ]

            def apply_stage(p_j, b_j, xx):
                if buffered:
                    return stage_fn(p_j, b_j, xx)
                return stage_fn(p_j, xx), []

            def stage_vjp(p_j, b_j, xx, dy):
                f = (
                    (lambda pp, xq: stage_fn(pp, b_j, xq)[0])
                    if buffered
                    else stage_fn
                )
                _, vjp_f = jax.vjp(f, p_j, xx)
                return vjp_f(dy)

            is_last_dev = d == n_pipe - 1
            is_first_dev = d == 0

            def body(carry, t, do_fwd, do_head, do_bwd):
                (act, bstate, stash, bufs, outs_dx, dstack, dpost,
                 loss_acc) = carry
                dy_head = None
                if do_fwd:
                    jj, rr, g, m, valid_f = fwd_decode(t)
                    inj = (is_first_dev) & (jj == 0)
                    x_here = jnp.where(
                        inj, xm[jnp.clip(m, 0, M - 1)], act
                    ).astype(act.dtype)
                    # unmasked ring write (slot provably free, see
                    # docstring; bubble values are real-data-derived so
                    # recomputes on them stay finite)
                    stash = stash.at[jnp.mod(g, 2), rr, jj].set(x_here)
                    p_j = pick(stack_loc, jj)
                    b_j = pick(bufs, jj) if buffered else []
                    y_out, newb = apply_stage(p_j, b_j, x_here)
                    if buffered:
                        bufs = [
                            bf.at[jj].set(jnp.where(valid_f, nb, bf_j))
                            for bf, nb, bf_j in zip(bufs, newb, b_j)
                        ]
                    if do_head:
                        w = jnp.clip(m, 0, M - 1)
                        yt = ym[w]
                        head_on = is_last_dev & (jj == v - 1) & valid_f
                        if self._post_fn is not None:
                            lval, vjp_h = jax.vjp(
                                lambda pp, aa: head_loss(pp, aa, yt),
                                post_p, y_out,
                            )
                            dpost_w, dyw = vjp_h(
                                jnp.asarray(1.0 / M, lval.dtype)
                            )
                            dpost = [
                                dp
                                + jnp.where(head_on, c_, 0).astype(dp.dtype)
                                for dp, c_ in zip(dpost, dpost_w)
                            ]
                        else:
                            lval, vjp_h = jax.vjp(
                                lambda aa: head_loss(None, aa, yt), y_out
                            )
                            (dyw,) = vjp_h(jnp.asarray(1.0 / M, lval.dtype))
                        loss_acc = loss_acc + jnp.where(
                            head_on, lval.astype(jnp.float32), 0.0
                        ) / M
                        dy_head = dyw.astype(bstate.dtype)
                if do_bwd:
                    jb, rb, gb, mb, valid_b = bwd_decode(t)
                    # chunk C-1's cotangent is this slice's head vjp (device
                    # P-1, jb == v-1); every other chunk's arrived from
                    # device d+1 last slice
                    dy_in = bstate
                    if dy_head is not None:
                        use_head = is_last_dev & (jb == v - 1)
                        dy_in = jnp.where(use_head, dy_head, bstate)
                    xin = stash[jnp.mod(gb, 2), rb, jb]
                    p_jb = pick(stack_loc, jb)
                    b_jb = pick(bufs, jb) if buffered else []
                    dp_j, dx = stage_vjp(p_jb, b_jb, xin, dy_in)
                    dstack = [
                        ds.at[jb].add(
                            jnp.where(valid_b, dpj, 0).astype(ds.dtype)
                        )
                        for ds, dpj in zip(dstack, dp_j)
                    ]
                    if track_dx:
                        take = is_first_dev & (jb == 0) & valid_b
                        mc = jnp.clip(mb, 0, M - 1)
                        outs_dx = outs_dx.at[mc].set(
                            jnp.where(take, dx, outs_dx[mc])
                        )
                    # backward transfer: chunk c's dx feeds chunk c-1 on
                    # device d-1 next slice
                    bstate = lax.ppermute(
                        dx,
                        axis_name=pipe_axis,
                        perm=[(i, (i - 1) % n_pipe) for i in range(n_pipe)],
                    )
                if do_fwd:
                    # forward transfer: chunk c's output feeds chunk c+1 on
                    # device d+1 next slice (the wrap lands on device 0's
                    # injection slot and is overwritten)
                    act = lax.ppermute(
                        y_out,
                        axis_name=pipe_axis,
                        perm=[(i, (i + 1) % n_pipe) for i in range(n_pipe)],
                    )
                return (
                    act, bstate, stash, bufs, outs_dx, dstack, dpost,
                    loss_acc,
                ), None

            from functools import partial

            act0 = xm[0].astype(x_micro.dtype)
            bstate0 = jnp.zeros_like(act0)
            stash0 = jnp.broadcast_to(
                xm[0], (2, n_pipe, v) + feat
            ).astype(x_micro.dtype)
            # accumulate in MASTER dtype (f32), matching gpipe/1f1b: a bf16
            # running sum swallows late ~1/M-magnitude contributions at
            # large M.  Local (sharded) shape, master dtype.
            dstack0 = [
                jnp.zeros(a.shape, m.dtype) for a, m in zip(stack_loc, stack_m)
            ]
            dpost0 = [jnp.zeros(a.shape, a.dtype) for a in post_m]
            outs_dx0 = (
                jnp.zeros((M,) + feat, x_micro.dtype) if track_dx else None
            )
            carry = (
                act0, bstate0, stash0, list(bufs_loc), outs_dx0, dstack0,
                dpost0, jnp.zeros((), jnp.float32),
            )
            if C > 1:  # warmup: forward only
                carry, _ = lax.scan(
                    partial(body, do_fwd=True, do_head=False, do_bwd=False),
                    carry, jnp.arange(C - 1, dtype=jnp.int32),
                )
            carry, _ = lax.scan(  # steady: 1 fwd + head + 1 bwd per slice
                partial(body, do_fwd=True, do_head=True, do_bwd=True),
                carry, jnp.arange(C - 1, F, dtype=jnp.int32),
            )
            if C > 1:  # drain: backward only
                carry, _ = lax.scan(
                    partial(body, do_fwd=False, do_head=False, do_bwd=True),
                    carry, jnp.arange(F, F + C - 1, dtype=jnp.int32),
                )
            _, _, _, bufs, outs_dx, dstack, dpost, loss = carry
            # only device P-1 accumulated loss/dpost; only device 0 wrote
            # outs_dx — psum replicates them across the manual pipe axis
            loss = lax.psum(loss, pipe_axis)
            dpost = [lax.psum(g_, pipe_axis) for g_ in dpost]
            if track_dx:
                outs_dx = lax.psum(outs_dx, pipe_axis)
            return loss, dstack, dpost, bufs, outs_dx

        spec_p = P(pipe_axis)
        spec_r = P()
        n_bufs = len(self._buffers)
        local = jax.shard_map(
            _local,
            mesh=mesh,
            axis_names={pipe_axis},
            in_specs=(
                [spec_p] * len(stack_run),
                [spec_p] * n_bufs,
                [spec_r] * len(post_run),
                spec_r,
                spec_r,
            ),
            out_specs=(
                spec_r,
                [spec_p] * len(stack_run),
                [spec_r] * len(post_run),
                [spec_p] * n_bufs,
                spec_r if track_dx else None,
            ),
            check_vma=False,
        )
        loss, dstack, dpost_run, bufs, outs_dx = local(
            stack_run, list(buffer_arrays), post_run, x_micro, y_micro
        )

        dstack = [g_.astype(p.dtype) for g_, p in zip(dstack, stack_m)]
        dpost = [g_.astype(p.dtype) for g_, p in zip(dpost_run, post_m)]
        if vjp_pre is not None:
            (dpre_run,) = vjp_pre(outs_dx.reshape((B,) + feat[1:]))
            dpre = [g_.astype(p.dtype) for g_, p in zip(dpre_run, pre_m)]
        else:
            dpre = []
        grads = dpre + list(dstack) + list(dpost)
        new_bufs = (
            [nb.astype(b_.dtype) for nb, b_ in zip(bufs, buffer_arrays)]
            if cd is not None
            else list(bufs)
        )
        if self.grad_transform is not None:
            grads = self.grad_transform(grads)
        new_params, new_state = self.optimizer.pure_update(
            param_arrays, grads, opt_state, lr
        )
        return loss, new_params, new_bufs, new_state

    def _pure_eval(self, param_arrays, buffer_arrays, x):
        logits, _ = self._forward(
            param_arrays, buffer_arrays, x, self._eval_stage_fn
        )
        return logits

    # ------------------------------------------------------------------
    def __call__(self, x, y):
        from ..jit import _TRACE_LOCK

        dev = tpu()
        lr = np.float32(self.optimizer.lr)
        self._call_count += 1
        # whole gather -> dispatch -> write-back under the trace lock: see
        # CompiledTrainStep.__call__ (tracer gathers, mid-trace clobbers,
        # and the donated-buffer window; dispatch is async so this does not
        # serialize device execution)
        with _TRACE_LOCK:
            param_arrays = [_lz(p.data.array) for p in self._params]
            buffer_arrays = [_lz(b.data.array) for b in self._buffers]
            loss, new_params, new_bufs, new_state = self._jitted(
                param_arrays, buffer_arrays, self.optimizer._state, lr, x, y
            )
            for p, arr in zip(self._params, new_params):
                p.data = BackendTensor._wrap(arr, dev)
            for b, arr in zip(self._buffers, new_bufs):
                b.data = BackendTensor._wrap(arr, dev)
            self.optimizer._state = new_state
        return loss

    def eval_logits(self, x):
        """Jitted pipelined inference over the same mesh layout (eval-mode
        stages: BN running stats, no EMA update)."""
        from ..jit import _TRACE_LOCK

        # gather AND dispatch under the lock: a concurrent donate=True train
        # step deletes the gathered arrays inside its own locked window
        # (dispatch is async, so device execution is not serialized)
        with _TRACE_LOCK:
            pa = [_lz(p.data.array) for p in self._params]
            ba = [_lz(b.data.array) for b in self._buffers]
            return self._eval_jitted(pa, ba, x)
