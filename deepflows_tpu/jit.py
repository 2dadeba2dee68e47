"""Whole-step compilation: trace an entire tape-autograd training step
(forward + reverse tape walk + optimizer update + BN stat EMA + dropout PRNG)
into ONE fused XLA program.

This is the central TPU translation of the reference's execution model
(SURVEY §7.3 item 1): the reference launches a CUDA kernel per tiny op per
step (`DeepFlows/tensor.py` op classes dispatching through
`backend_tensor.py` to `ndarray_backend_cuda.cu`); uncompiled per-op dispatch
is catastrophic on TPU.  Because every deepflows_tpu op — including
``backward()``'s gradient math and the optimizers' pure cores — is expressed
over traceable jnp device ops, the define-by-run API compiles by tracing:
the tape is built once at trace time, and afterwards each step is a single
XLA executable with donated buffers (in-place parameter updates in HBM).

Usage::

    step = CompiledTrainStep(model, optimizer, criterion)
    for xb, yb in loader:
        loss = step(xb, yb)          # numpy in, device scalar out

The learning rate is read from ``optimizer.lr`` each call and passed as a
runtime scalar — LR schedulers never retrigger compilation.  A shape change
(e.g. a ragged final batch) does retrace; prefer ``drop_last=True``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

import threading

from . import random as df_random
from .autograd import set_grad_enabled
from .backend import BackendTensor, tpu
from .backend.lazy import force as _lz, materialize_tree as _lz_tree
from .config import config
from .tensor import Graph, Tensor

# tracing swaps the process-global tape; serialize traces across threads
# (e.g. the viz server trains in a daemon thread)
_TRACE_LOCK = threading.RLock()


def jit(fn: Callable) -> Callable:
    """Compile an arbitrary tape-API function into one XLA program.

    ``fn`` takes Tensors (and/or numpy arrays) and returns a Tensor or a
    pytree of Tensors; the wrapper traces it once per input shape:

        @df_jit.jit
        def fused_metric(logits, labels):
            p = F.softmax(logits, 1)
            return (p.argmax(1).eq(labels)).mean()

    Gradient recording is off inside (use CompiledTrainStep for training)."""
    import functools

    from .purify import purify_fn

    _traced = jax.jit(purify_fn(fn))

    @functools.wraps(fn)
    def wrapper(*args):
        arrays = [
            _lz(a.data.array)
            if isinstance(a, Tensor)
            else (a if hasattr(a, "dtype") else np.asarray(a))
            for a in args
        ]
        return _traced(*arrays)

    return wrapper


class CompiledTrainStep:
    def __init__(
        self,
        model,
        optimizer,
        criterion: Callable,
        donate: bool = True,
        metrics_fn: Optional[Callable] = None,
        compute_dtype=None,
        grad_transform: Optional[Callable] = None,
        accum_steps: int = 1,
    ):
        """``compute_dtype=jnp.bfloat16`` enables mixed precision: forward +
        backward run in bf16 on the MXU while master weights, gradients as
        seen by the optimizer, and optimizer state stay float32 (the opt-in
        path SURVEY §7.3 item 7 calls for).  ``grad_transform`` (e.g.
        ``optim.clip_by_global_norm(1.0)``) maps the list of grad arrays
        before the optimizer update, inside the fused program.

        ``accum_steps=N`` enables GRADIENT ACCUMULATION: the batch is split
        into N microbatches and forward+backward runs as a ``lax.scan``
        (activation memory is one microbatch's worth), gradients are
        averaged, and ONE optimizer update fires — large effective batches
        in fixed HBM.  The reported loss is the microbatch mean; a
        ``metrics_fn`` composes with accumulation (computed per microbatch
        and averaged — equal-size microbatches make a rate metric equal
        its big-batch value).  BatchNorm
        statistics are per-microbatch (running stats EMA chains N times per
        step, like N sequential small steps); dropout draws fresh masks per
        microbatch."""
        self.model = model
        self.optimizer = optimizer
        self.criterion = criterion
        self.metrics_fn = metrics_fn
        self.compute_dtype = compute_dtype
        self.grad_transform = grad_transform
        self.accum_steps = int(accum_steps)
        if self.accum_steps < 1:
            raise ValueError("accum_steps must be >= 1")

        self._device = tpu()
        if not self._device.enabled():
            raise RuntimeError("CompiledTrainStep requires the jax ('tpu') device")
        # move model to the jax device if it isn't there yet
        if any(p.device is not self._device for p in model.parameters()):
            model.to(self._device)

        self._params = [p for _, p in model.named_parameters()]
        self._buffers = [b for _, b in model.named_buffers()]
        # the optimizer may hold a SUBSET of model params (e.g. frozen-layer
        # training, `test/ResNet18_parameter_freezing_test.py` in the
        # reference) — map optimizer.params into model-param positions
        by_id = {id(p): i for i, p in enumerate(self._params)}
        try:
            self._opt_index = [by_id[id(p)] for p in optimizer.params]
        except KeyError:
            raise ValueError(
                "optimizer holds parameters that are not in the model"
            ) from None
        optimizer._ensure_state()
        # pre-place optimizer state on the device: host scalars in the state
        # (e.g. Adam's step counter t) would otherwise come back from call 1
        # as committed device arrays and force a SECOND full trace/compile —
        # minutes on a real chip (ShardedTrainStep already did this)
        optimizer._state = jax.tree.map(
            lambda a: None if a is None else jax.device_put(_lz(a)),
            optimizer._state,
            is_leaf=lambda a: a is None,
        )
        self.model.train()

        self._base_key = jax.random.key(config.seed + 1)
        self._call_count = 0
        donate_argnums = (0, 1, 2) if donate else ()
        self._jitted = jax.jit(self._pure_step, donate_argnums=donate_argnums)

        self._trace_count = 0  # observability: how many times XLA retraced

    # ------------------------------------------------------------------
    def _pure_step(self, param_arrays, buffer_arrays, opt_state, lr, step_idx, x, y):
        with _TRACE_LOCK:
            return self._pure_step_locked(
                param_arrays, buffer_arrays, opt_state, lr, step_idx, x, y
            )

    def _pure_step_locked(
        self, param_arrays, buffer_arrays, opt_state, lr, step_idx, x, y
    ):
        self._trace_count += 1
        dev = self._device
        saved_params = [p.data for p in self._params]
        saved_buffers = [b.data for b in self._buffers]
        saved_tape = Graph.node_list
        Graph.node_list = []
        df_random.set_trace_key(jax.random.fold_in(self._base_key, step_idx))
        from .autograd import is_grad_enable

        saved_grad_flag = is_grad_enable()
        set_grad_enabled(True)
        cd = self.compute_dtype
        try:
            for p, arr in zip(self._params, param_arrays):
                # mixed precision: bind a low-precision COPY for compute;
                # the f32 master copy in param_arrays feeds the optimizer
                p.data = BackendTensor._wrap(
                    arr.astype(cd) if cd is not None else arr, dev
                )
                p.grad = None
                Graph.add(p)
            for b, arr in zip(self._buffers, buffer_arrays):
                b.data = BackendTensor._wrap(arr, dev)
            import jax.numpy as jnp

            x_in = x.astype(cd) if cd is not None and jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating
            ) else x

            def fwd_bwd(xb, yb):
                """One microbatch forward+backward on a fresh tape; params
                and buffers are read from their current bindings.  Returns
                (loss array, grads list with None for no-grad params,
                metrics pytree of arrays or None) — metrics are computed
                INSIDE so the accumulation scan can emit them per
                microbatch."""
                Graph.node_list = []
                for p in self._params:
                    p.grad = None
                    p.children.clear()
                    p.parents.clear()
                    Graph.add(p)
                xt = Tensor(BackendTensor._wrap(xb, dev))
                yt = Tensor(BackendTensor._wrap(yb, dev))
                out = self.model(xt)
                loss = self.criterion(out, yt)
                loss.backward(retain_graph=True)
                grads = [
                    (p.grad.array if p.grad is not None else None)
                    for p in self._params
                ]
                if cd is not None:
                    grads = [
                        None if g is None else g.astype(jnp.float32)
                        for g in grads
                    ]
                m = None
                if self.metrics_fn is not None:
                    m = jax.tree.map(
                        lambda v: v.data.array if isinstance(v, Tensor) else v,
                        self.metrics_fn(out, yt),
                    )
                return loss.data.array, grads, m

            if self.accum_steps == 1:
                loss_arr, grads, metrics = fwd_bwd(x_in, y)
            else:
                loss_arr, grads, metrics = self._accumulated(
                    x_in, y, fwd_bwd, jnp
                )
            if self.grad_transform is not None:
                grads = self.grad_transform(grads)
            opt_params = [param_arrays[i] for i in self._opt_index]
            opt_grads = [grads[i] for i in self._opt_index]
            new_opt_params, new_opt_state = self.optimizer.pure_update(
                opt_params, opt_grads, opt_state, lr
            )
            new_params = list(param_arrays)
            for i, arr in zip(self._opt_index, new_opt_params):
                new_params[i] = arr
            # buffers (e.g. BN running stats) keep their original dtype even
            # when the forward mutated them with compute-dtype values
            new_buffers = [
                b.data.array.astype(orig.array.dtype)
                if b.data.array.dtype != orig.array.dtype
                else b.data.array
                for b, orig in zip(self._buffers, saved_buffers)
            ]
            loss_out = loss_arr
            if cd is not None:
                loss_out = loss_out.astype(jnp.float32)
            return loss_out, new_params, new_buffers, new_opt_state, metrics
        finally:
            for p, d in zip(self._params, saved_params):
                p.data = d
                p.grad = None
                p.children.clear()
                p.parents.clear()
            for b, d in zip(self._buffers, saved_buffers):
                b.data = d
            Graph.node_list = saved_tape
            df_random.clear_trace_key()
            set_grad_enabled(saved_grad_flag)

    # ------------------------------------------------------------------
    def _accumulated(self, x, y, fwd_bwd, jnp):
        """Gradient accumulation: microbatch 0 runs inline (discovering the
        grad structure — which params have None grads is trace-static), the
        remaining accum_steps-1 microbatches run as a ``lax.scan`` whose
        carry is (grad accumulators, buffer arrays, microbatch index), so
        compiled activation memory is ONE microbatch's worth."""
        from jax import lax

        n = self.accum_steps
        batch = x.shape[0]
        if batch % n:
            raise ValueError(
                f"batch size {batch} not divisible by accum_steps {n}"
            )
        micro = batch // n
        xm = x.reshape((n, micro) + x.shape[1:])
        ym = y.reshape((n, micro) + y.shape[1:])
        step_key = df_random.get_trace_key()
        loss0, grads0, metrics0 = fwd_bwd(xm[0], ym[0])
        buf0 = [b.data.array for b in self._buffers]
        dev = self._device

        def body(carry, xy):
            grads_acc, bufs, k = carry
            xb, yb = xy
            for b, arr in zip(self._buffers, bufs):
                b.data = BackendTensor._wrap(arr, dev)
            df_random.set_trace_key(jax.random.fold_in(step_key, k))
            loss_k, grads_k, metrics_k = fwd_bwd(xb, yb)
            new_acc = [
                None if a is None else a + g
                for a, g in zip(grads_acc, grads_k)
            ]
            new_bufs = [b.data.array for b in self._buffers]
            return (new_acc, new_bufs, k + 1), (loss_k, metrics_k)

        (grads_fin, bufs_fin, _), (losses, metrics_ys) = lax.scan(
            body, (grads0, buf0, jnp.int32(1)), (xm[1:], ym[1:])
        )
        # the body left the global trace key bound to a scan-local tracer;
        # restore a valid key for anything drawing randomness after the scan
        df_random.set_trace_key(jax.random.fold_in(step_key, n))
        for b, arr in zip(self._buffers, bufs_fin):
            b.data = BackendTensor._wrap(arr, dev)
        # a mean-reduction criterion averaged within each microbatch, so the
        # cross-microbatch combine is also a mean; a sum-reduction criterion
        # must SUM (dividing would silently rescale the effective lr)
        mean_like = getattr(self.criterion, "reduction", "mean") != "sum"
        scale = (1.0 / n) if mean_like else 1.0
        grads = [None if g is None else g * scale for g in grads_fin]
        loss = (loss0 + losses.sum()) * scale
        # metrics: mean across microbatches (equal-size microbatches, so a
        # rate metric like accuracy-in-step equals the big-batch value)
        metrics = None
        if metrics0 is not None:
            metrics = jax.tree.map(
                lambda m0, ms: (m0 + ms.sum(0)) / n, metrics0, metrics_ys
            )
        return loss, grads, metrics

    # ------------------------------------------------------------------
    def __call__(self, x, y):
        dev = self._device
        lr = np.float32(self.optimizer.lr)
        step_idx = np.int32(self._call_count)
        self._call_count += 1
        # the WHOLE gather -> dispatch -> write-back sequence runs under the
        # trace lock, making the parameter mutation atomic w.r.t. concurrent
        # traces and gatherers (the serving-while-training scenario):
        # - gathering mid-trace would read TRACERS a trace temporarily binds
        #   into the shared params (UnexpectedTracerError — caught by the
        #   serving concurrency test);
        # - writing back mid-trace would clobber a trace's bindings AND let
        #   its finally-restore discard this step's update;
        # - between dispatch and write-back the old arrays are DONATED
        #   (dead) — a concurrent eval gather in that window would read
        #   deleted buffers.
        # jax dispatch is async, so holding the lock here does not serialize
        # device execution.
        with _TRACE_LOCK:
            param_arrays = [_lz(p.data.array) for p in self._params]
            buffer_arrays = [_lz(b.data.array) for b in self._buffers]
            opt_state = _lz_tree(self.optimizer._state)
            # pass x/y through as-is: jit transfers numpy host arrays itself,
            # and np.asarray on an on-device jax array would force a D2H copy
            loss, new_params, new_buffers, new_opt_state, metrics = self._jitted(
                param_arrays, buffer_arrays, opt_state, lr, step_idx, x, y
            )
            for p, arr in zip(self._params, new_params):
                p.data = BackendTensor._wrap(arr, dev)
            for b, arr in zip(self._buffers, new_buffers):
                b.data = BackendTensor._wrap(arr, dev)
            self.optimizer._state = new_opt_state
        self._last_metrics = metrics
        return loss


class CompiledEvalStep:
    """Jitted inference: forward in eval mode (running BN stats, dropout off),
    returning raw logits as a device array."""

    def __init__(self, model):
        self.model = model
        self._device = tpu()
        if not self._device.enabled():
            raise RuntimeError("CompiledEvalStep requires the jax ('tpu') device")
        if any(p.device is not self._device for p in model.parameters()):
            model.to(self._device)
        self._params = [p for _, p in model.named_parameters()]
        self._buffers = [b for _, b in model.named_buffers()]
        self._jitted = jax.jit(self._pure_forward)

    def _pure_forward(self, param_arrays, buffer_arrays, x):
        with _TRACE_LOCK:
            return self._pure_forward_locked(param_arrays, buffer_arrays, x)

    def _pure_forward_locked(self, param_arrays, buffer_arrays, x):
        dev = self._device
        saved_params = [p.data for p in self._params]
        saved_buffers = [b.data for b in self._buffers]
        saved_tape = Graph.node_list
        Graph.node_list = []
        was_training = self.model.training
        from .autograd import is_grad_enable

        saved_grad_flag = is_grad_enable()
        self.model.eval()  # also disables grad recording globally
        try:
            for p, arr in zip(self._params, param_arrays):
                p.data = BackendTensor._wrap(arr, dev)
            for b, arr in zip(self._buffers, buffer_arrays):
                b.data = BackendTensor._wrap(arr, dev)
            out = self.model(Tensor(BackendTensor._wrap(x, dev)))
            return out.data.array
        finally:
            for p, d in zip(self._params, saved_params):
                p.data = d
            for b, d in zip(self._buffers, saved_buffers):
                b.data = d
            Graph.node_list = saved_tape
            if was_training:
                self.model.train()
            set_grad_enabled(saved_grad_flag)

    def __call__(self, x):
        # keep on-device inputs on device (np.asarray would force D2H)
        if not hasattr(x, "dtype"):
            x = np.asarray(x)
        # gather AND dispatch under the trace lock (see
        # CompiledTrainStep.__call__): a concurrent CompiledTrainStep with
        # donate=True deletes the gathered arrays inside its own locked
        # window — dispatching outside the lock would then read donated
        # (dead) buffers.  Dispatch is async, so this does not serialize
        # device execution.
        with _TRACE_LOCK:
            param_arrays = [_lz(p.data.array) for p in self._params]
            buffer_arrays = [_lz(b.data.array) for b in self._buffers]
            return self._jitted(param_arrays, buffer_arrays, x)
