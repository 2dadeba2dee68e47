"""Purification: run tape-API callables as array-level pure functions.

The trace-swapping protocol (save/restore the global tape, grad flag, PRNG
state, and parameter/buffer bindings under the trace lock) is delicate and
must stay identical everywhere it is used — ``jit.jit``, the pipeline's
stage functions, and the remat bridge all build on this one implementation.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from . import random as df_random
from .autograd import is_grad_enable, set_grad_enabled
from .backend import BackendTensor
from .tensor import Graph, Tensor


def purified_call(
    call: Callable,
    params: Sequence,
    buffers: Sequence,
    param_arrays,
    buffer_arrays,
    x_arr,
    dev,
    block_key=None,
):
    """Bind ``param_arrays``/``buffer_arrays`` onto the given Parameter/
    buffer Tensors, run ``call`` on ``x_arr`` with gradient recording OFF and
    a fresh tape, and return ``(y_array, new_buffer_arrays)`` — leaving every
    piece of global state (tape, grad flag, bindings, PRNG) exactly as it
    was.  ``block_key``, if given, is installed as the trace key for the
    duration so randomness (dropout) replays deterministically across
    repeated invocations (the remat recompute contract)."""
    from .jit import _TRACE_LOCK

    with _TRACE_LOCK:
        saved_p = [p.data for p in params]
        saved_b = [b.data for b in buffers]
        saved_tape = Graph.node_list
        Graph.node_list = []
        saved_flag = is_grad_enable()
        saved_rng = (df_random._trace_key, df_random._trace_counter)
        set_grad_enabled(False)
        if block_key is not None:
            df_random.set_trace_key(block_key)
        try:
            for p, a in zip(params, param_arrays):
                p.data = BackendTensor._wrap(a, dev)
            for b, a in zip(buffers, buffer_arrays):
                b.data = BackendTensor._wrap(a, dev)
            out = call(Tensor(BackendTensor._wrap(x_arr, dev)))
            new_bufs = [b.data.array for b in buffers]
            return out.data.array, new_bufs
        finally:
            for p, d in zip(params, saved_p):
                p.data = d
                p.children.clear()
                p.parents.clear()
            for b, d in zip(buffers, saved_b):
                b.data = d
            Graph.node_list = saved_tape
            set_grad_enabled(saved_flag)
            df_random._trace_key, df_random._trace_counter = saved_rng


def purify_fn(fn: Callable, dev=None) -> Callable:
    """Array-level version of a tape-API function (e.g. a criterion):
    wraps array args in Tensors, runs with grad recording off, unwraps."""
    from .backend import tpu
    from .jit import _TRACE_LOCK

    import jax

    dev = dev or tpu()

    def pure(*arrays):
        with _TRACE_LOCK:
            saved_tape = Graph.node_list
            Graph.node_list = []
            saved_flag = is_grad_enable()
            set_grad_enabled(False)
            try:
                tensors = [Tensor(BackendTensor._wrap(a, dev)) for a in arrays]
                out = fn(*tensors)
                return jax.tree.map(
                    lambda t: t.data.array if isinstance(t, Tensor) else t,
                    out,
                    is_leaf=lambda t: isinstance(t, Tensor),
                )
            finally:
                Graph.node_list = saved_tape
                set_grad_enabled(saved_flag)

    return pure
