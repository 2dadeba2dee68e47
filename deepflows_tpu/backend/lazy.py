"""LazyTensor deferred execution for the eager TPU path.

The eager tape (unmodified reference scripts through the ``DeepFlows/`` shim,
or any imperative use of the framework) dispatches one XLA program per op —
correct, but each dispatch pays launch latency, and no fusion happens across
ops.  This module closes that gap the way PyTorch itself runs on TPU
(torch/XLA's LazyTensor: record, then compile the recorded graph): device
ops RECORD into a fragment instead of executing, and the fragment is
compiled+run as ONE jitted XLA program at the first host readback.  Because
training loops repeat the identical op structure every iteration, the
compiled fragment is cached on its structural signature — from iteration 2
on, an entire train step (forward + backward + optimizer) is one cached
dispatch, like ``jit.CompiledTrainStep``, but with **zero changes to user
code**.

Design (TPU-first; no reference analog — the reference is eager-only):

- ``LazyArray`` stands in for a ``jax.Array`` inside ``BackendTensor``.  It
  carries only (shape, dtype) metadata until materialized.  ``__jax_array__``
  / ``__array__`` make stray consumers (numpy conversion, eager jnp ops on a
  mixed pair) force materialization instead of crashing — the safety net for
  any path this module does not intercept.
- recording is generic: ``record_call(fn, args, kwargs)`` walks the argument
  pytree, turns array-likes into traced fragment inputs and everything else
  into static structure, and infers output shapes via ``jax.eval_shape``
  (cached per (fn, structure, input avals) — a dict hit per op after the
  first iteration).
- flush compiles ``replay(leaves) -> live outputs`` with ``jax.jit``.  Only
  arrays still referenced from Python are fragment outputs; dead
  intermediates (forward activations after ``backward()``, for instance)
  stay internal to the program, where XLA fuses them away — eager mode must
  materialize every one of them to HBM.
- anything that cannot be traced (boolean-mask indexing, a fragment that
  fails under jit) degrades per-op or per-fragment to eager execution —
  lazy mode never changes semantics, only batching.

Scalars appearing as operands are recorded as *traced* 0-d inputs coerced to
the array operand's dtype (the tape's bf16-purity rule), so a changing
learning rate or epsilon does NOT change the fragment signature — schedulers
never retrigger compilation.

Structural replay (r3 VERDICT item 3 — the torch/XLA LazyIR-hash idea):
full recording costs ~64 µs/op of Python (arg walking, skeleton hashing,
node/weakref construction) — ~69 ms/step on ResNet50's 1076-op tape, the
whole gap to ``jit.CompiledTrainStep``.  After a fragment flushes through a
compiled runner it is promoted to a *template*; the next step's ops are
matched against the template cursor with cheap identity/static compares
(`_fast_record`: no skeleton build, no aval-cache hash, no Node allocation),
and the flush feeds the new leaves straight to the cached runner.  A
mismatch clones the matched prefix into a normal fragment (`_fast_leave`)
and recording continues unchanged — semantics never depend on the fast
path, only step latency does.  Up to ``_MAX_TEMPLATES`` recent step
structures are kept so train/eval phase changes re-match instead of
re-recording.

Enable with ``deepflows_tpu.lazy.enable()`` (or ``DEEPFLOWS_LAZY=1`` in the
environment); ``disable()`` materializes pending work and restores plain
eager dispatch.
"""

from __future__ import annotations

import os
import threading
import weakref
from collections import namedtuple

import numpy as np

__all__ = [
    "LazyArray",
    "enable",
    "disable",
    "enabled",
    "force",
    "flush",
    "record_call",
    "lazy_stats",
]

_Ref = namedtuple("_Ref", ["node", "pos"])  # output `pos` of fragment node `node`
_Leaf = namedtuple("_Leaf", ["idx"])  # fragment input `idx`

# fragments larger than this auto-flush (bounds compile time for scripts that
# never read back; the boundary is deterministic given the same op sequence,
# so cache keys stay stable across iterations)
MAX_NODES = int(os.environ.get("DEEPFLOWS_LAZY_MAX_NODES", "8192"))

_LOCK = threading.RLock()


class _Aval:
    """Lightweight (shape, dtype) — jax.ShapeDtypeStruct costs ~30 µs to
    construct (validation + __setattr__ machinery); this is a plain slotted
    pair, duck-compatible with everything lazy mode needs (jax.eval_shape
    accepts any object with .shape/.dtype)."""

    __slots__ = ("shape", "dtype")

    def __init__(self, shape, dtype):
        self.shape = shape
        self.dtype = dtype


def _trace_clean():
    """True iff no jax trace (jit/grad/vmap) is active on this thread
    (~0.5 µs — cheap enough to probe on every recorded op)."""
    global _trace_clean
    try:
        from jax._src.core import trace_state_clean as _tsc

        _trace_clean = _tsc  # rebind: later calls skip the import
        return _tsc()
    except Exception:  # pragma: no cover - future-jax fallback
        import jax

        def _scan_based():
            # conservative: report "maybe tracing" only when a tracer is
            # actually live on the stack is impossible to know cheaply, so
            # fall back to always-clean and rely on the per-arg tracer
            # check in _walk/_is_traced (tracers ARE jax types and would be
            # recorded as leaves — reject them there instead)
            return True

        _trace_clean = _scan_based
        return True


class _Node:
    __slots__ = (
        "fn",
        "args_proto",
        "kwargs_proto",
        "out_refs",
        "out_avals",
        "treedef",
        "_idx",
    )

    def __init__(self, fn, args_proto, kwargs_proto):
        self.fn = fn
        self.args_proto = args_proto
        self.kwargs_proto = kwargs_proto
        self.out_refs = ()  # weakrefs to output LazyArrays, set after creation
        self.out_avals = ()
        self.treedef = None
        self._idx = -1


class _Fragment:
    __slots__ = ("nodes", "leaves", "leaf_ids", "leaf_avals", "sig")

    def __init__(self):
        self.nodes = []
        self.leaves = []  # concrete arrays, in first-encounter order
        self.leaf_ids = {}  # id(array) -> leaf index
        self.leaf_avals = []
        self.sig = []  # hashable per-node signatures

    def leaf_index(self, arr):
        key = id(arr)
        idx = self.leaf_ids.get(key)
        if idx is None:
            idx = len(self.leaves)
            self.leaves.append(arr)
            self.leaf_avals.append(_aval_of(arr))
            self.leaf_ids[key] = idx
        return idx


_frag = _Fragment()
_runner_cache = {}  # structural key -> compiled replay (or "eager" marker)
_aval_cache = {}  # (fn, skeleton, in_avals) -> (out_avals, treedef)
_stats = {"nodes": 0, "flushes": 0, "compiles": 0, "eager_fallback_ops": 0,
          "eager_fallback_fragments": 0, "fast_ops": 0, "fast_flushes": 0,
          "fast_fallbacks": 0}


def lazy_stats() -> dict:
    """Counters for tests/diagnostics (cumulative since import)."""
    return dict(_stats)


# ------------------------------------------------------- structural replay
_MAX_TEMPLATES = int(os.environ.get("DEEPFLOWS_LAZY_TEMPLATES", "4"))


class _Template:
    """A flushed fragment promoted to a replayable step structure.  Holds
    the recorded nodes (protos reference each other by object identity, so
    the node list is self-contained), the per-slot leaf avals, the sig (for
    prefix-clone fallback), and compiled runners keyed by live-output
    index — a step whose live outputs differ (e.g. the user kept an extra
    intermediate) compiles its own subset program once."""

    __slots__ = ("nodes", "sig", "leaf_avals", "runners")

    def __init__(self, frag):
        self.nodes = frag.nodes
        self.sig = frag.sig
        self.leaf_avals = frag.leaf_avals
        self.runners = {}


class _FastState:
    """Cursor state for one step being matched against a template."""

    __slots__ = ("tpl", "cursor", "leaves", "outs")

    def __init__(self, tpl):
        self.tpl = tpl
        self.cursor = 0
        self.leaves = []  # slot-indexed concrete arrays (prefix-contiguous)
        self.outs = []  # per matched node: tuple of weakrefs to outputs


_templates = []  # MRU-ordered, capped at _MAX_TEMPLATES
_fast = None  # active _FastState, or None (normal recording)
_MISS = object()
_SCALAR_CACHE = {}  # (type, value, dtype) -> 0-d np array (see _coerce)


def _tree_unflatten(treedef, leaves):
    global _tree_unflatten
    from jax.tree_util import tree_unflatten as tu

    _tree_unflatten = tu  # rebind: later calls skip the import machinery
    return tu(treedef, leaves)


def _match_arg(proto, val, fast):
    """Does ``val`` fill the same structural role as ``proto`` did in the
    template step?  Assigns concrete leaves into ``fast.leaves`` by the
    template's slot index as a side effect (rolled back by the caller on a
    miss).  _Leaf/_Ref are namedtuples — they must be tested before the
    generic tuple branch."""
    tp = type(proto)
    if tp is _Leaf:
        if isinstance(val, LazyArray):
            raw = val._value
            if raw is None:
                return False  # pending where the template had a concrete
        elif _is_traced(val):
            raw = val
        else:
            return False
        idx = proto.idx
        leaves = fast.leaves
        if idx == len(leaves):
            a = fast.tpl.leaf_avals[idx]
            if np.shape(raw) != a.shape:
                return False
            dt = getattr(raw, "dtype", None)
            if dt != a.dtype:
                return False
            leaves.append(raw)
            return True
        if idx < len(leaves):
            # template shared this slot (same array object seen twice):
            # the new step must exhibit the same sharing
            return leaves[idx] is raw
        return False  # out-of-order first encounter: different structure
    if tp is _Ref:
        return (
            isinstance(val, LazyArray)
            and val._value is None
            and val._node is proto.node
            and val._pos == proto.pos
        )
    if isinstance(proto, (list, tuple)):
        if type(val) is not tp or len(val) != len(proto):
            return False
        for p, v in zip(proto, val):
            if not _match_arg(p, v, fast):
                return False
        return True
    if isinstance(proto, dict):
        if type(val) is not dict or list(val) != list(proto):
            return False
        for k in proto:
            if not _match_arg(proto[k], val[k], fast):
                return False
        return True
    # static: identity first (interned names, cached dtypes), then equality
    if proto is val:
        return True
    try:
        return type(proto) is type(val) and bool(proto == val)
    except Exception:
        return False


def _fast_record(fast, fn, args, kwargs):
    """Match one op against the template cursor.  On a hit, returns the
    output pytree (new LazyArrays bound to the TEMPLATE node — prior steps'
    arrays are materialized, so identity stays unambiguous) without any of
    the full recording path's skeleton/aval/Node work."""
    node = fast.tpl.nodes[fast.cursor]
    if fn is not node.fn:
        return _MISS
    ap = node.args_proto
    if len(args) != len(ap):
        return _MISS
    n_before = len(fast.leaves)
    ok = True
    for p, v in zip(ap, args):
        if not _match_arg(p, v, fast):
            ok = False
            break
    if ok:
        kp = node.kwargs_proto
        if kwargs or kp:
            if list(kwargs) != list(kp):
                ok = False
            else:
                for k in kp:
                    if not _match_arg(kp[k], kwargs[k], fast):
                        ok = False
                        break
    if not ok:
        del fast.leaves[n_before:]  # roll back this op's slot assignments
        return _MISS
    outs = [LazyArray(av, node, i) for i, av in enumerate(node.out_avals)]
    fast.outs.append(tuple(weakref.ref(o) for o in outs))
    fast.cursor += 1
    _stats["nodes"] += 1
    _stats["fast_ops"] += 1
    return _tree_unflatten(node.treedef, outs)


def _remap_proto(proto, mapping):
    """Rewrite _Refs from template nodes to their prefix clones (namedtuple
    check must precede the generic tuple branch)."""
    tp = type(proto)
    if tp is _Ref:
        return _Ref(mapping[id(proto.node)], proto.pos)
    if tp is _Leaf:
        return proto
    if isinstance(proto, list):
        return [_remap_proto(p, mapping) for p in proto]
    if isinstance(proto, tuple):
        return tuple(_remap_proto(p, mapping) for p in proto)
    if isinstance(proto, dict):
        return {k: _remap_proto(v, mapping) for k, v in proto.items()}
    return proto


def _fast_leave(fast):
    """Structure diverged mid-template: clone the matched prefix into a
    normal fragment (protos remapped onto fresh nodes, live outputs
    retargeted) and hand recording back to the full path.  O(prefix) of
    pure structure work — no shape inference, no hashing."""
    global _frag, _fast
    _fast = None
    _stats["fast_fallbacks"] += 1
    k = fast.cursor
    frag = _Fragment()
    if k:
        tpl = fast.tpl
        mapping = {}
        for j in range(k):
            old = tpl.nodes[j]
            clone = _Node(old.fn, None, None)
            clone.args_proto = _remap_proto(old.args_proto, mapping)
            clone.kwargs_proto = _remap_proto(old.kwargs_proto, mapping)
            clone.out_avals = old.out_avals
            clone.treedef = old.treedef
            clone._idx = j
            refs = fast.outs[j]
            for r in refs:
                la = r()
                if la is not None and la._value is None:
                    la._node = clone
            clone.out_refs = refs
            mapping[id(old)] = clone
            frag.nodes.append(clone)
            frag.sig.append(tpl.sig[j])
        frag.leaves = fast.leaves
        frag.leaf_avals = list(tpl.leaf_avals[: len(fast.leaves)])
        frag.leaf_ids = {id(a): i for i, a in enumerate(fast.leaves)}
    _frag = frag


class _FragShim:
    __slots__ = ("nodes", "leaves")

    def __init__(self, nodes, leaves):
        self.nodes = nodes
        self.leaves = leaves


def _fast_flush(fast):
    """Dispatch a fully-matched step: the template's cached runner gets the
    new leaves directly — zero re-recording."""
    global _fast
    tpl = fast.tpl
    _fast = None
    _stats["flushes"] += 1
    _stats["fast_flushes"] += 1
    outputs = []
    for ni, refs in enumerate(fast.outs):
        for pi, r in enumerate(refs):
            la = r()
            if la is not None and la._value is None:
                outputs.append((ni, pi, la))
    out_index = tuple((ni, pi) for ni, pi, _ in outputs)
    runner = tpl.runners.get(out_index)
    if runner is None:
        runner = _build_runner(tpl, list(out_index))
        tpl.runners[out_index] = runner
        _stats["compiles"] += 1
    try:
        vals = runner(tpl.nodes, fast.leaves)
    except Exception:
        vals = _replay_eager(
            _FragShim(tpl.nodes, fast.leaves), list(out_index)
        )
        _stats["eager_fallback_fragments"] += 1
    for (ni, pi, la), v in zip(outputs, vals):
        la._value = v
        la._node = None
    _touch_template(tpl)
    _fast = _FastState(tpl)


def _touch_template(tpl):
    try:
        _templates.remove(tpl)
    except ValueError:
        pass
    _templates.insert(0, tpl)


def _promote(frag, out_index, runner):
    """After a successful compiled flush, make the fragment the active
    template for the next step.  An existing template with the same sig is
    updated in place (alternating phases reuse their runners) instead of
    piling up duplicates."""
    global _fast
    for t in _templates:
        if t.sig == frag.sig:
            t.runners[tuple(out_index)] = runner
            # adopt the fresh nodes/avals: protos in the old template refer
            # to ITS node objects; keep them consistent by replacing whole
            t.nodes = frag.nodes
            t.leaf_avals = frag.leaf_avals
            _touch_template(t)
            _fast = _FastState(t)
            return
    tpl = _Template(frag)
    tpl.runners[tuple(out_index)] = runner
    _templates.insert(0, tpl)
    del _templates[_MAX_TEMPLATES:]
    _fast = _FastState(tpl)


class LazyArray:
    """Deferred device array: metadata now, value at first readback."""

    __slots__ = ("_node", "_pos", "_value", "aval", "__weakref__")
    _is_lazy = True

    def __init__(self, aval, node=None, pos=0, value=None):
        self.aval = aval
        self._node = node
        self._pos = pos
        self._value = value

    # ------------------------------------------------------------ metadata
    @property
    def shape(self):
        return self.aval.shape

    @property
    def dtype(self):
        return self.aval.dtype

    @property
    def ndim(self):
        return len(self.aval.shape)

    @property
    def size(self):
        n = 1
        for d in self.aval.shape:
            n *= d
        return n

    @property
    def T(self):
        return _record_xp("transpose", self)

    def __len__(self):
        if not self.aval.shape:
            raise TypeError("len() of a 0-d array")
        return self.aval.shape[0]

    # ------------------------------------------------------------ readback
    def force(self):
        """Materialize (flushing the pending fragment if needed)."""
        if self._value is None:
            flush()
            if self._value is None:  # pragma: no cover - defensive
                raise RuntimeError("lazy array did not materialize on flush")
        return self._value

    def __jax_array__(self):
        return self.force()

    def __array__(self, dtype=None):
        a = np.asarray(self.force())
        return a.astype(dtype) if dtype is not None else a

    def __float__(self):
        return float(np.asarray(self))

    def __int__(self):
        return int(np.asarray(self))

    def __bool__(self):
        return bool(np.asarray(self))

    def __repr__(self):
        if self._value is not None:
            return f"LazyArray(concrete, {self._value!r})"
        return f"LazyArray(pending, shape={self.aval.shape}, dtype={self.aval.dtype})"

    # ------------------------------------------------------------ methods
    def astype(self, dtype):
        return _record_xp("asarray", self, dtype=np.dtype(dtype).name)

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return _record_xp("reshape", self, tuple(shape))

    def transpose(self, axes=None):
        return _record_xp("transpose", self, axes)

    def sum(self, axis=None, keepdims=False):
        return _record_xp("sum", self, axis=axis, keepdims=keepdims)

    def mean(self, axis=None, keepdims=False):
        return _record_xp("mean", self, axis=axis, keepdims=keepdims)

    def max(self, axis=None, keepdims=False):
        return _record_xp("max", self, axis=axis, keepdims=keepdims)

    def min(self, axis=None, keepdims=False):
        return _record_xp("min", self, axis=axis, keepdims=keepdims)

    def item(self):
        return np.asarray(self).item()

    # ------------------------------------------------------------ operators
    def _coerce(self, other):
        """Python scalars become traced 0-d inputs in the operand's dtype
        (bf16 purity; traced so changing values don't change the fragment
        signature).  jnp.issubdtype, not np: bf16 is an ml_dtypes extension
        outside numpy's type lattice.

        The coerced array is CACHED by (type, value, dtype): recurring
        constants (the 1.0 in ``x + 1.0``, an optimizer epsilon) come back
        as the SAME object every step, so leaf dedup-by-identity folds them
        into one fragment input and the structural fast path's identity
        check holds across steps.  jnp ops never mutate inputs, so sharing
        is safe."""
        if isinstance(other, LazyArray):
            return other
        if isinstance(other, bool):
            return other  # static
        if isinstance(other, (int, float, np.integer, np.floating)):
            key = (type(other), other, self.aval.dtype)
            c = _SCALAR_CACHE.get(key)
            if c is None:
                import jax.numpy as jnp

                dt = self.aval.dtype
                if jnp.issubdtype(dt, jnp.floating):
                    c = np.asarray(other, dt)
                elif isinstance(other, (int, np.integer)):
                    c = np.asarray(other, np.int32)
                else:
                    c = np.asarray(other, np.float32)
                if len(_SCALAR_CACHE) > 65536:  # bounded (scheduled lrs etc.)
                    _SCALAR_CACHE.clear()
                _SCALAR_CACHE[key] = c
            return c
        return other  # jax/np arrays pass through as traced leaves

    def _bin(self, name, other, reverse=False):
        other = self._coerce(other)
        if reverse:
            return _record_xp(name, other, self)
        return _record_xp(name, self, other)

    def __add__(self, o):
        return self._bin("add", o)

    def __radd__(self, o):
        return self._bin("add", o, True)

    def __sub__(self, o):
        return self._bin("subtract", o)

    def __rsub__(self, o):
        return self._bin("subtract", o, True)

    def __mul__(self, o):
        return self._bin("multiply", o)

    def __rmul__(self, o):
        return self._bin("multiply", o, True)

    def __truediv__(self, o):
        return self._bin("true_divide", o)

    def __rtruediv__(self, o):
        return self._bin("true_divide", o, True)

    def __pow__(self, o):
        return self._bin("power", o)

    def __rpow__(self, o):
        return self._bin("power", o, True)

    def __mod__(self, o):
        return self._bin("mod", o)

    def __neg__(self):
        return _record_xp("negative", self)

    def __abs__(self):
        return _record_xp("abs", self)

    def __matmul__(self, o):
        return self._bin("matmul", o)

    def __rmatmul__(self, o):
        return self._bin("matmul", o, True)

    def __eq__(self, o):
        return self._bin("equal", o)

    def __ne__(self, o):
        return self._bin("not_equal", o)

    def __ge__(self, o):
        return self._bin("greater_equal", o)

    def __le__(self, o):
        return self._bin("less_equal", o)

    def __gt__(self, o):
        return self._bin("greater", o)

    def __lt__(self, o):
        return self._bin("less", o)

    __hash__ = None  # value semantics, like BackendTensor

    def __getitem__(self, idx):
        return record_call(_getitem_impl, (self, idx), {})


def _getitem_impl(arr, idx):
    return arr[idx]


# ---------------------------------------------------------------- traversal
def _is_traced(x):
    if isinstance(x, LazyArray):
        return True
    if isinstance(x, np.ndarray) or isinstance(x, np.generic):
        return True
    mod = type(x).__module__
    return mod.startswith("jaxlib") or mod.startswith("jax")


def _walk(obj, frag, skel_out, aval_sig):
    """Build (proto, skeleton) for one argument structure in ONE pass.

    proto: same nesting, traced leaves replaced by _Ref/_Leaf
    skeleton (appended to skel_out): hashable mirror for the runner key
    aval_sig: (shape, dtype) of each traced leaf, in traversal order — the
    shape-inference cache key piece, collected here so the hot path never
    re-traverses the proto
    """
    if isinstance(obj, LazyArray):
        if obj._value is not None:
            li = frag.leaf_index(obj._value)
            skel_out.append(("l", li))
            a = frag.leaf_avals[li]
            aval_sig.append((a.shape, a.dtype))
            return _Leaf(li)
        # pending: must belong to the current fragment
        node = obj._node
        pos = obj._pos
        skel_out.append(("n", node._idx, pos))
        a = node.out_avals[pos]
        aval_sig.append((a.shape, a.dtype))
        return _Ref(node, pos)
    if _is_traced(obj):
        import jax

        if isinstance(obj, jax.core.Tracer):  # pragma: no cover - guarded
            raise RuntimeError(
                "attempted to record a jax Tracer into a lazy fragment "
                "(active trace not detected?)"
            )
        li = frag.leaf_index(obj)
        skel_out.append(("l", li))
        a = frag.leaf_avals[li]
        aval_sig.append((a.shape, a.dtype))
        return _Leaf(li)
    if isinstance(obj, (list, tuple)):
        sub = []
        proto = [_walk(o, frag, sub, aval_sig) for o in obj]
        skel_out.append((type(obj).__name__, tuple(sub)))
        return type(obj)(proto) if isinstance(obj, tuple) else proto
    if isinstance(obj, dict):
        sub = []
        proto = {}
        for k in obj:  # preserve insertion order; keys assumed static
            sub.append(("k", k))
            proto[k] = _walk(obj[k], frag, sub, aval_sig)
        skel_out.append(("dict", tuple(sub)))
        return proto
    # static leaf
    skel_out.append(("s", _static_key(obj)))
    return obj


def _strip_dataflow(skel):
    """Position-independent mirror of a skeleton: node/leaf refs collapse to
    a placeholder.  Shape inference depends only on (fn, statics, input
    avals) — embedding fragment positions in the aval-cache key would make
    every step of a multi-step fragment miss and re-trace eval_shape."""
    out = []
    for s in skel:
        tag = s[0]
        if tag == "n" or tag == "l":
            out.append(_T)
        elif (tag == "list" or tag == "tuple" or tag == "dict") and isinstance(
            s[1], tuple
        ):
            out.append((tag, _strip_dataflow(s[1])))
        else:
            out.append(s)
    return tuple(out)


_T = ("t",)


def _static_key(obj):
    try:
        hash(obj)
        return obj
    except TypeError:
        if isinstance(obj, slice):
            return ("slice", obj.start, obj.stop, obj.step)
        return repr(obj)


def _rebuild(proto, leaf_vals, node_vals):
    """Substitute concrete values into a recorded proto structure."""
    if isinstance(proto, _Leaf):
        return leaf_vals[proto.idx]
    if isinstance(proto, _Ref):
        return node_vals[id(proto.node)][proto.pos]
    if isinstance(proto, list):
        return [_rebuild(p, leaf_vals, node_vals) for p in proto]
    if isinstance(proto, tuple):
        return tuple(_rebuild(p, leaf_vals, node_vals) for p in proto)
    if isinstance(proto, dict):
        return {k: _rebuild(v, leaf_vals, node_vals) for k, v in proto.items()}
    return proto


def _proto_avals(proto, frag, out):
    """Collect ShapeDtypeStructs of traced leaves in traversal order."""
    if isinstance(proto, _Leaf):
        out.append(frag.leaf_avals[proto.idx])
    elif isinstance(proto, _Ref):
        out.append(proto.node.out_avals[proto.pos])
    elif isinstance(proto, (list, tuple)):
        for p in proto:
            _proto_avals(p, frag, out)
    elif isinstance(proto, dict):
        for v in proto.values():
            _proto_avals(v, frag, out)


# ---------------------------------------------------------------- recording
def _aval_of(x):
    if isinstance(x, LazyArray):
        return x.aval
    dt = getattr(x, "dtype", None)
    if dt is None:
        dt = np.asarray(x).dtype
    return _Aval(np.shape(x), dt)


def record_call(fn, args, kwargs):
    """Record ``fn(*args, **kwargs)`` into the current fragment.

    Array-likes in args/kwargs become traced inputs, everything else is
    static.  Returns the output pytree with LazyArray leaves.  Falls back to
    eager execution (materializing lazy inputs) when shape inference fails
    — e.g. data-dependent output shapes like boolean masking."""
    global _fast
    import jax

    # inside an active jit/grad trace (CompiledTrainStep & co. run the model
    # on tracer-bound parameters THROUGH the device protocol): do not record
    # — execute directly so tracers stay inside their trace.  LazyArray
    # inputs (e.g. a constant created eagerly before the trace) materialize.
    if not _trace_clean():
        return _passthrough_call(fn, args, kwargs)

    with _LOCK:
        # ---- structural-replay fast path: match against the template
        fast = _fast
        if fast is not None:
            if fast.cursor >= len(fast.tpl.nodes):
                # the step recorded MORE ops than the template: the matched
                # window is a complete known step — dispatch it, then try to
                # match the extra op as the start of the next structure
                _fast_flush(fast)
                fast = _fast
            out = _fast_record(fast, fn, args, kwargs)
            if out is _MISS and fast.cursor == 0:
                for tpl in list(_templates):
                    if tpl is fast.tpl or not tpl.nodes:
                        continue
                    cand = _FastState(tpl)
                    out = _fast_record(cand, fn, args, kwargs)
                    if out is not _MISS:
                        _fast = cand
                        _touch_template(tpl)
                        fast = cand
                        break
            if out is not _MISS:
                return out
            _fast_leave(fast)  # prefix-clone into _frag; fall through

        frag = _frag
        skel = []
        aval_sig = []
        args_proto = tuple(_walk(a, frag, skel, aval_sig) for a in args)
        kw_proto = {}
        if kwargs:
            for k in kwargs:
                skel.append(("kw", k))
                kw_proto[k] = _walk(kwargs[k], frag, skel, aval_sig)
        skel_t = tuple(skel)

        # ---- shape inference (cached; key is position-independent)
        aval_key = (fn, _strip_dataflow(skel_t), tuple(aval_sig))
        cached = _aval_cache.get(aval_key)
        if cached is None:
            in_avals = []
            _proto_avals(args_proto, frag, in_avals)
            _proto_avals(kw_proto, frag, in_avals)
            try:
                cached = _infer_avals(fn, args_proto, kw_proto, in_avals)
            except Exception:
                _stats["eager_fallback_ops"] += 1
                return _eager_call(fn, args, kwargs)
            _aval_cache[aval_key] = cached
        out_avals, treedef = cached

        node = _Node(fn, args_proto, kw_proto)
        node._idx = len(frag.nodes)
        frag.nodes.append(node)
        frag.sig.append((fn, skel_t))
        node.treedef = treedef
        node.out_avals = tuple(out_avals)
        outs = [LazyArray(av, node, i) for i, av in enumerate(out_avals)]
        node.out_refs = tuple(weakref.ref(o) for o in outs)
        _stats["nodes"] += 1
        if len(frag.nodes) >= MAX_NODES:
            _flush_locked()
        return jax.tree_util.tree_unflatten(treedef, outs)


def _infer_avals(fn, args_proto, kw_proto, in_avals):
    import jax

    def f(*traced_leaves):
        it = iter(traced_leaves)

        def sub(p):
            if isinstance(p, (_Leaf, _Ref)):
                return next(it)
            if isinstance(p, list):
                return [sub(x) for x in p]
            if isinstance(p, tuple):
                return tuple(sub(x) for x in p)
            if isinstance(p, dict):
                return {k: sub(v) for k, v in p.items()}
            return p

        a = tuple(sub(x) for x in args_proto)
        kw = {k: sub(v) for k, v in kw_proto.items()}
        return fn(*a, **kw)

    out = jax.eval_shape(f, *in_avals)
    flat, treedef = jax.tree_util.tree_flatten(out)
    avals = [_Aval(x.shape, x.dtype) for x in flat]
    return avals, treedef


def _passthrough_call(fn, args, kwargs):
    """Direct execution for calls inside an active jit trace."""
    import jax

    def mat(x):
        return x.force() if isinstance(x, LazyArray) else x

    a = jax.tree_util.tree_map(mat, args, is_leaf=lambda x: isinstance(x, LazyArray))
    kw = jax.tree_util.tree_map(mat, kwargs, is_leaf=lambda x: isinstance(x, LazyArray))
    return fn(*a, **kw)


def _eager_call(fn, args, kwargs):
    """Run fn now (materializing lazy inputs), wrapping outputs concrete."""
    import jax

    def mat(x):
        return x.force() if isinstance(x, LazyArray) else x

    a = jax.tree_util.tree_map(mat, args, is_leaf=lambda x: isinstance(x, LazyArray))
    kw = jax.tree_util.tree_map(mat, kwargs, is_leaf=lambda x: isinstance(x, LazyArray))
    out = fn(*a, **kw)
    return jax.tree_util.tree_map(_wrap_concrete_leaf, out)


def _wrap_concrete_leaf(x):
    if _is_traced(x) and not isinstance(x, LazyArray):
        return LazyArray(_Aval(np.shape(x), x.dtype), value=x)
    return x


# ---------------------------------------------------------------- flushing
def flush():
    """Compile-and-dispatch the pending fragment (async; does NOT block on
    device execution).  Called automatically at every host readback; call it
    manually at step boundaries (torch/XLA's ``mark_step``) to pipeline
    device work under Python recording when nothing is read back."""
    with _LOCK:
        _flush_locked()


mark_step = flush  # torch/XLA-familiar alias


def _flush_locked():
    global _frag
    fast = _fast
    if fast is not None:
        if fast.cursor == 0:
            return  # nothing recorded since the last flush
        if fast.cursor == len(fast.tpl.nodes):
            _fast_flush(fast)  # full structural match: replay, no recording
            return
        _fast_leave(fast)  # partial match: normal-flush the cloned prefix
    frag = _frag
    if not frag.nodes:
        return
    _frag = _Fragment()
    _stats["flushes"] += 1

    # live outputs: (node_idx, out_pos, lazyarray)
    outputs = []
    for ni, node in enumerate(frag.nodes):
        for pi, ref in enumerate(node.out_refs):
            la = ref()
            if la is not None and la._value is None:
                outputs.append((ni, pi, la))

    leaf_avals = tuple((a.shape, a.dtype) for a in frag.leaf_avals)
    key = (tuple(frag.sig), leaf_avals, tuple((ni, pi) for ni, pi, _ in outputs))

    runner = _runner_cache.get(key)
    if runner is None:
        runner = _build_runner(frag, [(ni, pi) for ni, pi, _ in outputs])
        _runner_cache[key] = runner
        _stats["compiles"] += 1

    compiled_ok = False
    if runner == "eager":
        vals = _replay_eager(frag, [(ni, pi) for ni, pi, _ in outputs])
        _stats["eager_fallback_fragments"] += 1
    else:
        try:
            vals = runner(frag.nodes, frag.leaves)
            compiled_ok = True
        except Exception:
            # mark uncompilable and degrade this and future identical
            # fragments to eager replay
            _runner_cache[key] = "eager"
            vals = _replay_eager(frag, [(ni, pi) for ni, pi, _ in outputs])
            _stats["eager_fallback_fragments"] += 1

    for (ni, pi, la), v in zip(outputs, vals):
        la._value = v
        la._node = None

    if compiled_ok and frag.nodes:
        # promote: the next step matches this structure via the fast path
        _promote(frag, [(ni, pi) for ni, pi, _ in outputs], runner)


def _build_runner(frag, out_index):
    """Compile replay(leaves) -> outputs.  The jitted closure reads node
    fns/protos from the nodes PASSED AT CALL TIME, so a cache hit from a
    later structurally-identical fragment replays with its own leaves."""
    import jax

    n_nodes = len(frag.nodes)

    def replay(nodes, leaves):
        node_vals = {}
        for node in nodes:
            a = _rebuild(node.args_proto, leaves, node_vals)
            kw = _rebuild(node.kwargs_proto, leaves, node_vals)
            out = node.fn(*a, **kw)
            flat, _ = jax.tree_util.tree_flatten(out)
            node_vals[id(node)] = flat
        return [node_vals[id(nodes[ni])][pi] for ni, pi in out_index]

    # jit over the leaves only; nodes are static structure.  We wrap so the
    # jitted signature is (leaves) with nodes bound per call via closure
    # cell — but a cached runner must accept NEW node objects with NEW
    # concrete protos referencing the same leaf indices.  So: trace with the
    # node list as a static python object passed through a mutable cell.
    cell = {}

    @jax.jit
    def jitted(leaves):
        return replay(cell["nodes"], leaves)

    def run(nodes, leaves):
        cell["nodes"] = nodes
        try:
            return jitted(leaves)
        finally:
            cell.pop("nodes", None)

    return run


def _replay_eager(frag, out_index):
    import jax

    node_vals = {}
    for node in frag.nodes:
        a = _rebuild(node.args_proto, frag.leaves, node_vals)
        kw = _rebuild(node.kwargs_proto, frag.leaves, node_vals)
        out = node.fn(*a, **kw)
        flat, _ = jax.tree_util.tree_flatten(out)
        node_vals[id(node)] = flat
    return [node_vals[id(frag.nodes[ni])][pi] for ni, pi in out_index]


def force(x):
    """Materialize ``x`` if lazy; identity otherwise."""
    if isinstance(x, LazyArray):
        return x.force()
    return x


def materialize_tree(x):
    """force() every LazyArray leaf in a pytree (None-safe)."""
    import jax

    return jax.tree_util.tree_map(
        force, x, is_leaf=lambda v: isinstance(v, LazyArray)
    )


# ---------------------------------------------------------------- xp facade
_XP_CACHE = {}


def _xp_fn(name):
    fn = _XP_CACHE.get(name)
    if fn is None:
        import jax.numpy as jnp

        fn = getattr(jnp, name)
        _XP_CACHE[name] = fn
    return fn


def _record_xp(name, *args, **kwargs):
    return record_call(_xp_fn(name), args, kwargs)


class _LazyXP:
    """jnp-lookalike namespace: every function records instead of executing."""

    def __getattr__(self, name):
        fn = _xp_fn(name)

        def wrapper(*args, **kwargs):
            return record_call(fn, args, kwargs)

        wrapper.__name__ = f"lazy_{name}"
        setattr(self, name, wrapper)  # cache on instance
        return wrapper


# ---------------------------------------------------------------- module
class LazyModule:
    """Kernel-module wrapper: same protocol as ``jax_kernels``, recording."""

    is_jax = True

    def __init__(self, inner):
        self.inner = inner
        self.name = inner.name
        self.xp = _LazyXP()

    # ---- passthroughs (never lazy)
    def available(self):
        return self.inner.available()

    def manual_seed(self, seed):
        return self.inner.manual_seed(seed)

    def from_numpy(self, a):
        return _wrap_concrete_leaf(self.inner.from_numpy(a))

    def device_put(self, a):
        if isinstance(a, LazyArray):
            return a
        return _wrap_concrete_leaf(self.inner.device_put(a))

    def adopt(self, a, dtype=None):
        """Adopt a raw device array (BackendTensor fast path)."""
        if isinstance(a, LazyArray):
            return a if dtype is None else self.astype(a, dtype)
        out = _wrap_concrete_leaf(a)
        return out if dtype is None else self.astype(out, dtype)

    def to_numpy(self, a):
        if isinstance(a, LazyArray):
            a = a.force()
        return self.inner.to_numpy(a)

    # ---- recorded protocol ops
    def __getattr__(self, name):
        inner_fn = getattr(self.inner, name)
        if not callable(inner_fn):
            return inner_fn

        def wrapper(*args, **kwargs):
            return record_call(inner_fn, args, kwargs)

        wrapper.__name__ = f"lazy_{name}"
        setattr(self, name, wrapper)
        return wrapper

    # RNG: derive the key eagerly (global-stream semantics preserved), then
    # record the draw with the key as a traced input.
    def randn(self, shape, dtype=None, seed=None):
        key = self._key(seed)
        return record_call(_randn_impl, (key,), {"shape": tuple(shape), "dtype": self._dt(dtype)})

    def rand(self, shape, dtype=None, seed=None):
        key = self._key(seed)
        return record_call(_rand_impl, (key,), {"shape": tuple(shape), "dtype": self._dt(dtype)})

    def uniform(self, low, high, shape, dtype=None, seed=None):
        key = self._key(seed)
        dt = self._dt(dtype)
        return record_call(
            _uniform_impl,
            (key, np.asarray(low, dt), np.asarray(high, dt)),
            {"shape": tuple(shape), "dtype": dt},
        )

    def randint(self, low, high, shape, seed=None):
        key = self._key(seed)
        return record_call(
            _randint_impl, (key,), {"low": int(low), "high": int(high), "shape": tuple(shape)}
        )

    def dropout_mask(self, shape, keep_prob, dtype=None, key=None):
        if key is None:
            key = self._key(None)
        dt = self._dt(dtype)
        return record_call(
            _dropout_mask_impl,
            (key, np.asarray(keep_prob, np.float32)),
            {"shape": tuple(shape), "dtype": dt},
        )

    def _key(self, seed):
        import jax

        if seed is not None:
            return jax.random.key(seed)
        return self.inner._next_host_key()

    def _dt(self, dtype):
        if dtype is None:
            from ..config import config

            return np.dtype(config.default_dtype).name
        return np.dtype(dtype).name


def _randn_impl(key, shape, dtype):
    import jax

    return jax.random.normal(key, shape, dtype=dtype)


def _rand_impl(key, shape, dtype):
    import jax

    return jax.random.uniform(key, shape, dtype=dtype)


def _uniform_impl(key, low, high, shape, dtype):
    import jax

    return jax.random.uniform(key, shape, dtype=dtype, minval=low, maxval=high)


def _randint_impl(key, low, high, shape):
    import jax

    return jax.random.randint(key, shape, low, high)


def _dropout_mask_impl(key, keep_prob, shape, dtype):
    import jax
    import jax.numpy as jnp

    keep = jax.random.bernoulli(key, keep_prob, shape)
    return keep.astype(dtype) / keep_prob.astype(dtype)


# ---------------------------------------------------------------- switch
def enable() -> None:
    """Swap the tpu device's kernel module for the lazy recorder."""
    from . import device as device_mod

    dev = device_mod.tpu()
    if not dev.enabled():
        raise RuntimeError("tpu device is not enabled; lazy mode needs JAX")
    if isinstance(dev.mod, LazyModule):
        return
    dev.mod = LazyModule(dev.mod)
    _adopt_concrete()


def _adopt_concrete() -> None:
    """Mid-program enable: wrap every live BackendTensor's CONCRETE jax
    array in a concrete-valued LazyArray (the inverse of
    ``_materialize_escaped``).  Module code that does raw ``.array`` math
    (e.g. BatchNorm's running-stats EMA, ``nn/modules/batchnorm.py:71``)
    otherwise puts a plain jax.Array on the LEFT of a binary op with a
    lazy operand: jax's ``deferring_binary_op`` coerces the LazyArray via
    ``__jax_array__`` -> force() -> flush, splitting the step fragment at
    EVERY such site (ResNet18: ~40 mid-step flushes/step, the measured 7x
    enable-after-build cliff, BENCH_NOTES r4).  With buffers adopted as
    concrete-valued LazyArrays, their dunders record lazily and
    enable-after-build replays at the same template as enable-before-build.

    Only jax.Array values on the jax ('tpu') device are wrapped; numpy
    tensors on the host device and optimizer-state dicts (plain arrays
    handled by the optimizer's own lazy dispatch) are untouched."""
    import gc

    import jax

    from .ndarray import BackendTensor

    for obj in gc.get_objects():
        if isinstance(obj, BackendTensor):
            a = obj.array
            if isinstance(a, jax.Array):
                obj.array = LazyArray(_Aval(a.shape, a.dtype), value=a)


def disable() -> None:
    from . import device as device_mod

    dev = device_mod.tpu()
    if isinstance(dev.mod, LazyModule):
        flush()
        dev.mod = dev.mod.inner
        _materialize_escaped()


def _force_nested(v):
    """force() LazyArrays in ``v``, rebuilding immutable containers (tuples)
    as needed.  Returns ``v`` itself when nothing changed so the sweep can
    skip the rewrite."""
    if isinstance(v, LazyArray):
        return v.force()
    if type(v) is tuple:
        new = tuple(_force_nested(x) for x in v)
        if any(n is not o for n, o in zip(new, v)):
            return new
    return v


def _materialize_escaped() -> None:
    """Replace every LazyArray still held by live BackendTensors and
    containers (optimizer state, grad caches, closures) with its concrete
    device value.  After the switch back to eager, plain jnp ops would
    force a LazyArray through ``__jax_array__``, but JITTED kernels
    (pallas matmul, the one-program optimizer update) reject it at
    abstractification — params/Adam state from lazy-mode steps crashed the
    first eager op after disable().  flush() has already run, so force()
    just unwraps the computed value.

    Coverage: dict values and list items (instance ``__dict__``s are swept
    as dicts, so object attributes are covered), TUPLES nested inside
    those (rebuilt, e.g. optimizer pytrees with tuple nodes), closure
    cells, and ``BackendTensor.array``.  Dict keys and set members are NOT
    rewritten — forced values are unhashable jax.Arrays, and nothing
    in-tree keys containers by array."""
    import gc
    from types import CellType

    from .ndarray import BackendTensor

    for obj in gc.get_objects():
        t = type(obj)
        if t is dict:
            for k, v in obj.items():
                nv = _force_nested(v)
                if nv is not v:
                    obj[k] = nv
        elif t is list:
            for i, v in enumerate(obj):
                nv = _force_nested(v)
                if nv is not v:
                    obj[i] = nv
        elif t is CellType:
            try:
                v = obj.cell_contents
            except ValueError:  # empty cell
                continue
            nv = _force_nested(v)
            if nv is not v:
                obj.cell_contents = nv
        elif isinstance(obj, BackendTensor) and isinstance(
            obj.array, LazyArray
        ):
            obj.array = obj.array.force()
    # the sweep just rewrote any lazy-keyed scalar-constant cache entries
    # to plain arrays in place — drop them so the next enable() rebuilds
    # proper lazy-mode constants instead of force()-ing plain ones
    from .. import tensor as _tensor

    _tensor._scalar_const_cache.clear()


def enabled() -> bool:
    from . import device as device_mod

    dev = device_mod.tpu()
    return isinstance(dev.mod, LazyModule)
