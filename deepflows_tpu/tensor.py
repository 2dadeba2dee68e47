"""Define-by-run autograd tape: ``Tensor``, ``Graph``, op classes, factories.

TPU-native rebuild of `DeepFlows/tensor.py` (Graph `:9-53`, Tensor `:59-537`,
op base classes `:545-619`, ops `:622-974`, factories `:1068-1112`).  The
user-visible contract is preserved — ops *are* Tensors, constructing one
appends it to the global tape, ``loss.backward()`` walks the tape in reverse,
``Graph.free_graph()`` keeps leaves — while the internals are redesigned for
XLA:

- every op's forward/backward is expressed over ``BackendTensor`` device ops
  (jnp on TPU), so the whole tape — including ``backward()`` — is traceable:
  ``deepflows_tpu.jit.CompiledTrainStep`` jits an entire training step (tape
  construction + reverse walk + optimizer update) into ONE fused XLA program.
  That is the central translation of the reference's per-op CUDA launches
  (SURVEY.md §7.3 item 1).
- broadcast-reduction of gradients happens on device
  (`_unbroadcast`), eliminating the reference's D2H+H2D numpy round-trip in
  ``backward`` (`DeepFlows/tensor.py:461-483`, flagged in SURVEY §3.2).
- gradient-of-slice uses a fused XLA scatter-add instead of setitem-into-zeros
  (`DeepFlows/tensor.py:971-974`).
- ``abs`` is implemented (the reference's was commented out, breaking L1Loss,
  `DeepFlows/tensor.py:718-729`), ``mean`` uses the correct per-axis
  denominator, and ``max``'s gradient splits evenly among ties.
"""

from __future__ import annotations

import numpy as np

from .autograd import is_grad_enable, no_grad
from .backend import BackendTensor, Device, default_device
from . import backend as backend_api
from .config import config

__all__ = [
    "Graph",
    "Tensor",
    "UnaryOperator",
    "BinaryOperator",
    "add",
    "sub",
    "mul",
    "div",
    "pow",
    "matmul",
    "abs",
    "sum",
    "mean",
    "max",
    "min",
    "exp",
    "log",
    "maximum",
    "minimum",
    "sqrt",
    "square",
    "Reshape",
    "transpose",
    "concat",
    "get_slice",
    "empty",
    "zeros",
    "ones",
    "zeros_like",
    "ones_like",
    "randn",
    "rand",
    "uniform",
    "arange",
]

_py_sum, _py_max, _py_min, _py_abs, _py_pow = sum, max, min, abs, pow


class Graph:
    """Global dynamic-graph tape (reference `DeepFlows/tensor.py:9-53`)."""

    node_list: list = []

    @classmethod
    def add(cls, node):
        cls.node_list.append(node)

    @classmethod
    def clear(cls):
        cls.node_list.clear()

    @classmethod
    def free_graph(cls):
        """Free intermediates, keep leaves (weights/inputs) and sever their
        edges — the reference's memory-leak fix (`tensor.py:25-46`)."""
        keep = []
        for node in cls.node_list:
            is_leaf = node.is_leaf
            node.children.clear()
            node.parents.clear()
            if is_leaf:
                keep.append(node)
        cls.node_list = keep

    @classmethod
    def free_graph_all(cls):
        for node in cls.node_list:
            node.children.clear()
            node.parents.clear()
        cls.node_list = []


_tensor_count = 0


def _unbroadcast(grad: BackendTensor, shape) -> BackendTensor:
    """Reduce ``grad`` down to ``shape`` after broadcasting — entirely on
    device (replaces the reference's numpy round-trip, `tensor.py:461-483`)."""
    if grad.shape == tuple(shape):
        return grad
    extra = grad.ndim - len(shape)
    if extra > 0:
        grad = grad.sum(axis=tuple(range(extra)))
    axes = tuple(
        i for i, (g, s) in enumerate(zip(grad.shape, shape)) if g != s
    )
    if axes:
        grad = grad.sum(axis=axes, keepdims=True)
    if grad.shape != tuple(shape):
        grad = grad.reshape(shape)
    return grad


class Tensor:
    """A differentiable tensor wrapping a ``BackendTensor`` (reference
    `DeepFlows/tensor.py:59-537`)."""

    def __init__(
        self,
        array,
        dtype=None,
        device=None,
        name=None,
        requires_grad: bool = False,
    ) -> None:
        global _tensor_count
        _tensor_count += 1
        self.unique_id = _tensor_count
        self.name = name if name is not None else str(self.unique_id)

        if isinstance(array, Tensor):
            if device is None:
                device = array.device
            if dtype is None or dtype == array.dtype:
                self.data = (
                    array.data
                    if device is array.device
                    else array.data.to(device)
                )
            else:
                self.data = BackendTensor(array.data, device=device, dtype=dtype)
        elif isinstance(array, BackendTensor):
            self.data = array if device is None else array.to(device)
        else:
            self.data = BackendTensor(
                array, device=device or default_device(), dtype=dtype
            )

        self.requires_grad: bool = bool(requires_grad) and is_grad_enable()
        self.grad: BackendTensor | None = None
        self.children: list = []
        self.parents: list = []
        if self.requires_grad:
            Graph.add(self)

    def __deepcopy__(self, memo):
        """Copy data/state but NOT graph edges: a deep-copied tensor is a
        fresh leaf (deepcopying ``children``/``parents`` would drag the whole
        live autograd graph along — model copies, e.g. nn.fusion, recursed
        into the warm-up tape otherwise)."""
        import copy as _copy

        global _tensor_count
        cls = self.__class__
        new = cls.__new__(cls)
        memo[id(self)] = new
        for k, v in self.__dict__.items():
            if k in ("children", "parents"):
                setattr(new, k, [])
            elif k == "unique_id":
                _tensor_count += 1
                new.unique_id = _tensor_count
            else:
                setattr(new, k, _copy.deepcopy(v, memo))
        if getattr(new, "requires_grad", False):
            Graph.add(new)
        return new

    # ------------------------------------------------------------- basics
    @staticmethod
    def make_const(t: "Tensor") -> "Tensor":
        return Tensor(t, requires_grad=False)

    @property
    def is_leaf(self) -> bool:
        return self.requires_grad and len(self.parents) == 0

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def size(self):
        return self.data.size

    @property
    def device(self):
        return self.data.device

    def numpy(self) -> np.ndarray:
        return self.data.numpy()

    def __array__(self, dtype=None, copy=None):
        # numpy protocol: without this, np.asarray(tensor) falls back to the
        # SEQUENCE protocol — one get_slice tape node per row, silently
        # pathological on large tensors
        if copy is False:
            raise ValueError(
                "np.asarray(tensor, copy=False) cannot alias device memory"
            )
        arr = self.data.numpy()
        return arr.astype(dtype) if dtype is not None else arr

    def item(self):
        return self.data.item()

    def detach(self) -> "Tensor":
        return Tensor.make_const(self)

    def dispose(self):
        """Manually drop this node from the tape (reference
        `tensor.py:227-235`)."""
        if self.grad is not None and not self.is_leaf:
            self.grad = None
        self.children.clear()
        self.parents.clear()
        for i, n in enumerate(Graph.node_list):
            if n is self:
                del Graph.node_list[i]
                break

    def build_edge(self, node: "Tensor"):
        self.children.append(node)
        node.parents.append(self)

    def __repr__(self):
        return (
            f"Tensor({self.data}, requires_grad={self.requires_grad}, "
            f"device={self.device})"
        )

    def __str__(self):
        return str(self.data)

    def __len__(self):
        return len(self.data)

    # ------------------------------------------------------------- ops
    @property
    def T(self):
        return self.transpose()

    def reshape(self, *new_shape):
        if len(new_shape) == 1 and isinstance(new_shape[0], (tuple, list)):
            new_shape = tuple(new_shape[0])
        return Reshape(self, new_shape)

    def flatten(self, start_dim: int = 0):
        shape = self.shape[:start_dim] + (-1,)
        return Reshape(self, shape)

    def transpose(self, *axes):
        return transpose(self, axes if len(axes) != 0 else None)

    def swapaxes(self, axis1: int, axis2: int):
        axes = list(range(self.ndim))
        axes[axis1], axes[axis2] = axes[axis2], axes[axis1]
        return transpose(self, tuple(axes))

    def max(self, axis=None, keepdims: bool = False):
        return max(self, axis, keepdims)

    def min(self, axis=None, keepdims: bool = False):
        return min(self, axis, keepdims)

    def sum(self, axis=None, keepdims: bool = False):
        return sum(self, axis, keepdims)

    def mean(self, axis=None, keepdims: bool = False):
        return mean(self, axis, keepdims)

    def abs(self):
        return abs(self)

    def sqrt(self):
        return sqrt(self)

    def __add__(self, x):
        return add(self, x)

    def __radd__(self, x):
        return add(x, self)

    def __sub__(self, x):
        return sub(self, x)

    def __rsub__(self, x):
        return sub(x, self)

    def __mul__(self, x):
        return mul(self, x)

    def __rmul__(self, x):
        return mul(x, self)

    def __truediv__(self, x):
        return div(self, x)

    def __rtruediv__(self, x):
        return div(x, self)

    def __pow__(self, x):
        return pow(self, x)

    def __rpow__(self, x):
        return pow(x, self)

    def __matmul__(self, x):
        return matmul(self, x)

    def __rmatmul__(self, x):
        return matmul(x, self)

    def __pos__(self):
        return self * 1

    def __neg__(self):
        return self * -1

    def __abs__(self):
        return abs(self)

    def __getitem__(self, key):
        return get_slice(self, key)

    def __setitem__(self, key, value):
        # in-place writes are forbidden on grad-tracked nodes (reference
        # `tensor.py:338-348`)
        assert (
            not self.requires_grad
        ), "In-place operation is forbidden in node requires grad."
        if isinstance(key, Tensor):
            key = key.data
        self.data[key] = value.data if isinstance(value, Tensor) else value

    def _inplace(self, other, op):
        assert (
            not self.requires_grad
        ), "In-place operation is forbidden in node requires grad."
        if isinstance(other, Tensor):
            other = other.data
        op(other)
        return self

    def __iadd__(self, other):
        return self._inplace(other, self.data.__iadd__)

    def __isub__(self, other):
        return self._inplace(other, self.data.__isub__)

    def __imul__(self, other):
        return self._inplace(other, self.data.__imul__)

    def __itruediv__(self, other):
        return self._inplace(other, self.data.__itruediv__)

    def __imatmul__(self, other):
        assert (
            not self.requires_grad
        ), "In-place operation is forbidden in node requires grad."
        if isinstance(other, Tensor):
            other = other.data
        self.data = self.data @ other
        return self

    # comparisons produce constant tensors (reference `tensor.py:385-419`)
    def _cmp(self, other, name):
        with no_grad():
            if isinstance(other, Tensor):
                other = other.data
            return Tensor(getattr(self.data, name)(other), device=self.device)

    def __lt__(self, other):
        return self._cmp(other, "__lt__")

    def __le__(self, other):
        return self._cmp(other, "__le__")

    def __gt__(self, other):
        return self._cmp(other, "__gt__")

    def __ge__(self, other):
        return self._cmp(other, "__ge__")

    def eq(self, other):
        return self._cmp(other, "__eq__")

    def ne(self, other):
        return self._cmp(other, "__ne__")

    def argmax(self, axis=None):
        with no_grad():
            return Tensor(self.data.argmax(axis=axis), device=self.device)

    __hash__ = object.__hash__

    # ------------------------------------------------------------- autograd
    def backward(self, retain_graph: bool = False):
        """Reverse-walk the tape from this node (reference
        `tensor.py:421-499`), with all gradient math on device."""
        start = None
        for i in range(len(Graph.node_list) - 1, -1, -1):
            if Graph.node_list[i] is self:
                start = i
                break
        if start is None:
            return
        if self.size != 1:
            raise ValueError("backward should be called only on a scalar.")

        with no_grad():
            self.grad = backend_api.ones_like(self.data)
            for node in Graph.node_list[start::-1]:
                grad = node.grad
                if grad is None:
                    if not retain_graph and not node.is_leaf:
                        node._release_saved()
                    continue
                for parent in node.parents:
                    if not parent.requires_grad:
                        continue
                    add_grad = node.grad_fn(parent, grad)
                    if isinstance(add_grad, Tensor):
                        add_grad = add_grad.data
                    if add_grad.shape != parent.shape:
                        add_grad = _unbroadcast(add_grad, parent.shape)
                    if parent.grad is None:
                        parent.grad = add_grad
                    else:
                        parent.grad = parent.grad + add_grad
                if not node.is_leaf:
                    node.grad = None
                    if not retain_graph:
                        # free saved-for-backward refs (torch semantics:
                        # "saved tensors are freed unless retain_graph") —
                        # a user-held output no longer pins every forward
                        # activation's device buffer until the next
                        # free_graph_all; load-bearing for lazy mode, where
                        # liveness at flush decides the program's outputs
                        node._release_saved()

        if not retain_graph:
            Graph.free_graph()

    def zero_grad(self):
        self.grad = None

    def _release_saved(self):
        """Drop saved-for-backward references (operand tensors, cached
        grads, vjp closures) once this op's grad_fn can no longer be called
        (backward with retain_graph=False).  Without this, a user-held
        output pins every forward activation through the `_x` chains until
        the next ``Graph.free_graph_all()`` — the r2 eager-OOM cause at
        ResNet50-224 scale, and in lazy mode it would make every
        activation a fragment output."""
        d = self.__dict__
        for k in list(d):
            if not k.startswith("_"):
                continue
            v = d[k]
            if v is None:
                continue
            if isinstance(v, (Tensor, BackendTensor)):
                d[k] = None
            elif isinstance(v, (tuple, list)) and any(
                isinstance(e, (Tensor, BackendTensor)) for e in v
            ):
                d[k] = None
            elif k == "_vjp":  # jax_bridge residual closure
                d[k] = None
            elif getattr(v, "_is_lazy", False) or (
                getattr(v, "ndim", None) not in (None, 0)
                and type(v).__module__.startswith(("jaxlib", "jax", "numpy"))
            ):
                d[k] = None  # raw saved device/host arrays (e.g. targets)

    # ------------------------------------------------------------- devices
    def to(self, device) -> "Tensor":
        device = Device(device)
        if device is self.device:
            return self
        # propagate requires_grad so a moved tensor keeps participating in
        # autograd (the reference's .to() dropped it, `tensor.py:513-527`)
        return Tensor(self.data, device=device, requires_grad=self.requires_grad)

    def cpu(self):
        return self.to("cpu")

    def tpu(self):
        return self.to("tpu")

    def cuda(self):
        # script-compat alias: accelerator == tpu here (see backend.device)
        return self.to("tpu")


class UnaryOperator(Tensor):
    """Ops are Tensors: constructing one runs forward and wires edges
    (reference `tensor.py:545-578`)."""

    def __init__(self, x: Tensor) -> None:
        if not isinstance(x, Tensor):
            x = Tensor(x)
        self._x = x  # operand ref (graph export walks _x even under no_grad)
        super().__init__(
            array=self.forward(x),
            device=x.device,
            requires_grad=is_grad_enable() and x.requires_grad,
        )
        if self.requires_grad:
            x.build_edge(self)

    def forward(self, x: Tensor) -> BackendTensor:
        raise NotImplementedError

    def grad_fn(self, x: Tensor, grad: BackendTensor) -> BackendTensor:
        raise NotImplementedError

    def __repr__(self):
        return f"Tensor({self.data}, op={self.__class__.__name__})"


_scalar_const_cache: dict = {}
# bounded like backend/lazy.py's _SCALAR_CACHE: per-step-varying scalars
# (scheduled lrs, warmup multipliers, loss scales) would otherwise pin a
# device buffer per distinct value forever
_SCALAR_CONST_CACHE_MAX = 65536


def _scalar_const(value, dtype, device) -> BackendTensor:
    """Device constant for a Python-scalar operand, cached by
    (type, value, dtype, device).  Module code rebuilds the same eps/
    momentum/0.5/... constants every training step; without the cache each
    binary op pays a numpy alloc + device_put (measured 51 device_puts per
    ResNet50 step in lazy mode).  Results built inside a jit trace are
    Tracers owned by that trace and are NEVER cached (omnistaging — a
    cached tracer poisons every later trace).  The key includes the lazy
    switch: an eager-cached PLAIN jax scalar used under lazy mode would sit
    on the left of comparisons and force the LazyArray operand
    (``__jax_array__`` -> flush mid-backward, splitting the step fragment),
    and a lazy-cached LazyArray used eagerly would leak into jit traces.

    SHARING CONTRACT: one BackendTensor is returned for every Tensor
    wrapping a given scalar (``BackendTensor.to`` returns self on the same
    device), so cached constants are process-wide shared state.  They are
    marked ``_frozen``; BackendTensor's in-place mutators raise on them
    instead of silently corrupting every later op that reuses the value."""
    from .backend import lazy as _lazy

    try:
        key = (type(value), value, str(dtype), id(device), _lazy.enabled())
        bt = _scalar_const_cache.get(key)
    except TypeError:  # unhashable (array-likes take the uncached path)
        key, bt = None, None
    if bt is not None:
        return bt
    bt = BackendTensor(np.asarray(value, dtype=dtype), device=device)
    if key is not None:
        from jax.core import Tracer

        if not isinstance(bt.array, Tracer):
            if len(_scalar_const_cache) > _SCALAR_CONST_CACHE_MAX:
                _scalar_const_cache.clear()
            bt._frozen = True
            _scalar_const_cache[key] = bt
    return bt


class BinaryOperator(Tensor):
    """Binary op base: coerces scalar/BackendTensor operands and asserts the
    operands share a device (reference `tensor.py:581-619`)."""

    @staticmethod
    def _scalar_dtype(other: "Tensor"):
        """Python scalars adopt the tensor operand's floating dtype so
        low-precision (bf16) graphs are not silently promoted to f32."""
        d = other.dtype
        if np.issubdtype(np.dtype(d), np.floating) or "bfloat16" in str(d):
            return d
        return config.default_dtype

    def __init__(self, x, y) -> None:
        if not isinstance(x, Tensor):
            if isinstance(y, Tensor) and not isinstance(x, (Tensor, BackendTensor)):
                x = Tensor(
                    _scalar_const(x, self._scalar_dtype(y), y.device),
                    device=y.device,
                )
            else:
                x = Tensor(x, device=y.device if isinstance(y, Tensor) else None)
        if isinstance(y, BackendTensor):
            y = Tensor(y)
        elif not isinstance(y, Tensor):
            y = Tensor(
                _scalar_const(y, self._scalar_dtype(x), x.device),
                device=x.device,
            )
        if x is y:
            # grad dispatch is by parent identity; alias one operand through
            # an identity node so (x - x), (x / x), x @ x etc. accumulate the
            # correct gradient on both paths
            y = Reshape(y, y.shape)
        assert x.device is y.device, (
            f"operands on different devices: {x.device} vs {y.device}"
        )
        super().__init__(
            array=self.forward(x.data, y.data),
            device=x.device,
            requires_grad=is_grad_enable()
            and (x.requires_grad or y.requires_grad),
        )
        self._x, self._y = x, y
        if self.requires_grad:
            x.build_edge(self)
            y.build_edge(self)

    def forward(self, x: BackendTensor, y: BackendTensor) -> BackendTensor:
        raise NotImplementedError

    def grad_fn(self, node: Tensor, grad: BackendTensor) -> BackendTensor:
        raise NotImplementedError

    def __repr__(self):
        return f"Tensor({self.data}, op={self.__class__.__name__})"


# ------------------------------------------------------------------ arithmetic
class add(BinaryOperator):
    def forward(self, x, y):
        return x + y

    def grad_fn(self, node, grad):
        return grad


class sub(BinaryOperator):
    def forward(self, x, y):
        return x - y

    def grad_fn(self, node, grad):
        return grad if node is self._x else -grad


class mul(BinaryOperator):
    def forward(self, x, y):
        return x * y

    def grad_fn(self, node, grad):
        other = self._y if node is self._x else self._x
        return grad * other.data


class div(BinaryOperator):
    def forward(self, x, y):
        return x / y

    def grad_fn(self, node, grad):
        if node is self._x:
            return grad / self._y.data
        return -grad * self._x.data / (self._y.data * self._y.data)


class pow(BinaryOperator):
    def forward(self, x, y):
        return x**y

    def grad_fn(self, node, grad):
        x, y = self._x.data, self._y.data
        if node is self._x:
            return grad * y * x ** (y - 1)
        return grad * self.data * x.log()


class matmul(BinaryOperator):
    """Full-rank matmul: 1-D promotion and batched (>2-D) with broadcast,
    superseding the reference's transpose-of-last-two-axes special cases
    (`tensor.py:688-716`)."""

    def forward(self, x, y):
        return x @ y

    def grad_fn(self, node, grad):
        x, y = self._x.data, self._y.data
        xm = x.reshape((1,) + x.shape) if x.ndim == 1 else x
        ym = y.reshape(y.shape + (1,)) if y.ndim == 1 else y
        # promote grad to the matrix-matrix result shape
        if x.ndim == 1 and y.ndim == 1:
            g = grad.reshape((1, 1))
        elif x.ndim == 1:
            g = grad.reshape(grad.shape[:-1] + (1, grad.shape[-1]))
        elif y.ndim == 1:
            g = grad.reshape(grad.shape + (1,))
        else:
            g = grad
        if node is self._x:
            return _unbroadcast(g @ _swap_last(ym), xm.shape).reshape(x.shape)
        return _unbroadcast(_swap_last(xm) @ g, ym.shape).reshape(y.shape)


def _swap_last(t: BackendTensor) -> BackendTensor:
    axes = list(range(t.ndim))
    axes[-1], axes[-2] = axes[-2], axes[-1]
    return t.permute(tuple(axes))


class abs(UnaryOperator):  # noqa: A001
    """|x| with sign-gradient — implemented (the reference left it commented
    out, breaking L1Loss; `DeepFlows/tensor.py:718-729`)."""

    def forward(self, x):
        return x.data.abs()

    def grad_fn(self, x, grad):
        return grad * x.data.sign()


class sum(UnaryOperator):  # noqa: A001
    def __init__(self, x, axis=None, keepdims=False):
        self.axis = (axis,) if isinstance(axis, int) else axis
        self.keepdims = keepdims
        super().__init__(x)

    def forward(self, x):
        return x.data.sum(axis=self.axis, keepdims=self.keepdims)

    def grad_fn(self, x, grad):
        if self.axis is not None and not self.keepdims:
            shape = list(x.shape)
            for ax in self.axis:
                shape[ax % x.ndim] = 1
            grad = grad.reshape(tuple(shape))
        return grad.broadcast_to(x.shape)


class mean(UnaryOperator):
    def __init__(self, x, axis=None, keepdims=False):
        self.axis = (axis,) if isinstance(axis, int) else axis
        self.keepdims = keepdims
        super().__init__(x)

    def forward(self, x):
        return x.data.mean(axis=self.axis, keepdims=self.keepdims)

    def grad_fn(self, x, grad):
        n = 1
        if self.axis is None:
            n = x.size
        else:
            for ax in self.axis:
                n *= x.shape[ax % x.ndim]
        if self.axis is not None and not self.keepdims:
            shape = list(x.shape)
            for ax in self.axis:
                shape[ax % x.ndim] = 1
            grad = grad.reshape(tuple(shape))
        return grad.broadcast_to(x.shape) / n


class _MinMaxOp(UnaryOperator):
    _is_max = True

    def __init__(self, x, axis=None, keepdims=False):
        self.axis = (axis,) if isinstance(axis, int) else axis
        self.keepdims = keepdims
        super().__init__(x)

    def forward(self, x):
        d = x.data
        return d.max(axis=self.axis, keepdims=self.keepdims) if self._is_max else d.min(
            axis=self.axis, keepdims=self.keepdims
        )

    def grad_fn(self, x, grad):
        # even split among ties (the reference broadcast the mask, sending the
        # full gradient to every tie, `tensor.py:769-791`)
        out = self.data
        g = grad
        if self.axis is not None and not self.keepdims:
            shape = list(x.shape)
            for ax in self.axis:
                shape[ax % x.ndim] = 1
            out = out.reshape(tuple(shape))
            g = g.reshape(tuple(shape))
        mask = (x.data == out.broadcast_to(x.shape)).astype(x.dtype)
        count = mask.sum(
            axis=self.axis, keepdims=True
        ) if self.axis is not None else mask.sum()
        return mask * g / count


class max(_MinMaxOp):  # noqa: A001
    _is_max = True


class min(_MinMaxOp):  # noqa: A001
    _is_max = False


class exp(UnaryOperator):
    def forward(self, x):
        return x.data.exp()

    def grad_fn(self, x, grad):
        return grad * self.data


class log(UnaryOperator):
    def forward(self, x):
        return x.data.log()

    def grad_fn(self, x, grad):
        return grad / x.data


class _MaxMinBinary(BinaryOperator):
    def grad_fn(self, node, grad):
        # split the gradient evenly among ties (a full copy to both operands
        # would double-count where x == y, e.g. leaky_relu at 0)
        other = self._y if node is self._x else self._x
        mask = (node.data == self.data).astype(self.dtype)
        mask_other = (other.data == self.data).astype(self.dtype)
        return grad * mask / (mask + mask_other)


class maximum(_MaxMinBinary):
    def forward(self, x, y):
        return x.maximum(y)


class minimum(_MaxMinBinary):
    def forward(self, x, y):
        return x.minimum(y)


def sqrt(x: Tensor):
    return x**0.5


def square(x: Tensor):
    return x * x


# ------------------------------------------------------------------ shape ops
class Reshape(UnaryOperator):
    def __init__(self, x, new_shape):
        self.new_shape = new_shape
        super().__init__(x)

    def forward(self, x):
        return x.data.reshape(self.new_shape)

    def grad_fn(self, x, grad):
        return grad.reshape(x.shape)


class transpose(UnaryOperator):
    def __init__(self, x, axes=None):
        self.axes = tuple(axes) if axes is not None else None
        super().__init__(x)

    def forward(self, x):
        return x.data.transpose(self.axes)

    def grad_fn(self, x, grad):
        if self.axes is None:
            return grad.transpose(None)
        inverse = tuple(np.argsort(self.axes))
        return grad.transpose(inverse)


class concat(Tensor):
    """Concatenate tensors along an axis — not in the reference; needed by
    model code that builds feature pyramids."""

    def __init__(self, tensors, axis=0):
        tensors = [t if isinstance(t, Tensor) else Tensor(t) for t in tensors]
        # alias duplicate inputs so identity-based grad routing stays unique
        seen, uniq = set(), []
        for t in tensors:
            if id(t) in seen:
                t = Reshape(t, t.shape)
            seen.add(id(t))
            uniq.append(t)
        tensors = uniq
        self.axis = axis
        self._inputs = tensors
        device = tensors[0].device
        xp = device.xp
        out = BackendTensor._wrap(
            xp.concatenate([t.data.array for t in tensors], axis=axis), device
        )
        super().__init__(
            out,
            device=device,
            requires_grad=is_grad_enable()
            and any(t.requires_grad for t in tensors),
        )
        if self.requires_grad:
            for t in tensors:
                t.build_edge(self)

    def grad_fn(self, node, grad):
        start = 0
        ax = self.axis % grad.ndim
        for t in self._inputs:
            width = t.shape[ax]
            if t is node:
                idx = tuple(
                    slice(None) if i != ax else slice(start, start + width)
                    for i in range(grad.ndim)
                )
                return grad[idx]
            start += width
        raise RuntimeError("node not an input of concat")


class get_slice(UnaryOperator):
    def __init__(self, x, key):
        # keep the Tensor identity of array keys: the ONNX exporter needs to
        # know when gather indices flow from a graph INPUT (an Embedding
        # lookup) rather than being trace-time constants
        self._key_tensor = key if isinstance(key, Tensor) else None
        if isinstance(key, Tensor):
            key = key.data
        if isinstance(key, BackendTensor):
            key = key.array
        self.key = key
        super().__init__(x)

    def forward(self, x):
        return x.data[self.key]

    def grad_fn(self, x, grad):
        return BackendTensor._wrap(
            x.device.scatter_add(x.shape, self.key, grad.array, dtype=grad.dtype),
            x.device,
        )


# ------------------------------------------------------------------ factories
def tensor(array, dtype=None, device=None, requires_grad=False) -> Tensor:
    return Tensor(array, dtype=dtype, device=device, requires_grad=requires_grad)


def empty(shape, dtype=None, device=None, requires_grad=False) -> Tensor:
    return Tensor(
        backend_api.empty(shape, device=device, dtype=dtype),
        requires_grad=requires_grad,
    )


def zeros(shape, dtype=None, device=None, requires_grad=False) -> Tensor:
    return Tensor(
        backend_api.zeros(shape, device=device, dtype=dtype),
        requires_grad=requires_grad,
    )


def ones(shape, dtype=None, device=None, requires_grad=False) -> Tensor:
    return Tensor(
        backend_api.ones(shape, device=device, dtype=dtype),
        requires_grad=requires_grad,
    )


def zeros_like(t: Tensor, requires_grad=False) -> Tensor:
    return zeros(t.shape, dtype=t.dtype, device=t.device, requires_grad=requires_grad)


def ones_like(t: Tensor, requires_grad=False) -> Tensor:
    return ones(t.shape, dtype=t.dtype, device=t.device, requires_grad=requires_grad)


def randn(*shape, dtype=None, device=None, requires_grad=False, seed=None) -> Tensor:
    device = Device(device) if device else default_device()
    return Tensor(device.randn(*shape, dtype=dtype, seed=seed), requires_grad=requires_grad)


def rand(*shape, dtype=None, device=None, requires_grad=False, seed=None) -> Tensor:
    device = Device(device) if device else default_device()
    return Tensor(device.rand(*shape, dtype=dtype, seed=seed), requires_grad=requires_grad)


def uniform(low, high, shape, dtype=None, device=None, requires_grad=False, seed=None) -> Tensor:
    device = Device(device) if device else default_device()
    return Tensor(
        BackendTensor._wrap(
            device.uniform(low, high, shape, dtype=dtype, seed=seed), device
        ),
        requires_grad=requires_grad,
    )


def arange(*args, dtype=None, device=None) -> Tensor:
    device = Device(device) if device else default_device()
    return Tensor(np.arange(*args), dtype=dtype, device=device)
