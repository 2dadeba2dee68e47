"""BackendTensor — the NDArray layer.

TPU-native re-design of the reference's strided NDArray
(`DeepFlows/backend/backend_tensor.py:199-689`).  The reference carries
(shape, strides, offset) over a flat mutable device buffer because CUDA
pointers alias; XLA buffers are immutable and XLA treats reshape/transpose/
broadcast as metadata already, so this rebuild stores a *shaped* device array
and implements views as device ops.  Observable semantics are preserved:

- ``reshape``/``permute``/``broadcast_to``/``__getitem__`` return new
  BackendTensors sharing no mutable state;
- ``compact()`` exists and is the identity (arrays are always compact here —
  reference: `backend_tensor.py:310-318`);
- ``__setitem__`` is functional under the hood (``x.at[idx].set`` on TPU),
  rebinding this tensor's array — matching the reference's in-place kernel
  semantics as observed from Python;
- ``strides`` reports contiguous element strides for API parity.

dtype: float32 by default (reference is float32-only,
`backend_tensor.py:267-269`); other dtypes are supported as a documented
extension (bf16 for TPU speed, int/bool for masks and labels).
"""

from __future__ import annotations

import numpy as np

from ..config import config
from .device import BackendDevice, Device, default_device


def _coerce_dtype(a: np.ndarray, dtype):
    if dtype is not None:
        return a.astype(dtype, copy=False)
    if a.dtype == np.float64:
        return a.astype(config.default_dtype, copy=False)
    if a.dtype == np.int64:
        return a.astype(np.int32, copy=False)
    return a


class BackendTensor:
    __slots__ = ("array", "device", "_frozen")

    def __init__(self, other, device: BackendDevice | None = None, dtype=None):
        if isinstance(other, BackendTensor):
            device = device or other.device
            arr = other.array
            if device is not other.device:
                arr = device.device_put(other.device.to_numpy(arr))
            if dtype is not None:
                arr = device.astype(arr, dtype)
            self.array = arr
            self.device = device
            return
        if device is None:
            device = default_device()
        if isinstance(device, str):
            device = Device(device)
        if isinstance(other, (int, float, bool, np.number)):
            self.array = device.fill((), other, dtype=dtype)
        elif isinstance(other, np.ndarray):
            self.array = device.device_put(_coerce_dtype(other, dtype))
        elif type(other).__module__.startswith(("jaxlib", "jax")) or getattr(
            other, "_is_lazy", False
        ):
            # already a device array: adopt without host round-trip when the
            # target is the jax device (in lazy mode, ``adopt`` wraps it so
            # every lazy-device BackendTensor holds a LazyArray uniformly)
            if getattr(device, "is_jax", False):
                self.array = device.adopt(other, dtype)
            else:
                self.array = device.device_put(_coerce_dtype(np.asarray(other), dtype))
        else:
            self.array = device.device_put(
                _coerce_dtype(np.asarray(other), dtype)
            )
        self.device = device

    @classmethod
    def _wrap(cls, array, device) -> "BackendTensor":
        """Fast path: adopt a raw device array with no conversion."""
        t = object.__new__(cls)
        t.array = array
        t.device = device
        return t

    # ------------------------------------------------------------ properties
    @property
    def shape(self):
        return tuple(self.array.shape)

    @property
    def ndim(self):
        return self.array.ndim

    @property
    def size(self):
        return int(np.prod(self.array.shape)) if self.array.shape else 1

    @property
    def dtype(self):
        return self.array.dtype

    @property
    def strides(self):
        """Contiguous element strides (API parity; arrays are always compact)."""
        s, acc = [], 1
        for dim in reversed(self.shape):
            s.append(acc)
            acc *= dim
        return tuple(reversed(s))

    @property
    def flat(self):
        return self.reshape((self.size,))

    @property
    def T(self):
        return self.permute(tuple(reversed(range(self.ndim))))

    def __len__(self):
        return self.shape[0]

    def __repr__(self):
        return f"BackendTensor({self.numpy()!r}, device={self.device})"

    # ------------------------------------------------------------ transfers
    def numpy(self) -> np.ndarray:
        return self.device.to_numpy(self.array)

    def item(self):
        return self.numpy().item()

    def to(self, device) -> "BackendTensor":
        device = Device(device)
        if device is self.device:
            return self
        return BackendTensor(self, device=device)

    def astype(self, dtype) -> "BackendTensor":
        return self._wrap(self.device.astype(self.array, dtype), self.device)

    def _check_mutable(self):
        """Cached shared constants (tensor._scalar_const) are process-wide;
        mutating one in place would corrupt every later op reusing the
        value.  Raise instead."""
        if getattr(self, "_frozen", False):
            raise RuntimeError(
                "in-place mutation of a frozen shared-constant BackendTensor"
                " (see tensor._scalar_const); operate on a copy instead"
            )

    def fill(self, value) -> "BackendTensor":
        self._check_mutable()
        self.array = self.device.fill(self.shape, value, dtype=self.dtype)
        return self

    # ------------------------------------------------------------ views
    def compact(self) -> "BackendTensor":
        return self

    def is_compact(self) -> bool:
        return True

    def reshape(self, new_shape) -> "BackendTensor":
        return self._wrap(self.device.xp.reshape(self.array, new_shape), self.device)

    def permute(self, new_axes) -> "BackendTensor":
        return self._wrap(
            self.device.xp.transpose(self.array, new_axes), self.device
        )

    def transpose(self, axes=None) -> "BackendTensor":
        return self._wrap(self.device.xp.transpose(self.array, axes), self.device)

    def broadcast_to(self, new_shape) -> "BackendTensor":
        return self._wrap(
            self.device.xp.broadcast_to(self.array, new_shape), self.device
        )

    def flip(self, axes=None) -> "BackendTensor":
        return self._wrap(self.device.xp.flip(self.array, axis=axes), self.device)

    def pad(self, axes) -> "BackendTensor":
        """Zero-pad; ``axes`` is ((before, after), ...) per dim (reference
        `backend_tensor.py:678-689`)."""
        return self._wrap(self.device.xp.pad(self.array, axes), self.device)

    def __getitem__(self, idx) -> "BackendTensor":
        if isinstance(idx, BackendTensor):
            idx = idx.array
        return self._wrap(self.array[idx], self.device)

    def __setitem__(self, idx, value):
        self._check_mutable()
        if isinstance(value, BackendTensor):
            value = value.array
        if isinstance(idx, BackendTensor):
            idx = idx.array
        self.array = self.device.setitem(self.array, idx, value)

    # ------------------------------------------------------------ arithmetic
    def _other(self, other):
        return other.array if isinstance(other, BackendTensor) else other

    def __add__(self, other):
        return self._wrap(self.array + self._other(other), self.device)

    __radd__ = __add__

    def __sub__(self, other):
        return self._wrap(self.array - self._other(other), self.device)

    def __rsub__(self, other):
        return self._wrap(self._other(other) - self.array, self.device)

    def __mul__(self, other):
        return self._wrap(self.array * self._other(other), self.device)

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._wrap(self.array / self._other(other), self.device)

    def __rtruediv__(self, other):
        return self._wrap(self._other(other) / self.array, self.device)

    def __pow__(self, other):
        return self._wrap(self.array ** self._other(other), self.device)

    def __rpow__(self, other):
        return self._wrap(self._other(other) ** self.array, self.device)

    def __neg__(self):
        return self._wrap(-self.array, self.device)

    def __iadd__(self, other):
        self._check_mutable()
        self.array = self.array + self._other(other)
        return self

    def __isub__(self, other):
        self._check_mutable()
        self.array = self.array - self._other(other)
        return self

    def __imul__(self, other):
        self._check_mutable()
        self.array = self.array * self._other(other)
        return self

    def __itruediv__(self, other):
        self._check_mutable()
        self.array = self.array / self._other(other)
        return self

    def __matmul__(self, other):
        return self._wrap(self.device.matmul(self.array, self._other(other)), self.device)

    # comparisons return float 0/1 arrays (reference compare kernels,
    # `ndarray_backend_cuda.cu:351-401`)
    def _cmp(self, other, op):
        res = op(self.array, self._other(other))
        return self._wrap(self.device.astype(res, config.default_dtype), self.device)

    def __eq__(self, other):  # noqa: E731 — value semantics, like the reference
        return self._cmp(other, lambda a, b: a == b)

    def __ne__(self, other):
        return self._cmp(other, lambda a, b: a != b)

    def __ge__(self, other):
        return self._cmp(other, lambda a, b: a >= b)

    def __le__(self, other):
        return self._cmp(other, lambda a, b: a <= b)

    def __gt__(self, other):
        return self._cmp(other, lambda a, b: a > b)

    def __lt__(self, other):
        return self._cmp(other, lambda a, b: a < b)

    __hash__ = None  # mutable value container

    # ------------------------------------------------------------ math
    def maximum(self, other):
        return self._wrap(
            self.device.xp.maximum(self.array, self._other(other)), self.device
        )

    def minimum(self, other):
        return self._wrap(
            self.device.xp.minimum(self.array, self._other(other)), self.device
        )

    def log(self):
        return self._wrap(self.device.xp.log(self.array), self.device)

    def exp(self):
        return self._wrap(self.device.xp.exp(self.array), self.device)

    def tanh(self):
        return self._wrap(self.device.xp.tanh(self.array), self.device)

    def sqrt(self):
        return self._wrap(self.device.xp.sqrt(self.array), self.device)

    def abs(self):
        return self._wrap(self.device.xp.abs(self.array), self.device)

    def sign(self):
        return self._wrap(self.device.xp.sign(self.array), self.device)

    def argmax(self, axis=None):
        return self._wrap(self.device.xp.argmax(self.array, axis=axis), self.device)

    def argmin(self, axis=None):
        return self._wrap(self.device.xp.argmin(self.array, axis=axis), self.device)

    # ------------------------------------------------------------ reductions
    # Multi-axis reductions are supported directly (the reference could only
    # reduce one trailing axis per kernel call, `backend_tensor.py:624-647`).
    def sum(self, axis=None, keepdims=False):
        return self._wrap(
            self.device.reduce_sum(self.array, axis=axis, keepdims=keepdims),
            self.device,
        )

    def max(self, axis=None, keepdims=False):
        return self._wrap(
            self.device.reduce_max(self.array, axis=axis, keepdims=keepdims),
            self.device,
        )

    def min(self, axis=None, keepdims=False):
        return self._wrap(
            -self.device.reduce_max(-self.array, axis=axis, keepdims=keepdims),
            self.device,
        )

    def mean(self, axis=None, keepdims=False):
        """Correct per-axis mean — the reference divided by the *total* size
        even for axis reductions (`backend_tensor.py:659-662`, noted as a bug
        in SURVEY §2.2); fixed here."""
        return self._wrap(
            self.device.xp.mean(self.array, axis=axis, keepdims=keepdims),
            self.device,
        )


# ---------------------------------------------------------------- backend_api
# Module-level helper namespace (reference `backend_tensor.py:692-779`).
def Btensor(obj, device=None, dtype=None) -> BackendTensor:
    return BackendTensor(obj, device=device, dtype=dtype)


def from_numpy(a, device=None) -> BackendTensor:
    """Present in the rebuild's module API — the reference's im2col fast path
    called a nonexistent ``backend_api.from_numpy`` and always fell back to a
    slice loop (`DeepFlows/nn/functional.py:263-283`)."""
    return BackendTensor(a, device=device)


def empty(shape, device=None, dtype=None) -> BackendTensor:
    device = Device(device) if device else default_device()
    return device.empty(shape, dtype=dtype)


def full(shape, fill_value, device=None, dtype=None) -> BackendTensor:
    device = Device(device) if device else default_device()
    return device.full(shape, fill_value, dtype=dtype)


def zeros(shape, device=None, dtype=None) -> BackendTensor:
    return full(shape, 0.0, device=device, dtype=dtype)


def ones(shape, device=None, dtype=None) -> BackendTensor:
    return full(shape, 1.0, device=device, dtype=dtype)


def zeros_like(t: BackendTensor) -> BackendTensor:
    return full(t.shape, 0.0, device=t.device, dtype=t.dtype)


def ones_like(t: BackendTensor) -> BackendTensor:
    return full(t.shape, 1.0, device=t.device, dtype=t.dtype)


def broadcast_to(t: BackendTensor, new_shape) -> BackendTensor:
    return t.broadcast_to(new_shape)


def reshape(t: BackendTensor, new_shape) -> BackendTensor:
    return t.reshape(new_shape)


def maximum(a, b) -> BackendTensor:
    if isinstance(a, BackendTensor):
        return a.maximum(b)
    return b.maximum(a)


def max(t: BackendTensor, axis=None, keepdims=False) -> BackendTensor:  # noqa: A001
    return t.max(axis=axis, keepdims=keepdims)


def log(t: BackendTensor) -> BackendTensor:
    return t.log()


def exp(t: BackendTensor) -> BackendTensor:
    return t.exp()


def tanh(t: BackendTensor) -> BackendTensor:
    return t.tanh()


def flip(t: BackendTensor, axes=None) -> BackendTensor:
    return t.flip(axes)


def summation(t: BackendTensor, axis=None, keepdims=False) -> BackendTensor:
    return t.sum(axis=axis, keepdims=keepdims)


def mean(t: BackendTensor, axis=None, keepdims=False) -> BackendTensor:
    return t.mean(axis=axis, keepdims=keepdims)


def pad(t: BackendTensor, axes) -> BackendTensor:
    return t.pad(axes)


def expand_dims(t: BackendTensor, axis) -> BackendTensor:
    return t._wrap(t.device.xp.expand_dims(t.array, axis), t.device)
