"""Device registry.

TPU-native analog of the reference's ``BackendDevice`` + constructor set
(`DeepFlows/backend/backend_tensor.py:11-196`): a named device wrapping a
kernel module that satisfies the shared kernel protocol.  The ``tpu`` device
(JAX/XLA/Pallas, `jax_kernels.py`) replaces the reference's ``cuda`` device
(compiled pybind11 extension); ``cpu`` is the NumPy protocol clone;
``cpu_native`` is an optional C++ (ctypes) kernel library for the CPU path,
mirroring the reference's native-extension architecture.

For script compatibility, ``Device('cuda')`` / ``Device('gpu')`` resolve to
the TPU device — the reference's workloads select their accelerator with
``Device('cuda')`` (e.g. `test/CNN_CIFAR10_cuda.py:135`) and should run here
with no edits beyond semantics.
"""

from __future__ import annotations

import warnings



class BackendDevice:
    """A device name bound to a kernel module (reference:
    `DeepFlows/backend/backend_tensor.py:11-51`)."""

    def __init__(self, name: str, mod):
        self.name = name
        self.mod = mod

    def __getattr__(self, attr):
        mod = object.__getattribute__(self, "mod")
        if mod is None:
            raise RuntimeError(f"device '{self.name}' is not enabled")
        return getattr(mod, attr)

    def enabled(self) -> bool:
        return self.mod is not None

    def __deepcopy__(self, memo):
        # devices are process-global singletons bound to a kernel MODULE;
        # copying a model (e.g. nn.fusion.fuse_conv_bn) must share them
        return self

    def __eq__(self, other):
        return isinstance(other, BackendDevice) and self.name == other.name

    def __hash__(self):
        return hash(self.name)

    def __repr__(self):
        return f"{self.name}"

    # convenience factories (reference `backend_tensor.py:30-51`)
    def randn(self, *shape, dtype=None, seed=None):
        from .ndarray import BackendTensor

        return BackendTensor._wrap(self.mod.randn(shape, dtype=dtype, seed=seed), self)

    def rand(self, *shape, dtype=None, seed=None):
        from .ndarray import BackendTensor

        return BackendTensor._wrap(self.mod.rand(shape, dtype=dtype, seed=seed), self)

    def one_hot(self, indices, num_classes, dtype=None):
        # protocol argument order (indices, num_classes) — the reference's
        # convenience took (n, i) (`backend_tensor.py:36-38`); matching the
        # kernel protocol here avoids a silent swapped-argument trap
        from .ndarray import BackendTensor

        return BackendTensor._wrap(
            self.mod.one_hot(indices, num_classes, dtype=dtype), self
        )

    def empty(self, shape, dtype=None):
        from .ndarray import BackendTensor

        return BackendTensor._wrap(self.mod.fill(shape, 0.0, dtype=dtype), self)

    def full(self, shape, fill_value, dtype=None):
        from .ndarray import BackendTensor

        return BackendTensor._wrap(self.mod.fill(shape, fill_value, dtype=dtype), self)


_cpu = None
_tpu = None
_cpu_native = None


def cpu() -> BackendDevice:
    """CPU device over the NumPy kernel module."""
    global _cpu
    if _cpu is None:
        from . import numpy_kernels

        _cpu = BackendDevice("cpu", numpy_kernels)
    return _cpu


def cpu_numpy() -> BackendDevice:
    return cpu()


def tpu() -> BackendDevice:
    """TPU device over the JAX/XLA/Pallas kernel module.  Degrades to a
    disabled device if JAX cannot initialise a backend, mirroring the
    reference's CUDA ImportError handling (`backend_tensor.py:54-61`)."""
    global _tpu
    if _tpu is None:
        try:
            from . import jax_kernels

            if not jax_kernels.available():
                raise RuntimeError("no jax devices")
            _tpu = BackendDevice("tpu", jax_kernels)
        except Exception:
            _tpu = BackendDevice("tpu", None)
    return _tpu


def cpu_native() -> BackendDevice:
    """CPU device backed by the compiled C++ kernel library (the rebuild's
    native component, analogous to the reference's pybind11 CUDA extension).
    Disabled device if the shared library cannot be built/loaded."""
    global _cpu_native
    if _cpu_native is None:
        try:
            from . import native_kernels

            if not native_kernels.available():
                raise RuntimeError("native kernels unavailable")
            _cpu_native = BackendDevice("cpu_native", native_kernels)
        except Exception:
            _cpu_native = BackendDevice("cpu_native", None)
    return _cpu_native


def default_device() -> BackendDevice:
    """Default device for tensors created without ``device=``.

    ``DEEPFLOWS_BACKEND`` forces it by device name (``cpu`` / ``tpu`` /
    ``cpu_native``); unset or unknown names fall back to cpu.  Re-read per
    call (cheap dict lookup; tests toggle it) — the reference kept the
    analogous env override commented out
    (`DeepFlows/backend_selection.py:3-4`)."""
    import os

    raw = os.environ.get("DEEPFLOWS_BACKEND")
    if not raw:  # fast path for the common no-override case
        return cpu()
    name = raw.strip().lower()
    if name in ("", "nd", "np", "cpu"):
        return cpu()
    try:
        dev = Device(name)
    except ValueError:
        warnings.warn(
            f"DEEPFLOWS_BACKEND={name!r} is not a known device; using cpu",
            stacklevel=2,
        )
        return cpu()
    if not dev.enabled():
        warnings.warn(
            f"DEEPFLOWS_BACKEND={name!r} device is not enabled; using cpu",
            stacklevel=2,
        )
        return cpu()
    return dev


def default_accelerator() -> BackendDevice:
    """The device models default to: tpu if enabled, else cpu (the reference
    defaults modules to 'cuda', `DeepFlows/nn/modules/module.py:84`)."""
    d = tpu()
    return d if d.enabled() else cpu()


def all_devices():
    return [cpu(), tpu(), cpu_native()]


def Device(name) -> BackendDevice:
    if isinstance(name, BackendDevice):
        return name
    if name in ("cuda", "gpu"):
        warnings.warn(
            f"Device('{name}') maps to the TPU device in deepflows_tpu",
            stacklevel=2,
        )
        return tpu()
    for d in all_devices():
        if d.name == name:
            return d
    raise ValueError(f"unknown device: {name!r}")
