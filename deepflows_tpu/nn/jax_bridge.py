"""jax_function: run arbitrary JAX code as ONE tape node with autodiff.

The extensibility escape hatch (no reference analog — the reference's only
extension point was writing a CUDA kernel into its backend): any jnp /
``lax`` / Pallas computation becomes a first-class tape op whose backward is
the function's ``jax.vjp``, routed to each Tensor argument.  This is the
same AD bridge ``nn.Remat`` uses (one multi-parent node, cached VJP), minus
the module/buffer machinery::

    fused_swish = jax_function(lambda x: x * jax.nn.sigmoid(1.702 * x))
    y = fused_swish(t)              # t: Tensor -> Tensor, grads flow

    @jax_function
    def custom(xw, b):              # any number of array args
        return jnp.tanh(xw) + b

Rules: the wrapped ``fn`` takes jnp arrays and returns ONE array; it must be
pure (no global state) and trace-safe.  ``checkpoint=True`` wraps it in
``jax.checkpoint`` (recompute in backward).  JAX-device Tensors only.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax

from ..autograd import is_grad_enable
from ..backend import BackendTensor
from ..tensor import Tensor


class _JaxFnOp(Tensor):
    """Tape node: y = fn(*args); parents = the Tensor args; backward is the
    stored jax.vjp, evaluated once per cotangent and cached."""

    def __init__(self, fn: Callable, args):
        from ..tensor import Reshape

        tensors = []
        for a in args:
            if not isinstance(a, Tensor):
                raise TypeError(
                    "jax_function arguments must be Tensors; close over "
                    "python constants instead"
                )
            # grad routing is by parent identity (CLAUDE.md invariant):
            # alias repeated operands through an identity node so f(t, t)
            # accumulates BOTH slots' cotangents instead of slot 0 twice
            if any(a is t for t in tensors):
                a = Reshape(a, a.shape)
            tensors.append(a)
        dev = tensors[0].device
        if not getattr(dev, "is_jax", False):
            raise RuntimeError(
                "jax_function requires the jax ('tpu') device"
            )
        from ..backend.lazy import force as _lz

        arrays = [_lz(t.data.array) for t in tensors]
        rg = is_grad_enable() and any(t.requires_grad for t in tensors)
        if rg:
            y, vjp = jax.vjp(fn, *arrays)
            self._vjp = vjp
        else:
            # eval / no_grad: skip linearization (vjp residuals would pin
            # extra HBM for the output's lifetime)
            y = fn(*arrays)
            self._vjp = None
        super().__init__(
            BackendTensor._wrap(y, dev), device=dev, requires_grad=rg
        )
        self._args = tensors
        self._gcache = None
        if self.requires_grad:
            for t in tensors:
                t.build_edge(self)

    def grad_fn(self, node, grad):
        if self._gcache is None or self._gcache[0] is not grad:
            self._gcache = (grad, self._vjp(grad.array))
        _, grads = self._gcache
        for t, g in zip(self._args, grads):
            if node is t:
                return BackendTensor._wrap(g, self.device)
        raise RuntimeError("jax_function grad for a non-parent node")


def jax_function(fn: Callable = None, *, checkpoint: bool = False):
    """Wrap an array-level JAX function into a tape-compatible op (see
    module docstring).  Usable as ``jax_function(fn)`` or as a decorator."""

    def make(f):
        inner = jax.checkpoint(f) if checkpoint else f

        @functools.wraps(f)
        def wrapped(*tensors):
            return _JaxFnOp(inner, tensors)

        return wrapped

    if fn is not None:
        return make(fn)
    return make
