"""jax_function: arbitrary JAX code as one tape node with vjp autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu.nn import jax_function


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_matches_composed_ops():
    """A fused jnp swish must give the same value AND grads as composing
    tape ops."""
    fused = jax_function(lambda x: x * jax.nn.sigmoid(1.702 * x))
    x_np = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)

    xt = Tensor(x_np.copy(), device="tpu", requires_grad=True)
    out = fused(xt)
    (out * out).sum().backward()
    g_fused = xt.grad.numpy()

    xt2 = Tensor(x_np.copy(), device="tpu", requires_grad=True)
    ref = xt2 * nn.functional.sigmoid(xt2 * 1.702)
    (ref * ref).sum().backward()
    np.testing.assert_allclose(out.numpy(), ref.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g_fused, xt2.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_multi_arg_and_decorator():
    @jax_function
    def affine_tanh(xw, b):
        return jnp.tanh(xw) + b

    x = Tensor(np.ones((2, 3), np.float32), device="tpu", requires_grad=True)
    b = Tensor(np.full((1, 3), 0.5, np.float32), device="tpu", requires_grad=True)
    out = affine_tanh(x, b)
    out.sum().backward()
    np.testing.assert_allclose(
        x.grad.numpy(), 1 - np.tanh(1.0) ** 2, rtol=1e-5
    )
    np.testing.assert_allclose(b.grad.numpy(), 2.0, rtol=1e-6)  # unbroadcast over the batch of 2


def test_inside_compiled_step():
    """A Module whose forward calls jax_function trains through the whole-
    step compile (one trace, loss decreases)."""

    class SwishNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = nn.Linear(8, 16, device="tpu")
            self.l2 = nn.Linear(16, 3, device="tpu")
            self._swish = jax_function(
                lambda x: x * jax.nn.sigmoid(1.702 * x), checkpoint=True
            )

        def forward(self, x):
            return self.l2(self._swish(self.l1(x)))

    df.manual_seed(0)
    model = SwishNet()
    opt = optim.Adam(model.parameters(), lr=1e-2)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    r = np.random.default_rng(0)
    x = r.standard_normal((16, 8)).astype(np.float32)
    y = r.integers(0, 3, 16).astype(np.int32)
    losses = [float(step(x, y)) for _ in range(10)]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    assert step._jitted._cache_size() == 1


def test_non_tensor_arg_rejected():
    f = jax_function(lambda x: x * 2)
    with pytest.raises(TypeError, match="must be Tensors"):
        f(np.ones(3))


def test_same_tensor_twice_accumulates_both_cotangents():
    """Regression (review finding): f(t, t) must sum both argument slots'
    cotangents — d(a*b^2)/dt at a=b=t is 3t^2."""
    g = jax_function(lambda a, b: a * b**2)
    t = Tensor(np.full((3,), 2.0, np.float32), device="tpu", requires_grad=True)
    y = g(t, t)
    y.sum().backward()
    np.testing.assert_allclose(t.grad.numpy(), 3 * 2.0**2, rtol=1e-6)


def test_no_grad_skips_vjp():
    with df.no_grad():
        f = jax_function(lambda x: x * 2.0)
        t = Tensor(np.ones((2,), np.float32), device="tpu", requires_grad=True)
        out = f(t)
    assert out._vjp is None
    assert not out.requires_grad
