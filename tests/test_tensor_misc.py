"""Tensor API edge cases: reflected operators, unary ops, repr/len, in-place
on constants, argmax, swapaxes, detach semantics, factories."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


A = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)


def test_reflected_operators(device):
    t = Tensor(A, device=device)
    np.testing.assert_allclose((10.0 - t).numpy(), 10.0 - A)
    np.testing.assert_allclose((10.0 / t).numpy(), 10.0 / A, rtol=1e-6)
    np.testing.assert_allclose((2.0**t).numpy(), 2.0**A, rtol=1e-5)
    np.testing.assert_allclose((3.0 + t).numpy(), 3.0 + A)
    np.testing.assert_allclose((3.0 * t).numpy(), 3.0 * A)


def test_rpow_grad():
    x = Tensor(A.copy(), requires_grad=True)
    (2.0**x).sum().backward()
    np.testing.assert_allclose(
        x.grad.numpy(), (2.0**A) * np.log(2.0), rtol=1e-4
    )


def test_unary_and_misc(device):
    t = Tensor(A, device=device)
    np.testing.assert_allclose((+t).numpy(), A)
    np.testing.assert_allclose((-t).numpy(), -A)
    np.testing.assert_allclose(abs(Tensor(-A, device=device)).numpy(), A)
    assert len(t) == 2
    assert "Tensor" in repr(t)
    assert str(t)  # printable
    assert t.argmax(1).numpy().tolist() == [1, 1]
    np.testing.assert_allclose(t.swapaxes(0, 1).numpy(), A.T)
    assert t.flatten(0).shape == (4,)


def test_inplace_on_constants(device):
    t = Tensor(A.copy(), device=device)
    t += 1.0
    t *= 2.0
    t -= 1.0
    t /= 3.0
    np.testing.assert_allclose(t.numpy(), ((A + 1) * 2 - 1) / 3, rtol=1e-6)


def test_detach_shares_value_not_graph():
    x = Tensor(A.copy(), requires_grad=True)
    d = x.detach()
    np.testing.assert_allclose(d.numpy(), x.numpy())
    assert not d.requires_grad
    (x * 2.0).sum().backward()
    assert x.grad is not None and d.grad is None


def test_factories(device):
    assert df.zeros((2, 3), device=device).numpy().sum() == 0
    assert df.ones((2, 3), device=device).numpy().sum() == 6
    r = df.randn(4, 5, device=device, seed=0)
    assert r.shape == (4, 5)
    u = df.uniform(-1, 1, (100,), device=device, seed=0)
    assert -1 <= float(u.numpy().min()) and float(u.numpy().max()) <= 1
    a = df.arange(5, device=device)
    np.testing.assert_allclose(a.numpy(), np.arange(5))
    zl = df.zeros_like(r)
    assert zl.shape == r.shape and float(zl.numpy().sum()) == 0


def test_eq_ne_methods(device):
    t = Tensor(A, device=device)
    np.testing.assert_allclose(t.eq(2.0).numpy(), (A == 2).astype(np.float32))
    np.testing.assert_allclose(t.ne(2.0).numpy(), (A != 2).astype(np.float32))


def test_tensor_setitem_and_getitem_grad_with_array_index():
    x = Tensor(np.arange(12, dtype=np.float32).reshape(3, 4), requires_grad=True)
    idx = np.array([0, 2])
    out = x[idx]
    assert out.shape == (2, 4)
    out.sum().backward()
    want = np.zeros((3, 4), np.float32)
    want[idx] = 1.0
    np.testing.assert_allclose(x.grad.numpy(), want)


def test_imatmul_on_constants(device):
    t = Tensor(A.copy(), device=device)
    t @= Tensor(A, device=device)
    np.testing.assert_allclose(t.numpy(), A @ A, rtol=1e-5)
    g = Tensor(A, device=device, requires_grad=True)
    with pytest.raises(AssertionError):
        g @= Tensor(A, device=device)


def test_np_asarray_uses_array_protocol():
    """np.asarray(Tensor) must be ONE conversion (the __array__ protocol),
    not the per-row sequence fallback that builds a tape node per index."""
    import time

    t = df.Tensor(np.random.default_rng(0).standard_normal((512, 512)).astype(np.float32), device="tpu")
    n0 = len(Graph.node_list)
    t0 = time.time()
    a = np.asarray(t)
    dt = time.time() - t0
    assert a.shape == (512, 512)
    assert len(Graph.node_list) == n0  # no tape nodes created
    assert dt < 2.0, dt
    np.testing.assert_array_equal(a, t.numpy())


def test_scalar_const_cache_bounded(monkeypatch):
    """ADVICE r4 (medium): per-step-varying Python scalars (scheduled lrs,
    loss scales) must not pin device buffers forever — the cache clears
    when it exceeds its bound, like backend/lazy.py's _SCALAR_CACHE."""
    from deepflows_tpu import tensor as T

    monkeypatch.setattr(T, "_SCALAR_CONST_CACHE_MAX", 8)
    T._scalar_const_cache.clear()
    t = Tensor(A, device="tpu")
    for i in range(40):
        _ = t * (1.0 + i * 1e-4)  # a fresh scalar key per step
    assert len(T._scalar_const_cache) <= 9  # bound + the insert after clear
    T._scalar_const_cache.clear()


def test_scalar_const_cache_frozen():
    """ADVICE r4 (low): cached scalar constants are process-wide shared;
    in-place mutation must raise instead of corrupting every later op."""
    from deepflows_tpu import tensor as T

    T._scalar_const_cache.clear()
    t = Tensor(A, device="tpu")
    _ = t + 0.1234567
    frozen = [bt for bt in T._scalar_const_cache.values()]
    assert frozen, "scalar constant was not cached"
    bt = frozen[0]
    with pytest.raises(RuntimeError, match="frozen"):
        bt.fill(0.0)
    with pytest.raises(RuntimeError, match="frozen"):
        bt += 1.0
    with pytest.raises(RuntimeError, match="frozen"):
        bt[...] = 0.0
    # the shared value is intact and later ops still see the right constant
    np.testing.assert_allclose((t + 0.1234567).numpy(), A + 0.1234567, rtol=1e-6)
    T._scalar_const_cache.clear()
