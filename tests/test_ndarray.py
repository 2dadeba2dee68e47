"""BackendTensor (NDArray layer) unit tests vs NumPy golden values.

Mirrors the role of the reference's low-level backend smoke test
(`/root/reference/test/test_cuda.py:36-99`) but as a real pytest tier
covering the whole kernel protocol on both devices (SURVEY.md §4).
"""

import numpy as np
import pytest

from deepflows_tpu.backend import BackendTensor, Device
from deepflows_tpu import backend as backend_api


def bt(a, device):
    return BackendTensor(np.asarray(a, dtype=np.float32), device=Device(device))


def test_roundtrip(device):
    a = np.random.default_rng(0).standard_normal((3, 4)).astype(np.float32)
    t = bt(a, device)
    np.testing.assert_allclose(t.numpy(), a, rtol=1e-6)
    assert t.shape == (3, 4)
    assert t.size == 12
    assert t.dtype == np.float32
    assert t.strides == (4, 1)


def test_fill_and_full(device):
    d = Device(device)
    t = backend_api.full((2, 3), 7.5, device=d)
    np.testing.assert_allclose(t.numpy(), np.full((2, 3), 7.5, np.float32))
    t2 = backend_api.zeros_like(t)
    assert t2.shape == (2, 3)
    assert float(t2.numpy().sum()) == 0.0


@pytest.mark.parametrize(
    "op",
    ["add", "sub", "mul", "div", "pow", "maximum"],
)
def test_elementwise_binary(device, op):
    rng = np.random.default_rng(1)
    a = rng.standard_normal((4, 5)).astype(np.float32)
    b = rng.standard_normal((4, 5)).astype(np.float32) + 2.0
    ta, tb = bt(a, device), bt(b, device)
    if op == "add":
        got, want = (ta + tb).numpy(), a + b
    elif op == "sub":
        got, want = (ta - tb).numpy(), a - b
    elif op == "mul":
        got, want = (ta * tb).numpy(), a * b
    elif op == "div":
        got, want = (ta / tb).numpy(), a / b
    elif op == "pow":
        a = np.abs(a) + 0.5
        ta = bt(a, device)
        got, want = (ta**2.0).numpy(), a**2.0
    else:
        got, want = (ta.maximum(tb)).numpy(), np.maximum(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_scalar_ops_and_broadcast(device):
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    t = bt(a, device)
    np.testing.assert_allclose((t + 1.0).numpy(), a + 1.0)
    np.testing.assert_allclose((2.0 * t).numpy(), 2.0 * a)
    row = bt(np.ones((1, 4), np.float32), device)
    np.testing.assert_allclose((t + row).numpy(), a + 1.0)


def test_views(device):
    a = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    t = bt(a, device)
    np.testing.assert_allclose(t.reshape((6, 4)).numpy(), a.reshape(6, 4))
    np.testing.assert_allclose(t.permute((2, 0, 1)).numpy(), a.transpose(2, 0, 1))
    np.testing.assert_allclose(t.T.numpy(), a.transpose(2, 1, 0))
    np.testing.assert_allclose(
        t.broadcast_to((5, 2, 3, 4)).numpy(), np.broadcast_to(a, (5, 2, 3, 4))
    )
    np.testing.assert_allclose(t.flip(1).numpy(), np.flip(a, 1))
    np.testing.assert_allclose(
        t.pad(((0, 0), (1, 1), (2, 0))).numpy(),
        np.pad(a, ((0, 0), (1, 1), (2, 0))),
    )
    assert t.compact() is t


def test_getitem_setitem(device):
    a = np.arange(20, dtype=np.float32).reshape(4, 5)
    t = bt(a, device)
    np.testing.assert_allclose(t[1:3, ::2].numpy(), a[1:3, ::2])
    t[0, :] = 9.0
    a2 = a.copy()
    a2[0, :] = 9.0
    np.testing.assert_allclose(t.numpy(), a2)
    t[1:3, 1:3] = bt(np.zeros((2, 2), np.float32), device)
    a2[1:3, 1:3] = 0
    np.testing.assert_allclose(t.numpy(), a2)


def test_matmul(device):
    rng = np.random.default_rng(2)
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal((4, 5)).astype(np.float32)
    np.testing.assert_allclose(
        (bt(a, device) @ bt(b, device)).numpy(), a @ b, rtol=1e-4, atol=1e-5
    )
    # batched
    a3 = rng.standard_normal((2, 3, 4)).astype(np.float32)
    np.testing.assert_allclose(
        (bt(a3, device) @ bt(b, device)).numpy(), a3 @ b, rtol=1e-4, atol=1e-5
    )


def test_reductions(device):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((3, 4, 5)).astype(np.float32)
    t = bt(a, device)
    np.testing.assert_allclose(t.sum().numpy(), a.sum(), rtol=1e-4)
    np.testing.assert_allclose(
        t.sum(axis=(0, 2)).numpy(), a.sum(axis=(0, 2)), rtol=1e-4
    )
    np.testing.assert_allclose(
        t.max(axis=1, keepdims=True).numpy(), a.max(axis=1, keepdims=True)
    )
    # per-axis mean must use the axis size as denominator (reference bug:
    # divided by total size, backend_tensor.py:659-662)
    np.testing.assert_allclose(t.mean(axis=1).numpy(), a.mean(axis=1), rtol=1e-5)


def test_unary_math(device):
    a = np.abs(np.random.default_rng(4).standard_normal((3, 3))).astype(np.float32) + 0.1
    t = bt(a, device)
    np.testing.assert_allclose(t.log().numpy(), np.log(a), rtol=1e-5)
    np.testing.assert_allclose(t.exp().numpy(), np.exp(a), rtol=1e-5)
    np.testing.assert_allclose(t.tanh().numpy(), np.tanh(a), rtol=1e-5)
    np.testing.assert_allclose(t.sqrt().numpy(), np.sqrt(a), rtol=1e-5)


def test_comparisons_produce_float(device):
    a = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    t = bt(a, device)
    got = (t >= 2.5).numpy()
    np.testing.assert_allclose(got, np.array([[0, 0], [1, 1]], np.float32))
    assert got.dtype == np.float32


def test_cross_device_transfer():
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    t = bt(a, "cpu").to("tpu")
    assert t.device.name == "tpu"
    np.testing.assert_allclose(t.numpy(), a)
    back = t.to("cpu")
    np.testing.assert_allclose(back.numpy(), a)


def test_scatter_add(device):
    d = Device(device)
    vals = np.ones((2, 3), np.float32)
    out = d.scatter_add((4, 3), (np.array([1, 1]),), vals)
    want = np.zeros((4, 3), np.float32)
    np.add.at(want, (np.array([1, 1]),), vals)
    np.testing.assert_allclose(d.to_numpy(out), want)


def test_default_device_env_override(monkeypatch):
    from deepflows_tpu.backend import device as devmod

    monkeypatch.delenv("DEEPFLOWS_BACKEND", raising=False)
    assert devmod.default_device().name == "cpu"
    monkeypatch.setenv("DEEPFLOWS_BACKEND", "tpu")
    assert devmod.default_device().name == "tpu"
    monkeypatch.setenv("DEEPFLOWS_BACKEND", "bogus")
    with pytest.warns(UserWarning):
        assert devmod.default_device().name == "cpu"


def test_default_device_env_reaches_tensor(monkeypatch):
    import deepflows_tpu as df

    monkeypatch.setenv("DEEPFLOWS_BACKEND", "tpu")
    t = df.Tensor(np.ones((2, 2), np.float32))
    assert t.device.name == "tpu"
