"""Native C++ CPU kernel tests — the rebuild's analog of the reference's
low-level extension smoke test (`/root/reference/test/test_cuda.py:36-99`),
plus an end-to-end train run on Device('cpu_native')."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn, optim
from deepflows_tpu.backend import cpu_native

native = cpu_native()
pytestmark = pytest.mark.skipif(
    not native.enabled(), reason="native library unavailable (g++ build failed)"
)

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_fill_roundtrip():
    out = native.fill((4, 5), 3.25)
    np.testing.assert_allclose(out, np.full((4, 5), 3.25, np.float32))


def test_ewise_and_scalar_ops():
    a = RNG.standard_normal((3, 7)).astype(np.float32)
    b = RNG.standard_normal((3, 7)).astype(np.float32) + 2
    np.testing.assert_allclose(native.ewise_add(a, b), a + b, rtol=1e-6)
    np.testing.assert_allclose(native.ewise_mul(a, b), a * b, rtol=1e-6)
    np.testing.assert_allclose(native.ewise_div(a, b), a / b, rtol=1e-6)
    np.testing.assert_allclose(native.ewise_maximum(a, b), np.maximum(a, b))
    np.testing.assert_allclose(native.scalar_add(a, 1.5), a + 1.5, rtol=1e-6)
    np.testing.assert_allclose(native.scalar_power(np.abs(a), 2.0), np.abs(a) ** 2, rtol=1e-5)
    np.testing.assert_allclose(native.ewise_exp(a), np.exp(a), rtol=1e-5)
    np.testing.assert_allclose(native.ewise_tanh(a), np.tanh(a), rtol=1e-5)


def test_log_neg_inf_contract():
    """-INF for non-positive inputs, like the reference CUDA kernel
    (`ndarray_backend_cuda.cu:403-414`)."""
    a = np.array([1.0, 0.0, -2.0], np.float32)
    out = native.ewise_log(a)
    assert out[0] == pytest.approx(0.0)
    assert out[1] == -np.inf and out[2] == -np.inf


@pytest.mark.parametrize("m,n,p", [(3, 4, 5), (64, 64, 64), (100, 37, 251)])
def test_matmul_vs_numpy(m, n, p):
    a = RNG.standard_normal((m, n)).astype(np.float32)
    b = RNG.standard_normal((n, p)).astype(np.float32)
    np.testing.assert_allclose(native.matmul(a, b), a @ b, rtol=1e-4, atol=1e-4)


def test_reductions():
    a = RNG.standard_normal((4, 5, 6)).astype(np.float32)
    np.testing.assert_allclose(
        native.reduce_sum(a, axis=2), a.sum(axis=2), rtol=1e-5
    )
    np.testing.assert_allclose(
        native.reduce_sum(a, axis=(1, 2), keepdims=True),
        a.sum(axis=(1, 2), keepdims=True),
        rtol=1e-5,
    )
    np.testing.assert_allclose(native.reduce_max(a, axis=2), a.max(axis=2))
    # non-trailing axis falls back to numpy
    np.testing.assert_allclose(native.reduce_sum(a, axis=0), a.sum(axis=0), rtol=1e-5)


def test_conv2d_vs_numpy_device():
    x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)
    w = RNG.standard_normal((4, 3, 3, 3)).astype(np.float32)
    from deepflows_tpu.backend import numpy_kernels

    got = native.conv2d(x, w, 2, 1)
    want = numpy_kernels.conv2d(x, w, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_train_on_native_device():
    df.manual_seed(0)
    X = RNG.standard_normal((64, 8)).astype(np.float32)
    w_true = RNG.standard_normal((8, 2)).astype(np.float32)
    yl = (X @ w_true).argmax(1).astype(np.int32)
    model = nn.Sequential(
        nn.Linear(8, 16, device="cpu_native"),
        nn.ReLU(),
        nn.Linear(16, 2, device="cpu_native"),
    )
    opt = optim.Adam(model.parameters(), lr=0.05)
    crit = nn.CrossEntropyLoss()
    first = last = None
    for _ in range(30):
        loss = crit(model(Tensor(X, device="cpu_native")), Tensor(yl, device="cpu_native"))
        opt.zero_grad()
        loss.backward()
        opt.step()
        v = float(loss.numpy())
        first = first if first is not None else v
        last = v
    assert last < first * 0.5


def test_native_maxpool_vs_numpy():
    from deepflows_tpu.backend import native_kernels as nk
    from deepflows_tpu.backend import numpy_kernels as npk

    x = RNG.standard_normal((2, 3, 9, 9)).astype(np.float32)
    for k, s, p in [(2, 2, 0), (3, 2, 1), (3, 1, 0)]:
        np.testing.assert_allclose(
            nk.max_pool2d(x, k, s, p), npk.max_pool2d(x, k, s, p)
        )


def test_native_batchnorm_vs_numpy():
    from deepflows_tpu.backend import native_kernels as nk
    from deepflows_tpu.backend import numpy_kernels as npk

    x = RNG.standard_normal((4, 5, 6, 7)).astype(np.float32) * 3 + 1
    g = RNG.standard_normal((1, 5, 1, 1)).astype(np.float32)
    b = RNG.standard_normal((1, 5, 1, 1)).astype(np.float32)
    for gamma, beta in [(g, b), (None, None)]:
        o1, m1, v1 = nk.batchnorm_train(x, gamma, beta, (0, 2, 3), 1e-5)
        o2, m2, v2 = npk.batchnorm_train(x, gamma, beta, (0, 2, 3), 1e-5)
        np.testing.assert_allclose(o1, o2, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(m1.ravel(), m2.ravel(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(v1.ravel(), v2.ravel(), rtol=1e-4, atol=1e-6)


def test_native_conv_strided_padded_vs_numpy():
    from deepflows_tpu.backend import native_kernels as nk
    from deepflows_tpu.backend import numpy_kernels as npk

    x = RNG.standard_normal((2, 3, 11, 9)).astype(np.float32)
    w = RNG.standard_normal((4, 3, 3, 3)).astype(np.float32)
    for s, p in [(1, 0), (1, 1), (2, 1), (2, 2)]:
        np.testing.assert_allclose(
            nk.conv2d(x, w, s, p), npk.conv2d(x, w, s, p), rtol=1e-4, atol=1e-5
        )


def test_native_matmul_threaded_large():
    """Row counts above the thread-chunk threshold exercise the threaded
    SGEMM path."""
    from deepflows_tpu.backend import native_kernels as nk

    a = RNG.standard_normal((512, 64)).astype(np.float32)
    b = RNG.standard_normal((64, 96)).astype(np.float32)
    np.testing.assert_allclose(nk.matmul(a, b), a @ b, rtol=1e-4, atol=1e-4)
