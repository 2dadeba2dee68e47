"""Low-level TPU kernel-module smoke test — the `test_tpu.py` SURVEY §7.2 B2
calls for, mirroring the reference's `test/test_cuda.py:36-99` (direct
module-level fill/ewise/scalar roundtrips with assertions)."""

import numpy as np

from deepflows_tpu.backend import jax_kernels as K

RNG = np.random.default_rng(0)


def test_fill_roundtrip():
    out = K.to_numpy(K.fill((4, 5), 3.25))
    np.testing.assert_allclose(out, np.full((4, 5), 3.25, np.float32))


def test_from_to_numpy_roundtrip():
    a = RNG.standard_normal((3, 7)).astype(np.float32)
    np.testing.assert_allclose(K.to_numpy(K.from_numpy(a)), a)


def test_ewise_add_and_scalar_add():
    a = RNG.standard_normal((64,)).astype(np.float32)
    b = RNG.standard_normal((64,)).astype(np.float32)
    np.testing.assert_allclose(
        K.to_numpy(K.from_numpy(a) + K.from_numpy(b)), a + b, rtol=1e-6
    )
    np.testing.assert_allclose(K.to_numpy(K.from_numpy(a) + 2.5), a + 2.5, rtol=1e-6)


def test_matmul_and_reduce():
    a = RNG.standard_normal((16, 32)).astype(np.float32)
    b = RNG.standard_normal((32, 8)).astype(np.float32)
    np.testing.assert_allclose(
        K.to_numpy(K.matmul(K.from_numpy(a), K.from_numpy(b))),
        a @ b,
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        K.to_numpy(K.reduce_sum(K.from_numpy(a), axis=1)), a.sum(1), rtol=1e-5
    )
    np.testing.assert_allclose(
        K.to_numpy(K.reduce_max(K.from_numpy(a), axis=0)), a.max(0)
    )


def test_setitem_functional():
    a = K.from_numpy(np.zeros((4, 4), np.float32))
    out = K.setitem(a, (slice(1, 3), slice(None)), 7.0)
    want = np.zeros((4, 4), np.float32)
    want[1:3] = 7.0
    np.testing.assert_allclose(K.to_numpy(out), want)
    np.testing.assert_allclose(K.to_numpy(a), 0.0)  # original untouched


def test_dropout_mask_device_prng():
    m = K.to_numpy(K.dropout_mask((1000,), 0.8))
    kept = m > 0
    assert 0.7 < kept.mean() < 0.9
    np.testing.assert_allclose(m[kept], 1.25, rtol=1e-5)  # 1/keep_prob
