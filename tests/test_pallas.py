"""Pallas kernel unit tests (interpret mode on CPU; compiled on real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepflows_tpu.ops import pallas_kernels as pk

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("m,k,n", [(128, 256, 128), (100, 70, 50), (257, 129, 384)])
def test_pallas_matmul(m, k, n):
    a = RNG.standard_normal((m, k)).astype(np.float32)
    b = RNG.standard_normal((k, n)).astype(np.float32)
    got = np.asarray(pk.matmul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, a @ b, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("act", ["none", "relu", "tanh"])
def test_pallas_linear_fused(act):
    x = RNG.standard_normal((64, 100)).astype(np.float32)
    w = RNG.standard_normal((100, 32)).astype(np.float32)
    b = RNG.standard_normal((1, 32)).astype(np.float32)
    got = np.asarray(pk.linear_fused(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), act))
    want = x @ w + b
    if act == "relu":
        want = np.maximum(want, 0)
    elif act == "tanh":
        want = np.tanh(want)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_fused_adam_matches_reference_math():
    n = 1000
    p = RNG.standard_normal(n).astype(np.float32)
    g = RNG.standard_normal(n).astype(np.float32)
    v = np.zeros(n, np.float32)
    s = np.zeros(n, np.float32)
    lr, b1, b2, eps, wd, t = 0.01, 0.9, 0.999, 1e-8, 0.01, 3
    bc1, bc2 = 1 - b1**t, 1 - b2**t
    hyper = jnp.asarray([lr, b1, b2, eps, wd, bc1, bc2], dtype=jnp.float32)
    new_p, new_v, new_s = pk.fused_adam(
        jnp.asarray(p), jnp.asarray(g), jnp.asarray(v), jnp.asarray(s), hyper
    )
    gw = g + wd * p
    v_ref = b1 * v + (1 - b1) * gw
    s_ref = b2 * s + (1 - b2) * gw * gw
    p_ref = p - lr * (v_ref / bc1) / (np.sqrt(s_ref / bc2) + eps)
    np.testing.assert_allclose(np.asarray(new_v), v_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_s), s_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_p), p_ref, rtol=1e-5, atol=1e-6)


def test_pallas_matmul_dispatch_via_device():
    """config.use_pallas routes BackendTensor 2-D matmuls through Pallas."""
    from deepflows_tpu import BackendTensor, config

    a = RNG.standard_normal((64, 64)).astype(np.float32)
    b = RNG.standard_normal((64, 64)).astype(np.float32)
    config.use_pallas = True
    try:
        got = (BackendTensor(a, device="tpu") @ BackendTensor(b, device="tpu")).numpy()
    finally:
        config.use_pallas = False
    np.testing.assert_allclose(got, a @ b, rtol=1e-4, atol=1e-3)


def test_fused_linear_path_matches_regular():
    import deepflows_tpu as df
    from deepflows_tpu import Tensor, config, nn

    df.manual_seed(0)
    lin = nn.Linear(100, 32, device="tpu")
    x = RNG.standard_normal((16, 100)).astype(np.float32)
    want = lin(Tensor(x, device="tpu")).numpy()
    config.use_pallas = True
    try:
        tx = Tensor(x, device="tpu", requires_grad=True)
        out = lin(tx)
        got = out.numpy()
        out.sum().backward()
        gx = tx.grad.numpy()
        gw = lin.weight.grad.numpy()
        gb = lin.bias.grad.numpy()
    finally:
        config.use_pallas = False
        df.Graph.free_graph_all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(gx, np.ones((16, 32)) @ lin.weight.numpy().T, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(gw, x.T @ np.ones((16, 32), np.float32), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(gb, np.full((1, 32), 16.0), rtol=1e-4)


def test_fused_adam_optimizer_matches_regular():
    import deepflows_tpu as df
    from deepflows_tpu import Tensor, nn, optim

    w0 = RNG.standard_normal((37, 5)).astype(np.float32)
    gs = [RNG.standard_normal((37, 5)).astype(np.float32) for _ in range(4)]
    results = []
    for fused in (False, True):
        p = nn.Parameter(Tensor(w0.copy(), device="tpu"))
        opt = optim.Adam([p], lr=0.01, weight_decay=0.01, fused=fused)
        for g in gs:
            p.grad = df.BackendTensor(g, device=p.device)
            opt.step()
        results.append(p.numpy())
    np.testing.assert_allclose(results[0], results[1], rtol=1e-4, atol=1e-5)


# ------------------------------------------------ stochastic-rounding adam
def test_fused_adam_sr_unbiased():
    """E[SR(x)] = x: the stochastically rounded Adam result is unbiased in
    ULP terms, where round-to-nearest has ~0.25-ulp mean |bias|."""
    import jax.numpy as jnp

    from deepflows_tpu.ops.pallas_kernels import fused_adam_sr

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(512).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(np.full(512, 1e-4, np.float32))
    v = jnp.zeros(512)
    s = jnp.zeros(512)
    hyper = jnp.asarray([1e-3, 0.9, 0.999, 1e-8, 0.0, 0.1, 0.001], jnp.float32)
    p32 = np.asarray(p, np.float32)
    want = p32 - 1e-3 * (0.1e-4 / 0.1) / (np.sqrt(0.001e-8 / 0.001) + 1e-8)
    ulp = 2.0 ** (np.floor(np.log2(np.maximum(np.abs(want), 1e-30))) - 7)
    acc = np.zeros(512, np.float64)
    N = 64
    for seed in range(N):
        out, nv, ns = fused_adam_sr(p, g, v, s, hyper, jnp.asarray([seed], jnp.int32))
        acc += np.asarray(out, np.float64)
    sr_bias = np.mean((acc / N - want) / ulp)
    assert abs(sr_bias) < 0.05, sr_bias
    # moments are exact f32 (not rounded)
    np.testing.assert_allclose(np.asarray(nv), np.full(512, 0.1e-4), rtol=1e-6)


def test_adam_sr_escapes_bf16_stall():
    """The capability the kernel exists for: with bf16 weights and an update
    smaller than ulp/2, round-to-nearest Adam NEVER moves the weight; the
    stochastic-rounding path moves it by the expected amount."""
    import jax.numpy as jnp

    from deepflows_tpu import optim
    from deepflows_tpu.backend import BackendTensor, Device
    from deepflows_tpu.tensor import Tensor

    dev = Device("tpu")
    n, steps, lr = 512, 120, 2e-4  # ulp(1.0)=2^-8=3.9e-3, lr < ulp/2

    def run(stochastic_round):
        p = Tensor(
            BackendTensor._wrap(jnp.ones(n, jnp.bfloat16), dev),
            device=dev,
            requires_grad=True,
        )
        opt = optim.Adam([p], lr=lr, stochastic_round=stochastic_round)
        for _ in range(steps):
            p.grad = BackendTensor._wrap(jnp.ones(n, jnp.float32), dev)
            opt.step()
        return np.asarray(p.data.array, np.float32)

    rtn = run(False)
    sr = run(True)
    assert (rtn == 1.0).all(), "RTN should stall exactly at 1.0"
    moved = 1.0 - sr.mean()
    expected = lr * steps  # steady grads -> |update| ~= lr per step
    assert 0.5 * expected < moved < 1.5 * expected, (moved, expected)


def test_bf16_sr_training_recovers_f32_convergence():
    """End-to-end: Module.bfloat16() + Adam(stochastic_round=True) trains a
    small net to (near-)f32 loss, while RTN bf16 lags — the SR-Adam
    capability exercised through the compiled step."""
    import deepflows_tpu as df
    from deepflows_tpu import nn, optim
    from deepflows_tpu.jit import CompiledTrainStep

    rng = np.random.default_rng(0)
    xw = rng.standard_normal((256, 16)).astype(np.float32)
    true_w = rng.standard_normal((16, 4)).astype(np.float32)
    yv = (xw @ true_w).argmax(1).astype(np.int32)

    def run(bf16, sr, epochs=25):
        df.manual_seed(0)
        model = nn.Sequential(
            nn.Linear(16, 32, device="tpu"), nn.ReLU(),
            nn.Linear(32, 4, device="tpu"),
        )
        if bf16:
            model.bfloat16()
            import jax.numpy as jnp

            assert model[0].weight.data.array.dtype == jnp.bfloat16
        opt = optim.Adam(model.parameters(), lr=2e-3, stochastic_round=sr)
        step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
        for _ in range(epochs):
            for b in range(0, 256, 64):
                loss = step(xw[b : b + 64], yv[b : b + 64])
        return float(loss)

    f32 = run(False, False)
    rtn = run(True, False)
    sr = run(True, True)
    # SR must land close to f32 and beat round-to-nearest
    assert sr < rtn, (sr, rtn)
    assert sr < f32 * 2.0, (sr, f32)


def test_quantize_int8_roundtrip():
    w = RNG.standard_normal((64, 48)).astype(np.float32) * 0.3
    q, s = pk.quantize_int8(jnp.asarray(w))
    assert q.dtype == jnp.int8 and s.shape == (48,)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    # symmetric per-channel: error bounded by half a quantization step
    step = np.asarray(s)
    assert np.all(np.abs(deq - w) <= 0.5 * step[None, :] + 1e-7)
    # zero column -> scale 1, q 0
    w0 = np.zeros((16, 4), np.float32)
    q0, s0 = pk.quantize_int8(jnp.asarray(w0))
    assert np.all(np.asarray(q0) == 0) and np.all(np.asarray(s0) == 1.0)


@pytest.mark.parametrize("m,k,n", [(16, 512, 512), (100, 70, 50), (129, 256, 300)])
def test_pallas_int8_matmul(m, k, n):
    x = RNG.standard_normal((m, k)).astype(np.float32)
    w = RNG.standard_normal((k, n)).astype(np.float32) * 0.1
    q, s = pk.quantize_int8(jnp.asarray(w))
    got = np.asarray(pk.int8_matmul(jnp.asarray(x), q, s))
    want = x @ (np.asarray(q, np.float32) * np.asarray(s))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_int8_matmul_bf16_activations_f32_out():
    x = RNG.standard_normal((16, 256)).astype(np.float32)
    w = RNG.standard_normal((256, 128)).astype(np.float32) * 0.1
    q, s = pk.quantize_int8(jnp.asarray(w))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    got = pk.int8_matmul(xb, q, s)
    assert got.dtype == jnp.bfloat16
    got32 = pk.int8_matmul(xb, q, s, out_dtype=jnp.float32)
    assert got32.dtype == jnp.float32
    want = np.asarray(xb, np.float32) @ (np.asarray(q, np.float32) * np.asarray(s))
    np.testing.assert_allclose(np.asarray(got32), want, rtol=2e-2, atol=2e-1)
