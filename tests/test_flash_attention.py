"""Flash attention (ops/pallas_kernels.flash_attention): correctness of the
online-softmax tiled forward and the recompute-based backward vs a naive jnp
reference, plus the MultiheadAttention flash=True integration (tape-level
equivalence with the naive scores path).  Runs the kernels in Pallas
interpret mode on the CPU backend (tests/conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn
from deepflows_tpu.ops.pallas_kernels import flash_attention

RNG = np.random.default_rng(7)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def _naive(q, k, v, causal=False, scale=None):
    d = q.shape[-1]
    scale = (1.0 / np.sqrt(d)) if scale is None else scale
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        lq, lk = q.shape[2], k.shape[2]
        mask = np.triu(np.full((lq, lk), -np.inf, np.float32), k=1)
        s = s + mask
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _rand(shape):
    return RNG.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [(2, 2, 64, 32), (1, 3, 40, 16)])
def test_flash_forward_matches_naive(causal, shape):
    b, h, l, d = shape
    q, k, v = _rand(shape), _rand(shape), _rand(shape)
    got = flash_attention(q, k, v, causal, None, 32, 32)
    want = _naive(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_flash_cross_attention_different_lengths():
    q = _rand((2, 2, 24, 16))
    k = _rand((2, 2, 56, 16))
    v = _rand((2, 2, 56, 16))
    got = flash_attention(q, k, v, False, None, 16, 32)
    want = _naive(q, k, v, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_flash_custom_scale():
    q, k, v = _rand((1, 2, 32, 16)), _rand((1, 2, 32, 16)), _rand((1, 2, 32, 16))
    got = flash_attention(q, k, v, False, 0.5, 32, 32)
    want = _naive(q, k, v, False, scale=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grads_match_naive(causal):
    """dq/dk/dv from the recompute backward vs jax.grad of the naive path."""
    shape = (1, 2, 48, 16)  # 48 = non-multiple of block 32: padding masked
    q, k, v = _rand(shape), _rand(shape), _rand(shape)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal, None, 32, 32)
        return jnp.sum(o * jnp.cos(o))  # nontrivial cotangent

    def loss_naive(q, k, v):
        o = _naive(q, k, v, causal)
        return jnp.sum(o * jnp.cos(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for gf, gn, name in zip(g_flash, g_naive, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch (causal={causal})",
        )


def test_flash_bf16_forward_close():
    shape = (1, 2, 64, 32)
    q = _rand(shape).astype(jnp.bfloat16)
    k = _rand(shape).astype(jnp.bfloat16)
    v = _rand(shape).astype(jnp.bfloat16)
    got = flash_attention(q, k, v, True, None, 32, 32)
    assert got.dtype == jnp.bfloat16
    want = _naive(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.05, atol=0.05
    )


@pytest.mark.parametrize("causal", [False, True])
def test_mha_flash_matches_naive_tape(causal):
    """MultiheadAttention(flash=True) == flash=False through the TAPE:
    same output, same parameter gradients."""
    df.manual_seed(0)
    B, L, E, H = 2, 24, 32, 4
    x = _rand((B, L, E))
    outs, grads = [], []
    for flash in (False, True):
        df.manual_seed(3)
        mha = nn.MultiheadAttention(E, H, causal=causal, device="tpu", flash=flash)
        xt = Tensor(x, device="tpu", requires_grad=True)
        out = mha(xt)
        loss = (out * out).sum()
        loss.backward()
        outs.append(out.numpy())
        grads.append(
            {n: p.grad.numpy().copy() for n, p in mha.named_parameters()}
            | {"x": xt.grad.numpy().copy()}
        )
        Graph.free_graph_all()
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-5)
    for name in grads[0]:
        np.testing.assert_allclose(
            grads[0][name], grads[1][name], rtol=1e-3, atol=1e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_mha_flash_respects_need_weights_fallback():
    """need_weights=True must fall back to the naive path (weights exist)."""
    df.manual_seed(0)
    mha = nn.MultiheadAttention(16, 2, device="tpu", flash=True)
    x = Tensor(_rand((1, 8, 16)), device="tpu")
    with df.no_grad():
        out, w = mha(x, need_weights=True)
    assert w.shape == (1, 8, 8)


def test_lm_trains_with_flash():
    """TransformerLM(flash=True) trains a CompiledTrainStep: finite,
    decreasing loss on a memorizable batch."""
    from deepflows_tpu import models, optim
    from deepflows_tpu.jit import CompiledTrainStep

    df.manual_seed(0)
    lm = models.TransformerLM(
        vocab_size=32, max_len=16, dim=32, depth=2, num_heads=2,
        device="tpu", flash=True,
    )
    opt = optim.Adam(lm.parameters(), lr=1e-2)
    step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss())
    x = RNG.integers(0, 32, (4, 16)).astype(np.int32)
    y = RNG.integers(0, 32, (4, 16)).astype(np.int32)
    losses = [float(step(x, y)) for _ in range(8)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


# ------------------------------------------------------- sliding window
def _naive_window(q, k, v, window, scale=None):
    d = q.shape[-1]
    scale = (1.0 / np.sqrt(d)) if scale is None else scale
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    lq, lk = q.shape[2], k.shape[2]
    i = np.arange(lq)[:, None]
    j = np.arange(lk)[None, :]
    band = (j <= i) & (i - j < window)
    s = jnp.where(jnp.asarray(band), s, -np.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("window,shape,blocks", [
    (8, (2, 2, 64, 32), (16, 16)),   # band spans/skips whole blocks
    (3, (1, 2, 40, 16), (16, 16)),   # band inside one block
    (64, (1, 2, 48, 16), (16, 16)),  # window >= L == plain causal
])
def test_flash_window_forward_matches_naive(window, shape, blocks):
    q, k, v = _rand(shape), _rand(shape), _rand(shape)
    got = flash_attention(q, k, v, True, None, blocks[0], blocks[1], window)
    want = _naive_window(q, k, v, window)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_flash_window_grads_match_naive():
    shape = (1, 2, 48, 16)
    q, k, v = _rand(shape), _rand(shape), _rand(shape)

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, True, None, 16, 16, 5) ** 2).sum()

    def f_naive(q, k, v):
        return (_naive_window(q, k, v, 5) ** 2).sum()

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_mha_flash_window_matches_naive_path():
    """MultiheadAttention(flash=True, window=W) ≡ the naive banded path
    (tape-level, incl. backward through the module)."""
    x = _rand((2, 24, 32))

    def run(flash):
        df.manual_seed(3)
        m = nn.MultiheadAttention(32, 4, causal=True, window=6,
                                  flash=flash, device="tpu")
        xt = Tensor(x.copy(), device="tpu", requires_grad=True)
        out = m(xt)
        (out * out).sum().backward()
        return np.asarray(out.data.array), np.asarray(xt.grad.array)

    o1, g1 = run(False)
    o2, g2 = run(True)
    np.testing.assert_allclose(o2, o1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(g2, g1, rtol=1e-3, atol=5e-5)
