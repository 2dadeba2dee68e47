"""Sliding-window (Mistral-style) attention: MultiheadAttention(window=W)
band-masks the causal attention, LlamaLM(window=) threads it through the
family, and every KV-cache decode path (one-shot, chunked verify,
in-flight engine) reproduces the tape forward's windowed logits."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, models, nn
from deepflows_tpu.models.decoding import KVCacheDecoder
from deepflows_tpu.models.engine import InflightEngine

RNG = np.random.default_rng(41)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_window_ge_length_equals_full_causal():
    df.manual_seed(0)
    full = nn.MultiheadAttention(16, 2, causal=True, device="tpu",
                                 flash=False)
    df.manual_seed(0)
    win = nn.MultiheadAttention(16, 2, causal=True, window=8, device="tpu",
                                flash=False)
    x = Tensor(RNG.standard_normal((2, 8, 16)).astype(np.float32),
               device="tpu")
    a = np.asarray(full(x).data.array)
    b = np.asarray(win(x).data.array)
    np.testing.assert_array_equal(a, b)


def test_window_one_attends_self_only():
    """window=1: each position sees only itself, so the output is the
    position-wise out_proj(v_proj(x)) — a closed-form check of the band."""
    df.manual_seed(1)
    m = nn.MultiheadAttention(16, 2, causal=True, window=1, device="tpu",
                              flash=False)
    x = Tensor(RNG.standard_normal((2, 6, 16)).astype(np.float32),
               device="tpu")
    got = np.asarray(m(x).data.array)
    want = np.asarray(m.out_proj(m.v_proj(x)).data.array)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_window_changes_long_range():
    df.manual_seed(2)
    full = nn.MultiheadAttention(16, 2, causal=True, device="tpu",
                                 flash=False)
    df.manual_seed(2)
    win = nn.MultiheadAttention(16, 2, causal=True, window=3, device="tpu",
                                flash=False)
    x = Tensor(RNG.standard_normal((1, 8, 16)).astype(np.float32),
               device="tpu")
    a = np.asarray(full(x).data.array)
    b = np.asarray(win(x).data.array)
    np.testing.assert_allclose(a[0, :3], b[0, :3], rtol=1e-5)  # inside band
    assert np.abs(a[0, 4:] - b[0, 4:]).max() > 1e-4  # band bites later


def test_window_validation():
    with pytest.raises(ValueError, match="causal"):
        nn.MultiheadAttention(16, 2, window=4, device="tpu")
    with pytest.raises(ValueError, match=">= 1"):
        nn.MultiheadAttention(16, 2, causal=True, window=0, device="tpu")
    # flash + window is SUPPORTED (banded Pallas kernel); ring is not
    nn.MultiheadAttention(16, 2, causal=True, window=4, flash=True,
                          device="tpu")


def _wllama(window, seed=9):
    df.manual_seed(seed)
    return models.LlamaLM(
        vocab_size=48, max_len=16, dim=32, depth=2, num_heads=4,
        num_kv_heads=2, device="tpu", window=window,
    )


def test_windowed_llama_decode_matches_tape():
    """KV-cache greedy decode of a windowed Llama equals the tape
    forward's greedy chain (prefill + per-step band masks all agree),
    and differs from the un-windowed model's decode."""
    lm = _wllama(window=4)
    prompt = RNG.integers(0, 48, (2, 6)).astype(np.int64)
    dec = KVCacheDecoder(lm)
    got = dec.generate(prompt, 8)

    # reference: greedy via the tape forward (window mask included)
    from deepflows_tpu.autograd import no_grad

    lm.eval()
    cur = prompt.copy()
    with no_grad():
        for _ in range(8):
            logits = np.asarray(lm(Tensor(cur, device="tpu")).data.array)
            nxt = logits[:, cur.shape[1] - 1].argmax(-1)
            cur = np.concatenate([cur, nxt[:, None]], 1)
    np.testing.assert_array_equal(got, cur)

    full = _wllama(window=None)  # same seed -> same weights
    np.testing.assert_array_equal(
        np.asarray([int(p.numpy().ravel()[0]) for p in full.parameters()]),
        np.asarray([int(p.numpy().ravel()[0]) for p in lm.parameters()]),
    )
    other = KVCacheDecoder(full).generate(prompt, 8)
    assert not np.array_equal(got, other)


def test_windowed_engine_matches_one_shot():
    lm = _wllama(window=4, seed=11)
    dec = KVCacheDecoder(lm)
    prompts = [RNG.integers(0, 48, (p,)).astype(np.int64) for p in (3, 6)]
    wants = [dec.generate(p[None], 7)[0] for p in prompts]
    with InflightEngine(lm, slots=2, chunk=3) as eng:
        got = [h.result(timeout=120) for h in
               [eng.submit(p, 7) for p in prompts]]
    for g, w in zip(got, wants):
        np.testing.assert_array_equal(g, w)


def test_streaming_decode_past_max_len():
    """Ring-buffer streaming: a sliding-window Llama generates BEYOND
    max_len (O(max_len) cache, absolute-position masking, extended rope
    tables).  The stream's prefix must bit-match the standard decoder
    while positions are still inside the ring (they are the same math
    until the first wrap), and the tail must stay sane."""
    lm = _wllama(window=4, seed=13)  # max_len 16
    prompt = RNG.integers(0, 48, (2, 5)).astype(np.int64)
    dec = KVCacheDecoder(lm)
    std = dec.generate(prompt, 11)  # exactly fills max_len
    out = dec.generate(prompt, 30)  # 5 + 30 = 35 > max_len 16
    assert out.shape == (2, 35)
    np.testing.assert_array_equal(out[:, :16], std)  # identical pre-wrap
    assert (out >= 0).all() and (out < 48).all()
    # the decoder works normally again after a streaming call
    np.testing.assert_array_equal(dec.generate(prompt, 11), std)


def test_streaming_decode_rejected_without_window():
    lm = _wllama(window=None, seed=13)
    dec = KVCacheDecoder(lm)
    prompt = RNG.integers(0, 48, (1, 4)).astype(np.int64)
    with pytest.raises(ValueError, match="sliding-window"):
        dec.generate(prompt, 30)


def test_streaming_matches_big_context_twin():
    """Ground truth: the same weights built with max_len LARGE enough to
    hold the whole stream (no ring wrap) — a windowed model's outputs
    must not depend on the cache size, only on the window."""
    lm_small = _wllama(window=4, seed=17)  # max_len 16 -> ring wraps
    df.manual_seed(17)
    lm_big = models.LlamaLM(
        vocab_size=48, max_len=48, dim=32, depth=2, num_heads=4,
        num_kv_heads=2, device="tpu", window=4,
    )  # same init stream -> same weights
    prompt = RNG.integers(0, 48, (2, 6)).astype(np.int64)
    want = KVCacheDecoder(lm_big).generate(prompt, 34)  # fits, no wrap
    got = KVCacheDecoder(lm_small).generate(prompt, 34)  # wraps twice
    np.testing.assert_array_equal(got, want)


def test_windowed_mha_matches_torch_banded_sdpa():
    """Differential: our MHA(window=W) against a hand-built torch
    attention with the equivalent band mask and OUR projection weights —
    forward and input gradients agree."""
    import torch

    df.manual_seed(5)
    D, H, W, L, B = 16, 2, 3, 7, 2
    m = nn.MultiheadAttention(D, H, causal=True, window=W, device="tpu",
                              flash=False)
    x = RNG.standard_normal((B, L, D)).astype(np.float32)

    xt = Tensor(x.copy(), device="tpu", requires_grad=True)
    out = m(xt)
    out.sum().backward()
    got = np.asarray(out.data.array)
    ggrad = np.asarray(xt.grad.array)

    def w_of(lin):
        return torch.tensor(np.asarray(lin.weight.data.array))

    def b_of(lin):
        return torch.tensor(np.asarray(lin.bias.data.array))

    tx = torch.tensor(x, requires_grad=True)
    q = (tx @ w_of(m.q_proj) + b_of(m.q_proj)).reshape(B, L, H, D // H).transpose(1, 2)
    k = (tx @ w_of(m.k_proj) + b_of(m.k_proj)).reshape(B, L, H, D // H).transpose(1, 2)
    v = (tx @ w_of(m.v_proj) + b_of(m.v_proj)).reshape(B, L, H, D // H).transpose(1, 2)
    i = torch.arange(L)[:, None]
    j = torch.arange(L)[None, :]
    band = (j <= i) & (i - j < W)
    s = (q @ k.transpose(-1, -2)) / np.sqrt(D // H)
    s = s.masked_fill(~band, float("-inf"))
    o = (torch.softmax(s, -1) @ v).transpose(1, 2).reshape(B, L, D)
    o = o @ w_of(m.out_proj) + b_of(m.out_proj)
    o.sum().backward()
    np.testing.assert_allclose(got, o.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ggrad, tx.grad.numpy(), rtol=1e-3, atol=1e-5)
