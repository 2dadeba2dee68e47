"""Encoder-decoder transformer (models/seq2seq): tape forward, KV-cache
greedy generation equivalence, CompiledTrainStep training on a sequence
reversal task.  No reference analog (the reference zoo is CNN-only)."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn, optim, models
from deepflows_tpu.jit import CompiledTrainStep

RNG = np.random.default_rng(17)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def _model(vocab=24, src_len=8, tgt_len=8, dim=32, seed=3, **kw):
    df.manual_seed(seed)
    return models.Seq2SeqTransformer(
        vocab_size=vocab, src_len=src_len, tgt_len=tgt_len, dim=dim,
        enc_depth=2, dec_depth=2, num_heads=2, device="tpu", **kw
    )


def _naive_greedy(m, src, n, bos=0):
    """Reference decode via the TAPE forward: teacher-force the grown
    prefix each step, argmax at the last consumed position."""
    from deepflows_tpu.autograd import no_grad

    B = src.shape[0]
    out = np.zeros((B, 0), np.int64)
    m.eval()
    with no_grad():
        for t in range(n):
            tgt_in = np.zeros((B, m.tgt_len), np.int64)
            tgt_in[:, 0] = bos
            if t:
                tgt_in[:, 1 : t + 1] = out
            x = np.concatenate([src, tgt_in], 1)
            logits = m(Tensor(x, device="tpu"))
            nxt = np.asarray(logits.data.array)[:, t].argmax(-1)
            out = np.concatenate([out, nxt[:, None]], 1)
    return out


def test_seq2seq_generate_matches_tape_forward():
    """The fori_loop KV-cache generator reproduces the tape forward's
    greedy tokens exactly (cross K/V computed once, self-KV cached)."""
    m = _model()
    src = RNG.integers(0, 24, (3, 8)).astype(np.int64)
    want = _naive_greedy(m, src, 6)
    got = m.generate(src, 6)
    np.testing.assert_array_equal(got, want)


def test_seq2seq_generate_bf16_and_bos():
    import jax.numpy as jnp

    from deepflows_tpu.models.seq2seq import Seq2SeqGenerator

    m = _model(seed=11)
    src = RNG.integers(0, 24, (2, 8)).astype(np.int64)
    g32 = m.generate(src, 5, bos_id=3)
    want = _naive_greedy(m, src, 5, bos=3)
    np.testing.assert_array_equal(g32, want)
    gen16 = Seq2SeqGenerator(m, compute_dtype=jnp.bfloat16)
    out16 = gen16.generate(src, 5, bos_id=3)
    assert out16.shape == (2, 5)  # bf16 may flip near-ties at random init


def test_seq2seq_shapes_and_validation():
    m = _model()
    src = RNG.integers(0, 24, (2, 8)).astype(np.int64)
    tgt_in = RNG.integers(0, 24, (2, 8)).astype(np.int64)
    logits = m(Tensor(np.concatenate([src, tgt_in], 1), device="tpu"))
    assert logits.shape == (2, 8, 24)
    with pytest.raises(ValueError):
        m.generate(src, 9)  # > tgt_len
    with pytest.raises(ValueError):
        m.generate(src[0], 4)  # not 2-D


def test_seq2seq_trains_reversal_task():
    """Teacher-forced training through CompiledTrainStep on sequence
    reversal; the trained model's generate() solves held-out sequences —
    cross-attention is load-bearing (output depends on the source)."""
    V, L = 16, 6
    m = _model(vocab=V, src_len=L, tgt_len=L, dim=64, seed=5)
    opt = optim.Adam(m.parameters(), lr=3e-3)
    step = CompiledTrainStep(m, opt, nn.CrossEntropyLoss())
    BOS = 0

    def batch(bs):
        src = RNG.integers(1, V, (bs, L)).astype(np.int64)
        tgt = src[:, ::-1].copy()
        tgt_in = np.concatenate([np.full((bs, 1), BOS, np.int64), tgt[:, :-1]], 1)
        return np.concatenate([src, tgt_in], 1), tgt

    first = None
    for i in range(220):
        x, y = batch(32)
        loss = float(step(x, y))
        if first is None:
            first = loss
    assert loss < 0.15 * first, (first, loss)

    src = RNG.integers(1, V, (4, L)).astype(np.int64)
    out = m.generate(src, L, bos_id=BOS)
    acc = (out == src[:, ::-1]).mean()
    assert acc > 0.95, acc
