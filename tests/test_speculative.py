"""Speculative decoding (`models/speculative.py`).

The hard guarantee is EXACTNESS: greedy speculative output must be
bit-identical to the target's own `KVCacheDecoder.generate` for ANY draft
model (trained, random, or a different architecture) — the draft only
changes how many target forwards the generation costs, never what it
emits.  (Acceptance RATES on these random-init models are incidental:
near-uniform logits flip argmax on ulp-level differences between the
single-token and chunk-verify forwards, exactly like the documented
bf16-agreement effect in BENCH_NOTES "Decode dtype ladder".)
"""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import models
from deepflows_tpu.models import KVCacheDecoder, SpeculativeDecoder

V = 61


@pytest.fixture(autouse=True)
def _clean():
    # the module fixture's m.eval() flips the GLOBAL grad flag (reference
    # semantics) — restore it so suites running after this file (any
    # non-alphabetical selection) still build tapes
    yield
    from deepflows_tpu import Graph

    Graph.free_graph_all()
    df.set_grad_enabled(True)


@pytest.fixture(scope="module")
def lms():
    df.manual_seed(0)
    target = models.TransformerLM(
        vocab_size=V, dim=48, depth=3, num_heads=4, max_len=48, device="tpu"
    )
    df.manual_seed(7)
    draft = models.TransformerLM(
        vocab_size=V, dim=24, depth=1, num_heads=2, max_len=48, device="tpu"
    )
    df.manual_seed(11)
    llama = models.LlamaLM(
        vocab_size=V, dim=48, depth=2, num_heads=4, num_kv_heads=2,
        max_len=48, device="tpu",
    )
    for m in (target, draft, llama):
        m.eval()
    return target, draft, llama


def _prompt(b=2, l=4, seed=1):
    return np.random.RandomState(seed).randint(0, V, (b, l)).astype(np.int32)


def test_greedy_exact_random_draft(lms):
    target, draft, _ = lms
    prompt = _prompt()
    ref = KVCacheDecoder(target).generate(prompt, 14)
    spec = SpeculativeDecoder(target, draft, gamma=4)
    out = spec.generate(prompt, 14)
    np.testing.assert_array_equal(ref, out)
    assert spec.last_stats["rounds"] >= 1


def test_greedy_exact_self_draft_accelerates(lms):
    target, _, _ = lms
    prompt = _prompt()
    ref = KVCacheDecoder(target).generate(prompt, 16)
    spec = SpeculativeDecoder(target, target, gamma=4)
    out = spec.generate(prompt, 16)
    np.testing.assert_array_equal(ref, out)
    # a perfect-ish draft needs far fewer rounds than tokens
    assert spec.last_stats["rounds"] < 16
    assert spec.last_stats["accepted"] > 0


def test_greedy_exact_llama_and_mixed_draft(lms):
    target, draft, llama = lms
    prompt = _prompt(b=2, l=3, seed=5)
    ref = KVCacheDecoder(llama).generate(prompt, 12)
    for d in (draft, llama):  # GPT draft for a Llama target, and self
        spec = SpeculativeDecoder(llama, d, gamma=3)
        np.testing.assert_array_equal(ref, spec.generate(prompt, 12))


def test_gpt_draft_for_gpt_target_gamma1(lms):
    target, draft, _ = lms
    prompt = _prompt(seed=9)
    ref = KVCacheDecoder(target).generate(prompt, 10)
    spec = SpeculativeDecoder(target, draft, gamma=1)
    np.testing.assert_array_equal(ref, spec.generate(prompt, 10))


def test_sampling_reproducible_and_in_range(lms):
    target, draft, _ = lms
    prompt = _prompt()
    spec = SpeculativeDecoder(target, draft, gamma=3)
    a = spec.generate(prompt, 10, temperature=0.9, seed=4)
    b = spec.generate(prompt, 10, temperature=0.9, seed=4)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 4 + 10)
    assert (a >= 0).all() and (a < V).all()
    c = spec.generate(prompt, 10, temperature=0.9, seed=5)
    assert not np.array_equal(a, c)  # different seed, different draw


def test_bf16_compute_exactness(lms):
    import jax.numpy as jnp

    target, _, _ = lms
    prompt = _prompt(seed=2)
    ref = KVCacheDecoder(target, compute_dtype=jnp.bfloat16).generate(
        prompt, 10
    )
    spec = SpeculativeDecoder(
        target, target, gamma=3, compute_dtype=jnp.bfloat16
    )
    np.testing.assert_array_equal(ref, spec.generate(prompt, 10))


def test_eos_truncation(lms):
    target, draft, _ = lms
    prompt = _prompt()
    spec = SpeculativeDecoder(target, draft, gamma=3)
    base = spec.generate(prompt, 12)
    eos = int(base[0, 6])  # force a token we know appears to act as eos
    out = spec.generate(prompt, 12, eos_id=eos)
    row = out[0, 4:]
    hits = np.where(row == eos)[0]
    assert hits.size
    assert (row[hits[0] :] == eos).all()


def test_validation_errors(lms):
    target, draft, _ = lms
    other = models.TransformerLM(
        vocab_size=V + 1, dim=24, depth=1, num_heads=2, max_len=48,
        device="tpu",
    )
    with pytest.raises(ValueError, match="vocabulary"):
        SpeculativeDecoder(target, other)
    with pytest.raises(ValueError, match="gamma"):
        SpeculativeDecoder(target, draft, gamma=0)
    spec = SpeculativeDecoder(target, draft, gamma=4)
    with pytest.raises(ValueError, match="max_len"):
        spec.generate(_prompt(), 48)  # 4 + 48 + 4 > 48


def test_chunk_forward_matches_sequential(lms):
    """The verify chunk forward must agree with g sequential single-token
    forwards (same cache evolution, same logits)."""
    import jax.numpy as jnp

    target, _, _ = lms
    dec = KVCacheDecoder(target)
    params = dec._prep_jit(dec._gather())
    prompt = _prompt(b=2, l=4, seed=3)
    L = target.max_len
    pad = np.zeros((2, L), np.int32)
    pad[:, :4] = prompt
    kc, vc, logits0 = dec._prefill_jit(params, jnp.asarray(pad), 4)
    toks = np.random.RandomState(0).randint(0, V, (2, 3)).astype(np.int32)
    positions = jnp.arange(L)

    # sequential
    kc1, vc1 = kc, vc
    seq_logits = []
    for j in range(3):
        lg, kc1, vc1 = dec._forward_one(
            params, kc1, vc1, jnp.asarray(toks[:, j]), 4 + j, positions
        )
        seq_logits.append(np.asarray(lg))

    # chunk
    lg_chunk, kc2, vc2 = dec._forward_chunk(
        params, kc, vc, jnp.asarray(toks), jnp.full((2,), 4, jnp.int32),
        positions,
    )
    for j in range(3):
        np.testing.assert_allclose(
            seq_logits[j], np.asarray(lg_chunk[:, j]), rtol=2e-4, atol=2e-4
        )
    np.testing.assert_allclose(
        np.asarray(kc1), np.asarray(kc2), rtol=1e-5, atol=1e-5
    )


def test_grpc_generate_speculative(lms):
    """A server constructed with a draft model serves Generate
    speculatively — greedy output over the wire is bit-identical to the
    target-only server's, and top-k requests fall back cleanly."""
    from deepflows_tpu.serving import MyDLPWServicer, PredictClient

    target, draft, _ = lms
    server = MyDLPWServicer(
        "localhost:50931", model=target, draft_model=draft, spec_gamma=3
    )
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50931")
        prompt = _prompt(b=2, l=4, seed=6).astype(np.int64)
        out = client.generate(prompt, 8)
        want = KVCacheDecoder(target).generate(prompt, 8)
        np.testing.assert_array_equal(out, want)
        assert server._service._spec is not None  # speculative path served it
        # top_k requests are not speculative-compatible: plain decoder path
        np.testing.assert_array_equal(
            client.generate(prompt, 8, temperature=2.0, top_k=1), want
        )
        client.close()
    finally:
        server.stop()
