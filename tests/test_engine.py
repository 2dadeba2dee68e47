"""In-flight batching engine (models/engine.InflightEngine): staggered
requests share one slot-based KV cache and every request's greedy output
equals the one-shot decoder's.  No reference analog (the reference serves
one ONNXRuntime call per RPC, `DF_serving/serving/serving.py:61-68`)."""

import threading
import time

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, models
from deepflows_tpu.models.decoding import KVCacheDecoder
from deepflows_tpu.models.engine import InflightEngine

RNG = np.random.default_rng(23)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def _lm(vocab=48, max_len=24, dim=32, depth=2, heads=2, seed=5):
    df.manual_seed(seed)
    return models.TransformerLM(
        vocab_size=vocab, max_len=max_len, dim=dim, depth=depth,
        num_heads=heads, device="tpu", flash=False,
    )


def _llama(vocab=48, max_len=24, seed=7):
    df.manual_seed(seed)
    return models.LlamaLM(
        vocab_size=vocab, max_len=max_len, dim=32, depth=2, num_heads=4,
        num_kv_heads=2, device="tpu",
    )


def test_engine_greedy_matches_one_shot_staggered():
    """Three staggered requests with different prompt lengths and budgets:
    each result equals the one-shot decoder's greedy output for that
    prompt, even though they decode interleaved in shared slots."""
    lm = _lm()
    dec = KVCacheDecoder(lm)
    prompts = [
        RNG.integers(0, 48, (p,)).astype(np.int64) for p in (3, 6, 9)
    ]
    budgets = [10, 7, 12]
    wants = [
        dec.generate(p[None], n)[0] for p, n in zip(prompts, budgets)
    ]
    with InflightEngine(lm, slots=2, chunk=4) as eng:
        handles = [
            eng.submit(p, n) for p, n in zip(prompts, budgets)
        ]  # 3 requests, 2 slots: the third queues behind a retirement
        got = [h.result(timeout=120) for h in handles]
    for g, w, p in zip(got, wants, prompts):
        np.testing.assert_array_equal(g, w, err_msg=f"prompt len {p.size}")


def test_engine_llama_gqa():
    """Architecture dispatch: the Llama engine (GQA cache at num_kv_heads
    width, per-slot RoPE rows) matches the one-shot Llama decoder."""
    lm = _llama()
    dec = KVCacheDecoder(lm)
    prompts = [RNG.integers(0, 48, (p,)).astype(np.int64) for p in (2, 5)]
    wants = [dec.generate(p[None], 8)[0] for p in prompts]
    with InflightEngine(lm, slots=2, chunk=3) as eng:
        got = [
            h.result(timeout=120)
            for h in [eng.submit(p, 8) for p in prompts]
        ]
    for g, w in zip(got, wants):
        np.testing.assert_array_equal(g, w)


def test_engine_mid_flight_admission():
    """A request submitted while another is mid-decode joins the running
    batch and both finish with exact greedy outputs."""
    lm = _lm(seed=11)
    dec = KVCacheDecoder(lm)
    p1 = RNG.integers(0, 48, (4,)).astype(np.int64)
    p2 = RNG.integers(0, 48, (6,)).astype(np.int64)
    w1 = dec.generate(p1[None], 16)[0]
    w2 = dec.generate(p2[None], 6)[0]
    with InflightEngine(lm, slots=4, chunk=2) as eng:
        h1 = eng.submit(p1, 16)
        deadline = time.time() + 120
        while len(h1.tokens) < 4 and not h1.done():  # h1 is mid-flight
            assert time.time() < deadline, "h1 never progressed"
            time.sleep(0.002)
        h2 = eng.submit(p2, 6)
        np.testing.assert_array_equal(h1.result(timeout=120), w1)
        np.testing.assert_array_equal(h2.result(timeout=120), w2)


def test_engine_eos_truncates():
    """eos_id stops a request early (inclusive) without disturbing other
    slots."""
    lm = _lm(seed=3)
    dec = KVCacheDecoder(lm)
    p = RNG.integers(0, 48, (5,)).astype(np.int64)
    full = dec.generate(p[None], 12)[0]
    gen = full[5:]
    # pick the token greedy decoding emits at step 3 as the "eos"
    eos = int(gen[3])
    stop = np.flatnonzero(gen == eos)[0]
    with InflightEngine(lm, slots=2, chunk=5) as eng:
        got = eng.submit(p, 12, eos_id=eos).result(timeout=120)
    np.testing.assert_array_equal(got, full[: 5 + stop + 1])
    assert got[-1] == eos


def test_engine_capacity_queueing_and_threads():
    """More requests than slots, submitted from multiple threads: all
    finish exact."""
    lm = _lm(seed=13)
    dec = KVCacheDecoder(lm)
    prompts = [
        RNG.integers(0, 48, (1 + i % 5,)).astype(np.int64) for i in range(7)
    ]
    wants = [dec.generate(p[None], 5)[0] for p in prompts]
    results = [None] * 7
    with InflightEngine(lm, slots=2, chunk=3) as eng:

        def worker(i):
            results[i] = eng.submit(prompts[i], 5).result(timeout=180)

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(7)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
    for i, (g, w) in enumerate(zip(results, wants)):
        np.testing.assert_array_equal(g, w, err_msg=f"request {i}")


def test_engine_sampling_smoke_and_mixed():
    """A sampling request (engine-global stream) rides alongside a greedy
    one; the greedy one stays exact and the sampled one is in-vocab with
    the right length."""
    lm = _lm(seed=17)
    dec = KVCacheDecoder(lm)
    pg = RNG.integers(0, 48, (4,)).astype(np.int64)
    ps = RNG.integers(0, 48, (3,)).astype(np.int64)
    wg = dec.generate(pg[None], 9)[0]
    with InflightEngine(lm, slots=2, chunk=4) as eng:
        hs = eng.submit(ps, 9, temperature=1.0, top_p=0.9)
        hg = eng.submit(pg, 9)
        np.testing.assert_array_equal(hg.result(timeout=120), wg)
        out = hs.result(timeout=120)
    assert out.shape == (12,)
    assert ((out >= 0) & (out < 48)).all()


def test_engine_single_token_and_validation():
    lm = _lm(seed=19)
    dec = KVCacheDecoder(lm)
    p = RNG.integers(0, 48, (4,)).astype(np.int64)
    want = dec.generate(p[None], 1)[0]
    with InflightEngine(lm, slots=1, chunk=2) as eng:
        np.testing.assert_array_equal(
            eng.submit(p, 1).result(timeout=120), want
        )
        with pytest.raises(ValueError):
            eng.submit(p, 0)
        with pytest.raises(ValueError):
            eng.submit(p[None], 3)  # 2-D prompt
        with pytest.raises(ValueError):
            eng.submit(p, 100)  # exceeds max_len
    with pytest.raises(RuntimeError):
        eng.submit(p, 1)  # closed


def test_engine_sees_weight_updates_on_refresh():
    """refresh_params() picks up trained weights between chunks."""
    from deepflows_tpu import nn, optim
    from deepflows_tpu.jit import CompiledTrainStep

    lm = _lm(seed=29)
    p = RNG.integers(0, 48, (4,)).astype(np.int64)
    with InflightEngine(lm, slots=1, chunk=4) as eng:
        before = eng.submit(p, 8).result(timeout=120)
        opt = optim.Adam(lm.parameters(), lr=5e-2)
        step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss())
        x = RNG.integers(0, 48, (4, 24)).astype(np.int32)
        y = RNG.integers(0, 48, (4, 24)).astype(np.int32)
        for _ in range(5):
            step(x, y)
        eng.refresh_params()
        after = eng.submit(p, 8).result(timeout=120)
        want = KVCacheDecoder(lm).generate(p[None], 8)[0]
    assert not np.array_equal(before, after)
    np.testing.assert_array_equal(after, want)


def test_engine_prefix_cache_exact_and_counted():
    """Requests whose prompts share a registered prefix produce EXACTLY the
    no-prefix-cache outputs (greedy), across suffix lengths that cross
    pad-bucket boundaries and a full-prompt==prefix hit."""
    lm = _lm(max_len=32)
    dec = KVCacheDecoder(lm)
    prefix = RNG.integers(0, 48, (9,)).astype(np.int64)
    suffixes = [0, 1, 2, 5]  # 0 = prompt is exactly the prefix
    prompts = [
        np.concatenate([prefix, RNG.integers(0, 48, (s,))]).astype(np.int64)
        for s in suffixes
    ]
    wants = [dec.generate(p[None], 8)[0] for p in prompts]
    with InflightEngine(lm, slots=2, chunk=4) as eng:
        eng.register_prefix(prefix)
        got = [eng.generate(p, 8) for p in prompts]
        assert eng.prefix_hits == len(prompts) and eng.prefix_misses == 0
        # an unrelated prompt misses
        other = RNG.integers(0, 48, (4,)).astype(np.int64)
        eng.generate(other, 4)
        assert eng.prefix_misses == 1
    for g, w, s in zip(got, wants, suffixes):
        np.testing.assert_array_equal(g, w, err_msg=f"suffix len {s}")


def test_engine_prefix_longest_match_and_llama():
    """With nested registered prefixes the LONGEST match wins; works for
    the GQA Llama decoder (RoPE chunk forward) too."""
    lm = _llama(max_len=32)
    dec = KVCacheDecoder(lm)
    p_short = RNG.integers(0, 48, (4,)).astype(np.int64)
    p_long = np.concatenate([p_short, RNG.integers(0, 48, (6,))])
    prompt = np.concatenate([p_long, RNG.integers(0, 48, (3,))])
    want = dec.generate(prompt[None], 8)[0]
    with InflightEngine(lm, slots=2, chunk=4) as eng:
        eng.register_prefix(p_short)
        eng.register_prefix(p_long)
        got = eng.generate(prompt, 8)
        assert eng._match_prefix(prompt) == tuple(int(t) for t in p_long)
    np.testing.assert_array_equal(got, want)


def test_engine_prefix_lru_and_refresh_invalidation():
    """Eviction keeps the cache bounded, and refresh_params() makes stale
    prefix K/V recompute (results track the NEW weights)."""
    lm = _lm(max_len=32)
    prefix = RNG.integers(0, 48, (6,)).astype(np.int64)
    prompt = np.concatenate([prefix, RNG.integers(0, 48, (3,))]).astype(np.int64)
    with InflightEngine(lm, slots=2, chunk=4, max_prefixes=2) as eng:
        for i in range(4):  # 4 registrations, capacity 2
            eng.register_prefix(RNG.integers(0, 48, (5 + i,)).astype(np.int64))
        assert len(eng._prefixes) == 2
        eng.register_prefix(prefix)
        before = eng.generate(prompt, 6)

        # perturb the weights; engine must not serve stale prefix K/V
        for p in lm.parameters():
            p.data = p.data * 1.5
        eng.refresh_params()
        after = eng.generate(prompt, 6)
        want = KVCacheDecoder(lm).generate(prompt[None], 6)[0]
        np.testing.assert_array_equal(after, want)
        assert not np.array_equal(before, after) or True  # may coincide
