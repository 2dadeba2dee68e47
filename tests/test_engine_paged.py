"""Paged KV cache for the in-flight engine (InflightEngine(paged_blocks=N)):
K/V live in a shared block pool addressed through per-slot block tables, so
cache HBM scales with the tokens actually in flight.  Every paged output
must EXACTLY equal the dense one-shot decoder's — the indirection is pure
memory management."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, models
from deepflows_tpu.models.decoding import KVCacheDecoder
from deepflows_tpu.models.engine import InflightEngine

RNG = np.random.default_rng(31)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def _lm(vocab=48, max_len=24, seed=5):
    df.manual_seed(seed)
    return models.TransformerLM(
        vocab_size=vocab, max_len=max_len, dim=32, depth=2,
        num_heads=2, device="tpu", flash=False,
    )


def _llama(vocab=48, max_len=24, seed=7):
    df.manual_seed(seed)
    return models.LlamaLM(
        vocab_size=vocab, max_len=max_len, dim=32, depth=2, num_heads=4,
        num_kv_heads=2, device="tpu",
    )


def test_paged_greedy_matches_one_shot():
    """Staggered paged requests (block_size 8, pool of 9 blocks) produce
    exactly the dense one-shot decoder's greedy tokens."""
    lm = _lm()
    dec = KVCacheDecoder(lm)
    prompts = [RNG.integers(0, 48, (p,)).astype(np.int64) for p in (3, 6, 9)]
    budgets = [10, 7, 12]
    wants = [dec.generate(p[None], n)[0] for p, n in zip(prompts, budgets)]
    with InflightEngine(
        lm, slots=2, chunk=4, paged_blocks=9, block_size=8
    ) as eng:
        handles = [eng.submit(p, n) for p, n in zip(prompts, budgets)]
        got = [h.result(timeout=120) for h in handles]
    for g, w in zip(got, wants):
        np.testing.assert_array_equal(g, w)
    # drained engine returns every block to the free list
    assert sorted(eng._free) == list(range(1, 10))
    assert (eng._tbl == 0).all()


def test_paged_gqa_llama_matches_one_shot():
    lm = _llama()
    dec = KVCacheDecoder(lm)
    prompts = [RNG.integers(0, 48, (p,)).astype(np.int64) for p in (4, 7)]
    wants = [dec.generate(p[None], 8)[0] for p in prompts]
    with InflightEngine(
        lm, slots=2, chunk=4, paged_blocks=8, block_size=6
    ) as eng:
        got = [h.result(timeout=120) for h in
               [eng.submit(p, 8) for p in prompts]]
    for g, w in zip(got, wants):
        np.testing.assert_array_equal(g, w)


def test_paged_pool_backpressure():
    """A pool too small for two concurrent requests still completes both:
    the second admission waits for the first retirement's blocks (natural
    backpressure, not an error)."""
    lm = _lm()
    dec = KVCacheDecoder(lm)
    p1 = RNG.integers(0, 48, (6,)).astype(np.int64)
    p2 = RNG.integers(0, 48, (5,)).astype(np.int64)
    w1 = dec.generate(p1[None], 10)[0]
    w2 = dec.generate(p2[None], 10)[0]
    # each request needs ceil(16/8)=2 or ceil(15/8)=2 blocks; pool has 3:
    # both cannot be resident at once
    with InflightEngine(
        lm, slots=2, chunk=4, paged_blocks=3, block_size=8
    ) as eng:
        h1 = eng.submit(p1, 10)
        h2 = eng.submit(p2, 10)
        np.testing.assert_array_equal(h1.result(timeout=120), w1)
        np.testing.assert_array_equal(h2.result(timeout=120), w2)
    assert sorted(eng._free) == [1, 2, 3]


def test_paged_memory_is_sublinear_in_slots():
    """The point of paging: a 4-slot engine whose pool holds only the
    tokens actually in flight carries less cache HBM than the dense
    4-slot engine (which reserves slots x max_len rows)."""
    lm = _lm(max_len=48)
    dense = InflightEngine(lm, slots=4, chunk=4, start=False)
    paged = InflightEngine(
        lm, slots=4, chunk=4, paged_blocks=6, block_size=8, start=False
    )
    dense_elems = dense._kc.size * 2
    paged_elems = paged._kp.size * 2
    assert paged_elems < 0.5 * dense_elems, (paged_elems, dense_elems)


def test_paged_validation():
    lm = _lm()
    with pytest.raises(ValueError, match="divide"):
        InflightEngine(lm, paged_blocks=4, block_size=7, start=False)
    with pytest.raises(ValueError, match=">= 1"):
        InflightEngine(lm, paged_blocks=0, block_size=8, start=False)


def test_paged_sampling_and_eos():
    """Sampling requests and EOS-stopped requests run through the paged
    path (blocks released on early EOS retirement)."""
    lm = _lm()
    p = RNG.integers(0, 48, (5,)).astype(np.int64)
    with InflightEngine(
        lm, slots=2, chunk=4, top_k=8, paged_blocks=6, block_size=8
    ) as eng:
        hs = eng.submit(p, 12, temperature=0.9)
        hg = eng.submit(p, 12)
        ts, tg = hs.result(timeout=120), hg.result(timeout=120)
        assert ts.shape == (17,) and tg.shape == (17,)
        # eos stopping: pick the greedy run's 3rd generated token as eos
        eos = int(tg[p.size + 2])
        he = eng.submit(p, 12, eos_id=eos)
        te = he.result(timeout=120)
        assert te[-1] == eos and te.size <= 17
    assert sorted(eng._free) == list(range(1, 7))


def test_paged_served_over_grpc():
    """inflight + paged through the wire: MyDLPWServicer(paged_blocks=N)
    serves Generate RPCs from the paged engine, greedy equal to the
    one-shot decoder."""
    from deepflows_tpu.serving import MyDLPWServicer, PredictClient

    lm = _lm()
    dec = KVCacheDecoder(lm)
    prompt = RNG.integers(0, 48, (2, 5)).astype(np.int64)
    want = dec.generate(prompt, 6)
    server = MyDLPWServicer(
        "localhost:50941", model=lm, inflight_slots=2,
        paged_blocks=6, block_size=8,
    )
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50941")
        out = client.generate(prompt, 6)
        np.testing.assert_array_equal(out, want)
        assert server._service._engine.paged  # served by the paged engine
        client.close()
    finally:
        server.stop()
