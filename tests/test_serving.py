"""Serving tests: real gRPC round-trip on localhost, backed by framework
inference (the reference served via ONNXRuntime; `serving.py:61-68`)."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn

grpc = pytest.importorskip("grpc")

from deepflows_tpu.serving import MyDLPWServicer, PredictClient  # noqa: E402


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_grpc_predict_roundtrip():
    df.manual_seed(0)
    model = nn.Sequential(
        nn.Linear(8, 16, device="tpu"), nn.ReLU(), nn.Linear(16, 3, device="tpu")
    )
    server = MyDLPWServicer("localhost:50911", model=model)
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50911")
        x = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
        (out,) = client.predict(x)
        model.eval()
        want = model(Tensor(x, device="tpu")).numpy()
        model.train()
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
        # two matrices in one request
        outs = client.predict(x, x * 2)
        assert len(outs) == 2
        client.close()
    finally:
        server.stop()


def test_grpc_concurrent_predicts():
    """Production robustness: 8 concurrent clients × distinct inputs all get
    the right answers (thread-pooled server, jitted inference under load)."""
    import threading

    df.manual_seed(0)
    model = nn.Sequential(
        nn.Linear(8, 16, device="tpu"), nn.ReLU(), nn.Linear(16, 3, device="tpu")
    )
    server = MyDLPWServicer("localhost:50913", model=model)
    server.serve(wait=False)
    try:
        model.eval()
        rng = np.random.default_rng(1)
        inputs = [rng.standard_normal((4, 8)).astype(np.float32) for _ in range(8)]
        wants = [model(Tensor(x, device="tpu")).numpy() for x in inputs]
        model.train()
        results = [None] * 8
        errors = []

        def worker(i):
            try:
                c = PredictClient("localhost:50913")
                for _ in range(5):
                    (out,) = c.predict(inputs[i])
                results[i] = out
                c.close()
            except Exception as e:  # pragma: no cover
                errors.append((i, e))

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        for out, want in zip(results, wants):
            np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
    finally:
        server.stop()


def test_serve_exported_lm_from_disk(tmp_path):
    """The reference's deployment shape for the LM: export to .onnx, serve
    THAT file, predict over gRPC (token ids ride the float matrix wire and
    Gather casts them back)."""
    from deepflows_tpu import models
    from deepflows_tpu.jit import CompiledEvalStep
    from deepflows_tpu.onnx import export_onnx

    df.manual_seed(0)
    lm = models.TransformerLM(vocab_size=16, max_len=8, dim=32, depth=2,
                              num_heads=2, device="tpu")
    idx = np.random.default_rng(0).integers(0, 16, (2, 8)).astype(np.int32)
    export_onnx(lm, idx, str(tmp_path / "lm.onnx"))

    server = MyDLPWServicer(
        "localhost:50917", root_dir=str(tmp_path), model_file="lm.onnx"
    )
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50917")
        (out,) = client.predict(idx.astype(np.float32))
        lm.eval()
        want = np.asarray(CompiledEvalStep(lm)(idx)).reshape(out.shape)
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
        client.close()
    finally:
        server.stop()


def test_grpc_generate_kv_cache_decoding():
    """Generate RPC: server-side KV-cache greedy decoding equals the LM's
    own generate(); Predict on a non-LM raises a clean error for Generate."""
    from deepflows_tpu import models

    df.manual_seed(7)
    lm = models.TransformerLM(
        vocab_size=16, max_len=16, dim=32, depth=2, num_heads=2,
        device="tpu", flash=False,
    )
    server = MyDLPWServicer("localhost:50917", model=lm)
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50917")
        prompt = np.array([[1, 3, 5], [2, 4, 6]], np.int64)
        out = client.generate(prompt, 5)
        want = lm.generate(prompt, 5)
        np.testing.assert_array_equal(out, want)
        # sampled decode over the wire: seeded draw is reproducible,
        # top_k=1 collapses to greedy
        s1 = client.generate(prompt, 5, temperature=1.0, seed=3)
        s2 = client.generate(prompt, 5, temperature=1.0, seed=3)
        np.testing.assert_array_equal(s1, s2)
        assert s1[:, :3].tolist() == prompt.tolist()
        np.testing.assert_array_equal(
            client.generate(prompt, 5, temperature=2.0, top_k=1), want
        )
        client.close()
    finally:
        server.stop()


def test_grpc_generate_llama():
    """Generate RPC serves the Llama family too (KVCacheDecoder dispatches
    on the architecture; the wire contract is unchanged)."""
    from deepflows_tpu import models

    df.manual_seed(3)
    lm = models.LlamaLM(
        vocab_size=16, max_len=16, dim=32, depth=2, num_heads=4,
        num_kv_heads=2, device="tpu", flash=False,
    )
    server = MyDLPWServicer("localhost:50921", model=lm)
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50921")
        prompt = np.array([[1, 3, 5], [2, 4, 6]], np.int64)
        out = client.generate(prompt, 5)
        want = lm.generate(prompt, 5)
        np.testing.assert_array_equal(out, want)
        client.close()
    finally:
        server.stop()


def test_grpc_generate_rejects_non_lm():
    df.manual_seed(0)
    model = nn.Sequential(nn.Linear(8, 3, device="tpu"))
    server = MyDLPWServicer("localhost:50919", model=model)
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50919")
        with pytest.raises(grpc.RpcError):
            client.generate(np.array([[1, 2]], np.int64), 3)
        client.close()
    finally:
        server.stop()


def test_grpc_generate_int8_quantized_decoder():
    """decode_quant="int8" serves the Generate RPC through the int8
    weight-only KV decoder; greedy output over the wire still equals the
    dense LM's generate() on a well-separated model."""
    from deepflows_tpu import models

    df.manual_seed(13)
    lm = models.TransformerLM(
        vocab_size=16, max_len=16, dim=32, depth=2, num_heads=2,
        device="tpu", flash=False,
    )
    import jax.numpy as jnp

    server = MyDLPWServicer(
        "localhost:50918", model=lm,
        decode_dtype=jnp.bfloat16, decode_quant="int8",
    )
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50918")
        prompt = np.array([[1, 3, 5], [2, 4, 6]], np.int64)
        out = client.generate(prompt, 5)
        np.testing.assert_array_equal(out, lm.generate(prompt, 5))
        assert server._service._decoder.quant == "int8"
        client.close()
    finally:
        server.stop()


def test_grpc_generate_inflight_batching():
    """inflight_slots=N: concurrent Generate RPCs share one slot-based
    engine (models.InflightEngine) — every client still gets the exact
    greedy tokens, and the shared engine actually served them."""
    import threading

    from deepflows_tpu import models

    df.manual_seed(21)
    lm = models.TransformerLM(
        vocab_size=16, max_len=16, dim=32, depth=2, num_heads=2,
        device="tpu", flash=False,
    )
    server = MyDLPWServicer(
        "localhost:50923", model=lm, inflight_slots=3, inflight_chunk=2
    )
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50923")
        prompts = [
            np.array([[1, 3, 5]], np.int64),
            np.array([[2, 4]], np.int64),
            np.array([[7, 6, 5, 4]], np.int64),
        ]
        budgets = [5, 7, 4]
        wants = [lm.generate(p, n) for p, n in zip(prompts, budgets)]
        outs = [None] * 3

        def call(i):
            outs[i] = client.generate(prompts[i], budgets[i])

        threads = [
            threading.Thread(target=call, args=(i,)) for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        for i, (o, w) in enumerate(zip(outs, wants)):
            np.testing.assert_array_equal(o, w, err_msg=f"rpc {i}")
        assert server._service._engine is not None  # engine served them
        # multi-row prompts fan out to one engine request per row
        multi = np.array([[1, 2, 3], [4, 5, 6]], np.int64)
        np.testing.assert_array_equal(
            client.generate(multi, 5), lm.generate(multi, 5)
        )
        client.close()
    finally:
        server.stop()
        assert server._service._engine is None  # stop() closed the engine


def test_grpc_generate_prefix_cached_system_prompt():
    """PredictService.register_prefix: Generate RPCs whose prompts start
    with the registered system prompt hit the engine's prefix cache and
    still return the exact greedy tokens."""
    from deepflows_tpu import models

    df.manual_seed(29)
    lm = models.TransformerLM(
        vocab_size=16, max_len=24, dim=32, depth=2, num_heads=2,
        device="tpu", flash=False,
    )
    server = MyDLPWServicer(
        "localhost:50924", model=lm, inflight_slots=2, inflight_chunk=2
    )
    sys_prompt = np.array([9, 8, 7, 6, 5], np.int64)
    server._service.register_prefix(sys_prompt)  # before engine exists
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50924")
        prompts = [
            np.concatenate([sys_prompt, np.array(s, np.int64)])[None]
            for s in ([1, 2], [3], [4, 5, 6])
        ]
        for p in prompts:
            np.testing.assert_array_equal(
                client.generate(p, 6), lm.generate(p, 6)
            )
        eng = server._service._engine
        assert eng is not None and eng.prefix_hits == len(prompts)
        # registering on the LIVE service reaches the running engine
        extra = np.array([2, 2, 2], np.int64)
        server._service.register_prefix(extra)
        np.testing.assert_array_equal(
            client.generate(np.concatenate([extra, [1]])[None], 5),
            lm.generate(np.concatenate([extra, [1]])[None], 5),
        )
        assert eng.prefix_hits == len(prompts) + 1
        client.close()
    finally:
        server.stop()


def test_grpc_generate_seq2seq():
    """Generate RPC serves the encoder-decoder family: matrix[0] is the
    SOURCE ids and the response is the generated TARGET (greedy, one
    scanned decode program server-side); knob slot 4 carries bos_id."""
    from deepflows_tpu import models

    df.manual_seed(9)
    m = models.Seq2SeqTransformer(
        vocab_size=24, src_len=6, tgt_len=6, dim=32, enc_depth=1,
        dec_depth=1, num_heads=2, device="tpu",
    )
    server = MyDLPWServicer("localhost:50931", model=m)
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50931")
        src = np.array([[1, 3, 5, 7, 9, 11], [2, 4, 6, 8, 10, 12]], np.int64)
        out = client.generate(src, 4)
        want = m.generate(src, 4, bos_id=0)
        np.testing.assert_array_equal(out, want)
        assert out.shape == (2, 4)  # target only, not prompt+target
        # bos_id rides the 4th knob slot
        out3 = client.generate(src, 4, temperature=0.0, seed=3)
        want3 = m.generate(src, 4, bos_id=3)
        np.testing.assert_array_equal(out3, want3)
        client.close()
    finally:
        server.stop()
