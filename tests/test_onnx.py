"""ONNX export / load / serve-from-disk (VERDICT r1 item 5; reference
behavior being matched: `DF_serving/serving/serving.py:25,61-68` serves an
.onnx from root_dir/model_file)."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, models
from deepflows_tpu.jit import CompiledEvalStep
from deepflows_tpu.onnx import OnnxModel, check_onnx, export_onnx

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def _roundtrip(model, shape, tmp_path, name):
    df.manual_seed(0)
    x = RNG.standard_normal(shape).astype(np.float32)
    path = str(tmp_path / f"{name}.onnx")
    export_onnx(model, x, path)
    model.eval()
    live = np.asarray(CompiledEvalStep(model)(x))
    got = OnnxModel(path)(x)
    np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-5)
    df.set_grad_enabled(True)
    return path


def test_export_mnist_cnn_roundtrip(tmp_path):
    p = _roundtrip(models.MNIST_CNN(device="tpu"), (2, 1, 28, 28), tmp_path, "m")
    info = check_onnx(p)
    assert info["ops"]["Conv"] == 2 and info["ops"]["MatMul"] == 1
    assert info["inputs"] == ["input"] and info["opset"] == [13]


def test_export_cifar10_cnn_roundtrip(tmp_path):
    # dropout must export as identity (eval), BN eval as folded Sub/Div
    p = _roundtrip(models.CIFAR10_CNN(device="tpu"), (2, 3, 32, 32), tmp_path, "c")
    info = check_onnx(p)
    assert "Dropout" not in info["ops"]
    assert info["ops"]["Conv"] == 3


def test_export_resnet18_roundtrip(tmp_path):
    p = _roundtrip(
        models.ResNet18(num_classes=10, small_input=True, device="tpu"),
        (2, 3, 32, 32),
        tmp_path,
        "r",
    )
    info = check_onnx(p)
    assert info["ops"]["Conv"] == 20  # 16 block convs + 3 downsample + stem


def test_export_vgg16_and_mobilenet(tmp_path):
    _roundtrip(
        models.VGG16(num_classes=10, img_size=32, device="tpu"),
        (1, 3, 32, 32),
        tmp_path,
        "v",
    )
    _roundtrip(
        models.MobileNetV1(num_classes=10, device="tpu"),
        (1, 3, 32, 32),
        tmp_path,
        "mb",
    )


def test_dynamic_batch(tmp_path):
    model = models.MNIST_CNN(device="tpu")
    x = RNG.standard_normal((2, 1, 28, 28)).astype(np.float32)
    path = str(tmp_path / "m.onnx")
    export_onnx(model, x, path)
    loaded = OnnxModel(path)
    model.eval()
    for bs in (1, 7):
        xb = RNG.standard_normal((bs, 1, 28, 28)).astype(np.float32)
        np.testing.assert_allclose(
            loaded(xb), np.asarray(CompiledEvalStep(model)(xb)),
            rtol=1e-5, atol=1e-5,
        )
    df.set_grad_enabled(True)


def test_train_mode_export_rejected(tmp_path):
    model = models.CIFAR10_CNN(device="tpu")
    model.train()
    from deepflows_tpu.onnx.export import _Exporter, trace

    # trace() forces eval mode, so drive the exporter with a train trace
    from deepflows_tpu.autograd import enable_grad
    from deepflows_tpu.tensor import Tensor

    with enable_grad():
        x = Tensor(
            RNG.standard_normal((2, 3, 32, 32)).astype(np.float32),
            device="tpu",
            requires_grad=True,
        )
        out = model(x)
    ex = _Exporter(x, True)
    with pytest.raises(ValueError, match="eval"):
        ex.name_of(out)


def test_serve_onnx_from_disk(tmp_path):
    """Reference contract: MyDLPWServicer(host, root_dir, model_file) serves
    a model file from disk (`DF_serving/serving/serving.py:25`)."""
    from deepflows_tpu.serving import MyDLPWServicer, PredictClient

    model = models.MNIST_CNN(device="tpu")
    x = RNG.standard_normal((3, 1, 28, 28)).astype(np.float32)
    path = str(tmp_path / "mnist.onnx")
    export_onnx(model, x, path)
    model.eval()
    live = np.asarray(CompiledEvalStep(model)(x))
    df.set_grad_enabled(True)

    servicer = MyDLPWServicer(
        "localhost:50905", root_dir=str(tmp_path), model_file="mnist.onnx"
    )
    server = servicer.serve(wait=False)
    try:
        client = PredictClient("localhost:50905")
        (out,) = client.predict(x)
        client.close()
    finally:
        server.stop(0)
    np.testing.assert_allclose(out, live, rtol=1e-4, atol=1e-5)


def test_onnxruntime_crosscheck(tmp_path):
    """Env-gated: runs only where onnxruntime is installed (absent in this
    image) — proves the emitted files are wire-valid for the official stack."""
    ort = pytest.importorskip("onnxruntime")
    model = models.MNIST_CNN(device="tpu")
    x = RNG.standard_normal((2, 1, 28, 28)).astype(np.float32)
    path = str(tmp_path / "m.onnx")
    export_onnx(model, x, path)
    sess = ort.InferenceSession(path)
    (got,) = sess.run(None, {"input": x})
    model.eval()
    live = np.asarray(CompiledEvalStep(model)(x))
    df.set_grad_enabled(True)
    np.testing.assert_allclose(got, live, rtol=1e-4, atol=1e-5)


def test_unsupported_graph_rejected(tmp_path):
    from deepflows_tpu.onnx.proto import onnx_minimal_pb2 as pb

    m = pb.ModelProto()
    m.ir_version = 8
    m.opset_import.add().version = 13
    n = m.graph.node.add()
    n.op_type = "LSTM"
    n.input.append("input")
    n.output.append("out")
    vi = m.graph.input.add()
    vi.name = "input"
    m.graph.output.add().name = "out"
    path = str(tmp_path / "bad.onnx")
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    with pytest.raises(ValueError, match="unsupported ONNX ops"):
        OnnxModel(path)


def test_foreign_graph_ops_execute(tmp_path):
    """Ops our exporter never emits but foreign files use (Gemm with transB,
    Flatten, BatchNormalization, GlobalAveragePool) must execute correctly."""
    from deepflows_tpu.onnx.proto import onnx_minimal_pb2 as pb
    from deepflows_tpu.onnx.export import _tensor_proto, _value_info

    rng = np.random.default_rng(0)
    C = 3
    scale = rng.standard_normal(C).astype(np.float32)
    bias = rng.standard_normal(C).astype(np.float32)
    mean = rng.standard_normal(C).astype(np.float32)
    var = np.abs(rng.standard_normal(C)).astype(np.float32) + 0.5
    W = rng.standard_normal((4, C)).astype(np.float32)  # Gemm weight (out,in)
    b = rng.standard_normal(4).astype(np.float32)

    m = pb.ModelProto()
    m.ir_version = 8
    m.opset_import.add().version = 13
    g = m.graph
    g.name = "foreign"
    g.input.append(_value_info("input", (2, C, 5, 5), True))
    for name, arr in [("scale", scale), ("bias", bias), ("mean", mean),
                      ("var", var), ("W", W), ("b", b)]:
        g.initializer.append(_tensor_proto(name, arr))

    n = g.node.add(); n.op_type = "BatchNormalization"
    n.input.extend(["input", "scale", "bias", "mean", "var"]); n.output.append("bn")
    a = n.attribute.add(); a.name = "epsilon"; a.type = pb.AttributeProto.FLOAT; a.f = 1e-5
    n = g.node.add(); n.op_type = "GlobalAveragePool"
    n.input.append("bn"); n.output.append("gap")
    n = g.node.add(); n.op_type = "Flatten"
    n.input.append("gap"); n.output.append("flat")
    n = g.node.add(); n.op_type = "Gemm"
    n.input.extend(["flat", "W", "b"]); n.output.append("out")
    a = n.attribute.add(); a.name = "transB"; a.type = pb.AttributeProto.INT; a.i = 1
    g.output.append(_value_info("out", (2, 4), True))

    path = str(tmp_path / "foreign.onnx")
    with open(path, "wb") as f:
        f.write(m.SerializeToString())

    from deepflows_tpu.onnx import OnnxModel

    x = rng.standard_normal((2, C, 5, 5)).astype(np.float32)
    got = OnnxModel(path)(x)
    bn = (x - mean.reshape(1, C, 1, 1)) / np.sqrt(var.reshape(1, C, 1, 1) + 1e-5)
    bn = bn * scale.reshape(1, C, 1, 1) + bias.reshape(1, C, 1, 1)
    want = bn.mean((2, 3)) @ W.T + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_jax_bridge_node_refuses_constant_fold(tmp_path):
    """Models containing an opaque jax_function node must FAIL export with a
    clear error — never silently bake the output as a constant."""
    import deepflows_tpu as df
    from deepflows_tpu import nn
    from deepflows_tpu.onnx import export_onnx

    df.manual_seed(0)
    model = nn.Sequential(
        nn.MoE(8, 16, n_experts=2, capacity_factor=2.0, device="tpu"),
        nn.Flatten(),
        nn.Linear(2 * 8, 3, device="tpu"),
    )
    x = np.random.default_rng(0).standard_normal((2, 2, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="no ONNX mapping|not exportable"):
        export_onnx(model, x, str(tmp_path / "moe.onnx"))


def test_shard_constraint_exports_as_identity(tmp_path):
    """SP-annotated models export (the constraint is a run-time layout hint,
    emitted as Identity) and reproduce the unannotated model's outputs."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import deepflows_tpu as df
    from deepflows_tpu import nn
    from deepflows_tpu.onnx import OnnxModel, export_onnx
    from deepflows_tpu.parallel import make_mesh, sequence_sharding

    mesh = make_mesh({"data": 2, "model": 4})
    sp = sequence_sharding(mesh, axis="model", dim=1)
    df.manual_seed(0)
    model = nn.Sequential(
        sp, nn.Linear(8, 8, device="tpu"), nn.ReLU(), sp,
        nn.Linear(8, 4, device="tpu"),
    )
    x = np.random.default_rng(0).standard_normal((2, 3, 8)).astype(np.float32)
    p = export_onnx(model, x, str(tmp_path / "sp.onnx"))
    om = OnnxModel(p)
    got = om(x)
    ref = model(df.Tensor(x, device="tpu")).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_mobilenet_v2_roundtrip(tmp_path):
    """MobileNetV2 (inverted residuals, depthwise groups, ReLU6 -> Min op)
    exports and the own runtime reproduces inference."""
    import deepflows_tpu as df
    from deepflows_tpu import models
    from deepflows_tpu.jit import CompiledEvalStep
    from deepflows_tpu.onnx import OnnxModel, export_onnx

    df.manual_seed(0)
    m = models.MobileNetV2(num_classes=4, small_input=True, device="tpu")
    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(np.float32)
    p = export_onnx(m, x, str(tmp_path / "mb2.onnx"))
    om = OnnxModel(p)
    got = om(x)
    m.eval()
    ref = np.asarray(CompiledEvalStep(m)(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_transformer_lm_roundtrip(tmp_path):
    """The decoder LM exports (integer graph input -> Gather embedding
    lookup; pos embeddings and causal mask constant-folded) and the own
    runtime reproduces logits exactly, incl. dynamic batch."""
    import deepflows_tpu as df
    from deepflows_tpu import models
    from deepflows_tpu.jit import CompiledEvalStep
    from deepflows_tpu.onnx import OnnxModel, check_onnx, export_onnx

    df.manual_seed(0)
    lm = models.TransformerLM(vocab_size=16, max_len=8, dim=32, depth=2,
                              num_heads=2, device="tpu")
    idx = np.random.default_rng(0).integers(0, 16, (2, 8)).astype(np.int32)
    p = export_onnx(lm, idx, str(tmp_path / "lm.onnx"))
    assert check_onnx(p)["ops"].get("Gather") == 1
    om = OnnxModel(p)
    got = om(idx)
    lm.eval()
    ref = np.asarray(CompiledEvalStep(lm)(idx))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    idx2 = np.random.default_rng(1).integers(0, 16, (5, 8)).astype(np.int32)
    assert om(idx2).shape == (5, 8, 16)


def test_input_slice_exports(tmp_path):
    """Static slicing of an input-DEPENDENT tensor lowers to ONNX Slice."""
    import deepflows_tpu as df
    from deepflows_tpu import nn
    from deepflows_tpu.onnx import OnnxModel, check_onnx, export_onnx

    class Headless(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = nn.Linear(8, 8, device="tpu")

        def forward(self, x):
            return self.lin(x)[:, :3]

    df.manual_seed(0)
    m = Headless()
    x = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
    p = export_onnx(m, x, str(tmp_path / "slice.onnx"))
    assert check_onnx(p)["ops"].get("Slice") == 1
    got = OnnxModel(p)(x)
    m.eval()
    ref = m(df.Tensor(x, device="tpu")).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_open_ended_slice_roundtrip(tmp_path):
    """Open-ended slices (`x[:, 4:]`) export with the INT64_MAX ends
    sentinel; the runtime must not let the x64-disabled jnp conversion
    truncate it to int32 -1 ("stop at last-1") — regression: the tail
    element silently vanished from the slice."""
    from deepflows_tpu import nn

    class Tail(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = nn.Linear(8, 8, device="tpu")

        def forward(self, x):
            return self.lin(x)[:, 4:]

    df.manual_seed(0)
    m = Tail()
    x = RNG.standard_normal((3, 8)).astype(np.float32)
    p = export_onnx(m, x, str(tmp_path / "tail.onnx"))
    got = OnnxModel(p)(x)
    assert got.shape == (3, 4)
    m.eval()
    ref = m(df.Tensor(x, device="tpu")).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_llama_roundtrip_fresh_input(tmp_path):
    """LlamaLM (RMSNorm/RoPE/GQA/SwiGLU) exports — silu decomposes to
    Sigmoid+Mul — and the runtime reproduces logits on tokens NEVER seen
    at trace time (nothing input-dependent was constant-folded)."""
    df.manual_seed(0)
    m = models.LlamaLM(vocab_size=32, dim=32, depth=2, num_heads=2,
                       num_kv_heads=1, max_len=8, device="tpu")
    m.eval()
    xa = RNG.integers(0, 32, (2, 8)).astype(np.int64)
    p = export_onnx(m, xa, str(tmp_path / "llama.onnx"),
                    batch_dynamic=False)  # trunk merges batch x length
    assert check_onnx(p)["ops"].get("Sigmoid", 0) > 0
    xb = RNG.integers(0, 32, (2, 8)).astype(np.int64)
    ref = np.asarray(m(df.Tensor(xb, device="tpu")).data.array)
    got = OnnxModel(p)(xb.astype(np.int32))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_mixtral_roundtrip_routing_not_folded(tmp_path):
    """MixtralLM export keeps the top-k expert ROUTING input-dependent
    (TopK + GreaterOrEqual + Cast nodes, F.topk_mask tape op) — fresh
    tokens route differently than the trace sample; regression: the
    routing mask was a severed tape constant and got baked into the file."""
    df.manual_seed(0)
    m = models.MixtralLM(vocab_size=32, dim=32, depth=2, num_heads=2,
                         num_kv_heads=1, n_experts=4, max_len=8,
                         device="tpu")
    m.eval()
    xa = RNG.integers(0, 32, (2, 8)).astype(np.int64)
    p = export_onnx(m, xa, str(tmp_path / "mixtral.onnx"),
                    batch_dynamic=False)
    ops = check_onnx(p)["ops"]
    assert ops.get("TopK", 0) == 2 and ops.get("GreaterOrEqual", 0) == 2
    xb = RNG.integers(0, 32, (2, 8)).astype(np.int64)
    ref = np.asarray(m(df.Tensor(xb, device="tpu")).data.array)
    got = OnnxModel(p)(xb.astype(np.int32))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_seq2seq_roundtrip_fresh_input(tmp_path):
    """Seq2SeqTransformer (concatenated src+tgt int input, split by two
    Slice nodes — one open-ended) exports and the runtime reproduces the
    decoder logits on fresh tokens."""
    df.manual_seed(0)
    m = models.Seq2SeqTransformer(vocab_size=32, src_len=4, tgt_len=4,
                                  dim=32, enc_depth=1, dec_depth=1,
                                  num_heads=2, device="tpu")
    m.eval()
    xa = RNG.integers(0, 32, (2, 8)).astype(np.int64)
    p = export_onnx(m, xa, str(tmp_path / "s2s.onnx"), batch_dynamic=False)
    assert check_onnx(p)["ops"].get("Slice", 0) >= 2
    xb = RNG.integers(0, 32, (2, 8)).astype(np.int64)
    ref = np.asarray(m(df.Tensor(xb, device="tpu")).data.array)
    got = OnnxModel(p)(xb.astype(np.int32))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_fused_export_is_bn_free_and_matches(tmp_path):
    """fuse_conv_bn's re-scoped value (BENCH_NOTES "Conv→BN folding"): the
    exported artifact loses the BN affine chains entirely and still matches
    the unfused model's live logits."""
    from deepflows_tpu.nn.fusion import fuse_conv_bn

    df.manual_seed(0)
    model = models.ResNet18(num_classes=10, small_input=True, device="tpu")
    model.eval()
    x = RNG.standard_normal((2, 3, 32, 32)).astype(np.float32)
    y_live = np.asarray(CompiledEvalStep(model)(x))

    fused = fuse_conv_bn(model, x)
    p_fused = str(tmp_path / "r18_fused.onnx")
    export_onnx(fused, x, p_fused)
    p_plain = str(tmp_path / "r18_plain.onnx")
    export_onnx(model, x, p_plain)

    info_f, info_p = check_onnx(p_fused), check_onnx(p_plain)
    assert info_f["ops"]["Conv"] == info_p["ops"]["Conv"] == 20
    # BN eval math exports as Sub/Div (+ Mul/Add affine) per BN — all gone
    n_affine = lambda i: sum(i["ops"].get(k, 0) for k in ("Sub", "Div", "Mul"))
    assert n_affine(info_p) >= 20, "unfused export lost its BN chains?"
    assert n_affine(info_f) == 0
    # the fused FILE is the smaller artifact
    import os as _os

    assert _os.path.getsize(p_fused) < _os.path.getsize(p_plain)
    got = OnnxModel(p_fused)(x)
    np.testing.assert_allclose(got, y_live, rtol=1e-4, atol=1e-4)
    df.set_grad_enabled(True)
