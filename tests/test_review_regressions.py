"""Regression tests for the round-1 code-review findings (each of these was
a confirmed defect before the fix)."""

import numpy as np
import pytest
import torch

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, models, nn
from deepflows_tpu.utils.pretrained_models import convert_torch_state_dict

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_same_tensor_both_operands_grads():
    """(x - x) and (x / x) must have zero gradient; x @ x, x * x correct."""
    x = Tensor(np.array([[2.0, 3.0]], np.float32), requires_grad=True)
    (x - x).sum().backward()
    np.testing.assert_allclose(x.grad.numpy(), 0.0, atol=1e-7)
    x.zero_grad()
    (x / x).sum().backward()
    np.testing.assert_allclose(x.grad.numpy(), 0.0, atol=1e-6)
    x.zero_grad()
    (x * x).sum().backward()
    np.testing.assert_allclose(x.grad.numpy(), 2 * x.numpy(), rtol=1e-6)
    m = Tensor(RNG.standard_normal((3, 3)).astype(np.float32), requires_grad=True)
    (m @ m).sum().backward()
    mt = torch.tensor(m.numpy(), requires_grad=True)
    (mt @ mt).sum().backward()
    np.testing.assert_allclose(m.grad.numpy(), mt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_concat_duplicate_input_grad():
    x = Tensor(np.ones((2, 2), np.float32), requires_grad=True)
    df.concat([x, x], axis=0).sum().backward()
    np.testing.assert_allclose(x.grad.numpy(), 2.0)


def test_maximum_tie_splits_gradient():
    x = Tensor(np.zeros((4,), np.float32), requires_grad=True)
    y = Tensor(np.zeros((4,), np.float32), requires_grad=True)
    df.maximum(x, y).sum().backward()
    np.testing.assert_allclose(x.grad.numpy(), 0.5)
    np.testing.assert_allclose(y.grad.numpy(), 0.5)
    # total gradient conserved
    np.testing.assert_allclose(x.grad.numpy() + y.grad.numpy(), 1.0)


def test_parameter_requires_grad_survives_no_grad_construction():
    df.set_grad_enabled(False)
    lin = nn.Linear(3, 2, device="cpu")
    df.set_grad_enabled(True)
    assert lin.weight.requires_grad
    out = lin(Tensor(np.ones((1, 3), np.float32), device="cpu"))
    out.sum().backward()
    assert lin.weight.grad is not None


def test_eval_step_restores_grad_flag():
    from deepflows_tpu.jit import CompiledEvalStep

    model = nn.Linear(4, 2, device="tpu")
    ev = CompiledEvalStep(model)
    model.eval()  # grads now off
    assert not df.is_grad_enable()
    ev(np.ones((2, 4), np.float32))
    assert not df.is_grad_enable()  # trace must not force it back on
    model.train()
    assert df.is_grad_enable()
    ev(np.ones((3, 4), np.float32))  # new shape: traces again
    assert df.is_grad_enable()


def test_square_linear_weight_transposed_on_conversion():
    tl = torch.nn.Linear(4, 4)  # square!
    ours = nn.Sequential(nn.Linear(4, 4, device="cpu"))
    sd = {f"0.{k}": v for k, v in tl.state_dict().items()}
    conv = convert_torch_state_dict(ours, sd)
    ours.load_weights(conv)
    x = RNG.standard_normal((3, 4)).astype(np.float32)
    np.testing.assert_allclose(
        ours(Tensor(x, device="cpu")).numpy(),
        tl(torch.tensor(x)).detach().numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


def test_vgg_applies_avgpool_for_other_input_sizes():
    m = models.VGG16(num_classes=3, img_size=64, device="tpu")
    out = m(Tensor(np.zeros((1, 3, 64, 64), np.float32), device="tpu"))
    assert out.shape == (1, 3)
    # larger-than-constructed input also works thanks to adaptive pooling
    out = m(Tensor(np.zeros((1, 3, 96, 96), np.float32), device="tpu"))
    assert out.shape == (1, 3)


def test_adaptive_pool_non_divisible_matches_torch():
    from deepflows_tpu.nn import functional as F

    x = RNG.standard_normal((1, 2, 8, 8)).astype(np.float32)
    got = F.adaptive_avg_pool2d(Tensor(x, device="tpu"), 7).numpy()
    want = torch.nn.functional.adaptive_avg_pool2d(torch.tensor(x), 7).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_left_scalar_keeps_bf16():
    import jax.numpy as jnp

    t = Tensor(np.ones((2, 2), np.float32), dtype=jnp.bfloat16, device="tpu")
    assert (1.0 - t).dtype == jnp.bfloat16
    assert (t - 1.0).dtype == jnp.bfloat16
    assert (2.0 * t).dtype == jnp.bfloat16


def test_device_one_hot_protocol_order():
    from deepflows_tpu.backend import Device

    oh = Device("tpu").one_hot(np.array([0, 2]), 3)
    np.testing.assert_allclose(oh.numpy(), np.eye(3, dtype=np.float32)[[0, 2]])


def test_tensor_to_keeps_requires_grad():
    x = Tensor(np.ones((2, 2), np.float32), device="cpu", requires_grad=True)
    moved = x.to("tpu")
    assert moved.requires_grad
    (moved * 2.0).sum().backward()
    assert moved.grad is not None


def test_adaptive_pool_rectangular():
    from deepflows_tpu.nn import functional as F

    x = Tensor(RNG.standard_normal((1, 2, 16, 32)).astype(np.float32), device="tpu")
    out = F.adaptive_avg_pool2d(x, 8)
    assert out.shape == (1, 2, 8, 8)
    want = torch.nn.functional.adaptive_avg_pool2d(
        torch.tensor(x.numpy()), 8
    ).numpy()
    np.testing.assert_allclose(out.numpy(), want, rtol=1e-4, atol=1e-5)


def test_clip_tolerates_tensor_grads():
    from deepflows_tpu import optim

    p = nn.Parameter(Tensor(np.zeros((2,), np.float32)))
    p.grad = Tensor(np.array([3.0, 4.0], np.float32))  # Tensor, not BackendTensor
    norm = optim.clip_grad_norm_([p], max_norm=1.0)
    np.testing.assert_allclose(norm, 5.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.sqrt((p.grad.numpy() ** 2).sum()), 1.0, rtol=1e-4
    )


def test_adam_fused_after_late_device_move():
    from deepflows_tpu import optim
    from deepflows_tpu.jit import CompiledTrainStep

    df.manual_seed(0)
    model = nn.Linear(4, 2, device="cpu")  # built on cpu...
    opt = optim.Adam(model.parameters(), lr=0.01, fused=True)
    step = CompiledTrainStep(model, opt, nn.MSELoss())  # ...moved to jax here
    x = RNG.standard_normal((4, 4)).astype(np.float32)
    y = RNG.standard_normal((4, 2)).astype(np.float32)
    l1, l2 = float(step(x, y)), float(step(x, y))
    assert np.isfinite(l1) and l2 < l1


# ---------------------------------------------------- round-2 review fixes
def test_sr_adam_no_retrace_after_first_step():
    """Moments must init f32 (not param dtype): a bf16 init flipped the
    opt-state dtype after step 1 and forced a full XLA retrace."""
    import numpy as np

    from deepflows_tpu import nn, optim
    from deepflows_tpu.jit import CompiledTrainStep

    df.manual_seed(0)
    m = nn.Sequential(nn.Linear(8, 8, device="tpu"), nn.ReLU(),
                      nn.Linear(8, 2, device="tpu")).bfloat16()
    opt = optim.Adam(m.parameters(), lr=1e-3, stochastic_round=True)
    step = CompiledTrainStep(m, opt, nn.CrossEntropyLoss())
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    y = rng.integers(0, 2, 4).astype(np.int32)
    import jax.numpy as jnp

    assert opt._state["v"][0].dtype == jnp.float32  # before any step
    for _ in range(3):
        step(x, y)
    assert step._trace_count == 1


def test_batchnorm_eval_preserves_dtype():
    """jax batchnorm_eval must not upcast bf16 inference to f32 (protocol
    parity with the numpy kernel)."""
    import jax.numpy as jnp
    import numpy as np

    from deepflows_tpu.backend import jax_kernels as jk
    from deepflows_tpu.backend import numpy_kernels as nk

    x = jnp.ones((2, 3, 4, 4), jnp.bfloat16)
    rm = jnp.zeros((1, 3, 1, 1), jnp.float32)
    rv = jnp.ones((1, 3, 1, 1), jnp.float32)
    g = jnp.ones((1, 3, 1, 1), jnp.float32)
    b = jnp.zeros((1, 3, 1, 1), jnp.float32)
    out = jk.batchnorm_eval(x, g, b, rm, rv, 1e-5)
    assert out.dtype == jnp.bfloat16
    out_np = nk.batchnorm_eval(
        np.ones((2, 3, 4, 4), np.float32), np.asarray(g), np.asarray(b),
        np.asarray(rm), np.asarray(rv), 1e-5,
    )
    assert out_np.dtype == np.float32


def test_grad_accumulation_sum_reduction():
    """accum_steps with a sum-reduction criterion must SUM (not average) —
    averaging silently rescaled the effective lr."""
    import numpy as np

    from deepflows_tpu import nn, optim
    from deepflows_tpu.jit import CompiledTrainStep

    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 8)).astype(np.float32)
    y = rng.integers(0, 2, 16).astype(np.int32)

    def build():
        df.manual_seed(0)
        m = nn.Sequential(nn.Linear(8, 2, device="tpu"))
        return m, optim.SGD(m.parameters(), lr=0.01)

    m1, o1 = build()
    m2, o2 = build()
    crit = nn.CrossEntropyLoss(reduction="sum")
    big = CompiledTrainStep(m1, o1, crit)
    acc = CompiledTrainStep(m2, o2, crit, accum_steps=4)
    l1, l2 = float(big(x, y)), float(acc(x, y))
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    np.testing.assert_allclose(
        m1[0].weight.numpy(), m2[0].weight.numpy(), rtol=1e-6, atol=1e-8
    )


def test_onnx_multi_input_graph():
    """Multi-input ONNX graphs must execute (were a KeyError inside jit)."""
    import numpy as np

    from deepflows_tpu.onnx import OnnxModel
    from deepflows_tpu.onnx.export import _value_info
    from deepflows_tpu.onnx.proto import onnx_minimal_pb2 as pb

    m = pb.ModelProto()
    m.ir_version = 8
    m.opset_import.add().version = 13
    g = m.graph
    g.input.append(_value_info("a", (2, 3), True))
    g.input.append(_value_info("b", (2, 3), True))
    n = g.node.add()
    n.op_type = "Add"
    n.input.extend(["a", "b"])
    n.output.append("out")
    g.output.append(_value_info("out", (2, 3), True))
    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "two.onnx")
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    om = OnnxModel(path)
    a = np.ones((2, 3), np.float32)
    b = np.full((2, 3), 2.0, np.float32)
    np.testing.assert_allclose(om(a, b), a + b)
    with pytest.raises(ValueError, match="inputs"):
        om(a)


def test_dataloader_sampler_replacement_takes_effect():
    """loader.sampler is the single source of truth (the reference surface);
    replacing it post-construction must change iteration order."""
    import numpy as np

    from deepflows_tpu.utils.data import DataLoader, SequentialSampler, TensorDataset

    X = np.arange(8, dtype=np.float32).reshape(8, 1)
    y = np.arange(8, dtype=np.int32)
    loader = DataLoader(TensorDataset(X, y), batch_size=4)

    class Reversed(SequentialSampler):
        def __iter__(self):
            return iter(range(len(self.source) - 1, -1, -1))

    loader.sampler = Reversed(loader.dataset)
    got = np.concatenate([b[1] for b in loader])
    np.testing.assert_array_equal(got, np.arange(7, -1, -1))


def test_onnx_pool_default_stride_is_one():
    """ONNX spec: pool strides default to 1 (was kernel_shape — overlapping
    pools in foreign graphs silently over-downsampled)."""
    import numpy as np

    from deepflows_tpu.onnx import OnnxModel
    from deepflows_tpu.onnx.export import _value_info
    from deepflows_tpu.onnx.proto import onnx_minimal_pb2 as pb

    m = pb.ModelProto()
    m.ir_version = 8
    m.opset_import.add().version = 13
    g = m.graph
    g.input.append(_value_info("input", (1, 1, 4, 4), True))
    n = g.node.add()
    n.op_type = "MaxPool"
    n.input.append("input")
    n.output.append("out")
    a = n.attribute.add()
    a.name = "kernel_shape"
    a.type = pb.AttributeProto.INTS
    a.ints.extend([3, 3])  # no strides attribute -> stride 1
    g.output.append(_value_info("out", (1, 1, 2, 2), True))
    import os, tempfile

    path = os.path.join(tempfile.mkdtemp(), "p.onnx")
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    out = OnnxModel(path)(x)
    assert out.shape == (1, 1, 2, 2)  # stride-1 overlapping windows
    np.testing.assert_allclose(out.ravel(), [10, 11, 14, 15])


def test_onnx_rejects_silently_wrong_attributes():
    """auto_pad/dilations/ceil_mode with non-default values must be rejected
    at load (they were silently ignored)."""
    import pytest as _pytest

    from deepflows_tpu.onnx import OnnxModel
    from deepflows_tpu.onnx.export import _value_info
    from deepflows_tpu.onnx.proto import onnx_minimal_pb2 as pb

    m = pb.ModelProto()
    m.ir_version = 8
    m.opset_import.add().version = 13
    g = m.graph
    g.input.append(_value_info("input", (1, 1, 4, 4), True))
    n = g.node.add()
    n.op_type = "Conv"
    n.input.extend(["input", "input"])
    n.output.append("out")
    a = n.attribute.add()
    a.name = "auto_pad"
    a.type = pb.AttributeProto.STRING
    a.s = b"SAME_UPPER"
    g.output.append(_value_info("out", (1, 1, 4, 4), True))
    import os, tempfile

    path = os.path.join(tempfile.mkdtemp(), "c.onnx")
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    with _pytest.raises(ValueError, match="auto_pad"):
        OnnxModel(path)


def test_bn_output_is_tensor_with_callable_mean():
    """_BatchNormOp's stat stash must not shadow Tensor.mean (y.mean() on a
    train-mode BN output raised TypeError)."""
    import numpy as np

    from deepflows_tpu import nn
    from deepflows_tpu.tensor import Tensor

    bn = nn.BatchNorm2d(2, device="tpu")
    x = np.random.default_rng(0).standard_normal((4, 2, 3, 3)).astype(np.float32)
    y = bn(Tensor(x, device="tpu"))
    assert callable(y.mean)
    gap = y.mean((2, 3), True)  # GAP directly on a BN output
    assert gap.shape == (4, 2, 1, 1)
    assert y.batch_mean.shape == (1, 2, 1, 1)


def test_bn_train_preserves_dtype():
    import jax.numpy as jnp

    from deepflows_tpu.backend import jax_kernels as jk

    x = jnp.ones((2, 3, 4, 4), jnp.bfloat16)
    g = jnp.ones((1, 3, 1, 1), jnp.float32)
    b = jnp.zeros((1, 3, 1, 1), jnp.float32)
    out, mean, var = jk.batchnorm_train(x, g, b, (0, 2, 3), 1e-5)
    assert out.dtype == jnp.bfloat16


def test_prefetcher_never_started_iterator_does_not_leak_thread():
    import gc
    import threading
    import time

    import numpy as np

    from deepflows_tpu.utils.data import data_loader

    X = np.zeros((64, 1), np.float32)
    y = np.zeros(64, np.int32)
    it = iter(data_loader(X, y, batch_size=4, prefetch_size=2))
    del it  # never started
    gc.collect()
    deadline = time.time() + 3
    while time.time() < deadline:
        if not any(
            t.name == "deepflows-prefetch" and t.is_alive()
            for t in threading.enumerate()
        ):
            break
        time.sleep(0.05)
    assert not any(
        t.name == "deepflows-prefetch" and t.is_alive()
        for t in threading.enumerate()
    )


# ---------------------------------------------------------------- round-3
# regression tests for the round-2 ADVICE findings


def test_eval_dispatch_survives_concurrent_donating_train_step():
    """ADVICE r2 (medium): CompiledEvalStep gathered param arrays under the
    trace lock but DISPATCHED outside it — a concurrent donate=True train
    step could donate (delete) those exact arrays between gather and
    dispatch, raising 'Array has been deleted'.  Hammer eval and train on
    the same model from two threads; any eval raising is a fail."""
    import threading

    from deepflows_tpu import optim
    from deepflows_tpu.jit import CompiledEvalStep, CompiledTrainStep

    df.manual_seed(0)
    model = nn.Sequential(
        nn.Linear(8, 32, device="tpu"), nn.ReLU(), nn.Linear(32, 4, device="tpu")
    )
    opt = optim.Adam(model.parameters(), lr=1e-3)
    train = CompiledTrainStep(model, opt, nn.CrossEntropyLoss(), donate=True)
    ev = CompiledEvalStep(model)
    x = RNG.standard_normal((16, 8)).astype(np.float32)
    y = RNG.integers(0, 4, 16).astype(np.int32)
    # warm both compiles before the race
    float(train(x, y))
    np.asarray(ev(x))
    errors = []

    def hammer_train():
        try:
            for _ in range(40):
                train(x, y)
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    def hammer_eval():
        try:
            for _ in range(40):
                np.asarray(ev(x))  # force materialization of the result
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    ts = [threading.Thread(target=hammer_train), threading.Thread(target=hammer_eval)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors


def test_moe_expert_init_matches_per_expert_linear_fan():
    """ADVICE r2 (low): kaiming_uniform_ on the stacked (E, D, H) expert
    weights used fan_in = D*H (conv receptive-field rule), shrinking the
    init bound by sqrt(H).  The per-expert bound must match a Linear(D, H):
    1/sqrt(D)."""
    df.manual_seed(0)
    D, H, E = 64, 256, 4
    moe = nn.MoE(D, H, E, device="cpu")
    w1 = moe.experts_w1.numpy()
    w2 = moe.experts_w2.numpy()
    # uniform(-b, b) has std b/sqrt(3); sample std over E*D*H = 65k draws
    # estimates b tightly.  Correct b1 = 1/sqrt(D), buggy was 1/sqrt(D*H).
    b1 = w1.std() * np.sqrt(3)
    b2 = w2.std() * np.sqrt(3)
    np.testing.assert_allclose(b1, 1.0 / np.sqrt(D), rtol=0.05)
    np.testing.assert_allclose(b2, 1.0 / np.sqrt(H), rtol=0.05)
    assert abs(w1).max() <= 1.0 / np.sqrt(D) + 1e-6


def test_cross_entropy_4d_torch_layout_not_auto_flattened():
    """ADVICE r2 (low): dim=None on a (B, C, H, W) input whose target shape
    coincides with input.shape[:-1] must NOT silently softmax over the last
    axis — rank >3 keeps torch-layout dim=1 semantics unless the caller
    passes dim=-1 explicitly."""
    B, C = 2, 5
    logits = RNG.standard_normal((B, C, C, C)).astype(np.float32)
    target = RNG.integers(0, C, (B, C, C)).astype(np.int64)
    got = nn.functional.cross_entropy(
        Tensor(logits), Tensor(target.astype(np.float32))
    )
    want = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(target)
    )
    np.testing.assert_allclose(float(got.numpy()), float(want), rtol=1e-5)
    # the class-LAST semantics stay reachable via explicit dim=-1
    got_last = nn.functional.cross_entropy(
        Tensor(logits), Tensor(target.astype(np.float32)), dim=-1
    )
    want_last = torch.nn.functional.cross_entropy(
        torch.tensor(logits).reshape(-1, C), torch.tensor(target).reshape(-1)
    )
    np.testing.assert_allclose(float(got_last.numpy()), float(want_last), rtol=1e-5)


def test_engine_prefix_suffix_bucket_capped_at_max_len():
    """ADVICE r3 (high): a prefix hit whose padded suffix bucket would
    extend past max_len used to let XLA clamp the B=1 cache scatter start
    to L-bucket, shifting every suffix K/V row and corrupting cached
    prefix rows (measured: rows plen-1..L-1 wrong, logits off by 2e-2 —
    enough to corrupt generations but not always flip a tiny model's
    greedy argmax, so this asserts on the CACHE and logits directly).
    L=32, prefix 25, suffix 5 -> bucket 8, 25+8 > 32."""
    import jax.numpy as jnp
    from deepflows_tpu.models.engine import InflightEngine

    df.manual_seed(11)
    lm = models.TransformerLM(
        vocab_size=48, max_len=32, dim=32, depth=2, num_heads=2,
        device="tpu", flash=False,
    )
    RNG2 = np.random.default_rng(99)
    prefix = RNG2.integers(0, 48, (25,)).astype(np.int64)
    prompt = np.concatenate(
        [prefix, RNG2.integers(0, 48, (5,))]
    ).astype(np.int64)
    eng = InflightEngine(lm, slots=2, chunk=2, start=False)
    full = np.zeros((1, eng.L), np.int32)
    full[0, :30] = prompt
    kf, vf, lf = eng._prefill_j(eng.params, jnp.asarray(full), jnp.int32(30))
    entry = eng._prefix_entry(tuple(int(t) for t in prefix))
    sfx = np.asarray(prompt[25:], np.int32)
    bucket = 1 << (int(sfx.size) - 1).bit_length()
    assert entry["plen"] + bucket > eng.L  # the overflow regime
    bucket = eng._suffix_bucket(int(sfx.size), entry["plen"])  # _admit's path
    assert entry["plen"] + bucket <= eng.L and bucket >= sfx.size
    toks = np.zeros((1, bucket), np.int32)
    toks[0, : sfx.size] = sfx
    kcn, vcn, l0 = eng._suffix_j(
        eng.params, entry["kc"], entry["vc"], jnp.asarray(toks),
        jnp.int32(sfx.size), jnp.int32(entry["plen"]),
    )
    np.testing.assert_allclose(
        np.asarray(l0), np.asarray(lf), atol=1e-5,
        err_msg="suffix-path logits diverge from full prefill",
    )
    np.testing.assert_allclose(
        np.asarray(kcn)[:, :, :, :30], np.asarray(kf)[:, :, :, :30],
        atol=1e-5, err_msg="suffix-path K cache rows shifted/corrupted",
    )
    # end-to-end through the live engine too
    dec = models.decoding.KVCacheDecoder(lm)
    want = dec.generate(prompt[None], 2)[0]
    with InflightEngine(lm, slots=2, chunk=2) as eng2:
        eng2.register_prefix(prefix)
        got = eng2.generate(prompt, 2)
        assert eng2.prefix_hits == 1
    np.testing.assert_array_equal(got, want)


def test_engine_register_prefix_concurrent_with_loop():
    """ADVICE r3 (medium): register_prefix from a user thread while the
    engine loop iterates/mutates the prefix dict (with LRU eviction
    churning it) must not blow up the loop with 'dict changed size during
    iteration'; results stay exactly the one-shot decoder's."""
    import queue as _q
    import threading
    from deepflows_tpu.models.engine import InflightEngine

    df.manual_seed(12)
    lm = models.TransformerLM(
        vocab_size=48, max_len=24, dim=32, depth=2, num_heads=2,
        device="tpu", flash=False,
    )
    dec = models.decoding.KVCacheDecoder(lm)
    prompts = [RNG.integers(0, 48, (6,)).astype(np.int64) for _ in range(6)]
    wants = [dec.generate(p[None], 4)[0] for p in prompts]
    errs: "_q.Queue" = _q.Queue()
    with InflightEngine(lm, slots=2, chunk=2, max_prefixes=2) as eng:
        stop = threading.Event()

        def hammer():
            i = 0
            try:
                while not stop.is_set():
                    eng.register_prefix(
                        np.array([i % 48, (i + 1) % 48], np.int64)
                    )
                    i += 1
            except Exception as e:  # surfaced to the main thread
                errs.put(e)

        t = threading.Thread(target=hammer, daemon=True)
        t.start()
        try:
            got = [eng.generate(p, 4) for p in prompts]
        finally:
            stop.set()
            t.join(timeout=30)
    assert errs.empty(), f"register_prefix raised: {errs.get()}"
    for g, w in zip(got, wants):
        np.testing.assert_array_equal(g, w)


def test_lora_load_preserves_bf16_dtype():
    """ADVICE r3 (low): restoring adapters into a bf16 model must keep the
    adapter parameters bf16 (an unconditional f32 cast silently promoted
    the adapter matmuls)."""
    import ml_dtypes
    from deepflows_tpu.nn.lora import (
        LoRALinear, load_lora_state_dict, lora_state_dict,
    )

    df.manual_seed(13)
    m = LoRALinear(nn.Linear(8, 8, device="tpu"), r=2).bfloat16()
    assert np.asarray(m.lora_A.data.array).dtype == ml_dtypes.bfloat16
    sd = lora_state_dict(m)
    df.manual_seed(14)
    m2 = LoRALinear(nn.Linear(8, 8, device="tpu"), r=2).bfloat16()
    load_lora_state_dict(m2, sd)
    for slot in ("lora_A", "lora_B"):
        p = getattr(m2, slot)
        assert np.asarray(p.data.array).dtype == ml_dtypes.bfloat16, slot
    np.testing.assert_array_equal(
        np.asarray(m2.lora_A.data.array, np.float32),
        np.asarray(m.lora_A.data.array, np.float32),
    )
