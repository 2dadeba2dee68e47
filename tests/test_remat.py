"""Activation checkpointing (nn.Remat / remat_call): the rematerialised
block must be numerically identical to the plain block — outputs, input
grads, parameter grads, and BatchNorm running-stat EMAs."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu import models


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def make_block(seed=0):
    df.manual_seed(seed)
    return nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1, bias=False, device="tpu"),
        nn.BatchNorm2d(8, device="tpu"),
        nn.ReLU(),
        nn.Conv2d(8, 8, 3, padding=1, bias=False, device="tpu"),
        nn.BatchNorm2d(8, device="tpu"),
    )


def x_batch(n=4):
    r = np.random.default_rng(1)
    return r.standard_normal((n, 3, 8, 8)).astype(np.float32)


def _grads_and_buffers(block, wrapped, x_np):
    x = df.Tensor(x_np, device="tpu", requires_grad=True)
    out = wrapped(x)
    loss = (out * out).mean()
    loss.backward()
    g_in = x.grad.numpy().copy()
    g_params = [p.grad.numpy().copy() for p in block.parameters()]
    bufs = [b.numpy().copy() for _, b in block.named_buffers()]
    return float(loss.numpy()), g_in, g_params, bufs


def test_remat_matches_plain_eager():
    plain = make_block()
    rem = make_block()  # same seed -> identical init
    wrapped = nn.Remat(rem)
    x = x_batch()

    l1, gi1, gp1, bf1 = _grads_and_buffers(plain, plain, x)
    l2, gi2, gp2, bf2 = _grads_and_buffers(rem, wrapped, x)

    assert abs(l1 - l2) < 1e-6 * max(1, abs(l1))
    np.testing.assert_allclose(gi1, gi2, rtol=1e-5, atol=1e-6)
    for a, b in zip(gp1, gp2):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    for a, b in zip(bf1, bf2):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_remat_eval_mode_passthrough():
    block = make_block()
    wrapped = nn.Remat(block)
    wrapped.eval()
    x = df.Tensor(x_batch(), device="tpu")
    out = wrapped(x)
    block2 = make_block()
    block2.eval()
    ref = block2(x)
    np.testing.assert_allclose(out.numpy(), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_resnet18_remat_training_matches():
    def run(remat):
        df.manual_seed(0)
        model = models.ResNet18(
            num_classes=10, small_input=True, device="tpu", remat=remat
        )
        opt = optim.SGD(model.parameters(), lr=0.05, momentum=0.9)
        step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
        r = np.random.default_rng(2)
        losses = []
        for i in range(3):
            x = r.standard_normal((8, 3, 16, 16)).astype(np.float32)
            y = r.integers(0, 10, 8).astype(np.int32)
            losses.append(float(step(x, y)))
        params = [np.asarray(p.data.array) for p in model.parameters()]
        return losses, params

    l_plain, p_plain = run(False)
    l_rem, p_rem = run(True)
    np.testing.assert_allclose(l_plain, l_rem, rtol=1e-4)
    # the remat backward computes BN grads via jax.vjp of the fused forward
    # while the plain path uses the hand-written batchnorm_grad kernel —
    # same math, different reassociation; momentum amplifies the ~1e-7
    # per-step fp drift over 3 steps, so the bar is "same trajectory", not
    # bitwise: a wrong-math bug would show O(1) divergence here
    for a, b in zip(p_plain, p_rem):
        np.testing.assert_allclose(a, b, rtol=0.05, atol=3e-4)


def test_remat_with_dropout_is_deterministic():
    """The recompute must draw the SAME dropout masks as the forward — if it
    didn't, gradients would be garbage and training would diverge; we check
    two identically-seeded compiled runs produce identical trajectories."""

    def run():
        df.manual_seed(3)
        block = nn.Sequential(
            nn.Linear(16, 32, device="tpu"),
            nn.ReLU(),
            nn.Dropout(0.5),
            nn.Linear(32, 16, device="tpu"),
        )
        model = nn.Sequential(nn.Remat(block), nn.Linear(16, 4, device="tpu"))
        opt = optim.Adam(model.parameters(), lr=1e-2)
        step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
        r = np.random.default_rng(4)
        losses = []
        for _ in range(4):
            x = r.standard_normal((8, 16)).astype(np.float32)
            y = r.integers(0, 4, 8).astype(np.int32)
            losses.append(float(step(x, y)))
        return losses

    a = run()
    b = run()
    assert a == b
    assert all(np.isfinite(a))
    # and it trains
    assert a[-1] < a[0]


def test_remat_onnx_export_identical(tmp_path):
    """remat is a training-time-only transform: the exported inference graph
    must be byte-identical with and without it."""
    from deepflows_tpu.onnx import export_onnx

    df.manual_seed(0)
    plain = models.ResNet18(num_classes=4, small_input=True, device="tpu")
    df.manual_seed(0)
    rem = models.ResNet18(
        num_classes=4, small_input=True, device="tpu", remat=True
    )
    x = np.random.default_rng(0).standard_normal((2, 3, 16, 16)).astype(np.float32)
    p1 = export_onnx(plain, x, str(tmp_path / "plain.onnx"))
    p2 = export_onnx(rem, x, str(tmp_path / "remat.onnx"))
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_remat_inside_gradient_accumulation():
    """Remat nodes must trace correctly inside the accumulation lax.scan
    (a fresh vjp closure per microbatch) and reproduce the plain accum
    trajectory."""

    def run(remat):
        df.manual_seed(0)
        model = models.ResNet18(
            num_classes=4, small_input=True, device="tpu", remat=remat
        )
        opt = optim.SGD(model.parameters(), lr=0.05)
        step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss(), accum_steps=2)
        r = np.random.default_rng(5)
        losses = []
        for _ in range(2):
            x = r.standard_normal((8, 3, 16, 16)).astype(np.float32)
            y = r.integers(0, 4, 8).astype(np.int32)
            losses.append(float(step(x, y)))
        return losses

    plain = run(False)
    rem = run(True)
    np.testing.assert_allclose(plain, rem, rtol=1e-4)
