"""Whole-step compilation tests: compiled train step ≡ eager step, single
trace across lr changes and steps, BN buffer plumbing, eval step, freezing."""

import copy

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn, optim
from deepflows_tpu.jit import CompiledEvalStep, CompiledTrainStep

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def make_model(seed=0):
    df.manual_seed(seed)
    return nn.Sequential(
        # bias=False before BN: a biased conv feeding BN has ~zero bias
        # gradient, and Adam amplifies float32 noise on it — not a bug,
        # but it makes exact eager/compiled comparison flaky
        nn.Conv2d(1, 4, 3, padding=1, bias=False, device="tpu"),
        nn.BatchNorm2d(4, device="tpu"),
        nn.ReLU(),
        nn.MaxPool2d(2),
        nn.Flatten(),
        nn.Linear(4 * 4 * 4, 3, device="tpu"),
    )


def batch(i=0):
    r = np.random.default_rng(i)
    return (
        r.standard_normal((8, 1, 8, 8)).astype(np.float32),
        r.integers(0, 3, 8).astype(np.int32),
    )


def eager_steps(model, n):
    opt = optim.Adam(model.parameters(), lr=0.01)
    crit = nn.CrossEntropyLoss()
    losses = []
    for i in range(n):
        x, y = batch(i)
        out = model(Tensor(x, device="tpu"))
        loss = crit(out, Tensor(y, device="tpu"))
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.numpy()))
    return losses


def compiled_steps(model, n, donate=True):
    opt = optim.Adam(model.parameters(), lr=0.01)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss(), donate=donate)
    losses = []
    for i in range(n):
        x, y = batch(i)
        losses.append(float(step(x, y)))
    return losses, step


def test_compiled_matches_eager():
    m1, m2 = make_model(0), make_model(0)
    # identical init
    m2.load_state_dict(m1.state_dict())
    eager = eager_steps(m1, 4)
    comp, _ = compiled_steps(m2, 4)
    np.testing.assert_allclose(eager, comp, rtol=1e-3, atol=1e-5)
    # parameters ended up identical too
    for (n1, p1), (n2, p2) in zip(m1.named_parameters(), m2.named_parameters()):
        np.testing.assert_allclose(
            p1.numpy(), p2.numpy(), rtol=1e-3, atol=1e-5, err_msg=n1
        )
    # BN running stats tracked through the compiled step
    bn1 = dict(m1.named_buffers())
    bn2 = dict(m2.named_buffers())
    for k in bn1:
        np.testing.assert_allclose(
            bn1[k].numpy(), bn2[k].numpy(), rtol=1e-3, atol=1e-5, err_msg=k
        )


def test_single_trace_across_steps_and_lr_changes():
    model = make_model(1)
    opt = optim.SGD(model.parameters(), lr=0.1, momentum=0.9)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    sch = optim.StepLR(opt, step_size=1, gamma=0.5)
    for i in range(5):
        x, y = batch(i)
        step(x, y)
        sch.step()
    assert step._trace_count == 1, f"retraced {step._trace_count}x"


def test_model_restored_after_trace():
    model = make_model(2)
    w_before = model[0].weight
    opt = optim.SGD(model.parameters(), lr=0.0)  # lr=0: params unchanged
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    x, y = batch(0)
    step(x, y)
    # same Parameter objects, concrete (non-tracer) arrays, value unchanged
    assert model[0].weight is w_before
    np.testing.assert_allclose(model[0].weight.numpy(), w_before.numpy())
    assert len(Graph.node_list) <= len(list(model.parameters()))


def test_frozen_params_not_updated():
    model = make_model(3)
    model[0].requires_grad_(False)
    conv_w = model[0].weight.numpy().copy()
    opt = optim.Adam(
        [p for p in model.parameters() if p.requires_grad], lr=0.05
    )
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    for i in range(3):
        x, y = batch(i)
        step(x, y)
    np.testing.assert_allclose(model[0].weight.numpy(), conv_w)
    # trainable params did move
    assert not np.allclose(model[-1].weight.numpy(), 0)


def test_compiled_eval_step():
    model = make_model(4)
    x, _ = batch(0)
    ev = CompiledEvalStep(model)
    got = np.asarray(ev(x))
    model.eval()
    want = model(Tensor(x, device="tpu")).numpy()
    model.train()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # eval step must not mutate BN running stats
    rm = model[1].running_mean.numpy().copy()
    ev(x)
    np.testing.assert_allclose(model[1].running_mean.numpy(), rm)


def test_dropout_inside_compiled_step_varies_per_call():
    df.manual_seed(0)
    model = nn.Sequential(
        nn.Linear(16, 64, device="tpu"), nn.Dropout(0.5), nn.Linear(64, 2, device="tpu")
    )
    opt = optim.SGD(model.parameters(), lr=0.0)
    step = CompiledTrainStep(model, opt, nn.MSELoss())
    x = RNG.standard_normal((4, 16)).astype(np.float32)
    y = RNG.standard_normal((4, 2)).astype(np.float32)
    l1, l2 = float(step(x, y)), float(step(x, y))
    assert l1 != l2  # fresh dropout mask each call
    assert step._trace_count == 1


def test_metrics_fn():
    model = make_model(5)
    opt = optim.Adam(model.parameters(), lr=0.01)

    def metrics(out, yt):
        pred = out.argmax(1)
        return {"acc": (pred.data.array == yt.data.array).mean()}

    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss(), metrics_fn=metrics)
    x, y = batch(0)
    step(x, y)
    assert 0.0 <= float(step._last_metrics["acc"]) <= 1.0


def test_function_jit():
    from deepflows_tpu.jit import jit as df_jit
    from deepflows_tpu.nn import functional as F

    calls = {"n": 0}

    @df_jit
    def fused(logits, labels):
        calls["n"] += 1
        p = F.softmax(logits, 1)
        return (p.argmax(1).eq(Tensor(labels.data))).mean()

    logits = RNG.standard_normal((8, 4)).astype(np.float32)
    labels = RNG.integers(0, 4, 8).astype(np.float32)
    a1 = float(fused(logits, labels))
    a2 = float(fused(logits, labels))
    want = (logits.argmax(1) == labels).mean()
    assert abs(a1 - want) < 1e-6 and a1 == a2
    assert calls["n"] == 1  # traced once
    assert df.is_grad_enable()


def test_mixed_precision_bf16_step():
    import jax.numpy as jnp

    df.manual_seed(0)
    model = make_model(7)
    opt = optim.Adam(model.parameters(), lr=0.01)
    step = CompiledTrainStep(
        model, opt, nn.CrossEntropyLoss(), compute_dtype=jnp.bfloat16
    )
    x, y = batch(0)
    losses = [float(step(x, y)) for _ in range(5)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # converges on the repeated batch
    # master weights and optimizer state stay float32
    assert model[0].weight.dtype == jnp.float32
    assert opt._state["v"][0].dtype == jnp.float32
    # BN buffers keep f32
    assert model[1].running_mean.dtype == jnp.float32
    assert step._trace_count == 1


def test_gradient_accumulation_matches_big_batch():
    """accum_steps=N must reproduce the one-big-batch update exactly for
    BN-free models (BN microbatch statistics differ by design)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 12)).astype(np.float32)
    y = rng.integers(0, 4, 32).astype(np.int32)

    def build():
        df.manual_seed(0)
        m = nn.Sequential(
            nn.Linear(12, 16, device="tpu"), nn.ReLU(),
            nn.Linear(16, 4, device="tpu"),
        )
        return m, optim.SGD(m.parameters(), lr=0.05, momentum=0.9)

    m1, o1 = build()
    m2, o2 = build()
    big = CompiledTrainStep(m1, o1, nn.CrossEntropyLoss())
    acc = CompiledTrainStep(m2, o2, nn.CrossEntropyLoss(), accum_steps=4)
    for _ in range(3):
        l1, l2 = float(big(x, y)), float(acc(x, y))
        np.testing.assert_allclose(l1, l2, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        m1[0].weight.numpy(), m2[0].weight.numpy(), rtol=1e-5, atol=1e-7
    )


def test_gradient_accumulation_with_frozen_params():
    """None grads (frozen params) must survive the scan carry."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 8)).astype(np.float32)
    y = rng.integers(0, 2, 16).astype(np.int32)
    df.manual_seed(0)
    m = nn.Sequential(nn.Linear(8, 8, device="tpu"), nn.ReLU(),
                      nn.Linear(8, 2, device="tpu"))
    m[0].weight.requires_grad = False
    m[0].bias.requires_grad = False
    frozen_before = m[0].weight.numpy().copy()
    opt = optim.Adam([p for p in m.parameters() if p.requires_grad], lr=1e-2)
    step = CompiledTrainStep(m, opt, nn.CrossEntropyLoss(), accum_steps=2)
    losses = [float(step(x, y)) for _ in range(4)]
    assert losses[-1] < losses[0]
    np.testing.assert_array_equal(m[0].weight.numpy(), frozen_before)


def test_gradient_accumulation_rejects_ragged_batch():
    df.manual_seed(0)
    m = nn.Sequential(nn.Linear(4, 2, device="tpu"))
    opt = optim.SGD(m.parameters(), lr=0.1)
    step = CompiledTrainStep(m, opt, nn.CrossEntropyLoss(), accum_steps=3)
    x = np.zeros((8, 4), np.float32)
    y = np.zeros(8, np.int32)
    with pytest.raises(ValueError, match="divisible"):
        step(x, y)


def test_metrics_fn_composes_with_accum_steps():
    """VERDICT r3 #8: metrics_fn + accum_steps>1 used to raise; now the
    metric accumulates across microbatches (mean of equal-size
    microbatches) and equals the big-batch step's fused metric."""
    def metrics(out, yt):
        pred = out.argmax(1)
        return {"acc": (pred.data.array == yt.data.array).mean()}

    rng = np.random.default_rng(9)
    x = rng.standard_normal((32, 12)).astype(np.float32)
    y = rng.integers(0, 4, 32).astype(np.int32)

    def build():  # BN-free: microbatch BN statistics differ by design
        df.manual_seed(9)
        m = nn.Sequential(
            nn.Linear(12, 16, device="tpu"), nn.ReLU(),
            nn.Linear(16, 4, device="tpu"),
        )
        return m, optim.SGD(m.parameters(), lr=0.05, momentum=0.9)

    m1, o1 = build()
    m2, o2 = build()
    big = CompiledTrainStep(m1, o1, nn.CrossEntropyLoss(), metrics_fn=metrics)
    acc = CompiledTrainStep(
        m2, o2, nn.CrossEntropyLoss(), metrics_fn=metrics, accum_steps=4
    )
    for _ in range(3):
        lb = float(big(x, y))
        la = float(acc(x, y))
        np.testing.assert_allclose(la, lb, rtol=2e-5)
        np.testing.assert_allclose(
            float(acc._last_metrics["acc"]),
            float(big._last_metrics["acc"]),
            atol=1e-6,
        )
    # params stayed in lockstep (the accumulated update == big-batch update)
    for p1, p2 in zip(m1.parameters(), m2.parameters()):
        np.testing.assert_allclose(
            np.asarray(p1.data.array), np.asarray(p2.data.array), rtol=2e-5,
            atol=1e-6,
        )
