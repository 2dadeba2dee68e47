"""Interleaved 1F1B (virtual pipeline stages,
PipelinedTrainStep(schedule="interleaved_1f1b")): the stack's S stages run
as C = S chunks round-robin over P pipe devices (v = S/P chunks per
device), one chunk per device per slice — the bubble term divides by v:
(P-1)/(vM + P-1) vs non-interleaved (P-1)/(M + P-1).

Equivalence contract: identical gradients (summation order aside) to GPipe
and 1F1B over the SAME stages — tested at M < P, M < C, M == C, M > C and
a non-multiple-of-P M — plus buffered (BatchNorm) stages, heterogeneous
pre/post, bf16, and the round-robin physical permutation's eval path.

No reference analog (the reference has no distributed machinery, SURVEY
§2.3) — this is the TPU-native scale-out superset's schedule upgrade on
top of 1F1B (r4 VERDICT item 5)."""

import jax
import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu.parallel import make_mesh
from deepflows_tpu.parallel.pipeline import PipelinedTrainStep, PipelineStack

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

S, WIDTH = 8, 16


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def make_stages(n=S, width=WIDTH, seed=0):
    df.manual_seed(seed)
    return [
        nn.Sequential(nn.Linear(width, width, device="tpu"), nn.ReLU())
        for _ in range(n)
    ]


def batch(n=16, width=WIDTH, seed=1):
    r = np.random.default_rng(seed)
    return (
        r.standard_normal((n, width)).astype(np.float32),
        r.standard_normal((n, width)).astype(np.float32),
    )


def logical_params(step, stack):
    """Stacked parameter arrays in LOGICAL stage order (the interleaved
    schedule stores them round-robin-permuted)."""
    arrs = [np.asarray(p.data.array) for p in stack.parameters()]
    if getattr(step, "_stage_inv", None) is not None:
        arrs = [a[step._stage_inv] for a in arrs]
    return arrs


@pytest.mark.parametrize("n_micro", [2, 4, 6, 8, 16])
def test_interleaved_matches_gpipe(n_micro):
    """M < P (2), M < C (4), non-multiple-of-P (6), M == C (8), M > C (16):
    exercises every warmup/steady/drain boundary and the 2-generation
    stash ring."""
    steps = {}
    for sched, mesh_shape in (
        ("gpipe", {"data": 1, "pipe": 8}),
        ("interleaved_1f1b", {"data": 2, "pipe": 4}),
    ):
        mesh = make_mesh(mesh_shape)
        stack = PipelineStack(make_stages())
        opt = optim.SGD(stack.parameters(), lr=0.1, momentum=0.9)
        steps[sched] = (
            PipelinedTrainStep(
                stack, opt, nn.MSELoss(), mesh, n_micro=n_micro,
                schedule=sched,
            ),
            stack,
        )
    B = 48 if n_micro == 6 else 16
    for i in range(3):
        x, y = batch(B, seed=20 + i)
        lg = float(steps["gpipe"][0](x, y))
        li = float(steps["interleaved_1f1b"][0](x, y))
        assert abs(lg - li) < 1e-5 * max(1.0, abs(lg)), (i, lg, li)
    pg = logical_params(*steps["gpipe"])
    pi = logical_params(*steps["interleaved_1f1b"])
    for a, b in zip(pg, pi):
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)


def test_interleaved_matches_single_device():
    stages = make_stages()
    ref_model = nn.Sequential(*stages)
    ref_opt = optim.SGD(ref_model.parameters(), lr=0.1, momentum=0.9)
    ref_step = CompiledTrainStep(ref_model, ref_opt, nn.MSELoss())

    stack = PipelineStack(make_stages())
    opt = optim.SGD(stack.parameters(), lr=0.1, momentum=0.9)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), mesh, n_micro=8,
        schedule="interleaved_1f1b",
    )
    for i in range(3):
        x, y = batch(16, seed=10 + i)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-5 * max(1.0, abs(ref_loss))

    ref_params = [p.data.array for p in ref_model.parameters()]
    n_per_stage = len(ref_params) // S
    stacked = logical_params(step, stack)
    for j in range(n_per_stage):
        for s in range(S):
            np.testing.assert_allclose(
                stacked[j][s],
                np.asarray(ref_params[s * n_per_stage + j]),
                rtol=1e-5, atol=1e-6,
            )


def test_interleaved_buffered_bn_stages_match_gpipe():
    """BatchNorm running stats thread through the chunk slices and EMA
    exactly once per (chunk, microbatch) — same semantics as GPipe's
    valid-tick masking, despite the dynamic chunk indexing."""
    from deepflows_tpu.models.resnet import BasicBlock

    ch = 8

    def bn_stages(seed):
        df.manual_seed(seed)
        return [BasicBlock(ch, ch, device="tpu") for _ in range(S)]

    steps = {}
    for sched, mesh_shape in (
        ("gpipe", {"data": 1, "pipe": 8}),
        ("interleaved_1f1b", {"data": 2, "pipe": 4}),
    ):
        mesh = make_mesh(mesh_shape)
        stack = PipelineStack(bn_stages(0))
        opt = optim.Adam(stack.parameters(), lr=1e-3)
        steps[sched] = (
            PipelinedTrainStep(
                stack, opt, nn.MSELoss(), mesh, n_micro=4, schedule=sched
            ),
            stack,
        )
    r = np.random.default_rng(3)
    for i in range(2):
        x = r.standard_normal((8, ch, 8, 8)).astype(np.float32)
        y = r.standard_normal((8, ch, 8, 8)).astype(np.float32)
        lg = float(steps["gpipe"][0](x, y))
        li = float(steps["interleaved_1f1b"][0](x, y))
        assert abs(lg - li) < 1e-4 * max(1.0, abs(lg)), (i, lg, li)
    for sched_a, sched_b in (("gpipe", "interleaved_1f1b"),):
        pa = logical_params(*steps[sched_a])
        pb = logical_params(*steps[sched_b])
        for a, b in zip(pa, pb):
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
        step_a, stack_a = steps[sched_a]
        step_b, stack_b = steps[sched_b]
        ba = [np.asarray(b.data.array) for _, b in stack_a.named_buffers()]
        bb = [np.asarray(b.data.array) for _, b in stack_b.named_buffers()]
        if step_b._stage_inv is not None:
            bb = [b[step_b._stage_inv] for b in bb]
        for a, b in zip(ba, bb):
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


def test_interleaved_hetero_pre_post_matches_single_device():
    """Embedding pre + homogeneous chunks + head post, like a real LM."""
    vocab, width = 32, WIDTH

    def build():
        df.manual_seed(0)
        pre = nn.Embedding(vocab, width, device="tpu")
        stages = make_stages(seed=1)
        post = nn.Linear(width, vocab, device="tpu")
        return pre, stages, post

    pre, stages, post = build()
    ref_model = nn.Sequential(pre, *stages, post)
    ref_opt = optim.SGD(ref_model.parameters(), lr=0.05)
    ref_step = CompiledTrainStep(ref_model, ref_opt, nn.CrossEntropyLoss())

    pre2, stages2, post2 = build()
    stack = PipelineStack(stages2)
    params = (
        [p for _, p in pre2.named_parameters()]
        + [p for _, p in stack.named_parameters()]
        + [p for _, p in post2.named_parameters()]
    )
    opt = optim.SGD(params, lr=0.05)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(
        stack, opt, nn.CrossEntropyLoss(), mesh, n_micro=8,
        pre=pre2, post=post2, schedule="interleaved_1f1b",
    )
    r = np.random.default_rng(5)
    for i in range(3):
        x = r.integers(0, vocab, 16).astype(np.int64)
        y = r.integers(0, vocab, 16).astype(np.int32)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-5 * max(1.0, abs(ref_loss)), (
            i, ref_loss, pp_loss,
        )
    np.testing.assert_allclose(
        np.asarray(pre2.weight.data.array),
        np.asarray(pre.weight.data.array),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(post2.weight.data.array),
        np.asarray(post.weight.data.array),
        rtol=1e-5, atol=1e-6,
    )


def test_interleaved_bf16_matches_gpipe_bf16():
    import jax.numpy as jnp

    steps = {}
    for sched, mesh_shape in (
        ("gpipe", {"data": 1, "pipe": 8}),
        ("interleaved_1f1b", {"data": 2, "pipe": 4}),
    ):
        mesh = make_mesh(mesh_shape)
        stack = PipelineStack(make_stages())
        opt = optim.SGD(stack.parameters(), lr=0.1)
        steps[sched] = (
            PipelinedTrainStep(
                stack, opt, nn.MSELoss(), mesh, n_micro=4, schedule=sched,
                compute_dtype=jnp.bfloat16,
            ),
            stack,
        )
    x, y = batch(16, seed=7)
    lg = float(steps["gpipe"][0](x, y))
    li = float(steps["interleaved_1f1b"][0](x, y))
    # bf16 forward: same math, bf16-rounding-order tolerance
    assert abs(lg - li) < 2e-2 * max(1.0, abs(lg))
    pg = logical_params(*steps["gpipe"])
    pi = logical_params(*steps["interleaved_1f1b"])
    for a, b in zip(pg, pi):
        assert a.dtype == np.float32 and b.dtype == np.float32
        np.testing.assert_allclose(b, a, rtol=2e-2, atol=2e-3)


def test_interleaved_bubble_fraction():
    """The schedule's honest bubble: (P-1)/(vM + P-1) at M a multiple of P
    — strictly below non-interleaved (P-1)/(M + P-1) for v >= 2."""
    mesh = make_mesh({"data": 2, "pipe": 4})
    stack = PipelineStack(make_stages())
    opt = optim.SGD(stack.parameters(), lr=0.1)
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), mesh, n_micro=12,
        schedule="interleaved_1f1b",
    )
    P_, v, M = 4, 2, 12
    assert step.virtual_stages == v
    expected = (P_ - 1) / (v * M + P_ - 1)
    assert abs(step.bubble_fraction - expected) < 1e-9
    non_interleaved = (P_ - 1) / (M + P_ - 1)
    assert step.bubble_fraction < non_interleaved

    stack1 = PipelineStack(make_stages(4))
    opt1 = optim.SGD(stack1.parameters(), lr=0.1)
    step1 = PipelinedTrainStep(
        stack1, opt1, nn.MSELoss(), mesh, n_micro=12, schedule="1f1b"
    )
    assert abs(step1.bubble_fraction - non_interleaved) < 1e-9


def test_interleaved_eval_logits_unpermutes():
    """eval_logits must walk stages in LOGICAL order despite the physical
    round-robin storage."""
    stages = make_stages()
    ref_model = nn.Sequential(*stages)

    stack = PipelineStack(make_stages())
    opt = optim.SGD(stack.parameters(), lr=0.1)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), mesh, n_micro=8,
        schedule="interleaved_1f1b",
    )
    x, _ = batch(16, seed=9)
    logits = np.asarray(step.eval_logits(x))
    ref_model.eval()
    ref = ref_model(df.Tensor(x, device="tpu")).numpy()
    np.testing.assert_allclose(logits, ref, rtol=1e-5, atol=1e-6)


def test_interleaved_requires_divisible_stages():
    mesh = make_mesh({"data": 2, "pipe": 4})
    stack = PipelineStack(make_stages(6))
    opt = optim.SGD(stack.parameters(), lr=0.1)
    with pytest.raises(ValueError, match="divisible"):
        PipelinedTrainStep(
            stack, opt, nn.MSELoss(), mesh, n_micro=4,
            schedule="interleaved_1f1b",
        )
