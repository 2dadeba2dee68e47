"""1F1B pipeline schedule (PipelinedTrainStep(schedule="1f1b")): equivalence
vs GPipe and vs single-device training, heterogeneous pre/post stages,
buffered (BatchNorm) stages, mixed precision, and the AOT memory_analysis
evidence that peak activation memory is bounded by the 2S-1 input stash
(M-independent) instead of GPipe's M saved microbatch residuals.

No reference analog (the reference has no distributed machinery, SURVEY
§2.3) — this is the TPU-native scale-out superset's schedule upgrade."""

import jax
import jax.numpy as jnp
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


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def make_stages(n=4, width=16, seed=0):
    df.manual_seed(seed)
    return [
        nn.Sequential(nn.Linear(width, width, device="tpu"), nn.ReLU())
        for _ in range(n)
    ]


def batch(n=16, width=16, seed=1):
    r = np.random.default_rng(seed)
    return (
        r.standard_normal((n, width)).astype(np.float32),
        r.standard_normal((n, width)).astype(np.float32),
    )


def test_1f1b_matches_single_device():
    stages = make_stages(4)
    ref_model = nn.Sequential(*stages)
    ref_opt = optim.SGD(ref_model.parameters(), lr=0.1, momentum=0.9)
    ref_step = CompiledTrainStep(ref_model, ref_opt, nn.MSELoss())

    stack = PipelineStack(make_stages(4))
    opt = optim.SGD(stack.parameters(), lr=0.1, momentum=0.9)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), mesh, n_micro=4, schedule="1f1b"
    )

    for i in range(3):
        x, y = batch(16, seed=10 + i)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-5 * max(1.0, abs(ref_loss))

    ref_params = [p.data.array for p in ref_model.parameters()]
    n_per_stage = len(ref_params) // 4
    stacked = [p.data.array for p in stack.parameters()]
    for j in range(n_per_stage):
        for s in range(4):
            np.testing.assert_allclose(
                np.asarray(stacked[j][s]),
                np.asarray(ref_params[s * n_per_stage + j]),
                rtol=1e-5, atol=1e-6,
            )


@pytest.mark.parametrize("n_micro", [2, 4, 8, 16])
def test_1f1b_matches_gpipe(n_micro):
    """Same stages, same data: 1F1B and GPipe train to the same parameters
    (different summation order only) across M < S, M == S, and M > S
    (exercises warmup/steady/drain phase boundaries and the ring stash)."""
    mesh = make_mesh({"data": 2, "pipe": 4})
    steps = {}
    for sched in ("gpipe", "1f1b"):
        stack = PipelineStack(make_stages(4))
        opt = optim.SGD(stack.parameters(), lr=0.1, momentum=0.9)
        steps[sched] = (
            PipelinedTrainStep(
                stack, opt, nn.MSELoss(), mesh, n_micro=n_micro,
                schedule=sched,
            ),
            stack,
        )
    for i in range(3):
        x, y = batch(16, seed=20 + i)
        lg = float(steps["gpipe"][0](x, y))
        l1 = float(steps["1f1b"][0](x, y))
        assert abs(lg - l1) < 1e-5 * max(1.0, abs(lg)), (i, lg, l1)
    for pg, p1 in zip(
        steps["gpipe"][1].parameters(), steps["1f1b"][1].parameters()
    ):
        np.testing.assert_allclose(
            np.asarray(p1.data.array), np.asarray(pg.data.array),
            rtol=1e-5, atol=1e-6,
        )


def test_1f1b_hetero_pre_post_matches_single_device():
    def make_all():
        df.manual_seed(3)
        pre = nn.Linear(8, 16, device="tpu")
        blocks = make_stages(4)
        post = nn.Linear(16, 4, device="tpu")
        return pre, blocks, post

    pre_r, blocks_r, post_r = make_all()
    ref_model = nn.Sequential(pre_r, *blocks_r, post_r)
    ref_opt = optim.SGD(ref_model.parameters(), lr=0.1, momentum=0.9)
    ref_step = CompiledTrainStep(ref_model, ref_opt, nn.MSELoss())

    pre, blocks, post = make_all()
    stack = PipelineStack(blocks)
    params = (
        list(pre.parameters()) + list(stack.parameters())
        + list(post.parameters())
    )
    opt = optim.SGD(params, lr=0.1, momentum=0.9)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), mesh, n_micro=8, pre=pre, post=post,
        schedule="1f1b",
    )

    r = np.random.default_rng(7)
    for i in range(3):
        x = r.standard_normal((16, 8)).astype(np.float32)
        y = r.standard_normal((16, 4)).astype(np.float32)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-5 * max(1.0, abs(ref_loss))

    np.testing.assert_allclose(
        np.asarray(list(pre.parameters())[0].data.array),
        np.asarray(list(pre_r.parameters())[0].data.array),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(list(post.parameters())[0].data.array),
        np.asarray(list(post_r.parameters())[0].data.array),
        rtol=1e-5, atol=1e-6,
    )


def test_1f1b_buffered_bn_stages_match_gpipe():
    """BatchNorm stages: running-stat EMA chains once per microbatch on both
    schedules; params and buffers agree after training."""
    def bn_stages():
        df.manual_seed(5)
        return [
            nn.Sequential(
                nn.Linear(16, 16, device="tpu"),
                nn.BatchNorm1d(16, device="tpu"),
                nn.ReLU(),
            )
            for _ in range(4)
        ]

    mesh = make_mesh({"data": 2, "pipe": 4})
    out = {}
    for sched in ("gpipe", "1f1b"):
        stack = PipelineStack(bn_stages())
        opt = optim.SGD(stack.parameters(), lr=0.05)
        step = PipelinedTrainStep(
            stack, opt, nn.MSELoss(), mesh, n_micro=4, schedule=sched
        )
        for i in range(2):
            x, y = batch(16, seed=30 + i)
            loss = float(step(x, y))
        out[sched] = (stack, loss)
    assert abs(out["gpipe"][1] - out["1f1b"][1]) < 1e-5
    for pg, p1 in zip(
        out["gpipe"][0].parameters(), out["1f1b"][0].parameters()
    ):
        np.testing.assert_allclose(
            np.asarray(p1.data.array), np.asarray(pg.data.array),
            rtol=1e-5, atol=1e-6,
        )
    for (_, bg), (_, b1) in zip(
        out["gpipe"][0].named_buffers(), out["1f1b"][0].named_buffers()
    ):
        np.testing.assert_allclose(
            np.asarray(b1.data.array), np.asarray(bg.data.array),
            rtol=1e-5, atol=1e-6,
        )


def test_1f1b_bf16_matches_gpipe_bf16():
    mesh = make_mesh({"data": 2, "pipe": 4})
    losses = {}
    for sched in ("gpipe", "1f1b"):
        stack = PipelineStack(make_stages(4, width=32, seed=9))
        opt = optim.SGD(stack.parameters(), lr=0.05)
        step = PipelinedTrainStep(
            stack, opt, nn.MSELoss(), mesh, n_micro=4, schedule=sched,
            compute_dtype=jnp.bfloat16,
        )
        x, y = batch(16, width=32, seed=40)
        losses[sched] = float(step(x, y))
        # master params stay f32
        assert all(
            p.data.array.dtype == jnp.float32 for p in stack.parameters()
        )
    # bf16 forward/backward: identical math up to bf16 rounding
    assert abs(losses["gpipe"] - losses["1f1b"]) < 2e-2 * max(
        1.0, abs(losses["gpipe"])
    )


def test_1f1b_bubble_fraction_reported():
    mesh = make_mesh({"data": 2, "pipe": 4})
    stack = PipelineStack(make_stages(4))
    opt = optim.SGD(stack.parameters(), lr=0.1)
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), mesh, n_micro=12, schedule="1f1b"
    )
    assert step.bubble_fraction == pytest.approx(3 / 15)


def test_1f1b_activation_memory_independent_of_m():
    """The memory claim, structurally: GPipe differentiates THROUGH the tick
    scan, so jax.grad stacks per-tick residuals as scan ``ys`` outputs whose
    leading dim is the tick count ``M+S-1`` — activation memory grows with
    M.  1F1B hand-rolls the backward with in-scan ``jax.vjp`` + gradient
    accumulation, so its scans emit ZERO stacked ys and the only activation
    store is the fixed ``2S-1``-slot input ring in the carry — M-independent.

    Asserted on the traced jaxpr (backend-independent; XLA-CPU's
    ``memory_analysis().temp_size_in_bytes`` does not attribute scan
    residuals faithfully enough to compare schedules)."""
    mesh = make_mesh({"data": 2, "pipe": 4})
    width = 256
    rows = 32  # rows per microbatch; batch B = M * rows grows with M

    def scan_stats(sched, M):
        """(stacked_ys_bytes, stash_carry_bytes) over every scan in the
        step jaxpr: ys whose leading dim == scan length are reverse-mode
        residual stacks; the stash carry is identified by its 2S-1 lead."""
        stack = PipelineStack(make_stages(4, width=width, seed=11))
        opt = optim.SGD(stack.parameters(), lr=0.1)
        step = PipelinedTrainStep(
            stack, opt, nn.MSELoss(), mesh, n_micro=M, schedule=sched
        )
        B = M * rows
        x = jnp.zeros((B, width), jnp.float32)
        y = jnp.zeros((B, width), jnp.float32)
        pa = [p.data.array for p in step._params]
        fn = step._pure_step if sched == "gpipe" else step._pure_step_1f1b
        jaxpr = jax.make_jaxpr(fn)(
            pa, [], step.optimizer._state, np.float32(0.1), x, y
        )
        ys_bytes = 0
        stash_bytes = 0
        W = 2 * 4 - 1

        def walk(jx):
            nonlocal ys_bytes, stash_bytes
            for eqn in jx.eqns:
                if eqn.primitive.name == "scan":
                    nc = eqn.params["num_carry"]
                    L = eqn.params["length"]
                    for v in eqn.outvars[:nc]:
                        shp = v.aval.shape
                        if shp and shp[0] == W:
                            stash_bytes = max(
                                stash_bytes,
                                int(np.prod(shp)) * v.aval.dtype.itemsize,
                            )
                    for v in eqn.outvars[nc:]:
                        shp = v.aval.shape
                        if shp and shp[0] == L:
                            ys_bytes += (
                                int(np.prod(shp)) * v.aval.dtype.itemsize
                            )
                for p in eqn.params.values():
                    if hasattr(p, "eqns"):
                        walk(p)
                    elif hasattr(p, "jaxpr") and hasattr(p.jaxpr, "eqns"):
                        walk(p.jaxpr)

        walk(jaxpr.jaxpr)
        return ys_bytes, stash_bytes

    g4_ys, _ = scan_stats("gpipe", 4)
    g32_ys, _ = scan_stats("gpipe", 32)
    f4_ys, f4_stash = scan_stats("1f1b", 4)
    f32_ys, f32_stash = scan_stats("1f1b", 32)
    # GPipe: residual stacks exist and grow ~(M+S-1)/(4+S-1) = 5x
    assert g4_ys > 0
    assert g32_ys > 4 * g4_ys, (g4_ys, g32_ys)
    # 1F1B: no reverse-mode through any scan — zero stacked residuals
    assert f4_ys == 0 and f32_ys == 0, (f4_ys, f32_ys)
    # ... and the input stash ring is the same size at M=4 and M=32
    assert f4_stash > 0
    assert f4_stash == f32_stash, (f4_stash, f32_stash)
