"""Pipeline parallelism (GPipe over a 'pipe' mesh axis) on the 8-virtual-
device CPU mesh.  Correctness bar: the pipelined program is numerically the
same model as running the stages sequentially on one device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, nn, optim
from deepflows_tpu.jit import CompiledEvalStep, CompiledTrainStep
from deepflows_tpu.parallel import make_mesh
from deepflows_tpu.parallel.pipeline import (
    PipelinedTrainStep,
    PipelineStack,
    pipeline_apply,
    purify_module,
)

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
        nn.Sequential(
            nn.Linear(width, width, device="tpu"),
            nn.ReLU(),
        )
        for _ in range(n)
    ]


def batch(n=16, width=16, seed=1):
    r = np.random.default_rng(seed)
    return (
        r.standard_normal((n, width)).astype(np.float32),
        r.standard_normal((n, width)).astype(np.float32),
    )


def test_pipeline_apply_matches_sequential():
    stages = make_stages(4)
    stack = PipelineStack(stages)
    x, _ = batch(8)
    xm = x.reshape(4, 2, 16)

    stacked = [p.data.array for _, p in stack.named_parameters()]
    outs = pipeline_apply(stack.stage_fn(), stacked, jnp.asarray(xm))
    got = np.asarray(outs).reshape(8, 16)

    # sequential truth over the original (unstacked) stage modules
    ref = df.Tensor(x, device="tpu")
    for s in stages:
        ref = s(ref)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_pipeline_apply_on_mesh():
    mesh = make_mesh({"data": 2, "pipe": 4})
    stages = make_stages(4)
    stack = PipelineStack(stages)
    x, _ = batch(8)
    xm = jnp.asarray(x.reshape(4, 2, 16))
    stacked = [p.data.array for _, p in stack.named_parameters()]

    with mesh:
        outs = jax.jit(
            lambda ps, xs: pipeline_apply(
                stack.stage_fn(), ps, xs, mesh=mesh
            )
        )(stacked, xm)
    ref = pipeline_apply(stack.stage_fn(), stacked, xm)
    np.testing.assert_allclose(
        np.asarray(outs), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_pipelined_train_step_matches_single_device():
    # reference: same stages trained as one Sequential on one device
    stages = make_stages(4)
    ref_model = nn.Sequential(*stages)
    ref_opt = optim.SGD(ref_model.parameters(), lr=0.1, momentum=0.9)
    ref_step = CompiledTrainStep(ref_model, ref_opt, nn.MSELoss())

    # pipelined: stacked copies of the SAME initial params over data x pipe
    stages2 = make_stages(4)  # same seed -> identical init
    stack = PipelineStack(stages2)
    opt = optim.SGD(stack.parameters(), lr=0.1, momentum=0.9)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), mesh, n_micro=4
    )

    for i in range(3):
        x, y = batch(16, seed=10 + i)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-5 * max(1.0, abs(ref_loss))

    # stacked params == the per-stage params, stage by stage
    ref_params = [p.data.array for p in ref_model.parameters()]
    n_per_stage = len(ref_params) // 4
    stacked = [p.data.array for p in stack.parameters()]
    for j in range(n_per_stage):
        for s in range(4):
            np.testing.assert_allclose(
                np.asarray(stacked[j][s]),
                np.asarray(ref_params[s * n_per_stage + j]),
                rtol=1e-5,
                atol=1e-6,
            )


def test_eval_logits_matches_forward():
    stages = make_stages(4)
    stack = PipelineStack(stages)
    opt = optim.SGD(stack.parameters(), lr=0.1)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(stack, opt, nn.MSELoss(), mesh, n_micro=4)
    x, _ = batch(8)
    got = np.asarray(step.eval_logits(x))
    ref = df.Tensor(x, device="tpu")
    for s in stages:
        ref = s(ref)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_heterogeneous_stages_rejected():
    df.manual_seed(0)
    stages = [
        nn.Sequential(nn.Linear(16, 16, device="tpu"), nn.ReLU()),
        nn.Sequential(nn.Linear(16, 8, device="tpu"), nn.ReLU()),
    ]
    with pytest.raises(ValueError, match="homogeneous"):
        PipelineStack(stages)


def test_buffered_stages_need_buffered_path():
    """The buffer-free stage_fn refuses BN stages; the buffered path serves
    them (full equivalence test below)."""
    df.manual_seed(0)
    stages = [
        nn.Sequential(nn.Conv2d(4, 4, 3, padding=1, device="tpu"), nn.BatchNorm2d(4, device="tpu"))
        for _ in range(2)
    ]
    stack = PipelineStack(stages)
    with pytest.raises(ValueError, match="buffer-free"):
        purify_module(stack.template)
    assert callable(stack.buffered_stage_fn())


def test_pipelined_bn_stages_match_accumulated_single_device():
    """BN-carrying stages: the pipelined step must equal CompiledTrainStep
    with accum_steps=M on the same stages — identical per-microbatch BN
    semantics (batch stats per microbatch, EMA chained once per microbatch,
    never on bubble ticks), identical grads, identical running stats."""

    def make_bn_stages(seed=0):
        df.manual_seed(seed)
        return [
            nn.Sequential(
                nn.Conv2d(4, 4, 3, padding=1, bias=False, device="tpu"),
                nn.BatchNorm2d(4, device="tpu"),
                nn.ReLU(),
            )
            for _ in range(4)
        ]

    def bn_batch(i):
        r = np.random.default_rng(100 + i)
        return (
            r.standard_normal((16, 4, 8, 8)).astype(np.float32),
            r.standard_normal((16, 4, 8, 8)).astype(np.float32),
        )

    stages = make_bn_stages()
    ref_model = nn.Sequential(*stages)
    ref_opt = optim.SGD(ref_model.parameters(), lr=0.1, momentum=0.9)
    ref_step = CompiledTrainStep(
        ref_model, ref_opt, nn.MSELoss(), accum_steps=4
    )

    stages2 = make_bn_stages()
    stack = PipelineStack(stages2)
    opt = optim.SGD(stack.parameters(), lr=0.1, momentum=0.9)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(stack, opt, nn.MSELoss(), mesh, n_micro=4)

    for i in range(3):
        x, y = bn_batch(i)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-4 * max(1.0, abs(ref_loss))

    # params AND running stats agree stage-by-stage
    ref_params = [p.data.array for p in ref_model.parameters()]
    n_per = len(ref_params) // 4
    stacked = [p.data.array for p in stack.parameters()]
    for j in range(n_per):
        for s in range(4):
            np.testing.assert_allclose(
                np.asarray(stacked[j][s]),
                np.asarray(ref_params[s * n_per + j]),
                rtol=1e-4, atol=1e-5,
            )
    ref_bufs = [b.data.array for _, b in ref_model.named_buffers()]
    nb_per = len(ref_bufs) // 4
    stacked_b = [b.data.array for _, b in stack.named_buffers()]
    for j in range(nb_per):
        for s in range(4):
            np.testing.assert_allclose(
                np.asarray(stacked_b[j][s]),
                np.asarray(ref_bufs[s * nb_per + j]),
                rtol=1e-4, atol=1e-6,
            )
    # eval path: running stats, no EMA mutation
    x, _ = bn_batch(9)
    bufs_before = [np.asarray(b.data.array).copy() for _, b in stack.named_buffers()]
    logits = np.asarray(step.eval_logits(x))
    ref_model.eval()
    ref_out = CompiledEvalStep(ref_model)(x)
    np.testing.assert_allclose(logits, np.asarray(ref_out), rtol=1e-4, atol=1e-5)
    for b, (_, cur) in zip(bufs_before, stack.named_buffers()):
        np.testing.assert_array_equal(b, np.asarray(cur.data.array))


def test_shape_changing_stage_rejected():
    df.manual_seed(0)
    stages = [
        nn.Sequential(nn.Linear(16, 8, device="tpu")),
        nn.Sequential(nn.Linear(16, 8, device="tpu")),
    ]
    stack = PipelineStack(stages)
    stacked = [p.data.array for _, p in stack.named_parameters()]
    x = jnp.zeros((2, 4, 16))
    with pytest.raises(ValueError, match="preserve activation shape"):
        pipeline_apply(stack.stage_fn(), stacked, x)


def test_pipeline_stack_checkpoint_roundtrip(tmp_path):
    """PipelineStack is a Module: reference-layout checkpoints capture the
    stacked params, and a reloaded stack resumes the same pipeline."""
    from deepflows_tpu.utils.model_utils import load_checkpoint, save_checkpoint

    stages = make_stages(4)
    stack = PipelineStack(stages)
    opt = optim.SGD(stack.parameters(), lr=0.1)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(stack, opt, nn.MSELoss(), mesh, n_micro=4)
    x, y = batch(16)
    step(x, y)
    path = str(tmp_path / "pp.pkl")
    save_checkpoint(stack, opt, epoch=1, save_path=path)

    stack2 = PipelineStack(make_stages(4, seed=9))  # different init
    opt2 = optim.SGD(stack2.parameters(), lr=0.1)
    load_checkpoint(stack2, opt2, load_path=path)
    for a, b in zip(stack.parameters(), stack2.parameters()):
        np.testing.assert_allclose(
            np.asarray(a.data.array), np.asarray(b.data.array), rtol=1e-6
        )
    # the restored stack drives a fresh PipelinedTrainStep to the same loss
    step2 = PipelinedTrainStep(stack2, opt2, nn.MSELoss(), mesh, n_micro=4)
    x2, y2 = batch(16, seed=77)
    l1 = float(step(x2, y2))
    l2 = float(step2(x2, y2))
    assert abs(l1 - l2) < 1e-5 * max(1.0, abs(l1))


def test_bubble_ticks_do_not_poison_grads():
    """Regression (review finding): fill/drain bubble ticks used to run
    stages on an all-zeros buffer; a stage not NaN-safe at x=0 (here an L2
    row-normalise, 0/0) produced NaN primal partials that zero cotangents
    cannot neutralise (0*NaN=NaN), silently NaN-ing every parameter after
    one step.  The buffer is now seeded with real microbatch data."""

    class L2Stage(nn.Module):
        def __init__(self, width):
            super().__init__()
            self.lin = nn.Linear(width, width, device="tpu")

        def forward(self, x):
            y = self.lin(x)
            return y / (y * y).sum(1, True).sqrt()

    df.manual_seed(0)
    stages = [L2Stage(16) for _ in range(4)]
    stack = PipelineStack(stages)
    opt = optim.SGD(stack.parameters(), lr=0.05)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(stack, opt, nn.MSELoss(), mesh, n_micro=4)
    x, y = batch(16)
    for _ in range(2):
        loss = float(step(x, y))
        assert np.isfinite(loss)
    for p in stack.parameters():
        assert np.all(np.isfinite(np.asarray(p.data.array))), "NaN params"


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_random_stage_stacks_match_accum(seed):
    """Property: ANY random homogeneous stage (conv/BN/ReLU mix, shape-
    preserving) pipelined over dp x pipe equals CompiledTrainStep with
    accum_steps=M on the same stages.  (Extended offline runs, seeds 4-60 —
    57 seeds — passed during round 2.)"""
    rng = np.random.default_rng(200 + seed)
    ch = int(rng.choice([2, 4, 8]))
    img = int(rng.choice([4, 8]))
    S = int(rng.choice([2, 4]))
    use_bn = bool(rng.random() < 0.7)

    # structure drawn ONCE for the whole stack: homogeneity requires every
    # stage to share the template's forward, not just its param shapes
    use_relu = bool(rng.random() < 0.5)

    def make_stages(s=0):
        df.manual_seed(s)
        out = []
        for _ in range(S):
            mods = [nn.Conv2d(ch, ch, 3, padding=1, bias=not use_bn, device="tpu")]
            if use_bn:
                mods.append(nn.BatchNorm2d(ch, device="tpu"))
            if use_relu:
                mods.append(nn.ReLU())
            out.append(nn.Sequential(*mods))
        return out

    stages = make_stages()
    stages2 = make_stages()

    ref_model = nn.Sequential(*stages)
    M = int(rng.choice([2, 4]))
    ref_opt = optim.Adam(ref_model.parameters(), lr=1e-3)
    ref_step = CompiledTrainStep(ref_model, ref_opt, nn.MSELoss(), accum_steps=M)

    stack = PipelineStack(stages2)
    opt = optim.Adam(stack.parameters(), lr=1e-3)
    mesh = make_mesh({"data": 8 // S, "pipe": S})
    step = PipelinedTrainStep(stack, opt, nn.MSELoss(), mesh, n_micro=M)

    B = M * 4
    for i in range(2):
        r = np.random.default_rng(300 + i)
        x = r.standard_normal((B, ch, img, img)).astype(np.float32)
        y = r.standard_normal((B, ch, img, img)).astype(np.float32)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-4 * max(1.0, abs(ref_loss)), (
            f"seed {seed}: {ref_loss} vs {pp_loss}"
        )
    ref_params = [np.asarray(p.data.array) for p in ref_model.parameters()]
    n_per = len(ref_params) // S
    stacked = [np.asarray(p.data.array) for p in stack.parameters()]
    for j in range(n_per):
        for s in range(S):
            np.testing.assert_allclose(
                stacked[j][s], ref_params[s * n_per + j], rtol=1e-4, atol=1e-5
            )


def test_structurally_different_stages_rejected():
    """Same params, different forward (one stage lacks the ReLU): must be
    rejected — stage 0's forward would silently serve every stage."""
    df.manual_seed(0)
    stages = [
        nn.Sequential(nn.Conv2d(2, 2, 3, padding=1, device="tpu")),
        nn.Sequential(nn.Conv2d(2, 2, 3, padding=1, device="tpu"), nn.ReLU()),
    ]
    with pytest.raises(ValueError, match="homogeneous"):
        PipelineStack(stages)


def test_config_differing_stages_rejected():
    """Same types/shapes, different CONFIG (BN momentum): must be rejected
    (stage 0's forward would silently run every stage with its momentum)."""
    df.manual_seed(0)
    stages = [
        nn.Sequential(nn.Conv2d(2, 2, 3, padding=1, device="tpu"),
                      nn.BatchNorm2d(2, momentum=0.1, device="tpu")),
        nn.Sequential(nn.Conv2d(2, 2, 3, padding=1, device="tpu"),
                      nn.BatchNorm2d(2, momentum=0.01, device="tpu")),
    ]
    with pytest.raises(ValueError, match="homogeneous"):
        PipelineStack(stages)


def test_pipelined_bf16_mixed_precision():
    """compute_dtype=bf16: the pipeline runs in bf16 (loss returns f32,
    masters stay f32) and converges like the f32 pipeline."""
    import jax.numpy as jnp

    def run(cd):
        stages = make_stages(4, width=32)
        stack = PipelineStack(stages)
        opt = optim.Adam(stack.parameters(), lr=1e-2)
        mesh = make_mesh({"data": 2, "pipe": 4})
        step = PipelinedTrainStep(
            stack, opt, nn.MSELoss(), mesh, n_micro=4, compute_dtype=cd
        )
        r = np.random.default_rng(0)
        W = r.standard_normal((32, 32)).astype(np.float32) * 0.3
        x = r.standard_normal((32, 32)).astype(np.float32)
        y = np.maximum(x @ W, 0)
        losses = [float(step(x, y)) for _ in range(30)]
        # masters stayed f32
        assert all(p.data.array.dtype == jnp.float32 for p in stack.parameters())
        return losses

    f32 = run(None)
    bf16 = run(jnp.bfloat16)
    assert bf16[-1] < 0.6 * bf16[0]  # converges
    assert abs(bf16[-1] - f32[-1]) < 0.15 * max(f32[0], 1e-3)  # tracks f32


def test_3d_parallelism_dp_pp_tp():
    """3-D parallelism on ONE mesh: batch over 'data', stages over 'pipe',
    each stage's Linear out-features over 'model' — training still equals
    the single-device step."""
    from jax.sharding import PartitionSpec as P_

    from deepflows_tpu.parallel import tensor_parallel_rules

    stages = make_stages(2, width=32)
    ref_model = nn.Sequential(*stages)
    ref_opt = optim.SGD(ref_model.parameters(), lr=0.1, momentum=0.9)
    ref_step = CompiledTrainStep(ref_model, ref_opt, nn.MSELoss())

    stack = PipelineStack(make_stages(2, width=32))
    opt = optim.SGD(stack.parameters(), lr=0.1, momentum=0.9)
    mesh = make_mesh({"data": 2, "pipe": 2, "model": 2})
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), mesh, n_micro=4,
        param_rules=tensor_parallel_rules("model"),
    )
    # the stacked weights really are pipe+model sharded
    w0 = [p for p in stack.parameters()][0].data.array
    assert w0.sharding.spec == P_("pipe", None, "model"), w0.sharding.spec

    for i in range(3):
        x, y = batch(16, width=32, seed=40 + i)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-5 * max(1.0, abs(ref_loss)), (
            ref_loss, pp_loss,
        )
    ref_params = [p.data.array for p in ref_model.parameters()]
    n_per = len(ref_params) // 2
    stacked = [p.data.array for p in stack.parameters()]
    for j in range(n_per):
        for s in range(2):
            np.testing.assert_allclose(
                np.asarray(stacked[j][s]),
                np.asarray(ref_params[s * n_per + j]),
                rtol=1e-5, atol=1e-6,
            )


# --------------------------------------------------------------------------
# heterogeneous first/last stages (pre=/post=): real models pipeline
# --------------------------------------------------------------------------
def test_hetero_pre_post_matches_single_device():
    """pre (8->16) -> 4 pipelined blocks -> post (16->4) equals the same
    modules trained as one Sequential on one device."""
    df.manual_seed(3)
    def make_all():
        df.manual_seed(3)
        pre = nn.Linear(8, 16, device="tpu")
        blocks = make_stages(4)  # reseeds with seed=0 internally
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
        stack, opt, nn.MSELoss(), mesh, n_micro=4, pre=pre, post=post
    )

    r = np.random.default_rng(7)
    for i in range(3):
        x = r.standard_normal((16, 8)).astype(np.float32)
        y = r.standard_normal((16, 4)).astype(np.float32)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-5 * max(1.0, abs(ref_loss)), (
            i, ref_loss, pp_loss,
        )

    # pre/post params trained identically to the single-device run
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
    # eval path includes pre/post
    x = r.standard_normal((16, 8)).astype(np.float32)
    logits = np.asarray(step.eval_logits(jnp.asarray(x)))
    ref_eval = CompiledEvalStep(ref_model)
    np.testing.assert_allclose(
        logits, np.asarray(ref_eval(x)), rtol=1e-5, atol=1e-6
    )


def test_pipelined_transformer_lm_matches_single_device():
    """A REAL zoo model end-to-end over dp x pp: TransformerLM split into
    embedding pre-stage, pipelined EncoderBlocks, LayerNorm+head post-stage
    — loss trajectory equals the single-device compiled step."""
    from deepflows_tpu import models

    V, L, D = 16, 8, 32

    def make_lm():
        df.manual_seed(11)
        return models.TransformerLM(
            vocab_size=V, max_len=L, dim=D, depth=4, num_heads=4,
            device="tpu", flash=False,
        )

    ref_lm = make_lm()
    ref_opt = optim.Adam(ref_lm.parameters(), lr=1e-3)
    ref_step = CompiledTrainStep(ref_lm, ref_opt, nn.CrossEntropyLoss())

    lm = make_lm()
    pre, blocks, post = lm.pipeline_partition()
    stack = PipelineStack(blocks)
    params = (
        list(pre.parameters()) + list(stack.parameters())
        + list(post.parameters())
    )
    opt = optim.Adam(params, lr=1e-3)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(
        stack, opt, nn.CrossEntropyLoss(), mesh, n_micro=4,
        pre=pre, post=post,
    )

    r = np.random.default_rng(5)
    for i in range(3):
        x = r.integers(0, V, size=(16, L)).astype(np.int32)
        y = r.integers(0, V, size=(16, L)).astype(np.int32)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-4 * max(1.0, abs(ref_loss)), (
            i, ref_loss, pp_loss,
        )

    # embedding gradients flowed: pre params moved from init
    init_lm = make_lm()
    pre_named = dict(pre.named_parameters())
    init_named = dict(init_lm.tok_embed.named_parameters())
    tok_w = next(v for k, v in pre_named.items() if "tok_embed" in k)
    init_w = next(iter(init_named.values()))
    moved = np.abs(
        np.asarray(tok_w.data.array) - np.asarray(init_w.data.array)
    ).max()
    assert moved > 1e-5


def test_hetero_optimizer_order_enforced():
    pre, blocks, post = (
        nn.Linear(8, 16, device="tpu"),
        make_stages(4),
        nn.Linear(16, 4, device="tpu"),
    )
    stack = PipelineStack(blocks)
    # wrong order: stack params first
    params = (
        list(stack.parameters()) + list(pre.parameters())
        + list(post.parameters())
    )
    opt = optim.SGD(params, lr=0.1)
    mesh = make_mesh({"data": 2, "pipe": 4})
    with pytest.raises(ValueError, match="pre.parameters"):
        PipelinedTrainStep(
            stack, opt, nn.MSELoss(), mesh, n_micro=4, pre=pre, post=post
        )


def test_hetero_buffered_pre_rejected():
    pre = nn.Sequential(
        nn.Linear(8, 16, device="tpu"), nn.BatchNorm1d(16, device="tpu")
    )
    blocks = make_stages(4)
    stack = PipelineStack(blocks)
    params = list(pre.parameters()) + list(stack.parameters())
    opt = optim.SGD(params, lr=0.1)
    mesh = make_mesh({"data": 2, "pipe": 4})
    with pytest.raises(ValueError, match="buffer-free"):
        PipelinedTrainStep(
            stack, opt, nn.MSELoss(), mesh, n_micro=4, pre=pre
        )
