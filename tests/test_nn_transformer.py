"""Transformer family: LayerNorm and MultiheadAttention torch-differential,
ViT training through the compiled step, and encoder blocks as pipeline
stages (the canonical homogeneous PipelineStack)."""

import numpy as np
import pytest
import torch

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_layernorm_matches_torch():
    df.manual_seed(0)
    ln = nn.LayerNorm(16, device="tpu")
    tln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tln.weight.copy_(torch.tensor(ln.weight.numpy()))
        tln.bias.copy_(torch.tensor(ln.bias.numpy()))
    x = np.random.default_rng(0).standard_normal((4, 7, 16)).astype(np.float32)

    xt = Tensor(x.copy(), device="tpu", requires_grad=True)
    out = ln(xt)
    (out * out).sum().backward()

    tx = torch.tensor(x, requires_grad=True)
    tout = tln(tx)
    (tout * tout).sum().backward()

    np.testing.assert_allclose(out.numpy(), tout.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(xt.grad.numpy(), tx.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        ln.weight.grad.numpy(), tln.weight.grad.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        ln.bias.grad.numpy(), tln.bias.grad.numpy(), rtol=1e-4, atol=1e-4
    )


def test_multihead_attention_matches_torch():
    E, H, B, L = 16, 4, 2, 5
    df.manual_seed(0)
    mha = nn.MultiheadAttention(E, H, device="tpu")
    tmha = torch.nn.MultiheadAttention(E, H, batch_first=True)
    # map our three projections onto torch's packed in_proj
    with torch.no_grad():
        qw = torch.tensor(mha.q_proj.weight.numpy().T)
        kw = torch.tensor(mha.k_proj.weight.numpy().T)
        vw = torch.tensor(mha.v_proj.weight.numpy().T)
        tmha.in_proj_weight.copy_(torch.cat([qw, kw, vw], 0))
        tmha.in_proj_bias.copy_(
            torch.cat(
                [
                    torch.tensor(mha.q_proj.bias.numpy().ravel()),
                    torch.tensor(mha.k_proj.bias.numpy().ravel()),
                    torch.tensor(mha.v_proj.bias.numpy().ravel()),
                ]
            )
        )
        tmha.out_proj.weight.copy_(torch.tensor(mha.out_proj.weight.numpy().T))
        tmha.out_proj.bias.copy_(
            torch.tensor(mha.out_proj.bias.numpy().ravel())
        )
    x = np.random.default_rng(1).standard_normal((B, L, E)).astype(np.float32)

    xt = Tensor(x.copy(), device="tpu", requires_grad=True)
    out, w = mha(xt, need_weights=True)
    (out * out).sum().backward()

    tx = torch.tensor(x, requires_grad=True)
    tout, tw = tmha(tx, tx, tx, need_weights=True)
    (tout * tout).sum().backward()

    np.testing.assert_allclose(out.numpy(), tout.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(w.numpy(), tw.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(xt.grad.numpy(), tx.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        mha.out_proj.weight.grad.numpy().T,
        tmha.out_proj.weight.grad.numpy(),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        mha.q_proj.weight.grad.numpy().T,
        tmha.in_proj_weight.grad.numpy()[:E],
        rtol=1e-3, atol=1e-4,
    )


def test_vit_trains_compiled():
    df.manual_seed(0)
    model = models.VisionTransformer(
        image_size=16, patch_size=4, num_classes=4,
        dim=32, depth=2, num_heads=2, device="tpu",
    )
    opt = optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-2)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    r = np.random.default_rng(0)
    x = r.standard_normal((16, 3, 16, 16)).astype(np.float32)
    y = r.integers(0, 4, 16).astype(np.int32)
    losses = [float(step(x, y)) for _ in range(8)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert step._jitted._cache_size() == 1


def test_vit_blocks_pipeline():
    """ViT encoder blocks ARE the canonical homogeneous pipeline stages:
    buffer-free, shape-preserving.  Pipelined == sequential."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from deepflows_tpu.parallel import (
        PipelinedTrainStep,
        PipelineStack,
        make_mesh,
    )

    def make_blocks():
        df.manual_seed(0)
        return [
            models.EncoderBlock(32, 2, device="tpu") for _ in range(4)
        ]

    blocks = make_blocks()
    ref_model = nn.Sequential(*blocks)
    ref_opt = optim.Adam(ref_model.parameters(), lr=1e-3)
    ref_step = CompiledTrainStep(ref_model, ref_opt, nn.MSELoss())

    stack = PipelineStack(make_blocks())
    opt = optim.Adam(stack.parameters(), lr=1e-3)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = PipelinedTrainStep(stack, opt, nn.MSELoss(), mesh, n_micro=4)

    r = np.random.default_rng(3)
    for i in range(2):
        x = r.standard_normal((8, 6, 32)).astype(np.float32)
        y = r.standard_normal((8, 6, 32)).astype(np.float32)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-4 * max(1.0, abs(ref_loss)), (
            ref_loss, pp_loss,
        )


def test_vit_in_sharded_step():
    """ViT data-parallel over the mesh, like the CNN zoo."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from deepflows_tpu.parallel import ShardedTrainStep, make_mesh

    df.manual_seed(0)
    model = models.VisionTransformer(
        image_size=16, patch_size=4, num_classes=4,
        dim=32, depth=2, num_heads=2, device="tpu",
    )
    opt = optim.Adam(model.parameters(), lr=1e-3)
    mesh = make_mesh({"data": 8})
    step = ShardedTrainStep(model, opt, nn.CrossEntropyLoss(), mesh)
    r = np.random.default_rng(0)
    x = r.standard_normal((16, 3, 16, 16)).astype(np.float32)
    y = r.integers(0, 4, 16).astype(np.int32)
    losses = [float(step(x, y)) for _ in range(3)]
    assert all(np.isfinite(losses))


def test_vit_onnx_roundtrip(tmp_path):
    """ViT exports to ONNX (ReduceMax/Sum, Erf-GELU decomposition) and the
    framework's own runtime reproduces inference exactly."""
    from deepflows_tpu.jit import CompiledEvalStep
    from deepflows_tpu.onnx import OnnxModel, check_onnx, export_onnx

    df.manual_seed(0)
    m = models.VisionTransformer(
        image_size=16, patch_size=4, num_classes=4,
        dim=32, depth=2, num_heads=2, device="tpu",
    )
    x = np.random.default_rng(0).standard_normal((2, 3, 16, 16)).astype(np.float32)
    p = export_onnx(m, x, str(tmp_path / "vit.onnx"))
    info = check_onnx(p)
    assert info["ops"].get("Erf") and info["ops"].get("ReduceMax")
    om = OnnxModel(p)
    got = om(x)
    m.eval()
    ref = np.asarray(CompiledEvalStep(m)(x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # dynamic batch
    x2 = np.random.default_rng(1).standard_normal((5, 3, 16, 16)).astype(np.float32)
    assert om(x2).shape == (5, 4)


def test_moe_matches_explicit_loop():
    """Dense-gated MoE: the stacked batched-matmul formulation must equal
    the explicit per-expert python loop."""
    df.manual_seed(0)
    moe = nn.MoE(8, 16, n_experts=4, device="tpu")
    x_np = np.random.default_rng(0).standard_normal((2, 5, 8)).astype(np.float32)
    x = Tensor(x_np.copy(), device="tpu")
    out = moe(x).numpy()

    # explicit loop over experts with the same weights
    import scipy.special as sp

    gates = sp.softmax(
        x_np @ moe.router.weight.numpy() + moe.router.bias.numpy().ravel(), -1
    )
    w1 = moe.experts_w1.numpy()
    b1 = moe.experts_b1.numpy()
    w2 = moe.experts_w2.numpy()
    b2 = moe.experts_b2.numpy()
    from scipy.stats import norm

    ref = np.zeros_like(x_np)
    for e in range(4):
        h = x_np @ w1[e] + b1[e]
        h = 0.5 * h * (1.0 + sp.erf(h / np.sqrt(2.0)))  # exact gelu
        oe = h @ w2[e] + b2[e]
        ref += gates[..., e:e + 1] * oe
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_moe_trains_compiled_and_expert_parallel():
    """MoE inside a compiled step, and EP ≡ replicated over the mesh."""
    import jax

    from deepflows_tpu.parallel import (
        ShardedTrainStep,
        expert_parallel_rules,
        make_mesh,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    def run(rules):
        df.manual_seed(0)
        model = nn.Sequential(
            nn.MoE(8, 16, n_experts=4, device="tpu"),
            nn.LayerNorm(8, device="tpu"),
            nn.Flatten(),
            nn.Linear(5 * 8, 3, device="tpu"),
        )
        opt = optim.Adam(model.parameters(), lr=1e-3)
        mesh = make_mesh({"data": 2, "model": 4})
        step = ShardedTrainStep(
            model, opt, nn.CrossEntropyLoss(), mesh, param_rules=rules
        )
        r = np.random.default_rng(0)
        losses = []
        for _ in range(3):
            x = r.standard_normal((8, 5, 8)).astype(np.float32)
            y = r.integers(0, 3, 8).astype(np.int32)
            losses.append(float(step(x, y)))
        params = [np.asarray(p.data.array) for p in model.parameters()]
        shardings = {
            n: p.data.array.sharding.spec
            for n, p in model.named_parameters()
        }
        return losses, params, shardings

    l_rep, p_rep, _ = run(None)
    l_ep, p_ep, sh = run(expert_parallel_rules("model"))
    np.testing.assert_allclose(l_rep, l_ep, rtol=1e-5)
    for a, b in zip(p_rep, p_ep):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # the stacked expert weights really are expert-sharded
    from jax.sharding import PartitionSpec as P_
    assert sh["0.experts_w1"] == P_("model", None, None), sh


def test_vit_remat_matches_plain():
    """ViT(remat=True) rematerialises each encoder block; training must
    follow the plain trajectory (blocks are buffer-free, so this is the
    cleanest remat case)."""

    def run(remat):
        df.manual_seed(0)
        model = models.VisionTransformer(
            image_size=16, patch_size=4, num_classes=4,
            dim=32, depth=2, num_heads=2, device="tpu", remat=remat,
        )
        opt = optim.Adam(model.parameters(), lr=1e-3)
        step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
        r = np.random.default_rng(0)
        x = r.standard_normal((8, 3, 16, 16)).astype(np.float32)
        y = r.integers(0, 4, 8).astype(np.int32)
        return [float(step(x, y)) for _ in range(3)]

    np.testing.assert_allclose(run(False), run(True), rtol=1e-5)


def test_moe_topk_gating():
    """top-1 gating must route each token to exactly its argmax expert;
    top-k trains through the compiled step."""
    df.manual_seed(1)
    moe = nn.MoE(8, 16, n_experts=4, top_k=1, device="tpu")
    x_np = np.random.default_rng(2).standard_normal((3, 4, 8)).astype(np.float32)
    out = moe(Tensor(x_np.copy(), device="tpu")).numpy()

    import scipy.special as sp

    logits = x_np @ moe.router.weight.numpy() + moe.router.bias.numpy().ravel()
    choice = logits.argmax(-1)  # (3, 4)
    w1, b1 = moe.experts_w1.numpy(), moe.experts_b1.numpy()
    w2, b2 = moe.experts_w2.numpy(), moe.experts_b2.numpy()
    ref = np.zeros_like(x_np)
    for i in range(3):
        for t in range(4):
            e = choice[i, t]
            h = x_np[i, t] @ w1[e] + b1[e][0]
            h = 0.5 * h * (1.0 + sp.erf(h / np.sqrt(2.0)))
            ref[i, t] = h @ w2[e] + b2[e][0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    # top-2 end-to-end compiled training
    df.manual_seed(0)
    model = nn.Sequential(
        nn.MoE(8, 16, n_experts=4, top_k=2, device="tpu"),
        nn.Flatten(),
        nn.Linear(4 * 8, 3, device="tpu"),
    )
    opt = optim.Adam(model.parameters(), lr=1e-2)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    r = np.random.default_rng(0)
    x = r.standard_normal((16, 4, 8)).astype(np.float32)
    y = r.integers(0, 3, 16).astype(np.int32)
    losses = [float(step(x, y)) for _ in range(8)]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_mha_weights_are_pre_dropout():
    """need_weights returns PRE-dropout attention (rows sum to 1 even in
    training with attention dropout) — torch semantics."""
    df.manual_seed(0)
    mha = nn.MultiheadAttention(8, 2, dropout=0.5, device="tpu")
    mha.train()
    x = Tensor(
        np.random.default_rng(0).standard_normal((2, 4, 8)).astype(np.float32),
        device="tpu",
    )
    _, w = mha(x, need_weights=True)
    np.testing.assert_allclose(w.numpy().sum(-1), 1.0, rtol=1e-5)


def test_moe_topk_bf16_purity():
    """top-k masking must not promote a bf16 graph to f32."""
    import jax.numpy as jnp

    df.manual_seed(0)
    moe = nn.MoE(8, 16, n_experts=4, top_k=2, device="tpu")
    moe.to_dtype(jnp.bfloat16)
    x = Tensor(
        np.random.default_rng(0).standard_normal((2, 4, 8)).astype(np.float32),
        device="tpu",
    ).to("tpu")
    import deepflows_tpu as _df

    xb = Tensor(x.data.array.astype(jnp.bfloat16), device="tpu")
    out = moe(xb)
    assert out.data.array.dtype == jnp.bfloat16, out.data.array.dtype


def test_vit_full_model_matches_torch():
    """The COMPLETE ViT (patch conv + pos embed + pre-norm blocks + mean
    pool + head) against a hand-built torch twin with identical weights:
    forward and input gradients must agree."""
    import torch.nn as tnn

    dim, heads, depth = 16, 2, 2

    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim)
            self.attn = tnn.MultiheadAttention(dim, heads, batch_first=True)
            self.norm2 = tnn.LayerNorm(dim)
            self.mlp = tnn.Sequential(
                tnn.Linear(dim, dim * 4), tnn.GELU(), tnn.Linear(dim * 4, dim)
            )

        def forward(self, x):
            h = self.norm1(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            return x + self.mlp(self.norm2(x))

    class TorchViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.patch = tnn.Conv2d(3, dim, 4, stride=4)
            self.pos = tnn.Parameter(torch.zeros(1, 16, dim))
            self.blocks = tnn.Sequential(*[TorchBlock() for _ in range(depth)])
            self.norm = tnn.LayerNorm(dim)
            self.head = tnn.Linear(dim, 4)

        def forward(self, x):
            p = self.patch(x).flatten(2).transpose(1, 2) + self.pos
            p = self.norm(self.blocks(p))
            return self.head(p.mean(1))

    df.manual_seed(0)
    ours = models.VisionTransformer(
        image_size=16, patch_size=4, num_classes=4,
        dim=dim, depth=depth, num_heads=heads, device="tpu",
    )
    twin = TorchViT()

    def t(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        twin.patch.weight.copy_(t(ours.patch_embed.weight.numpy()))
        twin.patch.bias.copy_(t(ours.patch_embed.bias.numpy().ravel()))
        twin.pos.copy_(t(ours.pos_embed.numpy()))
        twin.norm.weight.copy_(t(ours.norm.weight.numpy()))
        twin.norm.bias.copy_(t(ours.norm.bias.numpy()))
        twin.head.weight.copy_(t(ours.head.weight.numpy().T))
        twin.head.bias.copy_(t(ours.head.bias.numpy().ravel()))
        for tb, ob in zip(twin.blocks, ours.blocks._modules.values()):
            tb.norm1.weight.copy_(t(ob.norm1.weight.numpy()))
            tb.norm1.bias.copy_(t(ob.norm1.bias.numpy()))
            tb.norm2.weight.copy_(t(ob.norm2.weight.numpy()))
            tb.norm2.bias.copy_(t(ob.norm2.bias.numpy()))
            qw = t(ob.attn.q_proj.weight.numpy().T)
            kw = t(ob.attn.k_proj.weight.numpy().T)
            vw = t(ob.attn.v_proj.weight.numpy().T)
            tb.attn.in_proj_weight.copy_(torch.cat([qw, kw, vw], 0))
            tb.attn.in_proj_bias.copy_(torch.cat([
                t(ob.attn.q_proj.bias.numpy().ravel()),
                t(ob.attn.k_proj.bias.numpy().ravel()),
                t(ob.attn.v_proj.bias.numpy().ravel()),
            ]))
            tb.attn.out_proj.weight.copy_(t(ob.attn.out_proj.weight.numpy().T))
            tb.attn.out_proj.bias.copy_(t(ob.attn.out_proj.bias.numpy().ravel()))
            mods = list(ob.mlp._modules.values())
            tb.mlp[0].weight.copy_(t(mods[0].weight.numpy().T))
            tb.mlp[0].bias.copy_(t(mods[0].bias.numpy().ravel()))
            tb.mlp[2].weight.copy_(t(mods[2].weight.numpy().T))
            tb.mlp[2].bias.copy_(t(mods[2].bias.numpy().ravel()))

    x = np.random.default_rng(0).standard_normal((2, 3, 16, 16)).astype(np.float32)
    xt = Tensor(x.copy(), device="tpu", requires_grad=True)
    out = ours(xt)
    (out * out).sum().backward()
    tx = torch.tensor(x, requires_grad=True)
    tout = twin(tx)
    (tout * tout).sum().backward()
    np.testing.assert_allclose(out.numpy(), tout.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(xt.grad.numpy(), tx.grad.numpy(), rtol=1e-3, atol=1e-4)
    # spot-check a deep param grad (first block's q projection)
    ob0 = list(ours.blocks._modules.values())[0]
    tb0 = twin.blocks[0]
    np.testing.assert_allclose(
        ob0.attn.q_proj.weight.grad.numpy().T,
        tb0.attn.in_proj_weight.grad.numpy()[:dim],
        rtol=1e-3, atol=1e-4,
    )


def test_moe_sparse_dispatch_matches_loop():
    """Switch-style sparse dispatch with ample capacity == explicit
    per-token argmax-expert loop weighted by the raw top gate."""
    import scipy.special as sp

    df.manual_seed(4)
    moe = nn.MoE(8, 16, n_experts=4, capacity_factor=4.0, device="tpu")
    x_np = np.random.default_rng(5).standard_normal((3, 4, 8)).astype(np.float32)
    out = moe(Tensor(x_np.copy(), device="tpu")).numpy()

    gates = sp.softmax(
        x_np @ moe.router.weight.numpy() + moe.router.bias.numpy().ravel(), -1
    )
    choice, gval = gates.argmax(-1), gates.max(-1)
    w1, b1 = moe.experts_w1.numpy(), moe.experts_b1.numpy()
    w2, b2 = moe.experts_w2.numpy(), moe.experts_b2.numpy()
    ref = np.zeros_like(x_np)
    for i in range(3):
        for t in range(4):
            e = choice[i, t]
            h = x_np[i, t] @ w1[e] + b1[e][0]
            h = 0.5 * h * (1.0 + sp.erf(h / np.sqrt(2.0)))
            ref[i, t] = (h @ w2[e] + b2[e][0]) * gval[i, t]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_moe_sparse_capacity_drops():
    """Over-capacity tokens get a zero MoE output (Switch drop semantics)."""
    df.manual_seed(0)
    # capacity_factor tiny -> C = 1: at most one token per expert survives
    moe = nn.MoE(8, 16, n_experts=2, capacity_factor=0.01, device="tpu")
    x = Tensor(
        np.random.default_rng(1).standard_normal((8, 8)).astype(np.float32),
        device="tpu",
    )
    out = moe(x).numpy()
    zero_rows = int((np.abs(out).max(-1) < 1e-12).sum())
    assert zero_rows >= 8 - 2, zero_rows  # <= C per expert survive


def test_moe_sparse_trains_compiled():
    df.manual_seed(0)
    model = nn.Sequential(
        nn.MoE(8, 16, n_experts=4, capacity_factor=2.0, device="tpu"),
        nn.Flatten(),
        nn.Linear(4 * 8, 3, device="tpu"),
    )
    opt = optim.Adam(model.parameters(), lr=1e-2)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    r = np.random.default_rng(0)
    x = r.standard_normal((16, 4, 8)).astype(np.float32)
    y = r.integers(0, 3, 16).astype(np.int32)
    losses = [float(step(x, y)) for _ in range(10)]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    assert step._jitted._cache_size() == 1


def test_groupnorm_matches_torch():
    df.manual_seed(0)
    gn = nn.GroupNorm(4, 8, device="tpu")
    tgn = torch.nn.GroupNorm(4, 8)
    with torch.no_grad():
        tgn.weight.copy_(torch.tensor(gn.weight.numpy()))
        tgn.bias.copy_(torch.tensor(gn.bias.numpy()))
    x = np.random.default_rng(0).standard_normal((2, 8, 5, 5)).astype(np.float32)

    xt = Tensor(x.copy(), device="tpu", requires_grad=True)
    out = gn(xt)
    (out * out).sum().backward()
    tx = torch.tensor(x, requires_grad=True)
    tout = tgn(tx)
    (tout * tout).sum().backward()
    np.testing.assert_allclose(out.numpy(), tout.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(xt.grad.numpy(), tx.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        gn.weight.grad.numpy(), tgn.weight.grad.numpy(), rtol=1e-3, atol=1e-3
    )


def test_groupnorm_in_pipeline_stage():
    """GroupNorm is the advertised buffer-free pipeline norm: a GN stage
    pipelines through the buffer-free path."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from deepflows_tpu.parallel import (
        PipelinedTrainStep,
        PipelineStack,
        make_mesh,
    )

    def make():
        df.manual_seed(0)
        return [
            nn.Sequential(
                nn.Conv2d(4, 4, 3, padding=1, device="tpu"),
                nn.GroupNorm(2, 4, device="tpu"),
                nn.ReLU(),
            )
            for _ in range(4)
        ]

    ref = nn.Sequential(*make())
    ref_opt = optim.Adam(ref.parameters(), lr=1e-3)
    ref_step = CompiledTrainStep(ref, ref_opt, nn.MSELoss())
    stack = PipelineStack(make())
    opt = optim.Adam(stack.parameters(), lr=1e-3)
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), make_mesh({"data": 2, "pipe": 4}), n_micro=4
    )
    r = np.random.default_rng(0)
    for _ in range(2):
        x = r.standard_normal((8, 4, 8, 8)).astype(np.float32)
        y = r.standard_normal((8, 4, 8, 8)).astype(np.float32)
        assert abs(float(ref_step(x, y)) - float(step(x, y))) < 1e-5


def test_embedding_matches_torch():
    df.manual_seed(0)
    emb = nn.Embedding(10, 6, device="tpu")
    temb = torch.nn.Embedding(10, 6)
    with torch.no_grad():
        temb.weight.copy_(torch.tensor(emb.weight.numpy()))
    idx = np.array([[1, 3, 3], [0, 9, 1]], np.int32)

    out = emb(idx)
    (out * out).sum().backward()
    tout = temb(torch.tensor(idx, dtype=torch.long))
    (tout * tout).sum().backward()
    np.testing.assert_allclose(out.numpy(), tout.detach().numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        emb.weight.grad.numpy(), temb.weight.grad.numpy(), rtol=1e-5, atol=1e-6
    )


def test_embedding_trains_compiled():
    class TinyLM(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(16, 8, device="tpu")
            self.head = nn.Linear(8, 16, device="tpu")

        def forward(self, idx):
            return self.head(self.emb(idx).mean(1))

    df.manual_seed(0)
    model = TinyLM()
    opt = optim.Adam(model.parameters(), lr=1e-2)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    r = np.random.default_rng(0)
    x = r.integers(0, 16, (32, 5)).astype(np.int32)
    y = r.integers(0, 16, 32).astype(np.int32)
    losses = [float(step(x, y)) for _ in range(10)]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    assert step._jitted._cache_size() == 1


def test_moe_sparse_large_token_count_positions_exact():
    """Regression (review finding): routing bookkeeping stays f32 — with
    >256 tokens the capacity positions must not collide (a bf16 cumsum
    would merge tokens into one slot)."""
    import jax.numpy as jnp

    df.manual_seed(0)
    moe = nn.MoE(8, 16, n_experts=2, capacity_factor=2.0, device="tpu")
    moe.to_dtype(jnp.bfloat16)
    x = Tensor(
        np.random.default_rng(0)
        .standard_normal((600, 8))
        .astype(np.float32),
        device="tpu",
    )
    xb = Tensor(x.data.array.astype(jnp.bfloat16), device="tpu")
    out = moe(xb)
    assert out.data.array.dtype == jnp.bfloat16
    # ample capacity -> NO dropped tokens even at position > 256
    dropped = int((np.abs(np.asarray(out.data.array, np.float32)).max(-1) < 1e-8).sum())
    assert dropped == 0, f"{dropped} tokens wrongly dropped/merged"


def test_moe_negative_capacity_rejected():
    with pytest.raises(ValueError, match="capacity_factor"):
        nn.MoE(8, 16, n_experts=4, capacity_factor=-2.0, device="tpu")


def test_causal_attention_matches_torch():
    E, H, B, L = 16, 4, 2, 6
    df.manual_seed(0)
    mha = nn.MultiheadAttention(E, H, causal=True, device="tpu")
    tmha = torch.nn.MultiheadAttention(E, H, batch_first=True)
    with torch.no_grad():
        qw = torch.tensor(mha.q_proj.weight.numpy().T)
        kw = torch.tensor(mha.k_proj.weight.numpy().T)
        vw = torch.tensor(mha.v_proj.weight.numpy().T)
        tmha.in_proj_weight.copy_(torch.cat([qw, kw, vw], 0))
        tmha.in_proj_bias.copy_(torch.cat([
            torch.tensor(mha.q_proj.bias.numpy().ravel()),
            torch.tensor(mha.k_proj.bias.numpy().ravel()),
            torch.tensor(mha.v_proj.bias.numpy().ravel()),
        ]))
        tmha.out_proj.weight.copy_(torch.tensor(mha.out_proj.weight.numpy().T))
        tmha.out_proj.bias.copy_(torch.tensor(mha.out_proj.bias.numpy().ravel()))
    x = np.random.default_rng(1).standard_normal((B, L, E)).astype(np.float32)
    out = mha(Tensor(x.copy(), device="tpu")).numpy()
    mask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
    tout = tmha(torch.tensor(x), torch.tensor(x), torch.tensor(x), attn_mask=mask)[0]
    np.testing.assert_allclose(out, tout.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_transformer_lm_is_causal():
    """Changing FUTURE tokens must not change logits at earlier positions."""
    df.manual_seed(0)
    lm = models.TransformerLM(vocab_size=16, max_len=8, dim=32, depth=2,
                              num_heads=2, device="tpu")
    lm.eval()
    idx = np.array([[1, 2, 3, 4, 5, 6, 7, 8]], np.int32)
    idx2 = idx.copy()
    idx2[0, 5:] = [15, 14, 13]  # mutate the tail
    a = lm(Tensor(idx, device="tpu")).numpy()
    b = lm(Tensor(idx2, device="tpu")).numpy()
    np.testing.assert_allclose(a[0, :5], b[0, :5], rtol=1e-5, atol=1e-6)
    assert np.abs(a[0, 5:] - b[0, 5:]).max() > 1e-3  # tail does differ


def test_transformer_lm_trains_next_token():
    """The LM learns a deterministic successor function well below the
    uniform-baseline loss, through the compiled step."""
    V = 16
    df.manual_seed(0)
    lm = models.TransformerLM(vocab_size=V, max_len=8, dim=64, depth=2,
                              num_heads=2, device="tpu")
    opt = optim.AdamW(lm.parameters(), lr=3e-3, weight_decay=1e-2)

    # CrossEntropyLoss handles (B, L, V) sequence logits natively
    step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss())
    r = np.random.default_rng(0)

    def batch():
        x0 = r.integers(0, V, (32, 1))
        seq = [x0]
        for _ in range(8):
            seq.append((seq[-1] * 5 + 3) % V)  # deterministic successor
        s = np.concatenate(seq, 1).astype(np.int32)
        return s[:, :8], s[:, 1:9]

    losses = []
    for _ in range(60):
        x, y = batch()
        losses.append(float(step(x, y)))
    uniform = np.log(V)
    assert losses[-1] < 0.35 * uniform, (losses[0], losses[-1], uniform)
    assert step._jitted._cache_size() == 1


def test_transformer_lm_generate():
    """After learning the successor function, greedy generation continues
    the sequence correctly (causal right-padding keeps one compiled shape)."""
    V = 16
    df.manual_seed(0)
    lm = models.TransformerLM(vocab_size=V, max_len=8, dim=64, depth=2,
                              num_heads=2, device="tpu")
    opt = optim.AdamW(lm.parameters(), lr=3e-3, weight_decay=1e-2)

    # CrossEntropyLoss handles (B, L, V) sequence logits natively
    step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss())
    r = np.random.default_rng(0)
    for _ in range(80):
        x0 = r.integers(0, V, (32, 1))
        seq = [x0]
        for _ in range(8):
            seq.append((seq[-1] * 5 + 3) % V)
        s = np.concatenate(seq, 1).astype(np.int32)
        step(s[:, :8], s[:, 1:9])

    prompt = np.array([[2, 13, 4]], np.int32)  # 2 -> 13 -> 4 under x*5+3 mod 16
    out = lm.generate(prompt, 3)
    want = [2, 13, 4, 7, 6, 1]  # successors: 4*5+3=23%16=7, 7*5+3=38%16=6, 6*5+3=33%16=1
    assert out.tolist() == [want], out.tolist()


def test_cross_entropy_sequence_logits():
    """(B, L, V) logits + (B, L) int targets == flattened CE (torch-checked),
    through both the functional and the Module."""
    r = np.random.default_rng(0)
    logits = r.standard_normal((4, 6, 10)).astype(np.float32)
    targets = r.integers(0, 10, (4, 6)).astype(np.int32)

    lt = Tensor(logits.copy(), device="tpu", requires_grad=True)
    loss = nn.CrossEntropyLoss()(lt, Tensor(targets, device="tpu"))
    loss.backward()

    tl = torch.tensor(logits.reshape(24, 10), requires_grad=True)
    tloss = torch.nn.functional.cross_entropy(
        tl, torch.tensor(targets.reshape(24), dtype=torch.long)
    )
    tloss.backward()
    np.testing.assert_allclose(float(loss.numpy()), float(tloss.detach()), rtol=1e-5)
    np.testing.assert_allclose(
        lt.grad.numpy().reshape(24, 10), tl.grad.numpy(), rtol=1e-4, atol=1e-6
    )


def test_cross_entropy_sequence_edge_cases():
    """Review regressions: (a) one-hot (B,L,V) sequence targets flatten too;
    (b) explicit dim=1 on torch-layout 3-D input is NOT hijacked even when
    C == L; (c) reduction='none' returns the per-token (B, L) shape."""
    import torch

    r = np.random.default_rng(0)
    logits = r.standard_normal((2, 3, 5)).astype(np.float32)
    targets = r.integers(0, 5, (2, 3))
    onehot = np.eye(5, dtype=np.float32)[targets]

    # (a) one-hot sequence target == integer sequence target
    li = nn.functional.cross_entropy(
        Tensor(logits.copy(), device="tpu"), Tensor(targets.astype(np.int32), device="tpu")
    )
    lo = nn.functional.cross_entropy(
        Tensor(logits.copy(), device="tpu"), Tensor(onehot, device="tpu")
    )
    want = torch.nn.functional.cross_entropy(
        torch.tensor(logits.reshape(6, 5)), torch.tensor(targets.reshape(6))
    )
    np.testing.assert_allclose(float(li.numpy()), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(lo.numpy()), float(want), rtol=1e-5)

    # (b) explicit dim=1 (torch layout, C == L coincidence) is untouched:
    # one-hot target over axis 1 gives the composed-path value
    sq = r.standard_normal((2, 4, 4)).astype(np.float32)
    oh1 = np.zeros((2, 4, 4), np.float32)
    cls = r.integers(0, 4, (2, 4))
    for b in range(2):
        for l in range(4):
            oh1[b, cls[b, l], l] = 1.0
    got = nn.functional.cross_entropy(
        Tensor(sq.copy(), device="tpu"), Tensor(oh1, device="tpu"), dim=1
    )
    want1 = torch.nn.functional.cross_entropy(
        torch.tensor(sq), torch.tensor(cls, dtype=torch.long)
    )  # rank>2 torch-layout 'mean' is torch's per-position mean (B*L)
    np.testing.assert_allclose(float(got.numpy()), float(want1), rtol=1e-4)

    # (c) reduction='none' keeps (B, L)
    ln = nn.functional.cross_entropy(
        Tensor(logits.copy(), device="tpu"),
        Tensor(targets.astype(np.int32), device="tpu"),
        reduction="none",
    )
    assert ln.shape == (2, 3), ln.shape
    wantn = torch.nn.functional.cross_entropy(
        torch.tensor(logits.reshape(6, 5)), torch.tensor(targets.reshape(6)),
        reduction="none",
    ).reshape(2, 3)
    np.testing.assert_allclose(ln.numpy(), wantn.numpy(), rtol=1e-5)


def test_generate_on_cpu_device_model():
    """generate must run on the model's own device (review regression:
    hardcoded 'tpu' crashed cpu-device models)."""
    df.manual_seed(0)
    lm = models.TransformerLM(vocab_size=8, max_len=4, dim=16, depth=1,
                              num_heads=2, device="cpu")
    out = lm.generate(np.array([[1, 2]], np.int32), 2)
    assert out.shape == (1, 4)


def test_vit_blocks_3d_parallelism():
    """Megatron-style 3-D parallelism for transformers: encoder-block
    stages over 'pipe', every Linear's out-features (q/k/v/out projections,
    MLP) over 'model', batch over 'data' — equals single-device training."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from deepflows_tpu.jit import CompiledTrainStep as CTS
    from deepflows_tpu.parallel import (
        PipelinedTrainStep,
        PipelineStack,
        make_mesh,
        tensor_parallel_rules,
    )

    def make_blocks():
        df.manual_seed(0)
        return [models.EncoderBlock(32, 2, device="tpu") for _ in range(2)]

    ref_model = nn.Sequential(*make_blocks())
    ref_opt = optim.Adam(ref_model.parameters(), lr=1e-3)
    ref_step = CTS(ref_model, ref_opt, nn.MSELoss())

    stack = PipelineStack(make_blocks())
    opt = optim.Adam(stack.parameters(), lr=1e-3)
    mesh = make_mesh({"data": 2, "pipe": 2, "model": 2})
    step = PipelinedTrainStep(
        stack, opt, nn.MSELoss(), mesh, n_micro=4,
        param_rules=tensor_parallel_rules("model"),
    )
    r = np.random.default_rng(7)
    for _ in range(2):
        x = r.standard_normal((8, 6, 32)).astype(np.float32)
        y = r.standard_normal((8, 6, 32)).astype(np.float32)
        ref_loss = float(ref_step(x, y))
        pp_loss = float(step(x, y))
        assert abs(ref_loss - pp_loss) < 1e-4 * max(1.0, abs(ref_loss)), (
            ref_loss, pp_loss,
        )


def test_transformer_lm_trajectory_matches_torch():
    """FULL LM training trajectory vs a hand-built torch twin: identical
    weights and batches, Adam(1e-3), 10 steps — per-step losses must track
    (the transformer-family analogue of the CNN trajectory A/B)."""
    import torch.nn as tnn

    V, D, H, depth, L = 16, 32, 2, 2, 8

    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(D)
            self.attn = tnn.MultiheadAttention(D, H, batch_first=True)
            self.norm2 = tnn.LayerNorm(D)
            self.mlp = tnn.Sequential(
                tnn.Linear(D, D * 4), tnn.GELU(), tnn.Linear(D * 4, D)
            )
            mask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
            self.register_buffer("mask", mask)

        def forward(self, x):
            h = self.norm1(x)
            x = x + self.attn(h, h, h, attn_mask=self.mask, need_weights=False)[0]
            return x + self.mlp(self.norm2(x))

    class TorchLM(tnn.Module):
        def __init__(self):
            super().__init__()
            self.emb = tnn.Embedding(V, D)
            self.pos = tnn.Parameter(torch.zeros(1, L, D))
            self.blocks = tnn.Sequential(*[TorchBlock() for _ in range(depth)])
            self.norm = tnn.LayerNorm(D)
            self.head = tnn.Linear(D, V)

        def forward(self, idx):
            x = self.emb(idx) + self.pos
            return self.head(self.norm(self.blocks(x)))

    df.manual_seed(0)
    ours = models.TransformerLM(vocab_size=V, max_len=L, dim=D, depth=depth,
                                num_heads=H, device="tpu")
    twin = TorchLM()

    def t(a):
        return torch.tensor(np.asarray(a))

    with torch.no_grad():
        twin.emb.weight.copy_(t(ours.tok_embed.weight.numpy()))
        twin.pos.copy_(t(ours.pos_embed.numpy()))
        twin.norm.weight.copy_(t(ours.norm.weight.numpy()))
        twin.norm.bias.copy_(t(ours.norm.bias.numpy()))
        twin.head.weight.copy_(t(ours.head.weight.numpy().T))
        twin.head.bias.copy_(t(ours.head.bias.numpy().ravel()))
        for tb, ob in zip(twin.blocks, ours.blocks._modules.values()):
            tb.norm1.weight.copy_(t(ob.norm1.weight.numpy()))
            tb.norm1.bias.copy_(t(ob.norm1.bias.numpy()))
            tb.norm2.weight.copy_(t(ob.norm2.weight.numpy()))
            tb.norm2.bias.copy_(t(ob.norm2.bias.numpy()))
            tb.attn.in_proj_weight.copy_(torch.cat([
                t(ob.attn.q_proj.weight.numpy().T),
                t(ob.attn.k_proj.weight.numpy().T),
                t(ob.attn.v_proj.weight.numpy().T),
            ], 0))
            tb.attn.in_proj_bias.copy_(torch.cat([
                t(ob.attn.q_proj.bias.numpy().ravel()),
                t(ob.attn.k_proj.bias.numpy().ravel()),
                t(ob.attn.v_proj.bias.numpy().ravel()),
            ]))
            tb.attn.out_proj.weight.copy_(t(ob.attn.out_proj.weight.numpy().T))
            tb.attn.out_proj.bias.copy_(t(ob.attn.out_proj.bias.numpy().ravel()))
            mods = list(ob.mlp._modules.values())
            tb.mlp[0].weight.copy_(t(mods[0].weight.numpy().T))
            tb.mlp[0].bias.copy_(t(mods[0].bias.numpy().ravel()))
            tb.mlp[2].weight.copy_(t(mods[2].weight.numpy().T))
            tb.mlp[2].bias.copy_(t(mods[2].bias.numpy().ravel()))

    opt = optim.Adam(ours.parameters(), lr=1e-3)
    step = CompiledTrainStep(ours, opt, nn.CrossEntropyLoss())
    topt = torch.optim.Adam(twin.parameters(), lr=1e-3)
    tce = torch.nn.CrossEntropyLoss()

    r = np.random.default_rng(0)
    ours_losses, twin_losses = [], []
    for _ in range(10):
        x = r.integers(0, V, (16, L)).astype(np.int32)
        y = r.integers(0, V, (16, L)).astype(np.int32)
        ours_losses.append(float(step(x, y)))
        topt.zero_grad()
        logits = twin(torch.tensor(x, dtype=torch.long))
        tl = tce(logits.reshape(-1, V), torch.tensor(y.reshape(-1), dtype=torch.long))
        tl.backward()
        topt.step()
        twin_losses.append(float(tl.detach()))
    np.testing.assert_allclose(ours_losses, twin_losses, rtol=2e-3)
