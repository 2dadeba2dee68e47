"""Fused LM-head cross-entropy (ops.pallas_kernels.fused_linear_ce +
nn.LMHeadCrossEntropy): per-row loss and dx/dw/db gradients equal the naive
head-matmul + log-softmax path, and a TransformerLM trained through the
fused criterion tracks the baseline (head in model + CrossEntropyLoss)
step-for-step.  The point of the kernel is what it does NOT produce: the
(B·L, vocab) logits/softmax tensors never hit HBM (forward or backward)."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, nn, optim, models
from deepflows_tpu.jit import CompiledTrainStep

RNG = np.random.default_rng(3)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def _naive(x, w, b, t):
    import jax
    import jax.numpy as jnp

    lg = x @ w + b
    return jax.nn.logsumexp(lg, -1) - lg[jnp.arange(lg.shape[0]), t]


@pytest.mark.parametrize("n,d,v", [(100, 64, 300), (128, 128, 1024), (37, 64, 513)])
def test_fused_linear_ce_matches_naive(n, d, v):
    import jax
    import jax.numpy as jnp
    from deepflows_tpu.ops.pallas_kernels import fused_linear_ce

    x = jnp.asarray(RNG.standard_normal((n, d)).astype(np.float32) * 0.5)
    w = jnp.asarray(RNG.standard_normal((d, v)).astype(np.float32) * 0.1)
    b = jnp.asarray(RNG.standard_normal(v).astype(np.float32) * 0.1)
    t = jnp.asarray(RNG.integers(0, v, n).astype(np.int32))

    np.testing.assert_allclose(
        np.asarray(fused_linear_ce(x, w, b, t)),
        np.asarray(_naive(x, w, b, t)),
        rtol=1e-5, atol=1e-5,
    )
    gn = jax.grad(lambda *a: _naive(*a, t).mean(), argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(
        lambda *a: fused_linear_ce(*a, t).mean(), argnums=(0, 1, 2)
    )(x, w, b)
    for name, a, f in zip("xwb", gn, gf):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=f"d{name}",
        )


def test_fused_ce_bf16_activations():
    import jax.numpy as jnp
    from deepflows_tpu.ops.pallas_kernels import fused_linear_ce

    n, d, v = 64, 64, 200
    x32 = jnp.asarray(RNG.standard_normal((n, d)).astype(np.float32) * 0.5)
    w32 = jnp.asarray(RNG.standard_normal((d, v)).astype(np.float32) * 0.1)
    b = jnp.asarray(np.zeros(v, np.float32))
    t = jnp.asarray(RNG.integers(0, v, n).astype(np.int32))
    got = fused_linear_ce(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16), b, t)
    assert got.dtype == jnp.float32  # loss always f32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_naive(x32, w32, b, t)), rtol=5e-2, atol=5e-2
    )


def test_lm_trains_through_fused_head_criterion():
    """Baseline (lm -> logits -> CrossEntropyLoss) vs fused
    (lm.trunk() -> hidden -> LMHeadCrossEntropy(lm.head)): identical init,
    identical batches, 5 Adam steps — loss trajectories match and the head
    parameters (updated only via the fused kernel's dw/db) stay equal."""
    V, L, D = 97, 12, 32

    def make():
        df.manual_seed(21)
        return models.TransformerLM(
            vocab_size=V, max_len=L, dim=D, depth=2, num_heads=2,
            device="tpu", flash=False,
        )

    lm_a, lm_b = make(), make()
    opt_a = optim.Adam(lm_a.parameters(), lr=1e-3)
    opt_b = optim.Adam(lm_b.parameters(), lr=1e-3)
    step_a = CompiledTrainStep(lm_a, opt_a, nn.CrossEntropyLoss())
    step_b = CompiledTrainStep(
        lm_b.trunk(), opt_b, nn.LMHeadCrossEntropy(lm_b.head)
    )
    for i in range(5):
        r = np.random.default_rng(100 + i)
        x = r.integers(0, V, (4, L)).astype(np.int32)
        y = r.integers(0, V, (4, L)).astype(np.int32)
        la = float(step_a(x, y))
        lb = float(step_b(x, y))
        assert abs(la - lb) / abs(la) < 1e-3, (i, la, lb)
    wa = lm_a.head.weight.numpy()
    wb = lm_b.head.weight.numpy()
    np.testing.assert_allclose(wb, wa, rtol=1e-4, atol=1e-5)
    ba = lm_a.head.bias.numpy()
    bb = lm_b.head.bias.numpy()
    np.testing.assert_allclose(bb, ba, rtol=1e-4, atol=1e-5)
    # head moved (grads actually flowed through the fused kernel)
    df.manual_seed(21)
    w0 = make().head.weight.numpy()
    assert np.abs(wb - w0).max() > 1e-6


def test_fused_criterion_reductions_and_eval():
    V, L = 50, 8
    df.manual_seed(4)
    lm = models.TransformerLM(
        vocab_size=V, max_len=L, dim=32, depth=1, num_heads=2,
        device="tpu", flash=False,
    )
    crit = nn.LMHeadCrossEntropy(lm.head, reduction="none")
    x = RNG.integers(0, V, (2, L)).astype(np.int32)
    y = RNG.integers(0, V, (2, L)).astype(np.int32)
    from deepflows_tpu import Tensor

    hidden = lm.trunk()(Tensor(x, device="tpu"))
    per_tok = crit(hidden, Tensor(y, device="tpu"))
    assert per_tok.shape == (2 * L,)
    m = nn.LMHeadCrossEntropy(lm.head)(hidden, Tensor(y, device="tpu"))
    np.testing.assert_allclose(
        float(m.numpy()), per_tok.numpy().mean(), rtol=1e-5
    )
    # the full lm still yields logits for eval
    with df.no_grad():
        lg = lm(Tensor(x, device="tpu"))
    assert lg.shape == (2, L, V)
