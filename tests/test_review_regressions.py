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
