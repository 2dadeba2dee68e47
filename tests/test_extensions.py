"""Tests for framework extensions: grad clipping (eager + in-graph),
checkpoint serving, Conv1d/BatchNorm1d/GELU modules, Sequential slicing."""

import numpy as np
import pytest
import torch

import deepflows_tpu as df
from deepflows_tpu import BackendTensor, Graph, Tensor, nn, optim
from deepflows_tpu.jit import CompiledTrainStep

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_clip_grad_norm_eager():
    p1 = nn.Parameter(Tensor(np.zeros((3,), np.float32)))
    p2 = nn.Parameter(Tensor(np.zeros((2,), np.float32)))
    p1.grad = BackendTensor(np.array([3.0, 0, 0], np.float32))
    p2.grad = BackendTensor(np.array([0.0, 4.0], np.float32))
    norm = optim.clip_grad_norm_([p1, p2], max_norm=1.0)
    np.testing.assert_allclose(norm, 5.0, rtol=1e-5)
    total = np.sqrt(
        (p1.grad.numpy() ** 2).sum() + (p2.grad.numpy() ** 2).sum()
    )
    np.testing.assert_allclose(total, 1.0, rtol=1e-4)
    # below the threshold: untouched
    p1.grad = BackendTensor(np.array([0.1, 0, 0], np.float32))
    p2.grad = BackendTensor(np.array([0.0, 0.1], np.float32))
    optim.clip_grad_norm_([p1, p2], max_norm=1.0)
    np.testing.assert_allclose(p1.grad.numpy()[0], 0.1, rtol=1e-5)


def test_clip_inside_compiled_step():
    df.manual_seed(0)
    model = nn.Linear(8, 2, device="tpu")
    opt = optim.SGD(model.parameters(), lr=1.0)
    step = CompiledTrainStep(
        model,
        opt,
        nn.MSELoss(),
        grad_transform=optim.clip_by_global_norm(0.01),
    )
    w0 = model.weight.numpy().copy()
    x = RNG.standard_normal((4, 8)).astype(np.float32) * 100
    y = RNG.standard_normal((4, 2)).astype(np.float32)
    step(x, y)
    delta = np.sqrt(
        ((model.weight.numpy() - w0) ** 2).sum()
        + ((model.bias.numpy() - model.bias.numpy() * 0 - (model.bias.numpy()))**2).sum()
    )
    # update magnitude bounded by lr * max_norm (weight part alone < 0.01+eps)
    assert delta <= 0.011, delta


def test_serving_from_checkpoint(tmp_path):
    grpc = pytest.importorskip("grpc")
    from deepflows_tpu.serving import MyDLPWServicer, PredictClient
    from deepflows_tpu.utils import save_checkpoint

    df.manual_seed(0)
    from deepflows_tpu import models

    model = models.ResNet18(num_classes=4, device="tpu")
    save_checkpoint(model, None, 1, 0.1, str(tmp_path / "m.pkl"))
    server = MyDLPWServicer(
        "localhost:50912",
        root_dir=str(tmp_path),
        model_file="m.pkl",
        model_name="resnet18",
        num_classes=4,
    )
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50912")
        x = RNG.standard_normal((1, 3, 64, 64)).astype(np.float32)
        (out,) = client.predict(x)
        assert out.shape == (1, 4)
        client.close()
    finally:
        server.stop()


def test_conv1d_module_matches_torch():
    conv = nn.Conv1d(3, 5, 3, stride=2, padding=1, device="cpu")
    x = RNG.standard_normal((2, 3, 11)).astype(np.float32)
    tconv = torch.nn.Conv1d(3, 5, 3, stride=2, padding=1)
    tconv.weight.data = torch.tensor(conv.weight.numpy())
    tconv.bias.data = torch.tensor(conv.bias.numpy().reshape(-1))
    np.testing.assert_allclose(
        conv(Tensor(x, device="cpu")).numpy(),
        tconv(torch.tensor(x)).detach().numpy(),
        rtol=1e-4,
        atol=1e-5,
    )


def test_batchnorm1d_2d_and_3d_inputs():
    bn = nn.BatchNorm1d(4, device="tpu")
    x2 = Tensor(RNG.standard_normal((8, 4)).astype(np.float32), device="tpu")
    out = bn(x2)
    assert out.shape == (8, 4)
    np.testing.assert_allclose(out.numpy().mean(0), 0.0, atol=1e-4)
    x3 = Tensor(RNG.standard_normal((8, 4, 6)).astype(np.float32), device="tpu")
    assert bn(x3).shape == (8, 4, 6)


def test_sequential_slicing_and_add():
    seq = nn.Sequential(
        nn.Linear(4, 8, device="cpu"), nn.ReLU(), nn.Linear(8, 2, device="cpu")
    )
    head = seq[:2]
    assert isinstance(head, nn.Sequential) and len(head) == 2
    combo = head + nn.Sequential(nn.Linear(8, 3, device="cpu"))
    assert len(combo) == 3
    x = Tensor(RNG.standard_normal((2, 4)).astype(np.float32), device="cpu")
    assert combo(x).shape == (2, 3)
