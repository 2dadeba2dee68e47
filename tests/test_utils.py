"""utils tests: DataLoader semantics, metrics, checkpoint round-trip
(including BN buffers and Adam state), image folder loading."""

import os

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn, optim
from deepflows_tpu.utils import (
    Accumulator,
    accuracy,
    evaluate_accuracy,
    get_model_config,
    load_checkpoint,
    save_checkpoint,
)
from deepflows_tpu.utils.data import DataLoader, TensorDataset, data_loader

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_dataloader_batching():
    X = np.arange(20, dtype=np.float32).reshape(10, 2)
    y = np.arange(10, dtype=np.int32)
    loader = data_loader(X, y, batch_size=3)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0][0].shape == (3, 2)
    assert batches[-1][0].shape == (1, 2)
    np.testing.assert_allclose(batches[0][1], [0, 1, 2])


def test_dataloader_drop_last_and_len():
    X = np.zeros((10, 2), np.float32)
    y = np.zeros(10, np.int32)
    loader = data_loader(X, y, batch_size=3, drop_last=True)
    assert len(loader) == 3
    assert all(b[0].shape == (3, 2) for b in loader)


def test_dataloader_shuffle_covers_all():
    X = np.arange(10, dtype=np.float32).reshape(10, 1)
    y = np.arange(10, dtype=np.int32)
    loader = DataLoader(TensorDataset(X, y), batch_size=4, shuffle=True, seed=0)
    seen = np.concatenate([b[1] for b in loader])
    assert sorted(seen.tolist()) == list(range(10))


def test_dataloader_prefetch():
    X = np.arange(12, dtype=np.float32).reshape(12, 1)
    y = np.arange(12, dtype=np.int32)
    loader = data_loader(X, y, batch_size=4, prefetch_size=2)
    assert len(list(loader)) == 3


def test_dataloader_prefetch_runs_on_worker_thread():
    import threading

    main = threading.get_ident()
    seen = []

    def collate(batch):
        seen.append(threading.get_ident())
        return batch

    X = np.arange(16, dtype=np.float32).reshape(16, 1)
    y = np.arange(16, dtype=np.int32)
    batches = list(
        data_loader(X, y, batch_size=4, prefetch_size=2, collate_fn=collate)
    )
    assert len(batches) == 4
    assert seen and all(t != main for t in seen)
    # ordering preserved despite the thread hop
    np.testing.assert_allclose(batches[0][1], [0, 1, 2, 3])
    np.testing.assert_allclose(batches[-1][1], [12, 13, 14, 15])


def test_dataloader_prefetch_early_exit_stops_worker():
    import threading

    before = threading.active_count()
    X = np.zeros((64, 1), np.float32)
    y = np.zeros(64, np.int32)
    for i, _ in enumerate(data_loader(X, y, batch_size=4, prefetch_size=2)):
        if i == 1:
            break
    # the producer must wind down promptly after the consumer bails
    deadline = [t for t in range(50)]
    import time

    for _ in deadline:
        alive = [
            t
            for t in threading.enumerate()
            if t.name == "deepflows-prefetch" and t.is_alive()
        ]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive
    assert threading.active_count() <= before + 1


def test_dataloader_prefetch_propagates_exception():
    class Boom(Exception):
        pass

    def collate(batch):
        raise Boom("bad batch")

    X = np.zeros((8, 1), np.float32)
    y = np.zeros(8, np.int32)
    with pytest.raises(Boom):
        list(data_loader(X, y, batch_size=4, prefetch_size=2, collate_fn=collate))


def test_dataloader_device_staging():
    import jax

    X = np.arange(8, dtype=np.float32).reshape(8, 1)
    y = np.arange(8, dtype=np.int32)
    for xb, yb in data_loader(X, y, batch_size=4, device=True, prefetch_size=2):
        assert isinstance(xb, jax.Array) and isinstance(yb, jax.Array)
    np.testing.assert_allclose(np.asarray(xb)[:, 0], [4, 5, 6, 7])


def test_dataloader_custom_sampler():
    from deepflows_tpu.utils.data import DataLoader, SequentialSampler

    X = np.arange(10, dtype=np.float32).reshape(10, 1)
    y = np.arange(10, dtype=np.int32)
    ds = TensorDataset(X, y)

    class EvensSampler(SequentialSampler):
        def __iter__(self):
            return iter(range(0, len(self.source), 2))

    loader = DataLoader(ds, batch_size=2, sampler=EvensSampler(ds))
    got = np.concatenate([b[1] for b in loader])
    np.testing.assert_allclose(got, [0, 2, 4, 6, 8])


def test_accuracy_and_accumulator():
    logits = np.array([[2.0, 1.0], [0.0, 3.0], [1.0, 0.0]], np.float32)
    labels = np.array([0, 1, 1])
    assert accuracy(logits, labels) == 2.0
    onehot = np.eye(2, dtype=np.float32)[labels]
    assert accuracy(logits, onehot) == 2.0
    acc = Accumulator(2)
    acc.add(1, 2)
    acc.add(3, 4)
    assert acc[0] == 4 and acc[1] == 6
    acc.reset()
    assert acc[0] == 0


def test_evaluate_accuracy_runs():
    model = nn.Linear(4, 2, device="tpu")
    X = RNG.standard_normal((8, 4)).astype(np.float32)
    y = RNG.integers(0, 2, 8).astype(np.int32)
    loader = data_loader(X, y, batch_size=4)
    a = evaluate_accuracy(model, loader)
    assert 0.0 <= a <= 1.0
    assert df.is_grad_enable()  # restored


def test_checkpoint_roundtrip_with_buffers_and_adam(tmp_path):
    path = str(tmp_path / "ck.pkl")
    model = nn.Sequential(
        nn.Conv2d(1, 4, 3, padding=1, device="tpu"),
        nn.BatchNorm2d(4, device="tpu"),
        nn.Flatten(),
        nn.Linear(4 * 16, 2, device="tpu"),
    )
    opt = optim.Adam(model.parameters(), lr=0.01)
    crit = nn.CrossEntropyLoss()
    x = RNG.standard_normal((4, 1, 4, 4)).astype(np.float32)
    y = RNG.integers(0, 2, 4).astype(np.int32)
    for _ in range(2):
        loss = crit(model(Tensor(x, device="tpu")), Tensor(y, device="tpu"))
        opt.zero_grad()
        loss.backward()
        opt.step()
    save_checkpoint(model, opt, epoch=2, loss=float(loss.numpy()), save_path=path)

    model2 = nn.Sequential(
        nn.Conv2d(1, 4, 3, padding=1, device="tpu"),
        nn.BatchNorm2d(4, device="tpu"),
        nn.Flatten(),
        nn.Linear(4 * 16, 2, device="tpu"),
    )
    opt2 = optim.Adam(model2.parameters(), lr=0.5)
    info = load_checkpoint(model2, opt2, path)
    assert info["epoch"] == 2
    assert opt2.lr == 0.01
    for (n1, p1), (n2, p2) in zip(model.named_parameters(), model2.named_parameters()):
        np.testing.assert_allclose(p1.numpy(), p2.numpy(), rtol=1e-6, err_msg=n1)
    # BN running stats survived (reference dropped them)
    for (n1, b1), (n2, b2) in zip(model.named_buffers(), model2.named_buffers()):
        np.testing.assert_allclose(b1.numpy(), b2.numpy(), rtol=1e-6, err_msg=n1)
    # Adam moments restored -> next steps identical
    loss1 = crit(model(Tensor(x, device="tpu")), Tensor(y, device="tpu"))
    opt.zero_grad(); loss1.backward(); opt.step()
    loss2 = crit(model2(Tensor(x, device="tpu")), Tensor(y, device="tpu"))
    opt2.zero_grad(); loss2.backward(); opt2.step()
    for p1, p2 in zip(model.parameters(), model2.parameters()):
        np.testing.assert_allclose(p1.numpy(), p2.numpy(), rtol=1e-4, atol=1e-6)


def test_checkpoint_reference_layout(tmp_path):
    """The on-disk dict keeps the reference's key layout
    (`DeepFlows/utils/model_utils.py:37-74`)."""
    import pickle

    path = str(tmp_path / "ck.pkl")
    model = nn.Linear(3, 2, device="cpu")
    opt = optim.Adam(model.parameters())
    save_checkpoint(model, opt, epoch=1, loss=0.5, save_path=path)
    with open(path, "rb") as f:
        ck = pickle.load(f)
    assert set(ck) >= {"epoch", "loss", "model_parameters", "optimizer_state"}
    assert ck["optimizer_state"]["type"] == "Adam"
    assert "v" in ck["optimizer_state"] and "t" in ck["optimizer_state"]
    assert "weight" in ck["model_parameters"]


def test_image_folder_loader(tmp_path):
    from PIL import Image

    for cls in ("cat", "dog"):
        os.makedirs(tmp_path / cls)
        for i in range(2):
            Image.fromarray(
                RNG.integers(0, 255, (16, 16, 3), dtype=np.uint8), "RGB"
            ).save(tmp_path / cls / f"{i}.png")
    from deepflows_tpu.utils.data import load_image_folder

    x, y, classes = load_image_folder(str(tmp_path), size=(8, 8))
    assert x.shape == (4, 3, 8, 8)
    assert classes == ["cat", "dog"]
    assert x.max() <= 1.0
    np.testing.assert_array_equal(np.sort(y), [0, 0, 1, 1])


def test_model_configs():
    cfg = get_model_config("resnet18")
    assert cfg["block_config"] == [2, 2, 2, 2]
    assert get_model_config("vgg16")["layer_config"][0] == 64
    assert get_model_config("nope") is None


def test_transforms():
    from deepflows_tpu.utils.data import (
        Compose,
        Normalize,
        RandomCrop,
        RandomErasing,
        RandomHorizontalFlip,
    )

    x = RNG.standard_normal((8, 3, 32, 32)).astype(np.float32)
    flip = RandomHorizontalFlip(p=1.0, seed=0)
    np.testing.assert_allclose(flip(x), x[..., ::-1])
    crop = RandomCrop(32, padding=4, seed=0)
    out = crop(x)
    assert out.shape == x.shape
    erase = RandomErasing(p=1.0, seed=0)
    out = erase(x)
    assert (out == 0).sum() > 0
    norm = Normalize([0.5] * 3, [2.0] * 3)
    np.testing.assert_allclose(norm(x), (x - 0.5) / 2.0, rtol=1e-6)
    aug = Compose([flip, crop, erase])
    assert aug(x).shape == x.shape


def test_device_data_loader():
    from deepflows_tpu.utils.data import DeviceDataLoader

    X = np.arange(24, dtype=np.float32).reshape(12, 2)
    y = np.arange(12, dtype=np.int32)
    dl = DeviceDataLoader(data_loader(X, y, batch_size=4))
    batches = list(dl)
    assert len(batches) == 3 == len(dl)
    import jax

    assert isinstance(batches[0][0], jax.Array)
    np.testing.assert_allclose(np.asarray(batches[0][0]), X[:4])
    # composes with a compiled step
    from deepflows_tpu.jit import CompiledTrainStep

    model = nn.Linear(2, 3, device="tpu")
    opt = optim.SGD(model.parameters(), lr=0.01)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    for xb, yb in DeviceDataLoader(data_loader(X, y, batch_size=4)):
        loss = step(xb, yb)
    assert np.isfinite(float(loss))


def test_step_report():
    from deepflows_tpu.jit import CompiledTrainStep
    from deepflows_tpu.utils.profiling import step_report

    df.manual_seed(0)
    m = nn.Sequential(nn.Linear(8, 4, device="tpu"))
    step = CompiledTrainStep(m, optim.SGD(m.parameters(), lr=0.1), nn.CrossEntropyLoss())
    x = np.zeros((4, 8), np.float32)
    yv = np.zeros(4, np.int32)
    rep = step_report(step, x, yv)
    assert rep.get("flops_per_step", 0) > 0
    assert "summary" in rep


def test_async_checkpointer_snapshot_semantics(tmp_path):
    """AsyncCheckpointer.save captures the state AT THE CALL (reference
    snapshot of immutable arrays), even though training keeps stepping
    while the write is in flight; the file is byte-equivalent to a sync
    save taken at the same instant."""
    from deepflows_tpu.utils import AsyncCheckpointer

    apath = str(tmp_path / "async.pkl")
    spath = str(tmp_path / "sync.pkl")
    model = nn.Sequential(
        nn.Flatten(), nn.Linear(8, 8, device="tpu"), nn.ReLU(),
        nn.Linear(8, 2, device="tpu"),
    )
    opt = optim.Adam(model.parameters(), lr=0.05)
    crit = nn.CrossEntropyLoss()
    x = RNG.standard_normal((4, 8)).astype(np.float32)
    y = RNG.integers(0, 2, 4).astype(np.int32)

    def step():
        loss = crit(model(Tensor(x, device="tpu")), Tensor(y, device="tpu"))
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()
    with AsyncCheckpointer() as ck:
        save_checkpoint(model, opt, epoch=1, loss=0.5, save_path=spath)
        fut = ck.save(model, opt, epoch=1, loss=0.5, save_path=apath)
        for _ in range(3):
            step()  # mutate state while the async write is in flight
        assert fut.result(timeout=60) == apath
    import pickle

    with open(apath, "rb") as f:
        a = pickle.load(f)
    with open(spath, "rb") as f:
        s = pickle.load(f)
    assert a.keys() == s.keys()
    for n, arr in s["model_parameters"].items():
        np.testing.assert_array_equal(a["model_parameters"][n], arr, err_msg=n)
    for k in ("v", "s"):
        for av, sv in zip(a["optimizer_state"][k], s["optimizer_state"][k]):
            np.testing.assert_array_equal(av, sv)
    assert a["optimizer_state"]["t"] == s["optimizer_state"]["t"]
    # and the async file loads + resumes like any checkpoint
    model2 = nn.Sequential(
        nn.Flatten(), nn.Linear(8, 8, device="tpu"), nn.ReLU(),
        nn.Linear(8, 2, device="tpu"),
    )
    opt2 = optim.Adam(model2.parameters())
    info = load_checkpoint(model2, opt2, apath)
    assert info["epoch"] == 1 and opt2.lr == 0.05


def test_async_checkpointer_backpressure_and_atomicity(tmp_path):
    """max_pending bounds in-flight saves; every written file is complete
    (atomic rename — no .tmp leftovers)."""
    import os as _os

    from deepflows_tpu.utils import AsyncCheckpointer

    model = nn.Linear(4, 2, device="tpu")
    opt = optim.SGD(model.parameters(), lr=0.1)
    with AsyncCheckpointer(max_pending=1) as ck:
        for i in range(4):
            ck.save(model, opt, epoch=i, save_path=str(tmp_path / f"c{i}.pkl"))
    import pickle

    for i in range(4):
        with open(tmp_path / f"c{i}.pkl", "rb") as f:
            assert pickle.load(f)["epoch"] == i
    assert not [p for p in _os.listdir(tmp_path) if ".tmp." in p]
    with pytest.raises(ValueError):
        AsyncCheckpointer(max_pending=0)
