"""Checkpoint save/load mid-training (reference:
`test/CNN_CIFAR10_cuda_model_save_load_test.py`): train, save, reload into a
fresh model+optimizer, verify continued training is bit-compatible."""

from __future__ import annotations

import os
import tempfile

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu.utils import load_checkpoint, save_checkpoint

from common import get_cifar10


def main(device="tpu"):
    df.manual_seed(0)
    x, y, *_ = get_cifar10(limit=256)
    xb, yb = x[:64], y[:64]

    model = models.CIFAR10_CNN(device=device)
    opt = optim.Adam(model.parameters(), lr=1e-3)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    for i in range(3):
        loss = step(xb, yb)
    print(f"pre-save loss: {float(loss):.4f}")

    path = os.path.join(tempfile.mkdtemp(), "ck.pkl")
    save_checkpoint(model, opt, epoch=3, loss=float(loss), save_path=path)

    model2 = models.CIFAR10_CNN(device=device)
    opt2 = optim.Adam(model2.parameters(), lr=1e-3)
    info = load_checkpoint(model2, opt2, path)
    print(f"resumed from epoch {info['epoch']} loss {info['loss']:.4f}")

    # deterministic comparison: eval logits must be identical (train-mode
    # losses would differ by the dropout PRNG stream position, which is
    # per-process state, not checkpoint state)
    from deepflows_tpu.jit import CompiledEvalStep

    out1 = np.asarray(CompiledEvalStep(model)(xb))
    out2 = np.asarray(CompiledEvalStep(model2)(xb))
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-6)
    # Adam moments restored exactly
    for a, b in zip(opt._state["v"], opt2._state["v"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert int(opt2._state["t"]) == int(opt._state["t"])
    print("save/load round-trip verified")


if __name__ == "__main__":
    main()
