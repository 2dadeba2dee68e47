"""MNIST CNN workload (reference: `test/CNN_MNIST.py` / `CNN_MNIST_cuda.py`):
MNIST_CNN, Adam lr .001, bs 64."""

from __future__ import annotations

import argparse

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledEvalStep, CompiledTrainStep
from deepflows_tpu.utils.data import data_loader

from common import EpochTimer, get_mnist, mean_loss


def main(device="tpu", epochs=3, batch_size=64, lr=1e-3, limit=None):
    df.manual_seed(0)
    x_train, y_train, x_test, y_test = get_mnist(limit=limit)
    model = models.MNIST_CNN(device=device)
    optimizer = optim.Adam(model.parameters(), lr=lr)
    step = CompiledTrainStep(model, optimizer, nn.CrossEntropyLoss())
    eval_step = CompiledEvalStep(model)

    timer = EpochTimer()
    acc = 0.0
    for epoch in range(epochs):
        losses = [
            step(xb, yb)
            for xb, yb in data_loader(x_train, y_train, batch_size, shuffle=True, drop_last=True)
        ]
        correct = total = 0
        for xb, yb in data_loader(x_test, y_test, batch_size):
            pred = np.asarray(eval_step(xb)).argmax(1)
            correct += int((pred == yb).sum())
            total += len(yb)
        acc = 100.0 * correct / total
        timer.epoch_done(epoch, loss=mean_loss(losses), test_acc=acc)
    timer.total()
    return acc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="tpu")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()
    main(args.device, args.epochs, args.batch_size, limit=args.limit)
