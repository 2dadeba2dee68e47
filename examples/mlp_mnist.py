"""MLP on MNIST (reference: `test/MLP_MNIST.py` / `MLP_MNIST_cuda.py`):
784→100→20→10 ReLU MLP, CrossEntropy, Adam.  ``--compiled`` (default) runs
the whole-step XLA path; ``--eager`` runs the per-op tape like the
reference."""

from __future__ import annotations

import argparse

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import Tensor, models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu.utils import evaluate_accuracy
from deepflows_tpu.utils.data import data_loader

from common import EpochTimer, get_mnist, mean_loss


def main(device="tpu", epochs=5, batch_size=256, lr=1e-3, compiled=True, limit=None):
    df.manual_seed(0)
    x_train, y_train, x_test, y_test = get_mnist(limit=limit, flat=True)
    model = models.MLP(device=device)
    optimizer = optim.Adam(model.parameters(), lr=lr)
    criterion = nn.CrossEntropyLoss()
    step = CompiledTrainStep(model, optimizer, criterion) if compiled else None

    timer = EpochTimer()
    for epoch in range(epochs):
        model.train()
        losses = []
        loader = data_loader(x_train, y_train, batch_size, shuffle=True, drop_last=compiled)
        for xb, yb in loader:
            if compiled:
                losses.append(step(xb, yb))
            else:
                out = model(Tensor(xb, device=device))
                loss = criterion(out, Tensor(yb, device=device))
                optimizer.zero_grad()
                loss.backward()
                optimizer.step()
                losses.append(float(loss.numpy()))
        acc = evaluate_accuracy(model, data_loader(x_test, y_test, batch_size))
        model.train()
        timer.epoch_done(epoch, loss=mean_loss(losses), test_acc=acc)
    timer.total()
    return acc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="tpu")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--eager", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()
    main(args.device, args.epochs, args.batch_size, compiled=not args.eager, limit=args.limit)
