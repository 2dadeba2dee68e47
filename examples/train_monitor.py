"""Training with device-memory monitoring (reference:
`test/CNN_Dishes_cuda_gpu_monitor.py`: pynvml per-epoch max-GPU-memory +
checkpoint resume).  TPU analog: jax device memory_stats per epoch, persisted
into the checkpoint's extra info."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu.utils import load_checkpoint, save_checkpoint
from deepflows_tpu.utils.data import data_loader

from common import EpochTimer, get_cifar10, mean_loss


def device_memory_mb():
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return stats.get("bytes_in_use", 0) / 1e6
    except Exception:
        return 0.0


def main(epochs=3, batch_size=64, checkpoint="/tmp/dishes_monitor_ck.pkl", limit=1024):
    df.manual_seed(0)
    x_train, y_train, *_ = get_cifar10(limit=limit)
    model = models.CIFAR10_CNN(device="tpu")
    opt = optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)

    start_epoch = 0
    if os.path.exists(checkpoint):  # resume (reference `:162-168`)
        info = load_checkpoint(model, opt, checkpoint)
        start_epoch = info["epoch"] + 1
        print(f"resumed from epoch {info['epoch']}")

    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    timer = EpochTimer()
    mem_usage = []
    for epoch in range(start_epoch, epochs):
        losses = [
            step(xb, yb)
            for xb, yb in data_loader(x_train, y_train, batch_size, shuffle=True, drop_last=True)
        ]
        mem = device_memory_mb()
        mem_usage.append(mem)
        loss = mean_loss(losses)
        timer.epoch_done(epoch, loss=loss, device_mem_mb=mem)
        save_checkpoint(
            model, opt, epoch, loss, checkpoint,
            extra={"device_memory_usage": mem_usage},
        )
    timer.total()
    print(f"max device memory: {max(mem_usage or [0]):.1f} MB")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--limit", type=int, default=1024)
    args = p.parse_args()
    main(args.epochs, limit=args.limit)
