"""ResNet18 CIFAR-10 transfer learning (reference:
`test/ResNet_CIFAR10_transfer_learning.py`): load pretrained imagenet
weights (converted from a torch state_dict), swap the stem + fc for
32×32/10-class, optionally freeze the backbone, WarmupCosine LR."""

from __future__ import annotations

import argparse

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledEvalStep, CompiledTrainStep
from deepflows_tpu.utils.data import data_loader
from deepflows_tpu.utils.pretrained_models import (
    get_pretrained_weights,
    is_pretrained_available,
)

from common import EpochTimer, get_cifar10, mean_loss, random_flip


def build_model(device="tpu", pretrained_dir=None, freeze_backbone=False):
    model = models.ResNet18(num_classes=10, small_input=True, device=device)
    if pretrained_dir and is_pretrained_available("resnet18", pretrained_dir):
        weights = get_pretrained_weights("resnet18", pretrained_dir, auto_download=False)
        # stem (7x7) and fc (1000-way) don't fit the 32x32/10-class model:
        # drop them, like the reference swaps those layers (`:196-206`)
        weights = {
            k: v
            for k, v in weights.items()
            if not k.startswith(("conv1.", "fc."))
        }
        missing, unexpected = model.load_weights(weights)
        print(f"loaded pretrained backbone (missing={len(missing)}, unexpected={len(unexpected)})")
    else:
        print("no converted pretrained weights found; training from scratch")
    if freeze_backbone:
        model.requires_grad_(False)
        model.fc.requires_grad_(True)
    return model


def main(
    data_dir=None,
    pretrained_dir=None,
    epochs=10,
    batch_size=128,
    lr=1e-3,
    freeze_backbone=False,
    device="tpu",
    limit=None,
):
    df.manual_seed(0)
    x_train, y_train, x_test, y_test = get_cifar10(data_dir, limit=limit)
    model = build_model(device, pretrained_dir, freeze_backbone)
    trainable = [p for p in model.parameters() if p.requires_grad]
    opt = optim.Adam(trainable, lr=lr, weight_decay=1e-4)
    sch = optim.WarmupCosineLR(opt, warmup_epochs=2, T_max=epochs)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    eval_step = CompiledEvalStep(model)

    rng = np.random.default_rng(0)
    timer = EpochTimer()
    best = 0.0
    for epoch in range(epochs):
        losses = [
            step(random_flip(xb, rng), yb)
            for xb, yb in data_loader(x_train, y_train, batch_size, shuffle=True, drop_last=True)
        ]
        sch.step()
        correct = total = 0
        for xb, yb in data_loader(x_test, y_test, batch_size):
            pred = np.asarray(eval_step(xb)).argmax(1)
            correct += int((pred == yb).sum())
            total += len(yb)
        acc = 100.0 * correct / total
        best = max(best, acc)
        timer.epoch_done(epoch, loss=mean_loss(losses), test_acc=acc)
    timer.total()
    print(f"best test accuracy: {best:.2f}%")
    return best


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--pretrained-dir", default=None)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--freeze-backbone", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()
    main(
        args.data_dir,
        args.pretrained_dir,
        args.epochs,
        freeze_backbone=args.freeze_backbone,
        limit=args.limit,
    )
