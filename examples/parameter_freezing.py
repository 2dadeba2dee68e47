"""Parameter-freezing strategies (reference:
`test/ResNet18_parameter_freezing_test.py:100-170`): freeze `none`,
`all_but_fc`, or `partial` by toggling requires_grad, with trainable-param
accounting, then train briefly to show only unfrozen weights move."""

from __future__ import annotations

import argparse

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep


def apply_freeze_strategy(model, strategy: str):
    if strategy == "none":
        model.requires_grad_(True)
    elif strategy == "all_but_fc":
        model.requires_grad_(False)
        model.fc.requires_grad_(True)
    elif strategy == "partial":  # freeze stem + layer1/2, train layer3/4 + fc
        model.requires_grad_(True)
        model.conv1.requires_grad_(False)
        model.bn1.requires_grad_(False)
        model.layer1.requires_grad_(False)
        model.layer2.requires_grad_(False)
    else:
        raise ValueError(strategy)
    trainable = [(n, p) for n, p in model.named_parameters() if p.requires_grad]
    total = sum(p.size for _, p in model.named_parameters())
    t_count = sum(p.size for _, p in trainable)
    print(
        f"strategy={strategy}: trainable {t_count}/{total} params "
        f"({100.0 * t_count / total:.1f}%), {len(trainable)} tensors"
    )
    return [p for _, p in trainable]


def main(strategy="all_but_fc", steps=5, device="tpu"):
    df.manual_seed(0)
    model = models.ResNet18(num_classes=5, small_input=True, device=device)
    trainable = apply_freeze_strategy(model, strategy)
    frozen_before = {
        n: p.numpy().copy()
        for n, p in model.named_parameters()
        if not p.requires_grad
    }
    opt = optim.Adam(trainable, lr=1e-2)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())
    rng = np.random.default_rng(0)
    for i in range(steps):
        x = rng.standard_normal((16, 3, 32, 32)).astype(np.float32)
        y = rng.integers(0, 5, 16).astype(np.int32)
        loss = step(x, y)
        print(f"step {i}: loss={float(loss):.4f}")
    for n, before in frozen_before.items():
        now = dict(model.named_parameters())[n].numpy()
        assert np.allclose(before, now), f"frozen param {n} moved!"
    print("frozen parameters verified unchanged")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--strategy", default="all_but_fc", choices=["none", "all_but_fc", "partial"])
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args()
    main(args.strategy, args.steps)
