"""LinearRegression workload (reference: `test/LinearRegression.py`).

One Linear layer + MSELoss + Adam fitting y = 3x + 5, on the eager tape API
(the reference runs 100k epochs on CPU; the fit converges in far fewer)."""

from __future__ import annotations

import argparse

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import Tensor, nn, optim


def main(device="cpu", epochs=2000, lr=0.05):
    df.manual_seed(0)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (256, 1)).astype(np.float32)
    y = 3.0 * x + 5.0 + rng.standard_normal((256, 1)).astype(np.float32) * 0.01

    model = nn.Linear(1, 1, device=device)
    criterion = nn.MSELoss()
    optimizer = optim.Adam(model.parameters(), lr=lr, weight_decay=0.001)

    for epoch in range(epochs):
        pred = model(Tensor(x, device=device))
        loss = criterion(pred, Tensor(y, device=device))
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        if epoch % 500 == 0:
            print(f"epoch {epoch}: loss={float(loss.numpy()):.6f}")

    w = float(model.weight.numpy().ravel()[0])
    b = float(model.bias.numpy().ravel()[0])
    print(f"fitted: y = {w:.3f}x + {b:.3f} (target 3x + 5)")
    return w, b


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="cpu")
    p.add_argument("--epochs", type=int, default=2000)
    args = p.parse_args()
    main(args.device, args.epochs)
