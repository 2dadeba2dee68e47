"""Char-level decoder-only LM (no reference analog — drives the round-2
sequence stack end-to-end: Embedding, causal MultiheadAttention, LayerNorm,
sequence CrossEntropyLoss, greedy generate).

Trains on a built-in pangram corpus (or --text-file) and prints greedy
continuations every few epochs.

    python transformer_lm_train.py --epochs 20
"""

from __future__ import annotations

import argparse

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep

CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "pack my box with five dozen liquor jugs. "
    "how vexingly quick daft zebras jump. "
    "sphinx of black quartz, judge my vow. "
) * 8


def main(epochs=20, batch_size=32, seq_len=32, lr=3e-3, text_file=None):
    text = open(text_file).read() if text_file else CORPUS
    chars = sorted(set(text))
    stoi = {c: i for i, c in enumerate(chars)}
    itos = {i: c for c, i in stoi.items()}
    data = np.array([stoi[c] for c in text], np.int32)
    V = len(chars)
    print(f"corpus: {len(text)} chars, vocab {V}")

    df.manual_seed(0)
    lm = models.TransformerLM(
        vocab_size=V, max_len=seq_len, dim=128, depth=4, num_heads=4,
        device="tpu",
    )
    opt = optim.AdamW(lm.parameters(), lr=lr, weight_decay=1e-2)
    sched = optim.CosineAnnealingLR(opt, T_max=epochs)
    step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss())

    rng = np.random.default_rng(0)
    steps_per_epoch = max(1, len(data) // (batch_size * seq_len))
    import time

    import jax

    for epoch in range(epochs):
        t0 = time.time()
        losses = []
        for _ in range(steps_per_epoch):
            starts = rng.integers(0, len(data) - seq_len - 1, batch_size)
            x = np.stack([data[s : s + seq_len] for s in starts])
            y = np.stack([data[s + 1 : s + seq_len + 1] for s in starts])
            losses.append(step(x, y))
        sched.step()
        loss = float(np.mean(jax.device_get(losses)))
        dt = time.time() - t0
        if epoch % 5 == 0 or epoch == epochs - 1:
            prompt = "the quick brown "
            idx = np.array([[stoi[c] for c in prompt]], np.int32)
            out = lm.generate(idx, 24)
            cont = "".join(itos[int(i)] for i in out[0])
            print(f"epoch {epoch}: loss={loss:.4f} time={dt:.2f}s  |{cont}|")
        else:
            print(f"epoch {epoch}: loss={loss:.4f} time={dt:.2f}s")
    return loss


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--text-file", default=None)
    args = p.parse_args()
    main(args.epochs, args.batch_size, args.seq_len, args.lr, args.text_file)
