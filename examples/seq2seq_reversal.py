"""Encoder-decoder transformer on a toy translation-shaped task (no
reference analog — the reference zoo is CNN-only; this drives the
``models.Seq2SeqTransformer`` family end-to-end: bidirectional encoder,
cross-attention decoder, teacher-forced training through CompiledTrainStep,
and one-program KV-cache greedy generation).

The task is sequence reversal with a vocabulary remap (tgt[i] =
perm[src[L-1-i]]): the decoder must read the SOURCE through cross-attention
— a copy-through-self-attention shortcut cannot solve it.

    python seq2seq_reversal.py --epochs 15
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep

BOS = 0


def make_batch(rng, bs, vocab, length, perm):
    src = rng.integers(1, vocab, (bs, length)).astype(np.int64)
    tgt = perm[src[:, ::-1]]
    tgt_in = np.concatenate([np.full((bs, 1), BOS, np.int64), tgt[:, :-1]], 1)
    return np.concatenate([src, tgt_in], 1), tgt


def main(epochs=15, steps=60, batch_size=64, vocab=32, length=10, lr=3e-3):
    df.manual_seed(0)
    rng = np.random.default_rng(0)
    perm = np.concatenate([[0], rng.permutation(np.arange(1, vocab))])

    model = models.Seq2SeqTransformer(
        vocab_size=vocab, src_len=length, tgt_len=length, dim=128,
        enc_depth=2, dec_depth=2, num_heads=4, device="tpu",
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in model.parameters()
    )
    print(f"Seq2SeqTransformer: {n_params/1e6:.2f} M params")
    opt = optim.Adam(model.parameters(), lr=lr)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss())

    for ep in range(epochs):
        t0 = time.perf_counter()
        losses = []
        for _ in range(steps):
            x, y = make_batch(rng, batch_size, vocab, length, perm)
            losses.append(step(x, y))
        # exact-match accuracy via the KV-cache generator
        src = rng.integers(1, vocab, (64, length)).astype(np.int64)
        out = model.generate(src, length, bos_id=BOS)
        acc = float((out == perm[src[:, ::-1]]).all(1).mean())
        print(
            f"epoch {ep:2d}  loss {float(np.mean([float(l) for l in losses])):.4f}"
            f"  seq-exact {acc*100:5.1f}%  ({time.perf_counter()-t0:.1f}s)"
        )
        if acc == 1.0:
            print("task solved.")
            break

    src = rng.integers(1, vocab, (2, length)).astype(np.int64)
    out = model.generate(src, length, bos_id=BOS)
    for s, o in zip(src, out):
        print(f"src {s.tolist()} -> gen {o.tolist()} (want {perm[s[::-1]].tolist()})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()
    main(args.epochs, args.steps, args.batch_size, lr=args.lr)
