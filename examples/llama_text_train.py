"""End-to-end LLM workflow on real text: byte-level BPE -> packed LM
windows -> LlamaLM (RMSNorm/RoPE/GQA/SwiGLU) trained with Muon ->
KV-cache greedy generation -> detokenized text.

No reference analog (the reference zoo is CNN-only).  The corpus is this
repository's own markdown docs — real English text available offline —
so the demo is fully self-contained.

    python llama_text_train.py --epochs 10
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models, nn, optim
from deepflows_tpu.jit import CompiledTrainStep
from deepflows_tpu.utils.text import BPETokenizer, LMDataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_corpus():
    texts = []
    for path in sorted(glob.glob(os.path.join(REPO, "*.md"))) + sorted(
        glob.glob(os.path.join(REPO, "docs", "*.md"))
    ):
        with open(path, errors="replace") as f:
            texts.append(f.read())
    return texts


def main(epochs=10, seq_len=64, batch_size=32, vocab=512, lr=0.02,
         optimizer="muon"):
    texts = load_corpus()
    n_chars = sum(len(t) for t in texts)
    print(f"corpus: {len(texts)} docs, {n_chars/1e3:.0f}k chars")

    tok = BPETokenizer().train(texts, vocab_size=vocab)
    ds = LMDataset(texts, tok, seq_len=seq_len)
    print(f"tokenizer: vocab {tok.vocab_size}; dataset: {len(ds)} windows "
          f"of {seq_len} ({len(ds)*seq_len/1e3:.0f}k tokens packed)")

    df.manual_seed(0)
    lm = models.LlamaLM(vocab_size=tok.vocab_size, max_len=seq_len, dim=128,
                        depth=4, num_heads=4, num_kv_heads=2, device="tpu")
    n_params = sum(int(np.prod(p.shape)) for p in lm.parameters())
    print(f"LlamaLM: {n_params/1e6:.2f} M params, optimizer={optimizer}")
    opts = {
        "muon": lambda p: optim.Muon(p, lr=lr, adamw_lr=3e-3),
        "adam": lambda p: optim.Adam(p, lr=3e-3),
        "adafactor": lambda p: optim.Adafactor(p, lr=lr),
        "lion": lambda p: optim.Lion(p, lr=lr / 30),
    }
    opt = opts[optimizer](lm.parameters())
    step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss())

    idx = np.arange(len(ds))
    rng = np.random.default_rng(0)
    for ep in range(epochs):
        t0 = time.perf_counter()
        rng.shuffle(idx)
        losses = []
        for lo in range(0, len(idx) - batch_size + 1, batch_size):
            rows = idx[lo : lo + batch_size]
            xs = np.stack([ds[i][0] for i in rows])
            ys = np.stack([ds[i][1] for i in rows])
            losses.append(step(xs, ys))
        mean = float(np.mean([float(l) for l in losses]))
        print(f"epoch {ep:2d}  loss {mean:.4f}  ppl {np.exp(mean):7.1f}"
              f"  ({time.perf_counter()-t0:.1f}s)")

    # generate: prompt with a doc prefix, continue via the KV-cache decoder
    prompt = "## Architecture"
    ids = np.asarray([tok.encode(prompt)], np.int64)
    dec = models.KVCacheDecoder(lm)
    n_gen = min(48, seq_len - ids.shape[1])
    out = dec.generate(ids, n_gen, temperature=0.8, top_k=40, seed=1)
    print("\nprompt:", prompt)
    print("continuation:", tok.decode(out[0, ids.shape[1]:]))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--vocab", type=int, default=512)
    ap.add_argument("--optimizer", default="muon",
                    choices=["muon", "adam", "adafactor", "lion"])
    args = ap.parse_args()
    main(args.epochs, args.seq_len, args.batch_size, args.vocab,
         optimizer=args.optimizer)
