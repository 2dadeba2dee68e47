"""LoRA fine-tuning workflow: pretrain a small LlamaLM on one corpus,
freeze it, adapt ONLY rank-r adapters on the attention projections to a
second corpus, then merge for deployment.

No reference analog.  Demonstrates the full loop: apply_lora (exact
identity at init) -> adapter-only Adam -> adapter-only checkpoint (a few
kB next to the MB-scale model) -> merge_lora -> KV-cache generation from
the merged model.

    python lora_finetune.py --pretrain-epochs 6 --adapt-epochs 6
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


def md_corpus():
    """Docs split by style: prose-heavy files vs table/inventory files —
    two distributions over the same vocabulary."""
    base, adapt = [], []
    for path in sorted(glob.glob(os.path.join(REPO, "*.md"))) + sorted(
        glob.glob(os.path.join(REPO, "docs", "*.md"))
    ):
        with open(path, errors="replace") as f:
            text = f.read()
        # table-heavy docs (the parity/verdict inventories) = adapt target
        (adapt if text.count("|") > 200 else base).append(text)
    return base, adapt


def run_epochs(step, ds, epochs, batch_size, tag):
    idx = np.arange(len(ds))
    rng = np.random.default_rng(0)
    loss = float("nan")
    for ep in range(epochs):
        t0 = time.perf_counter()
        rng.shuffle(idx)
        losses = []
        for lo in range(0, len(idx) - batch_size + 1, batch_size):
            rows = idx[lo : lo + batch_size]
            xs = np.stack([ds[i][0] for i in rows])
            ys = np.stack([ds[i][1] for i in rows])
            losses.append(step(xs, ys))
        loss = float(np.mean([float(l) for l in losses]))
        print(f"{tag} epoch {ep:2d}  loss {loss:.4f}  "
              f"({time.perf_counter()-t0:.1f}s)")
    return loss


def main(pretrain_epochs=6, adapt_epochs=6, seq_len=64, batch_size=32,
         rank=8):
    base_texts, adapt_texts = md_corpus()
    tok = BPETokenizer().train(base_texts + adapt_texts, vocab_size=512)
    ds_base = LMDataset(base_texts, tok, seq_len=seq_len)
    ds_adapt = LMDataset(adapt_texts, tok, seq_len=seq_len)
    print(f"base {len(ds_base)} windows, adapt {len(ds_adapt)} windows")

    df.manual_seed(0)
    lm = models.LlamaLM(vocab_size=tok.vocab_size, max_len=seq_len, dim=128,
                        depth=4, num_heads=4, num_kv_heads=2, device="tpu")
    n = sum(int(np.prod(p.shape)) for p in lm.parameters())

    opt = optim.Muon(lm.parameters(), lr=0.02, adamw_lr=3e-3)
    step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss())
    run_epochs(step, ds_base, pretrain_epochs, batch_size, "pretrain")

    # ----- adapt: freeze the model, train rank-r adapters on q/v/o ------
    adapters = nn.apply_lora(lm, r=rank, alpha=2 * rank,
                             target=["q_proj", "v_proj", "out_proj"])
    n_adapt = sum(int(np.prod(p.shape)) for p in adapters)
    print(f"LoRA: {len(adapters)} adapter tensors, "
          f"{n_adapt/1e3:.1f}k trainable of {n/1e6:.2f}M "
          f"({100*n_adapt/n:.2f}%)")
    aopt = optim.Adam(adapters, lr=1e-3)
    astep = CompiledTrainStep(lm, aopt, nn.CrossEntropyLoss())
    run_epochs(astep, ds_adapt, adapt_epochs, batch_size, "adapt   ")

    sd = nn.lora_state_dict(lm)
    nbytes = sum(v.nbytes for v in sd.values())
    print(f"adapter checkpoint: {len(sd)} tensors, {nbytes/1e3:.1f} kB "
          f"(model is {n*4/1e6:.1f} MB)")

    nn.merge_lora(lm)  # deployment: adapter matmuls disappear
    dec = models.KVCacheDecoder(lm)
    prompt = "| Optimizers |"
    ids = np.asarray([tok.encode(prompt)], np.int64)
    out = dec.generate(ids, 32, temperature=0.7, top_k=40, seed=3)
    print("\nprompt:", prompt)
    print("merged-model continuation:", tok.decode(out[0, ids.shape[1]:]))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain-epochs", type=int, default=6)
    ap.add_argument("--adapt-epochs", type=int, default=6)
    ap.add_argument("--rank", type=int, default=8)
    args = ap.parse_args()
    main(args.pretrain_epochs, args.adapt_epochs, rank=args.rank)
