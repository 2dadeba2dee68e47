"""Text tooling for the LM families: byte-level BPE tokenizer (train /
encode / decode / save / load) and an LM dataset with sequence packing.

No reference analog (the reference zoo is CNN-only); shipped because the
transformer families (`models/transformer_lm.py`, `models/llama.py`,
`models/mixtral.py`, `models/seq2seq.py`) need a way to turn real text
into token ids.  Design follows GPT-2's byte-level BPE: the base
alphabet is all 256 bytes (no unknown-token escape hatch, lossless on
arbitrary input), merges are learned greedily by pair frequency.

TPU angle: tokenization is host-side by nature; what matters for the
chip is the OUTPUT SHAPE — ``LMDataset`` packs token streams into dense
(B, L+1) int32 blocks (next-token targets are the shifted view) so every
training batch is a full static-shape matmul load with zero padding
waste.
"""

from __future__ import annotations

import json
import os
from collections import Counter
from typing import Iterable, List, Sequence

import numpy as np

from .data.dataset import Dataset


class BPETokenizer:
    """Byte-level BPE.

    - ids 0..255 are the raw bytes; learned merges take ids 256+,
      special tokens are appended after the merges.
    - ``train(texts, vocab_size)`` learns merges greedily by pair count
      (ties break lexicographically for determinism).
    - ``encode``/``decode`` are exact inverses for any string.
    """

    def __init__(self, special_tokens: Sequence[str] = ("<pad>", "<eos>")):
        self.merges: dict[tuple[int, int], int] = {}
        self.special_tokens = list(special_tokens)
        self._special_ids: dict[str, int] = {}
        self._rebuild_specials()

    # ---------------------------------------------------------- properties
    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges) + len(self.special_tokens)

    def special_id(self, token: str) -> int:
        return self._special_ids[token]

    @property
    def pad_id(self) -> int:
        return self._special_ids.get("<pad>", -1)

    @property
    def eos_id(self) -> int:
        return self._special_ids.get("<eos>", -1)

    def _rebuild_specials(self):
        base = 256 + len(self.merges)
        self._special_ids = {
            t: base + i for i, t in enumerate(self.special_tokens)
        }

    # ------------------------------------------------------------ training
    def train(self, texts: Iterable[str], vocab_size: int) -> "BPETokenizer":
        """Learn ``vocab_size - 256 - len(special_tokens)`` merges."""
        n_merges = vocab_size - 256 - len(self.special_tokens)
        if n_merges < 0:
            raise ValueError(
                f"vocab_size {vocab_size} < base alphabet + specials"
            )
        # work on the corpus as one list of byte-id sequences
        seqs = [list(t.encode("utf-8")) for t in texts if t]
        self.merges = {}
        for _ in range(n_merges):
            counts: Counter = Counter()
            for seq in seqs:
                counts.update(zip(seq, seq[1:]))
            if not counts:
                break
            best_n = max(counts.values())
            pair = min(p for p, n in counts.items() if n == best_n)
            new_id = 256 + len(self.merges)
            self.merges[pair] = new_id
            seqs = [self._merge_once(seq, pair, new_id) for seq in seqs]
        self._rebuild_specials()
        return self

    @staticmethod
    def _merge_once(seq: List[int], pair, new_id: int) -> List[int]:
        out, i, n = [], 0, len(seq)
        a, b = pair
        while i < n:
            if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                out.append(new_id)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        return out

    # ------------------------------------------------------- encode/decode
    def encode(self, text: str, add_eos: bool = False) -> List[int]:
        seq = list(text.encode("utf-8"))
        # apply merges in learned order (lowest new id first): rank order
        # IS creation order, so one pass per learned merge id is exact BPE
        for pair, new_id in self.merges.items():
            if len(seq) < 2:
                break
            seq = self._merge_once(seq, pair, new_id)
        if add_eos and "<eos>" in self._special_ids:
            seq.append(self.eos_id)
        return seq

    def decode(self, ids: Sequence[int]) -> str:
        unmerge = {v: k for k, v in self.merges.items()}
        out_bytes: List[int] = []
        stack = list(ids)[::-1]
        specials = set(self._special_ids.values())
        while stack:
            i = int(stack.pop())
            if i in specials:
                continue
            if i < 256:
                out_bytes.append(i)
            else:
                a, b = unmerge[i]
                stack.append(b)
                stack.append(a)
        return bytes(out_bytes).decode("utf-8", errors="replace")

    def encode_batch(self, texts: Sequence[str], add_eos=False):
        return [self.encode(t, add_eos=add_eos) for t in texts]

    # ---------------------------------------------------------- persistence
    def save(self, path: str) -> str:
        payload = {
            "merges": [[a, b, i] for (a, b), i in self.merges.items()],
            "special_tokens": self.special_tokens,
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)  # atomic, like utils.model_utils saves
        return path

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            payload = json.load(f)
        tok = cls(special_tokens=payload["special_tokens"])
        tok.merges = {
            (a, b): i for a, b, i in payload["merges"]
        }
        tok._rebuild_specials()
        return tok


class SFTDataset(Dataset):
    """Supervised fine-tuning pairs: each (prompt, response) example
    becomes fixed-length ``(input_ids, labels)`` where labels are the
    next-token targets with PROMPT positions (and padding) set to
    ``ignore_index`` — pair with
    ``nn.CrossEntropyLoss(ignore_index=...)`` so the loss trains only the
    response tokens.

    Layout per example (right-padded to ``seq_len`` with pad_id):
    ``input = prompt + response(+eos)``, truncated to seq_len+1;
    ``labels[t] = input[t+1]`` for response positions, else ignore_index.
    """

    def __init__(self, pairs, tokenizer: BPETokenizer, seq_len: int,
                 ignore_index: int = -100):
        self.tokenizer = tokenizer
        self.seq_len = int(seq_len)
        self.ignore_index = int(ignore_index)
        pad = tokenizer.pad_id if tokenizer.pad_id >= 0 else 0
        xs, ys = [], []
        for prompt, response in pairs:
            p = tokenizer.encode(prompt)
            r = tokenizer.encode(response)
            if tokenizer.eos_id >= 0:
                r = r + [tokenizer.eos_id]
            toks = (p + r)[: self.seq_len + 1]
            if len(p) >= len(toks):  # response fully truncated away
                continue
            x = np.full(self.seq_len, pad, np.int64)
            y = np.full(self.seq_len, self.ignore_index, np.int64)
            n = len(toks) - 1
            x[:n] = toks[:-1]
            # labels: next token, only where the PREDICTED token is part
            # of the response (positions len(p)-1 .. n-1 predict toks[len(p)..])
            lo = len(p) - 1
            y[lo:n] = toks[lo + 1 : n + 1]
            xs.append(x)
            ys.append(y)
        if not xs:
            raise ValueError("no usable (prompt, response) pairs")
        self.inputs = np.stack(xs)
        self.labels = np.stack(ys)

    def __len__(self):
        return len(self.inputs)

    def __getitem__(self, idx):
        return self.inputs[idx], self.labels[idx]


class LMDataset(Dataset):
    """Next-token LM dataset over a packed token stream.

    Documents are concatenated (an ``<eos>`` id between them when the
    tokenizer has one) into one contiguous stream, then cut into
    non-overlapping (seq_len + 1) windows; ``__getitem__`` returns
    ``(input_ids, target_ids)`` — the window's first/last ``seq_len``
    tokens.  Dense static shapes, zero padding: the TPU batch is always
    full.
    """

    def __init__(self, texts: Sequence[str], tokenizer: BPETokenizer,
                 seq_len: int):
        self.tokenizer = tokenizer
        self.seq_len = int(seq_len)
        stream: List[int] = []
        eos = tokenizer.eos_id
        for t in texts:
            stream.extend(tokenizer.encode(t))
            if eos >= 0:
                stream.append(eos)
        n_windows = (len(stream) - 1) // self.seq_len
        if n_windows < 1:
            raise ValueError(
                f"corpus too small: {len(stream)} tokens < seq_len+1"
            )
        used = n_windows * self.seq_len + 1
        self.tokens = np.asarray(stream[:used], dtype=np.int32)
        self._n = n_windows

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, idx: int):
        lo = idx * self.seq_len
        window = self.tokens[lo : lo + self.seq_len + 1]
        return window[:-1].astype(np.int64), window[1:].astype(np.int64)
