"""Llama-family decoder-only LM: RMSNorm, rotary positions (RoPE),
grouped-query attention (GQA) and a SwiGLU MLP — the modern pre-norm recipe
(no reference analog; the reference zoo is CNN-only and ``TransformerLM``
covers the GPT-2-style recipe).  Every layer is tape ops, so the model
trains through ``CompiledTrainStep``/``ShardedTrainStep`` and decodes
through ``models.KVCacheDecoder`` (which dispatches on the architecture and
keeps the KV cache at ``num_kv_heads`` width — the GQA serving win).

Differential-tested against a hand-built torch twin
(tests/test_llama.py); all linear layers are bias-free per the Llama
convention.
"""

from __future__ import annotations

from .. import nn
from ..backend import Device, default_accelerator
from .transformer_lm import _pad_greedy_generate


class LlamaBlock(nn.Module):
    """Pre-norm block: x + Attn(RMSNorm(x)); x + SwiGLU(RMSNorm(x)).
    SwiGLU MLP: ``down(silu(gate(x)) * up(x))``, hidden width
    ``int(dim * mlp_ratio)`` (callers pass the 8/3-style ratio already
    resolved)."""

    def __init__(
        self, dim, num_heads, num_kv_heads, hidden, device=None,
        remat=False, flash=None, rope_theta=10000.0, window=None,
    ):
        super().__init__()
        self.norm1 = nn.RMSNorm(dim, device=device)
        self.attn = nn.MultiheadAttention(
            dim, num_heads, bias=False, causal=True, device=device,
            flash=flash, num_kv_heads=num_kv_heads, rope=True,
            rope_theta=rope_theta, window=window,
        )
        self.norm2 = nn.RMSNorm(dim, device=device)
        self.gate = nn.Linear(dim, hidden, bias=False, device=device)
        self.up = nn.Linear(dim, hidden, bias=False, device=device)
        self.down = nn.Linear(hidden, dim, bias=False, device=device)
        self.act = nn.SiLU()
        self._remat = remat

    def forward(self, x):
        if self._remat:
            return nn.remat_call(self, x, self._forward_impl)
        return self._forward_impl(x)

    def _forward_impl(self, x):
        x = x + self.attn(self.norm1(x))
        h = self.norm2(x)
        return x + self.down(self.act(self.gate(h)) * self.up(h))


class LlamaLM(nn.Module):
    def __init__(
        self,
        vocab_size: int,
        max_len: int = 128,
        dim: int = 128,
        depth: int = 4,
        num_heads: int = 4,
        num_kv_heads=None,
        mlp_ratio: float = 8 / 3,
        rope_theta: float = 10000.0,
        device=None,
        remat: bool = False,
        flash=None,
        window=None,
    ):
        super().__init__()
        Device(device) if device else default_accelerator()
        if num_kv_heads is None:
            num_kv_heads = num_heads
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.tok_embed = nn.Embedding(vocab_size, dim, device=device)
        hidden = int(dim * mlp_ratio)
        self.blocks = nn.Sequential(
            *[
                LlamaBlock(
                    dim, num_heads, num_kv_heads, hidden, device=device,
                    remat=remat, flash=flash, rope_theta=rope_theta,
                    window=window,
                )
                for _ in range(depth)
            ]
        )
        self.norm = nn.RMSNorm(dim, device=device)
        self.head = nn.Linear(dim, vocab_size, bias=False, device=device)

    def forward(self, idx):
        # idx: (B, L) int tokens -> (B, L, vocab) logits
        x = self.tok_embed(idx)
        if x.shape[1] > self.max_len:
            raise ValueError(
                f"sequence length {x.shape[1]} > max_len {self.max_len}"
            )
        x = self.blocks(x)
        x = self.norm(x)
        return self.head(x)

    def generate(self, idx, new_tokens: int):
        """Greedy decoding via the padded full-forward path (one compiled
        shape) — the equivalence oracle for ``KVCacheDecoder``; use the
        decoder for real serving."""
        return _pad_greedy_generate(self, idx, new_tokens)
