"""Mixtral-style sparse-MoE decoder LM: the Llama attention recipe
(RMSNorm, RoPE, GQA) with a top-2-routed mixture of SwiGLU experts as the
FFN (arXiv:2401.04088).  No reference analog — this extends the zoo's
modern-LM coverage the way `models.llama` did.

Everything is tape ops: trains through ``CompiledTrainStep`` /
``ShardedTrainStep`` (use ``nn.MoECriterion`` to add the Switch aux +
router z losses from every MoE layer), shards with
``parallel.expert_parallel_rules`` (the stacked ``experts_*`` tensors are
3-D, so the existing EP rules apply unchanged), and serves through
``models.KVCacheDecoder`` (the Mixtral decoder subclass keeps the
GQA-narrow KV cache and computes ALL experts densely per decode step —
at decode batch sizes the expert matmuls are tiny and the top-2 combine
masks the rest, the standard TPU trade for small E).
"""

from __future__ import annotations

from .. import nn
from ..backend import Device, default_accelerator
from .transformer_lm import _pad_greedy_generate


class MixtralBlock(nn.Module):
    """Pre-norm block: x + GQA-Attn(RMSNorm(x)); x + MoE(RMSNorm(x)) with
    top-2 renormalised routing over SwiGLU experts."""

    def __init__(
        self, dim, num_heads, num_kv_heads, hidden, n_experts, top_k,
        device=None, remat=False, flash=None, rope_theta=10000.0,
    ):
        super().__init__()
        self.norm1 = nn.RMSNorm(dim, device=device)
        self.attn = nn.MultiheadAttention(
            dim, num_heads, bias=False, causal=True, device=device,
            flash=flash, num_kv_heads=num_kv_heads, rope=True,
            rope_theta=rope_theta,
        )
        self.norm2 = nn.RMSNorm(dim, device=device)
        self.moe = nn.MoE(
            dim, hidden, n_experts, top_k=top_k, swiglu=True, device=device
        )
        self._remat = remat

    def forward(self, x):
        if self._remat:
            return nn.remat_call(self, x, self._forward_impl)
        return self._forward_impl(x)

    def _forward_impl(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.moe(self.norm2(x))


class MixtralLM(nn.Module):
    def __init__(
        self,
        vocab_size: int,
        max_len: int = 128,
        dim: int = 128,
        depth: int = 4,
        num_heads: int = 4,
        num_kv_heads=None,
        n_experts: int = 8,
        top_k: int = 2,
        mlp_ratio: float = 8 / 3,
        rope_theta: float = 10000.0,
        device=None,
        remat: bool = False,
        flash=None,
    ):
        super().__init__()
        Device(device) if device else default_accelerator()
        if num_kv_heads is None:
            num_kv_heads = num_heads
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.n_experts = n_experts
        self.top_k = top_k
        self.tok_embed = nn.Embedding(vocab_size, dim, device=device)
        hidden = int(dim * mlp_ratio)
        self.blocks = nn.Sequential(
            *[
                MixtralBlock(
                    dim, num_heads, num_kv_heads, hidden, n_experts, top_k,
                    device=device, remat=remat, flash=flash,
                    rope_theta=rope_theta,
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
        """Greedy decoding via the padded full-forward path — the
        equivalence oracle for ``KVCacheDecoder``; use the decoder for
        real serving."""
        return _pad_greedy_generate(self, idx, new_tokens)
