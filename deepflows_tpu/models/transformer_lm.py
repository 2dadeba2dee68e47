"""Decoder-only transformer language model (no reference analog — the
reference zoo is CNN-only; this completes the sequence-model story the
round-2 layers enable: Embedding lookup, causal MultiheadAttention,
LayerNorm, GELU MLP — all tape ops, so the LM trains through
``CompiledTrainStep``/``ShardedTrainStep`` like the rest of the zoo, and
its blocks pipeline (buffer-free, shape-preserving)."""

from __future__ import annotations

from .. import nn, tensor
from ..backend import Device, default_accelerator
from ..nn.parameter import Parameter
from .vit import EncoderBlock


def _pad_greedy_generate(model, idx, new_tokens: int):
    """Greedy autoregressive decoding for any causal LM with ``max_len``
    and ``tok_embed``: append ``new_tokens`` tokens to the (B, L) int
    prompt.  Pads to ``max_len`` so every step reuses ONE compiled shape
    (no per-length retrace); causal masking makes the pad inert."""
    import numpy as np

    from ..autograd import no_grad
    from ..tensor import Tensor

    was_training = model.training
    model.eval()
    try:
        idx = np.asarray(idx)
        for _ in range(new_tokens):
            L = idx.shape[1]
            if L >= model.max_len:
                ctx = idx[:, -model.max_len :]
                pos = model.max_len - 1
            else:  # right-pad to max_len: one static shape for all steps
                pad = np.zeros((idx.shape[0], model.max_len - L), idx.dtype)
                ctx = np.concatenate([idx, pad], 1)
                pos = L - 1
            with no_grad():
                logits = model(Tensor(ctx, device=model.tok_embed.device))
            nxt = np.asarray(logits.data.array)[:, pos].argmax(-1)
            idx = np.concatenate([idx, nxt[:, None].astype(idx.dtype)], 1)
        return idx
    finally:
        if was_training:
            model.train()


class _LMPre(nn.Module):
    """Pipeline pre-stage: token + position embedding, (B, L) -> (B, L, D)."""

    def __init__(self, tok_embed, pos_embed):
        super().__init__()
        self.tok_embed = tok_embed
        self.pos_embed = pos_embed

    def forward(self, idx):
        x = self.tok_embed(idx)
        return x + self.pos_embed[:, : x.shape[1]]


class _LMPost(nn.Module):
    """Pipeline post-stage: final LayerNorm + LM head, (B, L, D) -> logits."""

    def __init__(self, norm, head):
        super().__init__()
        self.norm = norm
        self.head = head

    def forward(self, x):
        return self.head(self.norm(x))


class _LMTrunk(nn.Module):
    """The LM WITHOUT its head: (B, L) tokens -> (B, L, D) hidden states.
    Pair with ``nn.LMHeadCrossEntropy(lm.head)`` so head matmul + token CE
    run as one fused Pallas kernel and the (B, L, vocab) logits never
    materialize.  Wraps (shares) the parent LM's modules — the optimizer
    built on ``lm.parameters()`` maps onto this module's tree by identity,
    and ``lm(idx)`` still produces logits for eval."""

    def __init__(self, lm):
        super().__init__()
        self.lm = lm

    def forward(self, idx):
        lm = self.lm
        x = lm.tok_embed(idx)
        L = x.shape[1]
        if L > lm.max_len:
            raise ValueError(f"sequence length {L} > max_len {lm.max_len}")
        x = x + lm.pos_embed[:, :L]
        x = lm.blocks(x)
        return lm.norm(x)


class TransformerLM(nn.Module):
    def __init__(
        self,
        vocab_size: int,
        max_len: int = 128,
        dim: int = 128,
        depth: int = 4,
        num_heads: int = 4,
        mlp_ratio: float = 4.0,
        dropout: float = 0.0,
        device=None,
        remat: bool = False,
        flash=None,
        ring=None,
    ):
        super().__init__()
        dev = Device(device) if device else default_accelerator()
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.tok_embed = nn.Embedding(vocab_size, dim, device=device)
        self.pos_embed = Parameter(tensor.zeros((1, max_len, dim), device=dev))
        self.blocks = nn.Sequential(
            *[
                EncoderBlock(
                    dim, num_heads, mlp_ratio, dropout, device=device,
                    remat=remat, causal=True, flash=flash, ring=ring,
                )
                for _ in range(depth)
            ]
        )
        self.norm = nn.LayerNorm(dim, device=device)
        self.head = nn.Linear(dim, vocab_size, device=device)

    def forward(self, idx):
        # idx: (B, L) int tokens -> (B, L, vocab) logits
        x = self.tok_embed(idx)
        L = x.shape[1]
        if L > self.max_len:
            raise ValueError(f"sequence length {L} > max_len {self.max_len}")
        x = x + self.pos_embed[:, :L]
        x = self.blocks(x)
        x = self.norm(x)
        return self.head(x)

    def trunk(self):
        """A shared-parameter view of this LM that stops before the head —
        the model half of the fused-head training pair
        (``CompiledTrainStep(lm.trunk(), opt, nn.LMHeadCrossEntropy(lm.head))``)."""
        return _LMTrunk(self)

    def pipeline_partition(self):
        """Split into ``(pre, blocks, post)`` for heterogeneous pipeline
        parallelism (``PipelinedTrainStep(stack, ..., pre=, post=)``):
        ``pre`` = token + position embedding, ``blocks`` = the homogeneous
        shape-preserving EncoderBlock list (stackable over the ``pipe``
        axis), ``post`` = final LayerNorm + LM head.  ``pre``/``post`` WRAP
        this model's own submodules (shared Parameters); the PipelineStack
        built from ``blocks`` copies the block weights into its stacked
        Parameters, so after training, read weights from the step/stack, not
        from this module."""
        return (
            _LMPre(self.tok_embed, self.pos_embed),
            list(self.blocks),
            _LMPost(self.norm, self.head),
        )

    def generate(self, idx, new_tokens: int):
        """Greedy autoregressive decoding: append ``new_tokens`` tokens to
        the (B, L) int prompt.  Pads to ``max_len`` so every step reuses ONE
        compiled shape (no per-length retrace)."""
        return _pad_greedy_generate(self, idx, new_tokens)
