"""Vision Transformer (no reference analog — the reference zoo is CNN-only;
shipped to prove the tape generalizes beyond convs and to give the pipeline
its canonical homogeneous stages).

Design notes:
- every op is a tape op (patch conv, LayerNorm, batched 4-D attention
  matmuls, GELU MLP), so the model trains through ``CompiledTrainStep`` /
  ``ShardedTrainStep`` exactly like the CNN zoo;
- encoder blocks are structurally identical and buffer-free (LayerNorm has
  no running stats) — a ``parallel.PipelineStack`` of blocks pipelines them
  over a ``pipe`` mesh axis with zero extra code (tests/test_nn_transformer.py);
- pooling is mean-over-tokens (no CLS token), head is a Linear.
"""

from __future__ import annotations

from .. import nn, tensor
from ..backend import Device, default_accelerator
from ..nn.parameter import Parameter


class EncoderBlock(nn.Module):
    """Pre-norm transformer block: x + MHA(LN(x)); x + MLP(LN(x))."""

    def __init__(
        self, dim, num_heads, mlp_ratio=4.0, dropout=0.0, device=None,
        remat=False, causal=False, flash=None, ring=None,
    ):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, device=device)
        self.attn = nn.MultiheadAttention(
            dim, num_heads, dropout=dropout, causal=causal, device=device,
            flash=flash, ring=ring,
        )
        self.norm2 = nn.LayerNorm(dim, device=device)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Sequential(
            nn.Linear(dim, hidden, device=device),
            nn.GELU(),
            nn.Linear(hidden, dim, device=device),
        )
        self.drop = nn.Dropout(dropout) if dropout > 0 else None
        self._remat = remat

    def forward(self, x):
        if self._remat:
            return nn.remat_call(self, x, self._forward_impl)
        return self._forward_impl(x)

    def _forward_impl(self, x):
        h = self.attn(self.norm1(x))
        if self.drop is not None:
            h = self.drop(h)
        x = x + h
        h = self.mlp(self.norm2(x))
        if self.drop is not None:
            h = self.drop(h)
        return x + h


class VisionTransformer(nn.Module):
    def __init__(
        self,
        image_size=32,
        patch_size=4,
        in_channels=3,
        num_classes=10,
        dim=192,
        depth=6,
        num_heads=3,
        mlp_ratio=4.0,
        dropout=0.0,
        device=None,
        remat=False,
        flash=None,
    ):
        super().__init__()
        if image_size % patch_size:
            raise ValueError("image_size must be divisible by patch_size")
        self.dim = dim
        dev = Device(device) if device else default_accelerator()
        n_patches = (image_size // patch_size) ** 2
        self.patch_embed = nn.Conv2d(
            in_channels, dim, patch_size, stride=patch_size, device=device
        )
        self.pos_embed = Parameter(
            tensor.zeros((1, n_patches, dim), device=dev)
        )
        self.blocks = nn.Sequential(
            *[
                EncoderBlock(
                    dim, num_heads, mlp_ratio, dropout, device=device,
                    remat=remat, flash=flash,
                )
                for _ in range(depth)
            ]
        )
        self.norm = nn.LayerNorm(dim, device=device)
        self.head = nn.Linear(dim, num_classes, device=device)

    def forward(self, x):
        B = x.shape[0]
        p = self.patch_embed(x)  # (B, dim, H/ps, W/ps)
        p = p.reshape(B, self.dim, -1).transpose(0, 2, 1)  # (B, N, dim)
        p = p + self.pos_embed
        p = self.blocks(p)
        p = self.norm(p)
        pooled = p.mean(1)  # mean over tokens
        return self.head(pooled)


def ViT_Tiny(
    image_size=32, patch_size=4, num_classes=10, device=None, dropout=0.0,
    remat=False, flash=None,
):
    return VisionTransformer(
        image_size, patch_size, 3, num_classes,
        dim=192, depth=6, num_heads=3, device=device, dropout=dropout,
        remat=remat, flash=flash,
    )
