"""Multi-head attention (no reference analog — shipped for the transformer
family and modern-recipe migration).  Pure tape ops end to end: the QKV/out
projections are framework ``Linear``s ((in, out) convention), scores are one
batched 4-D matmul on the MXU, softmax is the tape softmax — so the whole
layer forwards AND backwards inside ``CompiledTrainStep`` like any other
module.  torch-differential-tested (tests/test_nn_transformer.py maps
``torch.nn.MultiheadAttention``'s packed ``in_proj_weight`` onto the three
projections)."""

from __future__ import annotations

import math

from .. import functional as F
from .dropout import Dropout
from .linear import Linear
from .module import Module


class MultiheadAttention(Module):
    """Batch-first multi-head attention: inputs ``(B, L, E)``.

    ``forward(query, key=None, value=None, need_weights=False)`` defaults to
    self-attention (``key``/``value`` fall back to ``query``); returns the
    output, or ``(output, attn_weights)`` with ``need_weights=True``
    (weights averaged over heads, like torch's default).
    """

    def __init__(
        self,
        embed_dim: int,
        num_heads: int,
        dropout: float = 0.0,
        bias: bool = True,
        causal: bool = False,
        device=None,
        flash=None,
        ring=None,
        num_kv_heads=None,
        rope: bool = False,
        rope_theta: float = 10000.0,
        window=None,
    ) -> None:
        """``causal=True`` applies the autoregressive mask (position i may
        attend to j <= i) — the decoder/LM attention variant.

        ``flash`` selects the Pallas flash-attention fast path
        (`ops/pallas_kernels.flash_attention`: online-softmax tiling, scores
        never hit HBM, recompute backward): ``True``/``False`` force it,
        ``None`` (default) auto-enables on a real TPU backend only (in the
        CPU interpret mode the kernel is emulated per grid step — correct
        but slow, so tests opt in explicitly).  The naive path is used
        whenever ``need_weights`` or live attention dropout require the
        materialized softmax.

        ``ring=(mesh, seq_axis)`` (or ``(mesh, seq_axis, batch_axis)``)
        selects ring attention (`parallel.ring.ring_attention`): Q/K/V stay
        sharded on the sequence dim over the mesh axis and K/V chunks rotate
        via ``ppermute`` — true sequence parallelism (the sequence never
        gathers; pair with ``parallel.sequence_sharding`` constraints so the
        surrounding pointwise layers keep the same layout).  Self-attention
        only; takes precedence over ``flash``; falls back to the naive path
        for ``need_weights``/live attention dropout like flash does.

        ``num_kv_heads`` (grouped-query attention, GQA): K/V project onto
        fewer heads than Q and each group of ``num_heads // num_kv_heads``
        query heads shares one KV head (query head ``h`` reads KV head
        ``h // group``, torch/HF repeat_interleave semantics).  The grouped
        score/value contraction runs as broadcast batched matmuls — the KV
        tensors are never physically repeated on the naive path.  Shrinks
        the KV cache by the group factor at decode time (`models/decoding`).

        ``rope=True`` applies rotary position embeddings to Q and K after
        the head split (NeoX/Llama half-rotation layout, base
        ``rope_theta``), making the layer position-aware without an additive
        positional table."""
        super().__init__()
        if embed_dim % num_heads:
            raise ValueError(
                f"embed_dim {embed_dim} not divisible by num_heads {num_heads}"
            )
        if num_kv_heads is None:
            num_kv_heads = num_heads
        if num_heads % num_kv_heads:
            raise ValueError(
                f"num_heads {num_heads} not divisible by num_kv_heads "
                f"{num_kv_heads}"
            )
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = embed_dim // num_heads
        kv_dim = num_kv_heads * self.head_dim
        self.q_proj = Linear(embed_dim, embed_dim, bias=bias, device=device)
        self.k_proj = Linear(embed_dim, kv_dim, bias=bias, device=device)
        self.v_proj = Linear(embed_dim, kv_dim, bias=bias, device=device)
        self.out_proj = Linear(embed_dim, embed_dim, bias=bias, device=device)
        if rope and self.head_dim % 2:
            raise ValueError("rope needs an even head_dim")
        self.rope = bool(rope)
        self.rope_theta = float(rope_theta)
        self._rope_cache = {}  # (L, dtype) -> (cos, sin) numpy (L, D)
        self.attn_drop = Dropout(dropout) if dropout > 0 else None
        self.causal = causal
        if window is not None:
            # sliding-window (Mistral-style) attention: position i attends
            # to j in (i - window, i].  Causal-only; the flash/ring fast
            # paths have no band support, so they are rejected/disabled.
            if not causal:
                raise ValueError("window requires causal=True")
            if int(window) < 1:
                raise ValueError("window must be >= 1")
            if ring is not None:
                raise ValueError(
                    "window is not supported with ring attention"
                )
        self.window = None if window is None else int(window)
        self.flash = flash
        self.ring = tuple(ring) if ring is not None else None
        self._flash_fn = None
        self._ring_fn = None
        self._mask_cache = {}  # (L, Lk, dtype) -> const mask Tensor

    def _use_ring(self, need_weights: bool, is_self: bool) -> bool:
        if self.ring is None or not is_self:
            return False
        if self.num_kv_heads != self.num_heads:
            return False  # ring path is non-grouped; GQA uses naive/flash
        if need_weights:
            return False
        if self.attn_drop is not None and self.training:
            return False
        return getattr(self.q_proj.weight.device, "is_jax", False)

    # auto-mode crossover: measured on-chip (v5e, LM bs32-64, head_dim 64,
    # BENCH_NOTES "Flash attention", r4 re-measure with the head-packed
    # single-block kernels) — end-to-end flash/naive train-step ratio:
    # 0.75 @ L=128, 0.81 @ 256, 1.14 @ 512, 1.14 @ 1024.  XLA's fused
    # attention still wins below 512 (its batched matmuls amortize better
    # than per-head kernel steps at tiny block counts); from the gate up,
    # flash WINS outright and additionally never materializes the (L, L)
    # softmax (far higher batch ceiling).  flash=True/False always
    # overrides.
    FLASH_AUTO_MIN_LEN = 512

    def _use_flash(self, need_weights: bool, q_len: int = 0) -> bool:
        if need_weights:
            return False  # flash never materializes the weights
        if self.attn_drop is not None and self.training:
            return False  # attention dropout needs the materialized softmax
        if not getattr(self.q_proj.weight.device, "is_jax", False):
            return False
        if self.flash is None:
            import jax

            return (
                jax.default_backend() == "tpu"
                and q_len >= self.FLASH_AUTO_MIN_LEN
            )
        return bool(self.flash)

    def forward(self, query, key=None, value=None, need_weights: bool = False):
        is_self = key is None and value is None
        key = query if key is None else key
        value = key if value is None else value
        B, L, E = query.shape
        Lk = key.shape[1]
        H, D = self.num_heads, self.head_dim
        Hkv = self.num_kv_heads

        def split(x, length, heads):
            # (B, L, heads*D) -> (B, heads, L, D)
            return x.reshape(B, length, heads, D).transpose(0, 2, 1, 3)

        q = split(self.q_proj(query), L, H)
        k = split(self.k_proj(key), Lk, Hkv)
        v = split(self.v_proj(value), Lk, Hkv)
        if self.rope:
            q = self._apply_rope(q, L)
            k = self._apply_rope(k, Lk)
        if Hkv != H:
            return self._grouped_forward(q, k, v, need_weights)
        if self._use_ring(need_weights, is_self):
            if self._ring_fn is None:
                from ...parallel.ring import ring_attention
                from ..jax_bridge import jax_function

                mesh, seq_axis = self.ring[0], self.ring[1]
                batch_axis = self.ring[2] if len(self.ring) > 2 else "data"
                causal = self.causal

                def _ring(qa, ka, va):
                    return ring_attention(
                        qa, ka, va, mesh, seq_axis, causal=causal,
                        batch_axis=batch_axis,
                    )

                self._ring_fn = jax_function(_ring)
            out = self._ring_fn(q, k, v)  # (B, H, L, D)
            out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
            return self.out_proj(out)
        if self._use_flash(need_weights, L):
            if self._flash_fn is None:
                from ...ops.pallas_kernels import flash_attention
                from ..jax_bridge import jax_function

                causal = self.causal

                def _flash(qa, ka, va):
                    # positional args only: custom_vjp rejects kwargs
                    return flash_attention(
                        qa, ka, va, causal, None, None, None, self.window
                    )

                self._flash_fn = jax_function(_flash)
            out = self._flash_fn(q, k, v)  # (B, H, L, D)
            out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
            return self.out_proj(out)
        scores = (q @ k.transpose(0, 1, 3, 2)) * (1.0 / math.sqrt(D))
        if self.causal:
            scores = scores + self._causal_mask(L, Lk, scores)
        attn = F.softmax(scores, 3)
        # report PRE-dropout weights (torch semantics: rows sum to 1 even
        # when attention dropout is active in training)
        weights = attn.mean(1) if need_weights else None
        if self.attn_drop is not None:
            attn = self.attn_drop(attn)
        out = attn @ v  # (B, H, L, D)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
        out = self.out_proj(out)
        if need_weights:
            return out, weights
        return out

    def _grouped_forward(self, q, k, v, need_weights):
        """GQA score/value contraction: q ``(B, H, L, D)`` against
        ``(B, Hkv, Lk, D)`` K/V via 5-D broadcast batched matmuls — each
        group of ``H // Hkv`` query heads reads its shared KV head without
        the KV tensor ever being repeated (matmul's batch broadcasting
        carries the group dim; grads sum back over it via _unbroadcast)."""
        B, H, L, D = q.shape
        Hkv = self.num_kv_heads
        Lk = k.shape[2]
        G = H // Hkv
        E = self.embed_dim
        if self._use_flash(need_weights, L):
            # the flash kernel wants equal head counts: broadcast-repeat
            # KV heads with a ones-multiply (grads still sum per group)
            k = (k.reshape(B, Hkv, 1, Lk, D) * self._group_ones(G, k)).reshape(
                B, H, Lk, D
            )
            v = (v.reshape(B, Hkv, 1, Lk, D) * self._group_ones(G, v)).reshape(
                B, H, Lk, D
            )
            if self._flash_fn is None:
                from ...ops.pallas_kernels import flash_attention
                from ..jax_bridge import jax_function

                causal = self.causal

                def _flash(qa, ka, va):
                    return flash_attention(
                        qa, ka, va, causal, None, None, None, self.window
                    )

                self._flash_fn = jax_function(_flash)
            out = self._flash_fn(q, k, v)
            out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
            return self.out_proj(out)
        q5 = q.reshape(B, Hkv, G, L, D)
        k5 = k.reshape(B, Hkv, 1, Lk, D)
        v5 = v.reshape(B, Hkv, 1, Lk, D)
        scores = (q5 @ k5.transpose(0, 1, 2, 4, 3)) * (1.0 / math.sqrt(D))
        if self.causal:
            scores = scores + self._causal_mask(L, Lk, scores)
        attn = F.softmax(scores, 4)
        weights = attn.reshape(B, H, L, Lk).mean(1) if need_weights else None
        if self.attn_drop is not None:
            attn = self.attn_drop(attn)
        out = attn @ v5  # (B, Hkv, G, L, D)
        out = out.reshape(B, H, L, D).transpose(0, 2, 1, 3).reshape(B, L, E)
        out = self.out_proj(out)
        if need_weights:
            return out, weights
        return out

    @staticmethod
    def _group_ones(G, like):
        import numpy as np

        from ...backend import BackendTensor
        from ...tensor import Tensor

        arr = np.ones((1, 1, G, 1, 1), np.float32)
        if "bfloat16" in str(like.dtype):
            import jax.numpy as jnp

            arr = arr.astype(jnp.bfloat16)
        return Tensor(BackendTensor._wrap(arr, like.device))

    def _apply_rope(self, x, L):
        """Rotary position embedding, NeoX/Llama half-rotation layout:
        ``x·cos + rotate_half(x)·sin`` with angle base ``rope_theta``; the
        (1, 1, L, D) cos/sin tables are no-grad numpy consts cached per
        (L, dtype) like the causal mask."""
        import numpy as np

        from ...backend import BackendTensor
        from ...tensor import Tensor, concat

        D = self.head_dim
        key = (L, str(x.dtype))
        cs = self._rope_cache.get(key)
        if cs is None:
            half = D // 2
            inv = 1.0 / (
                self.rope_theta
                ** (np.arange(0, half, dtype=np.float64) * 2.0 / D)
            )
            ang = np.outer(np.arange(L, dtype=np.float64), inv)  # (L, half)
            cos = np.concatenate([np.cos(ang)] * 2, -1).astype(np.float32)
            sin = np.concatenate([np.sin(ang)] * 2, -1).astype(np.float32)
            if "bfloat16" in str(x.dtype):
                import jax.numpy as jnp

                cos = cos.astype(jnp.bfloat16)
                sin = sin.astype(jnp.bfloat16)
            cs = (cos[None, None], sin[None, None])
            self._rope_cache[key] = cs
        cos = Tensor(BackendTensor._wrap(cs[0], x.device))
        sin = Tensor(BackendTensor._wrap(cs[1], x.device))
        half = D // 2
        lead = (slice(None),) * 3
        x1 = x[lead + (slice(0, half),)]
        x2 = x[lead + (slice(half, D),)]
        rot = concat([-x2, x1], axis=3)
        return x * cos + rot * sin

    def _causal_mask(self, L, Lk, scores):
        """Additive -inf above the diagonal; a no-grad const built in the
        scores dtype (bf16 purity), cached per (L, Lk, dtype) so eager
        calls don't rebuild it every step."""
        import numpy as np

        from ...backend import BackendTensor
        from ...tensor import Tensor

        key = (L, Lk, str(scores.dtype), self.window)
        arr = self._mask_cache.get(key)
        if arr is None:
            # build with NUMPY: jnp ops inside a jit trace are staged
            # (omnistaging) and a cached tracer would leak across traces
            arr = np.triu(np.full((L, Lk), -1e9, np.float32), k=1)
            if self.window is not None:
                # band limit: key j is visible only while i - j < window
                arr = arr + np.tril(
                    np.full((L, Lk), -1e9, np.float32), k=-self.window
                )
            if "bfloat16" in str(scores.dtype):
                import jax.numpy as jnp

                arr = np.asarray(arr, dtype=jnp.bfloat16)
            self._mask_cache[key] = arr
        # wrap fresh each call: a cached Tensor would accumulate tape
        # children it is never in the Graph to have cleared
        return Tensor(BackendTensor._wrap(arr, scores.device))
