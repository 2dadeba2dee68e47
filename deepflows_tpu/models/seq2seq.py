"""Encoder-decoder (seq2seq) transformer family: bidirectional encoder,
causal decoder with CROSS-ATTENTION over the encoder memory, shared token
embedding (T5-style), learned positional embeddings.

No reference analog (the reference zoo is CNN-only); this completes the
transformer family triad next to the decoder-only ``TransformerLM`` /
``LlamaLM`` and the MoE ``MixtralLM`` — translation/summarization-shaped
workloads.  Every op is a tape op, so the model trains through
``CompiledTrainStep`` like the rest of the zoo; ``forward`` takes the
concatenated ``(B, src_len + tgt_len)`` int batch (split at the static
``src_len``) so the single-input step/pipeline/ONNX plumbing applies
unchanged.

Generation (``Seq2SeqGenerator``) is TPU-shaped like ``KVCacheDecoder``:
encode once, compute every layer's cross K/V from the memory ONCE, then the
whole greedy decode runs as one ``fori_loop`` program against a static
self-attention KV cache — one host readback per generate().
"""

from __future__ import annotations

import numpy as np

from .. import nn, tensor
from ..backend import Device, default_accelerator
from ..nn.parameter import Parameter
from .vit import EncoderBlock


class CrossDecoderBlock(nn.Module):
    """Pre-norm decoder block: x + SelfAttn(LN(x)) [causal]; x +
    CrossAttn(LN(x), memory); x + MLP(LN(x))."""

    def __init__(
        self, dim, num_heads, mlp_ratio=4.0, dropout=0.0, device=None,
    ):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, device=device)
        self.self_attn = nn.MultiheadAttention(
            dim, num_heads, dropout=dropout, causal=True, device=device,
            flash=False,
        )
        self.norm2 = nn.LayerNorm(dim, device=device)
        self.cross_attn = nn.MultiheadAttention(
            dim, num_heads, dropout=dropout, causal=False, device=device,
            flash=False,
        )
        self.norm3 = nn.LayerNorm(dim, device=device)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Sequential(
            nn.Linear(dim, hidden, device=device),
            nn.GELU(),
            nn.Linear(hidden, dim, device=device),
        )
        self.drop = nn.Dropout(dropout) if dropout > 0 else None

    def forward(self, x, memory):
        h = self.self_attn(self.norm1(x))
        if self.drop is not None:
            h = self.drop(h)
        x = x + h
        h = self.cross_attn(self.norm2(x), memory, memory)
        if self.drop is not None:
            h = self.drop(h)
        x = x + h
        h = self.mlp(self.norm3(x))
        if self.drop is not None:
            h = self.drop(h)
        return x + h


class Seq2SeqTransformer(nn.Module):
    """``forward(x)`` with ``x = concat([src, tgt_in], axis=1)`` (int
    tokens, split at the static ``src_len``) returns (B, tgt_len, vocab)
    logits; train with teacher forcing (``tgt_in`` = BOS-shifted target)
    and ``nn.CrossEntropyLoss`` on the (B, tgt_len) target ids."""

    def __init__(
        self,
        vocab_size: int,
        src_len: int = 32,
        tgt_len: int = 32,
        dim: int = 128,
        enc_depth: int = 2,
        dec_depth: int = 2,
        num_heads: int = 4,
        mlp_ratio: float = 4.0,
        dropout: float = 0.0,
        device=None,
    ):
        super().__init__()
        dev = Device(device) if device else default_accelerator()
        self.vocab_size = vocab_size
        self.src_len = src_len
        self.tgt_len = tgt_len
        # shared source/target token table (T5-style weight sharing)
        self.tok_embed = nn.Embedding(vocab_size, dim, device=device)
        self.src_pos = Parameter(tensor.zeros((1, src_len, dim), device=dev))
        self.tgt_pos = Parameter(tensor.zeros((1, tgt_len, dim), device=dev))
        self.enc_blocks = nn.ModuleList(
            [
                EncoderBlock(
                    dim, num_heads, mlp_ratio, dropout, device=device,
                    causal=False, flash=False,
                )
                for _ in range(enc_depth)
            ]
        )
        self.enc_norm = nn.LayerNorm(dim, device=device)
        self.dec_blocks = nn.ModuleList(
            [
                CrossDecoderBlock(
                    dim, num_heads, mlp_ratio, dropout, device=device
                )
                for _ in range(dec_depth)
            ]
        )
        self.norm = nn.LayerNorm(dim, device=device)
        self.head = nn.Linear(dim, vocab_size, device=device)

    # --------------------------------------------------------------- tape
    def encode(self, src):
        """(B, Ls) int -> (B, Ls, D) memory."""
        Ls = src.shape[1]
        if Ls > self.src_len:
            raise ValueError(f"source length {Ls} > src_len {self.src_len}")
        x = self.tok_embed(src) + self.src_pos[:, :Ls]
        for blk in self.enc_blocks:
            x = blk(x)
        return self.enc_norm(x)

    def decode(self, tgt_in, memory):
        """(B, Lt) int + (B, Ls, D) memory -> (B, Lt, vocab) logits."""
        Lt = tgt_in.shape[1]
        if Lt > self.tgt_len:
            raise ValueError(f"target length {Lt} > tgt_len {self.tgt_len}")
        x = self.tok_embed(tgt_in) + self.tgt_pos[:, :Lt]
        for blk in self.dec_blocks:
            x = blk(x, memory)
        return self.head(self.norm(x))

    def forward(self, x):
        src = x[:, : self.src_len]
        tgt_in = x[:, self.src_len :]
        return self.decode(tgt_in, self.encode(src))

    def generate(self, src, new_tokens: int, bos_id: int = 0):
        """Greedy decode: (B, Ls) source -> (B, new_tokens) generated
        target ids (BOS not included).  One jitted program per
        (Ls, new_tokens) shape pair, one host readback (Seq2SeqGenerator
        cached on the model)."""
        gen = getattr(self, "_generator", None)
        if gen is None:
            gen = self._generator = Seq2SeqGenerator(self)
        return gen.generate(src, new_tokens, bos_id=bos_id)


class Seq2SeqGenerator:
    """KV-cache greedy generation for ``Seq2SeqTransformer``: encode +
    per-layer cross-K/V once, then ONE fori_loop decode program over a
    static (layers, B, H, tgt_len, Dh) self-attention cache.  Mirrors
    ``models.decoding.KVCacheDecoder`` (same _ln/_head conventions);
    ``compute_dtype=jnp.bfloat16`` streams weights/activations in bf16 with
    f32 layernorm statistics and logits."""

    def __init__(self, model: Seq2SeqTransformer, compute_dtype=None):
        import jax

        from ..nn.lora import assert_no_unmerged_lora

        assert_no_unmerged_lora(model, "Seq2SeqGenerator")
        self.model = model
        self.compute_dtype = compute_dtype
        self._encode_j = jax.jit(self._encode_cross)
        self._decode_j = jax.jit(self._decode, static_argnums=(3,))
        import jax.numpy as jnp

        def _cast(a):
            if compute_dtype is not None and jnp.issubdtype(
                a.dtype, jnp.floating
            ):
                return a.astype(compute_dtype)
            return a

        self._prep_j = jax.jit(lambda tree: jax.tree.map(_cast, tree))

    # ------------------------------------------------------------ params
    def _gather(self):
        from ..jit import _TRACE_LOCK

        m = self.model

        def attn(a, pre):
            return {
                f"{pre}q_w": a.q_proj.weight.data.array,
                f"{pre}q_b": a.q_proj.bias.data.array,
                f"{pre}k_w": a.k_proj.weight.data.array,
                f"{pre}k_b": a.k_proj.bias.data.array,
                f"{pre}v_w": a.v_proj.weight.data.array,
                f"{pre}v_b": a.v_proj.bias.data.array,
                f"{pre}o_w": a.out_proj.weight.data.array,
                f"{pre}o_b": a.out_proj.bias.data.array,
            }

        def mlp(blk):
            return dict(
                fc1_w=blk.mlp[0].weight.data.array,
                fc1_b=blk.mlp[0].bias.data.array,
                fc2_w=blk.mlp[2].weight.data.array,
                fc2_b=blk.mlp[2].bias.data.array,
            )

        with _TRACE_LOCK:
            enc = []
            for blk in m.enc_blocks:
                d = dict(
                    ln1_w=blk.norm1.weight.data.array,
                    ln1_b=blk.norm1.bias.data.array,
                    ln2_w=blk.norm2.weight.data.array,
                    ln2_b=blk.norm2.bias.data.array,
                    **attn(blk.attn, ""),
                    **mlp(blk),
                )
                enc.append(d)
            dec = []
            for blk in m.dec_blocks:
                d = dict(
                    ln1_w=blk.norm1.weight.data.array,
                    ln1_b=blk.norm1.bias.data.array,
                    ln2_w=blk.norm2.weight.data.array,
                    ln2_b=blk.norm2.bias.data.array,
                    ln3_w=blk.norm3.weight.data.array,
                    ln3_b=blk.norm3.bias.data.array,
                    **attn(blk.self_attn, "s_"),
                    **attn(blk.cross_attn, "c_"),
                    **mlp(blk),
                )
                dec.append(d)
            return dict(
                tok=m.tok_embed.weight.data.array,
                src_pos=m.src_pos.data.array,
                tgt_pos=m.tgt_pos.data.array,
                enc=enc,
                dec=dec,
                enc_lnf_w=m.enc_norm.weight.data.array,
                enc_lnf_b=m.enc_norm.bias.data.array,
                lnf_w=m.norm.weight.data.array,
                lnf_b=m.norm.bias.data.array,
                head_w=m.head.weight.data.array,
                head_b=m.head.bias.data.array,
            )

    # ------------------------------------------------------- pure pieces
    @staticmethod
    def _ln(x, w, b, eps=1e-5):
        import jax.numpy as jnp

        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, -1, keepdims=True)
        return (xc / jnp.sqrt(var + eps)).astype(x.dtype) * w + b

    def _heads(self, x, wq, bq, H):
        B, L, _ = x.shape
        h = x @ wq + bq
        return h.reshape(B, L, H, -1).transpose(0, 2, 1, 3)  # (B,H,L,Dh)

    def _encode_cross(self, params, src):
        """Encoder forward + per-decoder-layer cross K/V: src (B, Ls) ->
        (memory-free!) cross_k/cross_v stacks (dec_layers, B, H, Ls, Dh)."""
        import jax
        import jax.numpy as jnp

        m = self.model
        H = m.enc_blocks[0].attn.num_heads
        Dh = m.enc_blocks[0].attn.head_dim
        Ls = src.shape[1]
        scale = 1.0 / np.sqrt(Dh)
        x = params["tok"][src] + params["src_pos"][:, :Ls]
        for p in params["enc"]:
            h = self._ln(x, p["ln1_w"], p["ln1_b"])
            q = self._heads(h, p["q_w"], p["q_b"], H)
            k = self._heads(h, p["k_w"], p["k_b"], H)
            v = self._heads(h, p["v_w"], p["v_b"], H)
            s = (jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale).astype(
                jnp.float32
            )
            attn = jax.nn.softmax(s, -1).astype(v.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            B = o.shape[0]
            o = o.transpose(0, 2, 1, 3).reshape(B, Ls, H * Dh)
            x = x + (o @ p["o_w"] + p["o_b"])
            h = self._ln(x, p["ln2_w"], p["ln2_b"])
            x = x + (
                jax.nn.gelu(h @ p["fc1_w"] + p["fc1_b"], approximate=False)
                @ p["fc2_w"]
                + p["fc2_b"]
            )
        mem = self._ln(x, params["enc_lnf_w"], params["enc_lnf_b"])
        cks, cvs = [], []
        for p in params["dec"]:
            cks.append(self._heads(mem, p["c_k_w"], p["c_k_b"], H))
            cvs.append(self._heads(mem, p["c_v_w"], p["c_v_b"], H))
        return jnp.stack(cks), jnp.stack(cvs)

    def _decode(self, params, cross_k, cross_v, n_steps, tok0):
        """Whole greedy generation as one fori_loop: self-attn KV cache
        (dec_layers, B, H, tgt_len, Dh) built step by step, cross K/V
        static.  Returns (B, n_steps) generated ids."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        m = self.model
        H = m.dec_blocks[0].self_attn.num_heads
        Dh = m.dec_blocks[0].self_attn.head_dim
        nlayers = len(params["dec"])
        B = cross_k.shape[1]
        Lt = m.tgt_len
        scale = 1.0 / np.sqrt(Dh)
        cdtype = self.compute_dtype or params["tok"].dtype
        kc0 = jnp.zeros((nlayers, B, H, Lt, Dh), cdtype)
        vc0 = jnp.zeros_like(kc0)
        positions = jnp.arange(Lt)

        def fwd(kc, vc, tok, pos):
            x = params["tok"][tok][:, None, :] + lax.dynamic_slice(
                params["tgt_pos"], (0, pos, 0), (1, 1, params["tgt_pos"].shape[2])
            )
            for li, p in enumerate(params["dec"]):
                h = self._ln(x, p["ln1_w"], p["ln1_b"])
                q = self._heads(h, p["s_q_w"], p["s_q_b"], H)
                k1 = self._heads(h, p["s_k_w"], p["s_k_b"], H)
                v1 = self._heads(h, p["s_v_w"], p["s_v_b"], H)
                kc = lax.dynamic_update_slice(
                    kc, k1.astype(kc.dtype)[None], (li, 0, 0, pos, 0)
                )
                vc = lax.dynamic_update_slice(
                    vc, v1.astype(vc.dtype)[None], (li, 0, 0, pos, 0)
                )
                s = (jnp.einsum("bhqd,bhkd->bhqk", q, kc[li]) * scale).astype(
                    jnp.float32
                )
                s = jnp.where(positions[None, None, None, :] > pos, -1e30, s)
                attn = jax.nn.softmax(s, -1).astype(vc.dtype)
                o = jnp.einsum("bhqk,bhkd->bhqd", attn, vc[li])
                o = o.transpose(0, 2, 1, 3).reshape(B, 1, H * Dh)
                x = x + (o @ p["s_o_w"] + p["s_o_b"])
                # cross-attention: full (unmasked) view of the source
                h = self._ln(x, p["ln2_w"], p["ln2_b"])
                q = self._heads(h, p["c_q_w"], p["c_q_b"], H)
                s = (
                    jnp.einsum("bhqd,bhkd->bhqk", q, cross_k[li]) * scale
                ).astype(jnp.float32)
                attn = jax.nn.softmax(s, -1).astype(cross_v.dtype)
                o = jnp.einsum("bhqk,bhkd->bhqd", attn, cross_v[li])
                o = o.transpose(0, 2, 1, 3).reshape(B, 1, H * Dh)
                x = x + (o @ p["c_o_w"] + p["c_o_b"])
                h = self._ln(x, p["ln3_w"], p["ln3_b"])
                x = x + (
                    jax.nn.gelu(h @ p["fc1_w"] + p["fc1_b"], approximate=False)
                    @ p["fc2_w"]
                    + p["fc2_b"]
                )
            x = self._ln(x, params["lnf_w"], params["lnf_b"])
            logits = (
                x[:, 0].astype(jnp.float32) @ params["head_w"].astype(jnp.float32)
                + params["head_b"].astype(jnp.float32)
            )
            return jnp.argmax(logits, -1).astype(jnp.int32), kc, vc

        # lax.scan with the generated ids as scan OUTPUTS (ys), not a
        # carried buffer: an equivalent fori_loop carrying the output array
        # miscomputed on the axon TPU platform at B>=~16 — every iteration
        # read the INITIAL carry (only step-0's token appeared, at the last
        # write slot).  CPU and small-B chip runs were correct; scan's
        # per-step stacked outputs dodge the carry-aliasing lowering.
        def step(carry, i):
            kc, vc, tok = carry
            nxt, kc, vc = fwd(kc, vc, tok, i)
            return (kc, vc, nxt), nxt

        _, out = lax.scan(
            step, (kc0, vc0, tok0), jnp.arange(n_steps)
        )
        return out.T

    # ------------------------------------------------------------ public
    def generate(self, src, new_tokens: int, bos_id: int = 0) -> np.ndarray:
        """(B, Ls) int source -> (B, new_tokens) greedy target ids."""
        import jax.numpy as jnp

        from ..autograd import no_grad

        src = np.asarray(src)
        if src.ndim != 2:
            raise ValueError("src must be (B, Ls)")
        if new_tokens < 1 or new_tokens > self.model.tgt_len:
            raise ValueError(
                f"new_tokens must be in [1, tgt_len={self.model.tgt_len}]"
            )
        with no_grad():
            params = self._prep_j(self._gather())
            ck, cv = self._encode_j(params, jnp.asarray(src.astype(np.int32)))
            tok0 = np.full((src.shape[0],), bos_id, np.int32)
            out = self._decode_j(params, ck, cv, int(new_tokens), tok0)
        return np.asarray(out)
