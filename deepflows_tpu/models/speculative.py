"""Speculative decoding: draft-propose / target-verify generation.

TPU-native serving capability with no reference analog (the reference's
serving is a single-model ONNXRuntime call, `DF_serving/serving/serving.py`).
Algorithm: speculative sampling (arXiv:2211.17192 / 2302.01318) — a small
DRAFT model autoregressively proposes ``gamma`` tokens; the TARGET model
scores all of them in ONE chunk forward (``KVCacheDecoder._forward_chunk``);
a leading run of proposals is accepted by rejection sampling and one
corrected/bonus token is appended from the target's own distribution.  The
output distribution is EXACTLY the target's:

- greedy (temperature 0): accept while the draft token equals the target
  argmax; on first mismatch append the target argmax.  The emitted sequence
  is bit-identical to ``KVCacheDecoder.generate`` greedy — asserted in
  tests for ANY draft, trained or random.
- sampled (temperature > 0): accept token x with probability
  min(1, p(x)/q(x)); on rejection draw from normalize(max(p - q, 0)); when
  all gamma survive, draw the bonus from the target's next-position
  distribution.  Standard rejection-sampling argument => exact target
  samples at any acceptance rate.

One WHOLE generation is a single jitted ``lax.while_loop`` program over
both models' static KV caches (one host readback), so a whole
draft+verify+accept round costs gamma draft steps + ONE target dispatch —
the target runs ~(accepted+1) tokens per forward instead of one.  Per-row
bookkeeping (position vectors, masked commits) lets every batch row accept
a different count each round; rows that finish spin harmlessly (masked
writes at a frozen position) until the loop drains.

Mixed architectures compose: the draft and target each use their own
decoder subclass, so a GQA Llama can draft for a GPT-style TransformerLM
or vice versa (tested).  ``compute_dtype``/``quant`` knobs pass through to
both decoders.
"""

from __future__ import annotations

import numpy as np

from .decoding import KVCacheDecoder

__all__ = ["SpeculativeDecoder"]


class SpeculativeDecoder:
    def __init__(
        self,
        target,
        draft,
        gamma: int = 4,
        compute_dtype=None,
        quant=None,
        draft_compute_dtype=None,
    ):
        """``target``/``draft``: TransformerLM or LlamaLM instances sharing
        one vocabulary.  ``gamma``: proposals per round.  ``quant`` applies
        to the target only (the draft is small; quantizing it rarely pays).
        """
        import jax

        if gamma < 1:
            raise ValueError("gamma must be >= 1")
        tv = target.head.weight.shape[-1]
        dv = draft.head.weight.shape[-1]
        if tv != dv:
            raise ValueError(
                f"target and draft must share a vocabulary (got {tv} vs {dv})"
            )
        self.gamma = int(gamma)
        self.target = KVCacheDecoder(target, compute_dtype=compute_dtype, quant=quant)
        self.draft = KVCacheDecoder(
            draft, compute_dtype=draft_compute_dtype or compute_dtype
        )
        # static: n_new, do_sample (gamma baked via self)
        self._loop_jit = jax.jit(self._spec_loop, static_argnums=(6, 9))
        self.last_stats = None

    # ------------------------------------------------------------ core loop
    def _spec_loop(
        self, tp, dp, tcaches, dcaches, tok0, pos0, n_new, key, temp, do_sample
    ):
        """Whole speculative generation as one program.  tok0 (B,): first
        committed token (from the target's prefill logits) at position
        pos0.  Returns (tokens (B, cap), counts (B,), rounds, accepted)."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        g = self.gamma
        tkc0, tvc0 = tcaches
        dkc0, dvc0 = dcaches
        B = tkc0.shape[1]
        cap = n_new + g + 1  # commit overshoot is sliced off on host
        Lt = self.target.lm.max_len
        Ld = self.draft.lm.max_len
        pos_t = jnp.arange(Lt)
        pos_d = jnp.arange(Ld)

        tokens0 = jnp.zeros((B, cap), jnp.int32)
        tokens0 = tokens0.at[:, 0].set(tok0)
        counts0 = jnp.ones((B,), jnp.int32)
        posv0 = jnp.full((B,), pos0, jnp.int32)
        rows = jnp.arange(B)

        def soft(logits):
            if do_sample:
                return jax.nn.softmax(
                    logits.astype(jnp.float32) / jnp.maximum(temp, 1e-6), -1
                )
            return logits  # greedy path compares argmaxes, not probs

        def cond(carry):
            counts = carry[4]
            return jnp.any(counts < n_new)

        def body(carry):
            (
                tkc, tvc, dkc, dvc, counts, posv, cur, k, rounds, accepted,
                tokens,
            ) = carry
            done = counts >= n_new
            # finished rows spin until the loop drains: pin them to
            # position 0 so their (masked-off) cache writes stay in bounds
            # — their caches no longer matter, their commits are masked
            posv_eff = jnp.where(done, 0, posv)

            # ---- draft phase: gamma sequential proposals
            d_toks = []
            d_probs = []
            t = cur
            pv = posv_eff
            for _ in range(g):
                dlog, dkc, dvc = self.draft._forward_multi(
                    dp, dkc, dvc, t, pv, pos_d
                )
                if do_sample:
                    q = soft(dlog)
                    k, sub = jax.random.split(k)
                    t = jax.random.categorical(
                        sub, jnp.log(jnp.maximum(q, 1e-30))
                    ).astype(jnp.int32)
                    d_probs.append(q)
                else:
                    t = jnp.argmax(dlog, -1).astype(jnp.int32)
                    d_probs.append(dlog)
                d_toks.append(t)
                pv = pv + 1
            d_toks = jnp.stack(d_toks, 1)  # (B, g)

            # ---- target verify: ONE chunk forward over [cur, d_1..d_g]
            chunk = jnp.concatenate([cur[:, None], d_toks], 1)  # (B, g+1)
            tlog, tkc, tvc = self.target._forward_chunk(
                tp, tkc, tvc, chunk, posv_eff, pos_t
            )  # (B, g+1, V)

            # ---- acceptance
            if do_sample:
                p_all = soft(tlog)  # (B, g+1, V)
                accept = []
                for j in range(g):
                    pj = p_all[:, j]
                    qj = d_probs[j]
                    dj = d_toks[:, j]
                    ratio = jnp.take_along_axis(pj, dj[:, None], 1)[
                        :, 0
                    ] / jnp.maximum(
                        jnp.take_along_axis(qj, dj[:, None], 1)[:, 0], 1e-30
                    )
                    k, sub = jax.random.split(k)
                    u = jax.random.uniform(sub, (B,))
                    accept.append(u < ratio)
                acc = jnp.stack(accept, 1)  # (B, g)
            else:
                tgt_argmax = jnp.argmax(tlog, -1).astype(jnp.int32)  # (B, g+1)
                acc = d_toks == tgt_argmax[:, :g]
            # leading-True run length per row
            acc_len = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), 1), 1)  # (B,)

            # ---- corrected / bonus token from the target at slot acc_len
            l_at = jnp.take_along_axis(
                tlog, acc_len[:, None, None], 1
            )[:, 0]  # (B, V) target logits at the first unaccepted slot
            if do_sample:
                p_at = soft(l_at)
                # residual only where a draft proposal was REJECTED; when
                # all gamma survive the bonus comes from p directly
                all_ok = acc_len >= g
                q_at = jnp.take_along_axis(
                    jnp.stack(d_probs, 1),
                    jnp.minimum(acc_len, g - 1)[:, None, None],
                    1,
                )[:, 0]
                resid = jnp.maximum(p_at - q_at, 0.0)
                rs = jnp.sum(resid, -1, keepdims=True)
                resid = jnp.where(rs > 1e-30, resid / rs, p_at)
                dist = jnp.where(all_ok[:, None], p_at, resid)
                k, sub = jax.random.split(k)
                x_tok = jax.random.categorical(
                    sub, jnp.log(jnp.maximum(dist, 1e-30))
                ).astype(jnp.int32)
            else:
                x_tok = jnp.argmax(l_at, -1).astype(jnp.int32)

            # ---- commit: d_1..d_acc_len then x_tok, masked per row.
            # This while_loop CARRIES the output `tokens` buffer — the
            # shape seq2seq._decode documents as miscomputing on the axon
            # platform for a WRITE-ONLY carried buffer.  This loop is
            # exempt because every write READS the carried buffer
            # (`tokens[rows, col]` inside the where), a true loop-carried
            # data dependency the aliasing lowering cannot elide;
            # verified on the real chip at B=32: greedy speculative
            # output bit-matches the one-shot decoder's (r4, see
            # tools/chip_verify_loops.py).
            for j in range(g + 1):
                val = jnp.where(
                    j < acc_len,
                    d_toks[:, min(j, g - 1)],
                    x_tok,
                )
                col = jnp.clip(counts + j, 0, cap - 1)
                write = (j <= acc_len) & ~done
                tokens = tokens.at[rows, col].set(
                    jnp.where(write, val, tokens[rows, col])
                )

            adv = jnp.where(done, 0, acc_len + 1)
            counts = counts + adv
            posv = posv + adv
            cur = jnp.where(done, cur, x_tok)
            rounds = rounds + 1
            accepted = accepted + jnp.sum(jnp.where(done, 0, acc_len))
            return (
                tkc, tvc, dkc, dvc, counts, posv, cur, k, rounds, accepted,
                tokens,
            )

        key0 = jax.random.key(0) if key is None else key
        init = (
            tkc0, tvc0, dkc0, dvc0, counts0, posv0, tok0, key0,
            jnp.int32(0), jnp.int32(0), tokens0,
        )
        out = lax.while_loop(cond, body, init)
        counts, rounds, accepted, tokens = out[4], out[8], out[9], out[10]
        return tokens, counts, rounds, accepted

    # ------------------------------------------------------------ public
    def generate(
        self,
        idx,
        new_tokens: int,
        temperature: float = 0.0,
        seed: int = 0,
        eos_id=None,
    ):
        """Speculatively decode ``new_tokens`` continuations of the (B, L)
        int prompt; returns the (B, L+new_tokens) numpy array —
        drop-in-identical contract to ``KVCacheDecoder.generate`` (greedy
        output is bit-identical to it).  ``top_k``/``top_p`` are not
        supported speculatively (the acceptance ratio needs the full
        distributions); use ``KVCacheDecoder.generate`` for those.
        ``last_stats`` records rounds and the mean accepted-per-round."""
        import jax
        import jax.numpy as jnp

        idx = np.asarray(idx)
        B, plen = idx.shape
        if plen < 1:
            raise ValueError("prompt must have at least one token")
        g = self.gamma
        for name, lm in (("target", self.target.lm), ("draft", self.draft.lm)):
            if plen + new_tokens + g > lm.max_len:
                raise ValueError(
                    f"prompt {plen} + new_tokens {new_tokens} + gamma {g} "
                    f"exceeds the {name} max_len {lm.max_len} (the verify "
                    "window needs gamma slack)"
                )
        if new_tokens <= 0:
            return idx
        do_sample = temperature is not None and temperature > 0.0
        temp = np.float32(temperature if do_sample else 1.0)

        tp = self.target._prep_jit(self.target._gather())
        dp = self.draft._prep_jit(self.draft._gather())
        Lt, Ld = self.target.lm.max_len, self.draft.lm.max_len
        prompt_t = np.zeros((B, Lt), np.int32)
        prompt_t[:, :plen] = idx
        prompt_d = np.zeros((B, Ld), np.int32)
        prompt_d[:, :plen] = idx
        tkc, tvc, tlog0 = self.target._prefill_jit(
            tp, jnp.asarray(prompt_t), plen
        )
        dkc, dvc, _ = self.draft._prefill_jit(dp, jnp.asarray(prompt_d), plen)

        key = jax.random.key(seed)
        key, sub = jax.random.split(key)
        tok0 = self.target._select_jit(
            tlog0, sub, temp if do_sample else None, None, None, do_sample
        )
        tokens, counts, rounds, accepted = self._loop_jit(
            tp, dp, (tkc, tvc), (dkc, dvc), tok0, np.int32(plen),
            int(new_tokens), key, temp, do_sample,
        )
        out = np.asarray(tokens)[:, :new_tokens]
        r = int(rounds)
        self.last_stats = {
            "rounds": r,
            "accepted": int(accepted),
            "acceptance_rate": float(accepted) / max(r * B * g, 1),
            "tokens_per_round": (B * new_tokens - B) / max(r * B, 1) + 1,
        }
        out = out.astype(idx.dtype)
        if eos_id is not None:
            out = out.copy()
            for b in range(B):
                hits = np.where(out[b] == eos_id)[0]
                if hits.size:
                    out[b, hits[0] + 1 :] = eos_id
        return np.concatenate([idx, out], 1)
