"""In-flight (continuous) batching decode engine.

``KVCacheDecoder.generate`` serves a FIXED batch: every sequence starts and
finishes together, and a new request waits for the whole batch to drain.
Production serving has requests ARRIVING; the TPU-native answer is a
slot-based engine over static shapes:

- the KV cache is ``(layers, slots, Hc, max_len, Dh)``; each slot is an
  independent sequence at its OWN depth (per-slot position vector —
  ``KVCacheDecoder._forward_multi``);
- a jitted CHUNK program advances every active slot ``chunk`` tokens in one
  ``lax.fori_loop`` — one host readback per chunk, not per token, bounding
  admission latency to one chunk;
- admission = one prefill (prompt length is a TRACED scalar, so ONE
  compiled prefill serves every prompt length) + a cache-row
  ``dynamic_update_slice`` at a traced slot index;
- retirement (budget exhausted or EOS) frees the slot for the next queued
  request between chunks.  Slots whose budget ends mid-chunk freeze
  in-program (token and position stop advancing; re-forwarding the frozen
  token rewrites the identical K/V at the same position, so the cache stays
  exact) and the host discards their frozen tail;
- PREFIX CACHING (``register_prefix``): a shared prompt prefix (system
  prompt) is prefilled once and its K/V kept on device; a matching
  request's admission scatters the cached rows and forwards only the
  SUFFIX (power-of-2 padded, via the decoder's chunk forward — the
  speculative-verify primitive), so admission cost scales with the
  suffix, not the prompt.  Entries are LRU-bounded (``max_prefixes``) and
  recompute lazily after ``refresh_params``.

Every device program compiles ONCE per engine (at most twice: an all-greedy
and an any-sampling variant of chunk/admission): shapes, slot count, chunk
length and ``top_k`` are static; slot index, prompt length, temperatures
and positions are traced.  The cache buffers are DONATED through the chunk
and admission programs, so the engine holds one cache's HBM, not two.

Requests are submitted from any thread (``submit`` returns a handle whose
``result()`` blocks); a daemon thread owns the device state, so concurrent
gRPC Generate calls share one in-flight batch
(``serving.PredictService`` with ``inflight_slots=``).

No reference analog (the reference serves one ONNXRuntime call per RPC,
`/root/reference/DF_serving/serving/serving.py:61-68`); this is the
continuous-batching recipe (Orca/vLLM-style) re-designed for static-shape
XLA.  Works for both ``TransformerLM`` and ``LlamaLM`` via the decoder's
architecture dispatch (the Llama cache stays ``num_kv_heads`` wide).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from .decoding import KVCacheDecoder

__all__ = ["InflightEngine", "InflightHandle"]


class InflightHandle:
    """Per-request handle: ``result()`` blocks until the request finishes
    and returns the 1-D ``prompt + generated`` token array (generation
    stops at ``new_tokens`` or at the first ``eos_id``, inclusive)."""

    def __init__(self, prompt, new_tokens, eos_id):
        self.prompt = np.asarray(prompt, np.int64)
        self.new_tokens = int(new_tokens)
        self.eos_id = eos_id
        self.tokens: list = []
        self._done = threading.Event()
        self._err = None

    def done(self) -> bool:
        return self._done.is_set()

    def result(self, timeout=None) -> np.ndarray:
        if not self._done.wait(timeout):
            raise TimeoutError("request not finished")
        if self._err is not None:
            raise self._err
        return np.concatenate(
            [self.prompt, np.asarray(self.tokens, np.int64)]
        )

    def _finish(self, err=None):
        self._err = err
        self._done.set()


class InflightEngine:
    def __init__(
        self,
        lm,
        slots: int = 4,
        chunk: int = 8,
        top_k=None,
        compute_dtype=None,
        quant=None,
        seed: int = 0,
        start: bool = True,
        max_prefixes: int = 8,
        paged_blocks=None,
        block_size: int = 16,
    ):
        """``slots``: max concurrent sequences (cache batch dim).
        ``chunk``: decode steps per device program — the host readback /
        admission granularity.  ``top_k``: engine-global static top-k for
        sampling requests (``lax.top_k`` needs a static k; ``None`` = no
        top-k truncation).  ``compute_dtype``/``quant`` configure the
        underlying ``KVCacheDecoder`` (bf16 / int8-weight decode).

        Sampling requests draw from ONE engine-wide PRNG stream (seeded by
        ``seed``, split per decode step): with in-flight batching a
        request's draws depend on what else is in the batch, so per-request
        seeds are not reproducible — use the one-shot decoder when exact
        replay matters."""
        import jax
        import jax.numpy as jnp

        self.dec = lm if isinstance(lm, KVCacheDecoder) else KVCacheDecoder(
            lm, compute_dtype=compute_dtype, quant=quant
        )
        lm = self.dec.lm
        self.lm = lm
        self.S = int(slots)
        self.chunk = int(chunk)
        self.top_k = top_k
        self.L = lm.max_len
        if self.S < 1 or self.chunk < 1:
            raise ValueError("slots and chunk must be >= 1")

        a0 = lm.blocks[0].attn
        Hc = a0.num_kv_heads  # == num_heads unless GQA
        layers = len(lm.blocks)
        cdtype = self.dec.compute_dtype or jnp.float32
        self.params = self.dec._prep_jit(self.dec._gather())
        # PAGED mode (``paged_blocks=N``): K/V live in a shared pool of N
        # (block_size)-token blocks instead of S dense max_len rows — cache
        # HBM scales with the tokens actually IN FLIGHT, so N can be sized
        # for the workload's real lengths (admission backpressures when the
        # pool is exhausted).  Block 0 is the reserved null target of
        # unallocated table entries (its writes are dead, its reads masked).
        self.paged = paged_blocks is not None
        if self.paged:
            if self.L % int(block_size):
                raise ValueError(
                    f"block_size {block_size} must divide max_len {self.L}"
                )
            self.bs = int(block_size)
            self.nb = self.L // self.bs  # table width (logical max blocks)
            n_pool = int(paged_blocks) + 1
            if n_pool < 2:
                raise ValueError("paged_blocks must be >= 1")
            self._kp = jnp.zeros(
                (layers, n_pool, Hc, self.bs, a0.head_dim), cdtype
            )
            self._vp = jnp.zeros_like(self._kp)
            self._tbl = np.zeros((self.S, self.nb), np.int32)
            self._free = list(range(1, n_pool))
            self._blocks_of = [[] for _ in range(self.S)]
        else:
            self._kc = jnp.zeros(
                (layers, self.S, Hc, self.L, a0.head_dim), cdtype
            )
            self._vc = jnp.zeros_like(self._kc)
        self._tok = jnp.zeros((self.S,), jnp.int32)
        self._pos = jnp.zeros((self.S,), jnp.int32)
        self._key = jax.random.key(seed)

        # host-side slot bookkeeping (passed into the chunk program as tiny
        # arguments each call)
        self._active = np.zeros(self.S, bool)
        self._limit = np.zeros(self.S, np.int32)
        self._temp = np.zeros(self.S, np.float32)
        self._topp = np.zeros(self.S, np.float32)
        self._smask = np.zeros(self.S, bool)
        self._slot_req: list = [None] * self.S

        # one compiled prefill for EVERY prompt length: plen is traced
        self._prefill_j = jax.jit(self.dec._prefill)
        if self.paged:
            self._admit_j = jax.jit(
                self._admit_paged_fn, static_argnums=(13,),
                donate_argnums=(0, 1, 2, 3),
            )
            self._chunk_j = jax.jit(
                self._chunk_paged_fn, static_argnums=(12,),
                donate_argnums=(1, 2, 4, 5),
            )
        else:
            self._admit_j = jax.jit(
                self._admit_fn, static_argnums=(12,),
                donate_argnums=(0, 1, 2, 3),
            )
            self._chunk_j = jax.jit(
                self._chunk_fn, static_argnums=(11,),
                donate_argnums=(1, 2, 3, 4),
            )

        # prefix cache: registered prompt prefixes whose K/V (and next-token
        # logits) are prefilled ONCE and reused by every matching request —
        # vLLM-style prefix caching with explicit registration, re-shaped for
        # static-shape XLA (each entry holds one slot-row's worth of cache
        # HBM).  Admission of a hit runs only the SUFFIX forward.
        self.max_prefixes = int(max_prefixes)
        self._prefixes: dict = {}  # tuple(tokens) -> entry dict
        # register_prefix runs on user/serving threads while the engine
        # loop iterates/mutates the same dict (_match_prefix,
        # _prefix_entry): all access goes through this lock
        self._prefix_lock = threading.Lock()
        self._prefix_clock = 0  # LRU counter
        self._params_ver = 0  # entries from older weights recompute lazily
        # suffix lengths are padded to power-of-2 buckets, so this single
        # jit compiles at most log2(L) variants; kcp/vcp are NOT donated
        # (the persistent prefix entry must survive for the next request)
        self._suffix_j = jax.jit(self._suffix_fn)
        self.prefix_hits = 0
        self.prefix_misses = 0

        self._queue: "queue.Queue" = queue.Queue()
        self._pending: list = []
        self._stop = False
        self._refresh = False
        self._thread = None
        if start:
            self.start()

    # ------------------------------------------------------- device programs
    def _admit_fn(
        self, kc, vc, tok, posv, kcn, vcn, logits0, slot, plen, key,
        temp, topp, any_sample,
    ):
        """Install a prefilled request into slot ``slot`` (traced): scatter
        the (layers, 1, Hc, L, Dh) prefill cache into the slot row, select
        the first generated token from the prefill logits, and set the
        slot's token/position."""
        import jax.numpy as jnp
        from jax import lax

        kc = lax.dynamic_update_slice(
            kc, kcn.astype(kc.dtype), (0, slot, 0, 0, 0)
        )
        vc = lax.dynamic_update_slice(
            vc, vcn.astype(vc.dtype), (0, slot, 0, 0, 0)
        )
        tok0 = self.dec._select_multi(
            logits0,
            key,
            jnp.reshape(temp, (1,)),
            jnp.reshape(topp, (1,)),
            jnp.reshape(temp > 0, (1,)),
            self.top_k,
            any_sample,
        )
        tok = lax.dynamic_update_slice(tok, tok0, (slot,))
        posv = lax.dynamic_update_slice(
            posv, jnp.reshape(plen, (1,)).astype(posv.dtype), (slot,)
        )
        return kc, vc, tok, posv, tok0

    def _chunk_fn(
        self, params, kc, vc, tok, posv, key, active, limit,
        temp, topp, smask, any_sample,
    ):
        """Advance all live slots ``self.chunk`` tokens in one fori_loop.
        Live = active AND position below the slot's budget limit; dead
        slots freeze (token/position hold, output rows repeat the frozen
        token — the host discards them)."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        positions = jnp.arange(self.L)
        out0 = jnp.zeros((self.S, self.chunk), jnp.int32)

        def step(i, carry):
            kc, vc, tok, posv, key, out = carry
            live = jnp.logical_and(active, posv < limit)
            logits, kc, vc = self.dec._forward_multi(
                params, kc, vc, tok, posv, positions
            )
            if any_sample:  # static: all-greedy programs carry no RNG ops
                key, sub = jax.random.split(key)
            else:
                sub = key
            nxt = self.dec._select_multi(
                logits, sub, temp, topp, smask, self.top_k, any_sample
            )
            nxt = jnp.where(live, nxt, tok)
            out = out.at[:, i].set(nxt)
            posv = jnp.where(live, posv + 1, posv)
            return kc, vc, nxt, posv, key, out

        return lax.fori_loop(
            0, self.chunk, step, (kc, vc, tok, posv, key, out0)
        )

    # ------------------------------------------------------- paged variants
    def _admit_paged_fn(
        self, kp, vp, tok, posv, kcn, vcn, logits0, tbl_row, slot, plen,
        key, temp, topp, any_sample,
    ):
        """Paged admission: scatter the dense (layers, 1, Hc, L, Dh)
        prefill rows into the slot's pool blocks (``tbl_row`` (nb,) int32;
        unallocated entries point at null block 0 — dead writes), then the
        same first-token selection as the dense admit."""
        import jax.numpy as jnp
        from jax import lax

        layers, _, Hc, L, Dh = kcn.shape
        kb = kcn[:, 0].reshape(layers, Hc, self.nb, self.bs, Dh)
        vb = vcn[:, 0].reshape(layers, Hc, self.nb, self.bs, Dh)
        kp = kp.at[:, tbl_row].set(
            kb.transpose(0, 2, 1, 3, 4).astype(kp.dtype)
        )
        vp = vp.at[:, tbl_row].set(
            vb.transpose(0, 2, 1, 3, 4).astype(vp.dtype)
        )
        tok0 = self.dec._select_multi(
            logits0,
            key,
            jnp.reshape(temp, (1,)),
            jnp.reshape(topp, (1,)),
            jnp.reshape(temp > 0, (1,)),
            self.top_k,
            any_sample,
        )
        tok = lax.dynamic_update_slice(tok, tok0, (slot,))
        posv = lax.dynamic_update_slice(
            posv, jnp.reshape(plen, (1,)).astype(posv.dtype), (slot,)
        )
        return kp, vp, tok, posv, tok0

    def _chunk_paged_fn(
        self, params, kp, vp, tbl, tok, posv, key, active, limit,
        temp, topp, smask, any_sample,
    ):
        """Paged chunk: ``_chunk_fn`` with the block-pool forward (the
        block table is loop-constant — allocation happens host-side
        between chunks)."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        positions = jnp.arange(self.nb * self.bs)
        out0 = jnp.zeros((self.S, self.chunk), jnp.int32)

        def step(i, carry):
            kp, vp, tok, posv, key, out = carry
            live = jnp.logical_and(active, posv < limit)
            logits, kp, vp = self.dec._forward_multi_paged(
                params, kp, vp, tbl, tok, posv, positions
            )
            if any_sample:  # static: all-greedy programs carry no RNG ops
                key, sub = jax.random.split(key)
            else:
                sub = key
            nxt = self.dec._select_multi(
                logits, sub, temp, topp, smask, self.top_k, any_sample
            )
            nxt = jnp.where(live, nxt, tok)
            out = out.at[:, i].set(nxt)
            posv = jnp.where(live, posv + 1, posv)
            return kp, vp, nxt, posv, key, out

        return lax.fori_loop(
            0, self.chunk, step, (kp, vp, tok, posv, key, out0)
        )

    # ----------------------------------------------------------- prefix cache
    def _suffix_fn(self, params, kcp, vcp, toks, sfx_len, plen):
        """Prefill only a request's SUFFIX against a cached prefix row:
        ``kcp``/``vcp`` (layers, 1, Hc, L, Dh) hold the prefix K/V, ``toks``
        (1, SFX) the zero-padded suffix whose first ``sfx_len`` (traced)
        tokens are real, starting at position ``plen``.  Runs the decoder's
        chunk forward (the speculative-verify primitive): every suffix
        position's K/V is written before it is attended, and the pad
        positions' garbage K/V is never visible — each decode step
        overwrites its own position before the causal mask admits it.
        Returns (kc, vc, next-token logits (1, V) of the last REAL token)."""
        import jax.numpy as jnp
        from jax import lax

        positions = jnp.arange(self.L)
        logits_all, kc, vc = self.dec._forward_chunk(
            params, kcp, vcp, toks, jnp.reshape(plen, (1,)), positions
        )
        V = logits_all.shape[-1]
        logits = lax.dynamic_slice(
            logits_all, (0, sfx_len - 1, 0), (1, 1, V)
        )[:, 0]
        return kc, vc, logits

    def register_prefix(self, tokens) -> None:
        """Prefill ``tokens`` (1-D int array — a shared system prompt) once
        and cache its K/V; subsequent ``submit`` calls whose prompt starts
        with it skip re-prefilling the prefix.  Thread-safe; entries are
        LRU-evicted beyond ``max_prefixes`` and recomputed lazily after
        ``refresh_params``.  Each entry holds one slot-row of cache HBM."""
        tokens = np.asarray(tokens)
        if tokens.ndim != 1 or tokens.size < 1:
            raise ValueError("prefix must be a non-empty 1-D token array")
        if tokens.size + 1 > self.L:
            raise ValueError(
                f"prefix length {tokens.size} leaves no room under "
                f"max_len {self.L}"
            )
        self._prefix_entry(tuple(int(t) for t in tokens))

    def _prefix_entry(self, key: tuple) -> dict:
        """Get-or-(re)compute the cache entry for prefix ``key``.
        Serialised on ``_prefix_lock`` — callers are both user threads
        (``register_prefix``) and the engine loop (``_admit``)."""
        import jax.numpy as jnp

        with self._prefix_lock:
            entry = self._prefixes.get(key)
            if entry is None or entry["ver"] != self._params_ver:
                plen = len(key)
                prompt = np.zeros((1, self.L), np.int32)
                prompt[0, :plen] = key
                kcn, vcn, logits0 = self._prefill_j(
                    self.params, jnp.asarray(prompt), jnp.int32(plen)
                )
                self._prefix_clock += 1
                entry = {
                    "plen": plen, "kc": kcn, "vc": vcn, "logits": logits0,
                    "ver": self._params_ver, "used": self._prefix_clock,
                }
                self._prefixes[key] = entry
                while len(self._prefixes) > self.max_prefixes:
                    oldest = min(
                        self._prefixes, key=lambda k: self._prefixes[k]["used"]
                    )
                    del self._prefixes[oldest]
            self._prefix_clock += 1
            entry["used"] = self._prefix_clock
            return entry

    def _match_prefix(self, prompt: np.ndarray):
        """Longest registered prefix that is a proper-or-full prefix of
        ``prompt`` (leaving generation headroom handled by the caller)."""
        best = None
        with self._prefix_lock:
            keys = list(self._prefixes)
        for key in keys:
            n = len(key)
            if n <= prompt.size and best is not None and n <= len(best):
                continue
            if n <= prompt.size and np.array_equal(
                prompt[:n], np.asarray(key, prompt.dtype)
            ):
                best = key
        return best

    # ------------------------------------------------------------- lifecycle
    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def close(self):
        """Stop the engine thread; unfinished requests fail with
        RuntimeError."""
        self._stop = True
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None
        err = RuntimeError("engine closed")
        for req in self._pending + [r for r in self._slot_req if r is not None]:
            if not req.done():
                req._finish(err)
        while True:
            try:
                self._queue.get_nowait()._finish(err)
            except queue.Empty:
                break
            except AttributeError:
                break

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def refresh_params(self):
        """Pick up live weight updates: the engine re-gathers + re-preps
        the model's parameters between chunks (training-while-serving)."""
        self._refresh = True

    # --------------------------------------------------------------- submit
    def submit(
        self, prompt, new_tokens: int, temperature: float = 0.0,
        top_p=None, eos_id=None,
    ) -> InflightHandle:
        """Queue a single sequence: ``prompt`` is a 1-D int token array;
        generation emits ``new_tokens`` tokens (stopping early at
        ``eos_id``, inclusive).  ``temperature > 0`` samples (with the
        engine's static ``top_k`` and this request's ``top_p``); 0 is
        greedy.  Thread-safe; returns immediately."""
        prompt = np.asarray(prompt)
        if prompt.ndim != 1 or prompt.size < 1:
            raise ValueError("prompt must be a non-empty 1-D token array")
        new_tokens = int(new_tokens)
        if new_tokens < 1:
            raise ValueError("new_tokens must be >= 1")
        if prompt.size + new_tokens > self.L:
            raise ValueError(
                f"prompt_len {prompt.size} + new_tokens {new_tokens} "
                f"exceeds max_len {self.L}"
            )
        if self._stop or self._thread is None:
            raise RuntimeError("engine is not running")
        req = InflightHandle(prompt, new_tokens, eos_id)
        req.temperature = float(temperature)
        req.top_p = float(top_p) if top_p else 0.0
        self._queue.put(req)
        return req

    def generate(self, prompt, new_tokens: int, **kw) -> np.ndarray:
        """Blocking convenience: ``submit`` + ``result``."""
        return self.submit(prompt, new_tokens, **kw).result()

    # ----------------------------------------------------------- engine loop
    def _loop(self):
        try:
            while not self._stop:
                self._drain_queue(block=not self._active.any())
                if self._refresh:
                    self._refresh = False
                    self.params = self.dec._prep_jit(self.dec._gather())
                    self._params_ver += 1  # prefix K/V recomputes on next use
                while self._pending and not self._active.all():
                    slot = int(np.flatnonzero(~self._active)[0])
                    if not self._admit(self._pending[0], slot):
                        break  # paged pool exhausted: wait for retirements
                    self._pending.pop(0)
                if self._active.any():
                    self._run_chunk()
        except Exception as e:  # fail loudly: resolve every waiter
            for req in self._pending + [
                r for r in self._slot_req if r is not None
            ]:
                if req is not None and not req.done():
                    req._finish(e)
            self._stop = True
            raise

    def _drain_queue(self, block: bool):
        try:
            self._pending.append(
                self._queue.get(timeout=0.05 if block else 0.0)
            )
        except queue.Empty:
            pass
        while True:
            try:
                self._pending.append(self._queue.get_nowait())
            except queue.Empty:
                return

    def _admit(self, req, slot: int) -> bool:
        """Admit ``req`` into ``slot``.  Returns False (request NOT
        consumed) when the paged pool lacks the blocks to cover the
        request's full position range — natural backpressure until a
        retirement frees blocks."""
        import jax
        import jax.numpy as jnp

        plen = req.prompt.size
        if self.paged:
            # blocks covering positions [0, plen + new_tokens - 1]
            n_need = (plen + req.new_tokens - 1) // self.bs + 1
            if len(self._free) < n_need:
                return False
        pkey = self._match_prefix(req.prompt.astype(np.int64))
        if pkey is None:
            self.prefix_misses += 1
            prompt = np.zeros((1, self.L), np.int32)
            prompt[0, :plen] = req.prompt
            kcn, vcn, logits0 = self._prefill_j(
                self.params, jnp.asarray(prompt), jnp.int32(plen)
            )
        else:
            self.prefix_hits += 1
            entry = self._prefix_entry(pkey)
            sfx = np.asarray(req.prompt[entry["plen"]:], np.int32)
            if sfx.size == 0:  # whole prompt is the cached prefix
                kcn, vcn, logits0 = entry["kc"], entry["vc"], entry["logits"]
            else:
                bucket = self._suffix_bucket(int(sfx.size), entry["plen"])
                toks = np.zeros((1, bucket), np.int32)
                toks[0, : sfx.size] = sfx
                kcn, vcn, logits0 = self._suffix_j(
                    self.params, entry["kc"], entry["vc"],
                    jnp.asarray(toks), jnp.int32(sfx.size),
                    jnp.int32(entry["plen"]),
                )
        self._key, sub = jax.random.split(self._key)
        any_s = req.temperature > 0.0
        if self.paged:
            blocks = [self._free.pop() for _ in range(n_need)]
            tbl_row = np.zeros(self.nb, np.int32)
            tbl_row[:n_need] = blocks
            self._kp, self._vp, self._tok, self._pos, tok0 = self._admit_j(
                self._kp, self._vp, self._tok, self._pos, kcn, vcn,
                logits0, jnp.asarray(tbl_row), jnp.int32(slot),
                jnp.int32(plen), sub, jnp.float32(req.temperature),
                jnp.float32(req.top_p), any_s,
            )
            self._tbl[slot] = tbl_row
            self._blocks_of[slot] = blocks
        else:
            self._kc, self._vc, self._tok, self._pos, tok0 = self._admit_j(
                self._kc, self._vc, self._tok, self._pos, kcn, vcn, logits0,
                jnp.int32(slot), jnp.int32(plen), sub,
                jnp.float32(req.temperature), jnp.float32(req.top_p), any_s,
            )
        t0 = int(np.asarray(tok0)[0])
        req.tokens.append(t0)
        if req.new_tokens == 1 or (
            req.eos_id is not None and t0 == req.eos_id
        ):
            req._finish()
            if self.paged:
                self._release_blocks(slot)
            return True
        self._slot_req[slot] = req
        self._active[slot] = True
        # the slot's LAST token sits at position plen + new_tokens - 1
        self._limit[slot] = plen + req.new_tokens - 1
        self._temp[slot] = req.temperature
        self._topp[slot] = req.top_p
        self._smask[slot] = any_s
        return True

    def _suffix_bucket(self, sfx_size: int, plen: int) -> int:
        """Padded width for a prefix-hit's suffix forward: power-of-2 (so
        ``_suffix_j`` compiles at most log2(L) variants) CAPPED at the
        cache headroom past the prefix.  The cap matters: the B=1 scatter
        in ``_forward_chunk`` writes the WHOLE bucket at start=plen with
        one ``dynamic_update_slice``, and XLA clamps an out-of-range start
        to L-bucket — which would shift every real suffix row and corrupt
        cached prefix rows.  Always >= sfx_size because
        prompt + new_tokens <= L is validated at submit."""
        bucket = 1 << (sfx_size - 1).bit_length()
        return min(bucket, self.L - plen)

    def _release_blocks(self, slot: int):
        self._free.extend(self._blocks_of[slot])
        self._blocks_of[slot] = []
        self._tbl[slot] = 0

    def _run_chunk(self):
        import jax.numpy as jnp

        if self.paged:
            self._kp, self._vp, self._tok, self._pos, self._key, out = (
                self._chunk_j(
                    self.params, self._kp, self._vp, jnp.asarray(self._tbl),
                    self._tok, self._pos, self._key, self._active,
                    self._limit, self._temp, self._topp, self._smask,
                    bool(self._smask[self._active].any()),
                )
            )
        else:
            self._kc, self._vc, self._tok, self._pos, self._key, out = (
                self._chunk_j(
                    self.params, self._kc, self._vc, self._tok, self._pos,
                    self._key, self._active, self._limit, self._temp,
                    self._topp, self._smask,
                    bool(self._smask[self._active].any()),
                )
            )
        out = np.asarray(out)  # ONE readback per chunk
        for slot in np.flatnonzero(self._active):
            req = self._slot_req[slot]
            take = min(self.chunk, req.new_tokens - len(req.tokens))
            toks = out[slot, :take].tolist()
            if req.eos_id is not None and req.eos_id in toks:
                toks = toks[: toks.index(req.eos_id) + 1]
            req.tokens.extend(toks)
            if (
                len(req.tokens) >= req.new_tokens
                or (req.eos_id is not None and toks and toks[-1] == req.eos_id)
            ):
                req._finish()
                self._slot_req[slot] = None
                self._active[slot] = False
                self._smask[slot] = False
                if self.paged:
                    self._release_blocks(slot)
