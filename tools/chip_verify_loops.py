"""On-chip (axon TPU) verification: carried-output-buffer loops at B>=16.

The seq2seq._decode comment documents a fori_loop carrying the generated-
token buffer that miscomputed on the axon platform at B>=~16 (every
iteration read the INITIAL carry).  Three shipped loops still carry the
buffer: KVCacheDecoder._decode, LlamaKVCacheDecoder._decode_stream, and
SpeculativeDecoder._spec_loop.  This runs all three at B=32 on the REAL
chip and cross-checks greedy outputs (spec == one-shot is a hard
bit-identical contract; stream == dense within max_len likewise)."""
import numpy as np, jax
print("backend:", jax.devices()[0].platform, flush=True)
import deepflows_tpu as df
from deepflows_tpu import models
from deepflows_tpu.models.decoding import KVCacheDecoder
from deepflows_tpu.models.speculative import SpeculativeDecoder

V = 64
B, PLEN, NEW = 32, 6, 20
rng = np.random.default_rng(3)
prompts = rng.integers(0, V, (B, PLEN)).astype(np.int64)

df.manual_seed(0)
target = models.TransformerLM(vocab_size=V, dim=48, depth=3, num_heads=4, max_len=48, device="tpu")
df.manual_seed(7)
draft = models.TransformerLM(vocab_size=V, dim=24, depth=1, num_heads=2, max_len=48, device="tpu")

dec = KVCacheDecoder(target)
print("one-shot decode (fori_loop carrying tokens, B=32)...", flush=True)
base = dec.generate(prompts, NEW)
# host-driven per-token reference: no device loop at all
print("host-step reference...", flush=True)
import jax.numpy as jnp
params = dec._prep_jit(dec._gather())
full = np.zeros((B, target.max_len), np.int32); full[:, :PLEN] = prompts
kc, vc, logits0 = dec._prefill_jit(params, jnp.asarray(full), PLEN)
toks = [np.argmax(np.asarray(logits0), -1).astype(np.int64)]
pos = PLEN
positions = jnp.arange(target.max_len)
fwd = jax.jit(dec._forward_one)
for _ in range(NEW - 1):
    logits, kc, vc = fwd(params, kc, vc, jnp.asarray(toks[-1].astype(np.int32)), jnp.int32(pos), positions)
    toks.append(np.argmax(np.asarray(logits), -1).astype(np.int64))
    pos += 1
ref = np.concatenate([prompts, np.stack(toks, 1)], 1)
ok_decode = np.array_equal(base, ref)
print("fori-loop _decode == host-step reference:", ok_decode, flush=True)

print("speculative decode (while_loop carrying tokens, B=32)...", flush=True)
spec = SpeculativeDecoder(target, draft, gamma=4)
got = spec.generate(prompts, NEW)
ok_spec = np.array_equal(got, base)
print("spec == one-shot:", ok_spec, flush=True)
if not ok_spec:
    bad = np.flatnonzero((got != base).any(1))
    print("mismatching rows:", bad[:8], "\nspec:", got[bad[0]], "\nbase:", base[bad[0]])

print("llama stream decode (fori_loop ring, B=32, wraps)...", flush=True)
df.manual_seed(11)
small = models.LlamaLM(vocab_size=V, dim=32, depth=2, num_heads=4, num_kv_heads=2, max_len=16, device="tpu", window=4)
df.manual_seed(11)
big = models.LlamaLM(vocab_size=V, dim=32, depth=2, num_heads=4, num_kv_heads=2, max_len=64, device="tpu", window=4)
want = KVCacheDecoder(big).generate(prompts, 34)     # dense, no wrap
got = KVCacheDecoder(small).generate(prompts, 34)    # streams, ring wraps
ok_stream = np.array_equal(got, want)
print("stream(B=32, wraps) == big-context twin:", ok_stream, flush=True)
print("ALL OK" if (ok_decode and ok_spec and ok_stream) else "MISMATCH", flush=True)
