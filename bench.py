"""Benchmark: training throughput (images/sec/chip) on the real TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N, ...}

Methodology (r1 items 2+3; r2 item 1):
- ``value`` is the MEDIAN of BENCH_REPEATS (default 5) timed repeats, each a
  chain of BENCH_STEPS compiled steps ending in a host readback — the only
  sound timing shape through this environment's TPU tunnel (BENCH_NOTES.md).
  ``spread_pct`` = (max-min)/median over the repeats; ``samples`` lists them.
- ``vs_rawjax`` anchors against a pure-JAX twin of the same model/optimizer
  (`rawjax_twin.py`: jax.grad + hand-rolled Adam, no tape).  Framework and
  twin are timed INTERLEAVED (A/B/A/B within one session) and the published
  ratio is the median of the PER-ROUND paired ratios, so a drift in tunnel
  state between rounds cancels instead of landing on one side (r2 VERDICT
  item 1: the round-2 artifact timed all framework repeats before all twin
  repeats and captured 0.745 at 26% spread on a dispatch-bound config).
- The no-env default is the FLOP-bound flagship — ResNet50-224 bf16 bs128 —
  whose step time (~57 ms) dwarfs tunnel dispatch jitter (0.1-0.5% spread
  across rounds) rather than the tiny dispatch-bound CIFAR CNN.
- ``mfu`` = achieved FLOP/s ÷ chip peak (bf16 MXU peak by device kind), with
  FLOPs/step taken from the compiled program's own cost analysis.
- ``vs_baseline`` is the speedup over eager per-op tape execution (the
  faithful stand-in for the reference's per-op CUDA kernel dispatch,
  `DeepFlows/backend/backend_src/ndarray_backend_cuda.cu`), since the
  reference publishes no throughput numbers (BASELINE.md).  It is measured
  AFTER the interleaved headline timing so its compile warm-up cannot
  disturb the numbers of record, and is budget-capped.

Env knobs: BENCH_MODEL (resnet50|cifar10_cnn|resnet18|vit_tiny|transformer_lm),
BENCH_BATCH, BENCH_SEQLEN (LM sequence length),
BENCH_STEPS, BENCH_REPEATS, BENCH_DTYPE (f32|bf16), BENCH_IMAGE (input size),
BENCH_EAGER=0 (skip eager baseline), BENCH_RAWJAX=0 (skip twin),
BENCH_IMPL=rawjax (report the twin as the headline instead),
BENCH_REMAT=1 (rematerialise residual blocks — nn.Remat).
"""

from __future__ import annotations

import json
import os
import statistics
import time

import numpy as np

# bf16 MXU peak TFLOP/s per chip, by jax device_kind substring
_PEAK_TFLOPS = [
    ("v5 lite", 197.0),  # v5e
    ("v5e", 197.0),
    ("v5p", 459.0),
    ("v5", 459.0),
    ("v6 lite", 918.0),  # trillium
    ("v6e", 918.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 46.0),
]

# per-model no-env defaults; the global default model is the FLOP-bound
# flagship so the artifact of record is tunnel-jitter-proof.
# eager=False: the eager tape at ResNet50-224 scale holds EVERY intermediate
# live (no XLA memory planning) and exhausts HBM at bs128 — and warming its
# ~100s of per-op compiles through the tunnel takes >10 min even at bs16 —
# so the default flagship run reports vs_baseline=null with a note; eager
# ratios for feasible configs live in BENCH_NOTES.md (r02: 69x on the CNN).
_MODEL_DEFAULTS = {
    "resnet50": {"batch": 128, "image": 224, "dtype": "bf16", "eager": False},
    "resnet18": {"batch": 256, "image": 32, "dtype": "bf16", "eager": True},
    "cifar10_cnn": {"batch": 256, "image": 32, "dtype": "f32", "eager": True},
    "vit_tiny": {"batch": 256, "image": 32, "dtype": "bf16", "eager": True},
    "transformer_lm": {"batch": 64, "image": 32, "dtype": "bf16", "eager": True},
}


def _peak_tflops(device_kind: str):
    kind = device_kind.lower()
    for sub, peak in _PEAK_TFLOPS:
        if sub in kind:
            return peak
    return None


def _flops_of(jitted, *args):
    """FLOPs from the LOWERED (uncompiled) program when the backend supports
    it (within ~2% of the compiled count, no duplicate compile); falls back
    to compiling — the TPU backend only implements cost analysis on the
    compiled executable."""
    try:
        lowered = jitted.lower(*args)
    except Exception:
        return None
    for stage in (lambda: lowered.cost_analysis(),
                  lambda: lowered.compile().cost_analysis()):
        try:
            ca = stage()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) if ca else 0.0
            if flops:
                return flops
        except Exception:
            continue
    return None


def main() -> None:
    import deepflows_tpu as df
    from deepflows_tpu import Tensor, models, nn, optim
    from deepflows_tpu.jit import CompiledTrainStep

    model_name = os.environ.get("BENCH_MODEL", "resnet50")
    defaults = _MODEL_DEFAULTS.get(model_name, _MODEL_DEFAULTS["cifar10_cnn"])
    batch_size = int(os.environ.get("BENCH_BATCH", str(defaults["batch"])))
    steps = int(os.environ.get("BENCH_STEPS", "200"))
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "5")))
    impl = os.environ.get("BENCH_IMPL", "framework")
    warmup = 5

    dtype_name = os.environ.get("BENCH_DTYPE", defaults["dtype"])
    compute_dtype = None
    if dtype_name in ("bf16", "bfloat16"):
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
        dtype_name = "bf16"

    image_size = int(os.environ.get("BENCH_IMAGE", str(defaults["image"])))
    seq_len = int(os.environ.get("BENCH_SEQLEN", "128"))
    vocab = 256

    rng = np.random.default_rng(0)
    if model_name == "transformer_lm":
        # token sequences; "images/sec" is sequences/sec for the LM
        x = rng.integers(0, vocab, (batch_size, seq_len)).astype(np.int32)
        y = rng.integers(0, vocab, (batch_size, seq_len)).astype(np.int32)
    else:
        x = rng.standard_normal((batch_size, 3, image_size, image_size)).astype(
            np.float32
        )
        y = rng.integers(0, 10, batch_size).astype(np.int32)
    # stage the batch on device once: the bench measures chip throughput, not
    # host->device tunnel bandwidth (12.6 MB/step at bs=256 otherwise)
    import jax

    device_kind = jax.devices()[0].device_kind
    peak = _peak_tflops(device_kind)
    x, y = jax.device_put(x), jax.device_put(y)

    df.manual_seed(0)

    remat = os.environ.get("BENCH_REMAT", "0") == "1"

    def build_model():
        if model_name == "resnet18":
            return models.ResNet18(
                num_classes=10, small_input=image_size <= 64, device="tpu",
                remat=remat,
            )
        if model_name == "resnet50":
            return models.ResNet50(
                num_classes=10, small_input=image_size <= 64, device="tpu",
                remat=remat,
            )
        if model_name == "transformer_lm":
            # BENCH_FLASH: 1 forces the Pallas flash-attention path, 0 the
            # naive materialized-softmax path, unset = auto (flash on TPU)
            flash = {"1": True, "0": False}.get(os.environ.get("BENCH_FLASH"))
            return models.TransformerLM(
                vocab_size=vocab,
                max_len=seq_len,
                dim=int(os.environ.get("BENCH_LM_DIM", "512")),
                depth=int(os.environ.get("BENCH_LM_DEPTH", "6")),
                num_heads=int(os.environ.get("BENCH_LM_HEADS", "8")),
                device="tpu",
                remat=remat,
                flash=flash,
            )
        if model_name == "vit_tiny":
            return models.ViT_Tiny(
                image_size=image_size,
                patch_size=4 if image_size <= 64 else 16,
                num_classes=10,
                device="tpu",
                remat=remat,
            )
        return models.CIFAR10_CNN(device="tpu")

    # with remat on, the non-remat rawjax twin is not the same program —
    # a vs_rawjax ratio would misread the remat trade as framework overhead;
    # vit/lm have no twin at all
    has_twin = model_name in ("cifar10_cnn", "resnet18", "resnet50")
    if impl == "rawjax" and not has_twin:
        raise SystemExit(f"no rawjax twin for BENCH_MODEL={model_name}")
    want_twin = (
        has_twin
        and not remat
        and (impl == "rawjax" or os.environ.get("BENCH_RAWJAX", "1") == "1")
    )

    # ---------------------------------------------------------- framework
    fw_chain = None
    framework_flops = None
    fwd_flops = None
    step = None
    if impl != "rawjax":
        model = build_model()
        opt = optim.Adam(model.parameters(), lr=5e-3, weight_decay=5e-4)
        # CrossEntropyLoss accepts (B, L, V) sequence logits directly
        step = CompiledTrainStep(
            model, opt, nn.CrossEntropyLoss(), compute_dtype=compute_dtype
        )

        for _ in range(warmup):
            loss = step(x, y)
        _ = float(loss)  # sync

        def fw_chain():
            t0 = time.perf_counter()
            for _ in range(steps):
                loss = step(x, y)
            _ = float(loss)  # the single true sync point per repeat
            return batch_size * steps / (time.perf_counter() - t0)

        param_arrays = [p.data.array for p in step._params]
        buffer_arrays = [b.data.array for b in step._buffers]
        framework_flops = _flops_of(
            step._jitted,
            param_arrays,
            buffer_arrays,
            opt._state,
            np.float32(opt.lr),
            np.int32(0),
            x,
            y,
        )
        # independent FLOP estimate: forward-only program x3 (the standard
        # fwd+bwd analytic convention) — cross-checks the train-step HLO count
        from deepflows_tpu.jit import CompiledEvalStep

        ev = CompiledEvalStep(model)
        fwd_flops = _flops_of(
            ev._jitted,
            [p.data.array for p in ev._params],
            [b.data.array for b in ev._buffers],
            x,
        )

    # ---------------------------------------------------------- rawjax twin
    raw_chain = None
    rawjax_flops = None
    if want_twin:
        import rawjax_twin

        jitted, params, state, opt_state, xr, yr = rawjax_twin.make_train_step(
            model_name,
            batch_size,
            image_size,
            compute_dtype=compute_dtype,
            lr=5e-3,
            weight_decay=5e-4,
        )
        xr, yr = jax.device_put(xr), jax.device_put(yr)
        rawjax_flops = _flops_of(jitted, params, state, opt_state, np.int32(0), xr, yr)
        _rt = {"params": params, "state": state, "opt": opt_state, "t": 0}
        for _ in range(warmup):
            loss, _rt["params"], _rt["state"], _rt["opt"] = jitted(
                _rt["params"], _rt["state"], _rt["opt"], np.int32(_rt["t"]), xr, yr
            )
            _rt["t"] += 1
        _ = float(loss)

        def raw_chain():
            t0 = time.perf_counter()
            for _ in range(steps):
                loss, _rt["params"], _rt["state"], _rt["opt"] = jitted(
                    _rt["params"], _rt["state"], _rt["opt"], np.int32(_rt["t"]), xr, yr
                )
                _rt["t"] += 1
            _ = float(loss)
            return batch_size * steps / (time.perf_counter() - t0)

    # ------------------------------------------- interleaved paired timing
    # A/B/A/B within one session: each round times the framework chain and
    # the twin chain back to back, so slow tunnel windows hit both sides of
    # the ratio equally.  vs_rawjax = median of per-round ratios.
    fw_samples, raw_samples, paired_ratios = [], [], []
    for _ in range(repeats):
        if fw_chain is not None:
            fw_samples.append(fw_chain())
        if raw_chain is not None:
            raw_samples.append(raw_chain())
        if fw_chain is not None and raw_chain is not None:
            paired_ratios.append(fw_samples[-1] / raw_samples[-1])

    framework_ips = statistics.median(fw_samples) if fw_samples else None
    rawjax_ips = statistics.median(raw_samples) if raw_samples else None
    vs_rawjax = (
        round(statistics.median(paired_ratios), 3) if paired_ratios else None
    )

    if impl == "rawjax":
        headline_ips, headline_samples = rawjax_ips, raw_samples
        flops_per_step = rawjax_flops
    else:
        headline_ips, headline_samples = framework_ips, fw_samples
        flops_per_step = framework_flops

    # ------------------------------------------------------ eager baseline
    # measured LAST: its per-op compile warm-up must not disturb the
    # interleaved numbers of record
    vs_baseline = None
    vs_baseline_note = None
    eager_default = "1" if defaults.get("eager", True) else "0"
    if os.environ.get("BENCH_EAGER", eager_default) != "1":
        if impl != "rawjax" and not defaults.get("eager", True):
            vs_baseline_note = (
                "eager tape at this config exhausts HBM (holds all "
                "intermediates live); eager ratios on feasible configs are "
                "in BENCH_NOTES.md (r02: 69x on cifar10_cnn bs256)"
            )
    elif impl != "rawjax":
        df.manual_seed(0)
        emodel = build_model()
        eopt = optim.Adam(emodel.parameters(), lr=5e-3, weight_decay=5e-4)
        crit = nn.CrossEntropyLoss()
        eager_steps = max(2, int(os.environ.get("BENCH_EAGER_STEPS", "3")))

        def eager_one():
            out = emodel(Tensor(x, device="tpu"))
            loss = crit(out, Tensor(y, device="tpu"))
            eopt.zero_grad()
            loss.backward()
            eopt.step()
            return float(loss.numpy())

        eager_one()  # warm per-op compile caches
        t0 = time.perf_counter()
        done = 0
        budget_s = float(os.environ.get("BENCH_EAGER_BUDGET_S", "120"))
        for _ in range(eager_steps):
            eager_one()
            done += 1
            if time.perf_counter() - t0 > budget_s:
                break  # keep the whole bench inside the driver's timeout
        dt = time.perf_counter() - t0
        eager_ips = batch_size * done / dt
        vs_baseline = round(headline_ips / eager_ips, 2)

    spread_pct = (
        round(100.0 * (max(headline_samples) - min(headline_samples)) / headline_ips, 1)
        if len(headline_samples) > 1
        else None
    )
    mfu = None
    achieved_tflops = None
    if flops_per_step and headline_ips:
        achieved = flops_per_step * (headline_ips / batch_size)  # FLOP/s
        achieved_tflops = round(achieved / 1e12, 2)
        if peak:
            mfu = round(achieved / (peak * 1e12), 4)
    # conservative cross-check: 3x forward-program FLOPs (fwd + ~2x fwd bwd)
    mfu_3xfwd = None
    if fwd_flops and headline_ips and peak:
        mfu_3xfwd = round(
            3 * fwd_flops * (headline_ips / batch_size) / (peak * 1e12), 4
        )

    out = {
        "metric": f"{model_name}_train_throughput",
        "value": round(headline_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": vs_baseline,
        "vs_baseline_note": vs_baseline_note,
        "impl": impl,
        "remat": remat,  # resnet/vit/lm models; ignored for cifar10_cnn
        "seq_len": seq_len if model_name == "transformer_lm" else None,
        "batch_size": batch_size,
        "steps": steps,
        "repeats": repeats,
        "spread_pct": spread_pct,
        "samples": [round(s, 1) for s in headline_samples],
        "dtype": dtype_name,
        "image_size": image_size,
        "device_kind": device_kind,
        "flops_per_step": flops_per_step,
        "fwd_flops": fwd_flops,
        "achieved_tflops": achieved_tflops,
        "peak_tflops_bf16": peak,
        "mfu": mfu,
        "mfu_3xfwd": mfu_3xfwd,
        "timing": "interleaved-paired" if paired_ratios else "single-sided",
        "vs_rawjax": vs_rawjax,
        "vs_rawjax_rounds": [round(r, 3) for r in paired_ratios] or None,
        "rawjax_ips": round(rawjax_ips, 1) if rawjax_ips else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
