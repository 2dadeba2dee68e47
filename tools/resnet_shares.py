"""ResNet50-224 step-time accounting (r4 VERDICT item 7): where do the
other 72% of the MXU cycles go at MFU 0.278?

Method: ablation timing on the real chip (30-step chains, one readback,
median of 3 — the only sound protocol through the tunnel) of nested
program prefixes — forward-only, forward+backward (grads returned, no
optimizer), full train step — plus a BN-free variant, each with the
compiled program's OWN HLO flops and bytes so every row carries its
roofline: t_mem = bytes / 819 GB/s, t_mxu = flops / 197 TF/s on v5e.

Shares by subtraction: backward = (fwd+bwd) - fwd; optimizer+EMA =
full - (fwd+bwd).  The BN-free variant bounds what BatchNorm's
normalization/EMA traffic costs end to end.

Usage: python tools/resnet_shares.py [batch] [image]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TF = 197e12
PEAK_BW = 819e9


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def _chain(fn, steps=30, repeats=3):
    fn()  # warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = fn()
        _ = np.asarray(out).ravel()[0]  # one readback per chain
        ts.append(1000.0 * (time.perf_counter() - t0) / steps)
    return statistics.median(ts), ts


def main(batch=128, image=224):
    import jax
    import jax.numpy as jnp

    import deepflows_tpu as df
    from deepflows_tpu import models, nn, optim
    from deepflows_tpu.jit import CompiledEvalStep, CompiledTrainStep

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((batch, 3, image, image)).astype(np.float32)
    )
    y = jax.device_put(rng.integers(0, 10, batch).astype(np.int32))

    rows = []

    def row(name, ms, flops, bts, samples):
        r = {
            "program": name,
            "ms_per_step": round(ms, 2),
            "samples_ms": [round(s, 2) for s in samples],
            "hlo_tflop": round(flops / 1e12, 3) if flops else None,
            "hlo_gb": round(bts / 1e9, 2) if bts else None,
            "roofline_mem_ms": round(1000 * bts / PEAK_BW, 2) if bts else None,
            "roofline_mxu_ms": round(1000 * flops / PEAK_TF, 2) if flops else None,
            "mfu": round(flops / (ms / 1000) / PEAK_TF, 4) if flops else None,
        }
        rows.append(r)
        print(json.dumps(r), flush=True)
        return r

    def build(bn=True):
        df.manual_seed(0)
        m = models.ResNet50(num_classes=10, small_input=False, device="tpu")
        if not bn:
            from deepflows_tpu.nn.modules.module import Module

            class _Id(Module):
                def forward(self, t):
                    return t

            def strip(mod):
                for nme, ch in list(mod._modules.items()):
                    if ch.__class__.__name__.startswith("BatchNorm"):
                        mod._modules[nme] = _Id()
                    else:
                        strip(ch)

            strip(m)
        return m

    # ---- forward only
    model = build()
    ev = CompiledEvalStep(model)
    pa = [p.data.array for p in ev._params]
    ba = [b.data.array for b in ev._buffers]
    f_fwd, b_fwd = _cost(ev._jitted.lower(pa, ba, x).compile())
    ms_fwd, s_fwd = _chain(lambda: ev._jitted(pa, ba, x))
    row("forward_only", ms_fwd, f_fwd, b_fwd, s_fwd)

    # ---- forward + backward (grads as outputs, no optimizer update) —
    # the SAME tape backward the train step compiles, minus pure_update:
    # mirrors jit._pure_step_locked's trace swap with the update removed
    opt = optim.Adam(model.parameters(), lr=5e-3, weight_decay=5e-4)
    step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss(),
                             compute_dtype=jnp.bfloat16, donate=False)

    from deepflows_tpu import Graph, Tensor, set_grad_enabled
    from deepflows_tpu.backend import BackendTensor
    from deepflows_tpu.jit import _TRACE_LOCK

    dev = step._device
    cd = step.compute_dtype

    def _fwd_bwd(param_arrays, buffer_arrays, xb, yb):
        with _TRACE_LOCK:
            saved_p = [p.data for p in step._params]
            saved_b = [b.data for b in step._buffers]
            saved_tape = Graph.node_list
            Graph.node_list = []
            set_grad_enabled(True)
            try:
                for p, arr in zip(step._params, param_arrays):
                    p.data = BackendTensor._wrap(
                        arr.astype(cd) if cd is not None else arr, dev
                    )
                    p.grad = None
                    Graph.add(p)
                for b_, arr in zip(step._buffers, buffer_arrays):
                    b_.data = BackendTensor._wrap(arr, dev)
                xt = Tensor(BackendTensor._wrap(
                    xb.astype(cd) if cd is not None else xb, dev))
                yt = Tensor(BackendTensor._wrap(yb, dev))
                loss = step.criterion(step.model(xt), yt)
                loss.backward(retain_graph=True)
                grads = [
                    p.grad.array if p.grad is not None else None
                    for p in step._params
                ]
                return loss.data.array, [g for g in grads if g is not None]
            finally:
                for p, d_ in zip(step._params, saved_p):
                    p.data = d_
                    p.grad = None
                    p.children.clear()
                    p.parents.clear()
                for b_, d_ in zip(step._buffers, saved_b):
                    b_.data = d_
                Graph.node_list = saved_tape

    pa2 = [p.data.array for p in step._params]
    ba2 = [b.data.array for b in step._buffers]
    fb = jax.jit(_fwd_bwd)
    f_fb, b_fb = _cost(fb.lower(pa2, ba2, x, y).compile())
    ms_fb, s_fb = _chain(lambda: fb(pa2, ba2, x, y)[0])
    row("forward_backward", ms_fb, f_fb, b_fb, s_fb)

    # ---- full train step (forward+backward+Adam+BN EMA)
    lr = np.float32(opt.lr)
    f_full, b_full = _cost(
        step._jitted.lower(pa2, ba2, opt._state, lr, np.int32(0), x, y).compile()
    )

    state = {"p": pa2, "b": ba2, "o": opt._state, "t": 0}

    def full2():
        out = step._jitted(state["p"], state["b"], state["o"], lr,
                           np.int32(state["t"]), x, y)
        state["t"] += 1
        state["p"], state["b"], state["o"] = out[1], out[2], out[3]
        return out[0]

    ms_full, s_full = _chain(full2)
    row("full_train_step", ms_full, f_full, b_full, s_full)

    # ---- BN-free full step (bounds BatchNorm's end-to-end cost)
    model_nb = build(bn=False)
    opt_nb = optim.Adam(model_nb.parameters(), lr=5e-3, weight_decay=5e-4)
    step_nb = CompiledTrainStep(model_nb, opt_nb, nn.CrossEntropyLoss(),
                                compute_dtype=jnp.bfloat16)
    pa3 = [p.data.array for p in step_nb._params]
    ba3 = [b.data.array for b in step_nb._buffers]
    f_nb, b_nb = _cost(
        step_nb._jitted.lower(pa3, ba3, opt_nb._state, lr, np.int32(0), x, y
                              ).compile()
    )
    st3 = {"p": pa3, "b": ba3, "o": opt_nb._state, "t": 0}

    def full_nb():
        out = step_nb._jitted(st3["p"], st3["b"], st3["o"], lr,
                              np.int32(st3["t"]), x, y)
        st3["t"] += 1
        st3["p"], st3["b"], st3["o"] = out[1], out[2], out[3]
        return out[0]

    ms_nb, s_nb = _chain(full_nb)
    row("full_step_no_batchnorm", ms_nb, f_nb, b_nb, s_nb)

    by = {r["program"]: r for r in rows}
    if "forward_backward" in by:
        shares = {
            "forward_ms": by["forward_only"]["ms_per_step"],
            "backward_ms": round(
                by["forward_backward"]["ms_per_step"]
                - by["forward_only"]["ms_per_step"], 2),
            "optimizer_and_ema_ms": round(
                by["full_train_step"]["ms_per_step"]
                - by["forward_backward"]["ms_per_step"], 2),
            "batchnorm_bound_ms": round(
                by["full_train_step"]["ms_per_step"]
                - by["full_step_no_batchnorm"]["ms_per_step"], 2),
        }
        print(json.dumps({"shares": shares}), flush=True)


if __name__ == "__main__":
    a = [int(t) for t in sys.argv[1:]]
    main(*a)
