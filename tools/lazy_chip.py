"""On-chip lazy-mode vs CompiledTrainStep A/B (round 4, r3 VERDICT item 3).

r3 measured ResNet50-224 f32 bs64 (readback every 10 steps) at lazy
117 ms/step vs compiled 61.3 ms/step (52%), bounded by ~69 ms/step of
Python re-recording.  Round 4's structural replay (template-matched steps
skip re-recording) is supposed to lift lazy to >= 80% of the compiled
path.  Protocol: unmodified imperative loop under deepflows_tpu.lazy,
float(loss) readback every RB steps, interleaved A/B chains, median of 3.

Usage: python tools/lazy_chip.py [steps] [readback_every]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(steps=50, rb=10, batch=64, image=224):
    import jax

    import deepflows_tpu as df
    from deepflows_tpu import Tensor, models, nn, optim
    from deepflows_tpu import lazy
    from deepflows_tpu.jit import CompiledTrainStep

    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, 3, image, image)).astype(np.float32)
    y = rng.integers(0, 10, batch).astype(np.int32)
    xd, yd = jax.device_put(x), jax.device_put(y)

    # ---------------- compiled reference
    df.manual_seed(0)
    model_c = models.ResNet50(num_classes=10, small_input=False, device="tpu")
    opt_c = optim.Adam(model_c.parameters(), lr=1e-3)
    step_c = CompiledTrainStep(model_c, opt_c, nn.CrossEntropyLoss())
    for _ in range(3):
        loss = step_c(xd, yd)
    _ = float(loss)

    def chain_compiled():
        t0 = time.perf_counter()
        for i in range(steps):
            loss = step_c(xd, yd)
            if (i + 1) % rb == 0:
                _ = float(loss)
        return 1000.0 * (time.perf_counter() - t0) / steps

    # ---------------- lazy imperative loop
    # enable BEFORE model creation (the DEEPFLOWS_LAZY=1 placement): params
    # are lazy leaves from the start, so every step matches one step
    # template.  (Round 5: enable() now adopts live concrete arrays as
    # lazy leaves, so MID-program enable replays at the same template —
    # measured below as lazy_mid.)
    lazy.enable()
    df.manual_seed(0)
    model_l = models.ResNet50(num_classes=10, small_input=False, device="tpu")
    opt_l = optim.Adam(model_l.parameters(), lr=1e-3)
    crit = nn.CrossEntropyLoss()

    def lazy_step():
        out = model_l(Tensor(xd, device="tpu"))
        loss = crit(out, Tensor(yd, device="tpu"))
        opt_l.zero_grad()
        loss.backward()
        opt_l.step()
        return loss

    for _ in range(3):  # warm: record + compile the step fragment
        loss = lazy_step()
    _ = float(loss.numpy())

    def chain_lazy():
        t0 = time.perf_counter()
        for i in range(steps):
            loss = lazy_step()
            if (i + 1) % rb == 0:
                _ = float(loss.numpy())
        return 1000.0 * (time.perf_counter() - t0) / steps

    cs, ls = [], []
    for _ in range(3):
        cs.append(chain_compiled())
        ls.append(chain_lazy())
    lazy.disable()
    stats = lazy.lazy_stats()

    # ---------------- lazy MID-PROGRAM enable (r4 VERDICT item 6): the
    # natural notebook flow — model built eagerly, lazy.enable() after.
    # enable() adopts the live concrete params/buffers as lazy leaves, so
    # this must replay within ~1.2x of the enable-before-build placement.
    df.manual_seed(0)
    model_m = models.ResNet50(num_classes=10, small_input=False, device="tpu")
    opt_m = optim.Adam(model_m.parameters(), lr=1e-3)

    def mid_step():
        out = model_m(Tensor(xd, device="tpu"))
        loss = crit(out, Tensor(yd, device="tpu"))
        opt_m.zero_grad()
        loss.backward()
        opt_m.step()
        return loss

    lazy.enable()
    for _ in range(3):
        loss = mid_step()
    _ = float(loss.numpy())

    def chain_mid():
        t0 = time.perf_counter()
        for i in range(steps):
            loss = mid_step()
            if (i + 1) % rb == 0:
                _ = float(loss.numpy())
        return 1000.0 * (time.perf_counter() - t0) / steps

    ms = [chain_mid() for _ in range(3)]
    lazy.disable()
    stats_mid = lazy.lazy_stats()

    out = {
        "config": f"resnet50-{image} f32 bs{batch} rb{rb}",
        "compiled_ms_per_step": round(statistics.median(cs), 1),
        "lazy_ms_per_step": round(statistics.median(ls), 1),
        "lazy_mid_enable_ms_per_step": round(statistics.median(ms), 1),
        "lazy_over_compiled": round(
            statistics.median(cs) / statistics.median(ls), 3),
        "mid_over_pre": round(
            statistics.median(ms) / statistics.median(ls), 3),
        "compiled_samples": [round(s, 1) for s in cs],
        "lazy_samples": [round(s, 1) for s in ls],
        "lazy_mid_samples": [round(s, 1) for s in ms],
        "replay_stats": stats,
        "replay_stats_mid": stats_mid,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    a = [int(t) for t in sys.argv[1:]]
    main(*a)
