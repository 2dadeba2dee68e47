"""PRNG key plumbing for on-device randomness (dropout etc.).

Eagerly, keys split off a process-global key.  Inside a compiled train step
(`deepflows_tpu.jit`), the step receives a fresh key argument per call and
installs it as the *trace key*; each consumer folds in a trace-time counter,
so every dropout site gets an independent stream and every step a fresh one —
all without host round-trips (the reference uploaded host-numpy masks,
`DeepFlows/nn/modules/dropout.py:16-28`).
"""

from __future__ import annotations

from .config import config

_trace_key = None
_trace_counter = 0
_eager_key = None


def _jr():
    import jax.random as jr

    return jr


def manual_seed(seed: int) -> None:
    global _eager_key, _trace_key, _trace_counter
    _eager_key = _jr().key(seed)
    _trace_key = None
    _trace_counter = 0


def set_trace_key(key) -> None:
    global _trace_key, _trace_counter
    _trace_key = key
    _trace_counter = 0


def clear_trace_key() -> None:
    global _trace_key
    _trace_key = None


def get_trace_key():
    return _trace_key


def next_key():
    global _eager_key, _trace_counter
    if _trace_key is not None:
        k = _jr().fold_in(_trace_key, _trace_counter)
        _trace_counter += 1
        return k
    if _eager_key is None:
        _eager_key = _jr().key(config.seed)
    _eager_key, sub = _jr().split(_eager_key)
    return sub
