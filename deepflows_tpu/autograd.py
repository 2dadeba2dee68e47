"""Grad-mode switch (reference: `DeepFlows/autograd.py:3-74`).

A global boolean plus ``no_grad`` / ``enable_grad`` context managers that are
also usable as decorators, exactly like the reference (and torch).
"""

from __future__ import annotations

import functools

_grad_enabled: bool = True


def is_grad_enable() -> bool:
    return _grad_enabled


# torch-style alias
def is_grad_enabled() -> bool:
    return _grad_enabled


def set_grad_enabled(mode: bool) -> None:
    global _grad_enabled
    _grad_enabled = bool(mode)


class _GradMode:
    """Context manager / decorator flipping the global grad flag."""

    _mode: bool = True

    def __init__(self):
        self._prev = None

    def __enter__(self):
        self._prev = is_grad_enable()
        set_grad_enabled(self._mode)
        return self

    def __exit__(self, exc_type, exc, tb):
        set_grad_enabled(self._prev)
        return False

    def __call__(self, fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with self.__class__():
                return fn(*args, **kwargs)

        return wrapper


class no_grad(_GradMode):
    """Disable gradient recording inside the block (or decorated function)."""

    _mode = False


class enable_grad(_GradMode):
    """Re-enable gradient recording inside the block (or decorated function)."""

    _mode = True
