"""nn package (reference: `DeepFlows/nn/__init__.py:1-3`)."""

from . import functional  # noqa: F401
from . import init  # noqa: F401
from .jax_bridge import jax_function  # noqa: F401
from .modules import *  # noqa: F401,F403
from .modules import __all__ as _modules_all
from .parameter import Parameter  # noqa: F401

__all__ = ["functional", "init", "Parameter", "jax_function"] + list(
    _modules_all
)
