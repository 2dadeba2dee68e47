"""nn package (reference: `DeepFlows/nn/__init__.py:1-3`)."""

from . import functional  # noqa: F401
from . import init  # noqa: F401
from .jax_bridge import jax_function  # noqa: F401
from .lora import (  # noqa: F401
    LoRALinear,
    apply_lora,
    load_lora_state_dict,
    lora_state_dict,
    merge_lora,
    unmerge_lora,
)
from .modules import *  # noqa: F401,F403
from .modules import __all__ as _modules_all
from .parameter import Parameter  # noqa: F401

__all__ = [
    "functional", "init", "Parameter", "jax_function",
    "LoRALinear", "apply_lora", "merge_lora", "unmerge_lora",
    "lora_state_dict", "load_lora_state_dict",
] + list(_modules_all)
