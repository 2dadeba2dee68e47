"""nn.Module — module tree with attribute-routing registration.

Rebuild of `DeepFlows/nn/modules/module.py` (856 LoC): `_parameters` /
`_buffers` / `_modules` OrderedDicts populated via ``__setattr__`` routing,
traversal (named_parameters/buffers/children/modules, apply), train/eval
(including the reference's behavior of flipping the *global* grad flag,
`module.py:764` — eval() disables gradient recording everywhere, and the
bundled workloads rely on it), serialization helpers, and device movement.

Deliberate fixes vs the reference (documented divergences, SURVEY §7.1):

- ``move(device)`` transfers ALL parameters and buffers generically — in the
  reference only Linear/Conv overrode ``move`` to actually copy weights
  (`linear.py:64-67`, `conv.py:63-66`), so e.g. BatchNorm stats were left
  behind.
- ``state_dict()`` includes registered buffers (BN running stats were
  silently dropped by the reference checkpoint path, SURVEY §5).
- default device is the TPU when available (the reference hard-coded
  ``Device('cuda')``, `module.py:84`).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Dict, Iterator, Optional, Set, Tuple, TypeVar, Union

import numpy as np

from ...autograd import set_grad_enabled
from ...backend import BackendTensor, Device, default_accelerator
from ...tensor import Tensor
from ..parameter import Parameter

T = TypeVar("T", bound="Module")


def _addindent(s_, num_spaces):
    s = s_.split("\n")
    if len(s) == 1:
        return s_
    first = s.pop(0)
    s = [(num_spaces * " ") + line for line in s]
    return first + "\n" + "\n".join(s)


class Module:
    """Base class for all neural-network modules."""

    training: bool

    def __init__(self) -> None:
        object.__setattr__(self, "training", True)
        object.__setattr__(self, "_parameters", OrderedDict())
        object.__setattr__(self, "_buffers", OrderedDict())
        object.__setattr__(self, "_non_persistent_buffers_set", set())
        object.__setattr__(self, "_modules", OrderedDict())
        object.__setattr__(self, "device", default_accelerator())

    forward: Callable[..., Any]

    def forward(self, *input):  # type: ignore[no-redef]
        raise NotImplementedError(
            f'Module [{type(self).__name__}] is missing the required "forward" function'
        )

    def __call__(self, *input, **kwargs):
        return self.forward(*input, **kwargs)

    # ------------------------------------------------------------ registration
    def register_buffer(
        self, name: str, tensor: Optional[Tensor], persistent: bool = True
    ) -> None:
        if "_buffers" not in self.__dict__:
            raise AttributeError("cannot assign buffer before Module.__init__() call")
        if not isinstance(name, str):
            raise TypeError("buffer name should be a string")
        if "." in name or name == "":
            raise KeyError(f'buffer name can\'t contain "." or be empty: {name!r}')
        if hasattr(self, name) and name not in self._buffers:
            raise KeyError(f"attribute '{name}' already exists")
        if tensor is not None and not isinstance(tensor, Tensor):
            tensor = Tensor(tensor)
        self._buffers[name] = tensor
        if persistent:
            self._non_persistent_buffers_set.discard(name)
        else:
            self._non_persistent_buffers_set.add(name)

    def register_parameter(self, name: str, param: Optional[Parameter]) -> None:
        if "_parameters" not in self.__dict__:
            raise AttributeError(
                "cannot assign parameter before Module.__init__() call"
            )
        if "." in name or name == "":
            raise KeyError(f'parameter name can\'t contain "." or be empty: {name!r}')
        if param is not None and not isinstance(param, Parameter):
            raise TypeError(f"cannot assign '{type(param)}' as parameter '{name}'")
        self._parameters[name] = param

    def add_module(self, name: str, module: Optional["Module"]) -> None:
        if module is not None and not isinstance(module, Module):
            raise TypeError(f"{type(module)} is not a Module subclass")
        if not isinstance(name, str):
            raise TypeError("module name should be a string")
        if hasattr(self, name) and name not in self._modules:
            raise KeyError(f"attribute '{name}' already exists")
        if "." in name or name == "":
            raise KeyError(f'module name can\'t contain "." or be empty: {name!r}')
        self._modules[name] = module

    def register_module(self, name: str, module: Optional["Module"]) -> None:
        self.add_module(name, module)

    # ------------------------------------------------------------ lookup
    def get_submodule(self, target: str) -> "Module":
        if target == "":
            return self
        mod = self
        for item in target.split("."):
            if not hasattr(mod, item):
                raise AttributeError(f"{mod._get_name()} has no attribute `{item}`")
            mod = getattr(mod, item)
            if not isinstance(mod, Module):
                raise AttributeError(f"`{item}` is not a Module")
        return mod

    def get_parameter(self, target: str) -> Parameter:
        module_path, _, param_name = target.rpartition(".")
        mod = self.get_submodule(module_path)
        if not hasattr(mod, param_name):
            raise AttributeError(f"{mod._get_name()} has no attribute `{param_name}`")
        param = getattr(mod, param_name)
        if not isinstance(param, Parameter):
            raise AttributeError(f"`{param_name}` is not a Parameter")
        return param

    def get_buffer(self, target: str) -> Tensor:
        module_path, _, buffer_name = target.rpartition(".")
        mod = self.get_submodule(module_path)
        if buffer_name not in mod._buffers:
            raise AttributeError(f"`{buffer_name}` is not a buffer")
        return mod._buffers[buffer_name]

    def apply(self: T, fn: Callable[["Module"], None]) -> T:
        for module in self.children():
            module.apply(fn)
        fn(self)
        return self

    # ------------------------------------------------------------ attributes
    def __getattr__(self, name: str) -> Any:
        if "_parameters" in self.__dict__:
            _parameters = self.__dict__["_parameters"]
            if name in _parameters:
                return _parameters[name]
        if "_buffers" in self.__dict__:
            _buffers = self.__dict__["_buffers"]
            if name in _buffers:
                return _buffers[name]
        if "_modules" in self.__dict__:
            modules = self.__dict__["_modules"]
            if name in modules:
                return modules[name]
        raise AttributeError(
            f"'{type(self).__name__}' object has no attribute '{name}'"
        )

    def __setattr__(self, name: str, value: Union[Tensor, "Module"]) -> None:
        def remove_from(*dicts_or_sets):
            for d in dicts_or_sets:
                if name in d:
                    if isinstance(d, dict):
                        del d[name]
                    else:
                        d.discard(name)

        params = self.__dict__.get("_parameters")
        if params is not None and isinstance(value, Parameter):
            remove_from(self.__dict__, self._buffers, self._modules)
            self.register_parameter(name, value)
            return
        if params is not None and name in params:
            if value is not None and not isinstance(value, Parameter):
                raise TypeError(f"cannot assign '{type(value)}' as parameter '{name}'")
            self.register_parameter(name, value)
            return
        modules = self.__dict__.get("_modules")
        if modules is not None and isinstance(value, Module):
            remove_from(self.__dict__, self._parameters, self._buffers)
            modules[name] = value
            return
        if modules is not None and name in modules:
            if value is not None and not isinstance(value, Module):
                raise TypeError(f"cannot assign '{type(value)}' as child module '{name}'")
            modules[name] = value
            return
        buffers = self.__dict__.get("_buffers")
        if buffers is not None and name in buffers:
            if value is not None and not isinstance(value, Tensor):
                raise TypeError(f"cannot assign '{type(value)}' as buffer '{name}'")
            buffers[name] = value
            return
        object.__setattr__(self, name, value)

    def __delattr__(self, name):
        if name in self._parameters:
            del self._parameters[name]
        elif name in self._buffers:
            del self._buffers[name]
            self._non_persistent_buffers_set.discard(name)
        elif name in self._modules:
            del self._modules[name]
        else:
            object.__delattr__(self, name)

    # ------------------------------------------------------------ traversal
    def _named_members(self, get_members_fn, prefix="", recurse=True, remove_duplicate=True):
        memo = set()
        modules = (
            self.named_modules(prefix=prefix, remove_duplicate=remove_duplicate)
            if recurse
            else [(prefix, self)]
        )
        for module_prefix, module in modules:
            for k, v in get_members_fn(module):
                if v is None or id(v) in memo:
                    continue
                if remove_duplicate:
                    memo.add(id(v))
                yield (module_prefix + ("." if module_prefix else "") + k, v)

    def parameters(self, recurse: bool = True) -> Iterator[Parameter]:
        for _, param in self.named_parameters(recurse=recurse):
            yield param

    def named_parameters(
        self, prefix: str = "", recurse: bool = True, remove_duplicate: bool = True
    ) -> Iterator[Tuple[str, Parameter]]:
        yield from self._named_members(
            lambda m: m._parameters.items(),
            prefix=prefix,
            recurse=recurse,
            remove_duplicate=remove_duplicate,
        )

    def buffers(self, recurse: bool = True) -> Iterator[Tensor]:
        for _, buf in self.named_buffers(recurse=recurse):
            yield buf

    def named_buffers(
        self, prefix: str = "", recurse: bool = True, remove_duplicate: bool = True
    ) -> Iterator[Tuple[str, Tensor]]:
        yield from self._named_members(
            lambda m: m._buffers.items(),
            prefix=prefix,
            recurse=recurse,
            remove_duplicate=remove_duplicate,
        )

    def children(self) -> Iterator["Module"]:
        for _, module in self.named_children():
            yield module

    def named_children(self) -> Iterator[Tuple[str, "Module"]]:
        memo = set()
        for name, module in self._modules.items():
            if module is not None and module not in memo:
                memo.add(module)
                yield name, module

    def modules(self) -> Iterator["Module"]:
        for _, module in self.named_modules():
            yield module

    def named_modules(
        self,
        memo: Optional[Set["Module"]] = None,
        prefix: str = "",
        remove_duplicate: bool = True,
    ):
        if memo is None:
            memo = set()
        if self not in memo:
            if remove_duplicate:
                memo.add(self)
            yield prefix, self
            for name, module in self._modules.items():
                if module is None:
                    continue
                submodule_prefix = prefix + ("." if prefix else "") + name
                yield from module.named_modules(memo, submodule_prefix, remove_duplicate)

    # ------------------------------------------------------------ modes
    def train(self: T, mode: bool = True) -> T:
        """Set train/eval mode recursively.  NOTE: like the reference
        (`module.py:764`), this also flips the GLOBAL grad flag — the bundled
        workloads call ``model.eval()`` to disable recording for their eval
        loops and ``model.train()`` to re-enable it."""
        self.training = mode
        for module in self.children():
            module.train(mode)
        set_grad_enabled(mode)
        return self

    def eval(self: T) -> T:
        return self.train(False)

    def requires_grad_(self: T, requires_grad: bool = True) -> T:
        for p in self.parameters():
            p.requires_grad = requires_grad
        return self

    def zero_grad(self, set_to_none: bool = True) -> None:
        for p in self.parameters():
            if set_to_none:
                p.grad = None
            elif p.grad is not None:
                p.grad = p.grad * 0.0

    # ------------------------------------------------------------ serialization
    def params_and_buffers_saved(self) -> Dict[str, Tensor]:
        """name -> Tensor for all parameters and persistent buffers
        (the reference omitted buffers, `module.py:458-469`; see SURVEY §5)."""
        out: Dict[str, Tensor] = OrderedDict()
        for name, p in self.named_parameters():
            out[name] = p
        for name, b in self.named_buffers():
            mod_path, _, bname = name.rpartition(".")
            owner = self.get_submodule(mod_path) if mod_path else self
            if bname not in owner._non_persistent_buffers_set:
                out[name] = b
        return out

    def state_dict(self) -> Dict[str, np.ndarray]:
        """Plain numpy state dict (params + persistent buffers)."""
        return OrderedDict(
            (k, v.numpy()) for k, v in self.params_and_buffers_saved().items()
        )

    def load_state_dict(self, state_dict: Dict[str, Any], strict: bool = True):
        own = self.params_and_buffers_saved()
        missing, unexpected = [], []
        for name, value in state_dict.items():
            if name not in own:
                unexpected.append(name)
                continue
            target = own[name]
            if isinstance(value, Tensor):
                arr = value.numpy()
            elif isinstance(value, BackendTensor):
                arr = value.numpy()
            elif hasattr(value, "detach"):  # torch duck-typing
                arr = value.detach().cpu().numpy()
            else:
                arr = np.asarray(value)
            if tuple(arr.shape) != tuple(target.shape):
                if strict:
                    raise ValueError(
                        f"size mismatch for {name}: checkpoint {arr.shape} vs model {tuple(target.shape)}"
                    )
                continue
            target.data = BackendTensor(arr, device=target.device, dtype=target.dtype)
        for name in own:
            if name not in state_dict:
                missing.append(name)
        if strict and (missing or unexpected):
            raise KeyError(
                f"load_state_dict strict failure: missing={missing}, unexpected={unexpected}"
            )
        return missing, unexpected

    def load_weights(self, weights: Dict[str, Any]):
        """Non-strict load (reference `module.py:540-542`)."""
        return self.load_state_dict(weights, strict=False)

    # ------------------------------------------------------------ devices
    def to(self, device):
        device = Device(device)
        self.move(device)
        return self

    def move(self, device):
        """Move every parameter and buffer to ``device`` (generic — fixes the
        reference's base ``move`` that only set ``.device``)."""
        device = Device(device)
        self.device = device
        for module in self.children():
            module.move(device)
        for p in self._parameters.values():
            if p is not None:
                p.data = p.data.to(device)
        for name, b in self._buffers.items():
            if b is not None:
                b.data = b.data.to(device)
        return self

    def to_dtype(self, dtype, cast_buffers: bool = False):
        """Cast every parameter to ``dtype`` in place (torch's
        ``.half()/.bfloat16()`` analog).  BN running stats and other buffers
        stay in their dtype unless ``cast_buffers`` (normalization statistics
        want f32).  bf16 params + ``optim.Adam(stochastic_round=True)`` is
        the full-bf16-weight training recipe."""
        for module in self.children():
            module.to_dtype(dtype, cast_buffers)
        for p in self._parameters.values():
            if p is not None:
                p.data = p.data.astype(dtype)
        if cast_buffers:
            for b in self._buffers.values():
                if b is not None:
                    b.data = b.data.astype(dtype)
        return self

    def bfloat16(self):
        import jax.numpy as jnp

        return self.to_dtype(jnp.bfloat16)

    def tpu(self):
        return self.to("tpu")

    def cuda(self):
        # script-compat alias (reference scripts call .cuda())
        return self.to("tpu")

    def cpu(self):
        return self.to("cpu")

    # ------------------------------------------------------------ repr
    def _get_name(self):
        return self.__class__.__name__

    def extra_repr(self) -> str:
        return ""

    def __repr__(self):
        extra_lines = []
        extra_repr = self.extra_repr()
        if extra_repr:
            extra_lines = extra_repr.split("\n")
        child_lines = []
        for key, module in self._modules.items():
            mod_str = _addindent(repr(module), 2)
            child_lines.append("(" + key + "): " + mod_str)
        lines = extra_lines + child_lines
        main_str = self._get_name() + "("
        if lines:
            if len(extra_lines) == 1 and not child_lines:
                main_str += extra_lines[0]
            else:
                main_str += "\n  " + "\n  ".join(lines) + "\n"
        main_str += ")"
        return main_str
