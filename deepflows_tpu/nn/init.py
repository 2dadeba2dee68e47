"""Weight initializers (reference: `DeepFlows/nn/init.py`).

In-place initializers rebind ``tensor.data`` with fresh device RNG draws
under ``no_grad`` — the functional analog of the reference's
upload-into-existing-handle scheme (`init.py:13-30`), which has no meaning on
immutable XLA buffers.
"""

from __future__ import annotations

import math

from ..autograd import no_grad
from ..backend import BackendTensor
from ..tensor import Tensor


def _set(tensor: Tensor, array) -> Tensor:
    # device factories (device.randn) return WRAPPED BackendTensors while
    # kernel-protocol calls return raw arrays — unwrap so _wrap never
    # double-wraps (array-of-BackendTensor poisons every downstream op)
    if isinstance(array, BackendTensor):
        array = array.array
    tensor.data = BackendTensor._wrap(array, tensor.device)
    return tensor


@no_grad()
def uniform_(tensor: Tensor, low: float = 0.0, high: float = 1.0) -> Tensor:
    return _set(
        tensor, tensor.device.uniform(low, high, tensor.shape, dtype=tensor.dtype)
    )


@no_grad()
def normal_(tensor: Tensor, mean: float = 0.0, std: float = 1.0) -> Tensor:
    # randn takes *shape (latent bug: passing the tuple positionally made
    # the shape ((d0, d1),) — caught by the Embedding init)
    draw = tensor.device.randn(*tensor.shape, dtype=tensor.dtype)
    return _set(tensor, draw * std + mean)


@no_grad()
def fill_(tensor: Tensor, val: float) -> Tensor:
    return _set(tensor, tensor.device.fill(tensor.shape, val, dtype=tensor.dtype))


def zeros_(tensor: Tensor) -> Tensor:
    return fill_(tensor, 0.0)


def ones_(tensor: Tensor) -> Tensor:
    return fill_(tensor, 1.0)


def constant_(tensor: Tensor, val: float) -> Tensor:
    return fill_(tensor, val)


def calculate_gain(nonlinearity: str, param=None) -> float:
    linear_fns = [
        "linear",
        "conv1d",
        "conv2d",
        "conv3d",
        "conv_transpose1d",
        "conv_transpose2d",
        "conv_transpose3d",
    ]
    if nonlinearity in linear_fns or nonlinearity == "sigmoid":
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        if param is None:
            negative_slope = 0.01
        elif isinstance(param, (bool,)):
            raise ValueError(f"negative_slope {param} not a valid number")
        elif isinstance(param, (int, float)):
            negative_slope = param
        else:
            raise ValueError(f"negative_slope {param} not a valid number")
        return math.sqrt(2.0 / (1 + negative_slope**2))
    if nonlinearity == "selu":
        return 3.0 / 4
    raise ValueError(f"Unsupported nonlinearity {nonlinearity}")


def _calculate_fan_in_and_fan_out(tensor: Tensor):
    dimensions = tensor.ndim
    if dimensions < 2:
        raise ValueError(
            "Fan in and fan out can not be computed for tensor with fewer than 2 dimensions"
        )
    num_input_fmaps = tensor.shape[1]
    num_output_fmaps = tensor.shape[0]
    receptive_field_size = 1
    if dimensions > 2:
        for s in tensor.shape[2:]:
            receptive_field_size *= s
    fan_in = num_input_fmaps * receptive_field_size
    fan_out = num_output_fmaps * receptive_field_size
    return fan_in, fan_out


def _calculate_correct_fan(tensor: Tensor, mode: str):
    mode = mode.lower()
    if mode not in ["fan_in", "fan_out"]:
        raise ValueError(f"Mode {mode} not supported, please use fan_in or fan_out")
    fan_in, fan_out = _calculate_fan_in_and_fan_out(tensor)
    return fan_in if mode == "fan_in" else fan_out


def xavier_uniform_(tensor: Tensor, gain: float = 1.0) -> Tensor:
    fan_in, fan_out = _calculate_fan_in_and_fan_out(tensor)
    std = gain * math.sqrt(2.0 / float(fan_in + fan_out))
    a = math.sqrt(3.0) * std
    return uniform_(tensor, -a, a)


def xavier_normal_(tensor: Tensor, gain: float = 1.0) -> Tensor:
    fan_in, fan_out = _calculate_fan_in_and_fan_out(tensor)
    std = gain * math.sqrt(2.0 / float(fan_in + fan_out))
    return normal_(tensor, 0.0, std)


def kaiming_uniform_(
    tensor: Tensor, a: float = 0, mode: str = "fan_in", nonlinearity: str = "leaky_relu"
) -> Tensor:
    fan = _calculate_correct_fan(tensor, mode)
    gain = calculate_gain(nonlinearity, a)
    std = gain / math.sqrt(fan)
    bound = math.sqrt(3.0) * std
    return uniform_(tensor, -bound, bound)


def kaiming_normal_(
    tensor: Tensor, a: float = 0, mode: str = "fan_in", nonlinearity: str = "leaky_relu"
) -> Tensor:
    fan = _calculate_correct_fan(tensor, mode)
    gain = calculate_gain(nonlinearity, a)
    std = gain / math.sqrt(fan)
    return normal_(tensor, 0.0, std)
