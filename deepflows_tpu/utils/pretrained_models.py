"""Pretrained-weight pipeline (reference: `DeepFlows/utils/pretrained_models.py`).

Same stages and function surface as the reference: download (torchvision,
gated — this environment has no torchvision and no egress, so a local torch
checkpoint path is the supported source), convert to a deepflows-native
pickle, cache under a pretrained dir with a metadata sidecar, and load into a
model (non-strict, `load_weights`).

Conversion rules (replacing the reference's identity name-mapping JSONs,
`model_param_mappings/*_complete_mapping.json`, with explicit shape
adaptation the reference lacked):

- names map 1:1 (our model zoo uses torchvision-compatible module names);
  an optional per-model mapping JSON can override;
- Linear: torch weight (out,in) -> ours (in,out) [transpose]; bias (out,) ->
  (1,out)  (weight convention: `DeepFlows/nn/modules/linear.py:40`);
- Conv2d bias (out,) -> (1,out,1,1); Conv1d bias -> (1,out,1);
- BatchNorm weight/bias/running_mean/running_var (C,) -> (1,C,1,1);
- ``num_batches_tracked`` is dropped.
"""

from __future__ import annotations

import json
import logging
import os
import pickle
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_PRETRAINED_DIR = os.path.join(
    os.path.expanduser("~"), ".deepflows_tpu", "pretrained"
)

SUPPORTED_MODELS = ["resnet18", "resnet50", "mobilenet_v1", "mobilenet_v2", "vgg16"]

_MAPPING_DIR = os.path.join(os.path.dirname(__file__), "model_param_mappings")


def list_available_models() -> List[str]:
    return list(SUPPORTED_MODELS)


def load_model_param_mapping(model_name: str) -> Optional[Dict[str, str]]:
    """Optional torch-name -> deepflows-name override mapping (reference
    `pretrained_models.py:45-83`); identity when no JSON is present."""
    path = os.path.join(_MAPPING_DIR, f"{model_name}_complete_mapping.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def ensure_pretrained_dir_exists(pretrained_dir: str = DEFAULT_PRETRAINED_DIR) -> None:
    os.makedirs(pretrained_dir, exist_ok=True)


def get_pretrained_model_path(
    model_name: str, pretrained_dir: str = DEFAULT_PRETRAINED_DIR
) -> str:
    return os.path.join(pretrained_dir, f"{model_name}_deepflows.pkl")


def get_model_info_path(
    model_name: str, pretrained_dir: str = DEFAULT_PRETRAINED_DIR
) -> str:
    return os.path.join(pretrained_dir, f"{model_name}_info.json")


def save_model_metadata(
    model_name: str,
    metadata: Dict[str, Any],
    pretrained_dir: str = DEFAULT_PRETRAINED_DIR,
) -> None:
    ensure_pretrained_dir_exists(pretrained_dir)
    with open(get_model_info_path(model_name, pretrained_dir), "w") as f:
        json.dump(metadata, f, indent=2)


def load_model_metadata(
    model_name: str, pretrained_dir: str = DEFAULT_PRETRAINED_DIR
) -> Dict[str, Any]:
    path = get_model_info_path(model_name, pretrained_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


# ------------------------------------------------------------------ convert
def _adapt_array(
    name: str, arr: np.ndarray, target_shape, is_linear_weight: bool = False
) -> Optional[np.ndarray]:
    """Reshape/transpose a torch-layout array to this framework's layout for
    the same logical parameter.  ``is_linear_weight`` must be decided by the
    caller from the TARGET param (2-D weight ⇒ Linear): a square torch Linear
    weight matches the target shape untransposed, so shape alone cannot
    disambiguate."""
    arr = np.asarray(arr)
    target_shape = tuple(target_shape)
    # Linear weight: torch (out,in) -> ours (in,out), ALWAYS — incl. square
    if is_linear_weight and arr.ndim == 2 and arr.T.shape == target_shape:
        return np.ascontiguousarray(arr.T)
    if arr.shape == target_shape:
        return arr
    if arr.ndim == 2 and arr.T.shape == target_shape:
        return np.ascontiguousarray(arr.T)
    # Bias / BN vectors: (C,) -> (1,C), (1,C,1), (1,C,1,1)
    if arr.ndim == 1 and int(np.prod(target_shape)) == arr.shape[0]:
        return arr.reshape(target_shape)
    return None


def convert_torch_state_dict(
    model, torch_state_dict: Dict[str, Any], mapping: Optional[Dict[str, str]] = None
) -> Dict[str, np.ndarray]:
    """Convert a torch-layout state dict into this framework's layout for
    ``model``.  Returns {deepflows_name: ndarray}."""
    own = model.params_and_buffers_saved()
    out: Dict[str, np.ndarray] = {}
    skipped: List[str] = []
    for tname, value in torch_state_dict.items():
        if tname.endswith("num_batches_tracked"):
            continue
        name = mapping.get(tname, tname) if mapping else tname
        if name not in own:
            skipped.append(tname)
            continue
        arr = (
            value.detach().cpu().numpy() if hasattr(value, "detach") else np.asarray(value)
        )
        target = own[name]
        is_linear_weight = target.ndim == 2 and name.endswith("weight")
        adapted = _adapt_array(name, arr, target.shape, is_linear_weight)
        if adapted is None:
            logger.warning(
                "shape mismatch for %s: torch %s vs model %s — skipped",
                name,
                arr.shape,
                tuple(own[name].shape),
            )
            skipped.append(tname)
            continue
        out[name] = adapted.astype(np.float32)
    if skipped:
        logger.info("skipped %d entries: %s", len(skipped), skipped[:8])
    return out


def to_torch_layout(name: str, arr: np.ndarray) -> np.ndarray:
    """Convert ONE array from this framework's layout to torch layout, by
    parameter name: Linear 2-D weights transpose back to (out,in), and
    (1,C,1,..)-shaped vector params/buffers flatten to (C,).  Also applies
    to per-parameter optimizer state (same shapes as the parameter)."""
    if arr.ndim == 2 and name.endswith("weight"):
        return np.ascontiguousarray(arr.T)
    if arr.ndim > 1 and arr.shape[0] == 1 and name.split(".")[-1] in (
        "bias",
        "weight",
        "running_mean",
        "running_var",
    ) and 1 in arr.shape:
        # (1,C,1,..) vectors back to (C,) — only when truly a vector
        if int(np.prod(arr.shape)) == arr.shape[1]:
            return arr.reshape(arr.shape[1])
    return arr


def export_torch_state_dict(model) -> Dict[str, np.ndarray]:
    """Inverse conversion: this framework's params/buffers in torch layout
    (for interop and round-trip testing)."""
    return {
        name: to_torch_layout(name, t.numpy())
        for name, t in model.params_and_buffers_saved().items()
    }


def download_pretrained_model(
    model_name: str,
    source: str = None,
    pretrained_dir: str = DEFAULT_PRETRAINED_DIR,
) -> str:
    """Download torch weights via torchvision (reference
    `pretrained_models.py:160-244`).  Gated: raises a clear error when
    torchvision (or network access) is unavailable; pass a local ``.pth``
    to ``convert_weights_to_deepflows`` instead."""
    if model_name not in SUPPORTED_MODELS:
        raise ValueError(f"unsupported model {model_name}; choose from {SUPPORTED_MODELS}")
    ensure_pretrained_dir_exists(pretrained_dir)
    try:
        import torch
        import torchvision.models as tvm
    except ImportError as e:
        raise RuntimeError(
            "torchvision is not available in this environment; obtain a torch "
            f"state_dict for {model_name} out of band and call "
            "convert_weights_to_deepflows(model_name, <path>)"
        ) from e
    factory = {
        "resnet18": lambda: tvm.resnet18(weights="IMAGENET1K_V1"),
        "resnet50": lambda: tvm.resnet50(weights="IMAGENET1K_V1"),
        # the reference actually downloads MobileNetV2 for its "v1"
        # (`convert_pretrained.py:139-143`); we keep v2 as the torch source
        # and document that v1 has no torchvision weights
        "mobilenet_v1": lambda: tvm.mobilenet_v2(weights="IMAGENET1K_V1"),
        "mobilenet_v2": lambda: tvm.mobilenet_v2(weights="IMAGENET1K_V1"),
        "vgg16": lambda: tvm.vgg16(weights="IMAGENET1K_V1"),
    }[model_name]
    tm = factory()
    path = os.path.join(pretrained_dir, f"{model_name}_torch.pth")
    torch.save(tm.state_dict(), path)
    return path


def _build_model(model_name: str, num_classes: int = 1000, device=None):
    from .. import models

    factory = {
        "resnet18": lambda: models.ResNet18(num_classes=num_classes, device=device),
        "resnet50": lambda: models.ResNet50(num_classes=num_classes, device=device),
        "mobilenet_v1": lambda: models.MobileNetV1(
            num_classes=num_classes, device=device
        ),
        "mobilenet_v2": lambda: models.MobileNetV2(
            num_classes=num_classes, device=device
        ),
        "vgg16": lambda: models.VGG16(num_classes=num_classes, device=device),
    }
    if model_name not in factory:
        raise ValueError(f"unsupported model {model_name}")
    return factory[model_name]()


def convert_weights_to_deepflows(
    model_name: str,
    source_weights_path: str,
    pretrained_dir: str = DEFAULT_PRETRAINED_DIR,
    source: str = "pytorch",
) -> str:
    """torch .pth -> deepflows pickle (reference `pretrained_models.py:246-299`)."""
    import torch

    ensure_pretrained_dir_exists(pretrained_dir)
    sd = torch.load(source_weights_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    model = _build_model(model_name, device="cpu")
    converted = convert_torch_state_dict(
        model, sd, mapping=load_model_param_mapping(model_name)
    )
    out_path = get_pretrained_model_path(model_name, pretrained_dir)
    with open(out_path, "wb") as f:
        pickle.dump(converted, f)
    save_model_metadata(
        model_name,
        {
            "source": source,
            "source_path": os.path.abspath(source_weights_path),
            "num_arrays": len(converted),
        },
        pretrained_dir,
    )
    return out_path


def get_pretrained_weights(
    model_name: str,
    pretrained_dir: str = DEFAULT_PRETRAINED_DIR,
    auto_download: bool = True,
) -> Dict[str, np.ndarray]:
    """Cache-or-download-and-convert (reference `pretrained_models.py:301-331`)."""
    path = get_pretrained_model_path(model_name, pretrained_dir)
    if not os.path.exists(path):
        if not auto_download:
            raise FileNotFoundError(path)
        torch_path = download_pretrained_model(model_name, pretrained_dir=pretrained_dir)
        convert_weights_to_deepflows(model_name, torch_path, pretrained_dir)
    with open(path, "rb") as f:
        return pickle.load(f)


def load_pretrained_model(
    model,
    model_name: str,
    pretrained_dir: str = DEFAULT_PRETRAINED_DIR,
    strict: bool = False,
):
    """Load converted weights into ``model`` (non-strict by default, like the
    reference's `load_weights`)."""
    weights = get_pretrained_weights(model_name, pretrained_dir)
    if strict:
        model.load_state_dict(weights, strict=True)
    else:
        model.load_weights(weights)
    return model


def create_model_with_pretrained_weights(
    model_name: str,
    pretrained_dir: str = DEFAULT_PRETRAINED_DIR,
    num_classes: int = 1000,
    device=None,
):
    """Build a zoo model and load its pretrained weights (the reference
    dynamically imported model classes from test scripts,
    `pretrained_models.py:426-450`; here the zoo is a proper library)."""
    model = _build_model(model_name, num_classes=num_classes, device=device)
    weights = get_pretrained_weights(model_name, pretrained_dir)
    if num_classes != 1000:
        weights = {k: v for k, v in weights.items() if not k.startswith("fc.")}
    model.load_weights(weights)
    return model


def list_available_pretrained_models(
    only_downloaded: bool = False, pretrained_dir: str = DEFAULT_PRETRAINED_DIR
) -> List[str]:
    if not only_downloaded:
        return list(SUPPORTED_MODELS)
    return [
        m
        for m in SUPPORTED_MODELS
        if os.path.exists(get_pretrained_model_path(m, pretrained_dir))
    ]


def is_pretrained_available(
    model_name: str, pretrained_dir: str = DEFAULT_PRETRAINED_DIR
) -> bool:
    return os.path.exists(get_pretrained_model_path(model_name, pretrained_dir))
