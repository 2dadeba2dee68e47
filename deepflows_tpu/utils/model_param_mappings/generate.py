"""Regenerate the torch->deepflows name-mapping JSONs (reference ships the
same artifacts: `/root/reference/DeepFlows/model_param_mappings/*.json`).

Our model zoo uses torchvision-compatible module names (ResNet:
conv1/bn1/layerN.M.*/fc; VGG16: features.N/classifier.N sequential indices
with ReLU/Dropout occupying slots exactly like torchvision), so every mapping
is the identity over our parameter/buffer names, plus the torch-only
``num_batches_tracked`` buffers (dropped at conversion, listed for
completeness like the reference's JSONs).  MobileNetV1 has no torchvision
counterpart (the reference's pipeline famously downloaded MobileNetV2
instead, `convert_pretrained.py:139-143`); its mapping is the identity over
our canonical names.

    python -m deepflows_tpu.utils.model_param_mappings.generate
"""

from __future__ import annotations

import json
import os


def _names(model):
    return [name for name, _ in model.named_parameters()] + [
        name for name, _ in model.named_buffers()
    ]


def build_mapping(model) -> dict:
    mapping = {}
    for name in _names(model):
        mapping[name] = name
        if name.endswith("running_var"):
            nb = name.rsplit(".", 1)[0] + ".num_batches_tracked"
            mapping[nb] = nb  # torch-only; dropped by the converter
    return mapping


def build_mobilenet_v2_mapping(model) -> dict:
    """torchvision-name -> deepflows-name mapping for MobileNetV2.

    torchvision's ConvBNActivation is an anonymous Sequential (conv at index
    0, bn at index 1); ours names the attributes ``conv``/``bn``.  Everything
    else (inverted-residual projection conv/bn indices, classifier) aligns
    one-to-one, so the transform is purely within ConvBNReLU scopes.  (The
    reference's own pretrained pipeline downloaded mobilenet V2 while
    labeling it V1 — `convert_pretrained.py:139-143`; this mapping makes V2
    conversion real.)"""
    from deepflows_tpu.models.mobilenet import ConvBNReLU

    cbr_paths = {
        path for path, m in model.named_modules() if isinstance(m, ConvBNReLU)
    }

    def to_torch(name: str) -> str:
        for p in cbr_paths:
            if name.startswith(p + "."):
                rest = name[len(p) + 1 :]
                if rest.startswith("conv."):
                    return f"{p}.0.{rest[len('conv.'):]}"
                if rest.startswith("bn."):
                    return f"{p}.1.{rest[len('bn.'):]}"
        return name

    mapping = {}
    for name in _names(model):
        tname = to_torch(name)
        mapping[tname] = name
        if name.endswith("running_var"):
            nb = to_torch(name.rsplit(".", 1)[0] + ".num_batches_tracked")
            mapping[nb] = name.rsplit(".", 1)[0] + ".num_batches_tracked"
    return mapping


def main() -> None:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from deepflows_tpu import models

    zoo = {
        "resnet18": models.ResNet18(device="cpu"),
        "resnet50": models.ResNet50(device="cpu"),
        "vgg16": models.VGG16(device="cpu"),
        "mobilenet_v1": models.MobileNetV1(device="cpu"),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    for name, model in zoo.items():
        path = os.path.join(here, f"{name}_complete_mapping.json")
        with open(path, "w") as f:
            json.dump(build_mapping(model), f, indent=2, sort_keys=True)
        print(f"wrote {path}")
    v2 = models.MobileNetV2(device="cpu")
    path = os.path.join(here, "mobilenet_v2_complete_mapping.json")
    with open(path, "w") as f:
        json.dump(build_mobilenet_v2_mapping(v2), f, indent=2, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
