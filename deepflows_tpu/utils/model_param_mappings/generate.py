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


if __name__ == "__main__":
    main()
