"""ONNX export + execution (reference parity+: the reference serves .onnx
files via onnxruntime but ships no exporter, `DF_serving/serving/serving.py`).

- ``export_onnx(model, sample_input, path)`` — tape-traced export, opset 13,
  wire-compatible files (vendored minimal onnx.proto3 schema).
- ``OnnxModel(path)`` — load + run an ONNX file as a jitted XLA program.
- ``check_onnx(path)`` — structural validation summary.
"""

from .export import export_onnx
from .runtime import OnnxModel, check_onnx

__all__ = ["export_onnx", "OnnxModel", "check_onnx"]
