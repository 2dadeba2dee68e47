# vendored minimal ONNX schema (wire-compatible with onnx.proto3); regenerate
# with: protoc --python_out=. onnx_minimal.proto
from . import onnx_minimal_pb2  # noqa: F401
