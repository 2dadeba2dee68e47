import os
import sys

# protoc generates absolute `import serving_pb2`; make the sibling importable
sys.path.insert(0, os.path.dirname(__file__))
from . import serving_pb2  # noqa: E402,F401

sys.path.pop(0)
