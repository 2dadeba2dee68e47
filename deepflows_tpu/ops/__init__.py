"""Hand-written TPU kernels (Pallas)."""

from . import pallas_kernels  # noqa: F401
