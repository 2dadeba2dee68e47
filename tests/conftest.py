"""Test configuration: force JAX onto the host CPU platform with 8 virtual
devices so the full suite (including the 'tpu' device code paths and the
multi-chip sharding tests) runs anywhere.  Must run before JAX initialises a
backend.  Note: in this image a site config pins ``jax_platforms=axon,cpu``,
so the env var alone is not enough — we update the config directly.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - already initialised
    pass

import pytest  # noqa: E402


@pytest.fixture(params=["cpu", "tpu"])
def device(request):
    """Run a test on both the NumPy CPU device and the JAX device."""
    return request.param
