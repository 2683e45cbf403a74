"""Test configuration: run on CPU with 8 virtual devices and float64.

Multi-chip sharding tests use the virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) exactly as described in
SURVEY.md §4; the same code runs unchanged on a real TPU slice. Parity tests
run in float64 (x64), float32-accuracy tests cast explicitly.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the axon TPU plugin ignores JAX_PLATFORMS
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
