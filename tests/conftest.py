"""Test harness: force CPU with 8 virtual devices.

Multi-device tests run on a virtual 8-device CPU mesh
(--xla_force_host_platform_device_count) so sharding logic is exercised
without TPU hardware; numerical goldens also run on CPU for speed and
determinism. Must run before any JAX backend is initialized; the axon TPU
sitecustomize pre-sets jax_platforms, so we override the config directly.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
