"""Test configuration: force CPU with 8 virtual devices for multi-chip tests.

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (the tunneled real TPU), so env vars set here are too late
for platform selection — we must go through jax.config. XLA_FLAGS still works
because the CPU backend has not been initialized yet at conftest time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
