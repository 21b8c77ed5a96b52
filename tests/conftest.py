"""Test harness config: force the JAX CPU backend with 8 virtual devices.

Per SURVEY.md §4: kernels run in Pallas interpret mode on CPU; multi-chip
sharding tests use the 8-device virtual mesh. The driver separately
dry-run-compiles the multi-chip path and benches on a real TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; the
# config update below wins as long as it runs before first backend use.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
