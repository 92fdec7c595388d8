"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware, and enable x64 so oracle comparisons can be tight.
"""

import os

# Must be set before jax initializes a backend.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
