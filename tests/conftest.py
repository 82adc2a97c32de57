"""Test configuration: force CPU with 8 virtual devices BEFORE jax imports,
so multi-chip sharding tests run anywhere (SURVEY §4: the TPU-world 'fake
backend')."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
