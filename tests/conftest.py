"""Test configuration: force CPU with 8 virtual devices BEFORE any backend
initialization, so multi-chip sharding tests run anywhere (SURVEY §4: the
TPU-world 'fake backend').

Env vars alone are not enough: the axon TPU plugin's sitecustomize overrides
``JAX_PLATFORMS`` programmatically at interpreter start, so we must also set
the config key after importing jax (backends initialize lazily, so this wins
as long as it runs before the first array op).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "slow: multi-process / long-running tests")
