"""Test configuration: run on a virtual 8-device CPU mesh.

Must set platform flags before jax initialises. Multi-chip sharding tests use
the 8 virtual devices; numerical tests don't care which platform they run on.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
