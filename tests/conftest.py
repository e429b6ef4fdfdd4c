"""Test configuration: force the CPU backend with 8 virtual devices.

This image's sitecustomize registers an axon TPU PJRT plugin at interpreter
startup (env JAX_PLATFORMS=axon), so the env var alone is not enough — the
jax config is updated and any initialised backends are cleared so the test
session runs entirely on the virtual CPU mesh (fast, deterministic, and the
multichip sharding tests need 8 devices).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # drop any backend the sitecustomize may have initialised already
    jax.clear_backends()
except Exception:
    pass
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
