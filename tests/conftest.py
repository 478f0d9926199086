"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-idiomatic "fake cluster" (SURVEY §4): multi-device sharding
tests execute on 8 virtual CPU devices, so the full pjit/Mesh path is
exercised without TPU hardware.  Numeric tests force fp32.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the environment, so the env var alone is too
# late — override via jax.config before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
