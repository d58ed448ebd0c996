"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this module
intentionally does it at import time (pytest imports conftest first).
"""

import os

# Force CPU even if the launch environment points JAX at a TPU tunnel:
# unit tests must be hermetic and fast. The tunnel's sitecustomize calls
# jax.config.update("jax_platforms", ...) at interpreter start, so setting
# the env var alone is not enough — override the config value too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
