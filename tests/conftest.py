"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  Environment must be set before jax is imported anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-selects the TPU backend regardless of
# JAX_PLATFORMS; the config update below wins over it.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: interpret-mode Pallas lowerings compile into
# large XLA:CPU graphs (minutes); repeated suite runs amortize them.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


EXAMPLE_PROJECT = "/root/reference/example/project.xml"


def example_project_available() -> bool:
    return os.path.exists(EXAMPLE_PROJECT)
