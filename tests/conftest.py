"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual device mesh (the standard JAX
fake-backend trick; the reference never needed one because it was
data-parallel-only — SURVEY §4).  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
