"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual device mesh (the standard JAX
fake-backend trick; the reference never needed one because it was
data-parallel-only — SURVEY §4).  Must run before jax is imported.
"""

import os

# NOTE: on this machine a sitecustomize.py imports jax at interpreter
# startup, so env vars set here are too late; use jax.config.update (valid
# until the first backend initialization, which is still lazy).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: this box pays O(seconds) per XLA compile; the
# cache makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
