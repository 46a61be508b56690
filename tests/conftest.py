"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on virtual CPU devices exactly as the driver's
``dryrun_multichip`` does.  NB: the environment may pre-select a remote
TPU platform via ``JAX_PLATFORMS``/``jax.config`` (sitecustomize), so the
platform is forced back to CPU through ``jax.config`` — env vars alone are
not enough.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np
import pytest


@pytest.fixture
def test_data_dir():
    """Reference forcing subsets (read-only)."""
    path = "/root/reference/tests/test_data"
    if not os.path.isdir(path):
        pytest.skip("reference test data not available")
    return path
