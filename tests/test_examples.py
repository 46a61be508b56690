"""Gallery tests: EVERY example in examples/ must stay runnable (the
reference's gallery is exercised by its doc build; here each example
runs as a subprocess on the CPU backend).

The compile-heavy examples (cold-cache compiles can take minutes
on the 2-core CI host) carry
the ``slow`` marker so a quick pass can deselect them with
``-m 'not slow'`` — but the default ``pytest tests`` run includes all.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SLOW = {"example_constant_current.py", "example_double_gyre.py",
        "example_rungekutta_norkyst.py", "example_coastline_options.py"}

ALL_EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples"))
    if f.startswith("example_") and f.endswith(".py"))


@pytest.mark.parametrize(
    "name", [pytest.param(n, marks=pytest.mark.slow) if n in SLOW
             else n for n in ALL_EXAMPLES])
def test_example_runs(name):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["MPLBACKEND"] = "Agg"
    # the suite's conftest exports an 8-virtual-device XLA_FLAGS; the
    # gallery must run single-device like a real user (8-way sharding
    # on the 2-core CI host makes the big examples time out)
    env.pop("XLA_FLAGS", None)
    # the image's sitecustomize registers the remote-TPU (axon) backend
    # whenever PALLAS_AXON_POOL_IPS is set and overrides the platform
    # pin — examples would silently run through the TPU tunnel (slow /
    # flaky under contention). Unset it so JAX_PLATFORMS=cpu holds.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        capture_output=True, text=True, timeout=1800, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
