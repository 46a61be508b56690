"""Gallery smoke tests: a fast subset of examples/ must stay runnable
(the reference's example gallery is exercised by its doc build; here a
subprocess run with the CPU backend stands in)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAST_EXAMPLES = ["example_basic.py"]
# the rest of the gallery is compile-heavy on the 2-core CI host; opt in
# with OPENDRIFT_TEST_ALL_EXAMPLES=1
if os.environ.get("OPENDRIFT_TEST_ALL_EXAMPLES") == "1":
    FAST_EXAMPLES = sorted(
        f for f in os.listdir(os.path.join(REPO, "examples"))
        if f.startswith("example_") and f.endswith(".py"))


@pytest.mark.parametrize("name", FAST_EXAMPLES)
def test_example_runs(name):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["MPLBACKEND"] = "Agg"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
