"""End-to-end trajectory parity vs the ACTUAL reference OpenDrift.

The goldens in tests/goldens/ref_traj_*.npz are produced by running the
reference's own ``OpenDriftSimulation.run()`` (reference
basemodel/__init__.py:1829-2340) under the dependency shims in
tools/refshims.py — i.e. the reference's real main loop, environment
stack, ReaderBlock interpolation and pyproj-equivalent geodesic step.
Regenerate with:

    python tools/ref_runner.py          # requires /root/reference

This is the BASELINE acceptance test: "matching OpenDrift allclose
after 100 steps" — every scenario runs exactly 100 calculation steps.

Tolerances: both engines hold element positions in float32
(reference elements/elements.py:71-95), so each ~km-scale step commits
a ~1e-7 relative rounding difference; over 100 steps this accumulates
to O(10 m) over ~100 km of drift.  The analytic double-gyre scenarios
(micrometre domain) agree to ~1e-5 m; gridded/constant runs are bounded
at 50-60 m total — ~5e-4 of the path length, far below any physical
signal.

Shared-code caveat: the reference-under-shims uses THIS repo's
geodesy/PROJ as its pyproj (tools/refshims.py:40-131), so a systematic
error in utils/geodesic.py would cancel out of these comparisons.
Mitigation: the geodesy layer carries its own shim-independent
published fixtures — Flinders Peak, equatorial arc, quarter meridian,
pole crossing, near-antipodal envelope (tests/test_geodesic.py) — and
local curvature-radius checks, so the shared code is independently
pinned to external truth.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import parity_compare  # noqa: E402

# scenario -> (max separation any step [m], mean separation final step [m])
TOLERANCES = {
    "double_gyre_euler": (1e-3, 1e-3),
    "double_gyre_rk4": (1e-3, 1e-3),
    "double_gyre_rk2": (1e-3, 1e-3),
    "constant_wind_euler": (50.0, 25.0),
    "arctic20_euler": (60.0, 20.0),
    "arctic20_rk4": (60.0, 20.0),
    "arctic20_backward": (60.0, 20.0),
    "arctic20_3d_euler": (60.0, 20.0),
    # coastline interaction: strand step must match exactly
    # (finite_mismatch==0); stranding points within ~raster-cell scale
    "arctic20_stranding": (150.0, 60.0),
    # ROMS-sigma end-to-end: forcing VALUES agree to <=1cm/s rms
    # (test_reference_roms_values_parity.py); the looser trajectory
    # bound is coast-hugging elements in Vestfjorden where the
    # reference's grey-dilation velocity fill makes near-stagnation
    # dynamics — tiny velocity differences there move the along-coast
    # slide by km over 45 h, while the open-water bulk stays at
    # O(100 m) (final_median asserted below)
    "nordic_sigma_3d_euler": (4000.0, 1200.0),
    # the REGRID production mode (source of every headline bench number)
    # vs the SAME reference golden: regrid forcing values are bounded at
    # u-rms <=5e-3 of native (test_reference_roms_values_parity.py:56-69),
    # which over 45 h (~1.6e5 s) integrates to <=~800 m coherent extra
    # drift on top of the native-mode bound.  Measured r5: max 3510 m,
    # final_mean 1226 m, final_median 951 m.
    "nordic_sigma_3d_euler_regrid": (6000.0, 2000.0),
    # model-zoo deterministic rungs (25 h of drift each)
    "windblow_euler": (30.0, 15.0),
    "seaice_euler": (60.0, 40.0),
    "openberg_det": (120.0, 60.0),   # iceberg force balance, 20 shapes
}

# 3D scenario: max |z_ref - z_ours| at any output step [m]
DZ_TOLERANCES = {"arctic20_3d_euler": 0.05,
                 "nordic_sigma_3d_euler": 0.05,
                 "nordic_sigma_3d_euler_regrid": 0.05}
# scenario -> final-step MEDIAN separation bound [m] (pins the bulk
# when a handful of coastal elements need a loose max)
MEDIAN_TOLERANCES = {"nordic_sigma_3d_euler": 500.0,
                     "nordic_sigma_3d_euler_regrid": 1500.0}


def _golden_available(name):
    name = parity_compare.GOLDEN_ALIASES.get(name, name)
    return os.path.exists(os.path.join(
        parity_compare.GOLDENS, f"ref_traj_{name}.npz"))


@pytest.mark.parametrize("name", list(TOLERANCES))
def test_trajectory_matches_reference(name):
    if not _golden_available(name):
        pytest.skip(f"golden for {name} not generated")
    golden, cfg = parity_compare.load_golden(name)
    if "file" in cfg and not os.path.exists(cfg["file"]):
        pytest.skip("reference Arctic20 forcing file unavailable")
    o = parity_compare.RUNNERS[name](cfg)
    stats = parity_compare.compare(name, o, golden)
    max_tol, final_tol = TOLERANCES[name]
    assert stats["shape_ref"] == stats["shape_our"]
    assert stats["finite_mismatch"] == 0, stats
    assert stats["max_m"] < max_tol, stats
    assert stats["final_mean_m"] < final_tol, stats
    if name in DZ_TOLERANCES:
        assert stats["max_dz_m"] < DZ_TOLERANCES[name], stats
    if name in MEDIAN_TOLERANCES:
        assert stats["final_median_m"] < MEDIAN_TOLERANCES[name], stats
