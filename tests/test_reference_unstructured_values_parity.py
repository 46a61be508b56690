"""Unstructured-reader VALUE parity vs the ACTUAL reference readers.

The reference's own unstructured fixtures are THREDDS URLs (zero
egress), so the goldens sample the reference readers on deterministic
synthetic files (tools/unstructured_fixtures.py) whose fields are
ANALYTIC — so besides bounding ours-vs-reference, each rung measures
both engines against ground truth.

Measured on the Telemac-3D rung (600 scattered points x full water
column x 2 off-frame times):

- ours vs reference: u/v rms ~0.025/0.015 m/s, T rms ~0.42 K — almost
  exactly the reference's OWN truth error, because the difference IS
  the reference's piecewise-constant sampling (nearest node + nearest
  layer, reference basereader/unstructured.py:146-187,
  reader_telemac_selafin.py:222-236) vs our linear interpolation.
- truth error: ours is 5-6x smaller (u rms 0.004 vs 0.024 m/s,
  T 0.076 vs 0.40 K) — the quantified version of "barycentric beats
  nearest-node" asked for by the round-3 review.

Four rungs: telemac_values, shyfem_values, schism_values,
fvcom_values.  Regenerate any golden with
python tools/ref_runner.py --scenario <name>
"""

import json
import os
import sys
from datetime import timedelta

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tools"))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    path = os.path.join(GOLDEN_DIR, f"ref_traj_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated")
    d = np.load(path, allow_pickle=False)
    return d, json.loads(str(d["config"]))


def _ensure_fixture(cfg):
    import unstructured_fixtures as uf
    path = cfg["fixture"]
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        uf.make_telemac_3d(path)
    return path


# var -> (bound on ours-vs-ref rms, bound on |ours-ref| max); these are
# the measured piecewise-constant deltas with ~50% headroom
TELEMAC_BOUNDS = {
    "x_sea_water_velocity": (0.04, 0.12),
    "y_sea_water_velocity": (0.025, 0.08),
    "upward_sea_water_velocity": (3e-5, 1e-4),
    "sea_water_temperature": (0.6, 1.7),
    "sea_water_salinity": (0.25, 0.6),
}


@pytest.mark.parametrize("mode", ["regrid", "native"])
def test_telemac_values_match_reference(mode):
    from opendrift_tpu.fields.unstructured import TelemacReader

    d, cfg = _load("telemac_values")
    fixture = _ensure_fixture(cfg)
    lon = d["lon"][0]
    lat = d["lat"][0]
    z = d["z"][0]
    r = TelemacReader(fixture, proj4=cfg["proj4"], sampling=mode)
    for k, off in enumerate(cfg["offsets_s"]):
        t = r.times[0] + timedelta(seconds=off)
        out = r.sample_at(lon, lat, t, variables=cfg["variables"], z=z)
        for v in cfg["variables"]:
            ref = d[f"{v}__t{k}"][0]
            ours = out[v]
            both = np.isfinite(ref) & np.isfinite(ours)
            assert both.sum() >= 0.97 * len(lon), v
            dd = ours[both] - ref[both]
            rb, mb = TELEMAC_BOUNDS[v]
            rms = float(np.sqrt((dd ** 2).mean()))
            mx = float(np.abs(dd).max())
            assert rms < rb, f"{v} t{k} {mode}: rms {rms:.4g} >= {rb}"
            assert mx < mb, f"{v} t{k} {mode}: max {mx:.4g} >= {mb}"


def test_telemac_truth_error_beats_reference():
    """Both engines vs the fixture's analytic truth: our linear
    (barycentric + z-linear) sampling must stay at least 3x closer to
    truth than the reference's nearest-node/nearest-layer (measured
    5-6x; bound leaves headroom)."""
    import unstructured_fixtures as uf
    from opendrift_tpu.fields.unstructured import TelemacReader

    d, cfg = _load("telemac_values")
    fixture = _ensure_fixture(cfg)
    lon = d["lon"][0]
    lat = d["lat"][0]
    z = d["z"][0]
    x = np.array(cfg["x"])
    y = np.array(cfg["y"])
    h = uf._depth(x, y)
    r = TelemacReader(fixture, proj4=cfg["proj4"])
    for k, off in enumerate(cfg["offsets_s"]):
        frac = np.clip(1.0 + z / h, 0.0, 1.0)
        u_t, v_t, w_t, T_t, S_t = uf._fields(x, y, frac, off)
        truth = {"x_sea_water_velocity": u_t,
                 "y_sea_water_velocity": v_t,
                 "sea_water_temperature": T_t,
                 "sea_water_salinity": S_t}
        t = r.times[0] + timedelta(seconds=off)
        out = r.sample_at(lon, lat, t, variables=list(truth), z=z)
        for v, tv in truth.items():
            ref = d[f"{v}__t{k}"][0]
            ours = out[v]
            b = np.isfinite(ref) & np.isfinite(ours)
            e_ref = float(np.sqrt(np.mean((ref[b] - tv[b]) ** 2)))
            e_our = float(np.sqrt(np.mean((ours[b] - tv[b]) ** 2)))
            assert e_our * 3.0 < e_ref, \
                (f"{v} t{k}: ours {e_our:.4g} not 3x better than "
                 f"reference {e_ref:.4g}")


SHYFEM_BOUNDS = {
    "x_sea_water_velocity": (0.045, 0.13),
    "y_sea_water_velocity": (0.030, 0.08),
    "sea_water_temperature": (0.5, 1.1),
    "sea_water_salinity": (0.20, 0.45),
}


def _ensure_shyfem(cfg):
    import unstructured_fixtures as uf
    path = cfg["fixture"]
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        uf.make_shyfem(path)
    return path


def test_shyfem_values_match_reference():
    """vs the reference's own SHYFEM reader (nearest node + nearest
    fixed LEVEL, reference unstructured/shyfem.py:150-231).  The
    reference declares z below the deepest layer CENTRE uncovered
    (zmin=-55 here, variables.py:242) and returns NaN there; ours
    clamps into the bottom layer (a particle at -60 m IS inside the
    30-80 m layer), so the comparison runs on the reference-covered
    subset and the coverage difference is asserted explicitly."""
    from opendrift_tpu.fields.unstructured import SHYFEMReader

    d, cfg = _load("shyfem_values")
    fixture = _ensure_shyfem(cfg)
    lon = d["lon"][0]
    lat = d["lat"][0]
    z = d["z"][0]
    r = SHYFEMReader(fixture)
    for k, off in enumerate(cfg["offsets_s"]):
        t = r.times[0] + timedelta(seconds=off)
        out = r.sample_at(lon, lat, t, variables=cfg["variables"], z=z)
        for v in cfg["variables"]:
            ref = d[f"{v}__t{k}"][0]
            ours = out[v]
            # reference-side NaN = exactly the z < zmin points
            ref_nan = ~np.isfinite(ref)
            assert (z[ref_nan] < -55.0 + 1e-6).all()
            assert np.isfinite(ours).all()
            b = ~ref_nan
            assert b.sum() > 300
            dd = ours[b] - ref[b]
            rb, mb = SHYFEM_BOUNDS[v]
            rms = float(np.sqrt((dd ** 2).mean()))
            mx = float(np.abs(dd).max())
            assert rms < rb, f"{v} t{k}: rms {rms:.4g} >= {rb}"
            assert mx < mb, f"{v} t{k}: max {mx:.4g} >= {mb}"


def test_shyfem_truth_error_beats_reference():
    """Both engines vs analytic truth on the reference-covered subset:
    ours (barycentric + z-linear between layer centres) must be >=3x
    closer (measured 6-86x)."""
    import unstructured_fixtures as uf
    from opendrift_tpu.fields.unstructured import SHYFEMReader

    d, cfg = _load("shyfem_values")
    fixture = _ensure_shyfem(cfg)
    lon = d["lon"][0]
    lat = d["lat"][0]
    z = d["z"][0]
    xm, ym = uf.shyfem_xy(lon, lat)
    r = SHYFEMReader(fixture)
    for k, off in enumerate(cfg["offsets_s"]):
        frac = 1.0 + z / uf.SHYFEM_H
        u_t, v_t, w_t, T_t, S_t = uf._fields(xm, ym, frac, off)
        truth = {"x_sea_water_velocity": u_t,
                 "y_sea_water_velocity": v_t,
                 "sea_water_temperature": T_t,
                 "sea_water_salinity": S_t}
        t = r.times[0] + timedelta(seconds=off)
        out = r.sample_at(lon, lat, t, variables=list(truth), z=z)
        for v, tv in truth.items():
            ref = d[f"{v}__t{k}"][0]
            ours = out[v]
            b = np.isfinite(ref) & np.isfinite(ours)
            e_ref = float(np.sqrt(np.mean((ref[b] - tv[b]) ** 2)))
            e_our = float(np.sqrt(np.mean((ours[b] - tv[b]) ** 2)))
            assert e_our * 3.0 < e_ref, \
                (f"{v} t{k}: ours {e_our:.4g} vs reference {e_ref:.4g}")


SCHISM_BOUNDS = {
    "x_sea_water_velocity": (0.04, 0.13),
    "y_sea_water_velocity": (0.025, 0.09),
    "sea_water_temperature": (0.55, 1.4),
    "sea_water_salinity": (0.22, 0.55),
    "sea_surface_height": (1e-6, 1e-5),
    "sea_floor_depth_below_sea_level": (1.3, 5.5),
}


def _ensure_schism(cfg):
    import unstructured_fixtures as uf
    path = cfg["fixture"]
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        uf.make_schism(path)
    return path


def test_schism_values_match_reference():
    """vs the reference's own reader_schism_native (KD-tree nearest
    node + time-varying zcor levels + ReaderBlockUnstruct, reference
    reader_schism_native.py:55-1076) on a reference-layout synthetic
    file.  Bounds quantify the piecewise-constant-vs-linear sampling
    difference per variable."""
    from opendrift_tpu.fields.unstructured import SCHISMReader

    d, cfg = _load("schism_values")
    fixture = _ensure_schism(cfg)
    lon = d["lon"][0]
    lat = d["lat"][0]
    z = d["z"][0]
    r = SCHISMReader(fixture, proj4=cfg["proj4"], use_3d=True)
    for k, off in enumerate(cfg["offsets_s"]):
        t = r.times[0] + timedelta(seconds=off)
        out = r.sample_at(lon, lat, t, variables=cfg["variables"], z=z)
        for v in cfg["variables"]:
            ref = d[f"{v}__t{k}"][0]
            ours = out[v]
            both = np.isfinite(ref) & np.isfinite(ours)
            assert both.sum() >= 0.97 * len(lon), v
            dd = ours[both] - ref[both]
            rb, mb = SCHISM_BOUNDS[v]
            rms = float(np.sqrt((dd ** 2).mean()))
            mx = float(np.abs(dd).max())
            assert rms < rb, f"{v} t{k}: rms {rms:.4g} >= {rb}"
            assert mx < mb, f"{v} t{k}: max {mx:.4g} >= {mb}"


def test_schism_truth_error_beats_reference():
    """Both engines vs the analytic truth: our barycentric + z-linear
    sampling >=3x closer (measured ~5.2-5.4x)."""
    import unstructured_fixtures as uf
    from opendrift_tpu.fields.unstructured import SCHISMReader

    d, cfg = _load("schism_values")
    fixture = _ensure_schism(cfg)
    lon = d["lon"][0]
    lat = d["lat"][0]
    z = d["z"][0]
    x = np.array(cfg["x"])
    y = np.array(cfg["y"])
    h = uf._depth(x, y)
    r = SCHISMReader(fixture, proj4=cfg["proj4"], use_3d=True)
    for k, off in enumerate(cfg["offsets_s"]):
        frac = np.clip(1.0 + z / h, 0.0, 1.0)
        u_t, v_t, w_t, T_t, S_t = uf._fields(x, y, frac, off)
        truth = {"x_sea_water_velocity": u_t,
                 "y_sea_water_velocity": v_t,
                 "sea_water_temperature": T_t,
                 "sea_water_salinity": S_t}
        t = r.times[0] + timedelta(seconds=off)
        out = r.sample_at(lon, lat, t, variables=list(truth), z=z)
        for v, tv in truth.items():
            ref = d[f"{v}__t{k}"][0]
            ours = out[v]
            b = np.isfinite(ref) & np.isfinite(ours)
            e_ref = float(np.sqrt(np.mean((ref[b] - tv[b]) ** 2)))
            e_our = float(np.sqrt(np.mean((ours[b] - tv[b]) ** 2)))
            assert e_our * 3.0 < e_ref, \
                (f"{v} t{k}: ours {e_our:.4g} vs reference {e_ref:.4g}")


FVCOM_BOUNDS = {
    "x_sea_water_velocity": (0.035, 0.11),
    "y_sea_water_velocity": (0.025, 0.07),
}


def _ensure_fvcom(cfg):
    import unstructured_fixtures as uf
    path = cfg["fixture"]
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        uf.make_fvcom(path)
    return path


def test_fvcom_values_match_reference():
    """vs the reference's own reader_netCDF_CF_unstructured (KD-tree
    nearest face + nearest sigma layer, reference
    reader_netCDF_CF_unstructured.py:204-435) on a reference-layout
    Cartesian FVCOM fixture.  u/v only — the face-variable path the
    reference's own tests exercise (its node-variable fetch returns a
    node-range block rather than per-point values and is not
    goldenable)."""
    from opendrift_tpu.fields.unstructured import FVCOMReader

    d, cfg = _load("fvcom_values")
    fixture = _ensure_fvcom(cfg)
    lon = d["lon"][0]
    lat = d["lat"][0]
    z = d["z"][0]
    r = FVCOMReader(fixture, proj4=cfg["proj4"], use_3d=True)
    for k, off in enumerate(cfg["offsets_s"]):
        t = r.times[0] + timedelta(seconds=off)
        out = r.sample_at(lon, lat, t, variables=cfg["variables"], z=z)
        for v in cfg["variables"]:
            ref = d[f"{v}__t{k}"][0]
            ours = out[v]
            both = np.isfinite(ref) & np.isfinite(ours)
            assert both.sum() >= 0.97 * len(lon), v
            dd = ours[both] - ref[both]
            rb, mb = FVCOM_BOUNDS[v]
            rms = float(np.sqrt((dd ** 2).mean()))
            mx = float(np.abs(dd).max())
            assert rms < rb, f"{v} t{k}: rms {rms:.4g} >= {rb}"
            assert mx < mb, f"{v} t{k}: max {mx:.4g} >= {mb}"


def test_fvcom_truth_error_beats_reference():
    """Both engines vs the analytic truth: ours >=2.5x closer
    (measured 3.3-4.2x — slightly below the other families because the
    cell-centre u/v are first averaged onto nodes)."""
    import unstructured_fixtures as uf
    from opendrift_tpu.fields.unstructured import FVCOMReader

    d, cfg = _load("fvcom_values")
    fixture = _ensure_fvcom(cfg)
    lon = d["lon"][0]
    lat = d["lat"][0]
    z = d["z"][0]
    x = np.array(cfg["x"])
    y = np.array(cfg["y"])
    h = uf._depth(x, y)
    r = FVCOMReader(fixture, proj4=cfg["proj4"], use_3d=True)
    for k, off in enumerate(cfg["offsets_s"]):
        frac = np.clip(1.0 + z / h, 0.0, 1.0)
        u_t, v_t, w_t, T_t, S_t = uf._fields(x, y, frac, off)
        truth = {"x_sea_water_velocity": u_t,
                 "y_sea_water_velocity": v_t}
        t = r.times[0] + timedelta(seconds=off)
        out = r.sample_at(lon, lat, t, variables=list(truth), z=z)
        for v, tv in truth.items():
            ref = d[f"{v}__t{k}"][0]
            ours = out[v]
            b = np.isfinite(ref) & np.isfinite(ours)
            e_ref = float(np.sqrt(np.mean((ref[b] - tv[b]) ** 2)))
            e_our = float(np.sqrt(np.mean((ours[b] - tv[b]) ** 2)))
            assert e_our * 2.5 < e_ref, \
                (f"{v} t{k}: ours {e_our:.4g} vs reference {e_ref:.4g}")
