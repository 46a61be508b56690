"""Run the ACTUAL reference OpenDrift (/root/reference) under the
dependency shims in tools/refshims.py and dump trajectory goldens.

This executes the reference's real main loop — seeding, environment
fetches, advection (Euler/RK2/RK4 with midpoint refetches,
reference physics_methods.py:611-691), geodesic position update
(basemodel/__init__.py:4631), buffering — so the goldens capture the
reference's end-to-end behaviour, not just kernel formulas.

Usage:
    python tools/ref_runner.py [--out tests/goldens] [--scenario NAME]

Writes one ``ref_traj_<scenario>.npz`` per scenario, holding
lon/lat(/z) arrays of shape (n_elements, n_output_steps), the output
times (seconds since start) and a JSON config echo for the mirror run.

Run as a subprocess only: the shims replace sys.modules entries.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import refshims  # noqa: E402

refshims.install()
sys.path.insert(0, REF)

from datetime import datetime, timedelta  # noqa: E402


def _seed_grid(nx=10, ny=5, x0=0.15, x1=1.85, y0=0.15, y1=0.85):
    x, y = np.meshgrid(np.linspace(x0, x1, nx), np.linspace(y0, y1, ny))
    return x.ravel(), y.ravel()


def _common_config(o):
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("seed:ocean_only", False)


def _collect(o, result):
    lon = np.asarray(result.lon.values, dtype=np.float64)
    lat = np.asarray(result.lat.values, dtype=np.float64)
    out = {"lon": lon, "lat": lat,
           "status": np.asarray(result.status.values)}
    if "z" in result.data_vars:
        out["z"] = np.asarray(result.z.values, dtype=np.float64)
    times = result["time"].values
    out["time_s"] = ((times - times[0]) / np.timedelta64(1, "s")).astype(
        np.float64)
    return out


def scenario_double_gyre(scheme):
    """Mirrors reference examples/example_double_gyre.py, deterministic
    seeding (explicit grid, no radius scatter)."""
    from opendrift.models.oceandrift import OceanDrift
    from opendrift.readers import reader_double_gyre

    o = OceanDrift(loglevel=30)
    _common_config(o)
    o.set_config("drift:advection_scheme", scheme)
    r = reader_double_gyre.Reader(epsilon=0.25, omega=0.628, A=0.1)
    o.add_reader(r)
    x, y = _seed_grid()
    lon, lat = r.xy2lonlat(x, y)
    o.seed_elements(lon=lon, lat=lat, time=r.initial_time)
    result = o.run(duration=timedelta(seconds=10), time_step=0.1)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "OceanDrift", "reader": "double_gyre",
        "epsilon": 0.25, "omega": 0.628, "A": 0.1,
        "scheme": scheme, "time_step": 0.1, "duration_s": 10,
        "seed_x": x.tolist(), "seed_y": y.tolist(),
    })
    return out


def scenario_constant_wind():
    """Constant current + wind with per-element wind_drift_factor:
    exercises the geodesic step and windage over real distances
    (reference example_constant_current.py + advect_wind)."""
    from opendrift.models.oceandrift import OceanDrift

    o = OceanDrift(loglevel=30)
    _common_config(o)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.35)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.65)
    o.set_config("environment:fallback:x_wind", 7.5)
    o.set_config("environment:fallback:y_wind", -4.0)
    n = 50
    lon = np.linspace(3.5, 5.5, n)
    lat = np.linspace(59.0, 61.0, n)
    wdf = np.linspace(0.0, 0.05, n)
    o.seed_elements(lon=lon, lat=lat, time=datetime(2015, 9, 22, 6),
                    wind_drift_factor=wdf)
    result = o.run(duration=timedelta(hours=25), time_step=900)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "OceanDrift", "reader": "constant",
        "u": 0.35, "v": 0.65, "wind_u": 7.5, "wind_v": -4.0,
        "scheme": "euler", "time_step": 900, "duration_s": 25 * 3600,
        "seed_lon": lon.tolist(), "seed_lat": lat.tolist(),
        "wind_drift_factor": wdf.tolist(),
    })
    return out


ARCTIC20 = os.path.join(
    REF, "tests/test_data/2Feb2016_Nordic_sigma_3d/Arctic20_1to5Feb_2016.nc")


def load_arctic20_surface(keep_z=False):
    """Decode the Arctic20 z-level subset (u/v, surface layer by
    default; ``keep_z=True`` keeps all 17 z levels) with our own NetCDF
    parser; returns (proj4, x_m, y_m, times, fields[, zlevels])."""
    from opendrift_tpu.utils import ncio

    ds = ncio.NCFile(ARCTIC20)
    proj4 = ds.variables["polar_stereographic"].attrs["proj4_string"]
    xs = np.asarray(ds.variables["X"][:], np.float64) * 1000.0  # km -> m
    ys = np.asarray(ds.variables["Y"][:], np.float64) * 1000.0
    tvals = np.asarray(ds.variables["time"][:], np.float64)
    times = [datetime(1970, 1, 1) + timedelta(seconds=float(t))
             for t in tvals]
    fields = {}
    for name, std in (("u", "x_sea_water_velocity"),
                      ("v", "y_sea_water_velocity")):
        v = ds.variables[name]
        raw = np.asarray(v[:])
        fv = v.attrs.get("_FillValue")
        sf = float(v.attrs.get("scale_factor", 1.0))
        ao = float(v.attrs.get("add_offset", 0.0))
        arr = raw.astype(np.float64) * sf + ao
        if fv is not None:
            arr[raw == fv] = np.nan
        fields[std] = arr if keep_z else arr[:, 0, :, :]
    if keep_z:
        # z negative down (reference reader convention)
        zlevels = -np.asarray(ds.variables["depth"][:], np.float64)
        return proj4, xs, ys, times, fields, zlevels
    return proj4, xs, ys, times, fields


def _make_array_reader(proj4, x, y, times, fields, zlevels=None):
    """Concrete structured reader over in-memory numpy arrays.

    Plays the role of reference reader_netCDF_CF_generic.py for a
    pre-decoded dataset: get_variables returns index-subset arrays
    ([t,y,x] 2D fields or [t,z,y,x] with ``zlevels``); all
    interpolation happens in the reference's own ReaderBlock
    (reference interpolation/structured.py:107)."""
    from opendrift.readers.basereader.structured import StructuredReader

    class ArrayStructuredReader(StructuredReader):
        def __init__(self):
            self.proj4 = proj4
            self.proj = None
            self.name = "array_structured"
            self.x = np.asarray(x, np.float64)
            self.y = np.asarray(y, np.float64)
            self.xmin, self.xmax = self.x.min(), self.x.max()
            self.ymin, self.ymax = self.y.min(), self.y.max()
            self.delta_x = float(self.x[1] - self.x[0])
            self.delta_y = float(self.y[1] - self.y[0])
            self.times = list(times)
            self.start_time = self.times[0]
            self.end_time = self.times[-1]
            self.time_step = self.times[1] - self.times[0]
            self._fields = fields
            self.variables = list(fields.keys())
            self.zlevels = zlevels
            super().__init__()

        def get_variables(self, requested_variables, time=None,
                          x=None, y=None, z=None):
            requested_variables, time, x, y, z, outside = \
                self.check_arguments(requested_variables, time, x, y, z)
            nearest_time, dummy1, dummy2, indx_nearest, dummy3, dummy4 = \
                self.nearest_time(time)
            ix0 = np.maximum(0, np.searchsorted(self.x, x.min()) - 1
                             - self.buffer)
            ix1 = np.minimum(len(self.x),
                             np.searchsorted(self.x, x.max()) + 1
                             + self.buffer)
            iy0 = np.maximum(0, np.searchsorted(self.y, y.min()) - 1
                             - self.buffer)
            iy1 = np.minimum(len(self.y),
                             np.searchsorted(self.y, y.max()) + 1
                             + self.buffer)
            variables = {"time": nearest_time,
                         "x": self.x[ix0:ix1], "y": self.y[iy0:iy1],
                         "z": zlevels}
            for var in requested_variables:
                arr = self._fields[var][indx_nearest]
                variables[var] = arr[..., iy0:iy1, ix0:ix1]
            return variables

    return ArrayStructuredReader()


def scenario_arctic20(scheme):
    """Gridded Arctic20 polar-stereographic forcing through the
    reference's own StructuredReader/ReaderBlock stack (block fetch,
    NaN expansion, time blending, vector rotation), served by an
    in-memory concrete reader — the gridded rung of the BASELINE
    config ladder (reference example_rungekutta_norkyst.py pattern)."""
    from opendrift.models.oceandrift import OceanDrift

    proj4, xs, ys, times, fields = load_arctic20_surface()

    o = OceanDrift(loglevel=30)
    _common_config(o)
    o.set_config("drift:advection_scheme", scheme)
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", False)
    r = _make_array_reader(proj4, xs, ys, times, fields)
    o.add_reader(r)
    nseed = 40
    lon = np.linspace(9.0, 16.0, nseed)
    lat = np.linspace(70.0, 72.5, nseed)
    o.seed_elements(lon=lon, lat=lat, time=times[0])
    result = o.run(duration=timedelta(hours=50), time_step=1800,
                   time_step_output=1800)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "OceanDrift", "reader": "arctic20_surface",
        "scheme": scheme, "time_step": 1800, "duration_s": 50 * 3600,
        "seed_lon": lon.tolist(), "seed_lat": lat.tolist(),
        "file": ARCTIC20,
    })
    return out


def scenario_arctic20_backward():
    """Backward run: seed at the END of the Arctic20 window, negative
    time step (reference basemodel/__init__.py:2056-2063 flips IDs and
    reverses release comparisons)."""
    from opendrift.models.oceandrift import OceanDrift

    proj4, xs, ys, times, fields = load_arctic20_surface()
    o = OceanDrift(loglevel=30)
    _common_config(o)
    o.set_config("drift:advection_scheme", "euler")
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", False)
    r = _make_array_reader(proj4, xs, ys, times, fields)
    o.add_reader(r)
    nseed = 40
    lon = np.linspace(9.0, 16.0, nseed)
    lat = np.linspace(70.0, 72.5, nseed)
    o.seed_elements(lon=lon, lat=lat, time=times[-1])
    result = o.run(duration=timedelta(hours=50), time_step=-1800,
                   time_step_output=1800)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "OceanDrift", "reader": "arctic20_surface",
        "scheme": "euler", "time_step": -1800, "duration_s": 50 * 3600,
        "seed_lon": lon.tolist(), "seed_lat": lat.tolist(),
        "file": ARCTIC20,
    })
    return out


def scenario_arctic20_3d():
    """3D z-level forcing: u/v on all 17 Arctic20 depth levels,
    vertical advection ON with a constant sinking w so elements sweep
    through the z axis while drifting — exercises the reference's
    vertical block interpolation (Linear1DInterpolator,
    interpolators.py:153-201) and vertical_advection
    (oceandrift.py:315-350), deterministic (mixing off)."""
    from opendrift.models.oceandrift import OceanDrift

    proj4, xs, ys, times, fields, zlevels = \
        load_arctic20_surface(keep_z=True)
    o = OceanDrift(loglevel=30)
    _common_config(o)
    o.set_config("drift:advection_scheme", "euler")
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", True)
    w = -3.0e-4     # m/s, downward
    o.set_config("environment:fallback:upward_sea_water_velocity", w)
    r = _make_array_reader(proj4, xs, ys, times, fields, zlevels=zlevels)
    o.add_reader(r)
    nseed = 40
    lon = np.linspace(9.0, 16.0, nseed)
    lat = np.linspace(70.0, 72.5, nseed)
    z0 = np.linspace(-3.0, -40.0, nseed)
    o.seed_elements(lon=lon, lat=lat, z=z0, time=times[0])
    result = o.run(duration=timedelta(hours=50), time_step=1800,
                   time_step_output=1800)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "OceanDrift", "reader": "arctic20_3d",
        "scheme": "euler", "time_step": 1800, "duration_s": 50 * 3600,
        "seed_lon": lon.tolist(), "seed_lat": lat.tolist(),
        "seed_z": z0.tolist(), "w_fallback": w,
        "file": ARCTIC20,
    })
    return out


NORDIC = os.path.join(
    REF, "tests/test_data/2Feb2016_Nordic_sigma_3d/Nordic_subset.nc")


def scenario_nordic_sigma_3d(scheme="euler"):
    """ROMS-sigma END-TO-END rung: the reference's OWN
    reader_ROMS_native on the Nordic-4km sigma subset — C-grid rho/u/v
    staggering + masks (reference reader_ROMS_native.py:345-407), grid
    ``angle`` rotation (:420,792), sigma->z via roppy
    multi_zslice/sdepth (roppy/depth.py), fakeproj curvilinear
    lon/lat<->index interpolators (structured.py:46-119) — through 100
    calculation steps of 3D drift with vertical advection (constant
    sinking w sweeps the elements through the zslice levels).  Seeds
    sit >=6 grid cells from land in deep water so the rung pins the
    forcing stack, not coastline handling.  The same file drives the
    flagship bench (bench.py workload A)."""
    from opendrift.models.oceandrift import OceanDrift
    from opendrift.readers.reader_ROMS_native import Reader

    o = OceanDrift(loglevel=30)
    _common_config(o)
    o.set_config("drift:advection_scheme", scheme)
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", True)
    w = -3.0e-4
    o.set_config("environment:fallback:upward_sea_water_velocity", w)
    r = Reader(NORDIC)
    o.add_reader(r)
    n = 40
    lon = np.linspace(12.9, 14.0, n)
    lat = np.linspace(67.2, 67.7, n)
    z0 = np.linspace(-2.0, -40.0, n)
    o.seed_elements(lon=lon, lat=lat, z=z0, time=r.start_time)
    result = o.run(duration=timedelta(hours=45), time_step=1620,
                   time_step_output=1620)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "OceanDrift", "reader": "roms_native_nordic",
        "scheme": scheme, "time_step": 1620, "duration_s": 45 * 3600,
        "seed_lon": lon.tolist(), "seed_lat": lat.tolist(),
        "seed_z": z0.tolist(), "w_fallback": w,
        "file": NORDIC,
    })
    return out


def scenario_nordic_values():
    """ROMS-sigma VALUE-level rung: the reference reader's own
    ``get_variables_interpolated`` (C-grid masks + angle rotation +
    roppy sigma->z + fakeproj curvilinear index interpolation +
    ReaderBlock time blending, reference reader_ROMS_native.py:437-790)
    sampled at scattered (lon,lat,z) points at two off-frame times —
    pins the forcing values themselves, independent of trajectory
    integration."""
    from opendrift.readers.reader_ROMS_native import Reader

    r = Reader(NORDIC)
    rng = np.random.default_rng(42)
    n = 800
    lon = rng.uniform(12.9, 14.6, n)
    lat = rng.uniform(67.0, 67.9, n)
    # blocks of depths sweeping the zslice levels
    z = np.repeat([-2.0, -15.0, -60.0, -120.0], n // 4)
    variables = ["x_sea_water_velocity", "y_sea_water_velocity",
                 "sea_water_temperature", "sea_water_salinity",
                 "sea_surface_height",
                 "sea_floor_depth_below_sea_level"]
    r.prepare(extent=[12.4, 66.8, 15.6, 68.0], start_time=r.start_time,
              end_time=r.end_time, max_speed=1.0)
    out = {"lon": lon[None, :], "lat": lat[None, :], "z": z[None, :],
           "status": np.zeros((1, 1)), "time_s": np.zeros(1)}
    offsets_h = (6.0, 30.0)       # between daily frames -> time blend
    for k, off in enumerate(offsets_h):
        t = r.start_time + timedelta(hours=off)
        env, _ = r.get_variables_interpolated(
            variables, time=t, lon=lon, lat=lat, z=z,
            rotate_to_proj="+proj=latlong +ellps=WGS84")
        for v in variables:
            out[f"{v}__t{k}"] = np.ma.filled(
                np.asarray(env[v], np.float64), np.nan)[None, :]
    out["config"] = json.dumps({
        "reader": "roms_native_nordic_values", "file": NORDIC,
        "n": n, "lon": lon.tolist(), "lat": lat.tolist(),
        "z": z.tolist(), "offsets_h": list(offsets_h),
        "variables": variables,
    })
    return out


def scenario_telemac_values():
    """Telemac-3D VALUE-level rung: the reference's own
    reader_telemac_selafin (KD-tree nearest node, ELEVATION-Z nearest
    layer, two-frame time blending, Lambert->east/north vector
    rotation; reference reader_telemac_selafin.py:200-297) sampled at
    scattered (lon,lat,z,t) points on a deterministic synthetic 3D
    Selafin fixture (tools/unstructured_fixtures.py — the reference's
    own fixtures are THREDDS URLs, unreachable here)."""
    from unstructured_fixtures import (make_telemac_3d, sample_points,
                                       TELEMAC_PROJ)
    from opendrift.readers.reader_telemac_selafin import Reader
    from opendrift_tpu.utils import crs as tcrs

    fix_dir = os.path.join(REPO, "tests", "data")
    os.makedirs(fix_dir, exist_ok=True)
    fixture = os.path.join(fix_dir, "telemac3d_synth.slf")
    if not os.path.exists(fixture):
        make_telemac_3d(fixture)
    r = Reader(fixture, proj4=TELEMAC_PROJ)
    x, y, z = sample_points()
    proj = tcrs.from_proj4(TELEMAC_PROJ)
    lon, lat = proj.inv(np, x, y)
    variables = ["x_sea_water_velocity", "y_sea_water_velocity",
                 "upward_sea_water_velocity", "sea_water_temperature",
                 "sea_water_salinity"]
    out = {"lon": lon[None, :], "lat": lat[None, :], "z": z[None, :],
           "status": np.zeros((1, 1)), "time_s": np.zeros(1)}
    offsets_s = (1800.0, 5400.0)
    for k, off in enumerate(offsets_s):
        t = r.start_time + timedelta(seconds=off)
        env, _ = r.get_variables_interpolated(
            variables, time=t, lon=lon, lat=lat, z=z,
            rotate_to_proj="+proj=latlong +ellps=WGS84")
        for v in variables:
            out[f"{v}__t{k}"] = np.ma.filled(
                np.asarray(env[v], np.float64), np.nan)[None, :]
    out["config"] = json.dumps({
        "reader": "telemac_values", "fixture": fixture,
        "proj4": TELEMAC_PROJ, "n": len(x),
        "x": x.tolist(), "y": y.tolist(), "z": z.tolist(),
        "offsets_s": list(offsets_s), "variables": variables,
    })
    return out


def scenario_shyfem_values():
    """SHYFEM VALUE-level rung: the reference's own unstructured SHYFEM
    reader (KD-tree nearest node + nearest fixed level, reference
    unstructured/shyfem.py:150-231) on a deterministic synthetic file
    with the real (time, node, level) layout."""
    from unstructured_fixtures import make_shyfem, shyfem_sample_points
    from opendrift.readers.unstructured.shyfem import Reader

    fix_dir = os.path.join(REPO, "tests", "data")
    os.makedirs(fix_dir, exist_ok=True)
    fixture = os.path.join(fix_dir, "shyfem_synth.nc")
    if not os.path.exists(fixture):
        make_shyfem(fixture)
    r = Reader(fixture)
    lon, lat, z = shyfem_sample_points()
    variables = ["x_sea_water_velocity", "y_sea_water_velocity",
                 "sea_water_temperature", "sea_water_salinity"]
    out = {"lon": lon[None, :], "lat": lat[None, :], "z": z[None, :],
           "status": np.zeros((1, 1)), "time_s": np.zeros(1)}
    offsets_s = (1800.0, 5400.0)
    for k, off in enumerate(offsets_s):
        t = r.start_time + timedelta(seconds=off)
        env, _ = r.get_variables_interpolated(
            variables, time=t, lon=lon, lat=lat, z=z,
            rotate_to_proj="+proj=latlong +ellps=WGS84")
        for v in variables:
            out[f"{v}__t{k}"] = np.ma.filled(
                np.asarray(env[v], np.float64), np.nan)[None, :]
    out["config"] = json.dumps({
        "reader": "shyfem_values", "fixture": fixture,
        "n": len(lon), "z": z.tolist(),
        "offsets_s": list(offsets_s), "variables": variables,
    })
    return out


def scenario_schism_values():
    """SCHISM VALUE-level rung: the reference's own
    reader_schism_native (KD-tree nearest node, time-varying zcor
    levels, its ReaderBlockUnstruct machinery; reference
    reader_schism_native.py:55-1076) on a deterministic synthetic file
    with the real layout."""
    from unstructured_fixtures import (make_schism, sample_points,
                                       TELEMAC_PROJ)
    from opendrift.readers.reader_schism_native import Reader
    from opendrift_tpu.utils import crs as tcrs

    fix_dir = os.path.join(REPO, "tests", "data")
    os.makedirs(fix_dir, exist_ok=True)
    fixture = os.path.join(fix_dir, "schism_synth.nc")
    if not os.path.exists(fixture):
        make_schism(fixture)
    r = Reader(fixture, proj4=TELEMAC_PROJ, use_3d=True)
    x, y, z = sample_points()
    proj = tcrs.from_proj4(TELEMAC_PROJ)
    lon, lat = proj.inv(np, x, y)
    variables = ["x_sea_water_velocity", "y_sea_water_velocity",
                 "sea_water_temperature", "sea_water_salinity",
                 "sea_surface_height",
                 "sea_floor_depth_below_sea_level"]
    out = {"lon": lon[None, :], "lat": lat[None, :], "z": z[None, :],
           "status": np.zeros((1, 1)), "time_s": np.zeros(1)}
    offsets_s = (1800.0, 5400.0)
    for k, off in enumerate(offsets_s):
        t = r.start_time + timedelta(seconds=off)
        env, _ = r.get_variables_interpolated(
            variables, time=t, lon=lon, lat=lat, z=z,
            rotate_to_proj="+proj=latlong +ellps=WGS84")
        for v in variables:
            out[f"{v}__t{k}"] = np.ma.filled(
                np.asarray(env[v], np.float64), np.nan)[None, :]
    out["config"] = json.dumps({
        "reader": "schism_values", "fixture": fixture,
        "proj4": TELEMAC_PROJ, "n": len(x),
        "x": x.tolist(), "y": y.tolist(), "z": z.tolist(),
        "offsets_s": list(offsets_s), "variables": variables,
    })
    return out


def scenario_fvcom_values():
    """FVCOM VALUE-level rung: the reference's own
    reader_netCDF_CF_unstructured (KD-tree nearest face + nearest
    sigma layer from z_from_sigma; reference
    reader_netCDF_CF_unstructured.py:204-435) on a deterministic
    synthetic Cartesian FVCOM file.  u/v only — the face-variable path
    the reference's own tests exercise (its node-variable fetch
    returns a node-range block rather than per-point values,
    reader_netCDF_CF_unstructured.py:303-332, so it is not
    goldenable)."""
    from unstructured_fixtures import (make_fvcom, sample_points,
                                       TELEMAC_PROJ)
    from opendrift.readers import reader_netCDF_CF_unstructured
    from opendrift_tpu.utils import crs as tcrs

    fix_dir = os.path.join(REPO, "tests", "data")
    os.makedirs(fix_dir, exist_ok=True)
    fixture = os.path.join(fix_dir, "fvcom_synth.nc")
    if not os.path.exists(fixture):
        make_fvcom(fixture)
    r = reader_netCDF_CF_unstructured.Reader(fixture,
                                             proj4=TELEMAC_PROJ)
    x, y, z = sample_points()
    proj = tcrs.from_proj4(TELEMAC_PROJ)
    lon, lat = proj.inv(np, x, y)
    variables = ["x_sea_water_velocity", "y_sea_water_velocity"]
    out = {"lon": lon[None, :], "lat": lat[None, :], "z": z[None, :],
           "status": np.zeros((1, 1)), "time_s": np.zeros(1)}
    offsets_s = (1800.0, 5400.0)
    for k, off in enumerate(offsets_s):
        t = r.start_time + timedelta(seconds=off)
        env, _ = r.get_variables_interpolated(
            variables, time=t, lon=lon, lat=lat, z=z,
            rotate_to_proj="+proj=latlong +ellps=WGS84")
        for v in variables:
            out[f"{v}__t{k}"] = np.ma.filled(
                np.asarray(env[v], np.float64), np.nan)[None, :]
    out["config"] = json.dumps({
        "reader": "fvcom_values", "fixture": fixture,
        "proj4": TELEMAC_PROJ, "n": len(x),
        "x": x.tolist(), "y": y.tolist(), "z": z.tolist(),
        "offsets_s": list(offsets_s), "variables": variables,
    })
    return out


def scenario_mixing_sundby():
    """Vertical-mixing STATISTICAL parity: the reference's Visser
    random-walk inner loop (oceandrift.py:397-571) with
    windspeed_Sundby1983 diffusivity under constant wind — RNG streams
    differ between engines, so the golden stores the full final z
    population for moment/histogram comparison, not trajectories."""
    from opendrift.models.oceandrift import OceanDrift

    o = OceanDrift(loglevel=30)
    _common_config(o)
    o.set_config("environment:fallback:x_wind", 10.0)
    o.set_config("environment:fallback:y_wind", 0.0)
    o.set_config("environment:fallback:sea_floor_depth_below_sea_level",
                 120.0)
    o.set_config("environment:fallback:ocean_mixed_layer_thickness", 40.0)
    o.set_config("drift:vertical_mixing", True)
    o.set_config("vertical_mixing:diffusivitymodel", "windspeed_Sundby1983")
    o.set_config("vertical_mixing:timestep", 60.0)
    n = 3000
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, -20.0), time=datetime(2021, 6, 1),
                    wind_drift_factor=np.zeros(n),
                    terminal_velocity=np.zeros(n))
    result = o.run(duration=timedelta(hours=6), time_step=1800)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "OceanDrift", "reader": "constant",
        "wind_u": 10.0, "mld": 40.0, "seafloor": 120.0,
        "scheme": "euler", "time_step": 1800, "duration_s": 6 * 3600,
        "dt_mix": 60.0, "n": n, "seed_z": -20.0,
    })
    return out


def scenario_openoil_budget():
    """OpenOil surface weathering mass budget, deterministic: vertical
    mixing/dispersion OFF so all elements stay in the surface slick and
    the budget follows the evaporation pseudo-component ODE
    (reference openoil.py:822-853), emulsification water uptake
    (:855-920) and biodegradation half-lives (:559-611) exactly.
    Golden stores positions AND the per-step summed mass budget."""
    from opendrift.models.openoil import OpenOil

    o = OpenOil(loglevel=30)
    _common_config(o)
    o.set_config("environment:fallback:x_wind", 8.0)
    o.set_config("environment:fallback:y_wind", 2.0)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.15)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.05)
    o.set_config("environment:fallback:sea_water_temperature", 14.0)
    o.set_config("drift:vertical_mixing", False)
    o.set_config("processes:dispersion", False)
    o.set_config("processes:evaporation", True)
    o.set_config("processes:emulsification", True)
    o.set_config("processes:biodegradation", True)
    o.set_config("seed:m3_per_hour", 80.0)
    n = 200
    o.seed_elements(lon=4.5, lat=60.0, radius=0, number=n,
                    time=datetime(2022, 5, 1), oil_type="STATFJORD",
                    wind_drift_factor=np.full(n, 0.03))
    result = o.run(duration=timedelta(hours=24), time_step=900,
                   time_step_output=3600)
    out = _collect(o, result)
    for var in ("mass_oil", "mass_evaporated", "mass_biodegraded",
                "water_fraction", "viscosity", "density",
                "oil_film_thickness"):
        out[var] = np.asarray(result[var].values, np.float64)
    out["config"] = json.dumps({
        "model": "OpenOil", "oil_type": "STATFJORD",
        "wind_u": 8.0, "wind_v": 2.0, "u": 0.15, "v": 0.05,
        "sst": 14.0, "m3_per_hour": 80.0, "n": n,
        "wind_drift_factor": 0.03,
        "scheme": "euler", "time_step": 900, "duration_s": 24 * 3600,
        "time_step_output": 3600,
    })
    return out


def scenario_openoil_full():
    """OpenOil FULL weathering, statistical: dispersion, wave
    entrainment + droplet spectra and the Visser loop with oil
    resurfacing all ON (reference openoil.py:1000-1172 entrainment,
    :792-815 dispersion, oceandrift.py:397-571 mixing).  Per-element
    RNG differs between engines, so the golden stores the summed mass
    budget and the final z population for statistical comparison."""
    from opendrift.models.openoil import OpenOil

    o = OpenOil(loglevel=30)
    _common_config(o)
    o.set_config("environment:fallback:x_wind", 10.0)
    o.set_config("environment:fallback:y_wind", 0.0)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.1)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.0)
    o.set_config("environment:fallback:sea_water_temperature", 13.0)
    o.set_config("environment:fallback:sea_floor_depth_below_sea_level",
                 200.0)
    o.set_config("drift:vertical_mixing", True)
    o.set_config("vertical_mixing:timestep", 60.0)
    o.set_config("processes:dispersion", True)
    o.set_config("processes:evaporation", True)
    o.set_config("processes:emulsification", True)
    o.set_config("seed:m3_per_hour", 80.0)
    n = 500
    o.seed_elements(lon=4.5, lat=60.0, radius=0, number=n,
                    time=datetime(2022, 5, 1), oil_type="STATFJORD")
    result = o.run(duration=timedelta(hours=12), time_step=900,
                   time_step_output=3600)
    out = _collect(o, result)
    for var in ("mass_oil", "mass_evaporated", "mass_dispersed",
                "water_fraction", "viscosity", "diameter"):
        out[var] = np.asarray(result[var].values, np.float64)
    out["config"] = json.dumps({
        "model": "OpenOil", "oil_type": "STATFJORD",
        "wind_u": 10.0, "u": 0.1, "sst": 13.0, "seafloor": 200.0,
        "m3_per_hour": 80.0, "n": n, "dt_mix": 60.0,
        "scheme": "euler", "time_step": 900, "duration_s": 12 * 3600,
        "time_step_output": 3600,
    })
    return out


def scenario_pelagicegg():
    """PelagicEggDrift statistical parity: Sundby/Vikebo egg terminal
    velocity (reference pelagicegg.py:100-179) balancing the Visser
    mixing under wind — golden stores the final vertical population."""
    from opendrift.models.pelagicegg import PelagicEggDrift

    o = PelagicEggDrift(loglevel=30)
    _common_config(o)
    o.set_config("environment:fallback:x_wind", 8.0)
    o.set_config("environment:fallback:y_wind", 0.0)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.0)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.0)
    o.set_config("environment:fallback:sea_water_temperature", 10.0)
    o.set_config("environment:fallback:sea_water_salinity", 34.0)
    o.set_config("environment:fallback:sea_floor_depth_below_sea_level",
                 150.0)
    n = 1000
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, -30.0), time=datetime(2021, 4, 1),
                    diameter=0.0014)
    result = o.run(duration=timedelta(hours=12), time_step=1800,
                   time_step_output=3600)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "PelagicEggDrift", "wind_u": 8.0, "sst": 10.0,
        "sss": 34.0, "seafloor": 150.0, "n": n, "seed_z": -30.0,
        "diameter": 0.0014, "time_step": 1800,
        "duration_s": 12 * 3600, "time_step_output": 3600,
    })
    return out


def scenario_chemical():
    """ChemicalDrift statistical parity: Phenanthrene partitioning
    (dissolved/DOC/SPM species with transfer-rate matrices, reference
    chemicaldrift.py:700-1100), degradation and volatilization under
    constant forcing — golden stores species occupation, masses and
    the vertical population."""
    from opendrift.models.chemicaldrift import ChemicalDrift

    o = ChemicalDrift(loglevel=30)
    _common_config(o)
    for k, v in (("x_wind", 5.0), ("y_wind", 0.0),
                 ("x_sea_water_velocity", 0.05),
                 ("y_sea_water_velocity", 0.0),
                 ("sea_water_temperature", 12.0),
                 ("sea_water_salinity", 34.0),
                 ("sea_floor_depth_below_sea_level", 60.0),
                 ("spm", 5.0)):
        o.set_config(f"environment:fallback:{k}", v)
    o.set_config("chemical:transformations:degradation", True)
    o.set_config("chemical:transformations:volatilization", True)
    o.init_chemical_compound("Phenanthrene")
    n = 800
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, -5.0), time=datetime(2021, 4, 1))
    result = o.run(duration=timedelta(hours=12), time_step=1800,
                   time_step_output=3600)
    out = _collect(o, result)
    for var in ("specie", "mass", "mass_degraded", "mass_volatilized"):
        out[var] = np.asarray(result[var].values, np.float64)
    out["config"] = json.dumps({
        "model": "ChemicalDrift", "compound": "Phenanthrene",
        "wind_u": 5.0, "u": 0.05, "sst": 12.0, "sss": 34.0,
        "seafloor": 60.0, "spm": 5.0, "n": n, "seed_z": -5.0,
        "time_step": 1800, "duration_s": 12 * 3600,
        "time_step_output": 3600,
    })
    return out


def scenario_sediment():
    """SedimentDrift statistical parity: sinking (terminal velocity
    -1 mm/s) + Visser mixing + settling at the seafloor (moving=0),
    current below the resuspension threshold so settled elements stay
    (reference sedimentdrift.py:39-126).  Golden: final z population
    + settled fraction via the 'moving' flag."""
    from opendrift.models.sedimentdrift import SedimentDrift

    o = SedimentDrift(loglevel=30)
    _common_config(o)
    for k, v in (("x_wind", 6.0), ("y_wind", 0.0),
                 ("x_sea_water_velocity", 0.15),
                 ("y_sea_water_velocity", 0.0),
                 ("sea_floor_depth_below_sea_level", 30.0)):
        o.set_config(f"environment:fallback:{k}", v)
    o.set_config("vertical_mixing:timestep", 60.0)
    n = 1000
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, -5.0), time=datetime(2021, 4, 1))
    result = o.run(duration=timedelta(hours=12), time_step=1800,
                   time_step_output=3600)
    out = _collect(o, result)
    if "moving" in result.data_vars:
        out["moving"] = np.asarray(result["moving"].values, np.float64)
    out["config"] = json.dumps({
        "model": "SedimentDrift", "wind_u": 6.0, "u": 0.15,
        "seafloor": 30.0, "n": n, "seed_z": -5.0, "dt_mix": 60.0,
        "time_step": 1800, "duration_s": 12 * 3600,
        "time_step_output": 3600,
    })
    return out


def scenario_plast():
    """PlastDrift statistical parity: the 'analytical' wind-mixing
    equilibrium depth z ~ -Exp(K/w) redrawn every step + tabularised Stokes
    drift + windage (reference plastdrift.py:32-107).  Golden: final z
    population and the drifted cloud."""
    from opendrift.models.plastdrift import PlastDrift

    o = PlastDrift(loglevel=30)
    _common_config(o)
    for k, v in (("x_wind", 10.0), ("y_wind", 0.0),
                 ("x_sea_water_velocity", 0.1),
                 ("y_sea_water_velocity", 0.0),
                 ("sea_floor_depth_below_sea_level", 200.0)):
        o.set_config(f"environment:fallback:{k}", v)
    n = 2000
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    time=datetime(2021, 4, 1))
    result = o.run(duration=timedelta(hours=6), time_step=1800,
                   time_step_output=3600)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "PlastDrift", "wind_u": 10.0, "u": 0.1, "n": n,
        "time_step": 1800, "duration_s": 6 * 3600,
        "time_step_output": 3600,
    })
    return out


def scenario_larvalfish():
    """LarvalFish statistical parity: egg development (Ellertsen),
    hatching, Folkvord growth, Peck swim-speed diel migration
    (reference larvalfish.py:185-265).  Seeded with a spread of
    stage_fraction so hatching happens inside the 48 h window; golden:
    hatched fraction, weight/length distributions, z population."""
    from opendrift.models.larvalfish import LarvalFish

    o = LarvalFish(loglevel=30)
    _common_config(o)
    for k, v in (("x_wind", 4.0), ("y_wind", 0.0),
                 ("sea_water_temperature", 12.0),
                 ("sea_water_salinity", 34.0),
                 ("sea_floor_depth_below_sea_level", 100.0)):
        o.set_config(f"environment:fallback:{k}", v)
    o.set_config("vertical_mixing:timestep", 60.0)
    n = 600
    sf = np.linspace(0.2, 0.99, n)
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, -10.0), time=datetime(2021, 4, 1, 0),
                    stage_fraction=sf)
    result = o.run(duration=timedelta(hours=48), time_step=1800,
                   time_step_output=7200)
    out = _collect(o, result)
    for var in ("hatched", "stage_fraction", "weight", "length"):
        out[var] = np.asarray(result[var].values, np.float64)
    out["config"] = json.dumps({
        "model": "LarvalFish", "sst": 12.0, "sss": 34.0, "n": n,
        "seed_z": -10.0, "stage_fraction": sf.tolist(),
        "time_step": 1800, "duration_s": 48 * 3600,
        "time_step_output": 7200, "dt_mix": 60.0,
    })
    return out


def scenario_sealice():
    """SeaLice statistical parity: degree-day maturation and the
    light/salinity/temperature-triggered vertical migration over a full
    diel cycle (reference sealice.py:73-380).  Golden: final z
    population and degree_days."""
    from opendrift.models.sealice import SeaLice

    o = SeaLice(loglevel=30)
    _common_config(o)
    # required by the reference's new_born() spawn bookkeeping
    o.set_config("lice:seeding_time_step", 3600.0)
    o.set_config("general:duration", 24 * 3600.0)
    for k, v in (("x_sea_water_velocity", 0.05),
                 ("y_sea_water_velocity", 0.0),
                 ("sea_water_temperature", 10.0),
                 ("sea_water_salinity", 34.0),
                 ("sea_floor_depth_below_sea_level", 80.0)):
        o.set_config(f"environment:fallback:{k}", v)
    n = 1000
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, -5.0), time=datetime(2021, 6, 1, 0))
    result = o.run(duration=timedelta(hours=24), time_step=1800,
                   time_step_output=3600)
    out = _collect(o, result)
    for var in ("degree_days",):
        if var in result.data_vars:
            out[var] = np.asarray(result[var].values, np.float64)
    out["config"] = json.dumps({
        "model": "SeaLice", "u": 0.05, "sst": 10.0, "sss": 34.0,
        "seafloor": 80.0, "n": n, "seed_z": -5.0,
        "time_step": 1800, "duration_s": 24 * 3600,
        "time_step_output": 3600,
    })
    return out


def scenario_radionuclide():
    """RadionuclideDrift statistical parity: 137Cs speciation (LMM /
    reversible particle species) with transfer-rate matrices, particle
    sinking and sediment interaction (reference
    radionuclides.py:728-1003).  Golden: species occupation counts and
    the vertical population."""
    from opendrift.models.radionuclides import RadionuclideDrift

    o = RadionuclideDrift(loglevel=30)
    _common_config(o)
    for k, v in (("x_sea_water_velocity", 0.05),
                 ("y_sea_water_velocity", 0.0),
                 ("sea_water_temperature", 10.0),
                 ("sea_water_salinity", 34.0),
                 ("sea_floor_depth_below_sea_level", 50.0)):
        o.set_config(f"environment:fallback:{k}", v)
    o.set_config("vertical_mixing:timestep", 60.0)
    n = 800
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, -5.0), time=datetime(2021, 4, 1))
    result = o.run(duration=timedelta(hours=24), time_step=1800,
                   time_step_output=3600)
    out = _collect(o, result)
    for var in ("specie",):
        out[var] = np.asarray(result[var].values, np.float64)
    out["config"] = json.dumps({
        "model": "RadionuclideDrift", "u": 0.05, "sst": 10.0,
        "sss": 34.0, "seafloor": 50.0, "n": n, "seed_z": -5.0,
        "time_step": 1800, "duration_s": 24 * 3600,
        "time_step_output": 3600, "dt_mix": 60.0,
    })
    return out


def scenario_eulerdrift():
    """Auxiliary Eulerian advection-diffusion solver (reference
    eulerdrift/simulation.py:229 ExplSimulation): explicit scheme on a
    UTM grid, constant velocity + diffusion, identical explicit source
    patch on both sides — golden stores the final concentration
    FIELD."""
    import opendrift.models.eulerdrift as ed

    sim = ed.ExplSimulation.new(lon0=5.0, lat0=60.0, res=200.0,
                                shape=(120, 120))
    sim.readers.append(ed.ConstantReader.new_xy(0.2, 0.1))
    sim.D = 5.0
    # deterministic source patch placed by lower-left corner
    k = np.arange(40) - 19.5
    g = np.exp(-0.5 * (k * 200.0 / 600.0) ** 2)
    patch = np.outer(g, g)
    sim.source(5.05, 60.05, patch)
    f0 = np.asarray(sim.grid.grid, np.float64).copy()
    sim.integrate(dt=10.0, max_steps=360)
    out = {
        "field0": f0,
        "field": np.asarray(sim.grid.grid, np.float64),
        "lon": np.zeros((1, 1)), "lat": np.zeros((1, 1)),
        "status": np.zeros((1, 1)), "time_s": np.zeros(1),
    }
    out["config"] = json.dumps({
        "model": "eulerdrift", "lon0": 5.0, "lat0": 60.0, "res": 200.0,
        "shape": [120, 120], "u": 0.2, "v": 0.1, "D": 5.0,
        "src_lon": 5.05, "src_lat": 60.05, "N": 40, "sigma": 600.0,
        "dt": 10.0, "steps": 360,
    })
    return out


def scenario_stranding():
    """Coastline interaction parity: constant onshore current against
    the bundled coastline raster.  The reference runs its OWN
    reader_global_landmask + coastline_crossing bisection
    (basemodel/__init__.py:81-134, :670-746), with the shimmed
    roaring_landmask backed by the SAME raster the engine under test
    uses — so the comparison pins the stranding dynamics (when, where
    and in what state elements strand), not the coastline dataset."""
    from opendrift.models.oceandrift import OceanDrift

    o = OceanDrift(loglevel=30)
    o.set_config("seed:ocean_only", False)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.8)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.05)
    o.set_config("drift:advection_scheme", "euler")
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", False)
    # NO land fallback: the reference auto-adds its global landmask,
    # whose roaring backend the shim routes to the bundled raster
    n = 30
    lon = np.linspace(16.0, 16.8, n)
    lat = np.linspace(69.25, 69.5, n)
    o.seed_elements(lon=lon, lat=lat, time=datetime(2021, 3, 1))
    result = o.run(duration=timedelta(hours=25), time_step=900)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "OceanDrift", "u": 0.8, "v": 0.05, "n": n,
        "seed_lon": lon.tolist(), "seed_lat": lat.tolist(),
        "time_step": 900, "duration_s": 25 * 3600,
    })
    return out


def scenario_windblow():
    """WindBlow: pure wind advection, deterministic trajectory parity
    (reference windblow.py:22)."""
    from opendrift.models.windblow import WindBlow

    o = WindBlow(loglevel=30)
    o.set_config("seed:ocean_only", False)
    for k, v in (("x_wind", 9.0), ("y_wind", -3.0),
                 ("land_binary_mask", 0)):
        try:
            o.set_config(f"environment:fallback:{k}", v)
        except ValueError:
            pass
    n = 20
    lon = np.linspace(3.0, 5.0, n)
    lat = np.linspace(59.0, 61.0, n)
    o.seed_elements(lon=lon, lat=lat, time=datetime(2021, 1, 1))
    result = o.run(duration=timedelta(hours=25), time_step=900)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "WindBlow", "wind_u": 9.0, "wind_v": -3.0, "n": n,
        "seed_lon": lon.tolist(), "seed_lat": lat.tolist(),
        "time_step": 900, "duration_s": 25 * 3600,
    })
    return out


def scenario_seaice():
    """SeaIceDrift: ice-velocity advection (Nordam ice-fraction rule),
    deterministic (reference seaicedrift.py:22,
    physics_methods.py:693-710)."""
    from opendrift.models.seaicedrift import SeaIceDrift

    o = SeaIceDrift(loglevel=30)
    o.set_config("seed:ocean_only", False)
    for k, v in (("sea_ice_x_velocity", 0.25),
                 ("sea_ice_y_velocity", 0.1),
                 ("sea_ice_area_fraction", 0.8),
                 ("x_sea_water_velocity", 0.05),
                 ("y_sea_water_velocity", 0.0),
                 ("x_wind", 10.0), ("y_wind", 0.0),
                 ("land_binary_mask", 0)):
        try:
            o.set_config(f"environment:fallback:{k}", v)
        except ValueError:
            pass
    n = 20
    lon = np.linspace(2.0, 6.0, n)
    lat = np.linspace(69.0, 71.0, n)
    o.seed_elements(lon=lon, lat=lat, time=datetime(2021, 2, 1))
    result = o.run(duration=timedelta(hours=25), time_step=900)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "SeaIceDrift", "ice_u": 0.25, "ice_v": 0.1,
        "ice_conc": 0.8, "u": 0.05, "wind_u": 10.0, "n": n,
        "seed_lon": lon.tolist(), "seed_lat": lat.tolist(),
        "time_step": 900, "duration_s": 25 * 3600,
    })
    return out


def scenario_openberg():
    """OpenBerg: iceberg added-mass force balance (reference
    openberg.py:163 advect_iceberg, incl. the no-acceleration analytic
    solution) across a spread of iceberg geometries — deterministic
    (no RNG in the default config)."""
    from opendrift.models.openberg import OpenBerg

    o = OpenBerg(loglevel=30)
    o.set_config("seed:ocean_only", False)
    # OpenBerg defaults horizontal_diffusivity to 100 m2/s (reference
    # openberg.py:309) — zero it so the force balance is deterministic
    o.set_config("environment:fallback:horizontal_diffusivity", 0.0)
    for k, v in (("x_wind", 12.0), ("y_wind", 3.0),
                 ("x_sea_water_velocity", 0.25),
                 ("y_sea_water_velocity", -0.05),
                 ("sea_water_temperature", 2.0),
                 ("sea_surface_wave_significant_height", 1.5),
                 ("land_binary_mask", 0)):
        try:
            o.set_config(f"environment:fallback:{k}", v)
        except ValueError:
            pass
    n = 20
    lon = np.linspace(2.0, 6.0, n)
    lat = np.linspace(69.0, 71.0, n)
    sail = np.linspace(8.0, 25.0, n)
    draft = np.linspace(30.0, 120.0, n)
    length = np.linspace(40.0, 150.0, n)
    o.seed_elements(lon=lon, lat=lat, time=datetime(2021, 2, 1),
                    sail=sail, draft=draft, length=length, width=length)
    result = o.run(duration=timedelta(hours=25), time_step=900)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "OpenBerg", "wind_u": 12.0, "wind_v": 3.0,
        "u": 0.25, "v": -0.05, "n": n,
        "seed_lon": lon.tolist(), "seed_lat": lat.tolist(),
        "sail": sail.tolist(), "draft": draft.tolist(),
        "length": length.tolist(),
        "time_step": 900, "duration_s": 25 * 3600,
    })
    return out


def scenario_shipdrift():
    """ShipDrift STATISTICAL parity: wind + wave-spectrum forces with a
    random left/right orientation draw (reference shipdrift.py:216-320)
    — golden stores the final cloud."""
    from opendrift.models.shipdrift import ShipDrift

    o = ShipDrift(loglevel=30)
    o.set_config("seed:ocean_only", False)
    for k, v in (("x_wind", 12.0), ("y_wind", 0.0),
                 ("x_sea_water_velocity", 0.0),
                 ("y_sea_water_velocity", 0.0),
                 ("sea_surface_wave_significant_height", 2.5),
                 ("land_binary_mask", 0)):
        try:
            o.set_config(f"environment:fallback:{k}", v)
        except ValueError:
            pass
    n = 1000
    o.seed_elements(lon=4.0, lat=60.0, radius=0, number=n,
                    time=datetime(2021, 3, 1),
                    length=120.0, beam=18.0, height=22.0, draft=6.0)
    result = o.run(duration=timedelta(hours=12), time_step=600,
                   time_step_output=3600)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "ShipDrift", "wind_u": 12.0, "hs": 2.5, "n": n,
        "length": 120.0, "beam": 18.0, "height": 22.0, "draft": 6.0,
        "time_step": 600, "duration_s": 12 * 3600,
        "time_step_output": 3600,
    })
    return out


def scenario_leeway():
    """Leeway STATISTICAL parity: downwind/crosswind leeway with random
    left/right orientation and jibing (reference leeway.py:430-494) —
    per-element RNG differs between engines, so the golden stores the
    final element cloud for moment comparison (mean downwind drift,
    crosswind spread, left/right split)."""
    from opendrift.models.leeway import Leeway

    o = Leeway(loglevel=30)
    _common_config(o)
    o.set_config("environment:fallback:x_wind", 12.0)
    o.set_config("environment:fallback:y_wind", 0.0)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.0)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.0)
    n = 2000
    o.seed_elements(lon=2.0, lat=59.5, radius=0, number=n,
                    time=datetime(2021, 3, 1), object_type=26)
    result = o.run(duration=timedelta(hours=12), time_step=600,
                   time_step_output=3600)
    out = _collect(o, result)
    out["config"] = json.dumps({
        "model": "Leeway", "object_type": 26,
        "wind_u": 12.0, "wind_v": 0.0, "n": n,
        "time_step": 600, "duration_s": 12 * 3600,
        "time_step_output": 3600,
    })
    return out


SCENARIOS = {
    "double_gyre_euler": lambda: scenario_double_gyre("euler"),
    "double_gyre_rk4": lambda: scenario_double_gyre("runge-kutta4"),
    "double_gyre_rk2": lambda: scenario_double_gyre("runge-kutta"),
    "constant_wind_euler": scenario_constant_wind,
    "arctic20_euler": lambda: scenario_arctic20("euler"),
    "arctic20_rk4": lambda: scenario_arctic20("runge-kutta4"),
    "arctic20_backward": scenario_arctic20_backward,
    "arctic20_3d_euler": scenario_arctic20_3d,
    "nordic_sigma_3d_euler": lambda: scenario_nordic_sigma_3d("euler"),
    "nordic_values": scenario_nordic_values,
    "telemac_values": scenario_telemac_values,
    "shyfem_values": scenario_shyfem_values,
    "schism_values": scenario_schism_values,
    "fvcom_values": scenario_fvcom_values,
    "mixing_sundby_stat": scenario_mixing_sundby,
    "openoil_budget_surface": scenario_openoil_budget,
    "openoil_full_stat": scenario_openoil_full,
    "pelagicegg_stat": scenario_pelagicegg,
    "chemical_stat": scenario_chemical,
    "sediment_stat": scenario_sediment,
    "plast_stat": scenario_plast,
    "larvalfish_stat": scenario_larvalfish,
    "sealice_stat": scenario_sealice,
    "radionuclide_stat": scenario_radionuclide,
    "arctic20_stranding": scenario_stranding,
    "eulerdrift_field": scenario_eulerdrift,
    "windblow_euler": scenario_windblow,
    "seaice_euler": scenario_seaice,
    "openberg_det": scenario_openberg,
    "shipdrift_stat": scenario_shipdrift,
    "leeway_stat": scenario_leeway,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "goldens"))
    ap.add_argument("--scenario", default=None)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    names = [args.scenario] if args.scenario else list(SCENARIOS)
    for name in names:
        print(f"=== running reference scenario {name}")
        data = SCENARIOS[name]()
        path = os.path.join(args.out, f"ref_traj_{name}.npz")
        np.savez_compressed(path, **data)
        print(f"    wrote {path}: lon shape {data['lon'].shape}")


if __name__ == "__main__":
    main()
