"""Unstructured-mesh readers: Telemac Selafin, CROCO, FVCOM/UGRID,
and the shared Delaunay regridder (reference parity:
tests/readers/test_selafin.py, opendrift/readers/reader_ROMS_native.py
CROCO handling, reader_FVCOM_xarray.py)."""

import os
from datetime import datetime, timedelta

import numpy as np
import pytest

TEST_DATA = "/root/reference/tests/test_data"
SLF = os.path.join(TEST_DATA, "Telemac_3D", "r3d_tide_open_drift.slf")
CROCO_HIS = os.path.join(TEST_DATA, "croco", "croco_his.nc")
CROCO_GRD = os.path.join(TEST_DATA, "croco", "croco_grd.nc")

# Lambert North (the projection of the Telemac tide demo mesh)
LAMBERT_NORTH = (
    "+proj=lcc +lat_1=49.50000000000001 +lat_0=49.50000000000001 "
    "+lon_0=0 +k_0=0.999877341 +x_0=600000 +y_0=200000 "
    "+a=6378249.2 +b=6356515 +units=m +no_defs")


def test_delaunay_regridder_linear_exact():
    """Barycentric regridding reproduces linear fields exactly."""
    from opendrift_tpu.fields.regrid import DelaunayRegridder
    rng = np.random.default_rng(0)
    lon = rng.uniform(0, 2, 400)
    lat = rng.uniform(50, 51, 400)
    rg = DelaunayRegridder(lon, lat, resolution_deg=0.05)
    vals = 3.0 * lon - 2.0 * lat + 7.0
    grid = rg(vals)
    LON, LAT = np.meshgrid(rg.lons, rg.lats)
    expect = 3.0 * LON - 2.0 * LAT + 7.0
    inside = np.isfinite(grid)
    assert inside.mean() > 0.5
    assert np.nanmax(np.abs(grid[inside] - expect[inside])) < 1e-3


@pytest.mark.skipif(not os.path.exists(SLF), reason="no Telemac test data")
def test_telemac_reader_open():
    from opendrift_tpu.fields.unstructured import TelemacReader
    r = TelemacReader(SLF, proj4=LAMBERT_NORTH)
    assert "x_sea_water_velocity" in r.variables
    # Ushant / Brittany coast
    assert -6.0 < r._node_lon.min() < r._node_lon.max() < -5.0
    assert 48.5 < r._node_lat.min() < r._node_lat.max() < 49.5
    assert len(r.times) == 6
    assert (r.times[1] - r.times[0]) == timedelta(seconds=900)
    fr = r._read_frame("x_sea_water_velocity", 2, slice(None),
                       slice(None), slice(None))
    assert np.isfinite(fr).mean() > 0.2
    assert np.nanmax(np.abs(fr)) < 5.0  # plausible tidal speeds


@pytest.mark.skipif(not os.path.exists(SLF), reason="no Telemac test data")
def test_telemac_drift_run():
    from opendrift_tpu.models.oceandrift import OceanDrift
    from opendrift_tpu.fields.unstructured import TelemacReader
    m = OceanDrift(loglevel=50)
    r = TelemacReader(SLF, proj4=LAMBERT_NORTH)
    m.add_reader(r)
    m.set_config("general:use_auto_landmask", False)
    m.seed_elements(lon=-5.55, lat=48.9, time=r.times[0], number=10)
    m.run(duration=timedelta(minutes=45), time_step=300)
    lon = np.asarray(m.result["lon"])
    assert np.isfinite(lon[:, -1]).all()
    # particles must have moved with the tide
    assert np.abs(lon[:, -1] - lon[:, 0]).max() > 1e-5


@pytest.mark.skipif(not os.path.exists(CROCO_HIS), reason="no CROCO data")
def test_croco_reader():
    from opendrift_tpu.fields.roms import ROMSReader
    r = ROMSReader(CROCO_HIS, gridfile=CROCO_GRD)
    assert "x_sea_water_velocity" in r.variables
    assert len(r.times) == 2
    fr = r._read_frame("x_sea_water_velocity", 1, slice(None),
                       slice(None), slice(None))
    assert np.nanmax(np.abs(fr)) > 0.05  # frame 1 has real currents
    assert np.nanmax(np.abs(fr)) < 2.0


@pytest.mark.skipif(not os.path.exists(CROCO_HIS), reason="no CROCO data")
def test_croco_drift_run():
    from opendrift_tpu.models.oceandrift import OceanDrift
    from opendrift_tpu.fields.roms import ROMSReader
    m = OceanDrift(loglevel=50)
    r = ROMSReader(CROCO_HIS, gridfile=CROCO_GRD)
    m.add_reader(r)
    m.set_config("general:use_auto_landmask", False)
    m.seed_elements(lon=15.0, lat=-32.0, time=r.times[0], number=5)
    m.run(duration=timedelta(hours=48), time_step=3600)
    lon = np.asarray(m.result["lon"])
    assert np.isfinite(lon[:, -1]).all()
    assert np.abs(lon[:, -1] - lon[:, 0]).max() > 1e-4


@pytest.fixture
def fvcom_file(tmp_path):
    """Synthetic CF-UGRID triangular mesh with a known linear velocity."""
    from scipy.io import netcdf_file
    rng = np.random.default_rng(7)
    n = 300
    lon = rng.uniform(4.0, 5.0, n)
    lat = rng.uniform(60.0, 60.5, n)
    from scipy.spatial import Delaunay
    tri = Delaunay(np.column_stack([lon, lat]))
    nv = tri.simplices.T + 1  # FVCOM convention: (3, nele), 1-based
    nele = nv.shape[1]
    lonc = lon[tri.simplices].mean(axis=1)
    latc = lat[tri.simplices].mean(axis=1)
    path = str(tmp_path / "fvcom.nc")
    f = netcdf_file(path, "w")
    f.createDimension("node", n)
    f.createDimension("nele", nele)
    f.createDimension("three", 3)
    f.createDimension("time", 2)
    for nm, dims, data in [
            ("lon", ("node",), lon), ("lat", ("node",), lat),
            ("lonc", ("nele",), lonc), ("latc", ("nele",), latc),
            ("h", ("node",), 50.0 + 10.0 * (lon - 4.0))]:
        v = f.createVariable(nm, "d", dims)
        v[:] = data
    v = f.createVariable("nv", "i", ("three", "nele"))
    v[:] = nv
    t = f.createVariable("time", "d", ("time",))
    t[:] = [0.0, 1.0]
    t.units = b"hours since 2020-01-01 00:00:00"
    for nm, data in [("u", 0.1 * (lonc - 4.0)), ("v", 0.2 + 0.0 * latc)]:
        v = f.createVariable(nm, "d", ("time", "nele"))
        v[:] = np.stack([data, data])
    z = f.createVariable("zeta", "d", ("time", "node"))
    z[:] = np.stack([0.3 + 0.0 * lon, 0.3 + 0.0 * lon])
    f.close()
    return path


def test_fvcom_reader(fvcom_file):
    from opendrift_tpu.fields.unstructured import FVCOMReader
    r = FVCOMReader(fvcom_file, resolution_deg=0.02)
    assert set(["x_sea_water_velocity", "y_sea_water_velocity",
                "sea_surface_height",
                "sea_floor_depth_below_sea_level"]) <= set(r.variables)
    assert r.times[0] == datetime(2020, 1, 1)
    u = r._read_frame("x_sea_water_velocity", 0, slice(None),
                      slice(None), slice(None))
    LON, _ = np.meshgrid(r.x, r.y)
    expect = 0.1 * (LON - 4.0)
    inside = np.isfinite(u)
    assert inside.mean() > 0.3
    # cell-centre field regridded back: linear field within a few percent
    assert np.nanmedian(np.abs(u[inside] - expect[inside])) < 0.01
    zeta = r._read_frame("sea_surface_height", 0, slice(None),
                         slice(None), slice(None))
    assert abs(np.nanmean(zeta) - 0.3) < 1e-3


def test_fvcom_drift_run(fvcom_file):
    from opendrift_tpu.models.oceandrift import OceanDrift
    from opendrift_tpu.fields.unstructured import FVCOMReader
    m = OceanDrift(loglevel=50)
    r = FVCOMReader(fvcom_file, resolution_deg=0.02)
    m.add_reader(r)
    m.set_config("general:use_auto_landmask", False)
    m.seed_elements(lon=4.5, lat=60.25, time=r.times[0], number=4)
    m.run(duration=timedelta(minutes=50), time_step=600)
    lat = np.asarray(m.result["lat"])
    # v = 0.2 m/s northward for 3000 s -> ~600 m -> ~0.0054 deg
    dlat = lat[:, -1] - lat[:, 0]
    assert np.all(dlat > 0.003)
    assert np.all(dlat < 0.009)


@pytest.fixture
def schism_file(tmp_path):
    """Synthetic SCHISM output: projected nodes, dahv + 3D hvel/zcor."""
    from scipy.io import netcdf_file
    rng = np.random.default_rng(11)
    n, nlev = 250, 5
    # NZTM-like local transverse mercator around (173E, 40S)
    from opendrift_tpu.utils import crs as crslib
    proj = ("+proj=tmerc +lat_0=0 +lon_0=173 +k_0=0.9996 +x_0=1600000 "
            "+y_0=10000000 +ellps=WGS84 +units=m")
    p = crslib.from_proj4(proj)
    lon = rng.uniform(172.5, 173.5, n)
    lat = rng.uniform(-40.5, -39.5, n)
    x, y = p.fwd(np, lon, lat)
    depth = np.full(n, 40.0)
    # zcor: evenly spaced levels from -depth to 0 per node
    zcor = np.linspace(-depth, 0.0, nlev).T  # (node, lev) ascending
    # hvel: u = 0.1 at surface decaying to 0 at bottom; v = const 0.05
    frac = (zcor + depth[:, None]) / depth[:, None]
    u3 = 0.1 * frac
    v3 = np.full_like(u3, 0.05)
    path = str(tmp_path / "schism.nc")
    f = netcdf_file(path, "w")
    f.createDimension("time", 2)
    f.createDimension("node", n)
    f.createDimension("lev", nlev)
    f.createDimension("two", 2)
    for nm, data in [("SCHISM_hgrid_node_x", x),
                     ("SCHISM_hgrid_node_y", y), ("depth", depth)]:
        v = f.createVariable(nm, "d", ("node",))
        v[:] = data
    t = f.createVariable("time", "d", ("time",))
    t[:] = [0.0, 3600.0]
    t.units = b"seconds since 2021-06-01 00:00:00"
    ev = f.createVariable("elev", "d", ("time", "node"))
    ev[:] = 0.1
    hv = f.createVariable("hvel", "d", ("time", "node", "lev", "two"))
    hv[:] = np.stack([np.stack([u3, v3], axis=-1)] * 2)
    zc = f.createVariable("zcor", "d", ("time", "node", "lev"))
    zc[:] = np.stack([zcor] * 2)
    dv = f.createVariable("dahv", "d", ("time", "node", "two"))
    dv[:] = np.stack([np.stack([0.05 * np.ones(n), 0.05 * np.ones(n)],
                               axis=-1)] * 2)
    f.close()
    return path, proj


def test_schism_reader_3d(schism_file):
    from opendrift_tpu.fields.unstructured import SCHISMReader
    path, proj = schism_file
    r = SCHISMReader(path, proj4=proj, use_3d=True, resolution_deg=0.05)
    assert "x_sea_water_velocity" in r.variables
    assert r._var_has_z["x_sea_water_velocity"]
    assert r.depths is not None and len(r.depths) >= 3
    u = r._read_frame("x_sea_water_velocity", 0, slice(None),
                      slice(None), slice(None))
    assert u.ndim == 3
    # u decays from 0.1 at surface to 0 at 40 m; check the level
    # nearest 20 m against the profile AT that level's actual depth
    surf = np.nanmedian(u[0])
    i20 = int(np.argmin(np.abs(np.asarray(r.depths) - 20.0)))
    d20 = float(np.asarray(r.depths)[i20])
    mid = np.nanmedian(u[i20])
    assert abs(surf - 0.1) < 0.01
    assert abs(mid - 0.1 * (1.0 - d20 / 40.0)) < 0.01


def test_schism_reader_2d_dahv(schism_file):
    from opendrift_tpu.fields.unstructured import SCHISMReader
    path, proj = schism_file
    r = SCHISMReader(path, proj4=proj, use_3d=False, resolution_deg=0.05)
    assert not r._var_has_z["x_sea_water_velocity"]
    u = r._read_frame("x_sea_water_velocity", 0, slice(None),
                      slice(None), slice(None))
    assert u.ndim == 2
    assert abs(np.nanmedian(u) - 0.05) < 0.005


@pytest.fixture
def shyfem_file(tmp_path):
    """Synthetic SHYFEM output: geographic nodes, level-resolved u/v."""
    from scipy.io import netcdf_file
    rng = np.random.default_rng(13)
    n, nlev = 220, 4
    lon = rng.uniform(12.5, 13.5, n)
    lat = rng.uniform(40.0, 40.8, n)
    levels = np.array([2.0, 10.0, 30.0, 80.0])  # layer bottoms
    path = str(tmp_path / "shyfem.nc")
    f = netcdf_file(path, "w")
    f.createDimension("time", 2)
    f.createDimension("node", n)
    f.createDimension("level", nlev)
    for nm, data in [("longitude", lon), ("latitude", lat)]:
        v = f.createVariable(nm, "d", ("node",))
        v[:] = data
    lv = f.createVariable("level", "d", ("level",))
    lv[:] = levels
    t = f.createVariable("time", "d", ("time",))
    t[:] = [0.0, 1.0]
    t.units = b"hours since 2022-03-01 00:00:00"
    u = f.createVariable("u_velocity", "d", ("time", "level", "node"))
    prof = np.array([0.2, 0.1, 0.05, 0.0])
    u[:] = np.broadcast_to(prof[None, :, None], (2, nlev, n)).copy()
    u.standard_name = b"eastward_sea_water_velocity"
    s = f.createVariable("salinity", "d", ("time", "level", "node"))
    s[:] = 38.0
    s.standard_name = b"sea_water_salinity"
    b = f.createVariable("total_depth", "d", ("node",))
    b[:] = 100.0
    b.standard_name = b"sea_floor_depth_below_sea_surface"
    f.close()
    return path


def test_shyfem_reader(shyfem_file):
    from opendrift_tpu.fields.unstructured import SHYFEMReader
    r = SHYFEMReader(shyfem_file, resolution_deg=0.05)
    assert "x_sea_water_velocity" in r.variables
    assert "sea_water_salinity" in r.variables
    assert "sea_floor_depth_below_sea_level" in r.variables
    # layer centres: bottoms [2,10,30,80] -> [1, 6, 20, 55]
    assert np.allclose(np.asarray(r.depths), [1.0, 6.0, 20.0, 55.0])
    u = r._read_frame("x_sea_water_velocity", 0, slice(None),
                      slice(None), slice(None))
    assert u.ndim == 3
    assert abs(np.nanmedian(u[0]) - 0.2) < 0.01
    assert abs(np.nanmedian(u[2]) - 0.05) < 0.01
    h = r._read_frame("sea_floor_depth_below_sea_level", 0, slice(None),
                      slice(None), slice(None))
    assert abs(np.nanmedian(h) - 100.0) < 0.1


def test_shyfem_drift_run(shyfem_file):
    from opendrift_tpu.models.oceandrift import OceanDrift
    from opendrift_tpu.fields.unstructured import SHYFEMReader
    m = OceanDrift(loglevel=50)
    r = SHYFEMReader(shyfem_file, resolution_deg=0.05)
    m.add_reader(r)
    m.set_config("general:use_auto_landmask", False)
    # seed at 20 m depth: u there is 0.05 m/s
    m.seed_elements(lon=13.0, lat=40.4, time=r.times[0], number=4, z=-20.0)
    m.run(duration=timedelta(minutes=50), time_step=600)
    lon = np.asarray(m.result["lon"])
    dx_m = (lon[:, -1] - lon[:, 0]) * np.cos(np.radians(40.4)) * 111320
    # 3000 s * 0.05 m/s = 150 m
    assert np.all(np.abs(dx_m - 150.0) < 30.0)


# ---------------------------------------------------------------- native --
# Device-side barycentric sampling on the triangle mesh (fields/mesh.py):
# more accurate than the reference's nearest-node unstructured path
# (reference basereader/unstructured.py:57-74).

def test_mesh_sampler_linear_exact():
    """Barycentric device sampling reproduces linear node fields exactly."""
    import jax.numpy as jnp
    from opendrift_tpu.fields.mesh import MeshSampler
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 2, 500)
    y = rng.uniform(50, 51, 500)
    ms = MeshSampler(x, y)
    dev = ms.device_arrays()
    vals = (3.0 * x - 2.0 * y + 7.0).astype(np.float32)
    rows = jnp.asarray(vals[:, None])
    qx = rng.uniform(0.3, 1.7, 200)
    qy = rng.uniform(50.2, 50.8, 200)
    tid, w, nidx, inside, valid = ms.locate_device(
        dev, jnp.asarray(qx), jnp.asarray(qy))
    assert bool(jnp.all(valid))
    got = ms.combine_rows(rows, w, nidx)[:, 0]
    expect = 3.0 * qx - 2.0 * qy + 7.0
    assert float(jnp.max(jnp.abs(got - expect))) < 1e-3


def test_mesh_sampler_hole_is_land():
    """With explicit connectivity, uncovered regions (islands/holes)
    are outside the mesh — unlike the Delaunay hull."""
    import jax.numpy as jnp
    from opendrift_tpu.fields.mesh import MeshSampler
    from scipy.spatial import Delaunay
    g = np.linspace(0.0, 1.0, 12)
    X, Y = np.meshgrid(g, g)
    pts = np.column_stack([X.ravel(), Y.ravel()])
    tri = Delaunay(pts)
    cent = pts[tri.simplices].mean(axis=1)
    hole = (np.abs(cent[:, 0] - 0.5) < 0.2) & \
        (np.abs(cent[:, 1] - 0.5) < 0.2)
    ms = MeshSampler(pts[:, 0], pts[:, 1],
                     triangles=tri.simplices[~hole])
    dev = ms.device_arrays()
    qx = jnp.asarray([0.5, 0.1, 0.9])
    qy = jnp.asarray([0.5, 0.1, 0.9])
    _, _, _, inside, _ = ms.locate_device(dev, qx, qy)
    assert not bool(inside[0])        # hole centre = not covered
    assert bool(inside[1]) and bool(inside[2])


def test_fvcom_native_drift(fvcom_file):
    from opendrift_tpu.models.oceandrift import OceanDrift
    from opendrift_tpu.fields.unstructured import FVCOMReader
    m = OceanDrift(loglevel=50)
    r = FVCOMReader(fvcom_file, sampling="native")
    assert r._mesh is not None
    m.add_reader(r)
    m.set_config("general:use_auto_landmask", False)
    m.seed_elements(lon=4.5, lat=60.25, time=r.times[0], number=4)
    m.run(duration=timedelta(minutes=50), time_step=600)
    lat = np.asarray(m.result["lat"])
    dlat = lat[:, -1] - lat[:, 0]
    # v = 0.2 m/s northward for 3000 s -> ~600 m -> ~0.0054 deg
    assert np.all(dlat > 0.003)
    assert np.all(dlat < 0.009)


def test_fvcom_native_matches_regrid(fvcom_file):
    """Native and regrid paths agree on a smooth field."""
    from opendrift_tpu.models.oceandrift import OceanDrift
    from opendrift_tpu.fields.unstructured import FVCOMReader

    def run(sampling):
        m = OceanDrift(loglevel=50)
        r = FVCOMReader(fvcom_file, sampling=sampling,
                        resolution_deg=0.02)
        m.add_reader(r)
        m.set_config("general:use_auto_landmask", False)
        m.seed_elements(lon=[4.4, 4.5, 4.6], lat=[60.2, 60.25, 60.3],
                        time=r.times[0], number=3)
        m.run(duration=timedelta(minutes=50), time_step=600)
        return (np.asarray(m.result["lon"])[:, -1],
                np.asarray(m.result["lat"])[:, -1])

    lon_n, lat_n = run("native")
    lon_r, lat_r = run("regrid")
    assert np.max(np.abs(lon_n - lon_r)) < 2e-3
    assert np.max(np.abs(lat_n - lat_r)) < 2e-3


@pytest.mark.skipif(not os.path.exists(SLF), reason="no Telemac test data")
def test_telemac_native_uses_file_connectivity():
    from opendrift_tpu.fields.unstructured import TelemacReader
    r = TelemacReader(SLF, proj4=LAMBERT_NORTH, sampling="native")
    assert r._mesh_triangles is not None     # IKLE-derived, not Delaunay
    assert r._mesh is not None
    assert r._mesh.triangles.shape[1] == 3


@pytest.mark.skipif(not os.path.exists(SLF), reason="no Telemac test data")
def test_telemac_native_vs_regrid_drift():
    from opendrift_tpu.models.oceandrift import OceanDrift
    from opendrift_tpu.fields.unstructured import TelemacReader

    def run(sampling):
        m = OceanDrift(loglevel=50)
        r = TelemacReader(SLF, proj4=LAMBERT_NORTH, sampling=sampling)
        m.add_reader(r)
        m.set_config("general:use_auto_landmask", False)
        m.seed_elements(lon=-5.55, lat=48.9, time=r.times[0], number=5)
        m.run(duration=timedelta(minutes=45), time_step=300)
        return (np.asarray(m.result["lon"])[:, -1],
                np.asarray(m.result["lat"])[:, -1])

    lon_n, lat_n = run("native")
    lon_r, lat_r = run("regrid")
    assert np.isfinite(lon_n).all()
    # both linear interpolations of the same tidal field: close but not
    # identical (native keeps the mesh's variable resolution)
    assert np.max(np.abs(lon_n - lon_r)) < 0.01
    assert np.max(np.abs(lat_n - lat_r)) < 0.01


def test_schism_native_3d_vertical(schism_file):
    """Native sampling interpolates the z-resolved hvel columns."""
    import jax.numpy as jnp
    from opendrift_tpu.fields.unstructured import SCHISMReader
    path, proj = schism_file
    r = SCHISMReader(path, proj4=proj, use_3d=True, sampling="native",
                     target_depths=[0.0, 10.0, 20.0, 30.0, 40.0])
    r.set_run_epoch(r.times[0])
    dev = r.device_state()
    lon = jnp.asarray([173.0, 173.1])
    lat = jnp.asarray([-40.0, -40.1])
    for z, expect in [(0.0, 0.1), (-20.0, 0.05), (-40.0, 0.0)]:
        vals, covers = r.sample(
            dev, ["x_sea_water_velocity", "y_sea_water_velocity"],
            jnp.float32(0.0), lon, lat, jnp.full(2, z))
        assert bool(jnp.all(covers))
        u = np.asarray(vals["x_sea_water_velocity"])
        v = np.asarray(vals["y_sea_water_velocity"])
        assert np.allclose(u, expect, atol=0.02), (z, u)
        assert np.allclose(v, 0.05, atol=0.01)


def test_schism_native_profiles(schism_file):
    import jax.numpy as jnp
    from opendrift_tpu.fields.unstructured import SCHISMReader
    path, proj = schism_file
    r = SCHISMReader(path, proj4=proj, use_3d=True, sampling="native",
                     target_depths=[0.0, 10.0, 20.0, 30.0, 40.0])
    r.set_run_epoch(r.times[0])
    dev = r.device_state()
    zlevels = jnp.asarray([0.0, -10.0, -20.0, -30.0])
    vals, covers = r.sample_profiles(
        dev, ["x_sea_water_velocity"], jnp.float32(0.0),
        jnp.asarray([173.0]), jnp.asarray([-40.0]), zlevels)
    prof = np.asarray(vals["x_sea_water_velocity"])[:, 0]
    # linear decay 0.1 (surface) -> 0 (40 m): 0.1, 0.075, 0.05, 0.025
    assert np.allclose(prof, [0.1, 0.075, 0.05, 0.025], atol=0.02)


def test_shyfem_native_drift(shyfem_file):
    from opendrift_tpu.models.oceandrift import OceanDrift
    from opendrift_tpu.fields.unstructured import SHYFEMReader
    m = OceanDrift(loglevel=50)
    r = SHYFEMReader(shyfem_file, sampling="native")
    m.add_reader(r)
    m.set_config("general:use_auto_landmask", False)
    m.seed_elements(lon=13.0, lat=40.4, time=r.times[0], number=4, z=-20.0)
    m.run(duration=timedelta(minutes=50), time_step=600)
    lon = np.asarray(m.result["lon"])
    dx_m = (lon[:, -1] - lon[:, 0]) * np.cos(np.radians(40.4)) * 111320
    assert np.all(np.abs(dx_m - 150.0) < 30.0)
