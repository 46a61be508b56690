"""Curvilinear (2D lon/lat) NetCDF grids via the inverse-lookup path.

The reference handles such grids with its 'fakeproj' LinearND fallback
(reference basereader/structured.py:46-119); here the inverse map is
precomputed into regular index-lookup rasters sampled bilinearly on
device, keeping field values on the native grid.
"""

from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.fields.netcdf import NetCDFReader
from opendrift_tpu.models import OceanDrift

T0 = datetime(2021, 1, 1)


@pytest.fixture(scope="module")
def curvi_file(tmp_path_factory):
    """Rotated curvilinear grid around (4.0E, 60.0N): 2 km cells turned
    20 degrees, uniform (u, v) = (0.4, 0.1) m/s east/north."""
    from scipy.io import netcdf_file

    path = str(tmp_path_factory.mktemp("curvi") / "curvi.nc")
    nj, ni, rot_deg = 40, 50, 20.0
    jj, ii = np.meshgrid(np.arange(nj, dtype=float),
                         np.arange(ni, dtype=float), indexing="ij")
    th = np.deg2rad(rot_deg)
    ex = (ii - ni / 2) * 2.0            # km
    ey = (jj - nj / 2) * 2.0
    rx = ex * np.cos(th) - ey * np.sin(th)
    ry = ex * np.sin(th) + ey * np.cos(th)
    lat2d = 60.0 + ry / 111.32
    lon2d = 4.0 + rx / (111.32 * np.cos(np.deg2rad(60.0)))
    f = netcdf_file(path, "w")
    f.createDimension("time", 2)
    f.createDimension("j", nj)
    f.createDimension("i", ni)
    tv = f.createVariable("time", "d", ("time",))
    tv[:] = [0.0, 86400.0]
    tv.units = b"seconds since 2021-01-01 00:00:00"
    lonv = f.createVariable("longitude", "d", ("j", "i"))
    lonv[:] = lon2d
    lonv.standard_name = b"longitude"
    latv = f.createVariable("latitude", "d", ("j", "i"))
    latv[:] = lat2d
    latv.standard_name = b"latitude"
    for nm, std, val in (("uo", b"eastward_sea_water_velocity", 0.4),
                         ("vo", b"northward_sea_water_velocity", 0.1)):
        vv = f.createVariable(nm, "f", ("time", "j", "i"))
        vv[:] = np.full((2, nj, ni), val, np.float32)
        vv.standard_name = std
        vv.coordinates = b"latitude longitude"
    f.close()
    return path


def test_curvilinear_autodetect_and_roundtrip(curvi_file):
    r = NetCDFReader(curvi_file)
    assert r._curvilinear
    assert "x_sea_water_velocity" in r.variables
    xi, yi = r.lonlat2xy(np.array([4.0, 4.3]), np.array([60.0, 60.2]))
    lon2, lat2 = r.xy2lonlat(xi, yi)
    np.testing.assert_allclose(lon2, [4.0, 4.3], atol=1e-6)
    np.testing.assert_allclose(lat2, [60.0, 60.2], atol=1e-6)


def test_curvilinear_sample_and_coverage(curvi_file):
    r = NetCDFReader(curvi_file)
    out = r.sample_at([4.0, 99.0], [60.0, 60.0], T0)
    vals = out["x_sea_water_velocity"]
    assert abs(vals[0] - 0.4) < 1e-5
    assert np.isnan(vals[1])            # outside the grid hull


def test_curvilinear_run_matches_analytic_drift(curvi_file):
    """RK4 drift through the rotated grid equals the uniform-current
    analytic displacement — the rotation must not leak into the
    sampled east/north components."""
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    o.add_reader(NetCDFReader(curvi_file))
    o.seed_elements(4.0, 60.0, number=20, radius=2000, time=T0)
    o.run(duration=timedelta(hours=6), time_step=900)
    lon = o.result["lon"].values
    lat = o.result["lat"].values
    dlon_m = (lon[:, -1] - lon[:, 0]).mean() * 111320 \
        * np.cos(np.deg2rad(60))
    dlat_m = (lat[:, -1] - lat[:, 0]).mean() * 111320
    assert abs(dlon_m - 0.4 * 6 * 3600) < 300
    assert abs(dlat_m - 0.1 * 6 * 3600) < 300
