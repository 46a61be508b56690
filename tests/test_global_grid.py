"""Global geographic grids: dateline conventions (reference parity:
reader_netCDF_CF_generic.py:452-466 global-grid dateline handling)."""

from datetime import datetime, timedelta

import numpy as np
import pytest


def _make_global_file(tmp_path, lon0, lon1, name):
    from scipy.io import netcdf_file
    path = str(tmp_path / name)
    f = netcdf_file(path, "w")
    nx, ny = 144, 30
    f.createDimension("lon", nx)
    f.createDimension("lat", ny)
    f.createDimension("time", 2)
    lon = f.createVariable("lon", "d", ("lon",))
    lon[:] = np.linspace(lon0, lon1, nx)
    lon.standard_name = b"longitude"
    lon.units = b"degree_east"
    lat = f.createVariable("lat", "d", ("lat",))
    lat[:] = np.linspace(-70.0, 70.0, ny)
    lat.standard_name = b"latitude"
    lat.units = b"degree_north"
    t = f.createVariable("time", "d", ("time",))
    t[:] = [0.0, 48.0]
    t.units = b"hours since 2020-01-01 00:00:00"
    u = f.createVariable("u", "d", ("time", "lat", "lon"))
    u[:] = 0.5
    u.standard_name = b"eastward_sea_water_velocity"
    v = f.createVariable("v", "d", ("time", "lat", "lon"))
    v[:] = 0.0
    v.standard_name = b"northward_sea_water_velocity"
    f.close()
    return path


def test_0_360_grid_serves_negative_longitudes(tmp_path):
    from opendrift_tpu.fields.netcdf import NetCDFReader
    r = NetCDFReader(_make_global_file(tmp_path, 0.0, 357.5, "g360.nc"))
    lon = np.array([-170.0, -10.0, 10.0, 190.0])
    lat = np.zeros(4)
    assert r.covers_positions(lon, lat).all()


def test_dateline_crossing_drift(tmp_path):
    """A particle seeded just west of the dateline on a 0..360 grid keeps
    moving as it crosses into negative longitudes."""
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.netcdf import NetCDFReader
    o = OceanDrift(loglevel=50)
    o.add_reader(NetCDFReader(
        _make_global_file(tmp_path, 0.0, 357.5, "g360b.nc")))
    o.set_config("general:use_auto_landmask", False)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.seed_elements(lon=179.8, lat=0.0, time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=36), time_step=3600)
    lon = np.asarray(o.result["lon"])[0]
    # 0.5 m/s * 36 h = 64.8 km = 0.58 deg at the equator -> crossed 180
    assert lon[-1] < -179.3  # wrapped to the western hemisphere
    # displacement is continuous: steps of ~0.016 deg (mod 360)
    dstep = np.diff(lon) % 360.0
    assert np.all(dstep < 0.03)


def test_minus180_grid_serves_eastern_overflow(tmp_path):
    from opendrift_tpu.fields.netcdf import NetCDFReader
    r = NetCDFReader(_make_global_file(tmp_path, -180.0, 177.5,
                                       "g180.nc"))
    lon = np.array([185.0, 350.0, -175.0])
    lat = np.zeros(3)
    assert r.covers_positions(lon, lat).all()
