"""EPS ensemble forcing: members served round-robin to elements
(reference parity: reader_netCDF_CF_generic.py:560-569,
interpolation/structured.py:120-134)."""

from datetime import datetime, timedelta

import numpy as np
import pytest

MEMBER_U = [0.1, 0.2, 0.4]


@pytest.fixture
def ensemble_file(tmp_path):
    """Lat-lon NetCDF with a realization dimension of 3 members whose
    eastward currents differ."""
    from scipy.io import netcdf_file
    path = str(tmp_path / "eps.nc")
    f = netcdf_file(path, "w")
    nx = ny = 12
    f.createDimension("lon", nx)
    f.createDimension("lat", ny)
    f.createDimension("realization", 3)
    f.createDimension("time", 2)
    lon = f.createVariable("lon", "d", ("lon",))
    lon[:] = np.linspace(3.0, 5.0, nx)
    lon.standard_name = b"longitude"
    lon.units = b"degree_east"
    lat = f.createVariable("lat", "d", ("lat",))
    lat[:] = np.linspace(59.0, 61.0, ny)
    lat.standard_name = b"latitude"
    lat.units = b"degree_north"
    t = f.createVariable("time", "d", ("time",))
    t[:] = [0.0, 24.0]
    t.units = b"hours since 2020-01-01 00:00:00"
    u = f.createVariable("u", "d", ("time", "realization", "lat", "lon"))
    for m, uval in enumerate(MEMBER_U):
        u[:, m] = uval
    u.standard_name = b"eastward_sea_water_velocity"
    v = f.createVariable("v", "d", ("time", "realization", "lat", "lon"))
    v[:] = 0.0
    v.standard_name = b"northward_sea_water_velocity"
    f.close()
    return path


def test_ensemble_detection(ensemble_file):
    from opendrift_tpu.fields.netcdf import NetCDFReader
    r = NetCDFReader(ensemble_file)
    assert r.ensemble_size == 3
    assert "x_sea_water_velocity" in r.variables


def test_ensemble_round_robin_drift(ensemble_file):
    """Element i must drift with member (ID % 3)'s current."""
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.netcdf import NetCDFReader
    o = OceanDrift(loglevel=50)
    o.add_reader(NetCDFReader(ensemble_file))
    o.set_config("general:use_auto_landmask", False)
    o.set_config("environment:fallback:land_binary_mask", 0)
    N = 12
    o.seed_elements(lon=np.full(N, 4.0), lat=np.full(N, 60.0),
                    time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=6), time_step=1800)
    lon = np.asarray(o.result["lon"])
    ids = np.asarray(o.result["ID"])[:, 0] if "ID" in o.result else \
        np.arange(1, N + 1)
    dx_m = (lon[:, -1] - lon[:, 0]) * 111320 * np.cos(np.radians(60.0))
    expect = np.array([MEMBER_U[i % 3] for i in ids]) * 6 * 3600
    # distinct drift per member, matching each member's current to ~1%
    assert np.max(np.abs(dx_m - expect) / expect) < 0.02
    assert len(np.unique(np.round(dx_m, 0))) >= 3


def test_ensemble_spread_statistics(ensemble_file):
    """Many elements: the displacement histogram has 3 distinct modes."""
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.netcdf import NetCDFReader
    o = OceanDrift(loglevel=50)
    o.add_reader(NetCDFReader(ensemble_file))
    o.set_config("general:use_auto_landmask", False)
    o.set_config("environment:fallback:land_binary_mask", 0)
    N = 90
    o.seed_elements(lon=np.full(N, 4.0), lat=np.full(N, 60.0),
                    time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=3), time_step=1800)
    lon = np.asarray(o.result["lon"])
    dx = lon[:, -1] - lon[:, 0]
    modes = np.unique(np.round(dx, 4))
    assert len(modes) == 3
    counts = [np.sum(np.round(dx, 4) == m) for m in modes]
    assert counts == [30, 30, 30]  # perfectly balanced round-robin
