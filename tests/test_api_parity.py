"""Long-tail public API parity (reference: basemodel methods
get_trajectory_lengths, closest_ocean_points, density_array_proj,
write_geotiff, seed_from_ladim/geopandas, add_readers_from_file)."""

import os
from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.analytic import ConstantReader

NORDIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
          "Nordic_subset.nc")
need_nordic = pytest.mark.skipif(not os.path.exists(NORDIC),
                                 reason="no Nordic data")


def _basic_run(hours=3):
    o = OceanDrift(loglevel=50)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 0.3,
                                 "y_sea_water_velocity": 0.1,
                                 "x_wind": 6.0, "y_wind": 0.0}))
    o.set_config("general:use_auto_landmask", False)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.seed_elements(lon=4.0, lat=60.0, number=10,
                    time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=hours), time_step=900)
    return o


@need_nordic
def test_ocean_only_relocation():
    from opendrift_tpu.fields.roms import ROMSReader
    o = OceanDrift(loglevel=50)
    r = ROMSReader(NORDIC)
    o.add_reader(r)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("seed:ocean_only", True)
    # (14.48, 67.01) sits on an interior land cell of the native rho
    # mask (nearest-cell land test, like the reference's Nearest2D
    # landmask sampling); (13.28, 66.86) is open water
    o.seed_elements(lon=[14.48, 13.28], lat=[67.01, 66.86],
                    time=r.times[0], number=2)
    o.run(duration=timedelta(hours=1), time_step=900)
    lon0 = np.asarray(o.result["lon"])[:, 0]
    lat0 = np.asarray(o.result["lat"])[:, 0]
    # land point moved, ocean point untouched
    assert abs(lon0[0] - 14.48) + abs(lat0[0] - 67.01) > 1e-3
    assert abs(lon0[1] - 13.28) + abs(lat0[1] - 66.86) < 1e-6
    # relocated particle actually drifts (it is in water now)
    lon = np.asarray(o.result["lon"])
    assert abs(lon[0, -1] - lon[0, 0]) > 1e-6


def test_trajectory_lengths_and_property():
    o = _basic_run()
    total, dist, speeds = o.get_trajectory_lengths()
    # current (0.3, 0.1) + default 2% windage on 6 m/s wind:
    # hypot(0.42, 0.1) m/s * 3 h = 4662 m
    assert np.allclose(total, np.hypot(0.42, 0.1) * 10800, rtol=0.02)
    prop, status = o.get_property("lon")
    assert prop.shape[0] == 13  # time-major like the reference
    times, rel = o.get_time_array()
    assert rel[-1] == timedelta(hours=3)
    assert o.num_elements_total() == 10


def test_density_proj_and_geotiff(tmp_path):
    o = _basic_run()
    proj = "+proj=stere +lat_0=60 +lon_0=4 +R=6371000"
    H, xe, ye, crs = o.get_density_array_proj(pixelsize_m=1000,
                                              density_proj=proj)
    assert H.sum() == 10 * H.shape[0]  # every particle binned each step
    nc = str(tmp_path / "dens.nc")
    o.write_netcdf_density_map_proj(nc, pixelsize_m=1000,
                                    density_proj=proj)
    from scipy.io import netcdf_file
    f = netcdf_file(nc, "r", mmap=False)
    assert f.variables["density"][:].sum() > 0
    f.close()
    tifs = o.write_geotiff(str(tmp_path / "d_%Y%m%d%H%M.tif"),
                           pixelsize_km=1.0)
    assert len(tifs) == 13
    assert os.path.exists(tifs[0])
    assert os.path.exists(tifs[0][:-4] + ".tfw")


def test_plot_environment(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    o = _basic_run()
    png = str(tmp_path / "env.png")
    o.plot_environment(filename=png)
    assert os.path.getsize(png) > 5000


@need_nordic
def test_add_readers_from_file(tmp_path):
    lst = str(tmp_path / "readers.txt")
    with open(lst, "w") as fd:
        fd.write(f"# catalog\n{NORDIC}\n/nonexistent.nc\n")
    o = OceanDrift(loglevel=50)
    o.add_readers_from_file(lst, lazy=False)
    assert len(o.env.readers) == 1
    assert len(o.default_readers()) == 4


@need_nordic
def test_seed_from_ladim(tmp_path):
    from opendrift_tpu.fields.roms import ROMSReader
    r = ROMSReader(NORDIC)
    rls = str(tmp_path / "release.rls")
    with open(rls, "w") as fd:
        fd.write("2016-02-02T12 10 20 5\n2016-02-02T12 30 25 2\n")
    o = OceanDrift(loglevel=50)
    o.seed_from_ladim(rls, r)
    assert o.num_elements_scheduled_total == 2
    s = o._seedings[-1]
    # positions land inside the ROMS domain
    assert r.covers_positions(s["lon"], s["lat"]).all()
    assert np.all(s["z"] <= 0)


def test_seed_from_geopandas_ducktyped():
    class Pt:
        geom_type = "Point"
        def __init__(self, x, y):
            self.x, self.y = x, y
    class GDF:
        geometry = [Pt(4.1, 60.2), Pt(4.3, 60.4)]
    o = OceanDrift(loglevel=50)
    o.seed_from_geopandas(GDF(), time=datetime(2020, 1, 1))
    assert o.num_elements_scheduled_total == 2
    s = o._seedings[-1]
    assert np.allclose(sorted(s["lon"]), [4.1, 4.3])
