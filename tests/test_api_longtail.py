"""Long-tail public-API parity: reader/env diagnostics, letter/slick/LADiM
seeding, solar + stress relations, memory/budget plots.

Reference behaviours: get_timeseries_at_position
(basereader/__init__.py:387), get_variables_along_trajectory
(environment.py:925), seed_letters (basemodel/__init__.py:1635),
import_from_ladim (opendrift/__init__.py:125), seed_from_gml
(openoil.py:1773), solar_elevation (physics_methods.py:1036).
"""

import os
import struct
import tempfile
from datetime import datetime, timedelta

import numpy as np
import pytest

import opendrift_tpu
from opendrift_tpu.fields.analytic import (ConstantReader,
                                           OscillatingReader)
from opendrift_tpu.fields.environment import Environment
from opendrift_tpu.models import OceanDrift
from opendrift_tpu.models.openoil import OpenOil
from opendrift_tpu.ops import physics as P

GML = ("/root/reference/tests/test_data/radarsat_oil_satellite_observation/"
       "RS2_20151116_002619_0127_SCNB_HH_SGF_433012_9730_12182143_Oil.gml")


def test_get_timeseries_at_position():
    r = OscillatingReader("x_sea_water_velocity", amplitude=2.0,
                          period_seconds=7200.0,
                          zero_time=datetime(2020, 1, 1))
    times = [datetime(2020, 1, 1) + timedelta(minutes=30 * i)
             for i in range(5)]
    ts = r.get_timeseries_at_position(
        lon=3.0, lat=60.0, variables=["x_sea_water_velocity"], times=times)
    assert ts["time"] == times
    np.testing.assert_allclose(ts["x_sea_water_velocity"],
                               [0, 2, 0, -2, 0], atol=1e-5)


def test_get_variables_along_trajectory():
    r = OscillatingReader("x_sea_water_velocity", amplitude=1.0,
                          period_seconds=7200.0,
                          zero_time=datetime(2020, 1, 1))
    env = Environment(required_variables={"x_sea_water_velocity": {},
                                          "y_sea_water_velocity": {}})
    env.add_reader([r, ConstantReader({"y_sea_water_velocity": 0.25})])
    env.finalize(run_epoch=datetime(2020, 1, 1))
    times = [datetime(2020, 1, 1) + timedelta(minutes=30 * i)
             for i in range(5)]
    out = env.get_variables_along_trajectory(
        ["x_sea_water_velocity", "y_sea_water_velocity"],
        lons=np.linspace(3, 3.4, 5), lats=[60.0] * 5, times=times)
    np.testing.assert_allclose(out["x_sea_water_velocity"],
                               [0, 1, 0, -1, 0], atol=1e-5)
    np.testing.assert_allclose(out["y_sea_water_velocity"], 0.25)


def test_seed_letters():
    o = OceanDrift(loglevel=40)
    o.seed_letters("OD", lon=4.0, lat=60.0, time=datetime(2020, 1, 1),
                   number=20)
    # O and D each have outer+inner outlines -> 4 polygons x 20
    assert o.num_elements_scheduled() == 80
    lons = np.concatenate([s["lon"] for s in o._seedings])
    assert lons.min() > 3.9 and lons.max() < 6.5


def test_import_from_ladim():
    from scipy.io import netcdf_file
    d = tempfile.mkdtemp()
    p = os.path.join(d, "ladim.nc")
    f = netcdf_file(p, "w")
    f.createDimension("particle_instance", 5)
    f.createDimension("time", 2)
    f.createDimension("particle", 3)
    v = f.createVariable("pid", "i4", ("particle_instance",))
    v[:] = [0, 1, 2, 0, 2]
    v = f.createVariable("particle_count", "i4", ("time",))
    v[:] = [3, 2]
    v = f.createVariable("X", "f4", ("particle_instance",))
    v[:] = [1, 2, 3, 1.5, 3.5]
    v = f.createVariable("Y", "f4", ("particle_instance",))
    v[:] = [1, 1, 1, 2, 2]
    v = f.createVariable("time", "f8", ("time",))
    v[:] = [0, 3600]
    v.units = b"seconds since 2020-01-01 00:00:00"
    f.close()

    class FakeRoms:
        def xy2lonlat(self, x, y):
            return (4.0 + 0.01 * np.asarray(x),
                    60.0 + 0.01 * np.asarray(y))

    sim = opendrift_tpu.import_from_ladim(p, FakeRoms())
    lon = np.asarray(sim.result["lon"])
    status = np.asarray(sim.result["status"])
    np.testing.assert_allclose(lon[:, 0], [4.01, 4.02, 4.03], atol=1e-5)
    # particle 1 absent at t=1 -> its last valid state (t=0) is terminal
    assert status[1, 0] == 1 and status[1, 1] == -128
    assert status[0, 1] == 1 and status[0, 0] == 0


@pytest.mark.skipif(not os.path.exists(GML), reason="no reference data")
def test_seed_from_gml():
    o = OpenOil(loglevel=40)
    o.seed_from_gml(GML, num_elements=1000)
    n = o.num_elements_scheduled()
    assert 800 < n < 1200
    s = o._seedings[-1]
    assert s["time"][0] == datetime(2015, 11, 16, 0, 26, 18, 770000)


def _write_tiff(path, data, lon0=-88.0, lat0=29.0, dlon=0.01, dlat=0.02):
    ny, nx = data.shape

    def tag(t, typ, n, val):
        return struct.pack("<HHI4s", t, typ, n, val)

    ntags = 8
    ps_off = 8 + 2 + 12 * ntags + 4
    tp_off = ps_off + 8 * 3
    strip_off = tp_off + 8 * 6
    ifd = struct.pack("<H", ntags)
    ifd += tag(256, 3, 1, struct.pack("<I", nx))
    ifd += tag(257, 3, 1, struct.pack("<I", ny))
    ifd += tag(258, 3, 1, struct.pack("<I", 8))
    ifd += tag(259, 3, 1, struct.pack("<I", 1))
    ifd += tag(273, 4, 1, struct.pack("<I", strip_off))
    ifd += tag(279, 4, 1, struct.pack("<I", ny * nx))
    ifd += tag(33550, 12, 3, struct.pack("<I", ps_off))
    ifd += tag(33922, 12, 6, struct.pack("<I", tp_off))
    ifd += struct.pack("<I", 0)
    body = struct.pack("<3d", dlon, dlat, 0.0)
    body += struct.pack("<6d", 0, 0, 0, lon0, lat0, 0.0)
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 8) + ifd + body
                + data.tobytes())


def test_seed_from_geotiff_thickness():
    data = np.zeros((8, 10), np.uint8)
    data[2:5, 3:7] = 2
    data[5:7, 1:4] = 4
    p = os.path.join(tempfile.mkdtemp(), "slick.tif")
    _write_tiff(p, data)
    from opendrift_tpu.utils.geotiff import read_geotiff
    d2, (lon0, dlon, lat0, dlat) = read_geotiff(p)
    assert np.array_equal(d2, data)
    assert (lon0, dlon, lat0, dlat) == (-88.0, 0.01, 29.0, -0.02)
    o = OpenOil(loglevel=40)
    o.seed_from_geotiff_thickness(p, number=400, time=datetime(2020, 1, 1))
    assert o.num_elements_scheduled() == 400
    s = np.concatenate([s["lon"] for s in o._seedings])
    assert s.min() >= -88.0 and s.max() <= -88.0 + 0.1


def test_solar_elevation():
    # reference formula behaviour (physics_methods.py:997-1044), incl.
    # its arcsin(deg2rad(-23.44) cos(...)) declination amplitude of 24.15
    e_noon = float(P.solar_elevation_time(
        datetime(2020, 6, 21, 12), 0.0, 60.0)[0])
    assert abs(e_noon - (90 - 60 + 24.15)) < 0.5
    e_mid = float(P.solar_elevation_time(
        datetime(2020, 6, 21, 0), 0.0, 60.0)[0])
    assert e_mid < 0


def test_windspeed_from_stress_roundtrip():
    tau = np.array([0.05, 0.2, 0.8, 2.0], np.float32)
    u = np.asarray(P.windspeed_from_stress(tau))
    cd = np.where(u > 11, 0.001 * (0.49 + 0.065 * u), 0.0012)
    np.testing.assert_allclose(cd * 1.225 * u ** 2, tau, rtol=1e-4)


def test_memory_usage_and_plots(tmp_path):
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.5)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.0)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.seed_elements(lon=4, lat=60, time=datetime(2020, 1, 1), number=10)
    o.run(steps=4, time_step=600)
    assert len(o.memory_usage) == 4
    assert all(m > 10 for m in o.memory_usage)
    import matplotlib
    matplotlib.use("Agg")
    o.plot_memory_usage(filename=str(tmp_path / "mem.png"))
    o.plot_vertical_distribution(filename=str(tmp_path / "vdist.png"))
    assert (tmp_path / "mem.png").exists()
    assert (tmp_path / "vdist.png").exists()


def test_misc_base_api():
    """post_run hook, add_metadata, SRS, index_of_first_and_last,
    points_within_polygon (reference basemodel long tail)."""
    import numpy as np
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.analytic import ConstantReader

    ran = []

    class MyModel(OceanDrift):
        def post_run(self):
            ran.append(True)

    o = MyModel(loglevel=40)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 0.1,
                                 "y_sea_water_velocity": 0.0,
                                 "land_binary_mask": 0.0}))
    o.add_metadata("experiment", "unit-test")
    o.seed_elements(lon=4, lat=60, number=10, time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=1), time_step=600)
    assert ran == [True]
    assert o.result.attrs["experiment"] == "unit-test"
    assert o.SRS().is_latlon

    arr = np.array([[np.nan, 1.0, 2.0, np.nan],
                    [np.nan, np.nan, np.nan, np.nan]])
    first, last = o.index_of_first_and_last(arr)
    assert list(first) == [1, -1] and list(last) == [2, -1]

    inside = o.points_within_polygon(
        [0.5, 2.0], [0.5, 0.5], [0, 1, 1, 0], [0, 0, 1, 1])
    assert list(inside) == [True, False]
