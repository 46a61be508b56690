"""Per-element environment, constant-2D fields, reader algebra overloads,
field convolution, skillscore, ML correction hook, gls_tke.

Reference behaviours: seed_elements(environment=...) via a constant
reader keyed on element_ID (basemodel/__init__.py:1228-1237),
reader_constant_2d, operators/ops.py Combine mixin, structured.py
set_convolution_kernel (:163-192), oceandrift.py machine-learning
correction (:239-283), legacy.py gls_tke (:5-46).
"""

from datetime import datetime

import numpy as np
import jax.numpy as jnp
import pytest

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.analytic import (ConstantReader,
                                           Constant2DReader,
                                           TimeseriesReader)


def _run_basic(o, steps=4, dt=3600):
    o.set_config("environment:fallback:land_binary_mask", 0)
    for v in ("x_sea_water_velocity", "y_sea_water_velocity"):
        if o.env.fallback_values.get(v) is None:
            o.set_config(f"environment:fallback:{v}", 0.0)
    o.run(steps=steps, time_step=dt)
    return o


def test_seed_per_element_environment():
    o = OceanDrift(loglevel=40)
    o.seed_elements(lon=[4, 4, 4], lat=[60, 60, 60],
                    time=datetime(2020, 1, 1), number=3,
                    environment={"x_sea_water_velocity": [0.0, 0.5, 1.0]})
    _run_basic(o)
    dlon = np.asarray(o.result["lon"])[:, -1] - 4.0
    assert dlon[0] == pytest.approx(0.0, abs=1e-6)
    assert dlon[1] == pytest.approx(dlon[2] / 2, rel=1e-3)
    assert dlon[2] > 0.1


def test_seed_per_element_environment_two_batches():
    o = OceanDrift(loglevel=40)
    o.seed_elements(lon=4, lat=60, time=datetime(2020, 1, 1), number=2,
                    environment={"x_sea_water_velocity": [1.0, 1.0]})
    o.seed_elements(lon=4, lat=60, time=datetime(2020, 1, 1), number=2,
                    environment={"x_sea_water_velocity": [-1.0, -1.0]})
    _run_basic(o)
    dlon = np.asarray(o.result["lon"])[:, -1] - 4.0
    assert (dlon[:2] > 0).all() and (dlon[2:] < 0).all()
    np.testing.assert_allclose(dlon[:2], -dlon[2:], rtol=1e-4)


def test_constant_2d_reader():
    x = np.linspace(0, 10, 11)
    y = np.linspace(0, 5, 6)
    arr = np.outer(np.arange(6, dtype=float), np.ones(11)) * 0.1
    r = Constant2DReader(x, y, {"sea_surface_height": arr})
    vals, cov = r.sample(r.device_state(), ["sea_surface_height"],
                         jnp.float32(0), jnp.asarray([5.0, 20.0]),
                         jnp.asarray([2.5, 2.5]), jnp.zeros(2))
    assert float(vals["sea_surface_height"][0]) == pytest.approx(0.25)
    assert bool(cov[0]) and not bool(cov[1])


def test_reader_operator_overloads():
    a = ConstantReader({"x_wind": 2.0})
    b = ConstantReader({"x_wind": 3.0})
    for rdr, expect in (((a + b), 5.0), ((2 * a), 4.0), ((a - 1.0), 1.0),
                        ((a / 2), 1.0), ((a - b), -1.0), ((a + 1.5), 3.5)):
        rdr.set_run_epoch(datetime(2020, 1, 1))
        v, _ = rdr.sample(rdr.device_state(), ["x_wind"], jnp.float32(0),
                          jnp.asarray([1.0]), jnp.asarray([1.0]),
                          jnp.zeros(1))
        assert float(v["x_wind"][0]) == pytest.approx(expect), rdr.name


def test_combine_gaussian():
    bg = ConstantReader({"x_wind": 0.0})
    obs = TimeseriesReader({"x_wind": [10.0, 10.0]},
                           [datetime(2020, 1, 1), datetime(2020, 1, 2)],
                           lon=4.0, lat=60.0)
    bl = bg.combine_gaussian(obs, std=50000.0)
    bl.set_run_epoch(datetime(2020, 1, 1))
    v, _ = bl.sample(bl.device_state(), ["x_wind"], jnp.float32(0),
                     jnp.asarray([4.0, 6.0]), jnp.asarray([60.0, 60.0]),
                     jnp.zeros(2))
    vals = np.asarray(v["x_wind"])
    assert vals[0] == pytest.approx(10.0, abs=1e-3)
    assert vals[1] < 2.0


def test_convolution_kernel():
    from opendrift_tpu.fields.netcdf import NetCDFReader
    ARCTIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
              "Arctic20_1to5Feb_2016.nc")
    r = NetCDFReader(ARCTIC)
    r.set_run_epoch(r.start_time)
    r.prepare(interval_seconds=3600.0)
    a = r._load_frame("x_sea_water_velocity", 0).copy()
    r.set_convolution_kernel(5)
    b = r._load_frame("x_sea_water_velocity", 0)
    # smoothing changes the field, preserves its mean, reduces variance
    assert np.abs(a - b).max() > 0.01
    assert np.nanmean(b) == pytest.approx(np.nanmean(a), abs=0.01)
    assert np.nanstd(b) < np.nanstd(a)
    # and the sampled device path still works on the smoothed frames
    lon = jnp.asarray([12.0], jnp.float32)
    lat = jnp.asarray([68.4], jnp.float32)
    dev_s = r.device_state(r.start_time, r.start_time)
    v1, cov = r.sample(dev_s, ["x_sea_water_velocity"], jnp.float32(0),
                       lon, lat, jnp.zeros(1))
    assert bool(cov[0]) and np.isfinite(float(v1["x_sea_water_velocity"][0]))


def test_skillscore():
    from opendrift_tpu.utils.trajectory import skillscore_liu_weissberg
    lon = np.linspace(4, 4.5, 20)
    lat = np.full(20, 60.0)
    assert skillscore_liu_weissberg(lon, lat, lon, lat) == 1.0
    mid = skillscore_liu_weissberg(lon, lat, lon, lat + 0.01)
    assert 0.5 < mid < 1.0
    assert skillscore_liu_weissberg(lon, lat, lon, lat + 5.0) == 0.0


def test_ml_correction_hook():
    # identity MLP pushing a constant eastward residual of 3600 m/h
    o = OceanDrift(loglevel=40)
    W = np.zeros((1, 2), np.float32)
    b = np.array([3600.0, 0.0], np.float32)
    o.set_ml_correction(
        weights=[(W, b)], predictors=["sea_water_temperature"],
        norm_in=(np.zeros(1), np.ones(1)),
        norm_out=(np.zeros(2), np.ones(2)))
    o.set_config("environment:fallback:sea_water_temperature", 10.0)
    o.seed_elements(lon=4, lat=60, time=datetime(2020, 1, 1), number=2)
    _run_basic(o)
    # 1 m/s for 4 hours eastward at 60N ~ 0.26 degrees
    dlon = np.asarray(o.result["lon"])[:, -1] - 4.0
    np.testing.assert_allclose(dlon, 4 * 3600 / (111320 * 0.5), rtol=0.01)


def test_gls_tke():
    from opendrift_tpu.models.legacy import gls_tke
    K = gls_tke(np.array([0.1]), np.linspace(0, 50, 6),
                np.array([1025.0]), np.array([1e-4]), np.array([0.01]))
    assert K.shape == (6, 1)
    assert np.all(np.asarray(K) > 0)
