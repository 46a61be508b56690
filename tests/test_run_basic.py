"""End-to-end runs on analytic fields: the PR1 vertical slice.

Mirrors the reference's run-machinery tests
(reference: tests/models/test_run.py) using analytic readers as backends.
"""

from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.models import OceanDrift, WindBlow
from opendrift_tpu.fields import DoubleGyre, ConstantReader
from opendrift_tpu.errors import WrongMode


def make_double_gyre_sim(scheme="runge-kutta4", number=10, loglevel=40):
    o = OceanDrift(loglevel=loglevel)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:advection_scheme", scheme)
    o.set_config("drift:vertical_advection", False)
    dg = DoubleGyre(epsilon=0.25, omega=0.628, A=0.1)
    o.add_reader(dg)
    x, y = [0.9], [0.5]
    lon, lat = dg.xy2lonlat(x, y)
    o.seed_elements(lon, lat, radius=0.1, number=number,
                    time=dg.initial_time)
    return o, dg


def test_double_gyre_run():
    o, dg = make_double_gyre_sim()
    o.run(duration=timedelta(seconds=10), time_step=0.1)
    ds = o.result
    assert ds.dims["trajectory"] == 10
    assert ds.dims["time"] == 101
    lon = ds["lon"].values
    lat = ds["lat"].values
    assert np.isfinite(lon).all()
    # particles must actually move
    assert np.abs(lon[:, -1] - lon[:, 0]).max() > 1e-7
    # and remain inside the [0,2]x[0,1] domain
    x, y = dg.lonlat2xy(lon[:, -1], lat[:, -1])
    assert (x >= -0.05).all() and (x <= 2.05).all()
    assert (y >= -0.05).all() and (y <= 1.05).all()


def test_double_gyre_against_exact_integration():
    """Trajectory parity: RK4 at small dt vs scipy high-accuracy
    integration of the same velocity field in projected coordinates."""
    from scipy.integrate import solve_ivp

    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    o.set_config("drift:vertical_advection", False)
    dg = DoubleGyre(epsilon=0.25, omega=0.628, A=0.1)
    o.add_reader(dg)
    x0, y0 = 0.9, 0.5
    lon, lat = dg.xy2lonlat([x0], [y0])
    o.seed_elements(lon, lat, number=1, time=dg.initial_time)
    o.run(duration=timedelta(seconds=10), time_step=0.05)

    eps, om, A = 0.25, 0.628, 0.1

    def vel(t, xy):
        x, y = xy
        a = eps * np.sin(om * t)
        b = 1 - 2 * a
        f = a * x * x + b * x
        dfdx = 2 * a * x + b
        # field is in m/s on the projected plane; grid unit = 1 (metre)
        return [-np.pi * A * np.sin(np.pi * f) * np.cos(np.pi * y),
                np.pi * A * np.cos(np.pi * f) * np.sin(np.pi * y) * dfdx]

    sol = solve_ivp(vel, [0, 10], [x0, y0], rtol=1e-10, atol=1e-12)
    xe, ye = sol.y[0, -1], sol.y[1, -1]
    lon_end = o.result["lon"].values[0, -1]
    lat_end = o.result["lat"].values[0, -1]
    x_end, y_end = dg.lonlat2xy(lon_end, lat_end)
    # X/Y in metres on a 6371 km sphere: 1 unit ~ 1 m.  f32 positions give
    # ~1e-7 deg ~ 1e-2 m noise; allow 5 cm.
    assert abs(x_end - xe) < 0.05
    assert abs(y_end - ye) < 0.05


def test_rk_schemes_differ_and_euler_converges():
    ends = {}
    for scheme in ["euler", "runge-kutta", "runge-kutta4"]:
        o, dg = make_double_gyre_sim(scheme, number=1)
        o.run(duration=timedelta(seconds=10), time_step=0.5)
        ends[scheme] = (o.result["lon"].values[0, -1],
                        o.result["lat"].values[0, -1])
    assert ends["euler"] != ends["runge-kutta4"]
    assert ends["runge-kutta"] != ends["euler"]


def test_run_repeatable():
    """Identical seeds give identical runs (reference test_run.py:205-220)."""
    o1, _ = make_double_gyre_sim(number=50)
    o1.run(duration=timedelta(seconds=5), time_step=0.1)
    o2, _ = make_double_gyre_sim(number=50)
    o2.run(duration=timedelta(seconds=5), time_step=0.1)
    np.testing.assert_array_equal(o1.result["lon"].values,
                                  o2.result["lon"].values)


def test_constant_current():
    """Eastward 1 m/s current: displacement must match the geodesic."""
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:vertical_advection", False)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 1.0,
                                 "y_sea_water_velocity": 0.0}))
    t0 = datetime(2020, 1, 1)
    o.seed_elements(lon=4.0, lat=60.0, number=1, time=t0)
    o.run(duration=timedelta(hours=10), time_step=900)
    # 40 consecutive 900 m due-east geodesic steps (what the reference's
    # per-step Geod.fwd produces) — compute the same chain in float64
    from opendrift_tpu.utils.geodesic import direct_np
    lat_e, lon_e = 60.0, 4.0
    for _ in range(40):
        lat_e, lon_e = direct_np(lat_e, lon_e, 90.0, 900.0)
    assert abs(o.result["lat"].values[0, -1] - lat_e) < 2e-4
    assert abs(o.result["lon"].values[0, -1] - lon_e) < 4e-4


def test_output_timestep():
    o, _ = make_double_gyre_sim(number=3)
    o.run(duration=timedelta(seconds=10), time_step=0.1,
          time_step_output=1.0)
    assert o.result.dims["time"] == 11


def test_backward_run_returns():
    """Forward then backward runs should approximately return to start."""
    o, dg = make_double_gyre_sim("runge-kutta4", number=1)
    o.run(duration=timedelta(seconds=10), time_step=0.1)
    lon_end = float(o.result["lon"].values[0, -1])
    lat_end = float(o.result["lat"].values[0, -1])

    o2 = OceanDrift(loglevel=40)
    o2.set_config("environment:fallback:land_binary_mask", 0)
    o2.set_config("drift:advection_scheme", "runge-kutta4")
    o2.set_config("drift:vertical_advection", False)
    dg2 = DoubleGyre(epsilon=0.25, omega=0.628, A=0.1)
    o2.add_reader(dg2)
    o2.seed_elements(lon_end, lat_end, number=1,
                     time=dg2.initial_time + timedelta(seconds=10))
    o2.run(duration=timedelta(seconds=10), time_step=-0.05)
    x0, y0 = dg.lonlat2xy(o.result["lon"].values[0, 0],
                          o.result["lat"].values[0, 0])
    xb, yb = dg2.lonlat2xy(o2.result["lon"].values[0, -1],
                           o2.result["lat"].values[0, -1])
    # fwd dt=0.1 truncation + chaotic growth: ~5 cm over the 2 m domain
    assert abs(xb - x0) < 0.05 and abs(yb - y0) < 0.05


def test_windblow():
    o = WindBlow(loglevel=40)
    o.add_reader(ConstantReader({"x_wind": 10.0, "y_wind": 0.0}))
    o.seed_elements(lon=4.0, lat=60.0, number=2, time=datetime(2020, 1, 1))
    o.run(steps=10, time_step=3600)
    assert o.result["lon"].values[0, -1] > 4.5


def test_delayed_release():
    """Elements seeded later must stay unreleased (NaN) until their time."""
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:vertical_advection", False)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 1.0,
                                 "y_sea_water_velocity": 0.0}))
    t0 = datetime(2020, 1, 1)
    o.seed_elements(lon=4.0, lat=60.0, number=1, time=t0)
    o.seed_elements(lon=4.0, lat=60.0, number=1,
                    time=t0 + timedelta(hours=5))
    o.run(duration=timedelta(hours=10), time_step=3600)
    lon = o.result["lon"].values
    assert np.isnan(lon[1, :5]).all()
    assert np.isfinite(lon[1, 5:]).all()
    # late element has drifted half as far
    d0 = lon[0, -1] - lon[0, 0]
    d1 = lon[1, -1] - 4.0
    assert abs(d1 / d0 - 0.5) < 0.05


def test_max_age():
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:vertical_advection", False)
    o.set_config("drift:max_age_seconds", 3 * 3600.0)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 1.0,
                                 "y_sea_water_velocity": 0.0}))
    o.seed_elements(lon=4.0, lat=60.0, number=1, time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=10), time_step=3600)
    status = o.result["status"].values[0]
    retired_code = o.status_categories.index("retired")
    assert (status[-1] == retired_code)
    lon = o.result["lon"].values[0]
    assert np.isnan(lon[6:]).all()  # one frame recorded at deactivation


def test_requires_seed_before_run():
    o = OceanDrift(loglevel=40)
    with pytest.raises(WrongMode):
        o.run(steps=1)


def test_seed_cone():
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.seed_cone(lon=[4.0, 5.0], lat=[60.0, 60.5], number=100,
                time=datetime(2020, 1, 1))
    assert o.num_elements_scheduled() == 100


def test_horizontal_diffusion_spreads():
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:vertical_advection", False)
    o.set_config("drift:horizontal_diffusivity", 10.0)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 0.0,
                                 "y_sea_water_velocity": 0.0}))
    o.seed_elements(lon=4.0, lat=60.0, number=500, time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=6), time_step=600)
    lon = o.result["lon"].values
    lat = o.result["lat"].values
    # std of displacement should be ~ sqrt(2 D t) = sqrt(2*10*21600) = 657 m
    import numpy as np
    dx = (lon[:, -1] - lon[:, 0]) * 111320 * np.cos(np.radians(60.0))
    dy = (lat[:, -1] - lat[:, 0]) * 111320
    expected = np.sqrt(2 * 10.0 * 6 * 3600)
    assert abs(dx.std() / expected - 1) < 0.15
    assert abs(dy.std() / expected - 1) < 0.15
    assert abs(dx.mean()) < expected / 3


def test_back_and_forth_reversibility():
    """Forward then backward integration in a steady field returns the
    elements near their origin (reference example_backandforth.py);
    deterministic RK4, no diffusion."""
    import numpy as np
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.analytic import ConstantReader

    t0 = datetime(2020, 1, 1)
    common = {"x_sea_water_velocity": 0.4, "y_sea_water_velocity": -0.2,
              "land_binary_mask": 0.0}

    o = OceanDrift(loglevel=40)
    o.add_reader(ConstantReader(common))
    o.set_config("drift:advection_scheme", "runge-kutta4")
    o.set_config("drift:horizontal_diffusivity", 0.0)
    o.seed_elements(lon=4.0, lat=60.0, number=5, time=t0)
    o.run(duration=timedelta(hours=12), time_step=900)
    lon_end = np.asarray(o.result["lon"])[:, -1]
    lat_end = np.asarray(o.result["lat"])[:, -1]

    b = OceanDrift(loglevel=40)
    b.add_reader(ConstantReader(common))
    b.set_config("drift:advection_scheme", "runge-kutta4")
    b.set_config("drift:horizontal_diffusivity", 0.0)
    b.seed_elements(lon=lon_end, lat=lat_end, number=5,
                    time=t0 + timedelta(hours=12))
    b.run(duration=timedelta(hours=12), time_step=-900)
    lon_back = np.asarray(b.result["lon"])[:, -1]
    lat_back = np.asarray(b.result["lat"])[:, -1]
    # back within tens of metres of the origin (f32 position
    # precision is ~1e-5 relative, i.e. ~60 m in latitude degrees)
    assert np.abs(lon_back - 4.0).max() < 5e-4
    assert np.abs(lat_back - 60.0).max() < 5e-4
