"""Model zoo behaviour tests (mirrors reference tests/models/test_models.py,
test_leeway.py and per-model suites), on analytic/constant forcing."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.models import (PelagicEggDrift, PlastDrift,
                                  SedimentDrift, Leeway, ShipDrift,
                                  OceanDrift)
from opendrift_tpu.fields import ConstantReader

T0 = datetime(2020, 3, 1)


def _constant_env(**extra):
    base = {"x_sea_water_velocity": 0.0, "y_sea_water_velocity": 0.0,
            "x_wind": 0.0, "y_wind": 0.0}
    base.update(extra)
    return ConstantReader(base)


def test_pelagicegg_buoyancy_profile():
    """Eggs with low neutral-buoyancy salinity rise towards the surface;
    vertical mixing distributes them in the upper mixed layer."""
    o = PelagicEggDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_constant_env(sea_water_temperature=8.0,
                               sea_water_salinity=34.0,
                               ocean_vertical_diffusivity=0.01))
    o.seed_elements(4.0, 62.0, z=-40.0, number=300, time=T0)
    o.run(duration=timedelta(hours=12), time_step=1800)
    z = o.result["z"].values[:, -1]
    # eggs (neutral at S=31.25 < ambient 34) are buoyant -> rise
    assert np.nanmean(z) > -20.0
    assert np.nanmin(z) >= -90.0
    assert (z <= 0).all()


def test_pelagicegg_terminal_velocity_sign():
    from opendrift_tpu.models.pelagicegg import egg_terminal_velocity
    import jax.numpy as jnp
    # ambient salinity above neutral -> positive buoyancy (rising)
    w_rise = egg_terminal_velocity(jnp.asarray([8.0]), jnp.asarray([35.0]),
                                   jnp.asarray([0.0014]),
                                   jnp.asarray([31.25]))
    # ambient salinity below neutral -> sinking
    w_sink = egg_terminal_velocity(jnp.asarray([8.0]), jnp.asarray([25.0]),
                                   jnp.asarray([0.0014]),
                                   jnp.asarray([31.25]))
    assert float(w_rise[0]) > 0
    assert float(w_sink[0]) < 0


def test_plastdrift_analytical_depth():
    """Analytical mixing model: depths exponentially distributed."""
    o = PlastDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_constant_env(x_wind=8.0,
                               ocean_vertical_diffusivity=0.02))
    o.seed_elements(4.0, 62.0, number=500, time=T0)
    o.run(duration=timedelta(hours=3), time_step=1800)
    z = o.result["z"].values[:, -1]
    assert (z <= 0).all()
    # mean depth ~ K/w = 0.02/0.01 = 2 m
    assert 0.5 < -np.nanmean(z) < 8.0


def test_sedimentdrift_settles():
    """Sinking sediment reaches the 50 m seafloor and freezes there."""
    o = SedimentDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_constant_env(sea_floor_depth_below_sea_level=50.0,
                               ocean_vertical_diffusivity=0.001))
    o.seed_elements(4.0, 62.0, z=-10.0, number=100, time=T0,
                    terminal_velocity=-0.01)
    o.run(duration=timedelta(hours=6), time_step=1800)
    z = o.result["z"].values[:, -1]
    moving = o.result["moving"].values[:, -1]
    assert np.nanmin(z) >= -51.0
    # most particles settled at the bottom and stopped moving
    assert (moving == 0).mean() > 0.5
    assert np.nanmean(z[moving == 0]) < -45.0


def test_leeway_object_drift():
    """Leeway objects drift downwind at a few % of wind speed, with
    left/right spreading."""
    o = Leeway(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_constant_env(x_wind=10.0))
    o.seed_elements(4.0, 62.0, number=100, time=T0)  # PIW-1 default
    o.run(duration=timedelta(hours=12), time_step=600,
          time_step_output=3600)
    lon = o.result["lon"].values
    lat = o.result["lat"].values
    dx_m = (lon[:, -1] - lon[:, 0]) * 111320 * np.cos(np.radians(62))
    dy_m = (lat[:, -1] - lat[:, 0]) * 111320
    hours = 12
    # PIW-1: downwind slope 0.96% of 10 m/s = ~0.1 m/s eastward
    mean_u = dx_m.mean() / (hours * 3600)
    assert 0.03 < mean_u < 0.3
    # crosswind spreading: left/right populations separate
    assert dy_m.std() > 1.0
    # and there are both left- and right-drifting objects
    assert (dy_m > 0).any() and (dy_m < 0).any()


def test_leeway_list_categories(capsys):
    o = Leeway(loglevel=40)
    assert len(o.leewayprop) == 85
    o.list_object_categories("PIW")
    out = capsys.readouterr().out
    assert "Person-in-water" in out


def test_leeway_jibing_flips_orientation():
    o = Leeway(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_constant_env(x_wind=10.0))
    o.seed_elements(4.0, 62.0, number=200, time=T0, jibe_probability=0.5)
    o.run(duration=timedelta(hours=6), time_step=600)
    ori0 = o.result["orientation"].values[:, 0]
    ori1 = o.result["orientation"].values[:, -1]
    # with p=0.5/h over 6h, many elements must have flipped
    assert (ori0 != ori1).mean() > 0.2


def test_leeway_capsizing():
    o = Leeway(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("processes:capsizing", True)
    o.set_config("capsizing:wind_threshold", 15.0)
    o.add_reader(_constant_env(x_wind=25.0))
    o.seed_elements(4.0, 62.0, number=100, time=T0)
    o.run(duration=timedelta(hours=6), time_step=600)
    capsized = o.result["capsized"].values[:, -1]
    assert capsized.mean() > 0.5  # far above threshold -> most capsize


def test_leeway_export_ascii(tmp_path):
    o = Leeway(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_constant_env(x_wind=5.0))
    o.seed_elements(4.0, 62.0, number=5, time=T0)
    o.run(duration=timedelta(hours=2), time_step=600,
          time_step_output=3600)
    path = tmp_path / "leeway.txt"
    o.export_ascii(str(path))
    text = path.read_text()
    assert "numberOfParticles: 5" in text


def test_shipdrift_moves_downwind():
    o = ShipDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:horizontal_diffusivity", 0.0)
    o.set_config("environment:fallback:horizontal_diffusivity", 0.0)
    o.add_reader(_constant_env(x_wind=15.0,
                               sea_surface_wave_significant_height=3.0))
    o.seed_elements(4.0, 62.0, number=10, time=T0, length=100.0,
                    height=10.0, draft=4.0, beam=14.0)
    o.run(duration=timedelta(hours=6), time_step=1800)
    lon = o.result["lon"].values
    dx_m = (lon[:, -1] - lon[:, 0]) * 111320 * np.cos(np.radians(62))
    speed = dx_m / (6 * 3600)
    # ships drift downwind at substantial fraction of a m/s in 15 m/s wind
    assert (speed > 0.05).all()
    assert (speed < 2.0).all()


def test_shipdrift_drag_coefficients():
    o = ShipDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_constant_env(x_wind=10.0))
    o.seed_elements(4.0, 62.0, number=2, time=T0, length=80.0,
                    height=8.0, draft=4.0, beam=10.0)
    s = o._seedings[0]
    assert np.all(s["wind_drag_coeff"] > 0.5)
    assert np.all(s["water_drag_coeff"] > 1.0)
