"""LarvalFishExtended behaviour tests (reference parity:
opendrift/models/larvalfish_extended.py:28-342): fixed-time hatching,
depth-band keeping, diel vertical migration, particle-type gating."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import LarvalFishExtended
from opendrift_tpu.fields import ConstantReader

# summer solstice noon at lon=0 -> daytime; +12h -> night
T_NOON = datetime(2021, 6, 21, 12, 0)


def _sim(**cfg):
    o = LarvalFishExtended(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:vertical_mixing", False)
    o.set_config("environment:fallback:ocean_vertical_diffusivity", 0.0)
    o.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.0, "y_sea_water_velocity": 0.0,
        "x_wind": 0.0, "y_wind": 0.0,
        "sea_floor_depth_below_sea_level": 200.0}))
    for k, v in cfg.items():
        o.set_config(k, v)
    return o


def test_fixed_time_hatching():
    """Eggs hatch exactly after egg:hatch_time_days
    (reference larvalfish_extended.py:291-315)."""
    o = _sim(**{"biology:vertical_behavior_mode": "none",
                "egg:hatch_time_days": 0.5})
    o.seed_elements(0.0, 60.0, z=-10.0, number=10, time=T_NOON)
    o.run(duration=timedelta(hours=24), time_step=3600,
          time_step_output=3600)
    hatched = o.result["hatched"].values
    stage = o.result["stage_fraction"].values
    assert (hatched[:, 0] == 0).all()
    # 0.5 days = 12 h: hatched at hour 12-13 (f32 accumulation of
    # 1/12 reaches 0.9999999 at step 12 — the reference's float32
    # stage_fraction rounds identically)
    assert (hatched[:, 11] == 0).all()
    assert (hatched[:, 13] == 1).all()
    np.testing.assert_allclose(stage[0, 6], 0.5, rtol=1e-6)


def test_depth_band_keeping_phytoplankton():
    """depth mode moves particles into [z_pref-dz, z_pref+dz] at
    w_active speed; phytoplankton active from the start
    (reference larvalfish_extended.py:206-289)."""
    o = _sim(**{"biology:particle_type": "phytoplankton",
                "biology:vertical_behavior_mode": "depth",
                "biology:z_pref": -10.0,
                "biology:w_active": 0.01})
    o.seed_elements(0.0, 60.0, z=-50.0, number=5, time=T_NOON)
    o.run(duration=timedelta(hours=3), time_step=600,
          time_step_output=600)
    z = o.result["z"].values
    # speed-limited ascent: 0.01 m/s * 600 s = 6 m per step
    np.testing.assert_allclose(z[:, 1], -44.0, atol=1e-4)
    # band half-width = clamp(1, 0.1*10, 15) = 1 -> settles at -11
    assert abs(z[:, -1] + 11.0).max() < 1e-3
    # settled: stays inside the band
    assert abs(z[:, -2] + 11.0).max() < 1e-3


def test_eggs_remain_passive_until_hatched():
    """larva type: only hatched larvae swim
    (reference larvalfish_extended.py:230-238)."""
    o = _sim(**{"biology:particle_type": "larva",
                "biology:vertical_behavior_mode": "depth",
                "biology:z_pref": -5.0,
                "biology:w_active": 0.05,
                "egg:hatch_time_days": 30.0})
    o.seed_elements(0.0, 60.0, z=-50.0, number=5, time=T_NOON)
    o.run(duration=timedelta(hours=6), time_step=3600)
    z = o.result["z"].values
    np.testing.assert_allclose(z[:, -1], -50.0, atol=1e-5)  # still eggs


def test_diel_vertical_migration():
    """dvm: descend to z_day band in daylight, ascend to z_night at
    night (reference larvalfish_extended.py:252-268).  Run starts at
    summer-solstice noon at lon 0, lat 45 — day until ~20:00 local."""
    o = _sim(**{"biology:particle_type": "phytoplankton",
                "biology:vertical_behavior_mode": "dvm",
                "biology:z_day": -30.0, "biology:z_night": -5.0,
                "biology:w_active": 0.02})
    o.seed_elements(0.0, 45.0, z=-15.0, number=5, time=T_NOON)
    o.run(duration=timedelta(hours=24), time_step=1800,
          time_step_output=1800)
    z = o.result["z"].values
    # daytime (first hours): descend toward -30 band (half-width 3)
    assert z[:, 6].max() < -25.0
    # night (hour ~14 after start = 02:00): ascended to -5 band
    i_night = 28
    assert z[:, i_night].min() > -7.5
    # next day (hour ~24 = noon again): back down
    assert z[:, -1].max() < -25.0
