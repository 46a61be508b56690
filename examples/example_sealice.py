"""Salmon lice: degree-day maturation and light-driven vertical
behaviour (reference parity: examples/example_sealice.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import SeaLice
from opendrift_tpu.fields.analytic import ConstantReader

o = SeaLice(loglevel=30)
o.add_reader(ConstantReader({
    "x_sea_water_velocity": 0.05, "y_sea_water_velocity": 0.02,
    "sea_water_temperature": 10.0, "sea_water_salinity": 34.0,
    "sea_floor_depth_below_sea_level": 80.0,
    "surface_net_downward_radiative_flux": 150.0,
    "land_binary_mask": 0.0}))
o.seed_elements(lon=5.7, lat=61.1, z=-2.0, radius=50, number=800,
                time=datetime(2021, 5, 1))
o.run(duration=timedelta(days=3), time_step=1800)
z = np.asarray(o.result["z"])
print(f"lice mean depth {z[:, -1].mean():.1f} m after 3 days "
      f"(daylight drives upward swimming)")
