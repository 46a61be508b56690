"""Iceberg drift: added-mass force balance with wind, current and wave
radiation force, plus melting (reference parity:
examples/example_openberg.py / example_openberg_stat.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import OpenBerg
from opendrift_tpu.fields.analytic import ConstantReader

o = OpenBerg(loglevel=30)
o.add_reader(ConstantReader({
    "x_sea_water_velocity": 0.2, "y_sea_water_velocity": 0.05,
    "x_wind": 15.0, "y_wind": 0.0,
    "sea_water_temperature": 4.0, "sea_water_salinity": 34.0,
    "land_binary_mask": 0.0}))
o.seed_elements(lon=-50.0, lat=60.0, radius=1000, number=200,
                time=datetime(2021, 3, 1),
                sail=12.0, draft=60.0, length=120.0, width=90.0)
o.run(duration=timedelta(hours=24), time_step=1800)
lon = np.asarray(o.result["lon"])
lat = np.asarray(o.result["lat"])
dx = (lon[:, -1] - lon[:, 0]).mean() * 111.32 * np.cos(np.radians(60.0))
dy = (lat[:, -1] - lat[:, 0]).mean() * 111.32
print(f"icebergs drifted {dx:.1f} km east, {dy:+.1f} km north in 24 h")
