"""Fish eggs hatching into swimming larvae: growth, vertical behaviour
(reference parity: examples/example_larvalfish.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import LarvalFish
from opendrift_tpu.fields.analytic import ConstantReader

o = LarvalFish(loglevel=30)
o.add_reader(ConstantReader({
    "x_sea_water_velocity": 0.1, "y_sea_water_velocity": 0.05,
    "x_wind": 5.0, "y_wind": 0.0,
    "sea_water_temperature": 10.0, "sea_water_salinity": 34.0,
    "sea_floor_depth_below_sea_level": 120.0,
    "land_binary_mask": 0.0}))
o.seed_elements(lon=13.0, lat=68.0, z=-20.0, radius=2000, number=500,
                time=datetime(2021, 4, 1))
o.run(duration=timedelta(days=12), time_step=3600)
hatched = np.asarray(o.result["hatched"])[:, -1]
length = np.asarray(o.result["length"])[:, -1]
print(f"{int(hatched.sum())} of {len(hatched)} hatched; mean larval "
      f"length {length[hatched > 0].mean():.2f} mm after 12 days")
