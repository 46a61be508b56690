"""Sinking sediment with resuspension above a critical shear velocity
(reference parity: examples/example_sediments.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import SedimentDrift
from opendrift_tpu.fields.analytic import ConstantReader

o = SedimentDrift(loglevel=30)
o.add_reader(ConstantReader({
    "x_sea_water_velocity": 0.2, "y_sea_water_velocity": 0.0,
    "sea_water_temperature": 10.0, "sea_water_salinity": 34.0,
    "sea_floor_depth_below_sea_level": 30.0,
    "land_binary_mask": 0.0}))
o.seed_elements(lon=4.0, lat=60.0, z=-5.0, radius=200, number=1000,
                time=datetime(2021, 3, 1), terminal_velocity=-0.001)
o.run(duration=timedelta(hours=36), time_step=1800)
status = np.asarray(o.result["moving"])[:, -1]
z = np.asarray(o.result["z"])
print(f"{int((status == 0).sum())} of {len(status)} grains settled on "
      f"the sea floor; mean final depth {z[:, -1].mean():.1f} m")
