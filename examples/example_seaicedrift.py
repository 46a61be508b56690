"""Sea-ice drift: elements follow the ice velocity where ice
concentration exceeds the threshold, open-water dynamics elsewhere
(reference parity: examples/example_seaice.py; Nordam rule at reference
physics_methods.py:693-710)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import SeaIceDrift
from opendrift_tpu.fields.analytic import ConstantReader

o = SeaIceDrift(loglevel=20)
o.add_reader(ConstantReader({
    "sea_ice_x_velocity": 0.2, "sea_ice_y_velocity": 0.0,
    "sea_ice_area_fraction": 0.8, "land_binary_mask": 0.0}))
o.seed_elements(lon=20.0, lat=75.0, radius=1000, number=500,
                time=datetime(2020, 2, 1))
o.run(duration=timedelta(hours=48), time_step=3600)
lon = np.asarray(o.result["lon"])
print(f"mean eastward displacement: "
      f"{(np.nanmean(lon[:, -1]) - np.nanmean(lon[:, 0])):.3f} deg")
