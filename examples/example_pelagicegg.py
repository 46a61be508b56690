"""Buoyant fish eggs: Sundby terminal velocity + vertical mixing keep
eggs in the upper water column (reference parity:
examples/example_codegg.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import PelagicEggDrift
from opendrift_tpu.fields.analytic import ConstantReader

o = PelagicEggDrift(loglevel=30)
o.add_reader(ConstantReader({
    "x_sea_water_velocity": 0.1, "y_sea_water_velocity": 0.0,
    "x_wind": 8.0, "y_wind": 0.0,
    "sea_water_temperature": 8.0, "sea_water_salinity": 34.0,
    "sea_floor_depth_below_sea_level": 150.0,
    "land_binary_mask": 0.0}))
o.set_config("vertical_mixing:timestep", 60.0)
o.seed_elements(lon=4.0, lat=60.0, z=-40.0, radius=500, number=1000,
                time=datetime(2021, 3, 1),
                diameter=0.0014, neutral_buoyancy_salinity=31.25)
o.run(duration=timedelta(hours=24), time_step=1800)
z = np.asarray(o.result["z"])
print(f"egg depth: start {z[:, 0].mean():.1f} m -> "
      f"final {z[:, -1].mean():.1f} m (rising, mixed near surface)")
