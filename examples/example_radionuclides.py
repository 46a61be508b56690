"""Radionuclide transport with multi-species speciation (dissolved /
particle-bound / sediment) via transfer-rate matrices (reference parity:
examples/example_radionuclides.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models.radionuclides import RadionuclideDrift
from opendrift_tpu.fields.analytic import ConstantReader

o = RadionuclideDrift(loglevel=20)
o.add_reader(ConstantReader({
    "x_sea_water_velocity": 0.05, "y_sea_water_velocity": 0.0,
    "land_binary_mask": 0.0, "sea_water_temperature": 10.0,
    "sea_water_salinity": 34.0, "sea_floor_depth_below_sea_level": 80.0,
    "spm": 1.0}))
o.set_config("radionuclide:isotope", "137Cs")
o.set_config("drift:vertical_mixing", True)
o.set_config("vertical_mixing:diffusivitymodel", "windspeed_Sundby1983")
o.seed_elements(lon=4.0, lat=60.0, z=-2.0, radius=1000, number=2000,
                time=datetime(2020, 1, 1))
o.run(duration=timedelta(hours=48), time_step=1800)
specie = np.asarray(o.result["specie"])[:, -1]
print("final speciation counts:",
      {int(s): int((specie == s).sum()) for s in np.unique(
          specie[np.isfinite(specie)])})
