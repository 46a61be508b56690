"""Drift in a constant current with horizontal diffusion — rung 2 of the
BASELINE config ladder (reference parity:
examples/example_constant_current.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.analytic import ConstantReader

o = OceanDrift(loglevel=20)
o.add_reader(ConstantReader({"x_sea_water_velocity": 0.3,
                             "y_sea_water_velocity": 0.1,
                             "land_binary_mask": 0.0}))
o.set_config("drift:horizontal_diffusivity", 10.0)
o.seed_elements(lon=4.0, lat=60.0, radius=1000, number=10_000,
                time=datetime(2020, 1, 1))
o.run(duration=timedelta(hours=24), time_step=900,
      outfile="/tmp/constant_current.nc")

lon = np.asarray(o.result["lon"])
lat = np.asarray(o.result["lat"])
# 0.3 m/s east for 24 h ~ 26 km ~ 0.47 deg lon at 60N
print(f"mean drift: dlon={np.nanmean(lon[:, -1] - lon[:, 0]):.3f} deg, "
      f"dlat={np.nanmean(lat[:, -1] - lat[:, 0]):.3f} deg; "
      f"diffusive spread std(lon)={np.nanstd(lon[:, -1]):.4f} deg")
