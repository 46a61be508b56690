"""Microplastic: analytic depth equilibrium z ~ -Exp(K/w) — slower-rising
particles ride deeper in the mixed layer (reference parity:
examples/example_plastdrift.py; the reference's analytic scheme uses the
ambient diffusivity the same way, plastdrift.py:95-107)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import PlastDrift
from opendrift_tpu.fields.analytic import ConstantReader

for w_rise in (0.05, 0.005):
    o = PlastDrift(loglevel=30)
    o.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.1, "y_sea_water_velocity": 0.0,
        "x_wind": 8.0, "y_wind": 0.0,
        "land_binary_mask": 0.0}))
    o.seed_elements(lon=4.0, lat=60.0, radius=100, number=2000,
                    time=datetime(2021, 3, 1), terminal_velocity=w_rise)
    o.run(duration=timedelta(hours=12), time_step=1800)
    z = np.asarray(o.result["z"])
    print(f"rise velocity {w_rise:5.3f} m/s: mean depth "
          f"{z[:, -1].mean():6.2f} m")
