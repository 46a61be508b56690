"""Vertical (Visser) random-walk mixing with an environment-profile
diffusivity: neutral, rising and sinking particles reach the expected
steady-state vertical distributions (reference parity:
examples/example_vertical_mixing.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.analytic import ConstantReader

N = 10_000
seed_depth = -10.0
hours = 2
timestep_seconds = 60

for w, label in ((0.0, "neutral"), (0.005, "rising"), (-0.005, "sinking")):
    o = OceanDrift(loglevel=30)
    o.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.0, "y_sea_water_velocity": 0.0,
        "land_binary_mask": 0.0, "sea_floor_depth_below_sea_level": 100.0,
        "ocean_vertical_diffusivity": 0.01}))
    o.set_config("drift:vertical_mixing", True)
    o.set_config("vertical_mixing:diffusivitymodel", "environment")
    o.set_config("vertical_mixing:timestep", timestep_seconds)
    o.seed_elements(lon=4, lat=60, z=seed_depth, number=N,
                    terminal_velocity=w, time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=hours), time_step=600)
    z = np.asarray(o.result["z"])[:, -1]
    print(f"{label:8s} w={w:+.3f}: mean z = {np.nanmean(z):7.2f} m, "
          f"min z = {np.nanmin(z):7.2f} m")
