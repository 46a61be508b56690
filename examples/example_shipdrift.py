"""Drifting ship under wind and waves: wind force + tabulated
wave-spectrum force (reference parity: examples/example_shipdrift.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import ShipDrift
from opendrift_tpu.fields.analytic import ConstantReader

o = ShipDrift(loglevel=30)
o.add_reader(ConstantReader({
    "x_wind": 12.0, "y_wind": 4.0,
    "x_sea_water_velocity": 0.1, "y_sea_water_velocity": 0.0,
    "sea_surface_wave_significant_height": 3.0,
    "sea_surface_wave_mean_period_from_variance_spectral_density_"
    "second_frequency_moment": 8.0,
    "land_binary_mask": 0.0}))
o.seed_elements(lon=2.0, lat=59.5, radius=500, number=300,
                time=datetime(2021, 3, 1),
                length=80.0, height=9.0, draft=4.0, beam=12.0)
o.run(duration=timedelta(hours=12), time_step=600)
lon = np.asarray(o.result["lon"])
lat = np.asarray(o.result["lat"])
dx = (lon[:, -1] - lon[:, 0]).mean() * 111.32 * np.cos(np.radians(59.5))
dy = (lat[:, -1] - lat[:, 0]).mean() * 111.32
print(f"80 m ship drifted {dx:.1f} km east, {dy:+.1f} km north in 12 h")
