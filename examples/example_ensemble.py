"""Ensemble forcing: EPS members are assigned to elements round-robin,
spreading the fleet over the forecast uncertainty (reference parity:
examples/example_ensemble.py; member assignment at reference
interpolation/structured.py:120-134)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.analytic import OscillatingReader, ConstantReader

o = OceanDrift(loglevel=30)
# an oscillating current plus per-member perturbations stands in for a
# real EPS ocean forecast (use NetCDFReader on a file with a
# 'realization' dimension for the real thing)
o.add_reader(ConstantReader({"land_binary_mask": 0.0}))
o.add_reader(OscillatingReader("x_sea_water_velocity", amplitude=0.5,
                               period_seconds=6 * 3600.0))
o.set_config("drift:horizontal_diffusivity", 10.0)
o.set_config("drift:current_uncertainty", 0.2)   # gaussian per-fetch noise
o.seed_elements(lon=4.5, lat=60.0, radius=500, number=5000,
                time=datetime(2020, 1, 1))
o.run(duration=timedelta(hours=24), time_step=900)
lon = np.asarray(o.result["lon"])[:, -1]
lat = np.asarray(o.result["lat"])[:, -1]
print(f"ensemble spread after 24 h: std(lon) = {np.nanstd(lon):.4f}, "
      f"std(lat) = {np.nanstd(lat):.4f}")
