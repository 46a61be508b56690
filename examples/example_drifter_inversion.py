"""Invert an observed drifter track into a current field, then advect
new particles through it (reference parity:
examples/example_current_from_drifter.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.analytic import CurrentFromDrifter

t0 = datetime(2021, 3, 1)
# synthetic observed track: steady 0.3 m/s ENE drift
hours = np.arange(0, 25, 3)
times = [t0 + timedelta(hours=float(h)) for h in hours]
lons = 4.0 + 0.018 * hours
lats = 60.0 + 0.004 * hours

r = CurrentFromDrifter(lons=lons, lats=lats, times=times)
o = OceanDrift(loglevel=30)
o.set_config("environment:fallback:land_binary_mask", 0)
o.add_reader(r)
o.seed_elements(lons[0], lats[0], number=100, radius=500, time=t0)
o.run(duration=timedelta(hours=21), time_step=1800)

lon = np.asarray(o.result["lon"])
lat = np.asarray(o.result["lat"])
print(f"re-advected cloud ends at ({lon[:, -1].mean():.3f}, "
      f"{lat[:, -1].mean():.3f}); drifter observed "
      f"({lons[-2]:.3f}, {lats[-2]:.3f})")
