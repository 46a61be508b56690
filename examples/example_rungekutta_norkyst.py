"""Euler vs RK4 advection in real coastal ROMS forcing — rung 3 of the
BASELINE config ladder (reference parity:
examples/example_rungekutta_norkyst.py; the NorKyst file of the
reference example is not bundled, the Nordic-4km subset stands in)."""

from datetime import timedelta

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.roms import ROMSReader

NORDIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
          "Nordic_subset.nc")

final = {}
for scheme in ("euler", "runge-kutta", "runge-kutta4"):
    o = OceanDrift(loglevel=30)
    reader = ROMSReader(NORDIC)
    o.add_reader(reader)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("drift:advection_scheme", scheme)
    o.set_config("drift:vertical_advection", False)
    o.seed_elements(lon=13.5, lat=67.2, radius=2000, number=500,
                    time=reader.times[0])
    o.run(duration=timedelta(hours=24), time_step=1800,
          outfile=f"/tmp/norkyst_{scheme}.nc")
    final[scheme] = (np.asarray(o.result["lon"])[:, -1],
                     np.asarray(o.result["lat"])[:, -1])

lon_e, lat_e = final["euler"]
lon_4, lat_4 = final["runge-kutta4"]
both = np.isfinite(lon_e) & np.isfinite(lon_4)
d_km = np.hypot((lon_e - lon_4)[both] * 44.0,
                (lat_e - lat_4)[both] * 111.0)
print(f"Euler vs RK4 after 24 h: median separation {np.median(d_km):.2f} "
      f"km over {both.sum()} elements")
