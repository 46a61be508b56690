"""Tour of the seeding API: point/radius scatter, cone, polygon, WKT,
time series, repeated segments and letters (reference parity:
examples/example_seed_demonstration.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.analytic import ConstantReader

t0 = datetime(2020, 1, 1)
o = OceanDrift(loglevel=30)
o.add_reader(ConstantReader({"x_sea_water_velocity": 0.2,
                             "y_sea_water_velocity": 0.0,
                             "land_binary_mask": 0.0}))

# point with gaussian radius
o.seed_elements(lon=3.6, lat=60.0, radius=2000, number=300, time=t0)
# released over a time window
o.seed_elements(lon=3.8, lat=60.1, number=300, time=[t0, t0 +
                timedelta(hours=12)])
# cone from a start to an end point with growing radius
o.seed_cone(lon=[4.0, 4.3], lat=[59.8, 60.05], radius=[100, 4000],
            number=300, time=[t0, t0 + timedelta(hours=6)])
# uniformly inside a polygon
o.seed_within_polygon(lons=[4.4, 4.6, 4.6, 4.4],
                      lats=[59.9, 59.9, 60.05, 60.05], number=300,
                      time=t0)
# from WKT
o.seed_from_wkt("POLYGON((4.8 59.95, 4.95 59.95, 4.95 60.05, "
                "4.8 60.05, 4.8 59.95))", number=300, time=t0)
# repeated segment (a drifting line re-released every 3 hours)
o.seed_repeated_segment(lons=[5.1, 5.25], lats=[59.9, 60.1],
                        start_time=t0,
                        end_time=t0 + timedelta(hours=9),
                        time_interval=timedelta(hours=3),
                        number_per_segment=100)
# letters
o.seed_letters("TPU", lon=5.5, lat=59.95, number=600, time=t0,
               scale=1.0)

o.run(duration=timedelta(hours=18), time_step=900,
      outfile="/tmp/seed_demo.nc")
lon = np.asarray(o.result["lon"])
released_later = np.isnan(lon[:, 0]).sum()
print(f"{lon.shape[0]} elements from 7 seeding modes "
      f"({released_later} scheduled for delayed release); "
      f"all released by end: {np.isfinite(lon[:, -1]).mean():.2f}")
try:
    o.plot(filename="/tmp/seed_demo.png", fast=True)
    print("wrote /tmp/seed_demo.png")
except Exception as e:
    print(f"(plot skipped: {e})")
