"""Search-and-rescue drift: a person-in-water and a life raft under the
same wind, showing the divergence (reference parity:
examples/example_leeway.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import Leeway
from opendrift_tpu.fields.analytic import ConstantReader

for obj in ("PIW-1", "LIFE-RAFT-DB-10"):  # person vs deep-ballast raft
    o = Leeway()
    o.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.1, "y_sea_water_velocity": 0.0,
        "x_wind": 12.0, "y_wind": 0.0}))
    o.set_config("general:use_auto_landmask", False)
    o.set_config("environment:fallback:land_binary_mask", 0)
    keys = [p["key"] for p in o.leewayprop.values()]
    name = obj if obj in keys else keys[0]
    o.seed_elements(lon=2.0, lat=59.5, radius=100, number=500,
                    time=datetime(2021, 3, 1),
                    object_type=o.object_type_by_name(name))
    o.run(duration=timedelta(hours=12), time_step=600)
    lon = np.asarray(o.result["lon"])
    lat = np.asarray(o.result["lat"])
    dx = (lon[:, -1] - lon[:, 0]).mean() * 111.32 * np.cos(np.radians(59.5))
    dy = (lat[:, -1] - lat[:, 0]).mean() * 111.32
    print(f"{obj:18s}: drifted {dx:6.1f} km downwind, "
          f"{dy:+5.1f} km crosswind in 12 h")
