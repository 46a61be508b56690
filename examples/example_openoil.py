"""Oil spill with weathering: evaporation, emulsification, dispersion
and the mass-balance budget (reference parity: examples/example_oil*)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import OpenOil
from opendrift_tpu.fields.analytic import ConstantReader

o = OpenOil()
o.add_reader(ConstantReader({
    "x_sea_water_velocity": 0.2, "y_sea_water_velocity": 0.05,
    "x_wind": 9.0, "y_wind": 3.0,
    "sea_water_temperature": 12.0,
    "sea_surface_wave_significant_height": 2.0}))
o.set_config("general:use_auto_landmask", False)
o.set_config("environment:fallback:land_binary_mask", 0)

o.set_config("seed:m3_per_hour", 50)
o.seed_elements(lon=4.5, lat=60.0, radius=500, number=2000,
                time=datetime(2020, 6, 1), oil_type="STATFJORD")
o.run(duration=timedelta(hours=24), time_step=900)

# mass budget
res = o.result
total = np.asarray(res["mass_oil"])[:, 0].sum()
final = {k: float(np.asarray(res[k])[:, -1].sum()) for k in
         ("mass_oil", "mass_evaporated", "mass_dispersed",
          "mass_biodegraded")}
print("Initial oil mass:   %10.1f kg" % total)
for k, v in final.items():
    print("%-20s %10.1f kg  (%.1f%%)" % (k, v, 100 * v / total))
print("Budget closure: %.2f%%" %
      (100 * abs(sum(final.values()) - total) / total))
print("Water fraction (emulsion): %.2f"
      % float(np.asarray(res["water_fraction"])[:, -1].mean()))
