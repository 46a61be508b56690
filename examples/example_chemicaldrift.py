"""Organic-chemical fate and transport: dissolved/particulate
partitioning, degradation and volatilisation in a coastal current
(reference parity: examples/example_chemicaldrift.py)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models.chemicaldrift import ChemicalDrift
from opendrift_tpu.fields.analytic import ConstantReader

o = ChemicalDrift(loglevel=20)
o.add_reader(ConstantReader({
    "x_sea_water_velocity": 0.1, "y_sea_water_velocity": 0.05,
    "land_binary_mask": 0.0, "sea_water_temperature": 12.0,
    "sea_water_salinity": 34.0, "sea_floor_depth_below_sea_level": 60.0,
    "spm": 1.0}))
o.init_chemical_compound("Phenanthrene")
o.set_config("chemical:transformations:degradation", True)
o.set_config("chemical:transformations:volatilization", True)
o.seed_elements(lon=4.5, lat=60.0, z=-1.0, radius=500, number=2000,
                time=datetime(2020, 6, 1))
o.run(duration=timedelta(hours=48), time_step=1800)

specie = np.asarray(o.result["specie"])[:, -1]
mass_deg = np.nansum(np.asarray(o.result["mass_degraded"])[:, -1])
mass_vol = np.nansum(np.asarray(o.result["mass_volatilized"])[:, -1])
print("final speciation counts:",
      {int(s): int((specie == s).sum()) for s in np.unique(
          specie[np.isfinite(specie)])})
print(f"degraded: {mass_deg:.1f} ug, volatilized: {mass_vol:.1f} ug")
