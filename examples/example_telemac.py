"""Drift in a Telemac-3D triangular-mesh tidal field (Ushant, Brittany)
— the unstructured-mesh reader regrids once at load or samples the mesh
natively (reference parity: examples/example_telemac.py)."""

from datetime import timedelta

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.unstructured import TelemacReader

SLF = "/root/reference/tests/test_data/Telemac_3D/r3d_tide_open_drift.slf"
LAMBERT_NORTH = (
    "+proj=lcc +lat_1=49.50000000000001 +lat_0=49.50000000000001 "
    "+lon_0=0 +k_0=0.999877341 +x_0=600000 +y_0=200000 "
    "+a=6378249.2 +b=6356515 +units=m +no_defs")

o = OceanDrift(loglevel=20)
reader = TelemacReader(SLF, proj4=LAMBERT_NORTH)
o.add_reader(reader)
o.set_config("general:use_auto_landmask", False)
o.set_config("environment:fallback:land_binary_mask", 0)

lonc = float(np.mean(reader._node_lon))
latc = float(np.mean(reader._node_lat))
o.seed_elements(lon=lonc, lat=latc, radius=2000, number=1000,
                time=reader.times[0])
o.run(duration=timedelta(minutes=75), time_step=300)
lon = np.asarray(o.result["lon"])
print(f"tidal displacement: "
      f"{np.nanstd(lon[:, -1] - lon[:, 0]) * 111e3 * 0.6:.0f} m spread")
