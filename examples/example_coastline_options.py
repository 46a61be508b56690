"""Coastline interaction options: 'stranding' (with crossing bisection
to the coast), 'previous' (bounce back) and 'none' (reference parity:
examples/example_coastline_options.py; reference stranding logic at
basemodel/__init__.py:670-746)."""

from datetime import timedelta

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.factory import reader_from_url

NORDIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
          "Nordic_subset.nc")

for action in ("stranding", "previous", "none"):
    o = OceanDrift(loglevel=30)
    reader = reader_from_url(NORDIC)
    o.add_reader(reader)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("general:coastline_action", action)
    o.set_config("drift:horizontal_diffusivity", 20.0)
    o.seed_elements(lon=14.56, lat=67.29, radius=8000, number=2000,
                    time=reader.times[0])
    o.run(duration=timedelta(hours=36), time_step=900)
    status = np.asarray(o.result["status"])[:, -1]
    stranded_code = o.status_categories.index("stranded")
    n_stranded = int((status == stranded_code).sum())
    print(f"coastline_action={action:10s}: {n_stranded} stranded")
