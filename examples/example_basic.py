"""Basic drift run: seed particles in a ROMS current field, run 24 h,
write a CF trajectory file, and plot (reference parity:
examples/example.py)."""

from datetime import timedelta

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields.factory import reader_from_url

NORDIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
          "Nordic_subset.nc")

o = OceanDrift()
reader = reader_from_url(NORDIC)       # auto-probes: ROMS native
o.add_reader(reader)
o.set_config("general:use_auto_landmask", False)  # use the ROMS mask
o.set_config("drift:horizontal_diffusivity", 10.0)  # m2/s

o.seed_elements(lon=13.3, lat=67.0, radius=2000, number=1000,
                time=reader.times[0])
o.run(duration=timedelta(hours=24), time_step=900,
      outfile="/tmp/basic_run.nc")

print(o)
try:
    o.plot(filename="/tmp/basic_run.png", fast=True)
    print("Wrote /tmp/basic_run.png")
except Exception as e:
    print(f"(plotting skipped: {e})")
