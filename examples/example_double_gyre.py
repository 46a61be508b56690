"""Advection in the analytic time-dependent double gyre — the classic
LCS benchmark field (reference parity: examples/example_double_gyre.py,
reader at reference readers/reader_double_gyre.py:55-79)."""

from datetime import timedelta

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields import DoubleGyre

o = OceanDrift(loglevel=20)
o.set_config("environment:fallback:land_binary_mask", 0)
o.set_config("drift:advection_scheme", "runge-kutta4")

double_gyre = DoubleGyre(epsilon=0.25, omega=0.628, A=0.25)
o.add_reader(double_gyre)

x = [0.9]
y = [0.5]
lon, lat = double_gyre.xy2lonlat(x, y)
o.seed_elements(lon, lat, radius=0.1, number=5000,
                time=double_gyre.initial_time)

o.run(duration=timedelta(seconds=10), time_step=0.1,
      outfile="/tmp/double_gyre.nc")
print(o)
try:
    o.animation(buffer=0, filename="/tmp/double_gyre.mp4")
except Exception as e:
    print(f"(animation skipped: {e})")
