"""Finite-time Lyapunov exponents of the analytic double gyre — the
classic LCS benchmark (reference parity: examples/example_double_gyre_LCS,
physics_methods.ftle)."""

from datetime import timedelta

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields import DoubleGyre

o = OceanDrift(loglevel=30)
dg = DoubleGyre(epsilon=0.25, omega=0.628, A=0.1)
o.add_reader(dg)
o.set_config("environment:fallback:land_binary_mask", 0)
o.set_config("drift:advection_scheme", "runge-kutta4")
o.set_config("drift:vertical_advection", False)

lcs = o.calculate_ftle(reader=dg, delta=0.02,
                       domain=[0.0, 2.0, 0.0, 1.0],
                       time=dg.initial_time, time_step=0.2,
                       duration=timedelta(seconds=10))

R = lcs["RLCS"][0]
print("FTLE field:", R.shape, "max repelling FTLE %.3f" %
      float(np.nanmax(R)))
try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.imshow(R, origin="lower", cmap="magma", extent=[0, 2, 0, 1])
    plt.colorbar(label="repelling FTLE")
    plt.savefig("/tmp/ftle.png", dpi=120)
    print("Wrote /tmp/ftle.png")
except Exception as e:
    print(f"(plot skipped: {e})")
