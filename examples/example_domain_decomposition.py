"""Forcing-grid domain decomposition: the full model step runs inside a
shard_map over all visible devices, with on-device halo exchange and
neighbour-only particle migration (docs/parallel.md).

Run on a multi-chip host, or validate on a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/example_domain_decomposition.py
"""

from datetime import datetime, timedelta
import os

if "xla_force_host_platform_device_count" in os.environ.get(
        "XLA_FLAGS", ""):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields import ArrayReader

t0 = datetime(2021, 3, 1)
ny, nx = 96, 40
lat = np.linspace(59.0, 60.2, ny)
uu = np.full((2, ny, nx), 0.25, np.float32)
vv = np.broadcast_to(np.linspace(0.2, 0.6, ny, dtype=np.float32)
                     [None, :, None], (2, ny, nx)).copy()

o = OceanDrift(loglevel=30)
o.set_config("environment:fallback:land_binary_mask", 0)
o.set_config("drift:advection_scheme", "runge-kutta4")
o.set_config("parallel:domain_decomposition", True)
# o.set_config("parallel:tile_grid", "4x2")   # optional 2D Y x X tiling
o.add_reader(ArrayReader(
    {"x_sea_water_velocity": uu, "y_sea_water_velocity": vv},
    x=np.linspace(2.0, 6.0, nx), y=lat,
    times=[t0, t0 + timedelta(hours=48)]))
o.seed_elements(4.0, 59.2, number=2000, radius=10000, time=t0)
o.run(steps=48, time_step=900)

latr = np.asarray(o.result["lat"])
import jax
print(f"ran {latr.shape[0]} elements over {len(jax.devices())} device "
      f"tiles; all crossed {latr[:, -1].mean() - latr[:, 0].mean():.2f} "
      f"deg of tiled grid northward")
