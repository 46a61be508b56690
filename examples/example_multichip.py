"""Multi-device scaling: run the same simulation data-parallel over a
device mesh (uses 8 virtual CPU devices when no TPU pod is attached;
results are bit-identical to single-device)."""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# set OPENDRIFT_TPU=1 to run on an attached TPU pod instead of the
# virtual CPU mesh (querying the backend first would initialize it,
# so gate on the environment rather than on jax.default_backend())
if os.environ.get("OPENDRIFT_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

from datetime import datetime, timedelta  # noqa: E402
import numpy as np  # noqa: E402
from opendrift_tpu.models import OceanDrift  # noqa: E402
from opendrift_tpu.fields.analytic import DoubleGyre  # noqa: E402

print(f"devices: {jax.device_count()} x {jax.devices()[0].platform}")


def run(sharded):
    o = OceanDrift()
    o.add_reader(DoubleGyre())
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    if sharded:
        o.set_config("parallel:particle_sharding", True)
    o.seed_elements(lon=np.linspace(0.4, 1.6, 4096),
                    lat=np.full(4096, 0.5),
                    time=datetime(2020, 1, 1))
    o.run(duration=timedelta(seconds=100), time_step=1)
    return np.asarray(o.result["lon"])[:, -1]


single = run(sharded=False)
multi = run(sharded=True)
print("bit-identical across the mesh:",
      bool(np.array_equal(single, multi)))
