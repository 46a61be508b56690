"""Writing a custom model: a 'jellyfish' that swims toward the surface
by day and sinks at night (see opendrift_tpu/models/model_template.py
for the full template and the traced-update rules)."""

from datetime import datetime, timedelta

import numpy as np
import jax.numpy as jnp

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.models.oceandrift import Lagrangian3DArray
from opendrift_tpu.fields.analytic import ConstantReader


class Jellyfish(Lagrangian3DArray):
    variables = Lagrangian3DArray.add_variables([
        ("swim_speed", {"dtype": np.float32, "units": "m/s",
                        "default": 0.01, "seed": True}),
    ])


class JellyDrift(OceanDrift):
    ElementType = Jellyfish

    def update(self, ctx):
        ctx.advect_ocean_current()
        # diel vertical migration: up 06-18 UTC, down otherwise.
        # t_rel is seconds since simulation start (traced scalar).
        hour = jnp.mod(ctx.t_rel / 3600.0 + self.start_hour, 24.0)
        day = (hour >= 6.0) & (hour < 18.0)
        w = jnp.where(day, ctx.state.data["swim_speed"],
                      -ctx.state.data["swim_speed"])
        z = ctx.state.data["z"] + w * ctx.dt
        ctx.set_var("z", jnp.clip(z, -100.0, 0.0))


o = JellyDrift()
o.start_hour = 0.0  # simulation starts at midnight UTC
o.add_reader(ConstantReader({"x_sea_water_velocity": 0.05,
                             "y_sea_water_velocity": 0.0}))
o.set_config("general:use_auto_landmask", False)
o.set_config("environment:fallback:land_binary_mask", 0)
o.seed_elements(lon=4.0, lat=60.0, number=10, z=-50.0,
                time=datetime(2020, 7, 1, 0, 0), swim_speed=0.005)
o.run(duration=timedelta(hours=24), time_step=1800)
z = np.asarray(o.result["z"])
print("depth at 00h %.1f m, 12h (noon) %.1f m, 24h %.1f m"
      % (z[:, 0].mean(), z[:, 24].mean(), z[:, -1].mean()))
