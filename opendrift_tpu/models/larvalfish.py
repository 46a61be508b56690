"""LarvalFish: eggs hatching into growing, vertically migrating larvae
(reference: opendrift/models/larvalfish.py:26-300)."""

import numpy as np
import jax.numpy as jnp

from ..config import CONFIG_LEVEL_ADVANCED
from .oceandrift import OceanDrift, Lagrangian3DArray
from .pelagicegg import egg_terminal_velocity


class LarvalFishElement(Lagrangian3DArray):
    """(reference larvalfish.py:26-53)."""

    variables = Lagrangian3DArray.add_variables([
        ("diameter", {"dtype": np.float32, "units": "m", "default": 0.0014}),
        ("neutral_buoyancy_salinity", {"dtype": np.float32, "units": "PSU",
                                       "default": 31.25}),
        ("stage_fraction", {"dtype": np.float32, "units": "1",
                            "default": 0.0}),
        ("hatched", {"dtype": np.float32, "units": "1", "default": 0.0}),
        ("length", {"dtype": np.float32, "units": "mm", "default": 0.0}),
        ("weight", {"dtype": np.float32, "units": "mg", "default": 0.08}),
        ("survival", {"dtype": np.float32, "units": "1", "default": 1.0}),
    ])


class LarvalFish(OceanDrift):
    """Fish egg and larvae IBM (reference larvalfish.py:55)."""

    ElementType = LarvalFishElement

    required_variables = {
        "x_sea_water_velocity": {"fallback": 0},
        "y_sea_water_velocity": {"fallback": 0},
        "sea_surface_height": {"fallback": 0},
        "sea_surface_wave_significant_height": {"fallback": 0},
        "x_wind": {"fallback": 0},
        "y_wind": {"fallback": 0},
        "land_binary_mask": {"fallback": None},
        "sea_floor_depth_below_sea_level": {"fallback": 100},
        "ocean_vertical_diffusivity": {"fallback": 0.01, "profiles": True},
        "ocean_mixed_layer_thickness": {"fallback": 50},
        "sea_water_temperature": {"fallback": 10, "profiles": True},
        "sea_water_salinity": {"fallback": 34, "profiles": True},
        "sea_surface_wave_stokes_drift_x_velocity": {"fallback": 0},
        "sea_surface_wave_stokes_drift_y_velocity": {"fallback": 0},
    }

    def add_config(self):
        super().add_config()
        self._add_config({
            "IBM:fraction_of_timestep_swimming": {
                "type": "float", "default": 0.15, "min": 0.0, "max": 1.0,
                "units": "fraction", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Fraction of timestep swimming"},
        })

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._set_config_default("drift:vertical_mixing", True)
        self._set_config_default("drift:vertical_mixing_at_surface", True)
        self._set_config_default("drift:vertical_advection_at_surface", True)

    # eggs share the pelagic-egg buoyancy (reference larvalfish.py:107-187)
    def update_terminal_velocity(self, ctx, **kwargs):
        d = ctx.state.data
        w = egg_terminal_velocity(
            ctx.environment["sea_water_temperature"],
            ctx.environment["sea_water_salinity"],
            d["diameter"], d["neutral_buoyancy_salinity"])
        # larvae swim; only unhatched eggs are passively buoyant
        ctx.set_var("terminal_velocity",
                    jnp.where(d["hatched"] == 0.0, w, 0.0))

    def terminal_velocity_inner(self, ctx, z, Tprof, Sprof,
                                mix=None):
        d = ctx.state.data
        if Tprof is not None and Sprof is not None:
            T0 = self.profile_interp(ctx, Tprof, z)
            S0 = self.profile_interp(ctx, Sprof, z)
        else:
            T0 = ctx.environment["sea_water_temperature"]
            S0 = ctx.environment["sea_water_salinity"]
        w = egg_terminal_velocity(T0, S0, d["diameter"],
                                  d["neutral_buoyancy_salinity"])
        return jnp.where(d["hatched"] == 0.0, w, 0.0)

    @staticmethod
    def fish_growth(weight, temperature, dt):
        """Folkvord (2005) daily growth rate -> mg per step
        (reference larvalfish.py:189-202)."""
        lw = jnp.log(jnp.maximum(weight, 1e-6))
        GR = (1.08 + 1.79 * temperature - 0.074 * temperature * lw
              - 0.0965 * temperature * lw ** 2
              + 0.0112 * temperature * lw ** 3)
        g = jnp.log(GR / 100.0 + 1.0) * dt / 86400.0
        return weight * (jnp.exp(g) - 1.0)

    def update_fish_larvae(self, ctx):
        """Egg development/hatching + larval growth
        (reference larvalfish.py:204-239)."""
        d = ctx.state.data
        dt = abs(ctx.params["dt"])
        T = ctx.environment["sea_water_temperature"]
        eggs = d["hatched"] == 0.0
        # Ellertsen et al. (1988) egg development time
        amb_duration = jnp.exp(3.65 - 0.145 * T)
        frac = (dt / 86400.0) / amb_duration
        stage = jnp.where(eggs, d["stage_fraction"] + frac,
                          d["stage_fraction"])
        hatched = jnp.where(eggs & (stage >= 1.0), 1.0, d["hatched"])
        ctx.set_var("stage_fraction", stage)
        ctx.set_var("hatched", hatched)

        larvae = hatched == 1.0
        growth = self.fish_growth(d["weight"], T, dt)
        weight = jnp.where(larvae, d["weight"] + growth, d["weight"])
        lw = jnp.log(jnp.maximum(weight, 1e-6))
        length = jnp.exp(2.296 + 0.277 * lw
                         - 0.005128 * jnp.log10(jnp.maximum(weight, 1e-6))
                         ** 2)
        ctx.set_var("weight", weight)
        ctx.set_var("length", jnp.where(larvae, length, d["length"]))

    def larvae_vertical_migration(self, ctx):
        """Diel vertical migration with Peck (2006) swim speeds
        (reference larvalfish.py:241-260)."""
        d = ctx.state.data
        larvae = d["hatched"] == 1.0
        L = jnp.maximum(d["length"], 1e-3)
        swim_speed = (0.261 * L ** (1.552 * L ** -0.08)
                      - 5.289 / L) / 1000.0
        f = self.get_config("IBM:fraction_of_timestep_swimming")
        dz_max = f * swim_speed * abs(ctx.params["dt"])
        # UTC hour from run epoch + elapsed time (solar phase approx)
        start_hour = self.start_time.hour + self.start_time.minute / 60.0
        hour = (start_hour + ctx.t_rel / 3600.0) % 24.0
        direction = jnp.where(hour < 12.0, -1.0, 1.0)
        new_z = jnp.minimum(0.0, d["z"] + direction * dz_max)
        ctx.set_var("z", jnp.where(larvae, new_z, d["z"]))

    def update(self, ctx):
        """(reference larvalfish.py:290-300)."""
        self.update_fish_larvae(ctx)
        ctx.advect_ocean_current()
        ctx.stokes_drift()
        self.update_terminal_velocity(ctx)
        self.vertical_mixing(ctx)
        self.larvae_vertical_migration(ctx)
