"""ShipDrift: drifting ships under wind and wave forcing.

TPU-native re-implementation of the reference ShipDrift model
(reference: opendrift/models/shipdrift.py:30-343): wind drag on the dry
hull area plus a wave drift force integrated over a Pierson-Moskowitz-type
spectrum, with wave-damping and form-drag resolved by fixed-point
iteration.  The reference evaluates a scipy ``LinearNDInterpolator`` over
the (omega, beam/length, draft/length) force table per spectral bin; here
the table (bundled as ``shipdrift_wforce.json``) is sampled with a fused
trilinear jnp interpolation — the whole 100-bin spectral loop is unrolled
into vectorised array ops inside the step kernel.
"""

import json
import os

import numpy as np
import jax.numpy as jnp

from ..config import CONFIG_LEVEL_ESSENTIAL
from ..elements import LagrangianArray
from .base import OpenDriftSimulation

G = 9.81
RHO_AIR = 1.25
RHO_WATER = 1025.0


def _load_wforce():
    path = os.path.join(os.path.dirname(__file__), "shipdrift_wforce.json")
    with open(path) as f:
        d = json.load(f)
    return (np.asarray(d["omega"], np.float32),
            np.asarray(d["beam_over_length"], np.float32),
            np.asarray(d["draft_over_length"], np.float32),
            np.asarray(d["F"], np.float32),   # (omega, DL, BL)
            np.asarray(d["D"], np.float32))


def _interp3(table, omega_ax, dl_ax, bl_ax, om, dl, bl):
    """Trilinear interpolation of (O, D, B) table at arrays om/dl/bl."""
    oi = jnp.clip(jnp.searchsorted(omega_ax, om, side="right") - 1, 0,
                  len(omega_ax) - 2)
    ow = jnp.clip((om - omega_ax[oi])
                  / (omega_ax[oi + 1] - omega_ax[oi]), 0.0, 1.0)
    di = jnp.clip(jnp.searchsorted(dl_ax, dl, side="right") - 1, 0,
                  len(dl_ax) - 2)
    dw = jnp.clip((dl - dl_ax[di]) / (dl_ax[di + 1] - dl_ax[di]), 0.0, 1.0)
    bi = jnp.clip(jnp.searchsorted(bl_ax, bl, side="right") - 1, 0,
                  len(bl_ax) - 2)
    bw = jnp.clip((bl - bl_ax[bi]) / (bl_ax[bi + 1] - bl_ax[bi]), 0.0, 1.0)
    out = 0.0
    for do_, wo in ((0, 1 - ow), (1, ow)):
        for dd, wd in ((0, 1 - dw), (1, dw)):
            for db, wb in ((0, 1 - bw), (1, bw)):
                out = out + table[oi + do_, di + dd, bi + db] * wo * wd * wb
    return out


class ShipObject(LagrangianArray):
    """(reference shipdrift.py:30-76)."""

    variables = LagrangianArray.add_variables([
        ("orientation", {"dtype": np.float32, "units": "1", "default": 1.0}),
        ("length", {"dtype": np.float32, "units": "m", "default": 80.0,
                    "min": 1, "max": 500, "description": "Length of ship"}),
        ("height", {"dtype": np.float32, "units": "m", "default": 8.0,
                    "min": 1, "max": 100,
                    "description": "Total height of ship"}),
        ("draft", {"dtype": np.float32, "units": "m", "default": 4.0,
                   "min": 1, "max": 30,
                   "description": "Draft of ship (below waterline)"}),
        ("beam", {"dtype": np.float32, "units": "m", "default": 10.0,
                  "min": 1, "max": 70, "description": "Beam of ship"}),
        ("wind_drag_coeff", {"dtype": np.float32, "units": "1",
                             "seed": False, "default": 1.0}),
        ("water_drag_coeff", {"dtype": np.float32, "units": "1",
                              "seed": False, "default": 1.0}),
        ("jibeProbability", {"dtype": np.float32, "units": "1/h",
                             "default": 0.04}),
    ])


class ShipDrift(OpenDriftSimulation):
    """Ship drift model (reference shipdrift.py:80)."""

    ElementType = ShipObject

    required_variables = {
        "x_wind": {"fallback": None},
        "y_wind": {"fallback": None},
        "land_binary_mask": {"fallback": None},
        "x_sea_water_velocity": {"fallback": None},
        "y_sea_water_velocity": {"fallback": None},
        "horizontal_diffusivity": {"fallback": 100},
        "sea_surface_wave_stokes_drift_x_velocity": {"fallback": 0},
        "sea_surface_wave_stokes_drift_y_velocity": {"fallback": 0},
        "sea_surface_wave_significant_height": {"fallback": 0},
        "sea_surface_wave_mean_period_from_variance_spectral_density_"
        "second_frequency_moment": {"fallback": 0},
    }

    winwav_angle = 20.0  # degrees

    def __init__(self, *args, **kwargs):
        (self._omega_ax, self._bl_ax, self._dl_ax,
         self._F_table, self._D_table) = _load_wforce()
        super().__init__(*args, **kwargs)
        self._add_config({
            "seed:orientation": {
                "type": "enum", "enum": ["left", "right", "random"],
                "default": "random", "level": CONFIG_LEVEL_ESSENTIAL,
                "description": "Ship orientation relative to downwind"},
        })
        self._set_config_default("drift:max_speed", 2)

    # --------------------------------------------------------- seeding ----
    def seed_elements(self, *args, **kwargs):
        """Derive drag coefficients from ship dimensions
        (reference shipdrift.py:156-211)."""
        num = kwargs.get("number")
        if num is None:
            num = int(self.get_config("seed:number"))
        for var in ["length", "height", "draft", "beam"]:
            if var not in kwargs:
                kwargs[var] = self.get_config(f"seed:{var}")
            kwargs[var] = np.atleast_1d(np.asarray(kwargs[var], float))
            if len(kwargs[var]) == 1:
                kwargs[var] = kwargs[var] * np.ones(num)
        dl = np.clip(kwargs["draft"] / kwargs["length"], 0.025, 0.07)
        exposed = kwargs["height"] - kwargs["draft"]
        Cf = np.where(exposed > 37.2, 1.4,
                      1.045 + 0.016 * (exposed - 15.0))
        Cf = np.where(exposed <= 15, 0.700 + 0.023 * exposed, Cf)
        kwargs["wind_drag_coeff"] = Cf
        beta = 2.0 * dl
        Cd = np.where(beta > 0.12, 1.27,
                      1.32 + (1.27 - 1.32) / 0.02 * (beta - 0.10))
        Cd = np.where(beta <= 0.10,
                      1.38 + (1.32 - 1.38) / 0.02 * (beta - 0.08), Cd)
        Cd = np.where(beta <= 0.08,
                      1.44 + (1.38 - 1.44) / 0.02 * (beta - 0.06), Cd)
        Cd = np.where(beta <= 0.06,
                      1.50 + (1.44 - 1.50) / 0.01 * (beta - 0.05), Cd)
        kwargs["water_drag_coeff"] = Cd
        if "orientation" not in kwargs:
            oc = self.get_config("seed:orientation")
            if oc == "left":
                kwargs["orientation"] = np.zeros(num)
            elif oc == "right":
                kwargs["orientation"] = np.ones(num)
            else:
                kwargs["orientation"] = (np.arange(num) % 2).astype(float)
        return super().seed_elements(*args, **kwargs)

    # ---------------------------------------------------------- physics ---
    def update(self, ctx):
        """(reference shipdrift.py:213-330)."""
        d = ctx.state.data
        env = ctx.environment
        Tm = ctx.wave_period()
        Hs = ctx.significant_wave_height()
        bl = jnp.clip(d["beam"] / d["length"], 0.121, 0.179)
        dl = jnp.clip(d["draft"] / d["length"], 0.0251, 0.069)

        ctx.update_positions(env["x_sea_water_velocity"],
                             env["y_sea_water_velocity"])

        wind_speed = ctx.wind_speed()
        area_dry = d["length"] * (d["height"] - d["draft"])
        area_wet = d["length"] * d["draft"]
        F_wind = 0.5 * RHO_AIR * d["wind_drag_coeff"] * area_dry \
            * wind_speed ** 2
        safe_ws = jnp.where(wind_speed == 0, 1.0, wind_speed)
        F_wind_x = jnp.where(wind_speed == 0, 0.0,
                             F_wind * env["x_wind"] / safe_ws)
        F_wind_y = jnp.where(wind_speed == 0, 0.0,
                             F_wind * env["y_wind"] / safe_ws)

        # wave force: integrate the force/damping tables over the spectrum
        # (reference shipdrift.py:232-276), vectorised over bins x ships
        NSPEC = 100
        ommin2, ommin3, ommax = 2.25, 7.0, 12.0
        dom = (ommax - ommin2) / (NSPEC - 1)
        scale1 = jnp.sqrt(G / d["length"])
        tmp = (2.0 * jnp.pi / jnp.maximum(Tm, 0.1)) ** 4
        dcoef = tmp * Hs * Hs / (4.0 * jnp.pi)
        bcoef = tmp / jnp.pi

        om_bins = ommin2 + dom * jnp.arange(NSPEC, dtype=jnp.float32)
        omi = om_bins[:, None] * scale1[None, :]          # (NSPEC, N)
        s = dcoef * jnp.exp(-bcoef / omi ** 4) / omi ** 5  # spectrum (m2 s)

        F_ax = jnp.asarray(self._F_table)
        D_ax = jnp.asarray(self._D_table)
        in_table = om_bins < ommin3
        blb = jnp.broadcast_to(bl, omi.shape)
        dlb = jnp.broadcast_to(dl, omi.shape)
        f_tab = _interp3(F_ax, jnp.asarray(self._omega_ax),
                         jnp.asarray(self._dl_ax), jnp.asarray(self._bl_ax),
                         om_bins[:, None] + 0.0 * omi, dlb, blb)
        d_tab = _interp3(D_ax, jnp.asarray(self._omega_ax),
                         jnp.asarray(self._dl_ax), jnp.asarray(self._bl_ax),
                         om_bins[:, None] + 0.0 * omi, dlb, blb)
        f_hi = 0.5
        d_hi = 4.0 * om_bins[:, None] * f_hi
        fvals = jnp.where(in_table[:, None], f_tab, f_hi)
        dvals = jnp.where(in_table[:, None], d_tab, d_hi)
        # trapezoidal sum over bins (reference pairs f1/f2 across bins,
        # with f1 = 0 at the first bin)
        fpair = 0.5 * (jnp.concatenate([jnp.zeros_like(fvals[:1]),
                                        fvals[:-1]]) + fvals)
        dpair = 0.5 * (jnp.concatenate([jnp.zeros_like(dvals[:1]),
                                        dvals[:-1]]) + dvals)
        F_wave = jnp.sum(fpair * dom * scale1[None, :] * s ** 2, axis=0)
        beta2 = jnp.sum(dpair * dom * scale1[None, :] * s ** 2, axis=0)
        F_wave = F_wave * RHO_WATER * G * d["length"]
        beta2 = beta2 * RHO_WATER * jnp.sqrt(G * d["length"])

        # period-dependent reduction (reference shipdrift.py:278-288)
        F_wave = jnp.where(Tm > 8.55, F_wave * 0.66, F_wave)
        beta2 = jnp.where(Tm > 8.55, beta2 * 0.60, beta2)
        med = (Tm >= 5.7) & (Tm <= 8.55)
        F_wave = jnp.where(med, F_wave * (1.0 - 0.34 * (Tm - 5.7) / 2.85),
                           F_wave)
        beta2 = jnp.where(med, beta2 * (1.0 - 0.4 * (Tm - 5.7) / 2.85),
                          beta2)

        beta1 = 0.5 * RHO_WATER * d["water_drag_coeff"] * area_wet

        offset = -self.winwav_angle * 2.0 * (d["orientation"] - 0.5)
        su = env["sea_surface_wave_stokes_drift_x_velocity"]
        sv = env["sea_surface_wave_stokes_drift_y_velocity"]
        have_stokes = (jnp.max(jnp.abs(su)) + jnp.max(jnp.abs(sv))) > 0
        wave_dir = jnp.radians(offset) + jnp.where(
            have_stokes, jnp.arctan2(sv, su),
            jnp.arctan2(env["y_wind"], env["x_wind"]))
        F_wave_x = F_wave * jnp.cos(wave_dir)
        F_wave_y = F_wave * jnp.sin(wave_dir)
        F_total = jnp.sqrt((F_wind_x + F_wave_x) ** 2
                           + (F_wind_y + F_wave_y) ** 2)

        # fixed-point iteration for damping + form drag
        # (reference shipdrift.py:292-311)
        uw_tot = jnp.zeros_like(F_total)
        uw_dir = jnp.zeros_like(F_total)
        safe_beta1 = jnp.maximum(beta1, 1e-12)
        for _ in range(4):
            f2x = beta2 * uw_tot * jnp.cos(wave_dir)
            f2y = beta2 * uw_tot * jnp.sin(wave_dir)
            uw_dir = jnp.arctan2(F_wind_y + F_wave_y - f2y,
                                 F_wind_x + F_wave_x - f2x)
            bet2c = beta2 * jnp.cos(wave_dir - uw_dir)
            uw_tot = (-bet2c / (2.0 * safe_beta1)
                      + jnp.sqrt(bet2c * bet2c
                                 + 4.0 * safe_beta1 * F_total)
                      / (2.0 * safe_beta1))

        ctx.update_positions(uw_tot * jnp.cos(uw_dir),
                             uw_tot * jnp.sin(uw_dir))
        # horizontal diffusion and stranding are applied by the base step
