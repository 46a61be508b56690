"""The BASELINE.md config ladder, measured end-to-end on one chip.

Five rungs of increasing physics complexity (BASELINE.md "north-star",
mirroring the reference examples named there):

1. double_gyre     — RK4 in the analytic double gyre (example_double_gyre)
2. constant_diff   — constant current + horizontal diffusion
                     (example_constant_current + diffusion)
3. rk4_forcing     — RK4 in real gridded forcing, stranding active
                     (example_rungekutta_norkyst; Nordic subset here)
4. vertical_mixing — Visser inner loop, environment diffusivity
                     (example_vertical_mixing)
5. openoil         — OpenOil with full weathering (example_openoil,
                     Macondo oil)

Each rung reports steady-state particle-steps/s on the attached device
(excluding compile), as one JSON line.

Usage: python tools/ladder_bench.py [n_million] [rungs...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NORDIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
          "Nordic_subset.nc")


def _measure(o, reader_time, N, dt, K=10, steps=30,
             export=("lon", "lat", "status")):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    advance, final_snap, state, base_key = o.prepare_run(
        dt=float(dt), K=K, export_variables=list(export),
        total_steps=steps)
    dev_states = o.env.build_device_states()
    t0 = time.perf_counter()
    state, snap = advance(state, dev_states, jnp.float32(0.0),
                          jax.random.fold_in(base_key, 0))
    jax.device_get(jnp.nansum(state.data["lon"]))
    compile_s = time.perf_counter() - t0
    n_int = max(steps // K - 1, 1)
    t0 = time.perf_counter()
    for k in range(1, n_int + 1):
        state, snap = advance(state, dev_states, jnp.float32(k * K * dt),
                              jax.random.fold_in(base_key, k))
    jax.device_get(jnp.nansum(state.data["lon"]))
    wall = time.perf_counter() - t0
    return N * n_int * K / wall, compile_s


def rung_double_gyre(N):
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields import DoubleGyre
    o = OceanDrift(loglevel=30)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    dg = DoubleGyre(epsilon=0.25, omega=0.628, A=0.1)
    o.add_reader(dg)
    rng = np.random.default_rng(0)
    lon, lat = dg.xy2lonlat(rng.uniform(0.2, 1.8, N),
                            rng.uniform(0.2, 0.8, N))
    o.seed_elements(lon, lat, time=dg.initial_time)
    return _measure(o, dg.initial_time, N, dt=0.1)


def rung_constant_diff(N):
    from datetime import datetime
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.analytic import ConstantReader
    o = OceanDrift(loglevel=30)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 0.3,
                                 "y_sea_water_velocity": 0.1,
                                 "land_binary_mask": 0.0}))
    o.set_config("drift:horizontal_diffusivity", 10.0)
    rng = np.random.default_rng(0)
    o.seed_elements(lon=rng.uniform(3, 5, N), lat=rng.uniform(59, 61, N),
                    time=datetime(2020, 1, 1))
    return _measure(o, None, N, dt=900)


def _nordic_sim(model_cls, N, **seed_kwargs):
    from opendrift_tpu.fields.roms import ROMSReader
    o = model_cls(loglevel=30)
    # production fast path, same as bench.py/flagship_run (the reader's
    # DEFAULT is the parity-exact 'native' mode, whose per-fetch
    # index-map gather costs ~5x here — pin the config explicitly so
    # the ladder numbers name it)
    r = ROMSReader(NORDIC, sampling="regrid")
    r.packed_dtype = "float16"
    o.add_reader(r)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    o.set_config("drift:advection_single_fetch", True)
    o.set_config("drift:horizontal_diffusivity", 10.0)
    rng = np.random.default_rng(0)
    o.seed_elements(lon=rng.uniform(13.0, 14.5, N),
                    lat=rng.uniform(66.9, 67.8, N),
                    time=r.times[0], **seed_kwargs)
    return o


def rung_rk4_forcing(N):
    from opendrift_tpu.models import OceanDrift
    o = _nordic_sim(OceanDrift, N)
    o.set_config("drift:vertical_advection", False)
    o.set_config("drift:truncate_ocean_model_below_m", 0.0)
    return _measure(o, None, N, dt=900)


def rung_vertical_mixing(N):
    from opendrift_tpu.models import OceanDrift
    o = _nordic_sim(OceanDrift, N, z=-10.0)
    o.set_config("drift:vertical_mixing", True)
    o.set_config("vertical_mixing:timestep", 90.0)  # 10 inner cycles
    o.set_config("vertical_mixing:diffusivitymodel",
                 "windspeed_Sundby1983")
    return _measure(o, None, N, dt=900)


def rung_openoil(N):
    from opendrift_tpu.models.openoil import OpenOil
    o = _nordic_sim(OpenOil, N, z=0.0, mass_oil=1.0,
                    oil_type="GENERIC MEDIUM CRUDE")
    o.set_config("processes:evaporation", True)
    o.set_config("processes:emulsification", True)
    o.set_config("processes:dispersion", True)
    o.set_config("drift:vertical_mixing", True)
    o.set_config("vertical_mixing:timestep", 90.0)
    o.set_config("vertical_mixing:diffusivitymodel",
                 "windspeed_Sundby1983")
    return _measure(o, None, N, dt=900)


RUNGS = {
    "double_gyre": rung_double_gyre,
    "constant_diff": rung_constant_diff,
    "rk4_forcing": rung_rk4_forcing,
    "vertical_mixing": rung_vertical_mixing,
    "openoil": rung_openoil,
}


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    n_million = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    N = int(n_million * 1e6)
    names = sys.argv[2:] or list(RUNGS)
    dev = str(jax.devices()[0])
    for name in names:
        rate, compile_s = RUNGS[name](N)
        print(json.dumps({"rung": name, "particles": N,
                          "particle_steps_per_s": int(rate),
                          "compile_s": round(compile_s, 1),
                          "device": dev}), flush=True)


if __name__ == "__main__":
    main()
