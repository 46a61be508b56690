"""Weak-scaling harness: particle-steps/s/device and scaling efficiency.

Measures the two scaling paths of SURVEY.md §2.10 over however many
devices are visible:

* ``dp`` — particles sharded over a 1D mesh, forcing replicated (the
  flagship data-parallel path; zero collectives).
* ``tiles`` — forcing-grid domain decomposition with on-device halo
  exchange (``ppermute``) and particle migration (``all_gather`` + claim)
  from ``opendrift_tpu.parallel.domain``.

Weak scaling: per-device work is held constant while the device count
grows; efficiency(d) = rate_per_device(d) / rate_per_device(1).

On real multi-chip TPU hardware this produces the honest numbers
(BASELINE.md north star: >=80% efficiency).  On a virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``)
the collective paths are *validated* but the host's 2 cores are
oversubscribed, so timings are functional, not performance, results —
the harness labels them as such.

Usage:
  python tools/scaling_bench.py [--mode dp|tiles|both] [--per-device N]
                                [--steps K] [--devices 1,2,4,8]

Prints one JSON line per measurement and a summary line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _timed(fn, sync, trials=3):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        sync()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_dp(devices, n_per_device, n_steps):
    """Particle-sharded flagship step (RK4 double-gyre + diffusion)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from __graft_entry__ import _build_sim

    d = len(devices)
    mesh = Mesh(np.array(devices), axis_names=("dp",))
    N = n_per_device * d
    o = _build_sim(number=N)
    advance, _, state, base_key = o.prepare_run(dt=0.1, K=n_steps,
                                                jit=False)
    dev_states = o.env.build_device_states()
    elem = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, elem)
    dev_states = jax.device_put(dev_states, repl)
    step = jax.jit(advance)
    key = jax.device_put(jax.random.fold_in(base_key, 0), repl)
    t0 = jax.device_put(jnp.float32(0.0), repl)
    checksum = jax.jit(lambda s: jnp.sum(s.data["lon"]))

    out = step(state, dev_states, t0, key)       # compile + warmup
    jax.device_get(checksum(out[0]))

    holder = {"s": state}

    def run():
        holder["s"], _ = step(holder["s"], dev_states, t0, key)

    elapsed = _timed(run, lambda: jax.device_get(checksum(holder["s"])))
    rate = N * n_steps / elapsed
    return {"mode": "dp", "devices": d, "particles": N,
            "steps": n_steps, "particle_steps_per_s": round(rate),
            "per_device": round(rate / d)}


def bench_tiles(devices, n_per_device, n_steps):
    """Domain-decomposed stepper: halo exchange + migration."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from opendrift_tpu.parallel.domain import (
        TiledGrid, make_tiled_stepper, assign_particles_to_tiles)

    d = len(devices)
    mesh = Mesh(np.array(devices), axis_names=("tiles",))
    rows_per_tile, nx = 256, 256
    ny = rows_per_tile * d
    dy = dx = 100.0
    y, x = np.mgrid[0:ny, 0:nx]
    u = 0.5 + 0.3 * np.sin(2 * np.pi * y / ny)
    v = 0.8 * np.cos(2 * np.pi * x / nx)
    blocks = np.stack([u, v]).astype(np.float32)[:, None]
    grid = TiledGrid(blocks, [0.0], 0.0, dy, 0.0, dx, n_tiles=d, halo=4)
    N = n_per_device * d
    rng = np.random.default_rng(0)
    px = rng.uniform(5 * dx, (nx - 5) * dx, N).astype(np.float32)
    py = rng.uniform(5 * dy, (ny - 5) * dy, N).astype(np.float32)
    # capacity headroom: every slot (dead or alive) rides the sample
    # gathers, so cap/particles directly scales the per-step cost
    cap = int(1.25 * n_per_device)
    p = assign_particles_to_tiles(px, py, grid, cap=cap)
    p = {k: jnp.asarray(vv) for k, vv in p.items()}
    core, times = grid.device_arrays(mesh)
    # halo=4 rows x 100 m and max |v|*dt = 24 m/substep -> exchanging
    # every 4 substeps keeps particles well inside the halo
    advance = make_tiled_stepper(grid, mesh, dt=30.0, n_substeps=n_steps,
                                 max_leavers=max(64, n_per_device // 16),
                                 migrate_every=4)

    p = advance(core, times, p, jnp.float32(0.0))   # compile + warmup
    alive = jax.jit(lambda q: jnp.sum(q["alive"]))
    jax.device_get(alive(p))

    holder = {"p": p}

    def run():
        holder["p"] = advance(core, times, holder["p"], jnp.float32(0.0))

    elapsed = _timed(run, lambda: jax.device_get(alive(holder["p"])))
    n_alive = int(jax.device_get(alive(holder["p"])))
    rate = N * n_steps / elapsed
    return {"mode": "tiles", "devices": d, "particles": N,
            "steps": n_steps, "particle_steps_per_s": round(rate),
            "per_device": round(rate / d), "alive": n_alive}


def bench_engine_dd(devices, n_per_device, n_steps):
    """ENGINE-integrated domain decomposition: the full OceanDrift step
    (RK4 stage sampling, geodesic update, model physics) on tiled
    gridded forcing inside one shard_map (parallel/tiled.py) — the
    product path a user gets with parallel:domain_decomposition."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields import ArrayReader

    d = len(devices)
    t0d = datetime(2021, 3, 1)
    rows_per_tile, nx = 128, 128
    ny = rows_per_tile * d
    lon = np.linspace(0.0, 8.0, nx)
    lat = np.linspace(55.0, 55.0 + 0.05 * ny, ny)
    yy = np.linspace(0, 2 * np.pi, ny, dtype=np.float32)[None, :, None]
    xx = np.linspace(0, 2 * np.pi, nx, dtype=np.float32)[None, None, :]
    uu = np.broadcast_to(0.4 + 0.2 * np.sin(yy), (2, ny, nx)).astype(
        np.float32)
    vv = np.broadcast_to(0.5 * np.cos(xx), (2, ny, nx)).astype(np.float32)
    N = n_per_device * d
    o = OceanDrift(loglevel=50)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    o.set_config("drift:vertical_advection", False)
    o.set_config("drift:stokes_drift", False)
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:horizontal_diffusivity", 1.0)
    o.set_config("parallel:domain_decomposition", True)
    o.set_config("parallel:tile_capacity_factor", 1.25)
    o.set_mesh(devices)
    o.add_reader(ArrayReader(
        {"x_sea_water_velocity": uu, "y_sea_water_velocity": vv},
        x=lon, y=lat, times=[t0d, t0d + timedelta(days=30)]))
    rng = np.random.default_rng(0)
    o.seed_elements(rng.uniform(0.5, 7.5, N), rng.uniform(
        lat[5], lat[-5], N), number=N, time=t0d)
    advance, _, state, base_key = o.prepare_run(dt=300.0, K=n_steps,
                                                total_steps=n_steps * 4)
    dd = o._dd
    dev_states = dd.retile(o.env.build_device_states(
        t0d, t0d + timedelta(seconds=300.0 * n_steps)))
    key = jax.random.fold_in(base_key, 0)
    t0 = jnp.float32(0.0)
    out = advance(state, dev_states, t0, key)        # compile + warmup
    checksum = jax.jit(lambda s: jnp.nansum(s.data["lon"]))
    jax.device_get(checksum(out[0]))
    holder = {"s": out[0]}

    def run():
        holder["s"], _ = advance(holder["s"], dev_states, t0, key)

    elapsed = _timed(run, lambda: jax.device_get(checksum(holder["s"])))
    rate = N * n_steps / elapsed
    return {"mode": "engine", "devices": d, "particles": N,
            "steps": n_steps, "particle_steps_per_s": round(rate),
            "per_device": round(rate / d),
            "slots_per_tile": dd.cap}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["dp", "tiles", "engine", "both", "all"])
    ap.add_argument("--per-device", type=int, default=250_000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--devices", default=None,
                    help="comma-separated device counts (default: powers "
                         "of 2 up to all visible)")
    args = ap.parse_args()

    env_platforms = os.environ.get("JAX_PLATFORMS")
    import jax
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)
    elif "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)

    all_devs = jax.devices()
    virtual_cpu = all_devs[0].platform == "cpu"
    if args.devices:
        counts = [int(c) for c in args.devices.split(",")]
    else:
        counts = []
        c = 1
        while c <= len(all_devs):
            counts.append(c)
            c *= 2
    if args.mode == "both":
        modes = ["dp", "tiles"]
    elif args.mode == "all":
        modes = ["dp", "tiles", "engine"]
    else:
        modes = [args.mode]

    bench_of = {"dp": bench_dp, "tiles": bench_tiles,
                "engine": bench_engine_dd}
    results = {m: [] for m in modes}
    for m in modes:
        fn = bench_of[m]
        for c in counts:
            r = fn(all_devs[:c], args.per_device, args.steps)
            r["functional_only"] = virtual_cpu
            print(json.dumps(r), flush=True)
            results[m].append(r)

    summary = {"summary": True, "platform": all_devs[0].platform,
               "functional_only": virtual_cpu}
    for m in modes:
        rs = results[m]
        if len(rs) > 1:
            eff = rs[-1]["per_device"] / rs[0]["per_device"]
            summary[f"{m}_weak_scaling_efficiency"] = round(eff, 3)
        summary[f"{m}_per_device"] = rs[0]["per_device"]
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
