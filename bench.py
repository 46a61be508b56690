"""Driver benchmark: one JSON line, primary metric = the north-star
particle-steps/s on gridded-forcing RK4 (BASELINE.md north star), with
``extra_metrics`` carrying the optimized-flagship configuration and the
mixing-substep workload (BASELINE.md #5 analogue, the r01 metric).

Workloads (all on the attached chip, steady-state, compile excluded):

A. north-star: 2M particles, RK4 in real Nordic-4km ROMS forcing,
   full-3D float32 packed rows, multi-fetch RK stages, particles spread
   over the top 20 m so z-gathers stay live.  vs_baseline derives from
   the reference's own interpolation benchmark (reference
   tests/benchmarks/performance_test.py:83-95: 10,000 particles per 3D
   ReaderBlock fetch in 1.5 s; RK4 = 4 fetches/step -> ~1,667
   particle-steps/s CPU, generously ignoring all non-interpolation
   cost).
B. optimized flagship config (tools/flagship_run.py): f16 forcing rows,
   surface-truncated z-extent, single-fetch RK stages — legitimate for
   surface drift, reported separately from the honest 3D number.
C. mixing: 500k elements x 10 Visser substeps per RK4 outer step
   (reference does this at 1.79e5 substeps/s, BASELINE.md #5).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline",
"extra_metrics": [...]}.
"""

import json
import os
import time

N_GRID = 2_000_000        # particles for workloads A/B
GRID_STEPS = 30           # steady-state steps (3 fused intervals of 10)
N_MIX = 500_000
MIX_OUTER = 10
DT_MIX = 50.0
BASELINE_GRID = 10_000 / (4 * 1.5)     # reference RK4-interp bound
BASELINE_MIX = 5_000_000 / 28.0        # reference mixing bench


def _steady_rate(o, n_particles, n_steps, dt=900.0, K=10):
    """Compile + run; return steady-state particle-steps/s."""
    import jax
    import jax.numpy as jnp

    advance, final_snap, state, base_key = o.prepare_run(
        dt=float(dt), K=K, export_variables=["lon", "lat", "status"],
        total_steps=n_steps)
    dev_states = o.env.build_device_states()
    state, snap = advance(state, dev_states, jnp.float32(0.0),
                          jax.random.fold_in(base_key, 0))
    # scalar device_get forces full execution through the remote tunnel
    float(jax.device_get(jnp.nansum(snap["lon"])))
    n_intervals = max(n_steps // K, 1)
    t0 = time.perf_counter()
    for k in range(1, n_intervals + 1):
        state, snap = advance(state, dev_states, jnp.float32(k * K * dt),
                              jax.random.fold_in(base_key, k))
    float(jax.device_get(jnp.nansum(snap["lon"])))
    wall = time.perf_counter() - t0
    return n_particles * n_intervals * K / wall


def _build_grid_sim(optimized, n=N_GRID):
    import numpy as np
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.roms import ROMSReader

    nordic = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
              "Nordic_subset.nc")
    o = OceanDrift(loglevel=40)
    # 'regrid' = the production fast path (load-time index-space regrid,
    # affine device transform — no per-element index-map gather; values
    # within u-rms 5e-3 of the parity-exact 'native' mode, bounded in
    # tests/test_reference_roms_values_parity.py)
    reader = ROMSReader(nordic, sampling="regrid")
    if optimized:
        reader.packed_dtype = "float16"
    o.add_reader(reader)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    o.set_config("drift:vertical_advection", False)
    o.set_config("drift:horizontal_diffusivity", 10.0)
    if optimized:
        o.set_config("drift:truncate_ocean_model_below_m", 0.0)
        o.set_config("drift:advection_single_fetch", True)
        o.set_config("general:coastline_bisection", "block")
    rng = np.random.default_rng(0)
    lon = rng.uniform(13.0, 14.5, n)
    lat = rng.uniform(66.9, 67.8, n)
    z = None if optimized else rng.uniform(-20.0, 0.0, n)
    o.seed_elements(lon=lon, lat=lat, z=z, time=reader.times[0])
    return o


def _mixing_rate():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_sim

    o = _build_sim(number=N_MIX, scheme="runge-kutta4", mixing=True,
                   z=-10.0)
    o.set_config("vertical_mixing:timestep", DT_MIX)
    dt = 500.0
    advance, final_snap, state, base_key = o.prepare_run(dt=dt, K=MIX_OUTER)
    dev_states = o.env.build_device_states()
    checksum = jax.jit(lambda s: jnp.sum(s.data["lon"]) + jnp.sum(s.data["z"]))
    state, snap = advance(state, dev_states, jnp.float32(0.0),
                          jax.random.fold_in(base_key, 0))
    jax.device_get(checksum(state))
    trials = []
    for trial in range(4):
        reps = 3
        t0 = time.perf_counter()
        for i in range(1, reps + 1):
            state, snap = advance(state, dev_states,
                                  jnp.float32((trial * reps + i)
                                              * MIX_OUTER * dt),
                                  jax.random.fold_in(base_key,
                                                     trial * reps + i))
        jax.device_get(checksum(state))
        trials.append((time.perf_counter() - t0) / reps)
    elapsed = min(trials)
    return N_MIX * MIX_OUTER * int(dt / DT_MIX) / elapsed


def main():
    import sys
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    def log(msg):
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)

    # each workload is independent: a failure (or a driver timeout that
    # lands mid-extra-workload) must not cost the primary metric, so the
    # primary JSON line is (re)printed as soon as each stage completes
    log("workload A: honest 3D f32 multi-fetch RK4 ...")
    rate_honest = _steady_rate(_build_grid_sim(optimized=False),
                               N_GRID, GRID_STEPS)
    result = {
        "metric": "particle-steps/s (2M elem, RK4 gridded 3D f32 "
                  "multi-fetch)",
        "value": round(rate_honest, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(rate_honest / BASELINE_GRID, 2),
        "extra_metrics": [],
        # a secondary workload that dies must be VISIBLE in the JSON
        # line, not just absent from extra_metrics (that is exactly how
        # the r4 Pallas TPU regression shipped silently)
        "failed_workloads": [],
    }
    log(f"A done: {rate_honest:.3e}")

    # regression guard: warn (in the JSON line) when the primary drops
    # >5% below the committed last-known-good (VERDICT r3 weak #7)
    lkg_path = os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "BENCH_LKG.json")
    try:
        with open(lkg_path) as f:
            lkg = json.load(f)["primary"]
        result["vs_last_known_good"] = round(rate_honest / lkg, 3)
        if rate_honest < 0.95 * lkg:
            result["regression_warning"] = (
                f"primary {rate_honest:.3e} is "
                f"{(1 - rate_honest / lkg) * 100:.1f}% below "
                f"last-known-good {lkg:.3e} (BENCH_LKG.json)")
            log(result["regression_warning"])
    except Exception as exc:  # noqa: BLE001
        log(f"no last-known-good comparison: {exc}")

    try:
        log("workload B: optimized flagship config ...")
        rate_opt = _steady_rate(_build_grid_sim(optimized=True),
                                N_GRID, GRID_STEPS)
        result["extra_metrics"].append(
            {"id": "optimized",
             "metric": "particle-steps/s (2M elem, RK4 gridded, "
                       "optimized: f16 rows, surface, single-fetch)",
             "value": round(rate_opt, 1),
             "unit": "particle-steps/s",
             "vs_baseline": round(rate_opt / BASELINE_GRID, 2)})
        log(f"B done: {rate_opt:.3e}")
    except Exception as exc:  # noqa: BLE001 — keep the primary metric
        log(f"B failed: {exc}")
        result["failed_workloads"].append(f"optimized: {exc}")

    try:
        # the BASELINE north star is specified AT 10M elements: same
        # honest configuration as A, 10M particles, fewer steady
        # intervals to fit the bench budget (tools/flagship_run.py
        # measures the long-form number)
        log("workload D: honest 3D RK4 at 10M elements ...")
        n10 = 10_000_000
        rate_10m = _steady_rate(_build_grid_sim(optimized=False, n=n10),
                                n10, 20)
        result["extra_metrics"].append(
            {"id": "10m",
             "metric": "particle-steps/s (10M elem, RK4 gridded 3D f32 "
                       "multi-fetch — north-star scale)",
             "value": round(rate_10m, 1),
             "unit": "particle-steps/s",
             "vs_baseline": round(rate_10m / BASELINE_GRID, 2)})
        log(f"D done: {rate_10m:.3e}")
    except Exception as exc:  # noqa: BLE001
        log(f"D failed: {exc}")
        result["failed_workloads"].append(f"10m: {exc}")

    try:
        log("workload C: mixing substeps ...")
        rate_mix = _mixing_rate()
        result["extra_metrics"].append(
            {"id": "mixing",
             "metric": "element-mixing-substeps/s (500k elem, RK4 + "
                       "Visser)",
             "value": round(rate_mix, 1),
             "unit": "substeps/s",
             "vs_baseline": round(rate_mix / BASELINE_MIX, 2)})
        log(f"C done: {rate_mix:.3e}")
    except Exception as exc:  # noqa: BLE001
        log(f"C failed: {exc}")
        result["failed_workloads"].append(f"mixing: {exc}")

    # extra-metric LKG guard (VERDICT r4 weak #2/#6): a previously
    # reported extra metric that vanishes or drops >5% is flagged in
    # the JSON line, same as the primary guard above
    try:
        with open(lkg_path) as f:
            lkg_extras = json.load(f).get("extras", {})
        warnings = result.setdefault("extra_metric_warnings", [])
        by_id = {m.get("id"): m["value"] for m in result["extra_metrics"]}
        for mid, good in lkg_extras.items():
            if mid not in by_id:
                warnings.append(
                    f"extra metric '{mid}' MISSING (last-known-good "
                    f"{good:.3e})")
            elif by_id[mid] < 0.95 * good:
                warnings.append(
                    f"extra metric '{mid}' {by_id[mid]:.3e} is "
                    f"{(1 - by_id[mid] / good) * 100:.1f}% below "
                    f"last-known-good {good:.3e}")
        for wmsg in warnings:
            log(wmsg)
        if not warnings:
            del result["extra_metric_warnings"]
    except Exception as exc:  # noqa: BLE001
        log(f"no extra-metric LKG comparison: {exc}")

    print(json.dumps(result))


if __name__ == "__main__":
    main()
