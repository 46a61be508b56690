"""Benchmark: vertical-mixing-dominated OceanDrift throughput on one chip.

Mirrors the reference's heaviest self-benchmark
(reference: tests/benchmarks/performance_test.py:117-129): 500,000
elements, 10 vertical-mixing inner cycles per outer step, which the
reference machine does at ~1.79e5 element-mixing-substeps/s (28 s for one
outer step; BASELINE.md #5).  Here the same workload — RK4 double-gyre
advection + horizontal diffusion + Visser mixing inner loop — runs as one
fused device kernel; the metric counts element-mixing-substeps/s.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

N_ELEMENTS = 500_000
OUTER_STEPS = 10          # timed outer steps
DT = 500.0                # s, outer step
DT_MIX = 50.0             # s  -> 10 inner cycles per outer step
BASELINE = 5_000_000 / 28.0   # reference: 500k elem x 10 cycles in 28 s


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_sim

    o = _build_sim(number=N_ELEMENTS, scheme="runge-kutta4", mixing=True,
                   z=-10.0)
    o.set_config("vertical_mixing:timestep", DT_MIX)
    advance, final_snap, state, base_key = o.prepare_run(dt=DT, K=OUTER_STEPS)
    dev_states = o.env.build_device_states()
    # checksum reduction: device_get of a scalar forces full execution —
    # block_until_ready alone does not synchronise reliably through the
    # remote-TPU tunnel used in this environment
    checksum = jax.jit(lambda s: jnp.sum(s.data["lon"]) + jnp.sum(s.data["z"]))

    # warmup: compile + one full interval
    state, snap = advance(state, dev_states, jnp.float32(0.0),
                          jax.random.fold_in(base_key, 0))
    jax.device_get(checksum(state))

    # several timed trials; take the best to reject tunnel-latency noise
    # (the remote-TPU link adds multi-ms jitter per dispatch)
    trials = []
    for trial in range(4):
        reps = 3
        t0 = time.perf_counter()
        for i in range(1, reps + 1):
            state, snap = advance(state, dev_states,
                                  jnp.float32((trial * reps + i)
                                              * OUTER_STEPS * DT),
                                  jax.random.fold_in(base_key,
                                                     trial * reps + i))
        jax.device_get(checksum(state))
        trials.append((time.perf_counter() - t0) / reps)
    elapsed = min(trials)

    substeps = N_ELEMENTS * OUTER_STEPS * int(DT / DT_MIX)
    rate = substeps / elapsed
    print(json.dumps({
        "metric": "element-mixing-substeps/s (500k elem, RK4 + Visser)",
        "value": round(rate, 1),
        "unit": "substeps/s",
        "vs_baseline": round(rate / BASELINE, 2),
    }))


if __name__ == "__main__":
    main()
