"""Microbenchmark probing the ~5 MiB packed-table gather cliff (VERDICT r4 #5).

The production sampler's hot op is ``jnp.take(packed, lin, axis=0)`` with
``packed: (rows, C)`` and ``lin: (N,) int32`` (ops/interp.py:169,187).  r4
measured the per-index rate dropping ~40% once the packed table crosses
~5 MiB, and falsified row-padding as the mechanism.  This sweep separates
the remaining hypotheses:

  A. *operand-size placement*: XLA lowers small-operand gathers
     differently (e.g. table held in VMEM); the cliff tracks operand
     bytes regardless of which rows are touched.
  B. *working-set cache*: the cliff tracks the bytes actually touched;
     gathering from a small window of a big table stays fast -> lever is
     keeping hot rows compact, not shrinking the operand.
  C. *row-width byte-bound transition*: cliff position shifts with row
     width in bytes (C x dtype), i.e. it is really a bytes/s wall.

Discriminating cells of the sweep:
  - rows x C x dtype grid around the cliff (operand bytes span 1-64 MiB)
  - "window" runs: big operand, indices restricted to the first W rows
  - sorted vs uniform index distributions (locality sensitivity)
  - a 2-way split: two half-size tables gathered with N/2 indices each
    (emulates z-sharding the packed table under the cliff)

Usage:  python tools/gather_cliff.py [--quick] [--json out.json]
Prints a markdown table; writes raw rows as JSON for docs/performance.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_IDX = 2_000_000      # matches bench workload A's element count
WARMUP = 3
ITERS = 10


def _bench(fn, *args) -> float:
    """Median seconds/iteration of jitted fn(*args).

    NB: on the remote 'axon' platform block_until_ready does not actually
    wait for execution — a scalar ``device_get`` is the only reliable
    fence (same workaround as bench.py:49-50), and each timed sample must
    end in one.  To amortize the tunnel round-trip the timed unit is
    REPS chained executions per fence.
    """
    REPS = 5
    f = jax.jit(fn)
    for _ in range(WARMUP):
        float(jax.device_get(f(*args)))
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(REPS):
            acc = acc + f(*args)
        float(jax.device_get(acc))
        times.append((time.perf_counter() - t0) / REPS)
    return float(np.median(times))


def _table(rows: int, cols: int, dtype) -> jax.Array:
    key = jax.random.PRNGKey(rows * 131 + cols)
    return jax.random.normal(key, (rows, cols), dtype=jnp.float32).astype(dtype)


def _indices(rows: int, window: int | None, dist: str) -> jax.Array:
    rng = np.random.default_rng(12345)
    hi = window if window is not None else rows
    idx = rng.integers(0, hi, size=N_IDX, dtype=np.int32)
    if dist == "sorted":
        idx = np.sort(idx)
    return jnp.asarray(idx)


def run_cell(rows, cols, dtype, window=None, dist="uniform", split=1):
    """One sweep cell -> dict row with gathered-rows/s."""
    if split == 1:
        tab = _table(rows, cols, dtype)
        idx = _indices(rows, window, dist)

        def f(t, i):
            return jnp.take(t, i, axis=0, mode="clip").astype(
                jnp.float32).sum()

        sec = _bench(f, tab, idx)
    else:
        # split the table row-wise into `split` shards, each gathered with
        # N/split indices — same total work, smaller per-gather operand.
        srows = rows // split
        tabs = [_table(srows, cols, dtype) for _ in range(split)]
        idxs = [_indices(srows, None, dist)[: N_IDX // split]
                for _ in range(split)]

        def f(*ts_is):
            ts, iis = ts_is[:split], ts_is[split:]
            return sum(jnp.take(t, i, axis=0, mode="clip").astype(
                jnp.float32).sum() for t, i in zip(ts, iis))

        sec = _bench(f, *tabs, *idxs)
    mib = rows * cols * jnp.dtype(dtype).itemsize / 2**20
    return {
        "rows": rows, "cols": cols, "dtype": str(jnp.dtype(dtype).name),
        "table_mib": round(mib, 2), "window": window, "dist": dist,
        "split": split, "sec": sec,
        "rows_per_s": N_IDX / sec,
    }


def run_u16_reconstruct(rows: int, cols: int):
    """f32 table stored as (rows, 2*cols) uint16 halves; gather on the
    16-bit fast path; bitcast-reassemble exact f32 after the gather."""
    tab32 = _table(rows, cols, jnp.float32)
    # (rows, cols, 2) u16 -> (rows, 2*cols); column pairs stay adjacent
    tab16 = jax.lax.bitcast_convert_type(tab32, jnp.uint16).reshape(
        rows, 2 * cols)
    idx = _indices(rows, None, "uniform")

    def f(t, i):
        g = jnp.take(t, i, axis=0, mode="clip")          # (N, 2C) u16
        f32 = jax.lax.bitcast_convert_type(
            g.reshape(-1, cols, 2), jnp.float32)          # exact f32
        return f32.sum()

    # exactness check on a small prefix
    got = jax.jit(f)(tab16, idx[:1024])
    want = jnp.take(tab32, idx[:1024], axis=0, mode="clip").sum()
    assert jnp.allclose(jax.device_get(got), jax.device_get(want)), \
        (got, want)
    sec = _bench(f, tab16, idx)
    r = {"rows": rows, "cols": cols, "dtype": "u16x2-reconstruct",
         "table_mib": round(rows * cols * 4 / 2**20, 2), "window": None,
         "dist": "uniform", "split": 1, "sec": sec,
         "rows_per_s": N_IDX / sec}
    print(f"rows={rows:>7} C={cols:>2} u16x2    "
          f"{r['table_mib']:>7.2f} MiB                        "
          f"-> {r['rows_per_s'] / 1e6:8.1f} M rows/s")
    return r


def run_u8_reconstruct(rows: int, cols: int):
    """f32 table stored as (rows, 4*cols) uint8; gather on the 8-bit
    path (column-bytes = rows*1); bitcast-reassemble exact f32."""
    tab32 = _table(rows, cols, jnp.float32)
    tab8 = jax.lax.bitcast_convert_type(tab32, jnp.uint8).reshape(
        rows, 4 * cols)
    idx = _indices(rows, None, "uniform")

    def f(t, i):
        g = jnp.take(t, i, axis=0, mode="clip")          # (N, 4C) u8
        f32 = jax.lax.bitcast_convert_type(
            g.reshape(-1, cols, 4), jnp.float32)
        return f32.sum()

    got = jax.jit(f)(tab8, idx[:1024])
    want = jnp.take(tab32, idx[:1024], axis=0, mode="clip").sum()
    assert jnp.allclose(jax.device_get(got), jax.device_get(want)), \
        (got, want)
    sec = _bench(f, tab8, idx)
    r = {"rows": rows, "cols": cols, "dtype": "u8x4-reconstruct",
         "table_mib": round(rows * cols * 4 / 2**20, 2), "window": None,
         "dist": "uniform", "split": 1, "sec": sec,
         "rows_per_s": N_IDX / sec}
    print(f"rows={rows:>7} C={cols:>2} u8x4     "
          f"{r['table_mib']:>7.2f} MiB                        "
          f"-> {r['rows_per_s'] / 1e6:8.1f} M rows/s")
    return r


def run_workload_cell(rows, cols=44, dtype=jnp.float32, split=None,
                      label=""):
    """Workload-A-shaped cell: FOUR corner takes (z0/z1 x y0/y1) of an
    x-paired (rows, cols) table fused with the bilinear blend — the
    shape of PackedSampler.gather_rows inside the step kernel, where the
    r4 ledger measured the ~5 MiB cliff (33k rows x 176 B rows), which
    the plain sum-reduce cells above do NOT reproduce."""
    from opendrift_tpu.ops.interp import maybe_split_table, take_rows
    tab = _table(rows, cols, dtype)
    if split:
        tab = maybe_split_table(tab, force=split)
    rng = np.random.default_rng(7)
    n = N_IDX
    lin_z0y0 = jnp.asarray(rng.integers(0, rows, n, dtype=np.int32))
    stride = max(rows // 50, 1)
    half = cols // 2

    def f(t, l00):
        l01 = jnp.minimum(l00 + stride, rows - 1)
        l10 = jnp.minimum(l00 + rows // 3, rows - 1)
        l11 = jnp.minimum(l10 + stride, rows - 1)
        fx = (l00 % 97).astype(jnp.float32)[:, None] / 97.0
        fy = (l00 % 89).astype(jnp.float32)[:, None] / 89.0
        fz = (l00 % 83).astype(jnp.float32)[:, None] / 83.0

        def corner(lin):
            g = take_rows(t, lin)
            return g[:, :half] * (1.0 - fx) + g[:, half:] * fx
        rz0 = corner(l00) * (1.0 - fy) + corner(l01) * fy
        rz1 = corner(l10) * (1.0 - fy) + corner(l11) * fy
        return (rz0 * (1.0 - fz) + rz1 * fz).astype(jnp.float32).sum()

    sec = _bench(f, tab, lin_z0y0)
    mib = rows * cols * jnp.dtype(dtype).itemsize / 2**20
    r = {"rows": rows, "cols": cols,
         "dtype": label or str(jnp.dtype(dtype).name),
         "table_mib": round(mib, 2), "window": None, "dist": "workload",
         "split": split or 1, "sec": sec,
         "rows_per_s": 4 * N_IDX / sec}
    print(f"WL rows={rows:>7} C={cols:>2} {r['dtype']:<10} "
          f"{mib:>7.2f} MiB -> {r['rows_per_s'] / 1e6:8.1f} M rows/s "
          f"({N_IDX / sec / 1e6:.2f} M samples/s)")
    return r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--phase2", action="store_true",
                    help="threshold localisation + 16-bit-path strategies")
    ap.add_argument("--phase3", action="store_true",
                    help="large-table tail: f32 direct vs u8x4")
    ap.add_argument("--phase4", action="store_true",
                    help="workload-shaped fused cells around the 5 MiB "
                         "ledger cliff")
    ap.add_argument("--phase5", action="store_true",
                    help="fused-shape threshold localisation + "
                         "reconstruct variants")
    ap.add_argument("--phase6", action="store_true",
                    help="compensated f16 hi+lo storage in the fused "
                         "shape (same bytes as f32, f16 gather "
                         "strategy, reconstruct = one add)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if args.phase6:
        results = []

        def comp_cell(rows, cols=22):
            """(rows, 2*cols) f16 block layout [hi | lo]; fused corner
            takes + widen-add reconstruct + bilinear blend."""
            key = jax.random.PRNGKey(rows)
            f32 = jax.random.normal(key, (rows, cols), dtype=jnp.float32)
            hi = f32.astype(jnp.float16)
            lo = (f32 - hi.astype(jnp.float32)).astype(jnp.float16)
            tab = jnp.concatenate([hi, lo], axis=1)       # (rows, 2C)
            # accuracy of the representation itself
            err = float(jnp.max(jnp.abs(
                (hi.astype(jnp.float32) + lo.astype(jnp.float32)) - f32)))
            rng = np.random.default_rng(7)
            l00 = jnp.asarray(rng.integers(0, rows, N_IDX,
                                           dtype=np.int32))
            stride = max(rows // 50, 1)
            half = cols // 2

            def f(t, l0):
                l01 = jnp.minimum(l0 + stride, rows - 1)
                l10 = jnp.minimum(l0 + rows // 3, rows - 1)
                l11 = jnp.minimum(l10 + stride, rows - 1)
                fx = (l0 % 97).astype(jnp.float32)[:, None] / 97.0
                fy = (l0 % 89).astype(jnp.float32)[:, None] / 89.0
                fz = (l0 % 83).astype(jnp.float32)[:, None] / 83.0

                def corner(lin):
                    g = jnp.take(t, lin, axis=0, mode="clip")
                    v = (g[:, :cols].astype(jnp.float32)
                         + g[:, cols:].astype(jnp.float32))
                    return v[:, :half] * (1.0 - fx) + v[:, half:] * fx
                rz0 = corner(l0) * (1.0 - fy) + corner(l01) * fy
                rz1 = corner(l10) * (1.0 - fy) + corner(l11) * fy
                return (rz0 * (1.0 - fz) + rz1 * fz).sum()

            sec = _bench(f, tab, l00)
            r = {"rows": rows, "cols": cols, "dtype": "f16x2-comp",
                 "table_mib": round(rows * cols * 4 / 2**20, 2),
                 "window": None, "dist": "workload", "split": 1,
                 "sec": sec, "rows_per_s": 4 * N_IDX / sec,
                 "max_abs_err": err}
            print(f"WL rows={rows:>7} C={cols:>2} f16x2-comp "
                  f"{r['table_mib']:>7.2f} MiB -> "
                  f"{r['rows_per_s'] / 1e6:8.1f} M rows/s "
                  f"(max abs err {err:.2e})")
            return r

        for rows in [30_600, 33_150, 60_000, 120_000, 262_144,
                     330_000]:
            results.append(comp_cell(rows))
        # f32 direct at C=22 for a same-width baseline
        for rows in [30_600, 33_150, 120_000, 330_000]:
            results.append(run_workload_cell(rows, cols=22))
        if args.json:
            with open(args.json, "w") as f:
                json.dump({"n_idx": N_IDX,
                           "device": str(jax.devices()[0]),
                           "cells": results}, f, indent=1)
        return

    if args.phase5:
        results = []
        # exact f32 fused threshold: 2^15 rows?
        for rows in [32_000, 32_768, 32_769, 33_150]:
            results.append(run_workload_cell(rows))
        # f16 fused cliff: 2^16? 2^17? 2^18?
        for rows in [65_536, 65_537, 131_072, 131_073, 262_144,
                     330_000, 524_288]:
            results.append(run_workload_cell(rows, dtype=jnp.float16,
                                             label="f16-direct"))
        # bf16 for comparison (same itemsize, different lowering class?)
        for rows in [131_072, 262_144, 330_000]:
            results.append(run_workload_cell(rows, dtype=jnp.bfloat16,
                                             label="bf16-direct"))
        if args.json:
            with open(args.json, "w") as f:
                json.dump({"n_idx": N_IDX,
                           "device": str(jax.devices()[0]),
                           "cells": results}, f, indent=1)
        return

    if args.phase4:
        results = []
        for rows in [25_000, 30_600, 33_150, 40_000, 60_000, 120_000,
                     262_144, 330_000]:
            results.append(run_workload_cell(rows))
        # bit-split storage on the same fused shape
        for rows in [33_150, 60_000, 120_000, 330_000]:
            results.append(run_workload_cell(rows, split="u16",
                                             label="u16-split"))
        # f16 rows (the optimized config's existing lever) for scale
        for rows in [33_150, 60_000, 120_000]:
            results.append(run_workload_cell(rows, dtype=jnp.float16,
                                             label="f16-direct"))
        if args.json:
            with open(args.json, "w") as f:
                json.dump({"n_idx": N_IDX,
                           "device": str(jax.devices()[0]),
                           "cells": results}, f, indent=1)
        return

    if args.phase3:
        results = []
        for rows in [660_000, 1_000_000, 2_000_000]:
            r = run_cell(rows=rows, cols=11, dtype=jnp.float32)
            results.append(r)
            print(f"rows={rows:>7} C=11 float32  direct "
                  f"-> {r['rows_per_s'] / 1e6:8.1f} M rows/s")
        for rows in [330_000, 660_000, 1_000_000, 2_000_000]:
            results.append(run_u8_reconstruct(rows, 11))
        if args.json:
            with open(args.json, "w") as f:
                json.dump({"n_idx": N_IDX,
                           "device": str(jax.devices()[0]),
                           "cells": results}, f, indent=1)
        return

    results = []

    def cell(**kw):
        r = run_cell(**kw)
        results.append(r)
        print(f"rows={r['rows']:>7} C={r['cols']:>2} {r['dtype']:<8} "
              f"{r['table_mib']:>7.2f} MiB win={str(r['window']):>6} "
              f"{r['dist']:<7} split={r['split']} "
              f"-> {r['rows_per_s'] / 1e6:8.1f} M rows/s")
        return r

    if args.phase2:
        # threshold localisation: where exactly does f32 fall off?
        for rows in [120_000, 131_072, 131_073, 160_000, 200_000,
                     262_144, 262_145, 300_000, 330_000]:
            cell(rows=rows, cols=11, dtype=jnp.float32)
        # does bf16 cliff at 2x the f32 row threshold (rows*itemsize)?
        for rows in [330_000, 524_288, 524_289, 600_000, 1_000_000]:
            cell(rows=rows, cols=11, dtype=jnp.bfloat16)
        # 32-bit-wide or f32-specific?
        for rows in [120_000, 330_000]:
            cell(rows=rows, cols=11, dtype=jnp.int32)
        # 16-bit integer path (viability of exact f32 reconstruction)
        for rows in [330_000]:
            cell(rows=rows, cols=22, dtype=jnp.uint16)
            cell(rows=rows, cols=22, dtype=jnp.int16)
        # the real lever candidate: u16-pair storage + exact reconstruct
        for rows in [120_000, 330_000, 660_000]:
            results.append(run_u16_reconstruct(rows, 11))
        if args.json:
            with open(args.json, "w") as f:
                json.dump({"n_idx": N_IDX,
                           "device": str(jax.devices()[0]),
                           "cells": results}, f, indent=1)
            print(f"wrote {args.json}")
        return

    # --- 1. operand-size sweep at production row width (C=11 f32 = 44 B,
    # the bench table's packed width) -----------------------------------
    widths = [(11, jnp.float32)] if args.quick else [
        (11, jnp.float32), (4, jnp.float32), (22, jnp.float32),
        (11, jnp.bfloat16), (22, jnp.bfloat16)]
    row_counts = [16_000, 30_000, 33_000, 50_000, 120_000, 330_000]
    if args.quick:
        row_counts = [30_000, 33_000, 330_000]
    for cols, dt in widths:
        for rows in row_counts:
            cell(rows=rows, cols=cols, dtype=dt)

    # --- 2. window runs: big operand, small touched set -----------------
    for rows in ([330_000] if args.quick else [120_000, 330_000]):
        for window in [16_000, 30_000]:
            cell(rows=rows, cols=11, dtype=jnp.float32, window=window)

    # --- 3. locality: sorted indices ------------------------------------
    for rows in [30_000, 330_000]:
        cell(rows=rows, cols=11, dtype=jnp.float32, dist="sorted")

    # --- 4. split tables: operand sharded under the cliff ---------------
    if not args.quick:
        for rows in [66_000, 132_000, 330_000]:
            cell(rows=rows, cols=11, dtype=jnp.float32, split=2)
        cell(rows=330_000, cols=11, dtype=jnp.float32, split=4)
        cell(rows=330_000, cols=11, dtype=jnp.float32, split=8)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"n_idx": N_IDX, "device": str(jax.devices()[0]),
                       "cells": results}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
