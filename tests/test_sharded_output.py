"""Sharded trajectory output: ShardWriter + tools/concat_shards must
reproduce the single-process writer's file bit-for-bit.

This is the suite-level proof promised by tools/concat_shards.py (the
2-process end-to-end variant lives in tools/multihost_dryrun.py); the
reference analogue is the per-worker NetCDF files concatenated post-hoc
in its multiprocessing recipe (reference
examples/example_long_multiprocessing.py:16-50).
"""

import os
from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.export.io_netcdf import (ShardWriter, write_result,
                                            read_result)


def _synthetic_run(T=6, n=6):
    """A hand-built raw frame stream with staggered release, mid-run
    deactivation and an ID permutation (slot migration)."""
    t0 = datetime(2021, 1, 1)
    frame_times = [t0 + i * timedelta(seconds=600) for i in range(T)]
    rng = np.random.default_rng(7)
    lon = rng.uniform(3.0, 5.0, (n, T)).astype(np.float32)
    lat = rng.uniform(59.0, 61.0, (n, T)).astype(np.float32)
    status = np.zeros((n, T), np.int32)
    status[1, :2] = -1          # element 2 releases at step 2
    status[2, 3:] = 2           # element 3 strands at step 3
    status[4, 1:] = 1           # element 5 retired from step 1
    status[5, :] = -1           # element 6 never releases
    frames = []
    for i in range(T):
        frames.append({
            "ID": np.arange(1, n + 1, dtype=np.int32),
            "status": status[:, i].copy(),
            "lon": lon[:, i].copy(),
            "lat": lat[:, i].copy(),
        })
    return frames, frame_times


def test_shard_concat_bit_identical(tmp_path):
    from tools.concat_shards import concat_shards

    T, n = 6, 6
    frames, frame_times = _synthetic_run(T, n)

    # ---- plain single-process artifact: the engine's own assembly
    o = OceanDrift(loglevel=40)
    o.time_step = timedelta(seconds=600)
    o.time_step_output = timedelta(seconds=600)
    result = o._assemble_result(frames, frame_times)
    plain = str(tmp_path / "plain.nc")
    write_result(result, plain)

    # ---- two shards of 3 slots each, with elements 3<->4 migrating
    # between the shards at step 3 (the ID variable is the scatter key)
    slots_by_step = {
        0: [[0, 2, 4], [1, 3, 5]],
        3: [[0, 3, 4], [1, 2, 5]],
    }
    shard_paths = []
    for pid in range(2):
        path = str(tmp_path / f"out.nc.p{pid:03d}.nc")
        shard_paths.append(path)
        w = ShardWriter(path, 3, n, pid, 2)
        local = []
        cur = slots_by_step[0][pid]
        for t, f in enumerate(frames):
            if t in slots_by_step:
                cur = slots_by_step[t][pid]
            local.append({k: v[cur] for k, v in f.items()})
        w.append(local, frame_times)
        w.finalize(result)      # attrs are identical on every shard

    merged = str(tmp_path / "merged.nc")
    concat_shards(shard_paths, merged)

    with open(merged, "rb") as a, open(plain, "rb") as b:
        assert a.read() == b.read(), \
            "merged shard file != single-process file (bit-for-bit)"

    # sanity on the content itself
    ds = read_result(merged)
    lon = ds["lon"].values
    st = ds["status"].values
    assert np.isnan(lon[5]).all()                 # never released
    assert np.isnan(lon[1, :2]).all() and np.isfinite(lon[1, 2:]).all()
    assert np.isfinite(lon[2, :4]).all() and np.isnan(lon[2, 4:]).all()
    assert st[2, 3] == 2
