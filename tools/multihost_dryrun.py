"""Two-process multi-host dry run on virtual CPU devices.

Validates the full multi-host code path without TPU pod hardware
(SURVEY.md §2.10; docs/parallel.md): two OS processes x 4 virtual CPU
devices each form one 8-device global mesh via
``jax.distributed.initialize`` (gloo CPU collectives standing in for
DCN), and both engine scaling modes run end to end:

  A. particle sharding — the full ``run()`` with
     ``parallel:particle_sharding`` over the global ``dp`` mesh;
  B. domain decomposition — the full ``run()`` with
     ``parallel:domain_decomposition``: forcing rows are read
     **per host** (grid.packed_rows — each process reads only the rows
     its devices own), halo-exchange and migration ppermutes cross the
     process boundary, snapshots are gathered, only process 0 owns the
     output file.

The parent also runs the identical configuration as ONE process with 8
virtual devices (the gold) and asserts both children reproduce it —
the same mesh must give the same trajectories no matter how many
processes it is cut into.

Usage:   python tools/multihost_dryrun.py            # parent: full check
         python tools/multihost_dryrun.py --gold     # single-process gold
         (children are spawned internally with --process-id/--num-processes)
"""

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEVS_PER_PROC = 4
NPROC = 2
STEPS = 12


def _child_env(port=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        f"{DEVS_PER_PROC}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if port is not None:
        env["OPENDRIFT_COORDINATOR"] = f"127.0.0.1:{port}"
        env["OPENDRIFT_NUM_PROCESSES"] = str(NPROC)
    return env


def _gold_env():
    env = _child_env()
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        f"{DEVS_PER_PROC * NPROC}")
    return env


def _run_modes():
    """Run both scaling modes; print one 'MODE <name> <checksum>' line
    each.  Identical host code in every process (and in the gold)."""
    from datetime import datetime, timedelta

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields import ArrayReader

    t0 = datetime(2021, 3, 1)

    def forcing(ny=96, nx=32):
        lon = np.linspace(2.0, 6.0, nx)
        lat = np.linspace(59.0, 60.2, ny)
        uu = np.full((2, ny, nx), 0.25, np.float32)
        vv = np.broadcast_to(
            np.linspace(0.2, 0.6, ny, dtype=np.float32)[None, :, None],
            (2, ny, nx)).copy()
        return ArrayReader(
            {"x_sea_water_velocity": uu, "y_sea_water_velocity": vv},
            x=lon, y=lat, times=[t0, t0 + timedelta(hours=48)])

    # domain2d: a 2 x 4 (Y x X) tile grid over the 2-process mesh — the
    # Y-axis halo/migration ppermutes cross the process boundary while
    # the X-axis ones stay intra-process
    for mode, key, tile_grid in (
            ("particle", "parallel:particle_sharding", None),
            ("domain", "parallel:domain_decomposition", None),
            ("domain2d", "parallel:domain_decomposition", "2x4")):
        o = OceanDrift(loglevel=50)
        o.set_config("environment:fallback:land_binary_mask", 0)
        o.set_config("drift:advection_scheme", "runge-kutta4")
        o.set_config("drift:vertical_advection", False)
        o.set_config("drift:stokes_drift", False)
        o.set_config("drift:vertical_mixing", False)
        o.set_config(key, True)
        if tile_grid:
            o.set_config("parallel:tile_grid", tile_grid)
            o.set_config("parallel:tile_capacity_factor", 8.0)
        o.add_reader(forcing())
        o.seed_elements(4.0, 59.3, number=64, radius=4000, time=t0)
        o.run(steps=STEPS, time_step=900)
        lon = np.asarray(o.result["lon"].values, np.float64)
        lat = np.asarray(o.result["lat"].values, np.float64)
        assert np.isfinite(lon).all() and np.isfinite(lat).all()
        print(f"MODE {mode} {np.nansum(lon) + np.nansum(lat):.6f}",
              flush=True)


def _run_output_checks():
    """Sharded trajectory output (VERDICT r2 #5): under
    ``OPENDRIFT_DRYRUN_OUTDIR``, run the same configuration twice per
    scaling mode — once with the plain gather-to-primary writer, once
    with ``export:sharded`` (every process writes its addressable
    slots) — so the parent can concat the shards and compare
    bit-for-bit against the plain file."""
    import os as _os
    outdir = _os.environ.get("OPENDRIFT_DRYRUN_OUTDIR")
    if not outdir:
        return
    from datetime import datetime, timedelta

    import numpy as np
    import jax
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields import ArrayReader

    t0 = datetime(2021, 3, 1)
    multi = jax.process_count() > 1
    tag = "mh" if multi else "gold"

    def forcing(ny=96, nx=32):
        lon = np.linspace(2.0, 6.0, nx)
        lat = np.linspace(59.0, 60.2, ny)
        uu = np.full((2, ny, nx), 0.25, np.float32)
        vv = np.broadcast_to(
            np.linspace(0.2, 0.6, ny, dtype=np.float32)[None, :, None],
            (2, ny, nx)).copy()
        return ArrayReader(
            {"x_sea_water_velocity": uu, "y_sea_water_velocity": vv},
            x=lon, y=lat, times=[t0, t0 + timedelta(hours=48)])

    for mode, key in (("particle", "parallel:particle_sharding"),
                      ("domain", "parallel:domain_decomposition")):
        for sharded in ((False, True) if multi else (False,)):
            o = OceanDrift(loglevel=50)
            o.set_config("environment:fallback:land_binary_mask", 0)
            o.set_config("drift:advection_scheme", "runge-kutta4")
            o.set_config("drift:vertical_advection", False)
            o.set_config("drift:stokes_drift", False)
            o.set_config("drift:vertical_mixing", False)
            o.set_config(key, True)
            if sharded:
                o.set_config("export:sharded", True)
            o.add_reader(forcing())
            # MH_DRYRUN_N: scale knob — the default keeps the driver's
            # per-round dryrun fast; the credible-scale DD coverage
            # (100k x 50 steps) lives in tests/test_engine_dd.py
            n_el = int(_os.environ.get("MH_DRYRUN_N", "2000"))
            o.seed_elements(4.0, 59.3, number=n_el, radius=4000, time=t0)
            suffix = "sharded" if sharded else "plain"
            o.run(steps=STEPS, time_step=900,
                  outfile=_os.path.join(outdir,
                                        f"{tag}_{mode}_{suffix}.nc"))
            print(f"OUTPUT {tag} {mode} {suffix} written", flush=True)


def child_main(process_id, num_processes):
    from opendrift_tpu.parallel import multihost
    multihost.initialize(num_processes=num_processes,
                         process_id=process_id)
    import jax
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == DEVS_PER_PROC * num_processes, \
        f"expected {DEVS_PER_PROC * num_processes} global devices, " \
        f"got {len(jax.devices())}"
    _run_modes()
    _run_output_checks()
    multihost.sync("dryrun-done")
    print("CHILD OK", flush=True)


def _checksums(stdout):
    out = {}
    for line in stdout.splitlines():
        if line.startswith("MODE "):
            _, mode, val = line.split()
            out[mode] = float(val)
    return out


def parent_main():
    import tempfile

    with socket.socket() as s:      # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    outdir = tempfile.mkdtemp(prefix="od_dryrun_out_")
    os.environ["OPENDRIFT_DRYRUN_OUTDIR"] = outdir

    gold = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--gold"],
        env=_gold_env(), capture_output=True, text=True, timeout=900)
    if gold.returncode != 0:
        sys.stderr.write(gold.stdout + gold.stderr)
        raise SystemExit("gold run failed")
    gold_sums = _checksums(gold.stdout)
    print(f"gold (1 process x {DEVS_PER_PROC * NPROC} devices):",
          gold_sums, flush=True)

    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--process-id", str(i), "--num-processes", str(NPROC)],
        env=_child_env(port), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(NPROC)]
    outs = []
    failed = False
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            failed = True
        outs.append((out, err))
        if p.returncode != 0:
            failed = True
    if failed:
        for i, (out, err) in enumerate(outs):
            sys.stderr.write(f"--- process {i} stdout ---\n{out}\n"
                             f"--- process {i} stderr ---\n{err}\n")
        raise SystemExit("multi-host child failed")

    for i, (out, _) in enumerate(outs):
        sums = _checksums(out)
        print(f"process {i} ({NPROC} processes x {DEVS_PER_PROC} "
              f"devices):", sums, flush=True)
        for mode, g in gold_sums.items():
            assert mode in sums, f"process {i} missing mode {mode}"
            rel = abs(sums[mode] - g) / max(abs(g), 1.0)
            assert rel < 1e-5, \
                (f"mode {mode}: process {i} checksum {sums[mode]} != "
                 f"gold {g} (rel {rel:.2e})")
    # ---- sharded-output check: concat the per-process shards and
    # compare BIT-FOR-BIT with the plain (gather-to-primary) file of
    # the identical 2-process run, and allclose with the 1-process gold
    import glob as _glob

    import numpy as np
    sys.path.insert(0, REPO)
    from tools.concat_shards import concat_shards
    from opendrift_tpu.export.io_netcdf import read_result

    for mode in ("particle", "domain"):
        shards = sorted(_glob.glob(
            os.path.join(outdir, f"mh_{mode}_sharded.nc.p*.nc")))
        assert len(shards) == NPROC, \
            f"expected {NPROC} shards for {mode}, found {shards}"
        merged = os.path.join(outdir, f"merged_{mode}.nc")
        concat_shards(shards, merged)
        plain = os.path.join(outdir, f"mh_{mode}_plain.nc")
        with open(merged, "rb") as a, open(plain, "rb") as b:
            if a.read() == b.read():
                print(f"SHARDS {mode}: merged == plain (bit-for-bit)",
                      flush=True)
            else:
                rm = read_result(merged)
                rp = read_result(plain)
                for name in rp.variables:
                    np.testing.assert_array_equal(
                        rm.variables[name].values,
                        rp.variables[name].values, err_msg=name)
                raise SystemExit(
                    f"SHARDS {mode}: data identical but file bytes "
                    f"differ — attr/layout drift between ShardWriter "
                    f"and write_result")
        gold_file = os.path.join(outdir, f"gold_{mode}_plain.nc")
        rm = read_result(merged)
        rg = read_result(gold_file)
        np.testing.assert_allclose(
            rm.variables["lon"].values, rg.variables["lon"].values,
            atol=2e-5, err_msg=f"{mode}: merged vs 1-process gold")
    print("SHARDED OUTPUT OK (concat(p*.nc) == plain multi-host file, "
          "allclose vs 1-process gold)")
    print(f"MULTIHOST DRYRUN OK ({NPROC} processes x {DEVS_PER_PROC} "
          f"devices == 1 process x {DEVS_PER_PROC * NPROC} devices)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--gold", action="store_true")
    args = ap.parse_args()
    if args.gold:
        import jax
        jax.config.update("jax_platforms", "cpu")
        _run_modes()
        _run_output_checks()
    elif args.process_id is not None:
        child_main(args.process_id, args.num_processes)
    else:
        parent_main()
