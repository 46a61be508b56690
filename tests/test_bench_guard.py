"""bench.py failure surfacing: a dead or regressed secondary workload
must be visible in the JSON line (VERDICT r4 weak #2 — the r4 Pallas TPU
crash shipped as a silently-absent extra metric with rc=0).

Workload functions are stubbed so the guard logic runs in milliseconds
on CPU; the real workloads are exercised by the driver's bench run.
"""

import io
import json
import contextlib

import pytest

import bench


@pytest.fixture
def run_bench(monkeypatch, tmp_path):
    def _run(mixing_raises=False, mixing_rate=2.8e9, lkg=None):
        rates = {False: 2.0e7, True: 1.0e8}
        _opt = []

        def fake_build(optimized, n=bench.N_GRID):
            _opt.append(optimized)
            return None

        def fake_steady(o, n, steps, dt=900.0, K=10):
            # o is None; n distinguishes the 10M workload
            return 2.0e7 if n >= 10_000_000 else rates[_opt.pop(0)]

        monkeypatch.setattr(bench, "_build_grid_sim", fake_build)
        monkeypatch.setattr(bench, "_steady_rate", fake_steady)

        def fake_mixing():
            if mixing_raises:
                raise RuntimeError("Unsupported cast: float32 -> uint32")
            return mixing_rate
        monkeypatch.setattr(bench, "_mixing_rate", fake_mixing)

        if lkg is not None:
            lkg_file = tmp_path / "BENCH_LKG.json"
            lkg_file.write_text(json.dumps(lkg))
            monkeypatch.setattr(bench.os.path, "join",
                                lambda *a: str(lkg_file)
                                if a[-1] == "BENCH_LKG.json"
                                else "/".join(a))

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
        return json.loads(buf.getvalue().strip().splitlines()[-1])
    return _run


LKG = {"primary": 2.0e7,
       "extras": {"optimized": 1.0e8, "10m": 2.0e7, "mixing": 2.8e9}}


def test_all_green(run_bench):
    out = run_bench(lkg=LKG)
    assert out["failed_workloads"] == []
    assert "extra_metric_warnings" not in out
    assert {m["id"] for m in out["extra_metrics"]} == \
        {"optimized", "10m", "mixing"}


def test_crashed_workload_is_recorded(run_bench):
    out = run_bench(mixing_raises=True, lkg=LKG)
    assert any("mixing" in f and "Unsupported cast" in f
               for f in out["failed_workloads"])
    # AND the vanished metric is flagged against last-known-good
    assert any("'mixing' MISSING" in w
               for w in out["extra_metric_warnings"])


def test_regressed_extra_is_flagged(run_bench):
    out = run_bench(mixing_rate=2.0e9, lkg=LKG)   # -29% vs LKG
    assert out["failed_workloads"] == []
    assert any("'mixing'" in w and "below" in w
               for w in out["extra_metric_warnings"])
