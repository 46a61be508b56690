"""Eulerian convection-diffusion solver (reference parity:
opendrift/models/eulerdrift/simulation.py, tests/models/test_euler.py)."""

import numpy as np
import pytest

from opendrift_tpu.models.eulerdrift import EulerGrid, ExplSimulation


def test_grid_new():
    g = EulerGrid.new(10.0, 65.0, res=50.0, shape=(64, 64))
    assert g.field.shape == (64, 64)
    assert g.contains(10.01, 65.005)
    # grid lons/lats should bracket the origin corner
    assert abs(g.lons[0, 0] - 10.0) < 0.01
    assert abs(g.lats[0, 0] - 65.0) < 0.01


def test_gaussian_blob_mass_conserved_pure_diffusion():
    s = ExplSimulation.new(10.0, 65.0, res=20.0, shape=(96, 96), D=5.0)
    s.grid.source_gaussian_blob(10.02, 65.01, A=1.0, N=15, sigma=60.0)
    m0 = s.grid.total_mass()
    assert m0 > 0
    peak0 = float(np.max(np.asarray(s.grid.field)))
    s.integrate(dt=5.0, max_steps=100)
    f = np.asarray(s.grid.field)
    # diffusion spreads: peak drops, mass (away from boundaries) holds
    assert float(f.max()) < 0.7 * peak0
    assert abs(s.grid.total_mass() - m0) / m0 < 0.01
    assert np.all(np.isfinite(f))


def test_advection_moves_blob():
    s = ExplSimulation.new(10.0, 65.0, res=20.0, shape=(96, 96), D=0.5)
    s.readers.append(lambda lons, lats, t: (
        np.full(lons.shape, 0.5, np.float32),
        np.zeros(lons.shape, np.float32)))
    s.grid.source_gaussian_blob(10.02, 65.01, A=1.0, N=15, sigma=60.0)
    f0 = np.asarray(s.grid.field)
    cx0 = (f0.sum(axis=0) * np.arange(f0.shape[1])).sum() / f0.sum()
    s.integrate(dt=10.0, max_steps=60)  # 600 s * 0.5 m/s = 300 m = 15 px
    f = np.asarray(s.grid.field)
    cx = (f.sum(axis=0) * np.arange(f.shape[1])).sum() / f.sum()
    assert 10.0 < (cx - cx0) < 20.0


def test_stability_warns_on_large_dt(caplog):
    s = ExplSimulation.new(10.0, 65.0, res=10.0, shape=(32, 32), D=2.0)
    _, ddt = s.stability(1.0)
    assert ddt == pytest.approx(10.0 ** 2 / (2 * 2.0))
    s.grid.source_gaussian_blob(10.005, 65.002, N=9, sigma=30.0)
    import logging
    with caplog.at_level(logging.WARNING,
                         logger="opendrift_tpu.models.eulerdrift"):
        s.integrate(dt=ddt * 4, max_steps=2)
    assert any("dt too big" in r.message for r in caplog.records)


def test_snapshot_history():
    s = ExplSimulation.new(10.0, 65.0, res=20.0, shape=(48, 48), D=1.0)
    s.grid.source_gaussian_blob(10.02, 65.005, N=9, sigma=50.0)
    _, hist = s.integrate(dt=5.0, max_steps=20, store_every=5)
    assert hist.shape == (4, 48, 48)
    peaks = np.asarray(hist).max(axis=(1, 2))
    assert np.all(np.diff(peaks) < 0)  # monotone spreading
