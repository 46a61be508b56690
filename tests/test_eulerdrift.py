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


def test_constant_reader_layer():
    """Eulerdrift reader interface (reference eulerdrift/readers.py):
    ConstantReader.new_xy forcing advects the blob like the callable."""
    from opendrift_tpu.models.eulerdrift import ConstantReader

    sim = ExplSimulation.new(lon0=5.0, lat0=60.0, res=10.0,
                             shape=(80, 80), D=0.05)
    r = ConstantReader.new_xy(x=0.5, y=0.0)
    assert set(r.variables()) == {"x_sea_water_velocity",
                                  "y_sea_water_velocity"}
    sim.readers.append(r)
    lon_c, lat_c = sim.grid.crs.inv(np, sim.grid.x[40], sim.grid.y[40])
    sim.grid.source_gaussian_blob(float(lon_c), float(lat_c), A=1.0,
                                  N=11, sigma=30.0)
    c0 = np.asarray(sim.grid.field)
    sim.integrate(dt=2.0, max_steps=100)
    c1 = np.asarray(sim.grid.field)
    # centre of mass moved east by ~u*t = 100 m = 10 cells
    x_com0 = (c0.sum(0) * np.arange(80)).sum() / c0.sum()
    x_com1 = (c1.sum(0) * np.arange(80)).sum() / c1.sum()
    assert 8.0 < (x_com1 - x_com0) < 12.0


def test_opendrift_reader_wraps_field_reader():
    """OpendriftReader adapter (reference eulerdrift/readers.py:65):
    samples an opendrift_tpu structured reader onto the Euler grid."""
    from datetime import datetime, timedelta
    from opendrift_tpu.models.eulerdrift import OpendriftReader
    from opendrift_tpu.fields import ArrayReader

    t0 = datetime(2021, 1, 1)
    ny = nx = 16
    uu = np.full((2, ny, nx), 0.3, np.float32)
    vv = np.full((2, ny, nx), -0.2, np.float32)
    fr = ArrayReader({"x_sea_water_velocity": uu,
                      "y_sea_water_velocity": vv},
                     x=np.linspace(4.0, 6.0, nx),
                     y=np.linspace(59.5, 60.5, ny),
                     times=[t0, t0 + timedelta(hours=6)])
    sim = ExplSimulation.new(lon0=4.8, lat0=59.9, res=50.0,
                             shape=(24, 24), D=0.05, t0=t0)
    sim.readers.append(OpendriftReader(fr))
    u, v = sim._sample_uv(t0)
    assert u.shape == (24, 24)
    np.testing.assert_allclose(u, 0.3, atol=1e-5)
    np.testing.assert_allclose(v, -0.2, atol=1e-5)


def test_grid_helpers():
    from opendrift_tpu.models.eulerdrift import vec_nearest, grad2d

    g = EulerGrid.new(lon0=5.0, lat0=60.0, res=10.0, shape=(40, 40))
    lon_c, lat_c = g.center()
    assert abs(lon_c - 5.0) < 0.1 and abs(lat_c - 60.0) < 0.1
    assert vec_nearest(np.array([0.0, 1.0, 2.0]), 1.2)[0] == 1
    f = np.zeros((9, 9)); f[4, 4] = 1.0
    gy, gx = grad2d(f, 1.0, 1.0)
    assert gy[3, 4] > 0 and gy[5, 4] < 0     # derivative across the peak
    assert gx[4, 3] > 0 and gx[4, 5] < 0
