"""Domain decomposition: halo exchange correctness and migration
conservation on an 8-device virtual mesh (the multi-node test strategy
mandated by SURVEY.md §4: single- vs multi-chip consistency, halo
correctness vs single-device gold run, migration count/ID invariance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from opendrift_tpu.parallel.domain import (
    TiledGrid, make_tiled_stepper, assign_particles_to_tiles,
    gather_particles)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), axis_names=("tiles",))


def _make_field(ny=64, nx=32):
    """Rotating/shear flow on a [0, nx*dx] x [0, ny*dy] metre grid."""
    dy = dx = 100.0
    y, x = np.mgrid[0:ny, 0:nx]
    u = 0.5 + 0.3 * np.sin(2 * np.pi * y / ny)      # m/s, varies with y
    v = 0.8 * np.cos(2 * np.pi * x / nx)            # strong cross-tile flow
    blocks = np.stack([u, v]).astype(np.float32)[:, None]  # (2, F=1, Y, X)
    return blocks, 0.0, dy, 0.0, dx


def _single_device_truth(blocks, x, y, dt, nsteps, dy, dx):
    """Reference integration on the undecomposed grid (numpy)."""
    u = blocks[0, 0]
    v = blocks[1, 0]
    ny, nx = u.shape
    x = x.copy()
    y = y.copy()
    for _ in range(nsteps):
        xi = np.clip(x / dx, 0, nx - 1.001)
        yi = np.clip(y / dy, 0, ny - 1.001)
        x0 = np.floor(xi).astype(int)
        y0 = np.floor(yi).astype(int)
        fx = xi - x0
        fy = yi - y0
        def bil(f):
            return (f[y0, x0] * (1 - fy) * (1 - fx)
                    + f[y0, x0 + 1] * (1 - fy) * fx
                    + f[y0 + 1, x0] * fy * (1 - fx)
                    + f[y0 + 1, x0 + 1] * fy * fx)
        x = x + bil(u) * dt
        y = y + bil(v) * dt
    return x, y


def test_halo_trajectories_match_single_device():
    """Tiled run with halo exchange reproduces the single-grid result."""
    mesh = _mesh(8)
    blocks, y0, dy, x0, dx = _make_field()
    dt = 30.0
    nsteps = 40
    # halo must cover per-interval drift: ~1 m/s * 30 s / 100 m << 1 row;
    # use 3 rows for safety (speed*dt/dy + 2 rule)
    grid = TiledGrid(blocks, [0.0], y0, dy, x0, dx, n_tiles=8, halo=3)

    rng = np.random.RandomState(1)
    N = 300
    px = rng.uniform(200, 2800, N).astype(np.float32)
    py = rng.uniform(200, 6000, N).astype(np.float32)

    p = assign_particles_to_tiles(px, py, grid, cap=256)
    p = {k: jnp.asarray(v) for k, v in p.items()}
    core, times = grid.device_arrays(mesh)
    advance = make_tiled_stepper(grid, mesh, dt, n_substeps=nsteps,
                                 max_leavers=64)
    p = advance(core, times, p, jnp.float32(0.0))
    got_x, got_y = gather_particles(jax.device_get(p))

    want_x, want_y = _single_device_truth(blocks, px.astype(np.float64),
                                          py.astype(np.float64), dt,
                                          nsteps, dy, dx)
    # all particles survive
    assert np.isfinite(got_x).all()
    np.testing.assert_allclose(got_x, want_x, atol=0.5)
    np.testing.assert_allclose(got_y, want_y, atol=0.5)


def test_migration_conserves_particles():
    """Strong cross-tile flow: every particle ID survives exactly once."""
    mesh = _mesh(8)
    blocks, y0, dy, x0, dx = _make_field()
    # make v uniformly strong so everything streams across tiles
    blocks[1] = 1.5
    grid = TiledGrid(blocks, [0.0], y0, dy, x0, dx, n_tiles=8, halo=3)
    N = 200
    rng = np.random.RandomState(2)
    px = rng.uniform(100, 3000, N).astype(np.float32)
    py = rng.uniform(100, 1000, N).astype(np.float32)
    p = assign_particles_to_tiles(px, py, grid, cap=300)
    p = {k: jnp.asarray(v) for k, v in p.items()}
    core, times = grid.device_arrays(mesh)
    advance = make_tiled_stepper(grid, mesh, dt=30.0, n_substeps=60,
                                 max_leavers=64)
    p = advance(core, times, p, jnp.float32(0.0))
    ph = jax.device_get(p)
    pid = np.asarray(ph["pid"])[np.asarray(ph["alive"])]
    assert len(pid) == N                       # none lost, none duplicated
    assert sorted(pid.tolist()) == list(range(N))
    # uniform 1.5 m/s for 1800 s moves everything ~2700 m north: from
    # tiles 0-1 into tiles 3-4 (tile height 800 m)
    per_tile = np.asarray(ph["alive"]).sum(axis=1)
    assert per_tile[0] == 0 and per_tile[1] == 0
    assert per_tile[3] + per_tile[4] == N


def test_determinism_across_runs():
    mesh = _mesh(8)
    blocks, y0, dy, x0, dx = _make_field()
    grid = TiledGrid(blocks, [0.0], y0, dy, x0, dx, n_tiles=8, halo=3)
    px = np.linspace(300, 2800, 50).astype(np.float32)
    py = np.linspace(300, 6000, 50).astype(np.float32)
    outs = []
    for _ in range(2):
        p = assign_particles_to_tiles(px, py, grid, cap=128)
        p = {k: jnp.asarray(v) for k, v in p.items()}
        core, times = grid.device_arrays(mesh)
        advance = make_tiled_stepper(grid, mesh, 30.0, 30, 32)
        p = advance(core, times, p, jnp.float32(0.0))
        outs.append(gather_particles(jax.device_get(p)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_full_run_sharded_bit_identical():
    """Public run() with parallel:particle_sharding over the virtual
    8-device mesh gives bit-identical trajectories to the unsharded run
    (the zero-collective DP axis; README claim)."""
    import numpy as np
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields import DoubleGyre

    def run(sharded):
        o = OceanDrift(loglevel=40)
        o.set_config("environment:fallback:land_binary_mask", 0)
        o.set_config("drift:advection_scheme", "runge-kutta4")
        o.set_config("drift:horizontal_diffusivity", 5.0)
        o.set_config("parallel:particle_sharding", sharded)
        dg = DoubleGyre(epsilon=0.25, omega=0.628, A=0.1)
        o.add_reader(dg)
        lon, lat = dg.xy2lonlat([0.9], [0.5])
        o.seed_elements(lon, lat, radius=0.1, number=2048,
                        time=dg.initial_time)
        o.run(duration=timedelta(seconds=5), time_step=0.5)
        return (np.asarray(o.result["lon"]),
                np.asarray(o.result["lat"]))

    lon_s, lat_s = run(True)
    lon_u, lat_u = run(False)
    assert np.array_equal(lon_s, lon_u, equal_nan=True)
    assert np.array_equal(lat_s, lat_u, equal_nan=True)
