"""Fused space-time interpolation kernel vs scipy reference.

Mirrors the reference's interpolator cross-checks
(reference: tests/readers/test_interpolation.py:285-330).
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.interpolate import RegularGridInterpolator

from opendrift_tpu.ops.interp import (interp_xyzt, interp_nearest_xyt,
                                      fill_invalid, fill_towards_seafloor)


def test_trilinear_time_blend_matches_scipy():
    rng = np.random.RandomState(0)
    F, Z, Y, X = 3, 5, 12, 17
    depths = np.array([0.0, 3.0, 10.0, 25.0, 50.0], dtype=np.float32)
    times = np.array([0.0, 3600.0, 7200.0], dtype=np.float32)
    block = rng.randn(2, F, Z, Y, X).astype(np.float32)

    N = 200
    xi = rng.uniform(0, X - 1, N).astype(np.float32)
    yi = rng.uniform(0, Y - 1, N).astype(np.float32)
    depth = rng.uniform(0, 50, N).astype(np.float32)
    t = np.float32(5000.0)

    out = jax.jit(interp_xyzt)(jnp.asarray(block), jnp.asarray(times),
                               jnp.asarray(xi), jnp.asarray(yi),
                               jnp.asarray(depth), jnp.asarray(depths), t)
    out = np.asarray(out)

    for v in range(2):
        ref = RegularGridInterpolator(
            (times, depths, np.arange(Y), np.arange(X)), block[v],
            method="linear")
        pts = np.column_stack([np.full(N, t), depth, yi, xi])
        np.testing.assert_allclose(out[v], ref(pts), rtol=2e-5, atol=2e-5)


def test_time_clamping():
    """Times outside the window clamp to the edge frames."""
    block = np.zeros((1, 2, 1, 4, 4), dtype=np.float32)
    block[0, 0] = 1.0
    block[0, 1] = 3.0
    times = np.array([0.0, 100.0], dtype=np.float32)
    depths = np.array([0.0], dtype=np.float32)
    xi = jnp.asarray([1.5])
    f = jax.jit(interp_xyzt)
    before = f(jnp.asarray(block), jnp.asarray(times), xi, xi,
               jnp.asarray([0.0]), jnp.asarray(depths), jnp.float32(-50.0))
    after = f(jnp.asarray(block), jnp.asarray(times), xi, xi,
              jnp.asarray([0.0]), jnp.asarray(depths), jnp.float32(150.0))
    mid = f(jnp.asarray(block), jnp.asarray(times), xi, xi,
            jnp.asarray([0.0]), jnp.asarray(depths), jnp.float32(50.0))
    assert float(before[0, 0]) == 1.0
    assert float(after[0, 0]) == 3.0
    assert abs(float(mid[0, 0]) - 2.0) < 1e-6


def test_depth_below_deepest_extrapolates_constant():
    block = np.zeros((1, 2, 3, 4, 4), dtype=np.float32)
    block[0, :, 0] = 1.0
    block[0, :, 1] = 2.0
    block[0, :, 2] = 5.0
    times = np.array([0.0, 100.0], dtype=np.float32)
    depths = np.array([0.0, 10.0, 20.0], dtype=np.float32)
    xi = jnp.asarray([1.0])
    out = jax.jit(interp_xyzt)(
        jnp.asarray(block), jnp.asarray(times), xi, xi,
        jnp.asarray([500.0]), jnp.asarray(depths), jnp.float32(0.0))
    assert float(out[0, 0]) == 5.0  # clamped to deepest level


def test_nearest_kernel():
    block = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    times = np.array([0.0], dtype=np.float32)
    out = jax.jit(interp_nearest_xyt)(
        jnp.asarray(block), jnp.asarray(times),
        jnp.asarray([2.4, 2.6]), jnp.asarray([1.4, 1.6]),
        jnp.float32(0.0))
    assert out[0, 0] == 4 * 1 + 2      # round(2.4)=2, round(1.4)=1
    assert out[0, 1] == 4 * 2 + 3      # round(2.6)=3, round(1.6)=2


def test_fill_invalid_nearest():
    a = np.full((5, 5), np.nan, dtype=np.float32)
    a[2, 2] = 7.0
    filled, ok = fill_invalid(a)
    assert ok
    assert (filled == 7.0).all()


def test_fill_towards_seafloor():
    a = np.ones((3, 2, 2), dtype=np.float32)
    a[1:, 0, 0] = np.nan
    out = fill_towards_seafloor(a)
    assert out[2, 0, 0] == 1.0
    assert np.isfinite(out).all()


def test_packed_sampler_pair_modes_agree():
    """'none', 'x' and 'xy' neighbour-packing tiers give identical
    samples (xy is opt-in via $OPENDRIFT_XY_PAIR; this exercises the
    kernel directly)."""
    import numpy as np
    import jax.numpy as jnp
    from opendrift_tpu.ops.interp import PackedSampler
    rng = np.random.default_rng(5)
    Z, Y, X, F = 4, 20, 25, 2
    n_vars = 3
    C = n_vars * F
    base = rng.standard_normal((Z, Y, X, C)).astype(np.float32)

    def build(mode):
        if mode == "none":
            p = base
        else:
            sx = np.concatenate([base[:, :, 1:], base[:, :, -1:]],
                                axis=2)
            variants = [base, sx]
            if mode == "xy":
                sy = np.concatenate([base[:, 1:], base[:, -1:]], axis=1)
                sxy = np.concatenate([sy[:, :, 1:], sy[:, :, -1:]],
                                     axis=2)
                variants += [sy, sxy]
            p = np.concatenate(variants, axis=3)
        return jnp.asarray(p.reshape(Z * Y * X, -1))

    N = 500
    xi = jnp.asarray(rng.uniform(0, X - 1.01, N).astype(np.float32))
    yi = jnp.asarray(rng.uniform(0, Y - 1.01, N).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0, 25, N).astype(np.float32))
    depths = jnp.asarray(np.linspace(0, 30, Z).astype(np.float32))
    col_of = {f"v{i}": (i * F, "t") for i in range(n_vars)}
    times = jnp.asarray([0.0, 3600.0])

    results = {}
    for mode in ("none", "x", "xy"):
        s = PackedSampler(Z, Y, X, F, col_of, mode)
        rows = s.gather_rows(build(mode), xi, yi, depth, depths)
        results[mode] = s.values(rows, times, jnp.float32(1200.0),
                                 list(col_of))
    for v in col_of:
        a = np.asarray(results["none"][v])
        assert np.allclose(a, np.asarray(results["x"][v]), atol=1e-5)
        assert np.allclose(a, np.asarray(results["xy"][v]), atol=1e-5)


def test_half_precision_packed_rows():
    """Opt-in float16 packed rows stay within ~1e-3 relative of the f32
    sampling path (gathers are random-access-bandwidth bound on TPU;
    f16 halves the bytes)."""
    import numpy as np
    import jax.numpy as jnp
    from opendrift_tpu.fields.roms import ROMSReader

    path = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
            "Nordic_subset.nc")
    import os
    import pytest
    if not os.path.exists(path):
        pytest.skip("reference test data unavailable")

    rng = np.random.default_rng(1)
    lon = jnp.asarray(rng.uniform(13.0, 14.5, 500), jnp.float32)
    lat = jnp.asarray(rng.uniform(66.9, 67.8, 500), jnp.float32)
    z = jnp.asarray(-rng.uniform(0, 20, 500), jnp.float32)

    out = {}
    for dtype in ("float32", "float16"):
        r = ROMSReader(path)
        r.packed_dtype = dtype
        r.set_run_epoch(r.times[0])
        r.prepare()
        ds = r.device_state()
        assert ds["packed"].dtype == jnp.dtype(dtype)
        vals, covers = r.sample(
            ds, ["x_sea_water_velocity", "y_sea_water_velocity",
                 "sea_floor_depth_below_sea_level"],
            jnp.float32(1800.0), lon, lat, z)
        out[dtype] = {k: np.asarray(v) for k, v in vals.items()}
        # the box straddles the rotated grid's hull corner: device
        # coverage (raster inside-mask) agrees with the host's exact
        # hull test except a <=2% band at the hull edge
        exp = r.covers_positions(np.asarray(lon), np.asarray(lat))
        assert (np.asarray(covers) != exp).sum() <= 10
        assert np.asarray(covers).sum() > 420

    for k in out["float32"]:
        a, b = out["float32"][k], out["float16"][k]
        scale = max(np.nanmax(np.abs(a)), 1e-6)
        assert np.nanmax(np.abs(a - b)) / scale < 2e-3, k
