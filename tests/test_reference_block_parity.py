"""Parity against the reference's actual ``ReaderBlock.interpolate``
(interpolation/structured.py:107-163) — the hot kernel of the reference —
loaded standalone via tests/ref_loader.py.

Covers what the interpolator-level tests (test_reference_kernel_parity)
cannot: mixed 2D/3D variables in one fetch, landmask nearest special-case,
vertical profiles at block z-levels, and ensemble round-robin member
assignment (structured.py:120-134).
"""

import numpy as np
import pytest

from tests.ref_loader import load_reference_readerblock


@pytest.fixture(scope="module")
def refmod():
    mod = load_reference_readerblock()
    if mod is None:
        pytest.skip("reference source unavailable")
    return mod


def _make_data(rng, Z, Y, X, M=3):
    depths = np.array([0.0, 3.0, 10.0, 25.0])[:Z]
    data = {
        "sea_water_temperature":
            (10 + rng.standard_normal((Z, Y, X))).astype(np.float32),
        "x_sea_water_velocity":
            rng.standard_normal((Z, Y, X)).astype(np.float32) * 0.5,
        "sea_surface_height":
            rng.standard_normal((Y, X)).astype(np.float32) * 0.2,
        "land_binary_mask":
            (rng.uniform(size=(Y, X)) > 0.7).astype(np.float32),
    }
    members = [rng.standard_normal((Z, Y, X)).astype(np.float32) * 0.5
               for _ in range(M)]
    return depths, data, members


def _pack_ours(depths, data, members):
    """Our packed-row layout: per member, all vars' frames per cell in
    one row (ensemble members stacked along rows, fields/grid.py)."""
    Z = len(depths)
    Y, X = data["sea_surface_height"].shape
    M = len(members)
    cols = {}
    planes = []

    def add(name, arr, kind):
        cols[name] = (len(planes), kind)
        if arr.ndim == 2:
            arr = np.broadcast_to(arr, (Z, Y, X))
        planes.append(np.ascontiguousarray(arr, np.float32))

    add("sea_water_temperature", data["sea_water_temperature"], "t")
    add("x_sea_water_velocity", data["x_sea_water_velocity"], "t")
    add("sea_surface_height", data["sea_surface_height"], "static")
    add("land_binary_mask", data["land_binary_mask"], "near")
    packed_one = [np.stack(planes, axis=-1)]          # (Z, Y, X, C)
    base_c = len(planes)
    per_member = []
    for m in members:
        per_member.append(np.ascontiguousarray(m, np.float32))
    cols["y_sea_water_velocity"] = (base_c, "t")
    stacked = []
    for m in per_member:
        stacked.append(np.concatenate(
            [packed_one[0], m[..., None]], axis=-1).reshape(Z * Y * X, -1))
    return np.concatenate(stacked, axis=0), cols, Z, Y, X, M


def test_readerblock_parity(refmod):
    import jax.numpy as jnp
    from opendrift_tpu.ops.interp import PackedSampler

    rng = np.random.default_rng(7)
    Z, Y, X, M = 4, 24, 28, 3
    depths, data, members = _make_data(rng, Z, Y, X, M)

    N = 1200
    xi = rng.uniform(0, X - 1.001, N)
    yi = rng.uniform(0, Y - 1.001, N)
    zel = -rng.uniform(0.0, 25.0, N)   # element z, negative down

    # ---- reference: physical coords on an equidistant grid ----------
    dx, dy = 800.0, 600.0
    xgrid = 1000.0 + dx * np.arange(X)
    ygrid = 2000.0 + dy * np.arange(Y)
    ddict = {"x": xgrid, "y": ygrid, "z": -depths, "time": None}
    ddict.update({k: v.copy() for k, v in data.items()})
    ddict["y_sea_water_velocity"] = [m.copy() for m in members]
    block = refmod.ReaderBlock(ddict)
    env_ref, prof_ref = block.interpolate(
        xgrid[0] + xi * dx, ygrid[0] + yi * dy, zel.copy(),
        profiles=["sea_water_temperature"], profiles_depth=25.0)

    # ---- ours: fractional indices into the packed rows --------------
    packed, cols, *_ = _pack_ours(depths, data, members)
    F = 1
    sampler = PackedSampler(Z, Y, X, F, cols, "none")
    times = jnp.asarray([0.0])
    ids = np.arange(N)
    row_offset = jnp.asarray((ids % M) * (Z * Y * X), jnp.int32)
    ncol = cols["land_binary_mask"][0]
    rows, near = sampler.gather_rows(
        jnp.asarray(packed), jnp.asarray(xi, jnp.float32),
        jnp.asarray(yi, jnp.float32),
        jnp.asarray(np.maximum(-zel, 0.0), jnp.float32),
        jnp.asarray(depths, jnp.float32),
        row_offset=row_offset, nearest_cols=[ncol])
    ours = sampler.values(rows, times, jnp.float32(0.0),
                          ["sea_water_temperature", "x_sea_water_velocity",
                           "sea_surface_height", "y_sea_water_velocity"])

    # 3D trilinear vars (reference: per-layer bilinear + Linear1D)
    for v in ("sea_water_temperature", "x_sea_water_velocity"):
        assert np.allclose(np.asarray(ours[v]), env_ref[v], atol=1e-4), v
    # 2D static var
    assert np.allclose(np.asarray(ours["sea_surface_height"]),
                       env_ref["sea_surface_height"], atol=1e-5)
    # ensemble round-robin assignment (member = ID % M on both sides)
    assert np.allclose(np.asarray(ours["y_sea_water_velocity"]),
                       env_ref["y_sea_water_velocity"], atol=1e-4)

    # landmask: both sample nearest; compare where the reference's
    # len/(len-1) index scaling lands on the true nearest cell
    ours_mask = np.asarray(near[ncol])
    it = block.interpolator2d_nearest
    same = (np.round(xi) == it.xi) & (np.round(yi) == it.yi)
    assert same.mean() > 0.2
    assert (ours_mask[same] == env_ref["land_binary_mask"][same]).all()

    # profiles at the block's own z levels == reference profile matrix
    prof_ours = []
    for k in range(Z):
        depth_k = jnp.full((N,), float(depths[k]), jnp.float32)
        rows_k = sampler.gather_rows(
            jnp.asarray(packed), jnp.asarray(xi, jnp.float32),
            jnp.asarray(yi, jnp.float32), depth_k,
            jnp.asarray(depths, jnp.float32), row_offset=row_offset)
        prof_ours.append(np.asarray(sampler.values(
            rows_k, times, jnp.float32(0.0),
            ["sea_water_temperature"])["sea_water_temperature"]))
    prof_ours = np.stack(prof_ours)
    assert np.allclose(prof_ours, prof_ref["sea_water_temperature"],
                       atol=1e-4)
    assert np.allclose(np.atleast_1d(prof_ref["z"]), -depths)
