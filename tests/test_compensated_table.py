"""Compensated f16 hi+lo packed-table storage (r5 gather-cliff lever).

``reader.packed_dtype = 'float16x2'`` stores the f32 packed table as
[hi | lo] float16 blocks (ops/interp.py CompensatedTable): same bytes as
f32, gathered with the cliff-free 16-bit XLA strategy, reconstructed by
one widen-add — measured 1.6-2.6x on post-2^15-row tables with ~2^-21
relative error.  These tests pin the representation error bound, every
sampler path, and end-to-end trajectory closeness vs f32 storage.
"""

from datetime import timedelta

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendrift_tpu.ops.interp import (PackedSampler, CompensatedTable,
                                      take_rows)


def _mk(rows, C, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(rows, C)) * scale,
                       dtype=jnp.float32)


class TestRepresentation:
    def _roundtrip(self, a):
        ct = CompensatedTable.from_array(a)
        C = a.shape[1]
        return np.asarray((ct.data[:, :C].astype(jnp.float32)
                           + ct.data[:, C:].astype(jnp.float32))
                          * ct.scale)

    def test_error_bound(self):
        # per-column power-of-two pre-scaling keeps ~2^-21 relative
        # accuracy across magnitudes (f16 alone would overflow the 1e5
        # column and lose the 1e-6 one to subnormals)
        for scale in (1e-6, 1e-3, 1.0, 1e3, 1e5):
            a = _mk(4000, 8, scale=scale)
            rec = self._roundtrip(a)
            err = np.abs(rec - np.asarray(a))
            bound = 4e-6 * np.abs(np.asarray(a)) \
                + 1e-8 * np.abs(np.asarray(a)).max()
            assert (err <= bound).all(), err.max()

    def test_mixed_magnitude_columns(self):
        # pressure-like (1e5), velocity-like (1), micro (1e-6) columns
        # side by side — per-column scaling isolates them
        rng = np.random.default_rng(9)
        a = jnp.asarray(np.stack(
            [rng.normal(1e5, 300.0, 2000),
             rng.normal(0.0, 1.0, 2000),
             rng.normal(0.0, 1e-6, 2000)], axis=1), dtype=jnp.float32)
        rec = self._roundtrip(a)
        for c, tol in ((0, 0.5), (1, 4e-6), (2, 4e-12)):
            assert np.max(np.abs(rec[:, c] - np.asarray(a)[:, c])) < tol

    def test_logical_shape_dtype(self):
        a = _mk(100, 6)
        ct = CompensatedTable.from_array(a)
        assert ct.shape == (100, 6)
        assert ct.dtype == jnp.float32
        assert ct.data.shape == (100, 12) and ct.data.dtype == jnp.float16

    def test_take_rows(self):
        a = _mk(3000, 10)
        ct = CompensatedTable.from_array(a)
        lin = jnp.asarray(
            np.random.default_rng(1).integers(0, 3000, 2048),
            dtype=jnp.int32)
        got = np.asarray(take_rows(ct, lin))
        want = np.asarray(take_rows(a, lin))
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7)

    def test_jit_pytree(self):
        a = _mk(500, 4)
        ct = CompensatedTable.from_array(a)
        lin = jnp.arange(64, dtype=jnp.int32) * 3

        @jax.jit
        def f(t, i):
            return take_rows(t, i).sum()

        assert np.allclose(float(f(ct, lin)),
                           float(jnp.take(a, lin, axis=0).sum()),
                           rtol=1e-5)


class TestSamplerPaths:
    @pytest.mark.parametrize("pair_mode", ["none", "x", "xy", "xyz"])
    def test_gather_rows(self, pair_mode):
        Z, Y, X, F = 3, 20, 25, 2
        k = {"none": 1, "x": 2, "xy": 4, "xyz": 8}[pair_mode]
        C = 2 * F * k + k
        col_of = {"u": (0, "3d"), "v": (F, "3d"), "mask": (2 * F, "near")}
        a = _mk(Z * Y * X, C, seed=2)
        ct = CompensatedTable.from_array(a)
        s = PackedSampler(Z, Y, X, F, col_of, pair_mode)
        rng = np.random.default_rng(3)
        N = 512
        xi = jnp.asarray(rng.uniform(0, X - 1, N), dtype=jnp.float32)
        yi = jnp.asarray(rng.uniform(0, Y - 1, N), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(0, 30, N), dtype=jnp.float32)
        depths = jnp.asarray([0.0, 10.0, 30.0])
        r32 = s.gather_rows(a, xi, yi, depth, depths)
        rct = s.gather_rows(ct, xi, yi, depth, depths)
        np.testing.assert_allclose(np.asarray(rct), np.asarray(r32),
                                   rtol=1e-5, atol=1e-6)

    def test_corner_block(self):
        Z, Y, X, F = 3, 20, 25, 2
        C = 2 * F * 2
        col_of = {"u": (0, "3d"), "v": (F, "3d")}
        a = _mk(Z * Y * X, C, seed=4)
        ct = CompensatedTable.from_array(a)
        s = PackedSampler(Z, Y, X, F, col_of, "x")
        rng = np.random.default_rng(5)
        N = 256
        xi = jnp.asarray(rng.uniform(0, X - 1, N), dtype=jnp.float32)
        yi = jnp.asarray(rng.uniform(0, Y - 1, N), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(0, 30, N), dtype=jnp.float32)
        depths = jnp.asarray([0.0, 10.0, 30.0])
        times = jnp.asarray([0.0, 3600.0])
        o32 = s.eval_corner_block(
            s.gather_corner_block(a, xi, yi, depth, depths),
            xi, yi, times, jnp.float32(1800.0), ["u", "v"])
        oct_ = s.eval_corner_block(
            s.gather_corner_block(ct, xi, yi, depth, depths),
            xi, yi, times, jnp.float32(1800.0), ["u", "v"])
        for v in ("u", "v"):
            np.testing.assert_allclose(np.asarray(oct_[v]),
                                       np.asarray(o32[v]),
                                       rtol=1e-5, atol=1e-6)


class TestAutoCompensate:
    def _reader(self, nz, **kw):
        from opendrift_tpu.fields.roms import ROMSReader, DEFAULT_DEPTHS
        nordic = ("/root/reference/tests/test_data/"
                  "2Feb2016_Nordic_sigma_3d/Nordic_subset.nc")
        r = ROMSReader(nordic, sampling="regrid",
                       target_depths=DEFAULT_DEPTHS[:nz], **kw)
        r.set_run_epoch(r.times[0])
        r.prepare(extent=None, start_time=r.times[0],
                  end_time=r.times[-1], max_speed=1.3)
        return r

    def test_small_table_stays_f32(self, monkeypatch):
        # the prepared test-grid table is tiny — far below 2^15 rows
        r = self._reader(12)
        ds = r.device_state(r.times[0], r.times[-1])
        assert not isinstance(ds["packed"], CompensatedTable)
        assert ds["packed"].dtype == jnp.float32

    def test_large_regrid_table_auto_compensates(self, monkeypatch):
        import opendrift_tpu.fields.grid as grid_mod
        monkeypatch.setattr(grid_mod, "GATHER_FAST_MAX_ROWS", 1000)
        r = self._reader(12)
        ds = r.device_state(r.times[0], r.times[-1])
        assert isinstance(ds["packed"], CompensatedTable)

    def test_explicit_dtype_wins(self, monkeypatch):
        import opendrift_tpu.fields.grid as grid_mod
        monkeypatch.setattr(grid_mod, "GATHER_FAST_MAX_ROWS", 1000)
        r = self._reader(12)
        r.packed_dtype = "float32"
        ds = r.device_state(r.times[0], r.times[-1])
        assert not isinstance(ds["packed"], CompensatedTable)
        assert ds["packed"].dtype == jnp.float32

    def test_xyz_tier_suppresses_auto(self, monkeypatch):
        # under the xyz row tier wide f32 rows measured NO cliff
        # penalty while compensated rows measured -43% — auto must not
        # engage there
        import opendrift_tpu.fields.grid as grid_mod
        monkeypatch.setattr(grid_mod, "GATHER_FAST_MAX_ROWS", 1000)
        r = self._reader(12)
        r.pair_hint = "xy"          # multi-fetch hint -> xyz (Z > 1)
        ds = r.device_state(r.times[0], r.times[-1])
        assert r._sampler.pair_mode == "xyz"
        assert not isinstance(ds["packed"], CompensatedTable)
        assert ds["packed"].dtype == jnp.float32


class TestEndToEnd:
    def test_roms_trajectories_close(self):
        """Full run with packed_dtype='float16x2' vs f32: trajectories
        within metres after 6 h (the representation error ~2^-21 is far
        below the forcing's own precision)."""
        from opendrift_tpu.models import OceanDrift
        from opendrift_tpu.fields.roms import ROMSReader

        nordic = ("/root/reference/tests/test_data/"
                  "2Feb2016_Nordic_sigma_3d/Nordic_subset.nc")
        results = {}
        for mode in ("float32", "float16x2"):
            o = OceanDrift(loglevel=40)
            r = ROMSReader(nordic, sampling="regrid")
            if mode != "float32":
                r.packed_dtype = mode
            o.add_reader(r)
            o.set_config("general:use_auto_landmask", False)
            o.set_config("drift:advection_scheme", "runge-kutta4")
            o.set_config("drift:horizontal_diffusivity", 0.0)
            rng = np.random.default_rng(0)
            o.seed_elements(lon=rng.uniform(13.0, 14.5, 200),
                            lat=rng.uniform(66.9, 67.8, 200),
                            z=rng.uniform(-20.0, 0.0, 200),
                            time=r.times[0])
            o.run(duration=timedelta(hours=6), time_step=900)
            results[mode] = (np.asarray(o.result["lon"])[:, -1],
                             np.asarray(o.result["lat"])[:, -1])
        lon32, lat32 = results["float32"]
        lonc, latc = results["float16x2"]
        ok = np.isfinite(lon32) & np.isfinite(lonc)
        assert ok.mean() > 0.8
        dist_m = np.hypot((lonc - lon32) * np.cos(np.radians(lat32))
                          * 111320.0,
                          (latc - lat32) * 111320.0)[ok]
        # 6 h of drift; ~1e-6-relative velocity error integrates to
        # well under a metre — allow slack for stranding bisection
        # divergence of borderline elements
        assert np.median(dist_m) < 5.0, np.median(dist_m)
        assert np.percentile(dist_m, 95) < 200.0, np.percentile(dist_m, 95)
