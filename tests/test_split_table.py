"""Bit-split packed-table storage (gather-cliff lever, r5).

Tables whose column-bytes (rows x itemsize) cross the ~1 MiB XLA
gather-placement cliff are stored bit-split into u16/u8 columns and
reassembled after the take (ops/interp.py SplitTable) — measured 1.57x
on the 330k-row Nordic native raster.  These tests pin (a) the tier
selection, (b) bit-exactness of every sampler path under forced
splitting, (c) pytree transparency under jit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendrift_tpu.ops.interp import (PackedSampler, SplitTable,
                                      maybe_split_table, take_rows)


def _mk(rows, C, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(rows, C)).astype(np.float32)
    return jnp.asarray(a, dtype=dtype)


class TestTierSelection:
    def test_small_table_untouched(self):
        a = _mk(1000, 8)
        assert maybe_split_table(a) is a

    def test_u16_band(self):
        # rows*4 >= 1 MiB but rows*2 still under -> u16 pairs
        a = _mk(262_144, 4)
        st = maybe_split_table(a)
        assert isinstance(st, SplitTable)
        assert st.data.dtype == jnp.uint16 and st.factor == 2
        assert st.shape == a.shape and st.dtype == a.dtype

    def test_u8_band(self):
        # rows*2 over 1 MiB, rows under the measured u8 crossover -> u8
        a = _mk(600_000, 2)
        st = maybe_split_table(a)
        assert isinstance(st, SplitTable)
        assert st.data.dtype == jnp.uint8 and st.factor == 4

    def test_huge_table_untouched(self):
        a = _mk(1_000_000, 2)
        assert maybe_split_table(a) is a

    def test_escape_hatch(self, monkeypatch):
        monkeypatch.setenv("OPENDRIFT_NO_SPLIT_TABLE", "1")
        a = _mk(262_144, 4)
        assert maybe_split_table(a) is a

    def test_f16_u8_band(self):
        a = _mk(600_000, 2, dtype=jnp.float16)
        st = maybe_split_table(a)
        assert isinstance(st, SplitTable)
        assert st.data.dtype == jnp.uint8 and st.factor == 2
        assert st.dtype == jnp.float16


class TestBitExact:
    @pytest.mark.parametrize("force", ["u16", "u8"])
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float16])
    def test_take_rows(self, force, dtype):
        a = _mk(5000, 12, dtype=dtype)
        if force == "u8" and dtype == jnp.float16:
            pass  # u8x2 path
        st = maybe_split_table(a, force=force)
        lin = jnp.asarray(
            np.random.default_rng(1).integers(-3, 5100, 4096),
            dtype=jnp.int32)
        direct = take_rows(a, lin)
        split = take_rows(st, lin)
        assert split.dtype == direct.dtype
        np.testing.assert_array_equal(
            np.asarray(direct, dtype=np.float32),
            np.asarray(split, dtype=np.float32))

    @pytest.mark.parametrize("pair_mode", ["none", "x", "xy", "xyz"])
    @pytest.mark.parametrize("force", ["u16", "u8"])
    def test_gather_rows_paths(self, pair_mode, force):
        Z, Y, X, F = 3, 20, 25, 2
        k = {"none": 1, "x": 2, "xy": 4, "xyz": 8}[pair_mode]
        C = 2 * F * k + k          # u,v time-varying + one static mask
        col_of = {"u": (0, "3d"), "v": (F, "3d"), "mask": (2 * F, "near")}
        a = _mk(Z * Y * X, C, seed=2)
        st = maybe_split_table(a, force=force)
        s = PackedSampler(Z, Y, X, F, col_of, pair_mode)
        rng = np.random.default_rng(3)
        N = 512
        xi = jnp.asarray(rng.uniform(0, X - 1, N), dtype=jnp.float32)
        yi = jnp.asarray(rng.uniform(0, Y - 1, N), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(0, 30, N), dtype=jnp.float32)
        depths = jnp.asarray([0.0, 10.0, 30.0])
        kw = dict(nearest_cols=[2 * F])
        r_direct, n_direct = s.gather_rows(a, xi, yi, depth, depths, **kw)
        r_split, n_split = s.gather_rows(st, xi, yi, depth, depths, **kw)
        np.testing.assert_array_equal(np.asarray(r_direct),
                                      np.asarray(r_split))
        np.testing.assert_array_equal(np.asarray(n_direct[2 * F]),
                                      np.asarray(n_split[2 * F]))

    @pytest.mark.parametrize("force", ["u16", "u8"])
    def test_corner_block(self, force):
        Z, Y, X, F = 3, 20, 25, 2
        C = 2 * F * 2              # u,v x-paired
        col_of = {"u": (0, "3d"), "v": (F, "3d")}
        a = _mk(Z * Y * X, C, seed=4)
        st = maybe_split_table(a, force=force)
        s = PackedSampler(Z, Y, X, F, col_of, "x")
        rng = np.random.default_rng(5)
        N = 256
        xi = jnp.asarray(rng.uniform(0, X - 1, N), dtype=jnp.float32)
        yi = jnp.asarray(rng.uniform(0, Y - 1, N), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(0, 30, N), dtype=jnp.float32)
        depths = jnp.asarray([0.0, 10.0, 30.0])
        times = jnp.asarray([0.0, 3600.0])
        b1 = s.gather_corner_block(a, xi, yi, depth, depths)
        b2 = s.gather_corner_block(st, xi, yi, depth, depths)
        o1 = s.eval_corner_block(b1, xi, yi, times, jnp.float32(1800.0),
                                 ["u", "v"])
        o2 = s.eval_corner_block(b2, xi, yi, times, jnp.float32(1800.0),
                                 ["u", "v"])
        for v in ("u", "v"):
            np.testing.assert_array_equal(np.asarray(o1[v]),
                                          np.asarray(o2[v]))


class TestPytree:
    def test_jit_transparent(self):
        a = _mk(4000, 6)
        st = maybe_split_table(a, force="u16")
        lin = jnp.arange(100, dtype=jnp.int32) * 7

        @jax.jit
        def f(tab, i):
            return take_rows(tab, i).sum()

        got = f(st, lin)
        want = jnp.take(a, lin, axis=0).sum()
        assert np.allclose(float(got), float(want))

    def test_flatten_roundtrip(self):
        a = _mk(100, 4)
        st = maybe_split_table(a, force="u8")
        leaves, tree = jax.tree_util.tree_flatten(st)
        st2 = jax.tree_util.tree_unflatten(tree, leaves)
        assert st2.factor == st.factor and st2.dtype == st.dtype
        np.testing.assert_array_equal(np.asarray(st.data),
                                      np.asarray(st2.data))
