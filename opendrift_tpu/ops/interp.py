"""Fused space-time field interpolation — the framework's hot kernel.

Replaces the reference's ``ReaderBlock.interpolate`` + interpolator classes
(reference: opendrift/readers/interpolation/structured.py:107-163 and
interpolators.py:27-212): per reader and step, the reference does a scipy
``map_coordinates`` bilinear gather per variable per z-layer per time
block, then 1D vertical and linear time blending.  Here the whole
(time, z, y, x) interpolation of *all* variables of a block group is one
fused gather expression compiled into the step kernel: 16 corner gathers
on a (V, F, Z, Y, X) stacked block, weighted on the VPU.

Conventions: fractional grid indices xi/yi precomputed by the caller
(uniform grid); depth is positive-down; ``depths`` ascending; ``times``
strictly increasing, seconds relative to the run epoch.

Host-side preparation (`fill_invalid`, `fill_towards_seafloor`) replaces
the reference's iterative grey-dilation NaN expansion
(interpolators.py:19-139) with a single nearest-valid fill via
``scipy.ndimage.distance_transform_edt`` at block-load time.
"""

import numpy as np
import jax
import jax.numpy as jnp

# Gather-placement cliff (measured, tools/gather_cliff.py, v5e).  The
# per-index take rate of the FUSED sampling kernel (gather + bilinear
# blend, the shape of gather_rows inside the step) drops ~40% at
# EXACTLY rows >= 2^15 for f32 tables (305 -> 179 M rows/s; second drop
# to 150 M at 2^18), independent of row width C, index distribution, or
# which rows are touched — an XLA operand-placement decision keyed on
# row count x dtype, not a cache working set.  f16 tables run the fast
# strategy (335 M rows/s) with no cliff until beyond 330k rows, bf16
# 350 M.  Falsified levers (all measured): row padding/ordering,
# table sharding, and the bit-split u16/u8 storage below, which WINS in
# an unfused gather+reduce shape (178 vs 113 M rows/s at 330k rows) but
# LOSES inside the fused kernel (118 vs 179 M) — the bitcast
# reassembly blocks the fused lowering.  Production guidance therefore:
# keep packed tables under GATHER_FAST_MAX_ROWS (extent subsetting,
# truncate_ocean_model_below_m, the compact regrid depth ladder) or opt
# into f16 rows; SplitTable remains available (opt-in) for unfused
# gather pipelines.  Full table: docs/performance.md.
GATHER_FAST_MAX_ROWS = 1 << 15      # f32/int32 fused-gather fast limit
_CLIFF_COL_BYTES = 1 << 20          # unfused-take threshold (rows*itemsize)
_U8_MAX_ROWS = 660_000


@jax.tree_util.register_pytree_node_class
class SplitTable:
    """A (rows, C) packed table stored bit-split as (rows, C*factor) of a
    narrower unsigned dtype so each storage column stays under the ~1 MiB
    gather cliff; :func:`take_rows` reassembles the original rows
    bit-exactly after the gather.  Presents the LOGICAL shape/dtype so
    sampler code that reads ``packed.shape[-1]`` is unaffected."""

    def __init__(self, data, factor, dtype):
        self.data = data
        self.factor = int(factor)
        self._dtype = jnp.dtype(dtype)

    @classmethod
    def from_array(cls, arr, store_dtype):
        factor = arr.dtype.itemsize // jnp.dtype(store_dtype).itemsize
        data = jax.lax.bitcast_convert_type(arr, store_dtype).reshape(
            arr.shape[0], -1)
        return cls(data, factor, arr.dtype)

    @property
    def shape(self):
        return (self.data.shape[0], self.data.shape[1] // self.factor)

    @property
    def dtype(self):
        return self._dtype

    def tree_flatten(self):
        return (self.data,), (self.factor, str(self._dtype))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], aux[0], aux[1])


def maybe_split_table(arr, force=None):
    """Wrap a device packed table in :class:`SplitTable` for UNFUSED
    gather pipelines (see the cliff note above — inside the fused step
    kernel direct storage wins, so the production sampler never calls
    this automatically).  ``force``: 'u16'/'u8' always split, False
    never; with ``force=None`` the measured unfused crossovers decide."""
    import os
    if force is False or os.environ.get("OPENDRIFT_NO_SPLIT_TABLE") == "1":
        return arr
    if force == "u16":
        return SplitTable.from_array(arr, jnp.uint16)
    if force == "u8":
        return SplitTable.from_array(arr, jnp.uint8)
    rows = arr.shape[0]
    isz = arr.dtype.itemsize
    if rows * isz < _CLIFF_COL_BYTES:
        return arr                     # already pre-cliff: direct wins
    if isz >= 4 and rows * 2 <= _CLIFF_COL_BYTES:
        return SplitTable.from_array(arr, jnp.uint16)
    if rows <= _U8_MAX_ROWS:
        return SplitTable.from_array(arr, jnp.uint8)
    return arr                         # beyond u8 crossover: direct wins


@jax.tree_util.register_pytree_node_class
class CompensatedTable:
    """A (rows, C) float32 packed table stored as (rows, 2C) float16 in
    ``[hi | lo]`` block layout, where ``hi = f16(x)`` and
    ``lo = f16(x - f32(hi))`` — same bytes as f32, but gathered with
    XLA's 16-bit strategy, which has no placement cliff until ~2^18
    rows (f32 cliffs at 2^15; docs/performance.md).  Reconstruction
    after the take is one widen-add (fuses, unlike the SplitTable
    bitcast): measured 300 M fused rows/s flat from 33k-330k rows vs
    f32's 189->112, i.e. 1.6-2.6x on post-cliff tables.  Max absolute
    representation error ~2^-21 x |x| — far below the int16
    scale/offset packing of typical forcing files.  Opt in per reader:
    ``reader.packed_dtype = 'float16x2'``."""

    def __init__(self, data, scale):
        self.data = data
        self.scale = scale          # (1, C) f32, exact powers of two

    @classmethod
    def from_array(cls, arr):
        """Columns are pre-scaled by an exact power of two into
        [0, ~1024] so fields far outside f16 range (pressure ~1e5
        overflows, micro-velocities underflow to f16 subnormals) keep
        the full ~2^-21 relative accuracy; power-of-two scaling is
        error-free."""
        arr = np.asarray(arr, dtype=np.float32)
        with np.errstate(all="ignore"):
            colmax = np.nanmax(np.abs(arr), axis=0)
        colmax = np.where(np.isfinite(colmax) & (colmax > 0), colmax, 1.0)
        scale = np.exp2(np.ceil(np.log2(colmax)) - 10.0).astype(
            np.float32)[None, :]
        scaled = jnp.asarray(arr / scale)
        hi = scaled.astype(jnp.float16)
        lo = (scaled - hi.astype(jnp.float32)).astype(jnp.float16)
        return cls(jnp.concatenate([hi, lo], axis=1),
                   jnp.asarray(scale))

    @property
    def shape(self):
        return (self.data.shape[0], self.data.shape[1] // 2)

    @property
    def dtype(self):
        return jnp.dtype(jnp.float32)

    def tree_flatten(self):
        return (self.data, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def take_rows(packed, lin):
    """The packed-table row gather: ``jnp.take`` plus, for
    :class:`SplitTable` / :class:`CompensatedTable` storage, the
    reassembly of the original-dtype rows."""
    if isinstance(packed, CompensatedTable):
        g = jnp.take(packed.data, lin, axis=0, mode="clip")
        C = packed.data.shape[1] // 2
        return (g[:, :C].astype(jnp.float32)
                + g[:, C:].astype(jnp.float32)) * packed.scale
    if isinstance(packed, SplitTable):
        g = jnp.take(packed.data, lin, axis=0, mode="clip")
        if packed.factor == 1:      # same-width storage: plain bitcast
            return jax.lax.bitcast_convert_type(g, packed.dtype)
        return jax.lax.bitcast_convert_type(
            g.reshape(g.shape[0], -1, packed.factor), packed.dtype)
    return jnp.take(packed, lin, axis=0, mode="clip")


def time_weights(times, t, F):
    """Bracketing frame index and linear weight for time t (clamped)."""
    ti = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0,
                  max(F - 2, 0))
    if F < 2:
        return ti, jnp.zeros_like(t)
    denom = times[ti + 1] - times[ti]
    tw = jnp.where(denom != 0, (t - times[ti]) / denom, 0.0)
    return ti, jnp.clip(tw, 0.0, 1.0)


def interp_xyzt(blocks, times, xi, yi, depth, depths, t):
    """Interpolate a stacked 3D block group.

    blocks: f32 (V, F, Z, Y, X); times: f32 (F,); depths: f32 (Z,) asc;
    xi, yi: fractional indices f32 (N,); depth: f32 (N,) positive down;
    t: scalar f32.  Returns f32 (V, N).
    """
    V, F, Z, Y, X = blocks.shape
    ti, tw = time_weights(times, t, F)

    x0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, max(X - 2, 0))
    y0 = jnp.clip(jnp.floor(yi).astype(jnp.int32), 0, max(Y - 2, 0))
    fx = jnp.clip(xi - x0, 0.0, 1.0)
    fy = jnp.clip(yi - y0, 0.0, 1.0)

    if Z > 1:
        z0 = jnp.clip(jnp.searchsorted(depths, depth, side="right") - 1, 0,
                      Z - 2)
        dz = depths[z0 + 1] - depths[z0]
        fz = jnp.where(dz != 0, (depth - depths[z0]) / dz, 0.0)
        fz = jnp.clip(fz, 0.0, 1.0)
    else:
        z0 = jnp.zeros_like(x0)
        fz = jnp.zeros_like(fx)

    x1 = jnp.minimum(x0 + 1, X - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    z1 = jnp.minimum(z0 + 1, Z - 1)
    t0 = ti
    t1 = jnp.minimum(ti + 1, F - 1)

    def gather(tt, zz, yy, xx):
        # -> (V, N): one flattened gather over the trailing axes
        flat = blocks.reshape(V, F * Z * Y * X)
        lin = ((tt * Z + zz) * Y + yy) * X + xx
        return jnp.take(flat, lin, axis=1)

    wx0, wx1 = 1.0 - fx, fx
    wy0, wy1 = 1.0 - fy, fy
    wz0, wz1 = 1.0 - fz, fz
    wt0, wt1 = 1.0 - tw, tw

    out = jnp.zeros((V,) + xi.shape, dtype=blocks.dtype)
    for tt, wt in ((t0, wt0), (t1, wt1)):
        for zz, wz in ((z0, wz0), (z1, wz1)):
            acc = (gather(tt, zz, y0, x0) * (wy0 * wx0)
                   + gather(tt, zz, y0, x1) * (wy0 * wx1)
                   + gather(tt, zz, y1, x0) * (wy1 * wx0)
                   + gather(tt, zz, y1, x1) * (wy1 * wx1))
            out = out + acc * (wz * wt)
    return out


class PackedSampler:
    """Static metadata + kernel for the packed-row layout — the TPU fast
    path for field sampling.

    TPU gathers cost per *index*, not per byte (XLA lowers them through
    the scalar core at ~1e8 indices/s); the classical per-variable corner
    gather (reference ReaderBlock.interpolate does one scipy call per
    variable per layer, interpolation/structured.py:107-163) needs
    O(16 x n_vars) indices per sample.  Here the host packs, for every
    (z, y, x) cell, ALL variables x ALL window frames (plus, optionally,
    the x+1 / y+1 / diagonal neighbours) into one contiguous row of a
    (Z*Y*X, C*k) array; a sample then needs only 2 gathers (xy packed,
    k=4), 4 (x packed, k=2) or 8 (unpacked) regardless of variable
    count, and the RK stage refetches ride the same rows for free.

    ``pair_mode``: 'xyz' | 'xy' | 'x' | 'none' — chosen by the host
    packer from the model's pair hint (multi-fetch vs single-fetch
    advection) and the 256 MB row-array budget; 'xyz' packs the z+1
    plane too, so one gather covers the full trilinear stencil."""

    def __init__(self, Z, Y, X, n_frames, col_of, pair_mode):
        self.Z, self.Y, self.X = Z, Y, X
        self.F = n_frames
        self.col_of = col_of        # var -> first column (frame 0)
        if pair_mode is True or pair_mode is False:  # legacy bool
            pair_mode = "x" if pair_mode else "none"
        self.pair_mode = pair_mode

    @property
    def x_paired(self):
        return self.pair_mode in ("x", "xy")

    def gather_rows(self, packed, xi, yi, depth, depths, row_offset=0,
                    nearest_cols=None):
        """4 (x_paired) or 8 corner gathers -> spatially interpolated
        rows (N, C) plus the vertical bracketing already applied.

        ``row_offset``: per-element row offset into ``packed`` — used for
        ensemble forcing, where member m's block starts at m*Z*Y*X
        (reference: round-robin EPS member assignment,
        interpolation/structured.py:120-134).

        ``nearest_cols``: optional list of column indices to ALSO return
        nearest-corner sampled (masks use nearest in the reference,
        interpolation/structured.py:117-119) — selected from the same
        corner gathers, so a nearest-sampled landmask costs zero extra
        gathers.  Returns rows or (rows, {col: f32[N]})."""
        Z, Y, X = self.Z, self.Y, self.X
        x0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, max(X - 2, 0))
        y0 = jnp.clip(jnp.floor(yi).astype(jnp.int32), 0, max(Y - 2, 0))
        fx = jnp.clip(xi - x0, 0.0, 1.0)[:, None]
        fy = jnp.clip(yi - y0, 0.0, 1.0)[:, None]
        if Z > 1:
            z0 = jnp.clip(jnp.searchsorted(depths, depth, side="right") - 1,
                          0, Z - 2)
            dz = depths[z0 + 1] - depths[z0]
            fz = jnp.where(dz != 0, (depth - depths[z0]) / dz, 0.0)
            fz = jnp.clip(fz, 0.0, 1.0)[:, None]
        else:
            z0 = jnp.zeros_like(x0)
            fz = jnp.zeros_like(fx)
        z1 = jnp.minimum(z0 + 1, Z - 1)
        y1 = jnp.minimum(y0 + 1, Y - 1)

        C = packed.shape[-1]
        near = {}

        def near_select(g_y0_a, g_y0_b, g_y1_a, g_y1_b):
            # nearest corner from the 2x2 stencil (x-halves a/b per y row)
            for c in (nearest_cols or ()):
                gy0 = jnp.where(fx[:, 0] > 0.5, g_y0_b[:, c], g_y0_a[:, c])
                gy1 = jnp.where(fx[:, 0] > 0.5, g_y1_b[:, c], g_y1_a[:, c])
                near[c] = jnp.where(fy[:, 0] > 0.5, gy1, gy0).astype(
                    jnp.float32)

        if self.pair_mode == "xyz":
            # columns: [base|x+1|y+1|x+1,y+1 | same four at z+1]; ONE
            # gather yields the full trilinear stencil
            q = C // 8
            lin = (z0 * Y + y0) * X + x0 + row_offset
            g = take_rows(packed, lin)

            def blend(h):
                row_y0 = h[:, :q] * (1.0 - fx) + h[:, q:2 * q] * fx
                row_y1 = (h[:, 2 * q:3 * q] * (1.0 - fx)
                          + h[:, 3 * q:4 * q] * fx)
                return row_y0 * (1.0 - fy) + row_y1 * fy
            near_select(g[:, :q], g[:, q:2 * q],
                        g[:, 2 * q:3 * q], g[:, 3 * q:4 * q])
            rz0 = blend(g[:, :4 * q])
            out = rz0
            if Z > 1:
                rz1 = blend(g[:, 4 * q:])
                out = rz0 * (1.0 - fz) + rz1 * fz
            return (out, near) if nearest_cols else out
        if self.pair_mode == "xy":
            # columns: [base | x+1 | y+1 | x+1,y+1]; one gather yields
            # the full bilinear stencil -> 2 gathers total (z0, z1)
            q = C // 4
            def plane_raw(zz):
                lin = (zz * Y + y0) * X + x0 + row_offset
                return take_rows(packed, lin)
            g0 = plane_raw(z0)
            def blend(g):
                row_y0 = g[:, :q] * (1.0 - fx) + g[:, q:2 * q] * fx
                row_y1 = g[:, 2 * q:3 * q] * (1.0 - fx) + g[:, 3 * q:] * fx
                return row_y0 * (1.0 - fy) + row_y1 * fy
            near_select(g0[:, :q], g0[:, q:2 * q],
                        g0[:, 2 * q:3 * q], g0[:, 3 * q:])
            rz0 = blend(g0)
            out = rz0
            if Z > 1:
                rz1 = blend(plane_raw(z1))
                out = rz0 * (1.0 - fz) + rz1 * fz
            return (out, near) if nearest_cols else out
        if self.pair_mode == "x":
            half = C // 2
            def corner_raw(zz, yy):
                lin = (zz * Y + yy) * X + x0 + row_offset
                g = take_rows(packed, lin)
                return g[:, :half], g[:, half:]
            def corner_of(raw):
                a, b = raw
                return a * (1.0 - fx) + b * fx
        else:
            x1 = jnp.minimum(x0 + 1, X - 1)
            def corner_raw(zz, yy):
                lin0 = (zz * Y + yy) * X + x0 + row_offset
                lin1 = (zz * Y + yy) * X + x1 + row_offset
                return (take_rows(packed, lin0),
                        take_rows(packed, lin1))
            def corner_of(raw):
                a, b = raw
                return a * (1.0 - fx) + b * fx
        raw00 = corner_raw(z0, y0)
        raw01 = corner_raw(z0, y1)
        near_select(raw00[0], raw00[1], raw01[0], raw01[1])
        r00 = corner_of(raw00)
        r01 = corner_of(raw01)
        r10 = corner_of(corner_raw(z1, y0))
        r11 = corner_of(corner_raw(z1, y1))
        rz0 = r00 * (1.0 - fy) + r01 * fy
        rz1 = r10 * (1.0 - fy) + r11 * fy
        out = rz0 * (1.0 - fz) + rz1 * fz
        return (out, near) if nearest_cols else out

    def gather_corner_block(self, packed, xi, yi, depth, depths,
                            row_offset=0, keep_vars=None):
        """Gather the z-blended 2x2 (y x x-pair) stencil at the cell of
        (xi, yi) WITHOUT applying the x/y interpolation — 4 gathers whose
        rows can then be re-evaluated at nearby positions for free
        (single-fetch RK stages, see PhysicsContext.advect_ocean_current).
        Requires pair_mode 'x', 'xy' or 'xyz'; returns a block usable
        with :meth:`eval_corner_block`.  Take count per block: 'x' =
        2 per z-plane (y0, y1), 'xy' = 1 per z-plane (the row already
        carries the y+1 half), 'xyz' = 1 total (z+1 too) — held bytes
        are identical across tiers (only the needed 2q columns are
        kept), so the wider tiers strictly reduce gather cost.

        ``keep_vars``: retain only these variables' columns in the held
        block (the gather still reads full rows, but the O(N) residency
        shrinks to the needed columns — essential at 10M+ elements)."""
        assert self.pair_mode in ("x", "xy", "xyz"), \
            "corner blocks need x-paired rows"
        Z, Y, X = self.Z, self.Y, self.X
        x0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, max(X - 2, 0))
        y0 = jnp.clip(jnp.floor(yi).astype(jnp.int32), 0, max(Y - 2, 0))
        if Z > 1:
            z0 = jnp.clip(jnp.searchsorted(depths, depth, side="right")
                          - 1, 0, Z - 2)
            dz = depths[z0 + 1] - depths[z0]
            fz = jnp.where(dz != 0, (depth - depths[z0]) / dz, 0.0)
            fz = jnp.clip(fz, 0.0, 1.0)[:, None]
            z1 = z0 + 1
        else:
            z0 = jnp.zeros_like(x0)
            z1 = z0
            fz = jnp.zeros((xi.shape[0], 1), dtype=jnp.float32)
        y1 = jnp.minimum(y0 + 1, Y - 1)

        C = packed.shape[-1]
        kfac = {"x": 2, "xy": 4, "xyz": 8}[self.pair_mode]
        q = C // kfac
        if keep_vars is not None:
            import numpy as _np
            F = self.F
            sub_cols = []
            block_col_of = {}
            for v in keep_vars:
                c0, kind = self.col_of[v]
                block_col_of[v] = (len(sub_cols), kind)
                n = 1 if kind in ("static", "near") else F
                sub_cols.extend(range(c0, c0 + n))
            sub = _np.asarray(sub_cols, dtype=_np.int32)
            cols = _np.concatenate([sub, sub + q])  # base + x+1 halves
        else:
            cols = None
            block_col_of = self.col_of

        def split_xy(g, off):
            """[base|x1] and [y1|x1y1] halves of an xy block starting
            at column offset ``off``, subset to the kept columns."""
            if cols is not None:
                return g[:, off + cols], g[:, off + 2 * q + cols]
            return g[:, off:off + 2 * q], g[:, off + 2 * q:off + 4 * q]

        if self.pair_mode == "xyz":
            # ONE take: the row carries the full trilinear stencil
            lin = (z0 * Y + y0) * X + x0 + row_offset
            g = take_rows(packed, lin)
            g_y0, g_y1 = split_xy(g, 0)
            if Z > 1:
                h_y0, h_y1 = split_xy(g, 4 * q)
                g_y0 = g_y0 * (1.0 - fz) + h_y0 * fz
                g_y1 = g_y1 * (1.0 - fz) + h_y1 * fz
            return g_y0, g_y1, x0, y0, block_col_of
        if self.pair_mode == "xy":
            # one take per z-plane: y+1 rides the same row
            def plane(zz):
                lin = (zz * Y + y0) * X + x0 + row_offset
                return split_xy(take_rows(packed, lin), 0)
            g_y0, g_y1 = plane(z0)
            if Z > 1:
                h_y0, h_y1 = plane(z1)
                g_y0 = g_y0 * (1.0 - fz) + h_y0 * fz
                g_y1 = g_y1 * (1.0 - fz) + h_y1 * fz
            return g_y0, g_y1, x0, y0, block_col_of

        def corner(zz, yy):
            lin = (zz * Y + yy) * X + x0 + row_offset
            g = take_rows(packed, lin)
            if cols is not None:
                return g[:, cols]
            return g[:, :2 * q]
        if Z == 1:
            # no vertical bracketing: skip the fz blend so the held
            # block keeps the packed dtype (f16 rows stay f16 — halves
            # the HBM traffic of every stage re-evaluation)
            g_y0 = corner(z0, y0)
            g_y1 = corner(z0, y1)
        else:
            g_y0 = corner(z0, y0) * (1.0 - fz) + corner(z1, y0) * fz
            g_y1 = corner(z0, y1) * (1.0 - fz) + corner(z1, y1) * fz
        return g_y0, g_y1, x0, y0, block_col_of

    def eval_corner_block(self, block, xi, yi, times, t, varnames):
        """Evaluate a gathered corner block at (xi, yi) — pure VPU ops,
        no gathers.  Positions outside the gathered cell are clamped to
        its edge (bounded extrapolation; acceptable for RK stages whose
        displacement is well under one cell).

        Variables of kind 'near' (masks) are corner-selected from the
        raw halves, matching the nearest sampling of gather_rows."""
        g_y0, g_y1, x0, y0, block_col_of = block
        q = g_y0.shape[1] // 2
        fx = jnp.clip(xi - x0, 0.0, 1.0)[:, None]
        fy = jnp.clip(yi - y0, 0.0, 1.0)[:, None]
        near = [v for v in varnames if block_col_of[v][1] == "near"]
        rest = [v for v in varnames if block_col_of[v][1] != "near"]
        out = {}
        if rest:
            # blend only the requested columns — RK stages ask for u/v
            # out of a block that also carries the rest of the start-of-
            # step environment (block-backed env fetch); blending the
            # full row here would cost ~4x the VPU work and HBM traffic
            import numpy as _np
            sel = []
            sub_col_of = {}
            for v in rest:
                c0, kind = block_col_of[v]
                n = 1 if kind in ("static", "near") else self.F
                sub_col_of[v] = (len(sel), kind)
                sel.extend(range(c0, c0 + n))
            if sel == list(range(q)):
                a0, b0 = g_y0[:, :q], g_y0[:, q:]
                a1, b1 = g_y1[:, :q], g_y1[:, q:]
            else:
                cols = _np.asarray(sel, dtype=_np.int32)
                a0, b0 = g_y0[:, cols], g_y0[:, cols + q]
                a1, b1 = g_y1[:, cols], g_y1[:, cols + q]
            row0 = a0 * (1.0 - fx) + b0 * fx
            row1 = a1 * (1.0 - fx) + b1 * fx
            rows = row0 * (1.0 - fy) + row1 * fy
            saved = self.col_of
            try:
                self.col_of = sub_col_of
                out.update(self.values(rows, times, t, rest))
            finally:
                self.col_of = saved
        for v in near:
            c = block_col_of[v][0]
            gy0 = jnp.where(fx[:, 0] > 0.5, g_y0[:, q + c], g_y0[:, c])
            gy1 = jnp.where(fx[:, 0] > 0.5, g_y1[:, q + c], g_y1[:, c])
            out[v] = jnp.where(fy[:, 0] > 0.5, gy1, gy0).astype(
                jnp.float32)
        return out

    def values(self, rows, times, t, varnames):
        """Blend the bracketing frame columns per variable."""
        F = self.F
        ti, tw = time_weights(times, t, F)
        out = {}
        import jax
        for v in varnames:
            col, kind = self.col_of[v]
            if kind == "static":
                out[v] = rows[:, col]
            else:
                # scalar frame index -> cheap dynamic slices, no gather
                v0 = jax.lax.dynamic_slice_in_dim(rows, col + ti, 1,
                                                  axis=1)[:, 0]
                v1 = jax.lax.dynamic_slice_in_dim(
                    rows, col + jnp.minimum(ti + 1, F - 1), 1,
                    axis=1)[:, 0]
                out[v] = v0 * (1.0 - tw) + v1 * tw
        return out


def interp_nearest_xyt(blocks, times, xi, yi, t):
    """Nearest-neighbour sample of a (V, F, Y, X) block group — used for
    discrete masks (the reference always uses nearest for land masks,
    interpolation/structured.py:117-119)."""
    V, F, Y, X = blocks.shape
    ti, tw = time_weights(times, t, F)
    ti = jnp.where(tw > 0.5, jnp.minimum(ti + 1, F - 1), ti)
    x0 = jnp.clip(jnp.round(xi).astype(jnp.int32), 0, X - 1)
    y0 = jnp.clip(jnp.round(yi).astype(jnp.int32), 0, Y - 1)
    flat = blocks.reshape(V, F * Y * X)
    lin = (ti * Y + y0) * X + x0
    return jnp.take(flat, lin, axis=1)


# ------------------------------------------------------------ host prep --

def fill_invalid(field):
    """Replace NaNs with the nearest valid value (2D horizontal fill).

    Host-side, at block load.  Single-pass EDT nearest-neighbour transport
    — same role as the reference's <=10-round grey-dilation expansion
    (reference interpolators.py:19-139), but exact and O(1) passes.
    ``field``: float32 (..., Y, X), filled in place per 2D slice.
    Returns (filled, any_valid: bool).
    """
    out = np.ascontiguousarray(field, dtype=np.float32)
    any_valid = bool(np.isfinite(out).any())
    if not np.isfinite(out).all():
        from ..utils import native
        if not native.fill_nearest(out):
            # scipy fallback when the native library is unavailable
            from scipy.ndimage import distance_transform_edt
            flat = out.reshape(-1, *out.shape[-2:])
            for i in range(flat.shape[0]):
                sl = flat[i]
                mask = ~np.isfinite(sl)
                if mask.all() or not mask.any():
                    continue
                idx = distance_transform_edt(mask, return_distances=False,
                                             return_indices=True)
                flat[i] = sl[tuple(idx)]
    return out, any_valid


def fill_towards_seafloor(block):
    """Propagate the deepest valid value downward along the z axis
    (reference: interpolation/structured.py:50-71
    ``fill_NaN_towards_seafloor``).  ``block``: (Z, Y, X), z index 0 =
    surface, increasing downward."""
    out = np.ascontiguousarray(block, dtype=np.float32)
    from ..utils import native
    if native.fill_seafloor(out):
        return out
    for k in range(1, out.shape[0]):
        nan = ~np.isfinite(out[k])
        out[k][nan] = out[k - 1][nan]
    return out
