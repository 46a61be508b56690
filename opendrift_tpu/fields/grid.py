"""Structured (regular-grid) reader base: device field blocks + sampling.

Architectural replacement for the reference's ``StructuredReader`` +
``ReaderBlock`` machinery (reference: opendrift/readers/basereader/
structured.py:15-628, opendrift/readers/interpolation/structured.py:12-186):

* Host side: a subclass reads raw frames (``_read_frame``); the base
  scrubs, NaN-fills (nearest-valid + towards-seafloor), subsets to the
  simulation extent with a speed-derived halo (the reference's buffer
  formula ``max_speed*dt/pixelsize + 2``, basereader/variables.py:616-617),
  and stacks a fixed-shape window of frames into device arrays.
* Device side: ``sample`` projects particle lon/lat into fractional grid
  indices with the jnp CRS transform and runs the fused space-time
  interpolation kernel (ops/interp.py) — no Python in the loop; RK stage
  refetches re-enter the same kernel at displaced positions.

Frame windows keep a constant shape across jit calls (fixed frame count,
fixed spatial subset) so the step never recompiles mid-run.
"""

import logging
from datetime import timedelta

import numpy as np
import jax.numpy as jnp

from .base import BaseReader, STANDARD_NAMES
from ..ops.interp import (fill_invalid, fill_towards_seafloor, take_rows,
                          maybe_split_table, CompensatedTable,
                          PackedSampler, GATHER_FAST_MAX_ROWS)

logger = logging.getLogger(__name__)

# variables sampled with nearest-neighbour rather than bilinear
NEAREST_VARIABLES = {"land_binary_mask"}
# variables with no time dependence (sampled from frame 0)
STATIC_VARIABLES = {"land_binary_mask", "sea_floor_depth_below_sea_level"}


class StructuredGridReader(BaseReader):
    """Base for readers on regular (equidistant x/y) grids.

    Subclasses must set, before calling ``super().__init__()``:
      ``self.x``, ``self.y`` (1D metres, equidistant), ``self.times``
      (list of datetimes), ``self.depths`` (1D positive-down ascending,
      or None), ``self.proj4``, ``self.variables`` (list of std names),
      ``self._var_has_z`` (dict std name -> bool)
    and implement ``_read_frame(stdname, time_index, zslice, yslice,
    xslice) -> float32 ndarray`` ((Z,y,x) or (y,x)), raw (base scrubs).
    """

    def __init__(self):
        x = np.asarray(self.x, dtype=np.float64)
        y = np.asarray(self.y, dtype=np.float64)
        # enforce ascending axes (flip handled at read time)
        self._flip_x = x[0] > x[-1] if len(x) > 1 else False
        self._flip_y = y[0] > y[-1] if len(y) > 1 else False
        if self._flip_x:
            x = x[::-1]
        if self._flip_y:
            y = y[::-1]
        if len(x) > 1:
            dxs = np.diff(x)
            if dxs.max() - dxs.min() > 0.01 * abs(dxs.mean()):
                raise ValueError(
                    f"{self.name}: x axis is not equidistant")
        if len(y) > 1:
            dys = np.diff(y)
            if dys.max() - dys.min() > 0.01 * abs(dys.mean()):
                raise ValueError(
                    f"{self.name}: y axis is not equidistant")
        self.x = x
        self.y = y
        self.delta_x = float(x[1] - x[0]) if len(x) > 1 else 1.0
        self.delta_y = float(y[1] - y[0]) if len(y) > 1 else 1.0
        self.xmin, self.xmax = float(x[0]), float(x[-1])
        self.ymin, self.ymax = float(y[0]), float(y[-1])
        self.times = list(self.times)
        self.start_time = self.times[0]
        self.end_time = self.times[-1]
        if len(self.times) > 1:
            deltas = [(b - a).total_seconds()
                      for a, b in zip(self.times[:-1], self.times[1:])]
            self.time_step = timedelta(seconds=min(deltas))
        else:
            self.time_step = None
        if getattr(self, "depths", None) is not None:
            self.depths = np.asarray(self.depths, dtype=np.float32)
        # default window: 2 frames; prepare() may widen
        self._window_frames = 2
        self._ix = slice(0, len(x))
        self._iy = slice(0, len(y))
        self._frame_cache = {}
        self._max_cached_frames = 64
        # static block-group membership (used by both the host packing and
        # the traced sampler — must not change after construction)
        self._group3 = [v for v in self.variables
                        if self._var_has_z.get(v)
                        and v not in STATIC_VARIABLES]
        self._group2 = [v for v in self.variables
                        if not self._var_has_z.get(v)
                        and v not in STATIC_VARIABLES]
        self._groups = [v for v in self.variables if v in STATIC_VARIABLES]
        super().__init__()

    # ------------------------------------------------------------ prepare
    def prepare(self, extent=None, start_time=None, end_time=None,
                max_speed=None, interval_seconds=None, variables=None):
        """Subset the grid to the simulation extent with a halo, restrict
        the loaded variables to those required, and fix the per-window
        frame count (constant shapes across jit calls)."""
        if variables is not None:
            wanted = [v for v in self.variables if v in variables]
            self._group3 = [v for v in self._group3 if v in wanted]
            self._group2 = [v for v in self._group2 if v in wanted]
            self._groups = [v for v in self._groups if v in wanted]
        if extent is not None and max_speed is not None:
            lonmin, latmin, lonmax, latmax = extent
            # project extent corners + edge midpoints to reader grid
            lons = np.array([lonmin, lonmax, lonmin, lonmax,
                             (lonmin + lonmax) / 2, lonmin, lonmax,
                             (lonmin + lonmax) / 2])
            lats = np.array([latmin, latmin, latmax, latmax, latmin,
                             (latmin + latmax) / 2, (latmin + latmax) / 2,
                             latmax])
            xs, ys = self.lonlat2xy(lons, lats)
            xs = np.asarray(xs, dtype=np.float64)
            ys = np.asarray(ys, dtype=np.float64)
            if not np.isfinite(xs).all() or not np.isfinite(ys).all():
                # part of the extent is outside an invertible region
                # (curvilinear hull): widen to the grid edge rather
                # than shrink the subset
                xs = np.concatenate([xs[np.isfinite(xs)],
                                     [self.x[0], self.x[-1]]])
                ys = np.concatenate([ys[np.isfinite(ys)],
                                     [self.y[0], self.y[-1]]])
            dt_r = (self.time_step.total_seconds()
                    if self.time_step else 3600.0)
            halo_x = int(abs(max_speed * dt_r / self.delta_x)) + 2
            halo_y = int(abs(max_speed * dt_r / self.delta_y)) + 2
            ix0 = int(np.clip((np.nanmin(xs) - self.x[0]) / self.delta_x
                              - halo_x, 0, len(self.x) - 2))
            ix1 = int(np.clip((np.nanmax(xs) - self.x[0]) / self.delta_x
                              + halo_x + 2, ix0 + 2, len(self.x)))
            iy0 = int(np.clip((np.nanmin(ys) - self.y[0]) / self.delta_y
                              - halo_y, 0, len(self.y) - 2))
            iy1 = int(np.clip((np.nanmax(ys) - self.y[0]) / self.delta_y
                              + halo_y + 2, iy0 + 2, len(self.y)))
            new_ix, new_iy = slice(ix0, ix1), slice(iy0, iy1)
            if (new_ix, new_iy) != (self._ix, self._iy):
                # frames cached before the subset (e.g. the ocean_only
                # relocation's full-grid landmask) have the wrong shape
                self._frame_cache.clear()
            self._ix = new_ix
            self._iy = new_iy
            logger.info("%s: grid subset x[%d:%d] y[%d:%d] of (%d, %d)",
                        self.name, ix0, ix1, iy0, iy1, len(self.x),
                        len(self.y))
        if interval_seconds is not None and self.time_step is not None:
            self._window_frames = min(
                len(self.times),
                int(np.ceil(interval_seconds
                            / self.time_step.total_seconds())) + 2)
        else:
            self._window_frames = min(len(self.times), 2)

    # ----------------------------------------------------------- windows -
    def _frame_indices(self, window_start, window_end):
        F = self._window_frames
        n = len(self.times)
        if window_start is None:
            i0 = 0
        else:
            i0 = np.searchsorted(
                np.array([t.timestamp() for t in self.times]),
                window_start.timestamp(), side="right") - 1
        i0 = int(np.clip(i0, 0, max(n - F, 0)))
        return list(range(i0, min(i0 + F, n)))

    def set_convolution_kernel(self, convolve):
        """Smooth every loaded frame with a convolution kernel: an int N
        (NxN box kernel) or a 2D array (reference structured.py:163-192).
        Applied host-side at frame load, before device packing."""
        if convolve is None:
            self._convolve_kernel = None
        else:
            if isinstance(convolve, (int, np.integer)):
                kernel = np.ones((int(convolve), int(convolve)))
            else:
                kernel = np.asarray(convolve, dtype=np.float64)
            self._convolve_kernel = kernel / kernel.sum()
        self._frame_cache.clear()

    def _load_frame(self, std, ti, member=0):
        """Scrubbed, NaN-filled frame (host, cached)."""
        key = (std, ti, member)
        if key in self._frame_cache:
            return self._frame_cache[key]
        zsl = slice(None)
        if getattr(self, "ensemble_size", 1) > 1:
            raw = self._read_frame(std, ti, zsl, self._iy, self._ix,
                                   member)
        else:
            raw = self._read_frame(std, ti, zsl, self._iy, self._ix)
        arr = np.asarray(raw, dtype=np.float32)
        if self._flip_x:
            arr = arr[..., ::-1]
        if self._flip_y:
            arr = arr[..., ::-1, :]
        arr = self._scrub_frame(std, arr)
        if len(self._frame_cache) > self._max_cached_frames:
            self._frame_cache.clear()
        self._frame_cache[key] = arr
        return arr

    def _scrub_frame(self, std, arr):
        """Valid-range scrub + NaN fill + optional convolution (the host
        preprocessing the reference does per ReaderBlock, reference
        interpolation/structured.py:50-71, variables.py:630-668)."""
        rng = STANDARD_NAMES.get(std)
        if rng is not None and std not in NEAREST_VARIABLES:
            bad = (arr < rng["valid_min"]) | (arr > rng["valid_max"])
            arr = np.where(bad, np.nan, arr)
        if std not in NEAREST_VARIABLES:
            if arr.ndim == 3:
                arr = fill_towards_seafloor(arr)
            arr, any_valid = fill_invalid(arr)
            arr = np.nan_to_num(arr, nan=0.0)
            kernel = getattr(self, "_convolve_kernel", None)
            if kernel is not None:
                from scipy import ndimage
                if arr.ndim == 2:
                    arr = ndimage.convolve(arr, kernel, mode="nearest")
                else:
                    arr = np.stack([
                        ndimage.convolve(a, kernel, mode="nearest")
                        for a in arr])
                arr = arr.astype(np.float32)
        else:
            arr = np.nan_to_num(arr, nan=1.0)  # unknown -> land
        return arr

    def _load_frame_rows(self, std, ti, member, r0, r1, ctx=8):
        """Per-host shard read: load, scrub and return only subset rows
        [r0, r1) of a frame (row indices relative to the ``_iy`` subset,
        in ascending-y orientation).  Reads ``ctx`` context rows either
        side so the nearest-valid NaN fill sees its neighbourhood, then
        crops.  ``r1`` may exceed the grid (tile padding): the returned
        band is edge-replicated to ``r1 - r0`` rows.

        This is the multi-host forcing path — each host touches only the
        rows its devices own (VERDICT round-1 item 5), instead of the
        replicated full-grid read of ``_load_frame``.
        """
        iy = self._iy
        ny = iy.stop - iy.start
        if r0 >= ny:                      # band entirely past the grid
            last = self._load_frame_rows(std, ti, member, ny - 1, ny, ctx)
            return np.repeat(last, r1 - r0, axis=-2)
        rr1 = min(r1, ny)
        c0, c1 = max(0, r0 - ctx), min(ny, rr1 + ctx)
        if self._flip_y:
            # ascending-orientation rows [c0, c1) live at source rows
            # [ny - c1, ny - c0) of the (descending) file
            ys = slice(iy.start + ny - c1, iy.start + ny - c0)
        else:
            ys = slice(iy.start + c0, iy.start + c1)
        if getattr(self, "ensemble_size", 1) > 1:
            raw = self._read_frame(std, ti, slice(None), ys, self._ix,
                                   member)
        else:
            raw = self._read_frame(std, ti, slice(None), ys, self._ix)
        arr = np.asarray(raw, dtype=np.float32)
        if self._flip_x:
            arr = arr[..., ::-1]
        if self._flip_y:
            arr = arr[..., ::-1, :]
        arr = self._scrub_frame(std, arr)
        band = arr[..., r0 - c0:rr1 - c0, :]
        if rr1 < r1:                      # pad past the grid edge
            reps = np.repeat(band[..., -1:, :], r1 - rr1, axis=-2)
            band = np.concatenate([band, reps], axis=-2)
        return band

    def device_state(self, window_start=None, window_end=None):
        """Pack the window's frames into the row-packed device layout
        (see ops/interp.PackedSampler): one (Z*y*x, C) array holding all
        time-varying variables x frames per cell, plus a separate static
        stack 'bs' for nearest-sampled masks/bathymetry."""
        from ..ops.interp import PackedSampler
        tidx = self._frame_indices(window_start, window_end)
        F = len(tidx)
        ny = self._iy.stop - self._iy.start
        nx = self._ix.stop - self._ix.start
        Z = len(self.depths) if (self._group3 and
                                 getattr(self, "depths", None) is not None) \
            else 1
        # depth truncation (reference environment.py:554-562): pack only
        # the levels covering [0, truncate_depth] plus one bracketing
        # level; sampling below the deepest kept level clamps fz -> 1,
        # i.e. extrapolates, exactly the reference's clamped-z semantics.
        # At truncate=0 with a surface level this makes Z == 1, and the
        # duplicate z1 gathers CSE away — half the sampling gathers.
        trunc = getattr(self, "truncate_depth", None)
        if Z > 1 and trunc is not None:
            d = np.asarray(self.depths, dtype=np.float32)
            Z = max(1, min(int(np.searchsorted(d, float(trunc),
                                               side="left")) + 1, Z))
        # column layout (static across windows)
        col_of = {}
        col = 0
        for v in self._group3:
            col_of[v] = (col, "t")
            col += F
        for v in self._group2:
            col_of[v] = (col, "t")
            col += F
        # Statics (bathymetry, masks) ride the same row gathers as one
        # extra column each — sampling them through a separate
        # narrow-block gather costs ~10x the whole packed fetch (TPU
        # gathers are per-index bound, row width is nearly free).
        # Nearest-sampled masks (reference uses nearest for masks,
        # interpolation/structured.py:117-119) are corner-selected from
        # the very same gathers, zero extra cost.
        self._static_packed = [v for v in self._groups
                               if v not in NEAREST_VARIABLES]
        self._static_near = [v for v in self._groups
                             if v in NEAREST_VARIABLES]
        for v in self._static_packed:
            col_of[v] = (col, "static")
            col += 1
        for v in self._static_near:
            col_of[v] = (col, "near")
            col += 1
        C = col
        # neighbour-packing tier from the 256 MB row-array budget.
        # Measured on v5e: 'x' (4 gathers) beats 'none' (8) by ~1.3x;
        # 'xy' (2 gathers, 2x wider rows) wins another 36-41% for
        # multi-fetch advection (gathers cost per index, and the fused
        # gather rate is width-independent to at least 176-B rows —
        # the r4 "byte-bound" rejection of xy actually measured the
        # since-resolved row-count placement cliff), but doubles the
        # held-block residency of single-fetch stages, so the model
        # passes pair_hint='xy'|'x' by drift:advection_single_fetch.
        # OPENDRIFT_XY_PAIR=1/0 force-overrides for standalone use.
        import os as _os
        env_xy = _os.environ.get("OPENDRIFT_XY_PAIR")
        want_xy = (env_xy == "1"
                   or (env_xy != "0"
                       and getattr(self, "pair_hint", None) == "xy"))
        base_bytes = Z * ny * nx * max(C, 1) * 4
        if C > 0 and Z > 1 and base_bytes * 8 < 256e6 and want_xy:
            # full trilinear stencil in ONE row: a 3D sample is a
            # single take (192 M rows/s at 176-B production rows vs
            # 267 at 88 B — rate x0.72 for half the takes, measured)
            pair_mode = "xyz"
        elif C > 0 and base_bytes * 4 < 256e6 and want_xy:
            pair_mode = "xy"
        elif C > 0 and base_bytes * 2 < 256e6:
            pair_mode = "x"
        else:
            pair_mode = "none"
        self._sampler = PackedSampler(Z, ny, nx, F, col_of, pair_mode)

        M = getattr(self, "ensemble_size", 1)
        pair_factor = {"none": 1, "x": 2, "xy": 4, "xyz": 8}[pair_mode]
        self._pack_plan = {
            "tidx": tidx, "col_of": col_of, "Z": Z, "C": C,
            "Cf": C * pair_factor, "pair_mode": pair_mode, "M": M,
            "ny": ny, "nx": nx,
        }
        out = {}
        if C > 0 and getattr(self, "_dd_defer_pack", False):
            # multi-host domain decomposition: the full-grid host array is
            # never built — DDContext.retile reads each host's row bands
            # straight from the source via packed_rows()
            out["packed_deferred"] = True
        elif C > 0:
            blocks = [self._pack_member(m, tidx, col_of, Z, C, pair_mode)
                      .reshape(Z * ny * nx, -1) for m in range(M)]
            # member m's rows start at m * Z*ny*nx
            packed_all = np.concatenate(blocks, axis=0) if M > 1 \
                else blocks[0]
            # optional narrow-row storage, opt in per reader:
            #   packed_dtype='float16'   — f16 rows, rel. error ~1e-3
            #     (comparable to the int16 scale/offset packing common
            #     in source NetCDF files), halves HBM bytes AND uses
            #     the 16-bit gather strategy (no placement cliff until
            #     ~2^18 rows);
            #   packed_dtype='float16x2' — compensated hi+lo f16 pairs
            #     (ops/interp.py CompensatedTable): f32 bytes, ~2^-21
            #     relative error, 1.6-2.6x faster sampling on tables
            #     beyond the 2^15-row f32 gather cliff.
            dtype = getattr(self, "packed_dtype", None)
            # readers whose sampling mode is already value-approximate
            # (ROMS/unstructured regrid) opt into automatic compensated
            # storage for post-cliff tables — explicit packed_dtype
            # always wins
            auto_comp = (dtype is None
                         and getattr(self, "packed_auto_compensate",
                                     False))
            dtype = dtype or "float32"
            compensated = dtype in ("float16x2", "f16x2")
            if compensated:
                dtype = "float32"
            if getattr(self, "_dd_keep_host", False):
                # domain decomposition: the host array is split into
                # per-device Y bands by DDContext.retile — only the
                # tiled shards ever reach device memory (tiles are
                # per-device slices, normally under the cliff, so the
                # compensated representation is not applied there)
                out["packed"] = packed_all.astype(np.dtype(dtype))
            else:
                rows = packed_all.shape[0]
                # under the xyz tier wide f32 rows measured NO cliff
                # penalty at production-ladder sizes while compensated
                # f16 rows (2x wider still) measured -43% — restrict
                # auto-compensation to the narrower-row tiers
                if pair_mode == "xyz":
                    auto_comp = False
                if auto_comp and rows >= GATHER_FAST_MAX_ROWS:
                    compensated = True
                    logger.info(
                        "Packed table of reader %s (%d rows) crosses "
                        "the 2^15-row gather cliff; using compensated "
                        "f16-pair storage (~2^-21 rel. error, +38%% "
                        "measured — set reader.packed_dtype='float32' "
                        "to force exact rows).", self.name, rows)
                if compensated:
                    # built from the host array: the f32 table never
                    # reaches the device
                    out["packed"] = CompensatedTable.from_array(
                        packed_all)
                else:
                    arr = jnp.asarray(packed_all, dtype=jnp.dtype(dtype))
                    # xyz-tier wide rows measured no penalty at
                    # production-ladder sizes (38k rows) — warn only
                    # from 2^17 rows there (112 vs 192 M rows/s in the
                    # fused cell at 120k)
                    warn_rows = (GATHER_FAST_MAX_ROWS * 4
                                 if pair_mode == "xyz"
                                 else GATHER_FAST_MAX_ROWS)
                    if (arr.dtype.itemsize >= 4 and rows >= warn_rows):
                        # measured XLA fused-gather cliff (exactly 2^15
                        # rows for f32, ~40% sampling-rate loss — see
                        # ops/interp.py and docs/performance.md)
                        logger.warning(
                            "Packed table of reader %s has %d rows — "
                            "at or beyond the measured TPU gather "
                            "cliff (2^15 rows for float32 tables, "
                            "~40%% lower sampling rate). Consider a "
                            "tighter extent, drift:"
                            "truncate_ocean_model_below_m, reader."
                            "packed_dtype='float16x2' (near-lossless, "
                            "1.6-2.6x) or 'float16' (no cliff until "
                            "~10x this size).", self.name, rows)
                    split = _os.environ.get("OPENDRIFT_SPLIT_TABLE")
                    if split in ("u16", "u8"):
                        arr = maybe_split_table(arr, force=split)
                    out["packed"] = arr
                # narrow u/v companion table for multi-fetch RK stage
                # refetches: stages 2-4 only need u/v, and narrow rows
                # gather ~1.5x faster than the full-width rows (fused
                # cell: 305 vs 192 M rows/s at 44 vs 176 cols) — same
                # stencil layout, bit-identical values
                uv = ("x_sea_water_velocity", "y_sea_water_velocity")
                if (pair_mode in ("xy", "xyz")
                        and not getattr(self, "_dd_keep_host", False)
                        and all(v in col_of for v in uv)):
                    F_blk = pair_factor
                    uv_sub = []
                    for v in uv:
                        c0 = col_of[v][0]
                        uv_sub.extend(range(c0, c0 + F))
                    idx = np.concatenate(
                        [np.asarray(uv_sub, dtype=np.int64) + b * C
                         for b in range(F_blk)])
                    out["packed_uv"] = jnp.asarray(
                        packed_all[:, idx],
                        dtype=jnp.float32 if compensated
                        else jnp.dtype(dtype))
                    self._sampler_uv = PackedSampler(
                        Z, ny, nx, F,
                        {uv[0]: (0, "t"), uv[1]: (F, "t")}, pair_mode)
        epoch = self._run_epoch
        out["times"] = jnp.asarray(
            [(self.times[ti] - epoch).total_seconds() for ti in tidx],
            dtype=jnp.float32)
        if getattr(self, "depths", None) is not None:
            out["depths"] = jnp.asarray(
                np.asarray(self.depths, dtype=np.float32)[:Z]
                if self._group3 else self.depths)
        else:
            out["depths"] = jnp.zeros((1,), dtype=jnp.float32)
        return out

    def _pack_member(self, m, tidx, col_of, Z, C, pair_mode, rows=None):
        """Pack one ensemble member's window into the row layout:
        (Z, nrows, nx, C * pair_factor).  With ``rows=(r0, r1)`` only
        that row band is read from the source (per-host shard read);
        neighbour-shift columns are built with one context row so the
        band matches the full-grid packing exactly."""
        nx = self._ix.stop - self._ix.start
        if rows is None:
            r0, r1 = 0, self._iy.stop - self._iy.start
            load = lambda v, ti: self._load_frame(v, ti, m)
            pad_y = 0
        else:
            r0, r1 = rows
            # one extra bottom row so shift_y is exact at the band edge
            pad_y = 1 if pair_mode in ("xy", "xyz") else 0
            load = lambda v, ti: self._load_frame_rows(
                v, ti, m, r0, r1 + pad_y)
        nrows = r1 - r0 + pad_y
        packed = np.empty((Z, nrows, nx, C), dtype=np.float32)
        for v in self._group3:
            c0 = col_of[v][0]
            for fi, ti in enumerate(tidx):
                packed[:, :, :, c0 + fi] = load(v, ti)[:Z]
        for v in self._group2:
            c0 = col_of[v][0]
            for fi, ti in enumerate(tidx):
                packed[:, :, :, c0 + fi] = load(v, ti)[None, :, :]
        for v in self._static_packed + self._static_near:
            packed[:, :, :, col_of[v][0]] = load(v, 0)[None, :, :]
        if pair_mode != "none":
            # append neighbour rows so one gather covers the
            # x-pair ('x'), the bilinear stencil ('xy') or the full
            # trilinear stencil incl. the z+1 plane ('xyz')
            def shift_x(a):
                return np.concatenate([a[:, :, 1:], a[:, :, -1:]],
                                      axis=2)

            def shift_y(a):
                return np.concatenate([a[:, 1:], a[:, -1:]], axis=1)
            variants = [packed, shift_x(packed)]
            if pair_mode in ("xy", "xyz"):
                variants += [shift_y(packed), shift_x(shift_y(packed))]
            packed = np.concatenate(variants, axis=3)
            if pair_mode == "xyz":
                # z+1 plane of the xy block (deepest plane repeats, the
                # same clamp as z1 = min(z0+1, Z-1))
                shift_z = np.concatenate([packed[1:], packed[-1:]],
                                         axis=0)
                packed = np.concatenate([packed, shift_z], axis=3)
        if pad_y:
            packed = packed[:, :-pad_y]
        return packed

    def packed_rows(self, r0, r1):
        """Per-host shard read for multi-host domain decomposition:
        build the packed row band [r0, r1) of the current window —
        shape (M*Z, r1-r0, nx, Cf) — reading only those rows (plus a
        small NaN-fill context margin) from the source.  Requires a
        preceding ``device_state()`` call (which records the window's
        pack plan); ``r1`` may exceed the grid for tile padding."""
        plan = self._pack_plan
        bands = [self._pack_member(m, plan["tidx"], plan["col_of"],
                                   plan["Z"], plan["C"],
                                   plan["pair_mode"], rows=(r0, r1))
                 for m in range(plan["M"])]
        band = np.concatenate(bands, axis=0) if plan["M"] > 1 \
            else bands[0]
        dtype = getattr(self, "packed_dtype", "float32")
        if dtype in ("float16x2", "f16x2"):
            dtype = "float32"   # per-device DD tiles sit under the cliff
        return np.ascontiguousarray(band.astype(np.dtype(dtype)))

    # ---------------------------------------------------------- sampling -
    def _local_idx(self, dev_state, xi, yi, covers=None):
        """Domain decomposition: shift global fractional grid indices
        into the local extended tile (dev_state['y_off']/'x_off' are set
        inside the shard_map by DDContext.local_dev_states) and restrict
        coverage to cells the tile actually holds — an element beyond
        its halo reads clipped cells, which must count as not-covered,
        not as data.  'x_off' only appears under 2D (Y x X) tiling."""
        if not isinstance(dev_state, dict):
            return xi, yi, covers
        y_off = dev_state.get("y_off")
        if y_off is not None:
            yi = yi - y_off
            if covers is not None:
                covers = covers & (yi >= 0) & (yi <= self._sampler.Y - 1)
        x_off = dev_state.get("x_off")
        if x_off is not None:
            xi = xi - x_off
            if covers is not None:
                covers = covers & (xi >= 0) & (xi <= self._sampler.X - 1)
        return xi, yi, covers

    def _grid_indices(self, lon, lat):
        x, y = self.crs.fwd(jnp, lon, lat)
        # geographic grids: map particle longitudes into the file's lon
        # convention, incl. dateline wrap for global 0..360 grids
        # (reference reader_netCDF_CF_generic.py:452-466 split-and-concat)
        if getattr(self.crs, "is_latlon", False):
            x = jnp.where(x > self.xmax, x - 360.0, x)
            x = jnp.where(x < self.xmin, x + 360.0, x)
        x0 = self.x[self._ix][0]
        y0 = self.y[self._iy][0]
        xi = (x - x0) / self.delta_x
        yi = (y - y0) / self.delta_y
        return xi, yi

    def sample(self, dev_state, varnames, t, lon, lat, z, member=None):
        xi, yi = self._grid_indices(lon, lat)
        covers = self._covers_idx(xi, yi)
        xi, yi, covers = self._local_idx(dev_state, xi, yi, covers)
        # ensemble forcing: element -> member by round-robin on ID
        # (reference reader_netCDF_CF_generic.py:560-569)
        M = getattr(self, "ensemble_size", 1)
        if M > 1 and member is not None:
            row_offset = (member.astype(jnp.int32) % M) \
                * (self._sampler.Z * self._sampler.Y * self._sampler.X)
        else:
            row_offset = 0
        # temporal coverage with one reader-step slack on either side
        times = dev_state["times"]
        if self.time_step is not None:
            slack = self.time_step.total_seconds()
            covers = covers & (t >= times[0] - slack) & (t <= times[-1]
                                                         + slack)
        depth = jnp.maximum(-z, 0.0)
        values = {}
        want_t = [v for v in varnames
                  if v in self._group3 or v in self._group2
                  or v in self._static_packed]
        want_n = [v for v in varnames if v in self._static_near]
        if want_n and not want_t:
            # mask-only fetch (e.g. coastline bisection probes): nearest
            # sampling needs ONE rounded-index gather, not the 4-gather
            # bilinear stencil (statics are z-broadcast, plane 0 suffices)
            s = self._sampler
            x0 = jnp.clip(jnp.round(xi).astype(jnp.int32), 0, s.X - 1)
            y0 = jnp.clip(jnp.round(yi).astype(jnp.int32), 0, s.Y - 1)
            lin = y0 * s.X + x0 + row_offset
            g = take_rows(dev_state["packed"], lin)
            for v in want_n:
                values[v] = g[:, s.col_of[v][0]].astype(jnp.float32)
            return values, covers
        uv_sampler = getattr(self, "_sampler_uv", None)
        if (not want_n and uv_sampler is not None
                and "packed_uv" in dev_state
                and set(want_t) <= set(uv_sampler.col_of)):
            # RK stage refetch fast path: u/v-only sample from the
            # narrow companion table — same stencil layout and
            # arithmetic (bit-identical), ~1.5x the gather rate of the
            # full-width rows
            rows = uv_sampler.gather_rows(
                dev_state["packed_uv"], xi, yi, depth,
                dev_state["depths"], row_offset=row_offset)
            values.update(uv_sampler.values(rows, times, t, want_t))
            if not self.crs.is_latlon:
                gamma = self.crs.convergence(jnp, lon, lat)
                values = self.rotate_vectors_sampled(values, varnames,
                                                     gamma)
            return values, covers
        if want_t or want_n:
            ncols = [self._sampler.col_of[v][0] for v in want_n]
            res = self._sampler.gather_rows(
                dev_state["packed"], xi, yi, depth, dev_state["depths"],
                row_offset=row_offset, nearest_cols=ncols or None)
            if ncols:
                rows, near = res
                for v, c in zip(want_n, ncols):
                    values[v] = near[c]
            else:
                rows = res
            if want_t:
                values.update(self._sampler.values(rows, times, t, want_t))
        # rotate grid-relative vector pairs to east/north
        if not self.crs.is_latlon:
            gamma = self.crs.convergence(jnp, lon, lat)
            values = self.rotate_vectors_sampled(values, varnames, gamma)
        return values, covers

    # ------------------------------------------------- single-fetch RK --
    def supports_uv_block(self):
        """True when u/v ride the packed time-varying rows, so RK stages
        can re-evaluate one gathered corner block instead of refetching
        (used by drift:advection_single_fetch)."""
        s = getattr(self, "_sampler", None)
        return (s is not None and s.pair_mode in ("x", "xy", "xyz")
                and "x_sea_water_velocity" in self._group3
                + self._group2
                and "y_sea_water_velocity" in self._group3
                + self._group2)

    def corner_block(self, dev_state, lon, lat, z, member=None,
                     keep_vars=None):
        """Gather the stage-reusable corner block at the given positions;
        also returns the position coverage mask.  ``keep_vars`` defaults
        to the current components; passing every variable this reader
        serves lets the whole start-position environment ride these same
        4 gathers (block-backed env fetch — see
        Environment.get_environment)."""
        if keep_vars is None:
            keep_vars = ["x_sea_water_velocity", "y_sea_water_velocity"]
        xi, yi = self._grid_indices(lon, lat)
        covers = self._covers_idx(xi, yi)
        xi, yi, covers = self._local_idx(dev_state, xi, yi, covers)
        M = getattr(self, "ensemble_size", 1)
        if M > 1 and member is not None:
            row_offset = (member.astype(jnp.int32) % M) \
                * (self._sampler.Z * self._sampler.Y * self._sampler.X)
        else:
            row_offset = 0
        depth = jnp.maximum(-z, 0.0)
        block = self._sampler.gather_corner_block(
            dev_state["packed"], xi, yi, depth, dev_state["depths"],
            row_offset=row_offset, keep_vars=keep_vars)
        return block, covers

    def uv_corner_block(self, dev_state, lon, lat, z, member=None):
        """Corner block holding only u/v (single-fetch RK stages)."""
        return self.corner_block(dev_state, lon, lat, z, member=member)

    def sample_from_block(self, dev_state, block, t, lon, lat,
                          varnames):
        """Evaluate any kept variables from a gathered corner block at
        (possibly displaced) positions — no gathers.  Matches ``sample``
        bit-for-bit up to linear-blend ordering when the position equals
        the block's gather position."""
        xi, yi = self._grid_indices(lon, lat)
        xi, yi, _ = self._local_idx(dev_state, xi, yi)
        vals = self._sampler.eval_corner_block(
            block, xi, yi, dev_state["times"], t, varnames)
        if not self.crs.is_latlon:
            gamma = self.crs.convergence(jnp, lon, lat)
            vals = self.rotate_vectors_sampled(vals, varnames, gamma)
        # temporal coverage with one reader-step slack, like sample()
        times = dev_state["times"]
        covers_t = jnp.ones_like(lon, dtype=bool)
        if self.time_step is not None:
            slack = self.time_step.total_seconds()
            covers_t = (t >= times[0] - slack) & (t <= times[-1] + slack) \
                & covers_t
        return vals, covers_t

    def uv_from_block(self, dev_state, block, t, lon, lat):
        """Evaluate u/v from a gathered block at (possibly displaced)
        stage positions — no gathers, just VPU blends + rotation."""
        xi, yi = self._grid_indices(lon, lat)
        xi, yi, _ = self._local_idx(dev_state, xi, yi)
        names = ["x_sea_water_velocity", "y_sea_water_velocity"]
        vals = self._sampler.eval_corner_block(
            block, xi, yi, dev_state["times"], t, names)
        if not self.crs.is_latlon:
            gamma = self.crs.convergence(jnp, lon, lat)
            vals = self.rotate_vectors_sampled(vals, names, gamma)
        return vals["x_sea_water_velocity"], vals["y_sea_water_velocity"]

    def sample_profiles(self, dev_state, varnames, t, lon, lat, zlevels):
        """Profiles at fixed z-levels: per-level packed-row gathers."""
        want3 = [v for v in varnames if v in self._group3]
        out = {}
        if want3:
            xi, yi = self._grid_indices(lon, lat)
            xi, yi, _ = self._local_idx(dev_state, xi, yi)
            L = zlevels.shape[0]
            res = {v: [] for v in want3}
            for li in range(L):
                depth = jnp.maximum(-float(zlevels[li]), 0.0) \
                    + jnp.zeros_like(xi)
                rows = self._sampler.gather_rows(
                    dev_state["packed"], xi, yi, depth, dev_state["depths"])
                vals = self._sampler.values(rows, dev_state["times"], t,
                                            want3)
                for v in want3:
                    res[v].append(vals[v])
            for v in want3:
                out[v] = jnp.stack(res[v])  # (L, N)
        # fall back to level-looped scalar sampling for non-3D vars
        rest = [v for v in varnames if v not in want3]
        covers = None
        if rest:
            vals, covers = self.sample(dev_state, rest, t, lon, lat,
                                       jnp.zeros_like(lon))
            for v in rest:
                out[v] = jnp.broadcast_to(vals[v],
                                          (zlevels.shape[0],) + lon.shape)
        if covers is None:
            xi, yi = self._grid_indices(lon, lat)
            covers = self._covers_idx(xi, yi)
            _, _, covers = self._local_idx(dev_state, xi, yi, covers)
        return out, covers

    def _covers_idx(self, xi, yi, eps=1e-2):
        """In-grid test with a small index tolerance for f32 edge
        rounding (grid nodes on the boundary must count as covered)."""
        nx = self._ix.stop - self._ix.start
        ny = self._iy.stop - self._iy.start
        return ((xi >= -eps) & (xi <= nx - 1 + eps)
                & (yi >= -eps) & (yi <= ny - 1 + eps))


class ArrayReader(StructuredGridReader):
    """Structured forcing from in-memory numpy arrays.

    The reference reaches the same capability by wrapping arrays into an
    xarray Dataset for ``reader_netCDF_CF_generic``; here arrays feed the
    device packer directly.  Used by tests, benchmarks and the multichip
    dry run, and available to users as the zero-I/O structured reader.

    ``data``: {standard_name: ndarray} of shape (F, Y, X), (F, Z, Y, X),
    or (Y, X) for static fields (landmask, bathymetry).
    """

    def __init__(self, data, x, y, times, proj4="+proj=latlong",
                 depths=None, name=None):
        self._data = {k: np.asarray(v, dtype=np.float32)
                      for k, v in data.items()}
        self.x = np.asarray(x, dtype=np.float64)
        self.y = np.asarray(y, dtype=np.float64)
        self.times = list(times)
        self.proj4 = proj4
        self.depths = depths
        self.variables = list(self._data)
        self._var_has_z = {k: v.ndim == 4 for k, v in self._data.items()}
        for k, v in self._data.items():
            want = 2 if k in STATIC_VARIABLES and v.ndim == 2 else None
            if want is None and v.ndim not in (3, 4):
                raise ValueError(
                    f"ArrayReader: {k} must be (F,Y,X), (F,Z,Y,X) or "
                    f"static (Y,X); got shape {v.shape}")
        if name:
            self.name = name
        super().__init__()

    def _read_frame(self, std, ti, zslice, yslice, xslice):
        a = self._data[std]
        if a.ndim == 2:          # static (Y, X)
            return a[yslice, xslice]
        if a.ndim == 4:
            return a[ti][zslice, yslice, xslice]
        return a[ti][yslice, xslice]
