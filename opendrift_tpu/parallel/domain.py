"""Forcing-grid domain decomposition with ICI halo exchange and particle
migration.

This is the scaling path for grids too large to replicate per chip
(SURVEY.md §2.10: the slot the reference fills with per-reader block
buffers, basereader/structured.py:121-123).  Design:

* the field grid is split along Y into one tile per device ('tiles' mesh
  axis); the host uploads **core** tiles only (no overlap), and the halo
  rows — sized by the reference's buffer rule ``max_speed*dt/dy + 2``
  (reference variables.py:616-617) — are exchanged **on device** between
  ring neighbours with ``jax.lax.ppermute`` (ICI on real hardware);
* particles live in fixed-capacity per-tile buffers; after each step,
  elements that moved off their tile are packed into a bounded "leaver"
  buffer, ``all_gather``-ed around the mesh, and claimed by the owning
  tile into free slots — shapes stay static, nothing is ever compacted;
* the whole step (sample -> advect -> migrate) runs inside one
  ``shard_map``, so XLA sees only the two collectives we wrote.

The test suite validates halo correctness (trajectories match the
single-device run while particles stay within halo reach) and migration
conservation (count and ID-set invariance) on a virtual CPU mesh.
"""

import logging
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

logger = logging.getLogger(__name__)


class TiledGrid:
    """Host-side tiling of a (V, F, Y, X) block group along Y.

    The device layout is row-packed like the structured readers'
    PackedSampler (ops/interp.py): per cell one contiguous row holding
    all variables x frames plus the x+1 neighbour's copy, so one sample
    needs 2 gathers (y0/y1 rows) regardless of V and F — TPU gathers cost
    per index, not per byte.
    """

    def __init__(self, blocks, times, y0, dy, x0, dx, n_tiles, halo):
        """``blocks``: numpy (V, F, Y, X).  Core rows per tile are equal
        (grid padded with edge rows if needed)."""
        blocks = np.asarray(blocks, dtype=np.float32)
        V, F, Y, X = blocks.shape
        rows = -(-Y // n_tiles)          # core rows per tile
        pad = rows * n_tiles - Y
        if pad:
            blocks = np.concatenate(
                [blocks, np.repeat(blocks[:, :, -1:], pad, axis=2)], axis=2)
        self.n_tiles = n_tiles
        self.halo = int(halo)
        self.rows = rows
        self.V, self.F, self.X = V, F, X
        self.y0, self.dy, self.x0, self.dx = y0, dy, x0, dx
        self.ny_global = Y
        # pack rows: (Y, X, V*F) + the x+1 neighbour -> (Y, X, 2*V*F)
        packed = blocks.transpose(2, 3, 0, 1).reshape(
            rows * n_tiles, X, V * F)
        xnbr = np.concatenate([packed[:, 1:], packed[:, -1:]], axis=1)
        packed = np.concatenate([packed, xnbr], axis=2)
        # (tiles, rows, X, C) — device d owns rows [d*rows, (d+1)*rows)
        self.core = np.stack(
            [packed[d * rows:(d + 1) * rows] for d in range(n_tiles)])
        self.times = np.asarray(times, dtype=np.float32)

    def device_arrays(self, mesh):
        tiled = jax.device_put(
            jnp.asarray(self.core),
            NamedSharding(mesh, P("tiles", None, None, None)))
        times = jax.device_put(jnp.asarray(self.times),
                               NamedSharding(mesh, P()))
        return tiled, times


def halo_exchange(core, halo):
    """Inside shard_map: pad a local (rows, X, C) tile with ``halo`` rows
    from the ring neighbours (edge-replicated at the domain ends).

    Uses two ppermute shifts — down-neighbour rows arrive from tile d+1,
    up rows from tile d-1.
    """
    n = jax.lax.axis_size("tiles")
    idx = jax.lax.axis_index("tiles")
    top_rows = core[-halo:]      # my top rows -> neighbour above
    bot_rows = core[:halo]       # my bottom rows -> neighbour below
    # receive from below (d-1's top rows) and above (d+1's bottom rows)
    from_below = jax.lax.ppermute(
        top_rows, "tiles", [(i, (i + 1) % n) for i in range(n)])
    from_above = jax.lax.ppermute(
        bot_rows, "tiles", [(i, (i - 1) % n) for i in range(n)])
    # domain edges: replicate own edge rows instead of wrapping
    from_below = jnp.where(idx == 0,
                           core[:1] * jnp.ones_like(from_below),
                           from_below)
    from_above = jnp.where(idx == n - 1,
                           core[-1:] * jnp.ones_like(from_above),
                           from_above)
    return jnp.concatenate([from_below, core, from_above], axis=0)


def _sample_tile(tile, times, xi, yi_local, t, halo, V, F):
    """Bilinear sample of an extended packed tile (rows+2h, X, 2*V*F) at
    fractional indices; yi_local is relative to the tile's core row 0.
    Two row gathers for all variables and frames; x/y/time blends on the
    VPU.  Returns (V, N)."""
    H, X, C = tile.shape
    q = C // 2
    yi = yi_local + halo
    x0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, X - 2)
    y0 = jnp.clip(jnp.floor(yi).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(xi - x0, 0.0, 1.0)[:, None]
    fy = jnp.clip(yi - y0, 0.0, 1.0)[:, None]
    flat = tile.reshape(H * X, C)
    g0 = jnp.take(flat, y0 * X + x0, axis=0, mode="clip")
    g1 = jnp.take(flat, (y0 + 1) * X + x0, axis=0, mode="clip")
    row0 = g0[:, :q] * (1.0 - fx) + g0[:, q:] * fx
    row1 = g1[:, :q] * (1.0 - fx) + g1[:, q:] * fx
    rows = row0 * (1.0 - fy) + row1 * fy          # (N, V*F)
    if F == 1:
        return rows.T                              # (V, N)
    ti = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0,
                  max(F - 2, 0))
    tw = jnp.clip((t - times[ti]) /
                  jnp.maximum(times[jnp.minimum(ti + 1, F - 1)]
                              - times[ti], 1e-9), 0.0, 1.0)
    vf = rows.reshape(-1, V, F)
    v0 = jax.lax.dynamic_slice_in_dim(vf, ti, 1, axis=2)[..., 0]
    v1 = jax.lax.dynamic_slice_in_dim(
        vf, jnp.minimum(ti + 1, F - 1), 1, axis=2)[..., 0]
    return (v0 * (1.0 - tw) + v1 * tw).T           # (V, N)


def make_tiled_stepper(grid, mesh, dt, n_substeps, max_leavers,
                       migrate_every=1):
    """Build the jitted multi-step advance over the decomposed domain.

    Particle buffers: dict of (n_tiles, cap) arrays with an ``alive``
    mask; u/v are blocks 0/1 of the tiled field.  Returns
    ``advance(core_tiles, times, particles, t0) -> particles``.

    ``migrate_every``: run the exchange every K substeps instead of every
    substep — valid while ``K * max_speed * dt <= (halo - 1) * dy`` (a
    particle must stay within its tile's halo between exchanges; the halo
    rule mirrors the reference's buffer formula, variables.py:616-617).
    Migration is the collective+scatter-heavy part, so K>1 trades nothing
    for a near-K-fold cut in its cost.
    """
    halo = grid.halo
    rows = grid.rows
    dy, dx = grid.dy, grid.dx
    y0g, x0g = grid.y0, grid.x0
    n = grid.n_tiles
    L = max_leavers

    def local_step(tile_ext, times, p, t):
        """One Euler substep on this tile (x/y in metres, planar demo)."""
        tile_idx = jax.lax.axis_index("tiles")
        row_offset = tile_idx * rows
        xi = (p["x"] - x0g) / dx
        yi_local = (p["y"] - y0g) / dy - row_offset
        uv = _sample_tile(tile_ext, times, xi, yi_local, t, halo,
                          grid.V, grid.F)
        alive = p["alive"]
        p = dict(p)
        p["x"] = jnp.where(alive, p["x"] + uv[0] * dt, p["x"])
        p["y"] = jnp.where(alive, p["y"] + uv[1] * dt, p["y"])
        return p

    def migrate(p):
        """Fixed-size particle exchange: pack leavers, all_gather, claim.

        Sort-free: TPU sorts run on the scalar core at ~1e6 keys/ms, so
        the packing uses cumsum ranks + dropped-index scatters instead of
        the classical argsort compaction — O(cap) VPU work.
        """
        tile_idx = jax.lax.axis_index("tiles")
        yi = (p["y"] - y0g) / dy
        dest = jnp.clip((yi // rows).astype(jnp.int32), 0, n - 1)
        alive = p["alive"]
        leaving = alive & (dest != tile_idx)
        cap = alive.shape[0]
        # pack up to L leavers by cumsum rank (overflow stays put one
        # exchange; ranks of shipped leavers are unique, non-shipped
        # entries scatter to index L and are dropped)
        rank = jnp.cumsum(leaving) - 1
        shipped = leaving & (rank < L)
        slot_idx = jnp.where(shipped, rank, L)
        # pack ALL payload keys into one float and one int matrix first —
        # scatters/gathers cost per *index*, so one matrix scatter beats
        # one scatter per key by the key count
        fkeys = sorted(k for k in p if k != "alive"
                       and jnp.issubdtype(p[k].dtype, jnp.floating))
        ikeys = sorted(k for k in p if k != "alive"
                       and not jnp.issubdtype(p[k].dtype, jnp.floating))
        fmat = jnp.stack([p[k] for k in fkeys], axis=1)     # (cap, Kf)
        imat = jnp.stack([p[k].astype(jnp.int32) for k in ikeys],
                         axis=1)                            # (cap, Ki)
        packed_f = jnp.zeros((L, len(fkeys)), fmat.dtype).at[
            slot_idx].set(fmat, mode="drop")
        packed_i = jnp.zeros((L, len(ikeys)), jnp.int32).at[
            slot_idx].set(imat, mode="drop")
        packed_dest = jnp.full((L,), -1, jnp.int32).at[slot_idx].set(
            dest, mode="drop")
        alive = alive & ~shipped
        # exchange: every tile sees all leaver buffers
        all_f = jax.lax.all_gather(packed_f, "tiles")       # (n, L, Kf)
        all_i = jax.lax.all_gather(packed_i, "tiles")
        all_dest = jax.lax.all_gather(packed_dest, "tiles")  # (n, L)
        mine = (all_dest == tile_idx).reshape(-1)
        cand_f = all_f.reshape(n * L, -1)
        cand_i = all_i.reshape(n * L, -1)
        # claim into free slots: rank incoming, rank free slots via a
        # dropped-index scatter of arange (slot_of_rank[r] = r-th free
        # slot), then a masked scatter-add
        incoming_rank = jnp.cumsum(mine) - 1          # (n*L,)
        free = ~alive
        free_rank = jnp.cumsum(free) - 1              # (cap,)
        slot_of_rank = jnp.zeros((cap,), jnp.int32).at[
            jnp.where(free, free_rank, cap)].set(
            jnp.arange(cap, dtype=jnp.int32), mode="drop")
        n_free = jnp.sum(free)
        ok = mine & (incoming_rank < n_free)
        slot = slot_of_rank[jnp.clip(incoming_rank, 0, cap - 1)]
        # scatter-add of (new - old) masked by ok: duplicate slots from
        # non-claimed entries contribute exactly 0, so write order cannot
        # corrupt a claimed slot (plain scatter-set would race)
        okf = ok[:, None]
        fmat = fmat.at[slot].add(jnp.where(okf, cand_f - fmat[slot], 0))
        imat = imat.at[slot].add(jnp.where(okf, cand_i - imat[slot], 0))
        p = dict(p)
        p["alive"] = alive.at[slot].max(ok)
        for j, k in enumerate(fkeys):
            p[k] = fmat[:, j]
        for j, k in enumerate(ikeys):
            p[k] = imat[:, j].astype(p[k].dtype)
        return p

    def tile_fn(core, times, p, t0):
        # local shards keep a leading tile axis of length 1 -> drop it
        core = core[0]
        p = {k: v[0] for k, v in p.items()}
        tile_ext = halo_exchange(core, halo)

        def body(i, p):
            t = t0 + i.astype(jnp.float32) * dt
            p = local_step(tile_ext, times, p, t)
            if migrate_every <= 1:
                return migrate(p)
            return jax.lax.cond(
                (i + 1) % migrate_every == 0, migrate, lambda q: q, p)
        p = jax.lax.fori_loop(0, n_substeps, body, p)
        if n_substeps % migrate_every != 0:
            p = migrate(p)      # leave the buffers correctly owned
        return {k: v[None] for k, v in p.items()}  # re-add tile axis

    pspec = P("tiles", None)
    fn = shard_map(
        tile_fn, mesh=mesh,
        in_specs=(P("tiles", None, None, None), P(), pspec, P()),
        out_specs=pspec, check_vma=False)
    return jax.jit(fn)


def assign_particles_to_tiles(x, y, grid, cap=None):
    """Host-side initial binning of particles into per-tile buffers."""
    n = grid.n_tiles
    yi = (np.asarray(y) - grid.y0) / grid.dy
    dest = np.clip((yi // grid.rows).astype(int), 0, n - 1)
    if cap is None:
        cap = max(8, int(2 * len(x) / n + 8))
    out = {"x": np.zeros((n, cap), np.float32),
           "y": np.zeros((n, cap), np.float32),
           "pid": np.full((n, cap), -1, np.int32),
           "alive": np.zeros((n, cap), bool)}
    fill = np.zeros(n, int)
    for i in range(len(x)):
        d = dest[i]
        s = fill[d]
        if s >= cap:
            raise ValueError("tile buffer capacity exceeded at seeding")
        out["x"][d, s] = x[i]
        out["y"][d, s] = y[i]
        out["pid"][d, s] = i
        out["alive"][d, s] = True
        fill[d] += 1
    return out


def gather_particles(p):
    """Host-side: collect (pid -> x, y) from the tile buffers."""
    pid = np.asarray(p["pid"]).ravel()
    alive = np.asarray(p["alive"]).ravel()
    x = np.asarray(p["x"]).ravel()
    y = np.asarray(p["y"]).ravel()
    order = pid[alive]
    out_x = np.full(order.max() + 1 if len(order) else 0, np.nan)
    out_y = np.full_like(out_x, np.nan)
    out_x[order] = x[alive]
    out_y[order] = y[alive]
    return out_x, out_y
