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
    """Host-side tiling of a (V, F, Y, X) block group along Y."""

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
        # (tiles, V, F, rows, X) — device d owns rows [d*rows, (d+1)*rows)
        self.core = np.stack(
            [blocks[:, :, d * rows:(d + 1) * rows] for d in range(n_tiles)])
        self.times = np.asarray(times, dtype=np.float32)

    def device_arrays(self, mesh):
        tiled = jax.device_put(
            jnp.asarray(self.core),
            NamedSharding(mesh, P("tiles", None, None, None, None)))
        times = jax.device_put(jnp.asarray(self.times),
                               NamedSharding(mesh, P()))
        return tiled, times


def halo_exchange(core, halo):
    """Inside shard_map: pad a local (V, F, rows, X) tile with ``halo``
    rows from the ring neighbours (edge-replicated at the domain ends).

    Uses two ppermute shifts — down-neighbour rows arrive from tile d+1,
    up rows from tile d-1.
    """
    n = jax.lax.axis_size("tiles")
    idx = jax.lax.axis_index("tiles")
    top_rows = core[:, :, -halo:, :]      # my top rows -> neighbour above
    bot_rows = core[:, :, :halo, :]       # my bottom rows -> neighbour below
    # receive from below (d-1's top rows) and above (d+1's bottom rows)
    from_below = jax.lax.ppermute(
        top_rows, "tiles", [(i, (i + 1) % n) for i in range(n)])
    from_above = jax.lax.ppermute(
        bot_rows, "tiles", [(i, (i - 1) % n) for i in range(n)])
    # domain edges: replicate own edge rows instead of wrapping
    from_below = jnp.where(idx == 0, core[:, :, :1, :] * jnp.ones_like(
        from_below), from_below)
    from_above = jnp.where(idx == n - 1, core[:, :, -1:, :] *
                           jnp.ones_like(from_above), from_above)
    return jnp.concatenate([from_below, core, from_above], axis=2)


def _sample_tile(tile, times, xi, yi_local, t, halo):
    """Bilinear sample of an extended local tile (V, F, rows+2h, X) at
    fractional indices; yi_local is relative to the tile's core row 0."""
    V, F, H, X = tile.shape
    yi = yi_local + halo
    ti = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0,
                  max(F - 2, 0))
    tw = jnp.where(F > 1,
                   jnp.clip((t - times[ti]) /
                            jnp.maximum(times[jnp.minimum(ti + 1, F - 1)]
                                        - times[ti], 1e-9), 0.0, 1.0), 0.0)
    x0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, X - 2)
    y0 = jnp.clip(jnp.floor(yi).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(xi - x0, 0.0, 1.0)
    fy = jnp.clip(yi - y0, 0.0, 1.0)
    flat = tile.reshape(V, F * H * X)

    def gather(tt, yy, xx):
        lin = (tt * H + yy) * X + xx
        return jnp.take(flat, lin, axis=1)
    out = 0.0
    for tt, wt in ((ti, 1.0 - tw), (jnp.minimum(ti + 1, F - 1), tw)):
        out = out + wt * (
            gather(tt, y0, x0) * (1 - fy) * (1 - fx)
            + gather(tt, y0, x0 + 1) * (1 - fy) * fx
            + gather(tt, y0 + 1, x0) * fy * (1 - fx)
            + gather(tt, y0 + 1, x0 + 1) * fy * fx)
    return out


def make_tiled_stepper(grid, mesh, dt, n_substeps, max_leavers):
    """Build the jitted multi-step advance over the decomposed domain.

    Particle buffers: dict of (n_tiles, cap) arrays with an ``alive``
    mask; u/v are blocks 0/1 of the tiled field.  Returns
    ``advance(core_tiles, times, particles, t0) -> particles``.
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
        uv = _sample_tile(tile_ext, times, xi, yi_local, t, halo)
        alive = p["alive"]
        p = dict(p)
        p["x"] = jnp.where(alive, p["x"] + uv[0] * dt, p["x"])
        p["y"] = jnp.where(alive, p["y"] + uv[1] * dt, p["y"])
        return p

    def migrate(p):
        """Fixed-size particle exchange: pack leavers, all_gather, claim."""
        tile_idx = jax.lax.axis_index("tiles")
        yi = (p["y"] - y0g) / dy
        dest = jnp.clip((yi // rows).astype(jnp.int32), 0, n - 1)
        alive = p["alive"]
        leaving = alive & (dest != tile_idx)
        # pack up to L leavers (priority: first L; overflow stays put one
        # step and is counted so callers can size L)
        order = jnp.argsort(~leaving)          # leavers first
        take = order[:L]
        is_leaver = leaving[take]
        packed = {k: p[k][take] for k in p}
        packed_dest = jnp.where(is_leaver, dest[take], -1)
        # remove the shipped leavers locally
        shipped = jnp.zeros_like(alive).at[take].set(is_leaver)
        p = dict(p)
        p["alive"] = alive & ~shipped
        # exchange: every tile sees all leaver buffers
        all_packed = {k: jax.lax.all_gather(packed[k], "tiles")
                      for k in packed}                    # (n, L)
        all_dest = jax.lax.all_gather(packed_dest, "tiles")  # (n, L)
        mine = (all_dest == tile_idx).reshape(-1)
        cand = {k: all_packed[k].reshape(n * L, *all_packed[k].shape[2:])
                for k in all_packed}
        # claim into free slots: rank incoming, rank free slots, scatter
        cap = p["alive"].shape[0]
        incoming_rank = jnp.cumsum(mine) - 1          # (n*L,)
        free = ~p["alive"]
        free_slots = jnp.argsort(~free)               # free slots first
        n_free = jnp.sum(free)
        ok = mine & (incoming_rank < n_free)
        slot = free_slots[jnp.clip(incoming_rank, 0, cap - 1)]
        # scatter-add of (new - old) masked by ok: duplicate slots from
        # non-claimed entries contribute exactly 0, so write order cannot
        # corrupt a claimed slot (plain scatter-set would race)
        for k in p:
            if k == "alive":
                continue
            delta = jnp.where(ok, cand[k] - p[k][slot], 0).astype(p[k].dtype)
            p[k] = p[k].at[slot].add(delta)
        p["alive"] = p["alive"].at[slot].max(ok)
        return p

    def tile_fn(core, times, p, t0):
        # local shards keep a leading tile axis of length 1 -> drop it
        core = core[0]
        p = {k: v[0] for k, v in p.items()}
        tile_ext = halo_exchange(core, halo)

        def body(i, p):
            t = t0 + i.astype(jnp.float32) * dt
            p = local_step(tile_ext, times, p, t)
            return migrate(p)
        p = jax.lax.fori_loop(0, n_substeps, body, p)
        return {k: v[None] for k, v in p.items()}  # re-add tile axis

    pspec = P("tiles", None)
    fn = shard_map(
        tile_fn, mesh=mesh,
        in_specs=(P("tiles", None, None, None, None), P(), pspec, P()),
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
