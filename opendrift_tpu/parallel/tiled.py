"""Engine-integrated forcing-grid domain decomposition.

This wires the scaling design of ``parallel/domain.py`` into the real
simulation engine: with ``o.set_config("parallel:domain_decomposition",
True)``, ``run()`` splits the primary structured reader's packed blocks
over a ``(ty, tx)`` device mesh — 1D Y bands by default, or a 2D Y x X
tiling via ``parallel:tile_grid = "RxC"`` — and the FULL fused step —
release, environment fetch, RK stage sampling, geodesic update,
landmask/seafloor interaction, model ``update()`` physics, vertical
mixing — executes inside one ``shard_map``.  This takes the
architectural slot of the reference's per-reader block buffers
(reference: opendrift/readers/basereader/structured.py:121-123) for
grids too large to replicate per chip (SURVEY.md §2.10).

Design:

* **Host** uploads **core** tiles only; the halo cells — sized by the
  reference's buffer rule ``max_speed*dt/dy+2``
  (reference variables.py:616-617), doubled to cover RK stage
  excursions — are exchanged **on device** between grid neighbours with
  ``jax.lax.ppermute`` (ICI on real hardware) once per forcing window:
  a Y phase over ``ty``, then an X phase of the Y-extended tile over
  ``tx`` (which carries the corners).  On a multi-process mesh each
  host reads only the forcing rows its devices own
  (``grid.packed_rows`` via ``jax.make_array_from_callback``).
* **Particles** live in fixed-capacity per-tile buffers (the element
  state sharded over the tile axes).  After every step, elements
  whose grid cell left their tile are packed into bounded leaver
  buffers and sent to the adjacent tile with one ``ppermute`` hop per
  direction and axis (dimension-ordered: Y pass then X pass delivers
  diagonal movers within one exchange) — migration is neighbour-only
  by construction (a particle cannot cross a whole tile in one step
  while the halo rule holds), so traffic is O(L) per link instead of
  the O(n_tiles * L) of an ``all_gather`` exchange.
* **Conservation is unconditional**: the receiver acknowledges each
  claimed element (one reverse ``ppermute`` of the claim mask) and the
  sender frees only acknowledged slots — an element that finds no free
  slot on the destination tile simply stays put (still sampled
  correctly from the halo) and retries at the next exchange.
* Readers with no gridded blocks (analytic fields, constants,
  oscillating test readers) are pure functions of position and run
  unchanged inside the shard_map; structured readers on a *different*
  grid than the primary (e.g. a coarse atmosphere grid) stay
  replicated — decomposition targets the grid that dominates memory.

Validated by tests/test_engine_dd.py: the 8-virtual-device tiled run
``allclose``-matches the single-device replicated gold for OceanDrift
RK4 on gridded forcing, and clumped-seeding stress runs conserve every
element through buffer-overflow conditions.
"""

import logging
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..elements.elements import NOT_RELEASED, ACTIVE

logger = logging.getLogger(__name__)


class DDContext:
    """Per-run state of an engine-level domain decomposition."""

    def __init__(self, sim, max_speed, dt, capacity_factor=2.0,
                 devices=None, max_leavers=None, tile_grid="auto"):
        import os
        from ..fields.grid import StructuredGridReader

        if devices is None:
            devices = jax.devices()
        self.n_tiles = len(devices)
        # tile topology: "auto" = 1D along Y (one Y band per device);
        # "RxC" = 2D Y x X tiling (R * C must equal the device count) —
        # right for domains wider than tall, where Y-only bands would
        # get thin and halo-dominated
        if tile_grid in (None, "auto", ""):
            self.n_ty, self.n_tx = self.n_tiles, 1
        else:
            try:
                r, c = tile_grid.lower().split("x")
                self.n_ty, self.n_tx = int(r), int(c)
            except ValueError:
                raise ValueError(
                    f"parallel:tile_grid must be 'auto' or 'RxC', got "
                    f"{tile_grid!r}")
            if self.n_ty * self.n_tx != self.n_tiles:
                raise ValueError(
                    f"parallel:tile_grid {tile_grid} needs "
                    f"{self.n_ty * self.n_tx} devices, have {self.n_tiles}")
        self.mesh = Mesh(
            np.array(devices).reshape(self.n_ty, self.n_tx),
            axis_names=("ty", "tx"))
        self.state_spec = P(("ty", "tx"))
        self.sim = sim
        # multi-host: tiles span processes; forcing rows are read
        # per-host (packed_rows), halo/migration ppermutes cross the
        # process boundary over DCN (docs/parallel.md)
        self.multihost = jax.process_count() > 1
        self.defer_pack = self.multihost or \
            os.environ.get("OPENDRIFT_DD_PER_HOST_READS") == "1"
        env = sim.env

        # primary reader: top-priority source of the current components
        tops = env.priority_list.get("x_sea_water_velocity", [])
        primary = None
        self.primary_idx = None
        for i, (reader, served) in enumerate(env._plan):
            if tops and reader.name == tops[0] and \
                    isinstance(reader, StructuredGridReader):
                primary, self.primary_idx = reader, i
                break
        if primary is None:
            raise ValueError(
                "parallel:domain_decomposition needs a structured gridded "
                "reader serving x_sea_water_velocity (analytic/constant "
                "current sources have no grid to decompose — use plain "
                "particle sharding)")
        self.primary = primary

        ny = primary._iy.stop - primary._iy.start
        nx = primary._ix.stop - primary._ix.start
        self.rows = -(-ny // self.n_ty)
        self.cols = -(-nx // self.n_tx)
        dy = abs(primary.delta_y)
        dx = abs(primary.delta_x)
        # grid spacing in metres. Three cases:
        # * curvilinear readers: axes are native indices (delta == 1);
        #   use the precomputed minimum cell dimension in metres
        # * geographic grids: dy is 111320 m/deg; dx shrinks with
        #   cos(lat) — use the subset's worst (highest-|lat|) row so
        #   halo_x is never undersized on Arctic domains, floored so a
        #   row touching the pole cannot blow the halo up unboundedly
        # * projected grids: axes already in metres
        latlon = getattr(primary.crs, "is_latlon", False)
        if getattr(primary, "_curvilinear", False):
            cell_m = getattr(primary, "_min_cell_m", None)
            if cell_m is None:
                raise ValueError(
                    "parallel:domain_decomposition on a curvilinear "
                    "primary reader requires its minimum cell size "
                    "(reader lacks _min_cell_m)")
            dy_m = dy * cell_m
            dx_m = dx * cell_m
        elif latlon:
            ys = np.asarray(primary.y, np.float64)[primary._iy]
            max_abs_lat = min(89.0, float(np.max(np.abs(ys))))
            coslat = max(math.cos(math.radians(max_abs_lat)), 0.02)
            dy_m = dy * 111320.0
            dx_m = dx * 111320.0 * coslat
        else:
            dy_m, dx_m = dy, dx
        # halo: the reference's buffer rule, doubled for RK stage
        # excursions + one unacknowledged-migration step of slack
        self.halo = int(math.ceil(2.0 * max_speed * abs(dt) / dy_m)) + 2
        self.halo_x = 0 if self.n_tx == 1 else \
            int(math.ceil(2.0 * max_speed * abs(dt) / dx_m)) + 2
        if self.halo > self.rows:
            raise ValueError(
                f"Domain decomposition infeasible: halo ({self.halo} rows) "
                f"exceeds tile height ({self.rows} rows of {ny}); use "
                f"fewer tiles or a shorter time step")
        if self.halo_x > self.cols:
            raise ValueError(
                f"Domain decomposition infeasible: halo ({self.halo_x} "
                f"columns) exceeds tile width ({self.cols} of {nx}); use "
                f"fewer X tiles or a shorter time step")
        self.capacity_factor = float(capacity_factor)
        self.max_leavers = max_leavers  # resolved in bin_initial_state
        self.cap = None

        # tile every plan reader living on the primary's exact grid
        # (typically: the one reader providing u/v/T/S/... together)
        self.tiled_idx = []
        for i, (reader, served) in enumerate(env._plan):
            if not isinstance(reader, StructuredGridReader):
                continue
            same = (reader is primary or (
                reader.proj4 == primary.proj4
                and reader._iy == primary._iy
                and abs(reader.delta_y - primary.delta_y)
                < 1e-9 * dy
                and reader.y[reader._iy.start]
                == primary.y[primary._iy.start]))
            if same:
                self.tiled_idx.append(i)
                # device_state keeps 'packed' on host so only the tiled
                # shards ever reach device memory
                reader._dd_keep_host = True
                # multi-host: skip the full-grid host packing entirely —
                # retile reads each host's row bands from the source
                reader._dd_defer_pack = self.defer_pack
        self._wrapped = {}

    def tile_index(self):
        """Traced linear tile id inside the shard_map (row-major over
        the (ty, tx) mesh — matches the slot layout of
        bin_initial_state)."""
        return (jax.lax.axis_index("ty") * self.n_tx
                + jax.lax.axis_index("tx"))

    # ------------------------------------------------------ host: particles
    def _tile_of(self, lon, lat):
        """Host-side linear tile assignment from positions (numpy)."""
        r = self.primary
        x, y = r.lonlat2xy(lon, lat)
        # positions outside the grid (e.g. beyond a curvilinear hull)
        # map to NaN — bin them to tile 0; they are uncovered anyway
        yi = np.nan_to_num(
            (np.asarray(y) - r.y[r._iy.start]) / r.delta_y, nan=0.0)
        ty = np.clip((yi // self.rows).astype(int), 0, self.n_ty - 1)
        if self.n_tx == 1:
            return ty
        xi = np.nan_to_num(
            (np.asarray(x) - r.x[r._ix.start]) / r.delta_x, nan=0.0)
        tx = np.clip((xi // self.cols).astype(int), 0, self.n_tx - 1)
        return ty * self.n_tx + tx

    def bin_initial_state(self, arrays, n_real):
        """Re-layout flat host state arrays into per-tile fixed buffers.

        Returns new arrays of shape (n_tiles * cap,); slot t*cap+s is
        slot s of tile t.  Empty slots: ID=0, status=NOT_RELEASED,
        release_tau=inf (never released, skipped on output reindex).
        """
        dest = self._tile_of(arrays["lon"][:n_real], arrays["lat"][:n_real])
        counts = np.bincount(dest, minlength=self.n_tiles)
        cap = max(int(counts.max()),
                  int(math.ceil(self.capacity_factor * n_real
                                / self.n_tiles)))
        cap = -(-cap // 8) * 8
        self.cap = cap
        if self.max_leavers is None:
            self.max_leavers = cap
        out = {}
        order = np.argsort(dest, kind="stable")
        slot_in_tile = np.empty(n_real, dtype=np.int64)
        slot_in_tile[order] = np.arange(n_real) - np.concatenate(
            [[0], np.cumsum(counts)[:-1]])[dest[order]]
        slots = dest * cap + slot_in_tile
        total = self.n_tiles * cap
        for name, v in arrays.items():
            v = np.asarray(v)
            if name == "ID":
                a = np.zeros(total, v.dtype)
            elif name == "status":
                a = np.full(total, NOT_RELEASED, v.dtype)
            elif name == "release_tau":
                a = np.full(total, np.inf, v.dtype)
            else:
                fill = 0 if not np.issubdtype(v.dtype, np.floating) else 0.0
                a = np.full(total, fill, v.dtype)
            a[slots] = v[:n_real]
            out[name] = a
        logger.info("Domain decomposition: %d tiles x %d rows (halo %d), "
                    "%d slots/tile for %d elements", self.n_tiles,
                    self.rows, self.halo, cap, n_real)
        return out

    def shard_state(self, state):
        sharding = NamedSharding(self.mesh, self.state_spec)
        if self.multihost:
            # every process holds the identical host state (seeding is
            # deterministic host code); each uploads only its shards
            from . import multihost
            return multihost.put_sharded(state, sharding)
        return jax.device_put(state, sharding)

    def gather(self, tree):
        """Host numpy copies of device output (snapshots, final state);
        cross-process gather when the tiles span processes."""
        from . import multihost
        return multihost.gather(tree, self.mesh)

    # ------------------------------------------------------- host: forcing -
    def retile(self, dev_states):
        """Split each tiled reader's packed rows into per-device (ty, tx)
        bands (core cells only — halos are exchanged on device) and
        refresh the reader's sampler to the local extended-tile
        geometry."""
        from ..ops.interp import PackedSampler
        out = list(dev_states)
        spec = NamedSharding(self.mesh, P("ty", "tx"))
        rows, cols = self.rows, self.cols
        n_ty, n_tx = self.n_ty, self.n_tx
        for i in self.tiled_idx:
            ds = dev_states[i]
            if ds is None:
                continue
            ds = dict(ds)
            reader = self.sim.env._plan[i][0]
            s = reader._sampler
            if ds.pop("packed_deferred", None):
                # per-host shard read: each process's callback runs only
                # for its addressable tiles, reading just those rows of
                # the forcing source (grid.packed_rows)
                plan = reader._pack_plan
                MZ = plan["M"] * plan["Z"]
                C = plan["Cf"]
                nx = plan["nx"]
                gshape = (n_ty, n_tx, MZ, rows, cols, C)

                def band_of(ty, tx, reader=reader, nx=nx):
                    band = reader.packed_rows(ty * rows, (ty + 1) * rows)
                    b = band[:, :, tx * cols:(tx + 1) * cols]
                    if b.shape[2] < cols:   # pad past the grid's right edge
                        b = np.concatenate(
                            [b, np.repeat(b[:, :, -1:],
                                          cols - b.shape[2], axis=2)],
                            axis=2)
                    return b

                def cb(idx, band_of=band_of):
                    tys = range(idx[0].start or 0,
                                idx[0].stop if idx[0].stop is not None
                                else n_ty)
                    txs = range(idx[1].start or 0,
                                idx[1].stop if idx[1].stop is not None
                                else n_tx)
                    return np.stack([
                        np.stack([band_of(ty, tx) for tx in txs])
                        for ty in tys])
                ds["packed_tiled"] = jax.make_array_from_callback(
                    gshape, spec, cb)
            else:
                packed = np.asarray(ds.pop("packed"))
                C = packed.shape[-1]
                MZ = packed.shape[0] // (s.Y * s.X)
                pk = packed.reshape(MZ, s.Y, s.X, C)
                pad_y = rows * n_ty - s.Y
                if pad_y:
                    pk = np.concatenate(
                        [pk, np.repeat(pk[:, -1:], pad_y, axis=1)], axis=1)
                pad_x = cols * n_tx - s.X
                if pad_x:
                    pk = np.concatenate(
                        [pk, np.repeat(pk[:, :, -1:], pad_x, axis=2)],
                        axis=2)
                pk = np.ascontiguousarray(
                    pk.reshape(MZ, n_ty, rows, n_tx, cols, C)
                    .transpose(1, 3, 0, 2, 4, 5))
                ds["packed_tiled"] = jax.device_put(pk, spec)
            # sampler geometry becomes the extended local tile
            reader._sampler = PackedSampler(
                s.Z, rows + 2 * self.halo, cols + 2 * self.halo_x, s.F,
                s.col_of, s.pair_mode)
            out[i] = ds
        return tuple(out)

    # --------------------------------------------------- device: in the map
    def local_dev_states(self, dev_states):
        """Inside shard_map: halo-exchange each tiled core band into the
        extended local tile and attach the tile's global offsets.

        Two phases: Y rows over the 'ty' axis, then X columns of the
        Y-extended tile over 'tx' — the second phase carries the corner
        halos automatically.  Partial perms: tiles with no source
        receive zeros, then the domain edges replace them with
        edge-replicated cells.
        """
        h, hx = self.halo, self.halo_x
        n_ty, n_tx = self.n_ty, self.n_tx
        ty = jax.lax.axis_index("ty")
        tx = jax.lax.axis_index("tx")
        out = []
        for i, ds in enumerate(dev_states):
            if ds is None or not isinstance(ds, dict) \
                    or "packed_tiled" not in ds:
                out.append(ds)
                continue
            d = dict(ds)
            core = d.pop("packed_tiled")[0][0]   # (MZ, rows, cols, C)
            # ---- phase Y
            from_below = jax.lax.ppermute(
                core[:, -h:], "ty", [(k, k + 1) for k in range(n_ty - 1)])
            from_above = jax.lax.ppermute(
                core[:, :h], "ty", [(k, k - 1) for k in range(1, n_ty)])
            from_below = jnp.where(
                ty == 0, jnp.broadcast_to(core[:, :1], from_below.shape),
                from_below)
            from_above = jnp.where(
                ty == n_ty - 1,
                jnp.broadcast_to(core[:, -1:], from_above.shape),
                from_above)
            ext = jnp.concatenate([from_below, core, from_above], axis=1)
            # ---- phase X (skipped under 1D tiling)
            if n_tx > 1 and hx > 0:
                from_left = jax.lax.ppermute(
                    ext[:, :, -hx:], "tx",
                    [(k, k + 1) for k in range(n_tx - 1)])
                from_right = jax.lax.ppermute(
                    ext[:, :, :hx], "tx",
                    [(k, k - 1) for k in range(1, n_tx)])
                from_left = jnp.where(
                    tx == 0,
                    jnp.broadcast_to(ext[:, :, :1], from_left.shape),
                    from_left)
                from_right = jnp.where(
                    tx == n_tx - 1,
                    jnp.broadcast_to(ext[:, :, -1:], from_right.shape),
                    from_right)
                ext = jnp.concatenate([from_left, ext, from_right],
                                      axis=2)
                d["x_off"] = (tx * self.cols - hx).astype(jnp.float32)
            d["packed"] = ext.reshape(-1, ext.shape[-1])
            d["y_off"] = (ty * self.rows - h).astype(jnp.float32)
            out.append(d)
        return tuple(out)

    def migrate(self, data):
        """Inside shard_map: neighbour-only particle exchange with
        receiver acknowledgement (see module docstring).  ``data`` is the
        element-state dict of per-slot arrays; returns the updated dict.

        2D tiling routes dimension-ordered (Y pass, then X pass): a
        diagonal mover crosses in Y first and is delivered in X within
        the same exchange.  Sort-free: packing uses cumsum ranks +
        dropped-index scatters (TPU sorts run on the scalar core;
        O(cap) VPU work here).
        """
        if self.n_ty > 1:
            data = self._migrate_axis(data, "ty", self.n_ty, which="y")
        if self.n_tx > 1:
            data = self._migrate_axis(data, "tx", self.n_tx, which="x")
        return data

    def _migrate_axis(self, data, axis, n, which):
        size = self.rows if which == "y" else self.cols
        idx = jax.lax.axis_index(axis)
        xi, yi = self.primary._grid_indices(data["lon"], data["lat"])
        gi = yi if which == "y" else xi
        occ = data["ID"] > 0
        movable = occ & (data["status"] == ACTIVE) & jnp.isfinite(gi)
        dest = jnp.clip(jnp.floor(gi / size).astype(jnp.int32), 0, n - 1)
        # neighbour-only guarantee (the halo rule bounds one step's travel
        # to under a tile height; clamping keeps pathological cases safe —
        # they hop one tile per exchange)
        dest = jnp.clip(dest, idx - 1, idx + 1)
        dest = jnp.where(movable, dest, idx)
        go_up = dest > idx
        go_dn = dest < idx

        fkeys = sorted(k for k in data
                       if jnp.issubdtype(data[k].dtype, jnp.floating))
        ikeys = sorted(k for k in data
                       if not jnp.issubdtype(data[k].dtype, jnp.floating))
        fmat = jnp.stack([data[k] for k in fkeys], axis=1)
        imat = jnp.stack([data[k].astype(jnp.int32) for k in ikeys],
                         axis=1)
        cap = occ.shape[0]
        L = min(self.max_leavers, cap)

        def pack(mask):
            rank = jnp.cumsum(mask) - 1
            shipped = mask & (rank < L)
            slot = jnp.where(shipped, rank, L)
            pf = jnp.zeros((L, fmat.shape[1]), fmat.dtype).at[slot].set(
                fmat, mode="drop")
            pi = jnp.zeros((L, imat.shape[1]), jnp.int32).at[slot].set(
                imat, mode="drop")
            pocc = jnp.zeros((L,), bool).at[slot].set(shipped, mode="drop")
            return pf, pi, pocc, shipped, slot

        up = pack(go_up)
        dn = pack(go_dn)
        perm_up = [(k, k + 1) for k in range(n - 1)]
        perm_dn = [(k, k - 1) for k in range(1, n)]
        pp = partial(jax.lax.ppermute, axis_name=axis)
        in_f = jnp.concatenate([pp(up[0], perm=perm_up),
                                pp(dn[0], perm=perm_dn)])
        in_i = jnp.concatenate([pp(up[1], perm=perm_up),
                                pp(dn[1], perm=perm_dn)])
        in_occ = jnp.concatenate([pp(up[2], perm=perm_up),
                                  pp(dn[2], perm=perm_dn)])

        # claim arrivals into free slots: rank incoming, rank free slots
        # via a dropped-index scatter of arange, masked scatter-add write
        free = ~occ
        free_rank = jnp.cumsum(free) - 1
        slot_of_rank = jnp.zeros((cap,), jnp.int32).at[
            jnp.where(free, free_rank, cap)].set(
            jnp.arange(cap, dtype=jnp.int32), mode="drop")
        n_free = jnp.sum(free)
        in_rank = jnp.cumsum(in_occ) - 1
        ok = in_occ & (in_rank < n_free)
        slot = slot_of_rank[jnp.clip(in_rank, 0, cap - 1)]
        okf = ok[:, None]
        # scatter-add of (new - old) masked by ok: non-claimed entries
        # contribute exactly 0, so duplicate indices cannot corrupt a
        # claimed slot (a plain scatter-set would race)
        fmat = fmat.at[slot].add(jnp.where(okf, in_f - fmat[slot], 0))
        imat = imat.at[slot].add(jnp.where(okf, in_i - imat[slot], 0))

        # acknowledge claims back to the senders; free only acked slots
        ack_up = pp(ok[:L], perm=perm_dn)   # receiver d -> sender d-1
        ack_dn = pp(ok[L:], perm=perm_up)   # receiver d -> sender d+1
        pad = jnp.zeros((1,), bool)
        ack_up = jnp.concatenate([ack_up, pad])
        ack_dn = jnp.concatenate([ack_dn, pad])
        freed = (up[3] & ack_up[up[4]]) | (dn[3] & ack_dn[dn[4]])

        out = {}
        for j, k in enumerate(fkeys):
            out[k] = fmat[:, j]
        for j, k in enumerate(ikeys):
            out[k] = imat[:, j].astype(data[k].dtype)
        out["ID"] = jnp.where(freed, 0, out["ID"])
        out["status"] = jnp.where(freed, NOT_RELEASED, out["status"])
        out["release_tau"] = jnp.where(freed, jnp.inf, out["release_tau"])
        return out

    # ------------------------------------------------------ compile wrapper
    def _dev_specs(self, dev_states):
        specs = []
        for ds in dev_states:
            if isinstance(ds, dict):
                specs.append({
                    k: (P("ty", "tx", None, None, None, None)
                        if k == "packed_tiled" else P()) for k in ds})
            else:
                # analytic/constant readers: replicate whatever they hold
                specs.append(P())
        return tuple(specs)

    def wrap_advance(self, fn):
        """shard_map + jit the (state, dev_states, t, key) -> (state, snap)
        advance over the tiles mesh, with spec trees built from the actual
        argument structure on first call (cached per structure)."""
        def build(dev_states):
            kstr = jax.tree_util.tree_structure(dev_states)
            cached = self._wrapped.get(("adv", kstr))
            if cached is None:
                mapped = shard_map(
                    fn, mesh=self.mesh,
                    in_specs=(self.state_spec,
                              self._dev_specs(dev_states), P(), P()),
                    out_specs=(self.state_spec, self.state_spec),
                    check_vma=False)
                cached = jax.jit(mapped, donate_argnums=(0,))
                self._wrapped[("adv", kstr)] = cached
            return cached

        def call(state, dev_states, t0_rel, key):
            return build(dev_states)(state, dev_states, t0_rel, key)
        # exposes the underlying jit for AOT lowering without execution
        # (tools/ici_model.py extracts per-step collective bytes)
        call.build = build
        return call

    def wrap_final(self, fn):
        def call(state, dev_states, t_rel):
            kstr = jax.tree_util.tree_structure(dev_states)
            cached = self._wrapped.get(("fin", kstr))
            if cached is None:
                mapped = shard_map(
                    fn, mesh=self.mesh,
                    in_specs=(self.state_spec,
                              self._dev_specs(dev_states), P()),
                    out_specs=self.state_spec,
                    check_vma=False)
                cached = jax.jit(mapped)
                self._wrapped[("fin", kstr)] = cached
            return cached(state, dev_states, t_rel)
        return call

    # --------------------------------------------------------- host: output
    def reorder_frame(self, frame, n_real, keep_id=False):
        """Re-index a device snapshot (per-slot arrays, slots move with
        migration) into trajectory order by element ID.

        Also surfaces the overflow failure mode loudly: an ACTIVE element
        whose position tile differs from its owning tile is stuck
        in-transit (destination buffers full).  Within the halo it is
        still sampled exactly; beyond it, it degrades to the uncovered-
        position semantics (fallback values / missing-data deactivation).
        """
        order = list(frame)          # keep ID's original position so
        ids = np.asarray(frame.pop("ID"))  # plain and sharded output
        if not keep_id:                    # agree on variable order
            order.remove("ID")
        valid = (ids > 0) & (ids <= n_real)
        if "lon" in frame and "status" in frame and self.cap:
            act = valid & (np.asarray(frame["status"]) == ACTIVE)
            own = np.arange(ids.shape[0]) // self.cap
            pos = self._tile_of(np.asarray(frame["lon"])[act],
                                np.asarray(frame["lat"])[act])
            n_transit = int((own[act] != pos).sum())
            self.last_in_transit = n_transit
            if n_transit:
                logger.warning(
                    "%d element(s) stuck in-transit (destination tile "
                    "buffers full) — raise parallel:tile_capacity_factor",
                    n_transit)
        out = {}
        for name in order:
            if name == "ID":
                out["ID"] = np.arange(1, n_real + 1, dtype=ids.dtype)
                continue
            v = np.asarray(frame[name])
            if np.issubdtype(v.dtype, np.floating):
                a = np.full(n_real, np.nan, v.dtype)
            elif name == "status":
                a = np.full(n_real, NOT_RELEASED, v.dtype)
            else:
                a = np.zeros(n_real, v.dtype)
            a[ids[valid] - 1] = v[valid]
            out[name] = a
        return out
