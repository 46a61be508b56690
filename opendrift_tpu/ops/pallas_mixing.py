"""Pallas TPU kernel for the Visser vertical-mixing inner loop.

The mixing inner loop is the framework's dominant FLOP source (reference:
opendrift/models/oceandrift.py:397-571 runs dt/dt_mix Visser substeps per
outer step, each with a fresh RNG draw per element — the reference's own
heaviest benchmark, tests/benchmarks/performance_test.py:117-129).  The
jnp fallback (models/oceandrift.py:vertical_mixing) expresses it as a
``lax.fori_loop`` whose carry bounces through HBM every substep and whose
RNG is counter-based threefry (~20 rounds per draw).

This kernel instead runs the *whole* inner loop per element tile inside
VMEM: one HBM read of the per-element inputs, ``ntimes`` substeps on the
VPU, one HBM write of the final depths.  Memory traffic drops from
O(ntimes x 7 arrays) to O(1 x 7 arrays); the RNG is an inline SplitMix32
counter hash (~8 VPU integer ops per draw).

Because the RNG is plain jnp integer math (not ``pltpu.prng_random_bits``,
which the Mosaic interpreter stubs to zeros), the identical update rule
runs as a pure-jnp function on CPU (``_emulate``) — the TPU kernel and
the CPU path are op-for-op the same math, so tests on the CPU mesh
validate exactly what the chip executes.

Three variants are lowered:

- ``visser_mixing`` — windspeed-parameterised diffusivity with the
  default surface/bottom hooks (the flagship-benchmark path);
- ``visser_mixing_profile`` — reader-provided ('environment') or
  constant diffusivity profiles: per-element K/gradK level rows live in
  VMEM and the nearest-level lookup is a one-hot contraction over the
  level axis (no gather on the VPU);
- ``visser_mixing_oil`` — OpenOil's wave entrainment + Tkalich rise
  velocity (reference openoil.py:922-1060).

Models that override the mixing hooks beyond these combinations keep
the jnp ``fori_loop`` path in models/oceandrift.py.  RNG streams differ
from that path (SplitMix32 vs threefry): statistically identical, not
bit-identical — matching the reference's stance that mixing is
stochastic.
"""

import functools

import jax
import jax.numpy as jnp

_LANES = 128
_ROWS = 256                      # tile = 256 x 128 = 32768 elements
_TILE = _ROWS * _LANES

_WINDSPEED_MODELS = ("windspeed_Sundby1983", "windspeed_Large1994",
                     "stepfunction")

# test hook: take the fast path on CPU via the pure-jnp emulation
FORCE_INTERPRET = False


def available():
    """True when the default backend is a real TPU."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _diffusivity(model, wind, mld, bg, depth):
    """Elementwise K(depth) — same formulas as ops.physics (which see for
    reference citations); pure jnp, traces into the kernel body."""
    from . import physics as ph
    if model == "windspeed_Sundby1983":
        return ph.verticaldiffusivity_Sundby1983(wind, depth, mld, bg)
    if model == "windspeed_Large1994":
        return ph.verticaldiffusivity_Large1994(wind, depth, mld, bg)
    if model == "stepfunction":
        return ph.verticaldiffusivity_stepfunction(depth)
    raise ValueError(f"model {model} not lowered to pallas")


def _splitmix32(x):
    """SplitMix32 avalanche hash on uint32 (counter-based RNG)."""
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(0x7feb352d)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(15))
    x = x * jnp.uint32(0x846ca68b)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    return x


def _mix_loop(z, mv, w, wind, mld, zmin, elem, seed, *, ntimes, dt_mix,
              model, bg, mixing_at_surface):
    """The shared update rule: runs unchanged inside the Pallas kernel
    (per-tile blocks) and as the CPU emulation (full arrays).  ``elem``
    is the global element index (uint32), ``seed`` a uint32 scalar."""
    adt = abs(dt_mix)
    base = _splitmix32(elem + seed * jnp.uint32(0x9e3779b9))

    def K_of(depth):
        return _diffusivity(model, wind, mld, bg, depth)

    def body(i, z):
        surface = z == 0.0
        bits = _splitmix32(base + i.astype(jnp.uint32)
                           * jnp.uint32(0x85ebca6b))
        # top 24 bits -> uniform in [-1, 1), like the jnp path's
        # 2*uniform-1 (models/oceandrift.py Visser draw); the value fits
        # int32 after the shift, and Mosaic only lowers int->float casts
        R = jax.lax.bitcast_convert_type(
            jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32
        ).astype(jnp.float32) * jnp.float32(2.0 / 16777216.0) - 1.0
        # the reference discretises analytic K on 1-metre levels with
        # NEAREST lookup + np.gradient (one-sided at the surface);
        # mirror it exactly (reference oceandrift.py:430-455, :513-516)
        lvl = jnp.clip(jnp.round(jnp.abs(z)), 0.0, mld + 1.0)
        Kz = K_of(lvl)
        # gradK convention = -dK/dz = +dK/d(depth)
        dKdz = jnp.where(
            lvl == 0.0,
            K_of(lvl + 1.0) - K_of(lvl),
            (K_of(lvl + 1.0) - K_of(jnp.maximum(lvl - 1.0, 0.0))) * 0.5)
        z = z - mv * (dKdz * dt_mix - R * jnp.sqrt(Kz * adt * 6.0))
        z = jnp.where(z >= 0.0, -z, z)                      # surface reflect
        z = jnp.where((z < zmin) & (mv == 1.0),
                      2.0 * zmin - z, z)                    # seafloor reflect
        z = z + w * dt_mix * mv                             # buoyancy
        if not mixing_at_surface:
            z = jnp.where(surface, 0.0, z)
        z = jnp.minimum(z, 0.0)                             # surface stick
        z = jnp.maximum(z, zmin)                            # bottom stick
        return z

    return jax.lax.fori_loop(0, ntimes, body, z)


def _mix_loop_oil(z, diam, mv, wind, mld, zmin, p_ent, d_cand, zb,
                  kw, kw2, nu_w, elem, seed, *, ntimes, dt_mix, model, bg,
                  mixing_at_surface, keep_diam):
    """OpenOil variant of the inner loop: Tkalich droplet rise velocity
    recomputed from the carried diameter each substep (reference
    openoil.py:922-998) and whitecapping wave entrainment of surface oil
    (draws entrainment + intrusion depth, swaps in the candidate droplet
    diameter; reference openoil.py:1017-1060).  ``kw``/``kw2``/``nu_w``
    are the z-independent Tkalich factors precomputed per element (T/S
    held over the inner loop, like the jnp path without TSprofiles)."""
    adt = abs(dt_mix)
    base = _splitmix32(elem + seed * jnp.uint32(0x9e3779b9))

    def K_of(depth):
        return _diffusivity(model, wind, mld, bg, depth)

    def body(i, carry):
        z, diam = carry
        surface = z == 0.0
        bits = _splitmix32(base + i.astype(jnp.uint32)
                           * jnp.uint32(0x85ebca6b))
        bits1 = _splitmix32(bits + jnp.uint32(0xc2b2ae35))
        bits2 = _splitmix32(bits1 + jnp.uint32(0x27d4eb2f))

        def unit(b):  # top 24 bits -> [0, 1)
            return jax.lax.bitcast_convert_type(
                jax.lax.shift_right_logical(b, jnp.uint32(8)), jnp.int32
            ).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)

        R = unit(bits) * 2.0 - 1.0
        # Tkalich rise velocity from the carried diameter
        r2 = diam * 0.5
        W = kw * r2 * r2
        Re = diam * jnp.abs(W) / nu_w
        W2 = kw2 * jnp.sqrt(r2)
        w = jnp.where(Re > 50.0, W2, W)

        # same 1-metre nearest-level discretisation as _mix_loop
        lvl = jnp.clip(jnp.round(jnp.abs(z)), 0.0, mld + 1.0)
        Kz = K_of(lvl)
        dKdz = jnp.where(
            lvl == 0.0,
            K_of(lvl + 1.0) - K_of(lvl),
            (K_of(lvl + 1.0) - K_of(jnp.maximum(lvl - 1.0, 0.0))) * 0.5)
        z = z - mv * (dKdz * dt_mix - R * jnp.sqrt(Kz * adt * 6.0))
        z = jnp.where(z >= 0.0, -z, z)
        z = jnp.where((z < zmin) & (mv == 1.0), 2.0 * zmin - z, z)
        z = z + w * dt_mix * mv
        if not mixing_at_surface:
            z = jnp.where(surface, 0.0, z)
        z = jnp.minimum(z, 0.0)                             # surface stick
        # wave entrainment of surface oil
        entrained = (z >= 0.0) & (unit(bits1) < p_ent)
        z = jnp.where(entrained, -unit(bits2) * zb, z)
        if not keep_diam:
            diam = jnp.where(entrained, d_cand, diam)
        z = jnp.maximum(z, zmin)                            # bottom stick
        return (z, diam)

    return jax.lax.fori_loop(0, ntimes, body, (z, diam))


def _mix_loop_prof(z, mv, w, Kprof, gradK, zmin, elem, seed, *, ntimes,
                   dt_mix, h, mixing_at_surface):
    """Inner loop with per-element diffusivity PROFILES (the
    'environment'/'constant' models): ``Kprof``/``gradK`` are
    (..., L) level rows, h the (uniform, positive) level spacing.  The
    jnp path's nearest-level ``take_along_axis`` becomes a one-hot
    contraction over L — all VPU multiply-adds, no gather."""
    adt = abs(dt_mix)
    base = _splitmix32(elem + seed * jnp.uint32(0x9e3779b9))
    L = Kprof.shape[0]                 # profiles are level-major (L, ...)
    iota = jax.lax.broadcasted_iota(jnp.int32, Kprof.shape, 0)

    def lookup(prof, zi):
        onehot = (iota == zi[None]).astype(prof.dtype)
        return jnp.sum(prof * onehot, axis=0)

    def body(i, z):
        surface = z == 0.0
        bits = _splitmix32(base + i.astype(jnp.uint32)
                           * jnp.uint32(0x85ebca6b))
        R = jax.lax.bitcast_convert_type(
            jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32
        ).astype(jnp.float32) * jnp.float32(2.0 / 16777216.0) - 1.0
        zi = jnp.clip(jnp.round(-z / h).astype(jnp.int32), 0, L - 1)
        Kz = lookup(Kprof, zi)
        dKdz = lookup(gradK, zi)
        z = z - mv * (dKdz * dt_mix - R * jnp.sqrt(Kz * adt * 6.0))
        z = jnp.where(z >= 0.0, -z, z)                      # surface reflect
        z = jnp.where((z < zmin) & (mv == 1.0),
                      2.0 * zmin - z, z)                    # seafloor reflect
        z = z + w * dt_mix * mv                             # buoyancy
        if not mixing_at_surface:
            z = jnp.where(surface, 0.0, z)
        z = jnp.minimum(z, 0.0)                             # surface stick
        z = jnp.maximum(z, zmin)                            # bottom stick
        return z

    return jax.lax.fori_loop(0, ntimes, body, z)


def _as_u32(x):
    """int32 -> uint32 reinterpret (mod-2^32 astype == bitcast for same
    width).  Mosaic rejects float->unsigned ``astype`` (the r4 TPU
    crash) but lowers int->unsigned fine; element IDs therefore travel
    the whole pipeline as int32 and are reinterpreted here — exact at
    any magnitude (no f32 2^24 quantisation) and identical bits on the
    jnp emulation."""
    return jnp.asarray(x, jnp.int32).astype(jnp.uint32)


def _kernel(seed_ref, z_ref, mv_ref, w_ref, wind_ref, mld_ref, zmin_ref,
            elem_ref, out_ref, **opts):
    # elem = the ELEMENT ID (int32 tile): draws keyed by ID are
    # layout-invariant, so DD-tiled runs reproduce the replicated
    # gold exactly (and match the jnp path's splitmix draws)
    out_ref[:] = _mix_loop(
        z_ref[:], mv_ref[:], w_ref[:], wind_ref[:], mld_ref[:], zmin_ref[:],
        _as_u32(elem_ref[:]), _as_u32(seed_ref[0]),
        **opts)


@functools.partial(
    jax.jit,
    static_argnames=("ntimes", "dt_mix", "model", "bg",
                     "mixing_at_surface", "interpret"))
def visser_mixing(z, moving, w, wind, mld, zmin, seed, elem=None, *,
                  ntimes, dt_mix, model, bg, mixing_at_surface,
                  interpret=False):
    """Run ``ntimes`` Visser substeps on every element.

    z, moving, w, wind, mld, zmin: f32 (N,); seed: scalar (uint32/int32);
    ``elem``: per-element RNG key, int32 (the element ID —
    layout-invariant draws; defaults to the slot index).  Routed as an
    int32 tile and bitcast to u32 in-kernel: exact at any ID (Mosaic has
    no float→unsigned cast, and f32 routing would quantise above 2^24).
    Returns the final z, f32 (N,).
    ``interpret=True`` (and any non-TPU backend) runs the op-identical
    pure-jnp emulation instead of the Pallas lowering.
    """
    N = z.shape[0]
    n_tiles = max(1, -(-N // _TILE))
    Np = n_tiles * _TILE
    pad = Np - N

    opts = dict(ntimes=int(ntimes), dt_mix=float(dt_mix), model=model,
                bg=float(bg), mixing_at_surface=bool(mixing_at_surface))

    def prep(a, fill=0.0, dtype=jnp.float32):
        a = jnp.asarray(a, dtype)
        if a.ndim == 0:
            a = jnp.full((N,), a)
        if pad:
            a = jnp.pad(a, (0, pad), constant_values=fill)
        return a.reshape(-1, _LANES)

    if elem is None:
        elem = jnp.arange(N, dtype=jnp.int32)
    args = (prep(z), prep(moving), prep(w), prep(wind), prep(mld),
            prep(zmin), prep(elem, 0, jnp.int32))
    seed_u32 = jnp.asarray(seed).astype(jnp.uint32).reshape(())

    if interpret or not available():
        out = _mix_loop(*args[:6], _as_u32(args[6]), seed_u32,
                        **opts)
        return out.reshape(-1)[:N]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # index_map under PrefetchScalarGridSpec receives (grid idx, scalar ref)
    spec = pl.BlockSpec((_ROWS, _LANES), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[spec] * 7,
        out_specs=spec,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, **opts),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np // _LANES, _LANES), jnp.float32),
    )(jnp.atleast_1d(seed_u32.astype(jnp.int32)), *args)
    return out.reshape(-1)[:N]


def _kernel_prof(seed_ref, z_ref, mv_ref, w_ref, kprof_ref, gradk_ref,
                 zmin_ref, elem_ref, out_ref, **opts):
    out_ref[:] = _mix_loop_prof(
        z_ref[:], mv_ref[:], w_ref[:], kprof_ref[:], gradk_ref[:],
        zmin_ref[:], _as_u32(elem_ref[:]),
        _as_u32(seed_ref[0]), **opts)


# level rows multiply VMEM per element: use smaller tiles
_ROWS_PROF = 64


@functools.partial(
    jax.jit,
    static_argnames=("ntimes", "dt_mix", "h", "mixing_at_surface",
                     "interpret"))
def visser_mixing_profile(z, moving, w, Kprof, gradK, zmin, seed,
                          elem=None, *,
                          ntimes, dt_mix, h, mixing_at_surface,
                          interpret=False):
    """Visser substeps with per-element diffusivity profiles.

    z, moving, w, zmin: f32 (N,); Kprof, gradK: f32 (L, N) level-major
    (the engine's profile layout); seed scalar.  Returns final z."""
    N = z.shape[0]
    L = Kprof.shape[0]
    tile = _ROWS_PROF * _LANES
    n_tiles = max(1, -(-N // tile))
    Np = n_tiles * tile
    pad = Np - N

    opts = dict(ntimes=int(ntimes), dt_mix=float(dt_mix), h=float(h),
                mixing_at_surface=bool(mixing_at_surface))

    def prep(a, fill=0.0, dtype=jnp.float32):
        a = jnp.asarray(a, dtype)
        if a.ndim == 0:
            a = jnp.full((N,), a)
        if pad:
            a = jnp.pad(a, (0, pad), constant_values=fill)
        return a.reshape(-1, _LANES)

    def prep_prof(p):
        p = jnp.asarray(p, jnp.float32)
        if pad:
            p = jnp.pad(p, ((0, 0), (0, pad)))
        return p.reshape(L, -1, _LANES)           # (L, R, lanes)

    if elem is None:
        elem = jnp.arange(N, dtype=jnp.int32)
    zp, mvp, wp, zminp = prep(z), prep(moving), prep(w), prep(zmin)
    elemp = prep(elem, 0, jnp.int32)
    kp, gp = prep_prof(Kprof), prep_prof(gradK)
    seed_u32 = jnp.asarray(seed).astype(jnp.uint32).reshape(())

    if interpret or not available():
        out = _mix_loop_prof(zp, mvp, wp, kp, gp, zminp,
                             _as_u32(elemp), seed_u32, **opts)
        return out.reshape(-1)[:N]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((_ROWS_PROF, _LANES), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((L, _ROWS_PROF, _LANES), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[spec, spec, spec, pspec, pspec, spec, spec],
        out_specs=spec,
    )
    out = pl.pallas_call(
        functools.partial(_kernel_prof, **opts),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np // _LANES, _LANES), jnp.float32),
    )(jnp.atleast_1d(seed_u32.astype(jnp.int32)), zp, mvp, wp, kp, gp,
      zminp, elemp)
    return out.reshape(-1)[:N]


def _kernel_oil(seed_ref, z_ref, diam_ref, mv_ref, wind_ref, mld_ref,
                zmin_ref, pent_ref, dcand_ref, zb_ref, kw_ref, kw2_ref,
                nuw_ref, elem_ref, z_out_ref, d_out_ref, **opts):
    z, diam = _mix_loop_oil(
        z_ref[:], diam_ref[:], mv_ref[:], wind_ref[:], mld_ref[:],
        zmin_ref[:], pent_ref[:], dcand_ref[:], zb_ref[:], kw_ref[:],
        kw2_ref[:], nuw_ref[:], _as_u32(elem_ref[:]),
        _as_u32(seed_ref[0]), **opts)
    z_out_ref[:] = z
    d_out_ref[:] = diam


@functools.partial(
    jax.jit,
    static_argnames=("ntimes", "dt_mix", "model", "bg",
                     "mixing_at_surface", "keep_diam", "interpret"))
def visser_mixing_oil(z, diam, moving, wind, mld, zmin, p_ent, d_cand, zb,
                      kw, kw2, nu_w, seed, elem=None, *, ntimes, dt_mix,
                      model, bg, mixing_at_surface, keep_diam,
                      interpret=False):
    """OpenOil mixing inner loop: ``ntimes`` Visser substeps with Tkalich
    rise velocity and wave entrainment, entirely in VMEM.

    All array args f32 (N,) except ``elem`` (int32); seed scalar;
    ``elem`` = per-element RNG key (the element ID — layout-invariant
    draws under domain decomposition; defaults to the slot index).
    Returns (z, diameter)."""
    N = z.shape[0]
    n_tiles = max(1, -(-N // _TILE))
    Np = n_tiles * _TILE
    pad = Np - N

    opts = dict(ntimes=int(ntimes), dt_mix=float(dt_mix), model=model,
                bg=float(bg), mixing_at_surface=bool(mixing_at_surface),
                keep_diam=bool(keep_diam))

    def prep(a, fill=0.0, dtype=jnp.float32):
        a = jnp.asarray(a, dtype)
        if a.ndim == 0:
            a = jnp.full((N,), a)
        if pad:
            a = jnp.pad(a, (0, pad), constant_values=fill)
        return a.reshape(-1, _LANES)

    if elem is None:
        elem = jnp.arange(N, dtype=jnp.int32)
    args = (prep(z), prep(diam, 1e-6), prep(moving), prep(wind),
            prep(mld, 50.0), prep(zmin, -1.0), prep(p_ent), prep(d_cand,
            1e-6), prep(zb, 1.0), prep(kw), prep(kw2), prep(nu_w, 1e-6),
            prep(elem, 0, jnp.int32))
    seed_u32 = jnp.asarray(seed).astype(jnp.uint32).reshape(())

    if interpret or not available():
        zf, df = _mix_loop_oil(*args[:12], _as_u32(args[12]),
                               seed_u32, **opts)
        return zf.reshape(-1)[:N], df.reshape(-1)[:N]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((_ROWS, _LANES), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[spec] * 13,
        out_specs=[spec] * 2,
    )
    shape = jax.ShapeDtypeStruct((Np // _LANES, _LANES), jnp.float32)
    zf, df = pl.pallas_call(
        functools.partial(_kernel_oil, **opts),
        grid_spec=grid_spec,
        out_shape=[shape, shape],
    )(jnp.atleast_1d(seed_u32.astype(jnp.int32)), *args)
    return zf.reshape(-1)[:N], df.reshape(-1)[:N]
