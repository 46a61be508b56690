"""A/B harness for the packed-row gather (VERDICT r2 #6).

The sampling hot path of every gridded workload is a row gather:
``jnp.take(packed (R, C), idx (N,), axis=0)``, which XLA lowers through
the scalar core at ~1.5-3e8 indices/s depending on table size and
dtype (docs/performance.md gather-cliff section).  This tool
measures that against Pallas alternatives on the attached device:

  A. xla_take        — the production path (jnp.take)
  B. pallas_dma      — one async HBM->VMEM DMA per row, 8-deep
                       pipelined (the "manual gather" the scalar core
                       can issue)
  C. pallas_vmem     — the packed table DMA'd into VMEM once per chunk
                       and rows fetched with dynamic vector loads
                       (only valid while the table fits in VMEM)
  D. xla_take_blend  — take + bilinear x/y blend (2 gathers, the real
                       sampler shape) as the fused-kernel baseline

Usage: python tools/gather_ab.py [R] [C] [N]
Prints one line per variant; results recorded in docs/performance.md.
"""

import functools
import sys
import time

import numpy as np

CHUNK = 1024       # elements per grid step (B/C)
NBUF = 8           # DMA pipeline depth (B)


def _pad128(packed):
    """Mosaic tiles the lane dimension to 128: both Pallas variants need
    the row width padded (HBM slices and VMEM blocks of a (R, 24) table
    are rejected / silently padded to (R, 128))."""
    import jax.numpy as jnp
    R, C = packed.shape
    if C % 128 == 0:
        return packed
    pad = 128 * ((C + 127) // 128) - C
    return jnp.pad(packed, ((0, 0), (0, pad)))


def _pallas_dma_gather(packed, idx):
    """Variant B: per-row async DMA, NBUF-deep pipeline."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    packed = _pad128(packed)
    R, C = packed.shape
    N0 = idx.shape[0]
    if N0 % CHUNK:
        idx = jnp.pad(idx, (0, CHUNK - N0 % CHUNK))
    N = idx.shape[0]

    def kernel(idx_ref, packed_ref, out_ref):
        def body(sem):
            def get_dma(e):
                return pltpu.make_async_copy(
                    packed_ref.at[idx_ref[e]],
                    out_ref.at[e],
                    sem.at[e % NBUF])

            def warm(e, _):
                get_dma(e).start()
                return _
            jax.lax.fori_loop(0, NBUF, warm, None)

            def loop(e, _):
                # wait slot e%NBUF first, THEN reuse it for e+NBUF —
                # at most one outstanding copy per semaphore slot
                get_dma(e).wait()
                @pl.when(e + NBUF < CHUNK)
                def _start():
                    get_dma(e + NBUF).start()
                return _
            jax.lax.fori_loop(0, CHUNK, loop, None)
        pl.run_scoped(body, pltpu.SemaphoreType.DMA((NBUF,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((CHUNK, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, C), packed.dtype),
    )(idx, packed)
    return out[:N0]


def _pallas_vmem_gather(packed, idx):
    """Variant C: whole table in VMEM, dynamic vector loads per row."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    packed = _pad128(packed)
    R, C = packed.shape
    N0 = idx.shape[0]
    if N0 % CHUNK:
        idx = jnp.pad(idx, (0, CHUNK - N0 % CHUNK))
    N = idx.shape[0]

    def kernel(idx_ref, packed_ref, out_ref):
        def loop(e, _):
            out_ref[e, :] = packed_ref[idx_ref[e], :]
            return _
        jax.lax.fori_loop(0, CHUNK, loop, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, C), packed.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(idx, packed)
    return out[:N0]


def _bench(fn, *args, reps=5):
    import jax
    import jax.numpy as jnp
    f = jax.jit(fn)
    out = f(*args)
    float(jax.device_get(jnp.sum(out[..., 0].astype(jnp.float32))))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(jax.device_get(jnp.sum(out[..., 0].astype(jnp.float32))))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000

    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}  table ({R}, {C}) f32 "
          f"({R*C*4/1e6:.1f} MB), N={N/1e6:.1f}M indices", flush=True)
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R - 1, N).astype(np.int32))
    fx = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))

    t = _bench(lambda p, i: jnp.take(p, i, axis=0), packed, idx)
    print(f"A xla_take      : {t*1e3:8.2f} ms  "
          f"{N/t/1e6:8.1f} M rows/s", flush=True)

    def take_blend(p, i, f):
        g0 = jnp.take(p, i, axis=0)
        g1 = jnp.take(p, i + 1, axis=0)
        return g0 * (1.0 - f[:, None]) + g1 * f[:, None]
    t = _bench(take_blend, packed, idx, fx)
    print(f"D xla_take_blend: {t*1e3:8.2f} ms  "
          f"{2*N/t/1e6:8.1f} M rows/s (2 gathers)", flush=True)

    try:
        t = _bench(_pallas_dma_gather, packed, idx)
        print(f"B pallas_dma    : {t*1e3:8.2f} ms  "
              f"{N/t/1e6:8.1f} M rows/s", flush=True)
    except Exception as e:
        print(f"B pallas_dma    : FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # the VMEM table block is double-buffered and 128-lane padded; the
    # default scoped-vmem limit is 16 MB
    if R * 128 * 4 * 2 <= 16 * 2**20:
        try:
            t = _bench(_pallas_vmem_gather, packed, idx)
            print(f"C pallas_vmem   : {t*1e3:8.2f} ms  "
                  f"{N/t/1e6:8.1f} M rows/s", flush=True)
        except Exception as e:
            print(f"C pallas_vmem   : FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    else:
        print("C pallas_vmem   : table exceeds VMEM budget, skipped",
              flush=True)


if __name__ == "__main__":
    main()
