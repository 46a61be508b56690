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
import jax.numpy as jnp


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
    from scipy.ndimage import distance_transform_edt
    out = np.asarray(field, dtype=np.float32)
    flat = out.reshape(-1, *out.shape[-2:])
    any_valid = False
    for i in range(flat.shape[0]):
        sl = flat[i]
        mask = ~np.isfinite(sl)
        if mask.all():
            continue
        any_valid = True
        if mask.any():
            idx = distance_transform_edt(mask, return_distances=False,
                                         return_indices=True)
            flat[i] = sl[tuple(idx)]
    return out, any_valid


def fill_towards_seafloor(block):
    """Propagate the deepest valid value downward along the z axis
    (reference: interpolation/structured.py:50-71
    ``fill_NaN_towards_seafloor``).  ``block``: (Z, Y, X), z index 0 =
    surface, increasing downward."""
    out = np.asarray(block, dtype=np.float32)
    for k in range(1, out.shape[0]):
        nan = ~np.isfinite(out[k])
        out[k][nan] = out[k - 1][nan]
    return out
