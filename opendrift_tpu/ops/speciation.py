"""Multi-species speciation kernel: stochastic transformations between
chemical/physical species via a transfer-rate matrix.

Device-side core shared by RadionuclideDrift and ChemicalDrift
(reference: opendrift/models/radionuclides.py:728-810
``update_speciation`` — a per-element Python loop with
``np.searchsorted`` per transforming element; here one vectorised
categorical draw)."""

import jax
import jax.numpy as jnp


def speciation_step(specie, rates_row, dt, key, active):
    """One speciation step.

    specie: int32 (N,) current specie index;
    rates_row: f32 (N, S) transfer rates from each element's current
    specie to every destination (already environment-modulated);
    Returns (new_specie, transformed_mask).
    """
    p = 1.0 - jnp.exp(-rates_row * jnp.abs(dt))        # (N, S)
    psum = jnp.sum(p, axis=1)
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, specie.shape)
    transform = active & (u1 < psum)
    # categorical over destinations, conditional on transformation
    u2 = jax.random.uniform(k2, specie.shape)
    cum = jnp.cumsum(p, axis=1) / jnp.maximum(psum, 1e-30)[:, None]
    dest = jnp.argmax(cum >= u2[:, None], axis=1).astype(specie.dtype)
    new_specie = jnp.where(transform, dest, specie)
    return new_specie, transform
