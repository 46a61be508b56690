"""Geodesic math: Vincenty direct/inverse against known values and each
other, in float64 (host) and float32 (device)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendrift_tpu.utils.geodesic import (direct_np, inverse_np,
                                          geodesic_direct, geodesic_step)

# Vincenty's classic test line: Flinders Peak -> Buninyong
LAT1 = -(37 + 57 / 60 + 3.72030 / 3600)
LON1 = 144 + 25 / 60 + 29.52440 / 3600
LAT2 = -(37 + 39 / 60 + 10.15610 / 3600)
LON2 = 143 + 55 / 60 + 35.38390 / 3600


def test_inverse_known_line():
    az12, az21, dist = inverse_np(LAT1, LON1, LAT2, LON2)
    assert abs(dist - 54972.271) < 1e-3
    assert abs(az12 % 360 - (306 + 52 / 60 + 5.37 / 3600)) < 1e-5


def test_direct_inverse_roundtrip():
    az12, _, dist = inverse_np(LAT1, LON1, LAT2, LON2)
    lat2, lon2 = direct_np(LAT1, LON1, az12, dist)
    assert abs(lat2 - LAT2) < 1e-9
    assert abs(lon2 - LON2) < 1e-9


def test_direct_short_steps_vs_local_radii():
    """100 m steps must match local ellipsoidal radii of curvature."""
    lat, lon = 60.0, 5.0
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    s = np.sin(np.radians(lat))
    M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    N = a / np.sqrt(1 - e2 * s * s)
    lat2, lon2 = direct_np(lat, lon, 0.0, 100.0)  # north
    assert abs((lat2 - lat) - np.degrees(100.0 / M)) < 1e-8
    lat3, lon3 = direct_np(lat, lon, 90.0, 100.0)  # east
    assert abs((lon3 - lon) - np.degrees(100.0 / (N * np.cos(np.radians(lat))))) < 1e-8


def test_negative_distance_reverses():
    lat2, lon2 = direct_np(60.0, 5.0, 0.0, -100.0)
    lat3, lon3 = direct_np(60.0, 5.0, 180.0, 100.0)
    assert abs(lat2 - lat3) < 1e-10


def test_f32_device_step_accuracy():
    """jnp float32 step within ~1 m of float64 truth for a 1 km step."""
    lat = jnp.asarray([60.0, -30.0, 0.0], dtype=jnp.float32)
    lon = jnp.asarray([5.0, 170.0, -60.0], dtype=jnp.float32)
    u = jnp.asarray([1.0, -0.5, 0.3], dtype=jnp.float32)
    v = jnp.asarray([0.5, 1.5, -1.0], dtype=jnp.float32)
    step = jax.jit(lambda la, lo, uu, vv: geodesic_step(jnp, la, lo, uu, vv,
                                                        600.0))
    lat2, lon2 = step(lat, lon, u, v)
    lat2_64, lon2_64 = geodesic_step(
        np, np.asarray(lat, np.float64), np.asarray(lon, np.float64),
        np.asarray(u, np.float64), np.asarray(v, np.float64), 600.0)
    # 1e-5 degrees ~ 1.1 m
    np.testing.assert_allclose(np.asarray(lat2), lat2_64, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lon2), lon2_64, atol=4e-5)


def test_geodesic_jit_and_grad():
    fn = jax.jit(lambda la, lo: geodesic_direct(jnp, la, lo, 45.0, 1000.0))
    la2, lo2 = fn(jnp.float32(60.0), jnp.float32(5.0))
    assert np.isfinite(la2) and np.isfinite(lo2)
