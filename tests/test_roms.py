"""ROMS native reader: curvilinear sigma grid, C-grid rotation, landmask
(mirrors reference tests/readers/test_roms.py usage of the Nordic subset).
"""

from datetime import timedelta

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendrift_tpu.fields.roms import ROMSReader, sdepth
from opendrift_tpu.models import OceanDrift

NORDIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
          "Nordic_subset.nc")
NORDIC_DAYS = [
    f"/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
    f"Nordic_subset_day{i}.nc" for i in (1, 2, 3)]


@pytest.fixture(scope="module")
def nordic():
    return ROMSReader(NORDIC)


def test_autodetect(nordic):
    r = nordic
    assert "x_sea_water_velocity" in r.variables
    assert "sea_water_temperature" in r.variables
    assert "land_binary_mask" in r.variables
    assert r.crs.is_latlon
    assert len(r.times) == 3
    # bathymetry 10..320 m in this subset
    assert 5 < np.nanmin(r._h) < 50
    assert 200 < np.nanmax(r._h) < 500


def test_sdepth_vtransform2():
    """z of sigma levels: surface level near 0, bottom near -h."""
    h = np.array([[100.0]])
    s = np.linspace(-0.99, -0.01, 35)
    C = -(np.linspace(0.99, 0.01, 35)) ** 2  # toy stretching
    z = sdepth(h, np.zeros_like(h), 30.0, C, s, 2)
    assert z[0, 0, 0] < -50.0      # bottom-most level deep
    assert z[-1, 0, 0] > -5.0      # top-most level near surface
    assert np.all(np.diff(z[:, 0, 0]) > 0)  # monotone


def test_sample_plausible(nordic):
    r = nordic
    r.set_run_epoch(r.start_time)
    dev = r.device_state(r.times[0], r.times[1])
    ocean = r._mask
    lonc = float(np.mean(r._lon_rho[ocean]))
    latc = float(np.mean(r._lat_rho[ocean]))
    sample = jax.jit(lambda t, lo, la, z: r.sample(
        dev, ["sea_water_temperature", "sea_water_salinity",
              "land_binary_mask"], t, lo, la, z))
    vals, cov = sample(jnp.float32(0.0),
                       jnp.asarray([lonc], dtype=jnp.float32),
                       jnp.asarray([latc], dtype=jnp.float32),
                       jnp.asarray([-5.0], dtype=jnp.float32))
    assert bool(np.asarray(cov)[0])
    T = float(vals["sea_water_temperature"][0])
    S = float(vals["sea_water_salinity"][0])
    assert 0.0 < T < 12.0          # Norwegian coast, February
    assert 20.0 < S < 36.0


def test_landmask_land_point(nordic):
    """A known land cell of mask_rho must sample land=1."""
    r = nordic
    r.set_run_epoch(r.start_time)
    dev = r.device_state(r.times[0], r.times[1])
    land = ~r._mask
    # an interior land point (away from the coastline)
    from scipy.ndimage import binary_erosion
    interior = binary_erosion(land, iterations=2)
    if not interior.any():
        pytest.skip("no interior land in subset")
    jy, jx = np.argwhere(interior)[0]
    lon = r._lon_rho[jy, jx]
    lat = r._lat_rho[jy, jx]
    sample = jax.jit(lambda t, lo, la, z: r.sample(
        dev, ["land_binary_mask"], t, lo, la, z))
    vals, cov = sample(jnp.float32(0.0),
                       jnp.asarray([lon], dtype=jnp.float32),
                       jnp.asarray([lat], dtype=jnp.float32),
                       jnp.zeros(1, dtype=jnp.float32))
    assert float(vals["land_binary_mask"][0]) > 0.5


def test_drift_and_stranding(nordic):
    """Drift in the Nordic fjord area with stranding active: particles
    move, some may strand, none produce non-finite positions."""
    r = ROMSReader(NORDIC)
    o = OceanDrift(loglevel=40)
    o.set_config("drift:advection_scheme", "runge-kutta")
    o.set_config("drift:vertical_advection", False)
    o.add_reader(r)
    ocean = r._mask
    lonc = float(np.mean(r._lon_rho[ocean]))
    latc = float(np.mean(r._lat_rho[ocean]))
    o.seed_elements(lonc, latc, radius=5000, number=100, z=-2.0,
                    time=r.start_time)
    o.run(duration=timedelta(hours=24), time_step=1800,
          time_step_output=6 * 3600)
    lons = o.result["lon"].values
    status = o.result["status"].values
    first = lons[:, 0]
    assert np.isfinite(first).all()
    # last recorded position of every element is finite
    last_valid = np.array([row[np.isfinite(row)][-1] for row in lons])
    assert np.isfinite(last_valid).all()
    # all particles either active or stranded (no NaN-status garbage)
    final = status[:, -1]
    stranded_code = o.status_categories.index("stranded")
    assert np.isin(final, [0, stranded_code]).all()


def test_multifile():
    r = ROMSReader(NORDIC_DAYS)
    assert len(r.times) >= 3
    assert r.times == sorted(r.times)
