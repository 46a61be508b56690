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
    # native index-space sampling: the reader's CRS is the curvilinear
    # index map, not latlong
    assert not r.crs.is_latlon
    assert r.proj4 == "+curvilinear_index"
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


def test_truncate_ocean_model_below_m():
    """drift:truncate_ocean_model_below_m (reference oceandrift.py:170,
    environment.py:554-562): forcing is packed only down to the given
    depth — exact within the kept range, extrapolated (clamped) below,
    and Z collapses to 1 at truncate=0 (surface-only runs sample with
    half the gathers)."""
    rng = np.random.default_rng(3)
    lon = jnp.asarray(rng.uniform(13.0, 14.5, 200), jnp.float32)
    lat = jnp.asarray(rng.uniform(66.9, 67.8, 200), jnp.float32)

    def mk(trunc):
        r = ROMSReader(NORDIC)
        if trunc is not None:
            r.truncate_depth = trunc
        r.set_run_epoch(r.times[0])
        r.prepare()
        return r, r.device_state()

    rf, dsf = mk(None)
    rt, dst = mk(0.0)
    r10, ds10 = mk(10.0)
    assert rf._sampler.Z > 1
    assert rt._sampler.Z == 1
    assert 1 < r10._sampler.Z < rf._sampler.Z

    def du(ra, da, rb, db, z):
        zv = jnp.full(lon.shape, z, jnp.float32)
        va, _ = ra.sample(da, ["x_sea_water_velocity"], jnp.float32(1800.0),
                          lon, lat, zv)
        vb, _ = rb.sample(db, ["x_sea_water_velocity"], jnp.float32(1800.0),
                          lon, lat, zv)
        return np.nanmax(np.abs(np.asarray(va["x_sea_water_velocity"])
                                - np.asarray(vb["x_sea_water_velocity"])))

    assert du(rf, dsf, rt, dst, 0.0) == 0.0       # exact at surface
    assert du(rf, dsf, r10, ds10, -8.0) == 0.0    # exact within range
    assert du(rf, dsf, rt, dst, -5.0) > 0.0       # extrapolated below


def test_truncate_config_wiring():
    """The config reaches the readers through prepare_run."""
    o = OceanDrift(loglevel=40)
    r = ROMSReader(NORDIC)
    o.add_reader(r)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("drift:truncate_ocean_model_below_m", 0.0)
    o.seed_elements(lon=13.5, lat=67.2, number=5, time=r.times[0])
    o.prepare_run(dt=900.0, K=2, export_variables=["lon", "lat"],
                  total_steps=4)
    o.env.build_device_states()
    assert r.truncate_depth == 0.0
    assert r._sampler.Z == 1


def test_block_bisection_matches_refetch():
    """general:coastline_bisection='block' (zero-gather stranding
    bisection from the held corner block) strands the same elements as
    the exact refetch mode, with crossing points within one grid cell."""
    from opendrift_tpu.fields.roms import ROMSReader

    def run(mode):
        o = OceanDrift(loglevel=40)
        r = ROMSReader(NORDIC)
        o.add_reader(r)
        o.set_config("general:use_auto_landmask", False)
        o.set_config("drift:vertical_advection", False)
        o.set_config("drift:advection_scheme", "runge-kutta4")
        o.set_config("drift:advection_single_fetch", True)
        o.set_config("general:coastline_bisection", mode)
        o.set_config("drift:horizontal_diffusivity", 20.0)
        o.seed_elements(lon=14.56, lat=67.29, radius=8000, number=500,
                        time=r.times[0])
        o.run(duration=timedelta(hours=24), time_step=900)
        status = np.asarray(o.result["status"])[:, -1]
        lon = np.asarray(o.result["lon"])
        lat = np.asarray(o.result["lat"])
        last_lon = np.array([row[np.isfinite(row)][-1] for row in lon])
        last_lat = np.array([row[np.isfinite(row)][-1] for row in lat])
        code = o.status_categories.index("stranded")
        return status == code, last_lon, last_lat

    s_ref, lon_ref, lat_ref = run("refetch")
    s_blk, lon_blk, lat_blk = run("block")
    assert s_ref.sum() > 50          # the run actually strands
    # same stochastic stream -> same trajectories until stranding; the
    # stranded sets must agree except at most a few boundary cases
    assert (s_ref != s_blk).mean() < 0.05
    both = s_ref & s_blk
    # crossing points agree within one native grid cell (~800 m)
    dm = np.hypot((lon_ref - lon_blk)[both] * 40000,   # ~km/deg at 67N
                  (lat_ref - lat_blk)[both] * 111000)
    assert np.median(dm) < 800
    assert np.percentile(dm, 95) < 1600
