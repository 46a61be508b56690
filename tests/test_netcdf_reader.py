"""CF NetCDF reader on the reference's bundled forcing subsets.

Exercises format autodetection (NetCDF-3 + HDF5), CF grid mappings,
scale/offset unpacking and end-to-end gridded drift runs (mirrors
reference tests/readers/test_structured.py and models/test_run.py use of
the same files).
"""

from datetime import timedelta

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendrift_tpu.fields.netcdf import NetCDFReader
from opendrift_tpu.models import OceanDrift, WindBlow

ARCTIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
          "Arctic20_1to5Feb_2016.nc")
AROME = ("/root/reference/tests/test_data/14Jan2016_NorKyst_z_3d/"
         "AROME_MetCoOp_00_DEF_20160114_subset.nc")


@pytest.fixture(scope="module")
def arctic(test_data_dir_module=None):
    return NetCDFReader(ARCTIC)


def test_arctic_autodetect(arctic):
    r = arctic
    assert "x_sea_water_velocity" in r.variables
    assert "sea_water_temperature" in r.variables  # aliased from potential T
    assert r.depths is not None and len(r.depths) == 17
    assert abs(r.delta_x - 20000.0) < 1e-6  # km -> m conversion
    assert r.start_time.year == 2016
    # polar stereographic from proj4_string attr
    assert "stere" in r.proj4


def test_arctic_projection_roundtrip(arctic):
    r = arctic
    lon, lat = r.xy2lonlat([r.xmin, r.xmax], [r.ymin, r.ymax])
    x2, y2 = r.lonlat2xy(lon, lat)
    np.testing.assert_allclose(x2, [r.xmin, r.xmax], atol=1.0)
    np.testing.assert_allclose(y2, [r.ymin, r.ymax], atol=1.0)


def test_arctic_sample_values(arctic):
    """Sampled values equal the file values at grid nodes."""
    r = arctic
    r.set_run_epoch(r.start_time)
    r.prepare(interval_seconds=86400.0)
    dev = r.device_state(r.times[0], r.times[1])

    from opendrift_tpu.utils import ncio
    ds = ncio.open_dataset(ARCTIC)
    raw_t = ncio.cf_unpack(ds.variables["temperature"],
                           ds.variables["temperature"][0])
    # pick an ocean node with valid data at levels 0 and 1
    valid = np.isfinite(raw_t[0]) & np.isfinite(raw_t[1])
    jy, jx = np.argwhere(valid)[13]
    lon, lat = r.xy2lonlat([r.x[jx]], [r.y[jy]])
    sample = jax.jit(lambda t, lo, la, z: r.sample(
        dev, ["sea_water_temperature"], t, lo, la, z))
    vals, cov = sample(jnp.float32(0.0),
                       jnp.asarray(lon, dtype=jnp.float32),
                       jnp.asarray(lat, dtype=jnp.float32),
                       jnp.asarray([0.0], dtype=jnp.float32))
    assert bool(np.asarray(cov)[0])
    assert abs(float(vals["sea_water_temperature"][0])
               - raw_t[0, jy, jx]) < 1e-2
    # at 3 m (level 1)
    vals, _ = sample(jnp.float32(0.0),
                     jnp.asarray(lon, dtype=jnp.float32),
                     jnp.asarray(lat, dtype=jnp.float32),
                     jnp.asarray([-3.0], dtype=jnp.float32))
    assert abs(float(vals["sea_water_temperature"][0])
               - raw_t[1, jy, jx]) < 1e-2
    ds.close()


def test_arctic_drift_run(arctic):
    """Full RK4 drift on real currents: particles move a plausible
    distance and stay finite."""
    r = NetCDFReader(ARCTIC)
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    o.set_config("drift:vertical_advection", False)
    o.add_reader(r)
    lon, lat = r.xy2lonlat([(r.xmin + r.xmax) / 2], [(r.ymin + r.ymax) / 2])
    o.seed_elements(lon, lat, radius=20000, number=50, z=-5.0,
                    time=r.start_time)
    o.run(duration=timedelta(hours=48), time_step=3600,
          time_step_output=6 * 3600)
    lons = o.result["lon"].values
    lats = o.result["lat"].values
    assert np.isfinite(lons[:, 0]).all()
    moved_km = np.hypot(
        (lons[:, -1] - lons[:, 0]) * 111.3 * np.cos(np.radians(74)),
        (lats[:, -1] - lats[:, 0]) * 111.3)
    # 2 days at 2-20 cm/s -> 3..40 km
    active = np.isfinite(moved_km)
    assert active.sum() > 30
    assert np.nanmedian(moved_km) > 1.0
    assert np.nanmax(moved_km) < 100.0


def test_arome_wind_run():
    """HDF5 (NetCDF-4) + Lambert conformal wind forcing drives WindBlow."""
    r = NetCDFReader(AROME)
    assert "x_wind" in r.variables  # aliased from x_wind_10m
    assert "lcc" in r.proj4
    o = WindBlow(loglevel=40)
    o.add_reader(r)
    # centre of the AROME subset (norwegian coast)
    lon, lat = r.xy2lonlat([np.mean(r.x)], [np.mean(r.y)])
    o.seed_elements(lon, lat, number=20, radius=5000, time=r.start_time)
    o.run(duration=timedelta(hours=2), time_step=900)
    lons = o.result["lon"].values
    assert np.isfinite(lons).all()
    # wind of a few m/s for 2 h moves particles hundreds of metres..km
    dist_m = np.hypot(
        (lons[:, -1] - lons[:, 0]) * 111320 * np.cos(np.radians(lat)),
        (o.result["lat"].values[:, -1] - o.result["lat"].values[:, 0])
        * 111320)
    assert dist_m.max() > 100.0


def test_multifile_concat():
    """Nordic day files concatenate along time (MFDataset-style)...
    these are curvilinear, so only check the time axis logic via Arctic."""
    r = NetCDFReader([ARCTIC])
    assert len(r.times) == 5
