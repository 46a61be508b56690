"""Row-pairing tier selection (r5): xy-paired rows are the default for
multi-fetch advection (+41-46% measured), x-paired for single-fetch
(held corner blocks double in residency under xy, measured -17%);
OPENDRIFT_XY_PAIR=1/0 force-overrides.  Trajectories are bit-identical
across tiers (same arithmetic, different gather count), pinned here.
"""

import numpy as np
import pytest

NORDIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
          "Nordic_subset.nc")


def _sim(single_fetch):
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.roms import ROMSReader

    o = OceanDrift(loglevel=40)
    r = ROMSReader(NORDIC, sampling="regrid")
    o.add_reader(r)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    if single_fetch:
        o.set_config("drift:truncate_ocean_model_below_m", 0.0)
        o.set_config("drift:advection_single_fetch", True)
    rng = np.random.default_rng(0)
    o.seed_elements(lon=rng.uniform(13.0, 14.5, 500),
                    lat=rng.uniform(66.9, 67.8, 500),
                    z=None if single_fetch
                    else rng.uniform(-20.0, 0.0, 500),
                    time=r.times[0])
    o.prepare_run(dt=900.0, K=5)
    o.env.build_device_states()
    return o, r


def test_multi_fetch_defaults_to_xyz():
    # 3D table (Z>1) + multi-fetch -> the full-trilinear 'xyz' tier
    o, r = _sim(single_fetch=False)
    assert r.pair_hint == "xy"
    assert r._sampler.pair_mode == "xyz"


def test_single_fetch_surface_gets_xy():
    # surface-truncated single-fetch: Z collapses to 1, so the tier is
    # 'xy' (one take per corner block — the row carries the y+1 half)
    o, r = _sim(single_fetch=True)
    assert r.pair_hint == "xy"
    assert r._sampler.pair_mode == "xy"


def test_single_fetch_tiers_bit_identical(monkeypatch):
    from datetime import timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.roms import ROMSReader

    results = {}
    for tier in ("0", "1"):        # force x vs wide tier
        monkeypatch.setenv("OPENDRIFT_XY_PAIR", tier)
        o = OceanDrift(loglevel=40)
        r = ROMSReader(NORDIC, sampling="regrid")
        o.add_reader(r)
        o.set_config("general:use_auto_landmask", False)
        o.set_config("drift:advection_scheme", "runge-kutta4")
        o.set_config("drift:horizontal_diffusivity", 0.0)
        o.set_config("drift:truncate_ocean_model_below_m", 0.0)
        o.set_config("drift:advection_single_fetch", True)
        rng = np.random.default_rng(0)
        o.seed_elements(lon=rng.uniform(13.0, 14.5, 300),
                        lat=rng.uniform(66.9, 67.8, 300),
                        time=r.times[0])
        o.run(duration=timedelta(hours=3), time_step=900)
        results[tier] = (np.asarray(o.result["lon"]),
                         np.asarray(o.result["lat"]))
    np.testing.assert_array_equal(results["0"][0], results["1"][0])
    np.testing.assert_array_equal(results["0"][1], results["1"][1])


def test_env_override_disables_xy(monkeypatch):
    monkeypatch.setenv("OPENDRIFT_XY_PAIR", "0")
    o, r = _sim(single_fetch=False)
    assert r._sampler.pair_mode == "x"


def test_trajectories_bit_identical_across_tiers(monkeypatch):
    from datetime import timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.roms import ROMSReader

    results = {}
    for tier in ("0", "1"):        # force x vs force xy
        monkeypatch.setenv("OPENDRIFT_XY_PAIR", tier)
        o = OceanDrift(loglevel=40)
        r = ROMSReader(NORDIC, sampling="regrid")
        o.add_reader(r)
        o.set_config("general:use_auto_landmask", False)
        o.set_config("drift:advection_scheme", "runge-kutta4")
        o.set_config("drift:horizontal_diffusivity", 0.0)
        rng = np.random.default_rng(0)
        o.seed_elements(lon=rng.uniform(13.0, 14.5, 300),
                        lat=rng.uniform(66.9, 67.8, 300),
                        z=rng.uniform(-20.0, 0.0, 300),
                        time=r.times[0])
        o.run(duration=timedelta(hours=3), time_step=900)
        results[tier] = (np.asarray(o.result["lon"]),
                         np.asarray(o.result["lat"]))
    np.testing.assert_array_equal(results["0"][0], results["1"][0])
    np.testing.assert_array_equal(results["0"][1], results["1"][1])
