"""Bundled coastline raster + loud failure when stranding has no mask
(VERDICT r1: silent all-ocean fallback made coastline_action a no-op).
Reference behaviour: the GSHHG global landmask is auto-added and always
covers (reference reader_global_landmask.py:201-260)."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields import ConstantReader
from opendrift_tpu.fields.landmask import GlobalLandmask

T0 = datetime(2016, 2, 2)


def _current(u=0.5, v=0.0):
    return ConstantReader({"x_sea_water_velocity": u,
                           "y_sea_water_velocity": v,
                           "x_wind": 0.0, "y_wind": 0.0})


def test_bundled_raster_knows_norway():
    lm = GlobalLandmask()
    # inland northern Norway / Sweden is land; Norwegian Sea is ocean
    assert lm.contains([18.0], [68.3])[0]
    assert not lm.contains([8.0], [66.0])[0]
    # coverage is regional and reported honestly
    assert lm.covers_positions([10.0], [70.0])[0]
    assert not lm.covers_positions([-40.0], [55.0])[0]


def test_auto_landmask_strands_on_bundled_coast():
    """Seeds offshore Lofoten drifting east: the auto-added bundled
    raster strands them on the coast without any explicit config."""
    o = OceanDrift(loglevel=40)
    o.set_config("drift:vertical_mixing", False)
    o.add_reader(_current(u=1.5))
    o.seed_elements(lon=np.full(5, 13.8), lat=np.full(5, 68.25),
                    time=T0)
    o.run(duration=timedelta(hours=48), time_step=3600)
    status = o.result["status"].values[:, -1]
    names = o.status_categories
    assert "stranded" in names
    assert (status == names.index("stranded")).all(), (
        status, o.result["lon"].values[:, -1])


def test_stranding_without_mask_raises():
    """Outside the bundled raster's coverage, a stranding run with no
    mask and no explicit fallback must fail loudly."""
    o = OceanDrift(loglevel=40)
    o.set_config("drift:vertical_mixing", False)
    o.add_reader(_current())
    o.seed_elements(lon=-40.0, lat=40.0, time=T0, number=2)
    with pytest.raises(ValueError, match="needs a landmask"):
        o.run(duration=timedelta(hours=1), time_step=3600)


def test_coastline_none_still_runs_all_ocean():
    o = OceanDrift(loglevel=40)
    o.set_config("drift:vertical_mixing", False)
    o.set_config("general:coastline_action", "none")
    o.add_reader(_current())
    o.seed_elements(lon=-40.0, lat=40.0, time=T0, number=2)
    o.run(duration=timedelta(hours=2), time_step=3600)
    assert np.isfinite(o.result["lon"].values[:, -1]).all()


def test_explicit_fallback_still_honoured():
    o = OceanDrift(loglevel=40)
    o.set_config("drift:vertical_mixing", False)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_current())
    o.seed_elements(lon=-40.0, lat=40.0, time=T0, number=2)
    o.run(duration=timedelta(hours=2), time_step=3600)
    assert np.isfinite(o.result["lon"].values[:, -1]).all()
