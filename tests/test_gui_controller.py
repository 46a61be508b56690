"""GUI application logic, headless (reference parity:
opendrift/scripts/opendrift_gui.py — the Tk view itself needs a
display and is exercised manually)."""

import numpy as np
import pytest

NORDIC = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
          "Nordic_subset.nc")


def test_controller_model_listing_and_seed_form():
    from opendrift_tpu.scripts.gui import GuiController
    ctl = GuiController()
    models = ctl.available_models()
    assert "OceanDrift" in models and "OpenOil" in models
    ctl.select_model("Leeway")
    items = dict(ctl.seed_config_items())
    assert "seed:object_type" in items


def test_controller_end_to_end_run():
    import os
    if not os.path.exists(NORDIC):
        pytest.skip("no Nordic test data")
    from opendrift_tpu.scripts.gui import GuiController
    ctl = GuiController()
    ctl.select_model("OceanDrift")
    ctl.simulation.set_config("general:use_auto_landmask", False)
    r = ctl.add_forcing(NORDIC)
    logs = []
    o = ctl.run(lon=13.28, lat=66.86, radius=300, number=20,
                start_time=r.times[0], duration_hours=2,
                time_step=900, log=logs.append)
    lon = np.asarray(o.result["lon"])
    assert np.isfinite(lon).all()
    assert np.abs(lon[:, -1] - lon[:, 0]).max() > 1e-4
    assert any("finished" in s for s in logs)


def test_controller_warns_outside_coverage():
    import os
    if not os.path.exists(NORDIC):
        pytest.skip("no Nordic test data")
    from opendrift_tpu.scripts.gui import GuiController
    ctl = GuiController()
    ctl.select_model("OceanDrift")
    ctl.simulation.set_config("general:use_auto_landmask", False)
    r = ctl.add_forcing(NORDIC)
    logs = []
    ctl.run(lon=0.0, lat=50.0, number=5, start_time=r.times[0],
            duration_hours=0.5, time_step=900, log=logs.append)
    assert any("WARNING" in s and "outside" in s for s in logs)


def test_config_form_groups_and_apply():
    """Generated config forms: grouped schema items at ESSENTIAL/BASIC
    level, typed parsing, validated application (reference
    opendrift_gui.py auto-generated forms)."""
    from opendrift_tpu.scripts.gui import GuiController
    c = GuiController()
    c.select_model("OceanDrift")
    groups = c.config_form_groups()
    assert "seed" in groups and "drift" in groups
    # every default-form item is at most BASIC level
    for items in groups.values():
        for k, _ in items:
            assert c.simulation._config[k].level <= 2
    # advanced view picks up enum specs like the advection scheme
    adv = c.config_form_groups(max_level=3)
    keys = [k for items in adv.values() for k, _ in items]
    assert "drift:advection_scheme" in keys
    spec = dict(adv["drift"])["drift:advection_scheme"]
    assert "euler" in spec["enum"]
    # typed parsing + application through set_config
    n = c.apply_config_form({"drift:advection_scheme": "runge-kutta4",
                             "seed:number": "500"}, log=lambda m: None)
    assert n == 2
    assert c.simulation.get_config("drift:advection_scheme") \
        == "runge-kutta4"
    assert c.simulation.get_config("seed:number") == 500
    # invalid enum rejected with a validation error
    import pytest as _pytest
    with _pytest.raises(Exception):
        c.apply_config_form({"drift:advection_scheme": "warp-drive"})


def test_controller_cone_seeding():
    from datetime import datetime, timedelta
    from opendrift_tpu.scripts.gui import GuiController
    c = GuiController()
    c.select_model("OceanDrift")
    o = c.simulation
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.1)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.0)
    t0 = datetime(2021, 1, 1)
    c.run(lon=4.0, lat=60.0, end_lon=5.0, end_lat=61.0,
          number=50, radius=0.0, start_time=t0,
          end_time=t0 + timedelta(hours=2),
          duration_hours=3.0, time_step=1800, log=lambda m: None)
    import numpy as np
    lon = np.asarray(o.result["lon"].values)
    # seeded along the line between the two positions, released over
    # the cone's time interval (later rows hold the far-end seeds)
    assert np.nanmin(lon) <= 4.01 and np.nanmax(lon) > 4.9
