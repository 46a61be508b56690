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
