"""Legacy models (OpenHNS, OpenBergOld) and the model template
(reference parity: opendrift/models/legacy/openhns.py,
opendrift/models/model_template.py)."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.fields.analytic import ConstantReader


def test_openhns_phase_transitions_conserve_mass():
    from opendrift_tpu.models import OpenHNS
    m = OpenHNS(loglevel=50)
    m.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.2, "y_sea_water_velocity": 0.0,
        "x_wind": 8.0, "y_wind": 0.0}))
    m.set_config("general:use_auto_landmask", False)
    m.set_config("environment:fallback:land_binary_mask", 0)
    m.set_config("drift:vertical_mixing", False)
    m.seed_elements(lon=4.0, lat=60.0, time=datetime(2020, 1, 1),
                    number=200, hns_type="acetone")
    m.run(duration=timedelta(hours=6), time_step=600)
    me = np.asarray(m.result["mass_evaporated"])[:, -1]
    md = np.asarray(m.result["mass_dissolved"])[:, -1]
    mm = np.asarray(m.result["mass"])[:, -1]
    assert np.allclose(me + md + mm, 1.0)
    # acetone: evaporation dominates dissolution (0.16 vs 0.01 per step)
    assert (me > 0).mean() > 5 * (md > 0).mean()
    z = np.asarray(m.result["z"])[:, -1]
    assert np.all(z[me > 0] == 10.0)        # lofted
    if (md > 0).any():
        assert np.all(z[md > 0] <= -10.0)   # submerged


def test_openhns_type_rates_differ():
    from opendrift_tpu.models import OpenHNS
    fracs = {}
    for hns_type in ("butyl", "xylene"):
        m = OpenHNS(loglevel=50)
        m.add_reader(ConstantReader({
            "x_sea_water_velocity": 0.0, "y_sea_water_velocity": 0.0,
            "x_wind": 0.0, "y_wind": 0.0}))
        m.set_config("general:use_auto_landmask", False)
        m.set_config("environment:fallback:land_binary_mask", 0)
        m.set_config("drift:vertical_mixing", False)
        m.seed_elements(lon=4.0, lat=60.0, time=datetime(2020, 1, 1),
                        number=300, hns_type=hns_type)
        m.run(duration=timedelta(hours=2), time_step=600)
        me = np.asarray(m.result["mass_evaporated"])[:, -1]
        fracs[hns_type] = (me > 0).mean()
    assert fracs["xylene"] > fracs["butyl"]  # 0.25 vs 0.03 per step


def test_openberg_old_deprecation_alias():
    from opendrift_tpu.models import OpenBergOld, OpenBerg
    with pytest.warns(DeprecationWarning):
        m = OpenBergOld(loglevel=50)
    assert isinstance(m, OpenBerg)


def test_model_template_runs():
    from opendrift_tpu.models import ModelTemplate
    m = ModelTemplate(loglevel=50)
    m.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.1, "y_sea_water_velocity": 0.0}))
    m.set_config("general:use_auto_landmask", False)
    m.set_config("environment:fallback:land_binary_mask", 0)
    m.set_config("template:my_setting", 2.0)
    m.seed_elements(lon=4.0, lat=60.0, time=datetime(2020, 1, 1),
                    number=3, my_property=1.0)
    m.run(duration=timedelta(hours=2), time_step=600)
    mp = np.asarray(m.result["my_property"])
    assert np.allclose(mp[:, -1], 5.0)  # 1 + rate 2 * 2 h
    lon = np.asarray(m.result["lon"])
    assert np.all(lon[:, -1] > lon[:, 0])


def test_model_registry_includes_new_models():
    import opendrift_tpu
    names = opendrift_tpu.get_model_names()
    for n in ("OpenHNS", "ModelTemplate", "OceanDrift"):
        assert n in names
    assert opendrift_tpu.get_model("OpenHNS").__name__ == "OpenHNS"
