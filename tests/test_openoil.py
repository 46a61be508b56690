"""OpenOil: weathering, entrainment, droplet physics
(mirrors reference tests/models/openoil/ suites on constant forcing)."""

from datetime import datetime, timedelta

import numpy as np
import jax.numpy as jnp
import pytest

from opendrift_tpu.models import OpenOil
from opendrift_tpu.models.openoil.oil_db import OilType, get_oil_names
from opendrift_tpu.fields import ConstantReader

T0 = datetime(2021, 6, 10)


def _env(**extra):
    base = {"x_sea_water_velocity": 0.2, "y_sea_water_velocity": 0.0,
            "x_wind": 8.0, "y_wind": 0.0, "sea_water_temperature": 12.0,
            "sea_water_salinity": 34.0}
    base.update(extra)
    return ConstantReader(base)


def test_oil_database():
    names = get_oil_names()
    assert len(names) > 1000
    oil = OilType("GENERIC MEDIUM CRUDE")
    assert 850 < oil.density_ref < 950
    assert len(oil.boiling_point) == 10
    # boiling points monotonically increasing
    assert (np.diff(oil.boiling_point) > 0).all()
    # light components must have non-negligible vapor pressure at 15 C
    vp = np.asarray(oil.vapor_pressure(jnp.asarray([288.15])))
    assert vp[0, 0] > 100.0       # lightest component: evaporates
    assert vp[-1, 0] < vp[0, 0] * 1e-3  # heaviest: effectively involatile
    # viscosity increases as temperature drops
    assert float(oil.kvis_at_temp(278.15)) > float(oil.kvis_at_temp(298.15))


def test_oil_not_found():
    with pytest.raises(ValueError, match="not found"):
        OilType("NOT_A_REAL_OIL_XYZ")


def test_weathering_budget_conservation():
    """Mass budget closes: surface + submerged + evaporated + dispersed +
    biodegraded equals the seeded mass."""
    o = OpenOil(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("processes:biodegradation", True)
    o.add_reader(_env())
    o.seed_elements(4.0, 60.0, number=100, time=T0, mass_oil=1.0,
                    oil_type="GENERIC MEDIUM CRUDE")
    o.run(duration=timedelta(hours=12), time_step=1800)
    budget = o.get_oil_budget()
    total0 = 100 * 1.0
    assert abs(budget["mass_total"][-1] - total0) / total0 < 0.05
    # weathering must actually remove mass from the slick
    assert budget["mass_evaporated"][-1] > 0.02 * total0
    assert budget["mass_dispersed"][-1] > 0.0


def test_evaporation_light_vs_heavy():
    """A light condensate evaporates much faster than a heavy crude."""
    results = {}
    for name in ["GENERIC GASOLINE", "GENERIC HEAVY CRUDE"]:
        o = OpenOil(loglevel=40)
        o.set_config("environment:fallback:land_binary_mask", 0)
        o.set_config("processes:dispersion", False)
        o.set_config("drift:vertical_mixing", False)
        o.add_reader(_env())
        o.seed_elements(4.0, 60.0, number=50, time=T0, mass_oil=1.0,
                        oil_type=name)
        o.run(duration=timedelta(hours=6), time_step=1800)
        frac = np.nanmean(o.result["fraction_evaporated"].values[:, -1])
        results[name] = frac
    assert results["GENERIC GASOLINE"] > 2 * results["GENERIC HEAVY CRUDE"]
    assert results["GENERIC GASOLINE"] > 0.1


def test_entrainment_submerges_oil():
    """Strong wind entrains surface oil into the water column and
    assigns droplet diameters."""
    o = OpenOil(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_env(x_wind=15.0))
    o.seed_elements(4.0, 60.0, number=200, time=T0,
                    oil_type="GENERIC LIGHT CRUDE")
    o.run(duration=timedelta(hours=6), time_step=1800)
    z = o.result["z"].values[:, -1]
    diam = o.result["diameter"].values[:, -1]
    submerged = z < 0
    assert submerged.mean() > 0.2
    # entrained droplets got spectrum diameters in [1 micron, 3 mm]
    d_sub = diam[submerged]
    assert (d_sub > 0).all()
    assert (d_sub >= 1e-6).all() and (d_sub <= 3e-3).all()


def test_no_entrainment_in_calm():
    o = OpenOil(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_env(x_wind=0.0))
    o.seed_elements(4.0, 60.0, number=50, time=T0)
    o.run(duration=timedelta(hours=3), time_step=1800)
    z = o.result["z"].values[:, -1]
    assert (z == 0).all()


def test_emulsification_water_uptake():
    o = OpenOil(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:vertical_mixing", False)
    o.add_reader(_env(x_wind=12.0))
    o.seed_elements(4.0, 60.0, number=50, time=T0,
                    oil_type="GENERIC HEAVY CRUDE")
    o.run(duration=timedelta(hours=24), time_step=3600)
    wf = o.result["water_fraction"].values[:, -1]
    visc0 = o.result["viscosity"].values[:, 1]
    visc1 = o.result["viscosity"].values[:, -1]
    assert np.nanmax(wf) > 0.1          # mousse formed
    assert np.nanmean(visc1) > np.nanmean(visc0)  # emulsion more viscous


def test_droplet_terminal_velocity_rises():
    """Small oil droplets rise slowly, large rise faster (Tkalich)."""
    o = OpenOil(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_env())
    o.seed_elements(4.0, 60.0, number=2, time=T0)
    import jax
    from opendrift_tpu.models.base import StepContext
    # direct physics check through the public class method
    class FakeCtx:
        state = type("S", (), {"data": {
            "diameter": jnp.asarray([1e-5, 1e-3]),
            "density": jnp.asarray([880.0, 880.0]),
            "z": jnp.asarray([-5.0, -5.0])}})()
        environment = {"sea_water_temperature": jnp.asarray([10.0, 10.0]),
                       "sea_water_salinity": jnp.asarray([34.0, 34.0])}
    w = o.terminal_velocity_inner(FakeCtx(), FakeCtx.state.data["z"], None,
                                  None)
    w = np.asarray(w)
    assert 0 < w[0] < w[1]
    assert w[1] < 0.5


def test_oil_seed_mass_from_discharge_rate(tmp_path):
    """mass_oil computed from m3_per_hour x duration x density when not
    given (reference openoil.py:1737-1754); diagnostics helpers run."""
    import numpy as np
    from datetime import datetime, timedelta
    from opendrift_tpu.models.openoil import OpenOil
    from opendrift_tpu.fields.analytic import ConstantReader
    o = OpenOil(loglevel=40)
    o.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.0, "y_sea_water_velocity": 0.0,
        "land_binary_mask": 0.0, "x_wind": 8.0, "y_wind": 0.0}))
    o.set_config("drift:vertical_mixing", False)
    o.set_config("processes:dispersion", False)
    t0 = datetime(2020, 1, 1)
    o.seed_elements(4.0, 60.0, number=100, m3_per_hour=50.0,
                    time=[t0, t0 + timedelta(hours=2)],
                    oil_type="GENERIC LIGHT CRUDE")
    rho = float(o.oiltype.density_at_temp(288.15))
    expected = 50.0 * 2.0 / 100 * rho
    o.run(duration=timedelta(hours=3), time_step=1800)
    m0 = np.asarray(o.result["mass_oil"])[:, 0]
    m0 = m0[np.isfinite(m0)]
    assert np.allclose(m0, expected, rtol=0.15)
    assert o.get_oil_name() == "GENERIC LIGHT CRUDE"

    frac = o.cumulative_oil_entrainment_fraction()
    assert frac.shape[0] == o.result.sizes["time"]
    o.plot_droplet_spectrum(filename=str(tmp_path / "spec.png"))
    o.plot_oil_watercontent_and_viscosity(
        filename=str(tmp_path / "visc.png"))
    o.set_oiltype("GENERIC DIESEL")
    assert o.get_oil_name() == "GENERIC DIESEL"


def test_oil_seed_mass_uses_config_number():
    """Without an explicit number, the discharge-mass split uses
    seed:number (review fix; reference openoil.py:1743-1748)."""
    import numpy as np
    from datetime import datetime
    from opendrift_tpu.models.openoil import OpenOil
    from opendrift_tpu.fields.analytic import ConstantReader
    o = OpenOil(loglevel=40)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 0.0,
                                 "y_sea_water_velocity": 0.0,
                                 "land_binary_mask": 0.0}))
    o.set_config("seed:number", 200)
    o.seed_elements(4.0, 60.0, m3_per_hour=10.0,
                    time=datetime(2020, 1, 1),
                    oil_type="GENERIC LIGHT CRUDE")
    rho = float(o.oiltype.density_at_temp(288.15))
    m = np.asarray(o._seedings[-1]["mass_oil"])
    assert len(np.atleast_1d(o._seedings[-1]["lon"])) == 200
    assert np.allclose(np.mean(m), 10.0 / 200 * rho, rtol=1e-5)
