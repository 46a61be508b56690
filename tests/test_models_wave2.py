"""Model zoo wave 2: OpenBerg, LarvalFish, SeaLice, RadionuclideDrift,
ChemicalDrift (behavioural checks on constant forcing)."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.models import (OpenBerg, LarvalFish, SeaLice,
                                  RadionuclideDrift, ChemicalDrift)
from opendrift_tpu.fields import ConstantReader

T0 = datetime(2021, 3, 15)


def _env(**extra):
    base = {"x_sea_water_velocity": 0.0, "y_sea_water_velocity": 0.0,
            "x_wind": 0.0, "y_wind": 0.0}
    base.update(extra)
    return ConstantReader(base)


# -------------------------------------------------------------- OpenBerg --

def test_iceberg_drift_direction_and_speed():
    """In pure current, icebergs drift with the current; added wind
    pushes them downwind at a few percent."""
    o = OpenBerg(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:coriolis", False)
    o.set_config("drift:horizontal_diffusivity", 0.0)
    o.set_config("environment:fallback:horizontal_diffusivity", 0.0)
    o.add_reader(_env(x_sea_water_velocity=0.3, x_wind=15.0))
    o.seed_elements(2.0, 70.0, number=5, time=T0)
    o.run(duration=timedelta(hours=12), time_step=1800)
    lon = o.result["lon"].values
    u_eff = (lon[:, -1] - lon[:, 0]) * 111320 * np.cos(np.radians(70)) \
        / (12 * 3600)
    # between pure current (0.3) and current+wind drift (< 0.3 + 2% wind)
    assert (u_eff > 0.25).all()
    assert (u_eff < 0.75).all()


def test_iceberg_grounding():
    """Deep-draft iceberg in shallow water grounds (stops moving)."""
    o = OpenBerg(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("general:seafloor_action", "none")
    # disable rollover: the tall test berg would otherwise capsize into a
    # shallow-draft berg and float free
    o.set_config("processes:roll_over", False)
    o.set_config("drift:horizontal_diffusivity", 0.0)
    o.set_config("environment:fallback:horizontal_diffusivity", 0.0)
    o.add_reader(_env(x_sea_water_velocity=0.5,
                      sea_floor_depth_below_sea_level=50.0))
    o.seed_elements(2.0, 70.0, number=3, time=T0, draft=90.0, sail=10.0)
    o.run(duration=timedelta(hours=6), time_step=1800)
    lon = o.result["lon"].values
    # grounded: no movement at all
    assert np.allclose(lon[:, -1], lon[:, 0], atol=1e-5)


def test_iceberg_rollover():
    """A tall narrow iceberg is unstable and rolls over at seeding."""
    o = OpenBerg(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_env())
    # W/H = 20/150 << crit ~ 0.92 -> must roll
    o.seed_elements(2.0, 70.0, number=1, time=T0, draft=140.0, sail=10.0,
                    length=100.0, width=20.0)
    o.run(steps=2, time_step=600)
    draft = o.result["draft"].values[0, -1]
    sail = o.result["sail"].values[0, -1]
    H = draft + sail
    W = o.result["width"].values[0, -1]
    crit = np.sqrt(6 * (900 / 1027) * (1 - 900 / 1027))
    assert W / H >= crit - 1e-3


# ------------------------------------------------------------ LarvalFish --

def test_larvalfish_hatch_and_grow():
    o = LarvalFish(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_env(sea_water_temperature=12.0, sea_water_salinity=34.0))
    o.seed_elements(2.0, 62.0, z=-10.0, number=50, time=T0)
    # egg development at 12C: exp(3.65-0.145*12) = 6.7 days
    o.run(duration=timedelta(days=9), time_step=3600 * 3,
          time_step_output=timedelta(days=1))
    hatched = o.result["hatched"].values
    assert (hatched[:, 0] == 0).all()
    assert (hatched[:, -1] == 1).all()     # all hatched after 9 days
    # larvae grew beyond the initial 0.08 mg
    w = o.result["weight"].values[:, -1]
    assert (w > 0.1).all()
    L = o.result["length"].values[:, -1]
    assert (L > 3.0).all() and (L < 20.0).all()  # plausible larval length


# --------------------------------------------------------------- SeaLice --

def test_sealice_population_dynamics():
    o = SeaLice(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_env(sea_water_temperature=10.0, sea_water_salinity=34.0,
                      surface_net_downward_radiative_flux=100.0))
    o.seed_elements(2.0, 60.0, z=-5.0, number=20, time=T0)
    o.run(duration=timedelta(days=5), time_step=3600 * 2,
          time_step_output=timedelta(days=1))
    naup = o.result["nauplii"].values
    cope = o.result["copepodid"].values
    assert naup[:, 1].max() > 0          # cohort initialised
    assert cope[:, 0].max() == 0
    assert cope[:, -1].max() > 0         # maturation happened after day 3.6
    dd = o.result["degree_days"].values[:, -1]
    np.testing.assert_allclose(dd[np.isfinite(dd)], 50.0, rtol=0.05)


def test_sealice_swims_to_light():
    o = SeaLice(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.add_reader(_env(sea_water_temperature=10.0, sea_water_salinity=34.0,
                      surface_net_downward_radiative_flux=300.0))
    o.seed_elements(2.0, 60.0, z=-3.0, number=10, time=T0)
    o.run(duration=timedelta(hours=24), time_step=3600)
    z = o.result["z"].values
    assert np.nanmean(z[:, -1]) > np.nanmean(z[:, 0])  # swam upwards


# ------------------------------------------------------- RadionuclideDrift

def test_radionuclide_speciation():
    """137Cs: dissolved/particle exchange happens; some particles reach
    the sediment and freeze."""
    o = RadionuclideDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("seed:LMM_fraction", 0.5)
    o.set_config("seed:particle_fraction", 0.5)
    # keep constant-K mixing so particles reach the seabed: with a
    # fallback-only diffusivity the 'environment' model now switches to
    # windspeed_Large1994 like the reference (oceandrift.py:432-445) —
    # zero wind here would mean no mixing at all
    o.set_config("vertical_mixing:diffusivitymodel", "constant")
    o.set_config("environment:fallback:ocean_vertical_diffusivity", 1e-4)
    o.add_reader(_env(sea_water_temperature=8.0, sea_water_salinity=34.0,
                      sea_floor_depth_below_sea_level=30.0))
    o.seed_elements(2.0, 60.0, z=-20.0, number=400, time=T0)
    o.run(duration=timedelta(days=4), time_step=3600 * 2)
    specie = o.result["specie"].values
    # initial split
    assert (specie[:, 0] == 0).sum() == 200
    # sediment species appeared (code 2)
    assert (specie[:, -1] == 2).sum() > 0
    # transformations occurred in both directions over the run
    assert (specie[:, -1] != specie[:, 0]).sum() > 10
    # sedimented elements sit at the seafloor and are frozen
    moving = o.result["moving"].values[:, -1]
    sed = specie[:, -1] == 2
    assert (moving[sed] == 0).all()
    z_sed = o.result["z"].values[:, -1][sed]
    np.testing.assert_allclose(z_sed, -30.0, atol=1.5)


# ---------------------------------------------------------- ChemicalDrift

def test_chemical_degradation_and_partitioning():
    o = ChemicalDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("chemical:transformations:t12_W_tot", 48.0)  # fast decay
    o.add_reader(_env(sea_water_temperature=15.0, sea_water_salinity=34.0,
                      sea_floor_depth_below_sea_level=40.0,
                      spm=50.0))  # turbid water: partitioning visible
    o.seed_elements(2.0, 60.0, z=-10.0, number=200, time=T0, mass=1000.0)
    o.run(duration=timedelta(days=3), time_step=3600 * 2)
    mass = o.result["mass"].values
    degraded = o.result["mass_degraded"].values
    m0 = np.nansum(mass[:, 0])
    # ~1/3 half-life per day at Tref; mass must decrease notably
    assert np.nansum(mass[:, -1]) < 0.8 * m0
    # conservation: mass + degraded stays constant
    total_end = np.nansum(mass[:, -1]) + np.nansum(degraded[:, -1])
    assert abs(total_end - m0) / m0 < 0.02
    # some chemical attached to SPM or sediment during the run
    specie = o.result["specie"].values
    assert (specie[:, -1] > 0).sum() > 0


def test_chemical_volatilization():
    o = ChemicalDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("chemical:transformations:degradation", False)
    o.set_config("chemical:transformations:volatilization", True)
    o.add_reader(_env(sea_water_temperature=15.0, sea_water_salinity=34.0,
                      x_wind=10.0))
    o.seed_elements(2.0, 60.0, z=-2.0, number=50, time=T0, mass=1000.0)
    o.run(duration=timedelta(days=2), time_step=3600 * 2)
    vol = o.result["mass_volatilized"].values[:, -1]
    assert np.nansum(vol) > 0.0
    total = np.nansum(o.result["mass"].values[:, -1]) + np.nansum(vol)
    assert abs(total - 50 * 1000.0) / (50 * 1000.0) < 0.02


def test_chemical_compound_presets():
    """chemical:compound presets (reference chemicaldrift.py:3053+) set
    the partitioning/degradation/volatilization constants."""
    import jax
    from opendrift_tpu.models.chemicaldrift import ChemicalDrift
    o = ChemicalDrift(loglevel=40)
    o.init_chemical_compound("Phenanthrene")
    assert o.get_config("chemical:transformations:LogKOW") == 4.505
    assert o.get_config("chemical:transformations:MolWt") == 178.226
    assert o.get_config("chemical:transfer_setup") == "organics"
    o2 = ChemicalDrift(loglevel=40)
    o2.init_chemical_compound("Copper")
    assert o2.get_config("chemical:transfer_setup") == "metals"
    assert o2.get_config("chemical:transformations:Kd") == 50
    assert o2.name_species[1] == "Particle reversible"
    assert "Humic colloid" not in o2.name_species
    import pytest
    with pytest.raises(ValueError):
        ChemicalDrift(loglevel=40).init_chemical_compound("Unobtainium")


def test_chemical_metals_run():
    """Kd-based metal speciation runs end-to-end and partitions mass
    onto particles/sediment."""
    import numpy as np
    from datetime import datetime, timedelta
    from opendrift_tpu.models.chemicaldrift import ChemicalDrift
    from opendrift_tpu.fields.analytic import ConstantReader
    o = ChemicalDrift(loglevel=40)
    o.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.05, "y_sea_water_velocity": 0.0,
        "land_binary_mask": 0.0, "sea_water_temperature": 10.0,
        "sea_water_salinity": 34.0,
        "sea_floor_depth_below_sea_level": 30.0, "spm": 50.0}))
    o.init_chemical_compound("Cadmium")
    o.seed_elements(lon=4.0, lat=60.0, z=-2.0, number=1000,
                    time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=48), time_step=1800)
    specie = np.asarray(o.result["specie"])[:, -1]
    ok = np.isfinite(specie)
    n_converted = (specie[ok] != 0).sum()
    assert ok.sum() > 900
    # Cadmium Kd=6.6, Dc=1.16e-5/s: expected ~1.3% adsorb to SPM in 48 h
    assert n_converted >= 2


def test_chemical_density_map_and_summary(tmp_path):
    """write_netcdf_chemical_density_map + resuspension + summary
    (reference chemicaldrift.py:1633-1680, 1913-1950, 1957-2520)."""
    import numpy as np
    from datetime import datetime, timedelta
    from opendrift_tpu.models.chemicaldrift import ChemicalDrift
    from opendrift_tpu.fields.analytic import ConstantReader
    o = ChemicalDrift(loglevel=40)
    o.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.2, "y_sea_water_velocity": 0.0,
        "land_binary_mask": 0.0, "sea_water_temperature": 12.0,
        "sea_water_salinity": 34.0,
        "sea_floor_depth_below_sea_level": 40.0, "spm": 10.0}))
    o.init_chemical_compound("Phenanthrene")
    o.seed_elements(lon=4.0, lat=60.0, z=-1.0, number=500,
                    time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=12), time_step=1800)

    out = tmp_path / "chem_map.nc"
    o.write_netcdf_chemical_density_map(
        str(out), pixelsize_m=2000.0, zlevels=[-40.0, -10.0, -5.0],
        horizontal_smoothing=True, time_avg_conc=True)
    from scipy.io import netcdf_file
    f = netcdf_file(str(out), "r", mmap=False)
    conc = f.variables["concentration"][:]
    assert conc.shape[1] == o.nspecies
    assert conc.shape[2] == 3
    assert np.isfinite(conc).all() and conc.sum() > 0
    avg = f.variables["concentration_avg"][:]
    assert avg.shape == conc.shape[1:]
    f.close()

    o.simulation_summary()
    assert o.specie_num2name(0) == "LMM"


def test_radionuclide_density_map_and_resuspension(tmp_path):
    """Radionuclide density map writer + resuspension config
    (reference radionuclides.py resuspension + density map)."""
    import numpy as np
    from datetime import datetime, timedelta
    from opendrift_tpu.models.radionuclides import RadionuclideDrift
    from opendrift_tpu.fields.analytic import ConstantReader
    o = RadionuclideDrift(loglevel=40)
    o.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.3, "y_sea_water_velocity": 0.0,
        "land_binary_mask": 0.0, "sea_water_temperature": 10.0,
        "sea_water_salinity": 34.0,
        "sea_floor_depth_below_sea_level": 20.0}))
    o.set_config("radionuclide:isotope", "137Cs")
    o.seed_elements(lon=4.0, lat=60.0, z=-2.0, number=300,
                    time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=12), time_step=1800)
    out = tmp_path / "rn_map.nc"
    o.write_netcdf_radionuclide_density_map(
        str(out), pixelsize_m=2000.0, zlevels=[-20.0, -5.0])
    from scipy.io import netcdf_file
    f = netcdf_file(str(out), "r", mmap=False)
    dens = f.variables["density"][:]
    assert dens.shape[1] == o.nspecies and dens.shape[2] == 2
    assert dens.sum() > 0
    f.close()
    assert o.specie_num2name(0) == "LMM"


def test_chemical_emission_seeding():
    """seed_from_DataArray / emission_factors (reference
    chemicaldrift.py:2754-3050: scrubber-water discharge seeding)."""
    import numpy as np
    from datetime import datetime
    from opendrift_tpu.models.chemicaldrift import ChemicalDrift

    o = ChemicalDrift(loglevel=40)
    assert o.emission_factors("open_loop", "Copper") > 0
    assert o.emission_factors("AFP_metals_total", "x") == 1e6
    # 2x2x2 discharge field: one wet cell per time
    data = np.zeros((2, 2, 2))
    data[0, 0, 1] = 1000.0     # L of scrubber water
    data[1, 1, 0] = 2000.0
    lons = np.array([4.0, 4.5])
    lats = np.array([60.0, 60.2])
    times = np.array([np.datetime64("2020-01-01T00"),
                      np.datetime64("2020-01-01T06")])
    o.seed_from_DataArray(data, longitude=lons, latitude=lats,
                          time=times, scrubber_type="open_loop",
                          chemical_compound="Copper",
                          mass_element_ug=10e3)
    lon0 = np.concatenate([s["lon"] for s in o._seedings])
    assert len(lon0) > 2
    factor = o.emission_factors("open_loop", "Copper")
    total = sum(np.sum(s["mass"]) for s in o._seedings
                if "mass" in s)
    assert np.isclose(total, 3000.0 * factor, rtol=1e-5)


def test_radionuclide_al_colloid_chemistry():
    """Al 'LMM + Colloid + Rev' setup: salinity-banded transfer rates
    (Simonsen 2019b; reference radionuclides.py:585-650) populate the
    colloid/polymer species in brackish water."""
    o = RadionuclideDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("radionuclide:isotope", "Al")
    o.set_config("radionuclide:specie_setup", "LMM + Colloid + Rev")
    o.set_config("seed:LMM_fraction", 1.0)
    o.set_config("seed:particle_fraction", 0.0)
    o.set_config("drift:vertical_mixing", False)
    o.add_reader(_env(sea_water_temperature=8.0, sea_water_salinity=5.0,
                      sea_floor_depth_below_sea_level=50.0))
    o.seed_elements(2.0, 60.0, z=-5.0, number=300, time=T0)
    o.run(duration=timedelta(hours=48), time_step=3600,
          time_step_output=timedelta(hours=48))
    spec = o.result["specie"].values[:, -1]
    an = o.name_species.index("LMManion")
    pol = o.name_species.index("Polymer")
    prev = o.name_species.index("Particle reversible")
    cat = o.name_species.index("LMMcation")
    # cations polymerise fast (1.2e-4/s) and polymer depolymerises to
    # anions (12*Dc): after 48 h anions dominate, with polymer and
    # particle pools populated and few cations left
    assert (spec == an).mean() > 0.5
    assert (spec == pol).any() and (spec == prev).any()
    assert (spec == cat).mean() < 0.1


def test_radionuclide_speciation_legality():
    o = RadionuclideDrift(loglevel=40)
    o.set_config("radionuclide:isotope", "129I")
    o.set_config("radionuclide:specie_setup", "LMM + Rev + Slow rev")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="Illegal speciation"):
        o.transfer_rates_matrix()


def test_radionuclide_gui_postproc(tmp_path):
    """GUI post-processing hooks (reference radionuclides.py:1559-1740):
    gui_postproc logs speciation + saves the concentration file;
    guipp_plotandsaveconc renders PNGs from it; the profile animation
    colours by specie with a categorical legend."""
    import os
    import numpy as np
    from datetime import datetime, timedelta
    from opendrift_tpu.models.radionuclides import RadionuclideDrift
    from opendrift_tpu.fields.analytic import ConstantReader

    o = RadionuclideDrift(loglevel=40)
    o.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.3, "y_sea_water_velocity": 0.0,
        "land_binary_mask": 0.0, "sea_water_temperature": 10.0,
        "sea_water_salinity": 34.0,
        "sea_floor_depth_below_sea_level": 20.0}))
    o.set_config("radionuclide:isotope", "137Cs")
    o.seed_elements(lon=4.0, lat=60.0, z=-2.0, number=120,
                    time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=6), time_step=1800)
    conc = tmp_path / "conc_radio_gui.nc"
    out = o.gui_postproc(filename=str(conc), pixelsize_m=2000.0)
    assert os.path.exists(out)
    pngs = o.guipp_plotandsaveconc(
        str(conc), str(tmp_path / "RadioConc"), zlayers=[0],
        specie=["Total", "LMM"])
    assert len(pngs) > 0 and all(os.path.exists(p) for p in pngs)
    anim = o.guipp_showanimationprofile(
        filename=str(tmp_path / "prof.gif"), fps=4)
    assert os.path.exists(tmp_path / "prof.gif")
