"""ChemicalDrift pH-dependent KOC corrections, species-change diameter
updates and bathymetry-aware concentration volumes (reference parity:
chemicaldrift.py:593-713, :1550-1620, :2238-2254/2685-2716)."""

import ast
import os
import textwrap
from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.models import ChemicalDrift
from opendrift_tpu.fields import ConstantReader

REF = "/root/reference/opendrift/models/chemicaldrift.py"
T0 = datetime(2021, 5, 1)


def _load_ref_koc_functions():
    """Extract the reference's calc_KOC_* methods (pure numpy, self
    unused) and exec them standalone."""
    tree = ast.parse(open(REF).read())
    src = open(REF).read().splitlines()
    ns = {"np": np}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
                "calc_KOC_sedcorr", "calc_KOC_watcorrSPM",
                "calc_KOC_watcorrDOM"):
            body = textwrap.dedent(
                "\n".join(src[node.lineno - 1:node.end_lineno]))
            exec(body, ns)
    return ns


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference source unavailable")
@pytest.mark.parametrize("diss", ["acid", "base", "amphoter", "undiss"])
def test_koc_corrections_match_reference(diss):
    ref = _load_ref_koc_functions()
    KOW = 10.0 ** 3.361
    pKa_acid, pKa_base = 4.5, 6.0
    KOC_sed_n = 2.62 * KOW ** 0.82
    KOC_DOM_n = 2.88 * KOW ** 0.67
    pH = np.linspace(5.5, 8.6, 13)

    ours_sed = np.asarray(ChemicalDrift.calc_KOC_corr_particle(
        KOC_sed_n, KOC_sed_n, pKa_acid, pKa_base, KOW, pH, diss))
    ref_sed = ref["calc_KOC_sedcorr"](None, KOC_sed_n, KOC_sed_n,
                                      pKa_acid, pKa_base, KOW, pH, diss)
    np.testing.assert_allclose(ours_sed, ref_sed, rtol=1e-12)

    ours_spm = np.asarray(ChemicalDrift.calc_KOC_corr_particle(
        KOC_sed_n, KOC_sed_n, pKa_acid, pKa_base, KOW, pH, diss))
    ref_spm = ref["calc_KOC_watcorrSPM"](None, KOC_sed_n, KOC_sed_n,
                                         pKa_acid, pKa_base, KOW, pH,
                                         diss)
    np.testing.assert_allclose(ours_spm, ref_spm, rtol=1e-12)

    ours_dom = np.asarray(ChemicalDrift.calc_KOC_corr_DOM(
        KOC_DOM_n, KOC_DOM_n, pKa_acid, pKa_base, KOW, pH, diss))
    ref_dom = ref["calc_KOC_watcorrDOM"](None, KOC_DOM_n, KOC_DOM_n,
                                         pKa_acid, pKa_base, KOW, pH,
                                         diss)
    np.testing.assert_allclose(ours_dom, ref_dom, rtol=1e-12)


def _run_chem(ph_value=8.1, diss="nondiss", hours=48, **cfg):
    o = ChemicalDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:vertical_mixing", False)
    o.set_config("chemical:transformations:dissociation", diss)
    if diss != "nondiss":
        o.set_config("chemical:transformations:pKa_acid", 4.5)
        o.set_config("chemical:transformations:pKa_base", 6.0)
    for k, v in cfg.items():
        o.set_config(k, v)
    o.add_reader(ConstantReader({
        "x_sea_water_velocity": 0.0, "y_sea_water_velocity": 0.0,
        "x_wind": 0.0, "y_wind": 0.0,
        "sea_water_ph_reported_on_total_scale": ph_value,
        "sea_floor_depth_below_sea_level": 100.0}))
    o.seed_elements(4.0, 60.0, z=-5.0, number=400, time=T0)
    o.run(duration=timedelta(hours=hours), time_step=3600,
          time_step_output=timedelta(hours=hours))
    return o


def test_ph_changes_partitioning_for_acids():
    """Dissociation scales the desorption rate by
    KOC_updated/KOC_initial as the reference does (chemicaldrift.py
    :1325-1340, k * KOC_sedcorr): for an acid at pH >> pKa the factor
    is << 1, so desorption slows and less mass ends up dissolved than
    in the nondissociating run."""
    kw = {"seed:LMM_fraction": 0.0, "seed:particle_fraction": 1.0}
    o_nond = _run_chem(ph_value=8.1, diss="nondiss", hours=24, **kw)
    o_acid = _run_chem(ph_value=8.1, diss="acid", hours=24, **kw)
    lmm = 0
    frac_nond = (o_nond.result["specie"].values[:, -1] == lmm).mean()
    frac_acid = (o_acid.result["specie"].values[:, -1] == lmm).mean()
    assert frac_acid < frac_nond - 0.3, (frac_nond, frac_acid)


def test_ph_gradient_monotone():
    """Higher pH -> more dissociation -> smaller KOC_updated/KOC_initial
    factor -> slower desorption -> smaller dissolved fraction
    (direction follows the reference's k * KOC_corr update)."""
    kw = {"seed:LMM_fraction": 0.0, "seed:particle_fraction": 1.0}
    fr = []
    for ph in (5.0, 7.0, 9.0):
        o = _run_chem(ph_value=ph, diss="acid", hours=24, **kw)
        fr.append((o.result["specie"].values[:, -1] == 0).mean())
    assert fr[0] > fr[1] > fr[2], fr


def test_diameter_updated_on_species_change():
    """Elements desorbing from SPM to LMM get the dissolved diameter;
    seeded SPM elements carry particle_diameter +/- uncertainty
    (reference update_chemical_diameter, chemicaldrift.py:1550-1620)."""
    o = _run_chem(
        ph_value=8.1, hours=24,
        **{"seed:LMM_fraction": 0.0, "seed:particle_fraction": 1.0,
           "chemical:transformations:LogKOW": 0.0,   # tiny Kd: desorbs
           "chemical:dissolved_diameter": 2e-6,
           "chemical:particle_diameter": 5e-6,
           "chemical:particle_diameter_uncertainty": 1e-7})
    spec = o.result["specie"].values[:, -1]
    dia = o.result["diameter"].values[:, -1]
    dia0 = o.result["diameter"].values[:, 0]
    assert (spec == 0).any()
    np.testing.assert_allclose(dia[spec == 0], 2e-6, rtol=1e-6)
    # still-particle elements keep seeded diameter (5e-6 +- noise)
    assert abs(dia0.mean() - 5e-6) < 5e-8
    assert dia0.std() > 0  # seeded uncertainty applied


def test_density_map_uses_pixel_mean_depth(tmp_path):
    """With 3 m of water and a 5 m top layer, concentrations divide by
    the truncated 3 m volume (reference chemicaldrift.py:2238-2254)."""
    from opendrift_tpu.utils import ncio

    def run(depth):
        o = ChemicalDrift(loglevel=40)
        o.set_config("environment:fallback:land_binary_mask", 0)
        o.set_config("drift:vertical_mixing", False)
        o.add_reader(ConstantReader({
            "x_sea_water_velocity": 0.0, "y_sea_water_velocity": 0.0,
            "x_wind": 0.0, "y_wind": 0.0,
            "sea_floor_depth_below_sea_level": float(depth)}))
        o.seed_elements(4.0, 60.0, z=-1.0, number=100, time=T0)
        o.run(duration=timedelta(hours=2), time_step=3600)
        path = str(tmp_path / f"conc_{depth}.nc")
        o.write_netcdf_chemical_density_map(path, pixelsize_m=2000.0,
                                            zlevels=(-5.0,))
        f = ncio.NCFile(path)
        c = np.asarray(f.variables["concentration"][:])
        return np.nanmax(c)

    c_deep = run(100.0)   # full 5 m layer volume
    c_shallow = run(3.0)  # truncated to 3 m
    np.testing.assert_allclose(c_shallow / c_deep, 5.0 / 3.0, rtol=0.01)
