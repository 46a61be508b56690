#!/usr/bin/env python
"""Build the compact oil-property database for OpenOil.

Reads the public NOAA ADIOS oil archive (bundled with the reference as an
lzma JSON, reference: opendrift/models/openoil/adios/dirjs.py:33-50) and
derives, per oil, the reduced property set the TPU weathering kernel needs
— pseudo-component boiling points/mass fractions/molecular weights,
density and viscosity reference points, emulsification parameters — using
from-scratch implementations of the standard GNOME/ADIOS estimation
formulas (Jones 1997 distillation correlations; Lehr molecular-weight fit;
interfacial tension from API).  Output: opendrift_tpu/models/openoil/oils_db.json.xz

Usage: python tools/build_oil_db.py [path-to-adios-archive.xz]
"""

import json
import lzma
import sys

import numpy as np

N_COMPONENTS = 10
KELVIN = 273.15


def _temp_K(entry):
    v = entry["value"]
    unit = entry.get("unit", "K")
    return v + KELVIN if unit == "C" else v


def _get_api(rec, density_ref=None):
    api = rec["metadata"].get("API")
    if api is not None:
        return float(api)
    if density_ref is not None:
        sg = density_ref / 999.016
        return 141.5 / sg - 131.5
    return None


def cut_temps_from_api(api, fractions):
    """Distillation temperatures estimated from API gravity alone
    (Jones 1997, as used by ADIOS/GNOME when cuts are missing)."""
    T0 = 457.16 - 3.3447 * api
    dT_dF = 1356.7 - 247.36 * np.log(api)
    return T0 + dT_dF * np.asarray(fractions)


def molecular_weight_from_bp(bp_K):
    """Component molecular weight [kg/mol] from boiling point (Lehr fit,
    ADIOS2 technical documentation)."""
    return 0.04132 - 1.985e-4 * bp_K + 9.494e-7 * bp_K ** 2


def components_from_cuts(cuts, api):
    """N equal-mass pseudo-components with boiling points interpolated
    from the distillation curve; the heaviest residue extrapolated."""
    fr = []
    tk = []
    for c in cuts:
        f = c["fraction"]["value"]
        t = _temp_K(c["vapor_temp"])
        if np.isfinite(f) and np.isfinite(t):
            fr.append(float(f))
            tk.append(float(t))
    order = np.argsort(fr)
    fr = np.asarray(fr)[order]
    tk = np.asarray(tk)[order]
    if len(fr) < 3:
        if api is None or api <= 0:
            return None
        fr = np.linspace(0.0, 1.0, 11)
        tk = cut_temps_from_api(api, fr)
    # mid-fraction of N equal-mass slices
    mids = (np.arange(N_COMPONENTS) + 0.5) / N_COMPONENTS
    # extrapolate flat beyond the last cut (heavy residue keeps the
    # last measured temperature + a 50 K bump per 10% beyond)
    bp = np.interp(mids, fr, tk)
    beyond = mids > fr[-1]
    if beyond.any():
        slope = (tk[-1] - tk[0]) / max(fr[-1] - fr[0], 0.1)
        bp[beyond] = tk[-1] + slope * (mids[beyond] - fr[-1])
    bp = np.clip(bp, 250.0, 1200.0)
    mass_fraction = np.full(N_COMPONENTS, 1.0 / N_COMPONENTS)
    return mass_fraction, bp


def extract_density(props):
    for d in props.get("densities", []):
        try:
            rho = d["density"]["value"]
            unit = d["density"].get("unit", "kg/m^3")
            if unit == "g/cm^3":
                rho *= 1000.0
            t = _temp_K(d["ref_temp"])
            return float(rho), float(t)
        except (KeyError, TypeError):
            continue
    return None


def extract_viscosities(props):
    out = []
    for v in props.get("kinematic_viscosities", []):
        try:
            nu = v["viscosity"]["value"]
            unit = v["viscosity"].get("unit", "m^2/s")
            if unit == "cSt":
                nu *= 1e-6
            t = _temp_K(v["ref_temp"])
            out.append((float(nu), float(t)))
        except (KeyError, TypeError):
            continue
    if not out:
        # fall back to dynamic viscosity / typical density
        for v in props.get("dynamic_viscosities", []):
            try:
                mu = v["viscosity"]["value"]
                unit = v["viscosity"].get("unit", "Pa.s")
                if unit in ("cP", "mPa.s"):
                    mu *= 1e-3
                t = _temp_K(v["ref_temp"])
                out.append((float(mu) / 900.0, float(t)))
            except (KeyError, TypeError):
                continue
    return out


def visc_temperature_coeff(viscs):
    """k in nu(T) = nu_ref exp(k (1/T - 1/Tref)); fitted from two points,
    else the standard 2416 K default."""
    if len(viscs) >= 2:
        (n1, t1), (n2, t2) = viscs[0], viscs[-1]
        if t1 != t2 and n1 > 0 and n2 > 0:
            k = np.log(n1 / n2) / (1.0 / t1 - 1.0 / t2)
            if 500.0 < k < 12000.0:
                return float(k)
    return 2416.0


def bullwinkle_estimate(api):
    """Fraction evaporated at which emulsification starts.  In-house
    estimation (adios_db's estimator needs unavailable metal/asphaltene
    data): heavier oils emulsify earlier; clipped to [0.03, 0.4]."""
    if api is None:
        return 0.2
    return float(np.clip(0.5 - 0.012 * api, 0.03, 0.4))


def extract_emulsion_max(rec):
    for ss in rec.get("sub_samples", []):
        env = ss.get("environmental_behavior", {})
        for em in env.get("emulsions", []):
            wc = em.get("water_content")
            if wc and "value" in wc.get("measurement", wc):
                m = wc.get("measurement", wc)
                v = m["value"]
                if m.get("unit") == "%":
                    v /= 100.0
                return float(np.clip(v, 0.0, 0.95))
    return 0.9  # GNOME default when unmeasured


def main(src, dst, max_wf_path=None):
    data = json.loads(lzma.open(src).read())
    max_wf = {}
    if max_wf_path:
        try:
            max_wf = json.load(open(max_wf_path))
        except OSError:
            pass
    oils = []
    skipped = 0
    for rec in data:
        try:
            name = rec["metadata"]["name"]
            ss = rec.get("sub_samples")
            if not ss:
                skipped += 1
                continue
            props = ss[0].get("physical_properties", {})
            dens = extract_density(props)
            api = _get_api(rec, dens[0] if dens else None)
            if dens is None and api is not None:
                sg = 141.5 / (api + 131.5)
                dens = (sg * 999.016, 288.15)
            if dens is None:
                skipped += 1
                continue
            cuts = ss[0].get("distillation_data", {}).get("cuts", [])
            comp = components_from_cuts(cuts, api)
            if comp is None:
                skipped += 1
                continue
            mass_fraction, bp = comp
            viscs = extract_viscosities(props)
            if viscs:
                kvis_ref, kvis_t = viscs[0]
            else:
                kvis_ref, kvis_t = 50e-6, 288.15  # generic crude
            mw = molecular_weight_from_bp(bp)
            oils.append({
                "name": name,
                "id": rec.get("oil_id", ""),
                "api": api if api is not None else -999.0,
                "density_ref": round(dens[0], 3),
                "density_ref_temp": round(dens[1], 2),
                "kvis_ref": kvis_ref,
                "kvis_ref_temp": round(kvis_t, 2),
                "kvis_k": round(visc_temperature_coeff(viscs), 1),
                "mass_fraction": [round(float(x), 5) for x in mass_fraction],
                "boiling_point": [round(float(x), 1) for x in bp],
                "molecular_weight": [round(float(x), 6) for x in mw],
                "bullwinkle_fraction": round(bullwinkle_estimate(api), 4),
                "emulsion_water_fraction_max": round(
                    extract_emulsion_max(rec), 4),
                "max_water_fraction_sintef": max_wf.get(name),
            })
        except Exception as e:  # noqa: BLE001
            skipped += 1
    out = {
        "source": "Derived from the public NOAA ADIOS oil database; "
                  "pseudo-component properties computed with GNOME-style "
                  "estimation formulas (see tools/build_oil_db.py)",
        "n_components": N_COMPONENTS,
        "oils": oils,
    }
    with lzma.open(dst, "wt") as f:
        json.dump(out, f)
    print(f"wrote {len(oils)} oils to {dst} ({skipped} skipped)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/opendrift/models/openoil/adios/oils.xz"
    max_wf = ("/root/reference/opendrift/models/openoil/adios/"
              "max_water_fraction.json")
    main(src, "opendrift_tpu/models/openoil/oils_db.json.xz", max_wf)
