"""Data-table parity against the reference's shipped data files.

* Leeway object classes vs the reference's OBJECTPROP.DAT (the USCG
  leeway coefficients; reference leeway.py:185-218 parses this file at
  model construction).
* Oil database coverage vs the reference's bundled ADIOS archive names.
"""

import os
import re

import numpy as np
import pytest

OBJECTPROP = "/root/reference/opendrift/models/OBJECTPROP.DAT"


def _parse_objectprop(path):
    """Parse the reference's fixed-format leeway table: per object a
    key+number line, a description line, and 9 coefficients
    (downwind slope/offset/std, crosswind-right s/o/std,
    crosswind-left s/o/std) — reference leeway.py:185-218."""
    objs = []
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    i = 0
    while i + 2 < len(lines) + 1 and i + 2 <= len(lines):
        head = lines[i].split()
        if len(head) < 2:
            break
        key = head[0]
        desc = lines[i + 1].strip()
        nums = [float(x) for x in lines[i + 2].split()]
        if len(nums) != 9:
            break
        objs.append({"key": key, "description": desc, "coef": nums})
        i += 3
    return objs


@pytest.fixture(scope="module")
def ref_objects():
    if not os.path.exists(OBJECTPROP):
        pytest.skip("reference OBJECTPROP.DAT unavailable")
    return _parse_objectprop(OBJECTPROP)


def test_leeway_object_table_matches_reference(ref_objects):
    from opendrift_tpu.models.leeway import load_object_classes
    ours = load_object_classes()
    assert len(ours) == len(ref_objects) == 85
    for o, r in zip(ours, ref_objects):
        assert o["key"] == r["key"]
        dw, cr, cl = (o["downwind"], o["crosswind_right"],
                      o["crosswind_left"])
        got = [dw["slope"], dw["offset"], dw["std"],
               cr["slope"], cr["offset"], cr["std"],
               cl["slope"], cl["offset"], cl["std"]]
        assert np.allclose(got, r["coef"], atol=1e-6), (o["key"], got,
                                                        r["coef"])


def test_leeway_descriptions_match(ref_objects):
    from opendrift_tpu.models.leeway import load_object_classes
    ours = load_object_classes()
    mismatches = [
        (o["description"], r["description"].lstrip("> "))
        for o, r in zip(ours, ref_objects)
        if o["description"].lstrip("> ").strip()
        != r["description"].lstrip("> ").strip()]
    assert not mismatches, mismatches[:5]


def test_oil_database_covers_reference_generic_oils():
    """Our compact DB must contain at least the reference's GENERIC oil
    family plus the frequently used named crudes."""
    from opendrift_tpu.models.openoil.oil_db import get_oil_names
    names = set(get_oil_names())
    assert len(names) >= 1000
    for needed in ("GENERIC LIGHT CRUDE", "GENERIC MEDIUM CRUDE",
                   "GENERIC HEAVY CRUDE", "GENERIC GASOLINE",
                   "GENERIC DIESEL", "GENERIC BUNKER C",
                   "GENERIC FUEL OIL No.2", "Generic Jet Fuel"):
        assert needed in names, needed
