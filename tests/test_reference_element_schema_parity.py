"""Element-schema parity: every per-particle variable the reference's
model element types declare must exist on our corresponding model's
ElementType (SURVEY.md §2.2).  The reference files are parsed with ast
(they are not importable here — pyproj/xarray are absent), extracting
the ``variables = <Base>.add_variables([...])`` declarations.
"""

import ast
import os

import pytest

REF_MODELS = "/root/reference/opendrift/models"

# reference file + element class -> our model (registry name)
CASES = [
    ("oceandrift.py", "Lagrangian3DArray", "OceanDrift"),
    ("openoil/openoil.py", "Oil", "OpenOil"),
    ("leeway.py", "LeewayObj", "Leeway"),
    ("pelagicegg.py", "PelagicEgg", "PelagicEggDrift"),
    ("plastdrift.py", "PlastElement", "PlastDrift"),
    ("sedimentdrift.py", "SedimentElement", "SedimentDrift"),
    ("larvalfish.py", "LarvalFishElement", "LarvalFish"),
    ("larvalfish_extended.py", "LarvalFishExtendedElement",
     "LarvalFishExtended"),
    ("sealice.py", "SeaLiceElement", "SeaLice"),
    ("shipdrift.py", "ShipObject", "ShipDrift"),
    ("openberg.py", "IcebergObj", "OpenBerg"),
    ("radionuclides.py", "Radionuclide", "RadionuclideDrift"),
    ("chemicaldrift.py", "Chemical", "ChemicalDrift"),
]


def _ref_element_vars(relpath, classname):
    path = os.path.join(REF_MODELS, relpath)
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == classname:
            for stmt in node.body:
                if isinstance(stmt, ast.Assign) and any(
                        getattr(t, "id", None) == "variables"
                        for t in stmt.targets):
                    call = stmt.value
                    if isinstance(call, ast.Call) and call.args and \
                            isinstance(call.args[0], (ast.List, ast.Tuple)):
                        return [e.elts[0].value for e in call.args[0].elts
                                if isinstance(e, ast.Tuple)]
    return None


@pytest.mark.parametrize("relpath,classname,model_name", CASES)
def test_element_schema_covers_reference(relpath, classname, model_name):
    if not os.path.isdir(REF_MODELS):
        pytest.skip("reference source unavailable")
    ref_vars = _ref_element_vars(relpath, classname)
    assert ref_vars, f"could not extract {classname} from {relpath}"

    import opendrift_tpu
    model = opendrift_tpu.get_model(model_name)
    ours = set(model.ElementType.variables)
    missing = [v for v in ref_vars if v not in ours]
    assert not missing, (
        f"{model_name}.ElementType lacks reference {classname} "
        f"variables: {missing}")


def test_core_element_fields():
    """The core LagrangianArray fields (reference elements.py:53-95)."""
    from opendrift_tpu.elements import LagrangianArray
    core = {"ID", "status", "moving", "age_seconds", "origin_marker",
            "lon", "lat", "z"}
    assert core <= set(LagrangianArray.variables)
