"""Load pieces of the reference package standalone for parity tests.

The full reference needs pyproj/xarray/netCDF4/cartopy (not installed
here), but its interpolation kernel files only need numpy/scipy at
import time.  This helper materialises the minimal module graph —
stub parent packages plus the real leaf files — so tests can exercise
the reference's actual ``ReaderBlock`` (interpolation/structured.py)
against our device sampler.
"""

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference/opendrift"


def _load(dotted, relpath):
    spec = importlib.util.spec_from_file_location(
        dotted, os.path.join(REF_ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    return mod


def _pkg(dotted):
    mod = types.ModuleType(dotted)
    mod.__path__ = []  # mark as package; real submodules loaded manually
    sys.modules[dotted] = mod
    return mod


def load_reference_physics():
    """Returns the reference's physics_methods module (the formula
    library, reference physics_methods.py), or None when unavailable.
    pyproj/cmocean are stubbed — referenced only inside functions the
    parity tests never call."""
    if not os.path.isdir(REF_ROOT):
        return None
    if "ref_physics_methods" in sys.modules:
        return sys.modules["ref_physics_methods"]
    for stub in ("pyproj", "cmocean"):
        if stub not in sys.modules:
            sys.modules[stub] = types.ModuleType(stub)
    spec = importlib.util.spec_from_file_location(
        "ref_physics_methods",
        os.path.join(REF_ROOT, "models/physics_methods.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_physics_methods"] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_readerblock():
    """Returns the reference's structured-interpolation module (holding
    ``ReaderBlock``), or None when the reference tree is unavailable."""
    if not os.path.isdir(REF_ROOT):
        return None
    if "opendrift.readers.interpolation.structured" in sys.modules:
        return sys.modules["opendrift.readers.interpolation.structured"]

    saved_pyproj = sys.modules.get("pyproj")
    if "pyproj" not in sys.modules:
        # referenced only inside function bodies we never call
        sys.modules["pyproj"] = types.ModuleType("pyproj")
    try:
        od = _pkg("opendrift")
        od.timer = _load("opendrift.timer", "timer.py")
        od.errors = _load("opendrift.errors", "errors.py")
        readers = _pkg("opendrift.readers")
        basereader = _pkg("opendrift.readers.basereader")
        basereader.consts = _load("opendrift.readers.basereader.consts",
                                  "readers/basereader/consts.py")
        basereader.variables = _load(
            "opendrift.readers.basereader.variables",
            "readers/basereader/variables.py")
        interp = _pkg("opendrift.readers.interpolation")
        interp.interpolators = _load(
            "opendrift.readers.interpolation.interpolators",
            "readers/interpolation/interpolators.py")
        structured = _load("opendrift.readers.interpolation.structured",
                           "readers/interpolation/structured.py")
        interp.structured = structured
        od.readers = readers
        readers.basereader = basereader
        readers.interpolation = interp
        return structured
    finally:
        if saved_pyproj is not None:
            sys.modules["pyproj"] = saved_pyproj
