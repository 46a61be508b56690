"""opendrift_tpu — a TPU-native Lagrangian particle trajectory framework.

From-scratch re-design of OpenDrift (https://opendrift.github.io) for
JAX/XLA/Pallas on TPU: fixed-capacity element pytrees, device-resident
forcing fields, a fused interpolate+advect+mix step kernel, and multi-chip
scaling via ``jax.sharding``.  Package surface mirrors the reference
(reference: opendrift/__init__.py:22-187).
"""

import importlib
import logging

__version__ = "0.1.0"

logger = logging.getLogger(__name__)

_MODEL_REGISTRY = {
    "OceanDrift": "opendrift_tpu.models.oceandrift",
    "WindBlow": "opendrift_tpu.models.windblow",
    "SeaIceDrift": "opendrift_tpu.models.seaicedrift",
    "Leeway": "opendrift_tpu.models.leeway",
    "OpenOil": "opendrift_tpu.models.openoil",
    "PelagicEggDrift": "opendrift_tpu.models.pelagicegg",
    "PlastDrift": "opendrift_tpu.models.plastdrift",
    "SedimentDrift": "opendrift_tpu.models.sedimentdrift",
    "LarvalFish": "opendrift_tpu.models.larvalfish",
    "ShipDrift": "opendrift_tpu.models.shipdrift",
    "OpenBerg": "opendrift_tpu.models.openberg",
    "RadionuclideDrift": "opendrift_tpu.models.radionuclides",
    "ChemicalDrift": "opendrift_tpu.models.chemicaldrift",
    "SeaLice": "opendrift_tpu.models.sealice",
    "OpenHNS": "opendrift_tpu.models.legacy",
    "OpenBergOld": "opendrift_tpu.models.legacy",
    "ModelTemplate": "opendrift_tpu.models.model_template",
}


def get_model_names():
    """Names of all available models (reference opendrift/__init__.py:22)."""
    names = []
    for name, module in _MODEL_REGISTRY.items():
        try:
            importlib.import_module(module)
            names.append(name)
        except ImportError:
            pass
    return names


def get_model(model_name):
    """Import and return a model class by name
    (reference opendrift/__init__.py:31-43)."""
    if model_name not in _MODEL_REGISTRY:
        raise ValueError(
            f"No drift model named {model_name}; "
            f"available: {list(_MODEL_REGISTRY)}")
    module = importlib.import_module(_MODEL_REGISTRY[model_name])
    return getattr(module, model_name)


def open(filename):
    """Reconstruct a simulation object (in Result mode) from an output file
    (reference opendrift/__init__.py:46-88)."""
    from .export.io_netcdf import read_result
    result = read_result(filename)
    class_name = result.attrs.get("opendrift_class")
    cls = get_model(class_name)
    o = cls(loglevel=logging.WARNING)
    o.result = result
    o._config_from_attributes(result.attrs)
    from .models.base import Mode
    o.mode = Mode.Result
    return o


def versions():
    """Report dependency versions (reference opendrift/__init__.py:90)."""
    import platform
    import numpy
    import scipy
    import jax
    return (f"------------------------------------------------------\n"
            f"Software and hardware:\n"
            f"  opendrift_tpu version {__version__}\n"
            f"  platform {platform.platform()}\n"
            f"  python version {platform.python_version()}\n"
            f"  numpy version {numpy.__version__}\n"
            f"  scipy version {scipy.__version__}\n"
            f"  jax version {jax.__version__}\n"
            f"  jax devices {jax.devices()}\n"
            f"------------------------------------------------------\n")
