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
    "LarvalFishExtended": "opendrift_tpu.models.larvalfish",
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


def import_from_ladim(ladimfile, romsfile):
    """Import a LADiM output NetCDF file as a simulation object in Result
    mode (reference opendrift/__init__.py:125-187).

    LADiM stores ragged per-timestep particle records (``pid``,
    ``particle_count``, grid coordinates ``X``/``Y``); they are scattered
    into the dense (trajectory, time) layout used by this framework, with
    positions converted to lon/lat through the ROMS grid of ``romsfile``
    (path or an already-constructed ROMS reader).
    """
    import numpy as np
    from .utils import ncio
    from .utils.dataset import TrajectoryDataset, DataVar
    from .models.oceandrift import OceanDrift
    from .models.base import Mode

    if isinstance(romsfile, str):
        from .fields.roms import ROMSReader
        romsfile = ROMSReader(romsfile)

    f = ncio.NCFile(ladimfile)
    pid = np.asarray(f.variables["pid"][:], dtype=np.int64)
    particle_count = np.asarray(f.variables["particle_count"][:],
                                dtype=np.int64)
    x = np.asarray(f.variables["X"][:], dtype=np.float64)
    y = np.asarray(f.variables["Y"][:], dtype=np.float64)
    tvar = f.variables["time"]
    times = ncio.parse_cf_time(tvar.attrs["units"], tvar[:])

    end_index = np.cumsum(particle_count)
    start_index = np.concatenate(([0], end_index[:-1]))
    lon, lat = romsfile.xy2lonlat(x, y)

    n_time = len(times)
    n_elements = int(pid.max()) + 1
    lon_h = np.full((n_elements, n_time), np.nan, dtype=np.float32)
    lat_h = np.full((n_elements, n_time), np.nan, dtype=np.float32)
    status = np.full((n_elements, n_time), -128, dtype=np.int8)
    for n in range(n_time):
        sl = slice(start_index[n], start_index[n] + particle_count[n])
        active = pid[sl]
        lon_h[active, n] = lon[sl]
        lat_h[active, n] = lat[sl]
        status[active, n] = 0

    # mark the last valid state of each trajectory 'missing_data'
    # (reference opendrift/__init__.py:168-172)
    valid = status == 0
    has_any = valid.any(axis=1)
    last = np.where(has_any,
                    n_time - 1 - np.argmax(valid[:, ::-1], axis=1), 0)
    rows = np.arange(n_elements)[has_any]
    status[rows, last[has_any]] = 1

    o = OceanDrift(loglevel=logging.WARNING)
    result = TrajectoryDataset(
        variables={
            "lon": DataVar(("trajectory", "time"), lon_h,
                           {"units": "degrees_east"}),
            "lat": DataVar(("trajectory", "time"), lat_h,
                           {"units": "degrees_north"}),
            "status": DataVar(("trajectory", "time"), status,
                              {"valid_range": np.array([0, 1]),
                               "flag_values": np.array([0, 1]),
                               "flag_meanings": "active missing_data"}),
        },
        coords={"trajectory": np.arange(n_elements, dtype=np.int32),
                "time": np.array([np.datetime64(t, "ns") for t in times])},
        attrs={"opendrift_class": "OceanDrift",
               "source": f"LADiM import of {ladimfile}"})
    o.result = result
    o.status_categories = ["active", "missing_data"]
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
