"""Compare opendrift_tpu runs against the reference goldens produced by
tools/ref_runner.py.  Shared by tests/test_reference_trajectory_parity.py
(import) and usable standalone for diagnosis:

    python tools/parity_compare.py [scenario ...]
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(REPO, "tests", "goldens")
sys.path.insert(0, REPO)


# scenarios that face an existing golden under a different configuration
# of OUR engine (the golden itself is identical)
GOLDEN_ALIASES = {"nordic_sigma_3d_euler_regrid": "nordic_sigma_3d_euler"}


def load_golden(name):
    name = GOLDEN_ALIASES.get(name, name)
    path = os.path.join(GOLDENS, f"ref_traj_{name}.npz")
    d = np.load(path, allow_pickle=False)
    cfg = json.loads(str(d["config"]))
    return d, cfg


def run_double_gyre(cfg):
    from datetime import timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields import DoubleGyre

    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:advection_scheme", cfg["scheme"])
    r = DoubleGyre(epsilon=cfg["epsilon"], omega=cfg["omega"], A=cfg["A"])
    o.add_reader(r)
    x = np.asarray(cfg["seed_x"])
    y = np.asarray(cfg["seed_y"])
    lon, lat = r.xy2lonlat(x, y)
    o.seed_elements(lon=lon, lat=lat, time=r.initial_time)
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"])
    return o


def run_constant_wind(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OceanDrift

    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("environment:fallback:x_sea_water_velocity", cfg["u"])
    o.set_config("environment:fallback:y_sea_water_velocity", cfg["v"])
    o.set_config("environment:fallback:x_wind", cfg["wind_u"])
    o.set_config("environment:fallback:y_wind", cfg["wind_v"])
    o.set_config("drift:advection_scheme", cfg["scheme"])
    o.seed_elements(lon=np.asarray(cfg["seed_lon"]),
                    lat=np.asarray(cfg["seed_lat"]),
                    time=datetime(2015, 9, 22, 6),
                    wind_drift_factor=np.asarray(cfg["wind_drift_factor"]))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"])
    return o


def run_arctic20(cfg):
    from datetime import timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.netcdf import NetCDFReader

    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("drift:advection_scheme", cfg["scheme"])
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", False)
    r = NetCDFReader(cfg["file"])
    o.add_reader(r)
    o.seed_elements(lon=np.asarray(cfg["seed_lon"]),
                    lat=np.asarray(cfg["seed_lat"]),
                    time=r.times[0])
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step"])
    return o


def run_arctic20_backward(cfg):
    from datetime import timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.netcdf import NetCDFReader

    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("drift:advection_scheme", cfg["scheme"])
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", False)
    r = NetCDFReader(cfg["file"])
    o.add_reader(r)
    # the reference flips element IDs on backward runs (reference
    # basemodel/__init__.py:2056-2063), so golden row 0 is the LAST
    # seed point; seed in reverse to align rows
    o.seed_elements(lon=np.asarray(cfg["seed_lon"])[::-1],
                    lat=np.asarray(cfg["seed_lat"])[::-1],
                    time=r.times[-1])
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=abs(cfg["time_step"]))
    return o


def run_arctic20_3d(cfg):
    from datetime import timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.netcdf import NetCDFReader

    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("drift:advection_scheme", cfg["scheme"])
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", True)
    o.set_config("environment:fallback:upward_sea_water_velocity",
                 cfg["w_fallback"])
    r = NetCDFReader(cfg["file"])
    o.add_reader(r)
    o.seed_elements(lon=np.asarray(cfg["seed_lon"]),
                    lat=np.asarray(cfg["seed_lat"]),
                    z=np.asarray(cfg["seed_z"]),
                    time=r.times[0])
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step"])
    return o


def run_nordic_sigma_3d(cfg):
    """Mirror of the reference's reader_ROMS_native end-to-end run.
    Our ROMSReader samples the NATIVE C-grid in index space (packed
    native array + lon/lat->fractional-index CRS), the same scheme as
    the reference's fakeproj + Linear2DInterpolator, with the
    reference's zlevels as the vertical discretisation — so the
    comparison isolates trajectory integration over near-identical
    forcing values (see test_reference_roms_values_parity.py for the
    value-level bounds)."""
    from datetime import timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.roms import ROMSReader

    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("general:use_auto_landmask", False)
    o.set_config("drift:advection_scheme", cfg["scheme"])
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", True)
    o.set_config("environment:fallback:upward_sea_water_velocity",
                 cfg["w_fallback"])
    r = ROMSReader(cfg["file"], sampling=cfg.get("sampling", "native"))
    o.add_reader(r)
    o.seed_elements(lon=np.asarray(cfg["seed_lon"]),
                    lat=np.asarray(cfg["seed_lat"]),
                    z=np.asarray(cfg["seed_z"]),
                    time=r.times[0])
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step"])
    return o


def run_nordic_sigma_3d_regrid(cfg):
    """The REGRID production mode (the configuration behind every
    headline bench number — bench.py:74, tools/flagship_run.py) against
    the same reference golden as the native rung: regrid's forcing
    values are bounded at u-rms <=5e-3 vs native
    (tests/test_reference_roms_values_parity.py), which over the 45 h
    run integrates to O(1 km) extra trajectory separation."""
    return run_nordic_sigma_3d({**cfg, "sampling": "regrid"})


def run_mixing_sundby(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OceanDrift

    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("environment:fallback:x_wind", cfg["wind_u"])
    o.set_config("environment:fallback:y_wind", 0.0)
    o.set_config("environment:fallback:sea_floor_depth_below_sea_level",
                 cfg["seafloor"])
    o.set_config("environment:fallback:ocean_mixed_layer_thickness",
                 cfg["mld"])
    o.set_config("drift:vertical_mixing", True)
    o.set_config("vertical_mixing:diffusivitymodel",
                 "windspeed_Sundby1983")
    o.set_config("vertical_mixing:timestep", cfg["dt_mix"])
    n = cfg["n"]
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, cfg["seed_z"]),
                    time=datetime(2021, 6, 1),
                    wind_drift_factor=np.zeros(n),
                    terminal_velocity=np.zeros(n))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"])
    return o


def run_openoil_budget(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OpenOil

    o = OpenOil(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("environment:fallback:x_wind", cfg["wind_u"])
    o.set_config("environment:fallback:y_wind", cfg["wind_v"])
    o.set_config("environment:fallback:x_sea_water_velocity", cfg["u"])
    o.set_config("environment:fallback:y_sea_water_velocity", cfg["v"])
    o.set_config("environment:fallback:sea_water_temperature", cfg["sst"])
    o.set_config("drift:vertical_mixing", False)
    o.set_config("processes:dispersion", False)
    o.set_config("processes:evaporation", True)
    o.set_config("processes:emulsification", True)
    o.set_config("processes:biodegradation", True)
    o.set_config("seed:m3_per_hour", cfg["m3_per_hour"])
    n = cfg["n"]
    o.seed_elements(lon=4.5, lat=60.0, radius=0, number=n,
                    time=datetime(2022, 5, 1), oil_type=cfg["oil_type"],
                    wind_drift_factor=np.full(n, cfg["wind_drift_factor"]))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


def run_openoil_full(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OpenOil

    o = OpenOil(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("environment:fallback:x_wind", cfg["wind_u"])
    o.set_config("environment:fallback:y_wind", 0.0)
    o.set_config("environment:fallback:x_sea_water_velocity", cfg["u"])
    o.set_config("environment:fallback:y_sea_water_velocity", 0.0)
    o.set_config("environment:fallback:sea_water_temperature", cfg["sst"])
    o.set_config("environment:fallback:sea_floor_depth_below_sea_level",
                 cfg["seafloor"])
    o.set_config("drift:vertical_mixing", True)
    o.set_config("vertical_mixing:timestep", cfg["dt_mix"])
    o.set_config("processes:dispersion", True)
    o.set_config("processes:evaporation", True)
    o.set_config("processes:emulsification", True)
    o.set_config("seed:m3_per_hour", cfg["m3_per_hour"])
    o.seed_elements(lon=4.5, lat=60.0, radius=0, number=cfg["n"],
                    time=datetime(2022, 5, 1), oil_type=cfg["oil_type"])
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


def run_pelagicegg(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import PelagicEggDrift

    o = PelagicEggDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("environment:fallback:x_wind", cfg["wind_u"])
    o.set_config("environment:fallback:y_wind", 0.0)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.0)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.0)
    o.set_config("environment:fallback:sea_water_temperature", cfg["sst"])
    o.set_config("environment:fallback:sea_water_salinity", cfg["sss"])
    o.set_config("environment:fallback:sea_floor_depth_below_sea_level",
                 cfg["seafloor"])
    n = cfg["n"]
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, cfg["seed_z"]),
                    time=datetime(2021, 4, 1),
                    diameter=cfg["diameter"])
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


def run_chemical(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import ChemicalDrift

    o = ChemicalDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    for k, v in (("x_wind", cfg["wind_u"]), ("y_wind", 0.0),
                 ("x_sea_water_velocity", cfg["u"]),
                 ("y_sea_water_velocity", 0.0),
                 ("sea_water_temperature", cfg["sst"]),
                 ("sea_water_salinity", cfg["sss"]),
                 ("sea_floor_depth_below_sea_level", cfg["seafloor"]),
                 ("spm", cfg["spm"])):
        o.set_config(f"environment:fallback:{k}", v)
    o.set_config("chemical:transformations:degradation", True)
    o.set_config("chemical:transformations:volatilization", True)
    o.init_chemical_compound(cfg["compound"])
    n = cfg["n"]
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, cfg["seed_z"]),
                    time=datetime(2021, 4, 1))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


def run_sediment(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import SedimentDrift

    o = SedimentDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    _set_fallbacks(o, {"x_wind": cfg["wind_u"], "y_wind": 0.0,
                       "x_sea_water_velocity": cfg["u"],
                       "y_sea_water_velocity": 0.0,
                       "sea_floor_depth_below_sea_level":
                           cfg["seafloor"]})
    o.set_config("vertical_mixing:timestep", cfg["dt_mix"])
    n = cfg["n"]
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, cfg["seed_z"]),
                    time=datetime(2021, 4, 1))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


def run_plast(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import PlastDrift

    o = PlastDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    _set_fallbacks(o, {"x_wind": cfg["wind_u"], "y_wind": 0.0,
                       "x_sea_water_velocity": cfg["u"],
                       "y_sea_water_velocity": 0.0,
                       "sea_floor_depth_below_sea_level": 200.0})
    n = cfg["n"]
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    time=datetime(2021, 4, 1))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


def run_larvalfish(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import LarvalFish

    o = LarvalFish(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    _set_fallbacks(o, {"x_wind": 4.0, "y_wind": 0.0,
                       "sea_water_temperature": cfg["sst"],
                       "sea_water_salinity": cfg["sss"],
                       "sea_floor_depth_below_sea_level": 100.0})
    o.set_config("vertical_mixing:timestep", cfg["dt_mix"])
    n = cfg["n"]
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, cfg["seed_z"]),
                    time=datetime(2021, 4, 1, 0),
                    stage_fraction=np.asarray(cfg["stage_fraction"]))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


def run_sealice(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import SeaLice

    o = SeaLice(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    _set_fallbacks(o, {"x_sea_water_velocity": cfg["u"],
                       "y_sea_water_velocity": 0.0,
                       "sea_water_temperature": cfg["sst"],
                       "sea_water_salinity": cfg["sss"],
                       "sea_floor_depth_below_sea_level":
                           cfg["seafloor"]})
    n = cfg["n"]
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, cfg["seed_z"]),
                    time=datetime(2021, 6, 1, 0))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


def run_radionuclide(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import RadionuclideDrift

    o = RadionuclideDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    _set_fallbacks(o, {"x_sea_water_velocity": cfg["u"],
                       "y_sea_water_velocity": 0.0,
                       "sea_water_temperature": cfg["sst"],
                       "sea_water_salinity": cfg["sss"],
                       "sea_floor_depth_below_sea_level":
                           cfg["seafloor"]})
    o.set_config("vertical_mixing:timestep", cfg["dt_mix"])
    n = cfg["n"]
    o.seed_elements(lon=np.full(n, 4.0), lat=np.full(n, 60.0),
                    z=np.full(n, cfg["seed_z"]),
                    time=datetime(2021, 4, 1))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


def run_eulerdrift_field(cfg):
    """Returns our final concentration field TRANSPOSED into the
    reference's [x, y] axis order (reference eulerdrift grid.py:18
    'first dimension is easting').  The source patch is placed at the
    index the reference's grid convention yields: its axes are
    ``linspace(x0, x0 + N*res, N)`` — endpoint INCLUDED, so the actual
    spacing is res*N/(N-1) (reference grid.py:71-72) — while the
    solver stencils use ``res``; parity therefore lives in index
    space."""
    import jax.numpy as jnp
    from jax import lax
    from opendrift_tpu.models import eulerdrift as ed

    ny, nx = cfg["shape"]
    sim = ed.ExplSimulation.new(lon0=cfg["lon0"], lat0=cfg["lat0"],
                                res=cfg["res"], shape=(ny, nx))
    sim.readers.append(ed.ConstantReader.new_xy(cfg["u"], cfg["v"]))
    sim.D = cfg["D"]
    # reference index placement: the reference projects with the
    # STANDARD UTM zone (here 32 by the Norway exception), not our
    # grid's custom tmerc — indices must come from the same projection
    from opendrift_tpu.utils import crs as crslib
    zone = int((cfg["lon0"] + 180.0) // 6) + 1
    if 56 <= cfg["lat0"] < 64 and 3 <= cfg["lon0"] < 12:
        zone = 32
    refp = crslib.from_proj4(f"+proj=utm +zone={zone} +north "
                             "+ellps=WGS84 +datum=WGS84 +units=m")
    x0, y0 = refp.fwd(np, np.float64(cfg["lon0"]),
                      np.float64(cfg["lat0"]))
    ref_x = np.linspace(float(x0), float(x0) + nx * cfg["res"], nx)
    ref_y = np.linspace(float(y0), float(y0) + ny * cfg["res"], ny)
    xs, ys = refp.fwd(np, np.float64(cfg["src_lon"]),
                      np.float64(cfg["src_lat"]))
    ix0 = int(np.argmin(np.abs(ref_x - xs)))
    iy0 = int(np.argmin(np.abs(ref_y - ys)))
    k = np.arange(cfg["N"]) - (cfg["N"] - 1) / 2.0
    g = np.exp(-0.5 * (k * cfg["res"] / cfg["sigma"]) ** 2)
    patch = np.outer(g, g)
    # ref places grid[ix0:ix1, iy0:iy1] = X; ours is field[y, x]
    sim.grid.field = lax.dynamic_update_slice(
        sim.grid.field, jnp.asarray(patch.T, jnp.float32), (iy0, ix0))
    sim.integrate(dt=cfg["dt"], max_steps=cfg["steps"])
    return np.asarray(sim.grid.field, np.float64).T


def run_stranding(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.landmask import GlobalLandmask

    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:x_sea_water_velocity", cfg["u"])
    o.set_config("environment:fallback:y_sea_water_velocity", cfg["v"])
    o.set_config("drift:advection_scheme", "euler")
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", False)
    o.set_config("general:coastline_action", "stranding")
    o.set_config("general:use_auto_landmask", False)
    o.add_reader(GlobalLandmask())
    o.seed_elements(lon=np.asarray(cfg["seed_lon"]),
                    lat=np.asarray(cfg["seed_lat"]),
                    time=datetime(2021, 3, 1))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"])
    return o


def _set_fallbacks(o, vals):
    for k, v in vals.items():
        try:
            o.set_config(f"environment:fallback:{k}", v)
        except (ValueError, KeyError):
            pass


def run_windblow(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import WindBlow

    o = WindBlow(loglevel=40)
    _set_fallbacks(o, {"x_wind": cfg["wind_u"], "y_wind": cfg["wind_v"],
                       "land_binary_mask": 0})
    o.seed_elements(lon=np.asarray(cfg["seed_lon"]),
                    lat=np.asarray(cfg["seed_lat"]),
                    time=datetime(2021, 1, 1))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"])
    return o


def run_seaice(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import SeaIceDrift

    o = SeaIceDrift(loglevel=40)
    _set_fallbacks(o, {
        "sea_ice_x_velocity": cfg["ice_u"],
        "sea_ice_y_velocity": cfg["ice_v"],
        "sea_ice_area_fraction": cfg["ice_conc"],
        "x_sea_water_velocity": cfg["u"], "y_sea_water_velocity": 0.0,
        "x_wind": cfg["wind_u"], "y_wind": 0.0,
        "land_binary_mask": 0})
    o.seed_elements(lon=np.asarray(cfg["seed_lon"]),
                    lat=np.asarray(cfg["seed_lat"]),
                    time=datetime(2021, 2, 1))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"])
    return o


def run_openberg(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OpenBerg

    o = OpenBerg(loglevel=40)
    _set_fallbacks(o, {
        "horizontal_diffusivity": 0.0,   # deterministic force balance
        "x_wind": cfg["wind_u"], "y_wind": cfg["wind_v"],
        "x_sea_water_velocity": cfg["u"],
        "y_sea_water_velocity": cfg["v"],
        "sea_water_temperature": 2.0,
        "sea_surface_wave_significant_height": 1.5,
        "land_binary_mask": 0})
    o.seed_elements(lon=np.asarray(cfg["seed_lon"]),
                    lat=np.asarray(cfg["seed_lat"]),
                    time=datetime(2021, 2, 1),
                    sail=np.asarray(cfg["sail"]),
                    draft=np.asarray(cfg["draft"]),
                    length=np.asarray(cfg["length"]),
                    width=np.asarray(cfg["length"]))
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"])
    return o


def run_shipdrift(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import ShipDrift

    o = ShipDrift(loglevel=40)
    _set_fallbacks(o, {
        "x_wind": cfg["wind_u"], "y_wind": 0.0,
        "x_sea_water_velocity": 0.0, "y_sea_water_velocity": 0.0,
        "sea_surface_wave_significant_height": cfg["hs"],
        "land_binary_mask": 0})
    o.seed_elements(lon=4.0, lat=60.0, radius=0, number=cfg["n"],
                    time=datetime(2021, 3, 1),
                    length=cfg["length"], beam=cfg["beam"],
                    height=cfg["height"], draft=cfg["draft"])
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


def run_leeway(cfg):
    from datetime import datetime, timedelta
    from opendrift_tpu.models import Leeway

    o = Leeway(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("environment:fallback:x_wind", cfg["wind_u"])
    o.set_config("environment:fallback:y_wind", cfg["wind_v"])
    o.set_config("environment:fallback:x_sea_water_velocity", 0.0)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.0)
    o.seed_elements(lon=2.0, lat=59.5, radius=0, number=cfg["n"],
                    time=datetime(2021, 3, 1),
                    object_type=cfg["object_type"])
    o.run(duration=timedelta(seconds=cfg["duration_s"]),
          time_step=cfg["time_step"],
          time_step_output=cfg["time_step_output"])
    return o


RUNNERS = {
    "double_gyre_euler": run_double_gyre,
    "double_gyre_rk4": run_double_gyre,
    "double_gyre_rk2": run_double_gyre,
    "constant_wind_euler": run_constant_wind,
    "arctic20_euler": run_arctic20,
    "arctic20_rk4": run_arctic20,
    "arctic20_backward": run_arctic20_backward,
    "arctic20_3d_euler": run_arctic20_3d,
    "nordic_sigma_3d_euler": run_nordic_sigma_3d,
    "nordic_sigma_3d_euler_regrid": run_nordic_sigma_3d_regrid,
    "mixing_sundby_stat": run_mixing_sundby,
    "openoil_budget_surface": run_openoil_budget,
    "openoil_full_stat": run_openoil_full,
    "pelagicegg_stat": run_pelagicegg,
    "chemical_stat": run_chemical,
    "sediment_stat": run_sediment,
    "plast_stat": run_plast,
    "larvalfish_stat": run_larvalfish,
    "sealice_stat": run_sealice,
    "radionuclide_stat": run_radionuclide,
    "arctic20_stranding": run_stranding,
    "windblow_euler": run_windblow,
    "seaice_euler": run_seaice,
    "openberg_det": run_openberg,
    "shipdrift_stat": run_shipdrift,
    "leeway_stat": run_leeway,
}


def compare(name, o, golden):
    """Returns dict of divergence stats between our result and golden."""
    from opendrift_tpu.utils.geodesic import inverse_np

    lon_r = np.asarray(golden["lon"], np.float64)
    lat_r = np.asarray(golden["lat"], np.float64)
    lon_o = np.asarray(o.result["lon"].values, np.float64)
    lat_o = np.asarray(o.result["lat"].values, np.float64)
    nt = min(lon_r.shape[1], lon_o.shape[1])
    lon_r, lat_r = lon_r[:, :nt], lat_r[:, :nt]
    lon_o, lat_o = lon_o[:, :nt], lat_o[:, :nt]
    both = (np.isfinite(lon_r) & np.isfinite(lon_o))
    _, _, dist = inverse_np(lat_r[both], lon_r[both],
                            np.where(both, lat_o, lat_r)[both],
                            np.where(both, lon_o, lon_r)[both])
    dist = np.asarray(dist)
    last = both[:, -1]
    _, _, dist_last = inverse_np(lat_r[:, -1][last], lon_r[:, -1][last],
                                 lat_o[:, -1][last], lon_o[:, -1][last])
    out = {
        "shape_ref": lon_r.shape, "shape_our": lon_o.shape,
        "finite_mismatch": int((np.isfinite(lon_r) != np.isfinite(lon_o)).sum()),
        "max_m": float(np.max(dist)) if dist.size else np.nan,
        "mean_m": float(np.mean(dist)) if dist.size else np.nan,
        "final_max_m": float(np.max(dist_last)) if dist_last.size else np.nan,
        "final_mean_m": float(np.mean(dist_last)) if dist_last.size else np.nan,
        "final_median_m": float(np.median(dist_last))
        if dist_last.size else np.nan,
    }
    if "z" in golden and "z" in o.result:
        z_r = np.asarray(golden["z"], np.float64)[:, :nt]
        z_o = np.asarray(o.result["z"].values, np.float64)[:, :nt]
        dz = np.abs(z_r - z_o)[both]
        out["max_dz_m"] = float(np.max(dz)) if dz.size else np.nan
        out["mean_dz_m"] = float(np.mean(dz)) if dz.size else np.nan
    return out


def main():
    names = sys.argv[1:] or list(RUNNERS)
    for name in names:
        golden, cfg = load_golden(name)
        o = RUNNERS[name](cfg)
        stats = compare(name, o, golden)
        print(name, json.dumps(stats))


if __name__ == "__main__":
    main()
