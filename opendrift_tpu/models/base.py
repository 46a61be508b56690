"""Core simulation engine: ``OpenDriftSimulation``.

TPU-native re-design of the reference's 5000-line runtime
(reference: opendrift/models/basemodel/__init__.py:193-2340).  The public
API (ctor, ``set_config``, ``add_reader``, ``seed_*``, ``run``,
``result``) matches upstream; the internals do not:

* Elements live in a fixed-capacity ``ElementState`` pytree; deactivation is
  a status flip, never compaction (upstream ``remove_deactivated_elements``,
  basemodel/__init__.py:1797).
* The per-step pipeline — release, environment fetch, missing-data/outside/
  coastline/seafloor handling, aging, the model's ``update`` physics, and
  horizontal diffusion — is fused into a single jitted function, iterated
  with ``lax.fori_loop`` between output snapshots.  The step ordering
  reproduces the reference main loop (basemodel/__init__.py:2193-2304).
* Each output interval is one device dispatch returning one snapshot frame;
  frames stream to a host buffer and on to NetCDF.

RNG: a single base key is folded per (interval, step, use) — runs are
deterministic and reproducible for a fixed seed, matching the reference's
``np.random.seed(0)`` default contract (basemodel/__init__.py:270-326),
though the streams themselves differ (statistical, not bitwise, parity).
"""

import logging
from datetime import datetime, timedelta
from enum import Enum
from functools import wraps

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Configurable, CONFIG_LEVEL_ESSENTIAL, \
    CONFIG_LEVEL_BASIC, CONFIG_LEVEL_ADVANCED
from ..timer import Timeable
from ..errors import WrongMode
from ..elements import LagrangianArray, ElementState
from ..elements.elements import NOT_RELEASED, ACTIVE, \
    STANDARD_STATUS_CATEGORIES
from ..fields.environment import Environment
from ..utils.geodesic import direct_np
from ..utils.dataset import TrajectoryDataset, DataVar
from .physics import PhysicsContext
from .postprocess import PostProcessingMixin
from .plot import PlottingMixin

logger = logging.getLogger(__name__)


class Mode(Enum):
    """Simulation lifecycle (reference basemodel/__init__.py:78)."""
    Config = 1
    Ready = 2
    Run = 3
    Result = 4


def require_mode(mode, error=None):
    """Decorator enforcing/transitioning modes (reference :136-190)."""
    modes = mode if isinstance(mode, (list, tuple, set)) else [mode]

    def decorator(fn):
        @wraps(fn)
        def wrapper(self, *args, **kwargs):
            if self.mode not in modes:
                raise WrongMode(modes, self.mode, error)
            return fn(self, *args, **kwargs)
        return wrapper
    return decorator


def _seconds(value):
    """Accept a timedelta or a number of seconds."""
    if isinstance(value, timedelta):
        return value.total_seconds()
    return float(value)


class OpenDriftSimulation(PostProcessingMixin, PlottingMixin, Timeable,
                          Configurable):
    """Abstract base simulation.  Subclasses define ``ElementType``,
    ``required_variables`` and ``update(ctx)``."""

    ElementType = LagrangianArray
    required_variables = {}
    required_profiles_z_range = None   # e.g. [-20, 0] for mixing models
    max_speed = 1.3                    # m/s, for coverage/halo estimates

    def __init__(self, loglevel=logging.DEBUG, seed=0, logfile=None):
        self.mode = Mode.Config
        self.status_categories = list(STANDARD_STATUS_CATEGORIES)
        self._seedings = []
        self._origin_marker_names = {}
        self.num_elements_scheduled_total = 0
        self.result = None
        self.rng_seed = seed
        self._np_random = np.random.RandomState(seed)
        self.simulation_extent = None
        self.messages = []

        if loglevel is not None:
            logging.basicConfig(level=loglevel)

        self.env = Environment(self.required_variables)

        self._add_base_config()
        self._add_seed_configs()
        self._add_environment_configs()
        self.add_config()  # model hook

        self.timer_start("total time")

    # ----------------------------------------------------------- config ---
    def _add_base_config(self):
        self._add_config({
            "general:coastline_action": {
                "type": "enum", "enum": ["none", "stranding", "previous"],
                "default": "stranding", "level": CONFIG_LEVEL_BASIC,
                "description": "What happens at the coastline"},
            "general:seafloor_action": {
                "type": "enum",
                "enum": ["none", "lift_to_seafloor", "deactivate", "previous"],
                "default": "lift_to_seafloor", "level": CONFIG_LEVEL_BASIC,
                "description": "What happens at the seafloor"},
            "general:use_auto_landmask": {
                "type": "bool", "default": True, "level": CONFIG_LEVEL_ADVANCED,
                "description": "Add a coastline landmask automatically"},
            "general:coastline_bisection": {
                "type": "enum", "enum": ["refetch", "block"],
                "default": "refetch", "level": CONFIG_LEVEL_ADVANCED,
                "description": "How stranding bisection probes sample the "
                "landmask. 'refetch': fresh mask fetch per probe (exact, "
                "reference semantics — coastline_crossing, basemodel "
                "__init__.py:81-134). 'block': probes re-read the held "
                "corner block with edge clamping — zero gathers; exact "
                "when the step stays within one grid cell, else the "
                "crossing point degrades toward the cell edge. Requires "
                "drift:advection_single_fetch and the landmask served by "
                "the same reader as the currents"},
            "general:rng": {
                "type": "enum", "enum": ["threefry", "rbg"],
                "default": "threefry", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Counter-based PRNG for the stochastic "
                "kernels. 'threefry' is bit-reproducible across backends "
                "(like the reference's seeded numpy, basemodel "
                "__init__.py:270-326); 'rbg' uses the TPU hardware "
                "generator — same statistics, faster, reproducible only "
                "per backend"},
            "general:profile_dir": {
                "type": "str", "default": "",
                "level": CONFIG_LEVEL_ADVANCED,
                "description": "Capture a jax.profiler device trace of "
                "the main loop into this directory (view with "
                "TensorBoard/Perfetto); empty = off.  The device-level "
                "counterpart of the hierarchical wall-clock timers "
                "(reference timer.py)"},
            "general:time_step_minutes": {
                "type": "float", "default": 60.0, "min": 1e-6, "max": 1e5,
                "units": "minutes", "level": CONFIG_LEVEL_BASIC,
                "description": "Calculation time step"},
            "general:time_step_output_minutes": {
                "type": "float", "default": None, "min": 1e-6, "max": 1e6,
                "units": "minutes", "level": CONFIG_LEVEL_BASIC,
                "description": "Output time step"},
            "drift:advection_scheme": {
                "type": "enum", "enum": ["euler", "runge-kutta", "runge-kutta4"],
                "default": "euler", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Numerical advection scheme"},
            "drift:current_uncertainty": {
                "type": "float", "default": 0.0, "min": 0, "max": 5,
                "units": "m/s", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Std of gaussian noise added to current"},
            "drift:current_uncertainty_uniform": {
                "type": "float", "default": 0.0, "min": 0, "max": 5,
                "units": "m/s", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Half-width of uniform noise added to current"},
            "drift:wind_uncertainty": {
                "type": "float", "default": 0.0, "min": 0, "max": 5,
                "units": "m/s", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Std of gaussian noise added to wind"},
            "drift:horizontal_diffusivity": {
                "type": "float", "default": 0.0, "min": 0, "max": 100000,
                "units": "m2/s", "level": CONFIG_LEVEL_BASIC,
                "description": "Horizontal diffusivity"},
            "drift:max_age_seconds": {
                "type": "float", "default": None, "min": 0, "max": 1e10,
                "units": "s", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Retire elements older than this"},
            "drift:max_speed": {
                "type": "float", "default": 2.0, "min": 0, "max": 100,
                "units": "m/s", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Speed bound used for coverage/halo sizing"},
            "drift:position_update": {
                "type": "enum", "enum": ["fused", "sequential"],
                "default": "fused", "level": CONFIG_LEVEL_ADVANCED,
                "description": "'fused' sums process velocities and "
                "commits one geodesic solve per step; 'sequential' "
                "solves per process like the reference's repeated "
                "Geod.fwd calls (slower, differs by mm-scale curvature "
                "terms)"},
            "drift:geodesy": {
                "type": "enum", "enum": ["second_order", "vincenty"],
                "default": "second_order",
                "level": CONFIG_LEVEL_ADVANCED,
                "description": "Committed position update: 'second_order' "
                "ellipsoidal expansion (mm-accurate per step, 2 vector "
                "transcendentals) or the full 'vincenty' direct solve "
                "(sub-mm, ~6x costlier on the VPU)"},
            "drift:deactivate_north_of": {
                "type": "float", "default": None, "min": -90, "max": 90,
                "units": "degrees", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Deactivate elements north of this latitude"},
            "drift:deactivate_south_of": {
                "type": "float", "default": None, "min": -90, "max": 90,
                "units": "degrees", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Deactivate elements south of this latitude"},
            "drift:deactivate_east_of": {
                "type": "float", "default": None, "min": -360, "max": 360,
                "units": "degrees", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Deactivate elements east of this longitude"},
            "drift:deactivate_west_of": {
                "type": "float", "default": None, "min": -360, "max": 360,
                "units": "degrees", "level": CONFIG_LEVEL_ADVANCED,
                "description": "Deactivate elements west of this longitude"},
            "readers:max_number_of_fails": {
                "type": "int", "default": 1, "min": 1, "max": 100,
                "level": CONFIG_LEVEL_ADVANCED,
                "description": "Discard readers failing more often than this"},
            "seed:ocean_only": {
                "type": "bool", "default": True, "level": CONFIG_LEVEL_ADVANCED,
                "description": "Relocate land-seeded elements to the ocean"},
            "seed:number": {
                "type": "int", "default": 1, "min": 1, "max": 10 ** 9,
                "level": CONFIG_LEVEL_ESSENTIAL,
                "description": "Default number of elements per seeding"},
            "parallel:particle_sharding": {
                "type": "bool", "default": True,
                "level": CONFIG_LEVEL_ADVANCED,
                "description": "Shard elements over all visible devices "
                "(data parallelism); forcing fields are replicated"},
            "parallel:domain_decomposition": {
                "type": "bool", "default": False,
                "level": CONFIG_LEVEL_ADVANCED,
                "description": "Split the primary forcing grid into Y "
                "bands over the device mesh (for grids too large to "
                "replicate): per-tile particle buffers, on-device halo "
                "exchange (ppermute over ICI) and neighbour-only "
                "particle migration inside the fused step"},
            "parallel:tile_capacity_factor": {
                "type": "float", "default": 2.0, "min": 1.0, "max": 64.0,
                "level": CONFIG_LEVEL_ADVANCED,
                "description": "Per-tile particle buffer slots as a "
                "multiple of the even share (headroom for spatially "
                "clumped distributions under domain decomposition)"},
            "parallel:tile_grid": {
                "type": "str", "default": "auto",
                "level": CONFIG_LEVEL_ADVANCED,
                "description": "Tile topology for domain decomposition: "
                "'auto' = 1D Y bands (one per device), or 'RxC' for a "
                "2D Y-by-X tiling (R*C must equal the device count; "
                "right for domains wider than tall)"},
            "drift:advection_single_fetch": {
                "type": "bool", "default": False,
                "level": CONFIG_LEVEL_ADVANCED,
                "description": "RK stages re-evaluate one gathered "
                "corner block instead of refetching fields (4x fewer "
                "gathers; exact while stage displacements stay inside "
                "one grid cell, clamped beyond)"},
            "export:buffer_length": {
                "type": "int", "default": 100, "min": 0, "max": 10 ** 6,
                "level": CONFIG_LEVEL_ADVANCED,
                "description": "Flush the outfile every this many output "
                "steps during the run (crash-safe incremental export); "
                "0 writes only at the end"},
            "export:sharded": {
                "type": "bool", "default": False,
                "level": CONFIG_LEVEL_ADVANCED,
                "description": "Multi-host runs: every process writes its "
                "addressable slots to <outfile>.pNNN.nc (O(local) per "
                "host instead of gathering every snapshot to every "
                "host); merge offline with tools/concat_shards.py. "
                "Single-process runs ignore this"},
        })

    def _add_seed_configs(self):
        """Auto-generate ``seed:<var>`` configs from the element schema
        (reference basemodel/__init__.py:529-545)."""
        specs = {}
        for name, spec in self.ElementType.variables.items():
            if not spec.get("seed", True):
                continue
            if name in ("lon", "lat"):
                continue
            default = spec.get("default", 0.0)
            specs[f"seed:{name}"] = {
                "type": "float" if not isinstance(default, str) else "str",
                "default": default, "units": spec.get("units"),
                "min": spec.get("min", -1e30), "max": spec.get("max", 1e30),
                "level": CONFIG_LEVEL_BASIC,
                "description": spec.get("description", f"Seed value of {name}")}
        self._add_config(specs)

    def _add_environment_configs(self):
        """Auto-generate ``environment:constant/fallback:<var>`` configs
        (reference environment.py:41-76)."""
        specs = {}
        for var, spec in self.required_variables.items():
            specs[f"environment:constant:{var}"] = {
                "type": "float", "default": None, "min": -1e30, "max": 1e30,
                "level": CONFIG_LEVEL_ADVANCED,
                "description": f"Use constant value for {var}"}
            specs[f"environment:fallback:{var}"] = {
                "type": "float", "default": spec.get("fallback", None),
                "min": -1e30, "max": 1e30, "level": CONFIG_LEVEL_ADVANCED,
                "description": f"Fallback value for {var} when missing"}
        self._add_config(specs)

    def add_config(self):
        """Model hook to register extra config keys."""

    # ----------------------------------------------------------- readers --
    @require_mode([Mode.Config, Mode.Ready])
    def add_reader(self, readers, variables=None, first=False):
        self.env.add_reader(readers, variables=variables, first=first)
        return self

    def add_readers_from_list(self, urls, timeout=None, lazy=True,
                              variables=None):
        """Open readers for a list of paths/URLs (reference
        environment.py:248-265).  Local NetCDF paths only in this build."""
        from ..fields.factory import reader_from_url
        readers = [reader_from_url(u) for u in urls]
        readers = [r for r in readers if r is not None]
        self.add_reader(readers, variables=variables)
        return self

    # ----------------------------------------------------------- seeding --
    @require_mode([Mode.Config, Mode.Ready])
    def seed_elements(self, lon, lat, time=None, radius=0, number=None,
                      radius_type="gaussian", origin_marker=None,
                      origin_marker_name=None, **kwargs):
        """Seed elements at point(s), optionally scattered within ``radius``
        metres, at one or more times (reference basemodel/__init__.py:1033).

        ``time`` may be a datetime, a [start, end] pair (elements spread
        linearly in the interval), or an array of per-element datetimes.
        """
        lon = np.atleast_1d(np.asarray(lon, dtype=np.float64)).ravel()
        lat = np.atleast_1d(np.asarray(lat, dtype=np.float64)).ravel()
        if len(lon) != len(lat):
            raise ValueError("lon and lat must have equal length")
        num_points = len(lon)

        if number is None:
            number = len(kwargs.get("z", [])) \
                if np.ndim(kwargs.get("z", 0)) else 0
            number = max(number, num_points,
                         int(self.get_config("seed:number")))
        number = int(number)
        if number < 1:
            raise ValueError(
                f"Number of elements to seed must be >= 1, got {number}")
        if num_points not in (1, number):
            if number % num_points == 0 or number == num_points:
                pass
            else:
                raise ValueError(
                    f"Number of elements ({number}) must equal or be a "
                    f"multiple of number of points ({num_points})")
        if num_points == 1:
            lon = np.repeat(lon, number)
            lat = np.repeat(lat, number)
        elif num_points != number:
            reps = number // num_points
            lon = np.repeat(lon, reps)
            lat = np.repeat(lat, reps)
            number = len(lon)

        # time handling
        if time is None:
            raise ValueError("Time of seeding must be specified")
        if isinstance(time, (list, tuple)) and len(time) == 2 \
                and isinstance(time[0], datetime):
            t0, t1 = time
            frac = np.linspace(0, 1, number)
            times = np.array(
                [t0 + frac[i] * (t1 - t0) for i in range(number)])
        elif isinstance(time, datetime):
            times = np.array([time] * number)
        else:
            times = np.asarray(time)
            if len(times) == 1:
                times = np.repeat(times, number)
            elif len(times) != number:
                raise ValueError("Length of time array must match number")

        # radius scatter (gaussian default, as reference :1150-1166)
        radius = np.atleast_1d(np.asarray(radius, dtype=np.float64)).ravel()
        if len(radius) == 1:
            radius = np.repeat(radius, number)
        if radius.max() > 0:
            az = self._np_random.uniform(0, 360, number)
            if radius_type == "gaussian":
                dist = abs(self._np_random.normal(0, 1, number)) * radius
            elif radius_type == "uniform":
                dist = np.sqrt(self._np_random.uniform(0, 1, number)) * radius
            else:
                raise ValueError(f"Unknown radius_type: {radius_type}")
            lat, lon = direct_np(lat, lon, az, dist)

        # origin marker bookkeeping (reference :1082-1099)
        if origin_marker is None:
            origin_marker = len(self._seedings)
        if origin_marker_name is not None:
            self._origin_marker_names[int(origin_marker)] = origin_marker_name

        # element properties: user kwargs > seed:* config > schema default
        props = {}
        for name in self.ElementType.variables:
            # any element variable may be set at seeding (matching the
            # reference); only seed:True variables get seed:* configs
            if name in ("lon", "lat", "origin_marker", "ID", "status"):
                continue
            if name in kwargs:
                v = kwargs.pop(name)
            else:
                v = self.get_config(f"seed:{name}", default=None)
                if v is None:
                    v = self.ElementType.default(name)
            v = np.atleast_1d(np.asarray(v))
            if len(v) == 1:
                v = np.repeat(v, number)
            elif len(v) != number:
                raise ValueError(
                    f"Seed property {name} has length {len(v)} != {number}")
            props[name] = v
        # per-element constant environment (reference :1228-1237: a
        # ConstantReader keyed on element_ID added with top priority)
        per_elem_env = kwargs.pop("environment", None)

        unknown = [k for k in kwargs if k not in ("z",)]
        if unknown:
            raise ValueError(
                f"Unknown seed properties for "
                f"{type(self).__name__}: {unknown}")

        if per_elem_env is not None:
            from ..fields.analytic import PerElementReader
            ids = np.arange(self.num_elements_scheduled_total + 1,
                            self.num_elements_scheduled_total + number + 1)
            rdr = getattr(self, "_per_element_reader", None)
            if rdr is None:
                rdr = self._per_element_reader = PerElementReader()
                new_reader = True
            else:
                new_reader = False
            for var, vals in per_elem_env.items():
                rdr.add(var, ids, vals)
            if new_reader:
                self.add_reader(rdr, first=True)
            else:
                # re-register any newly served variables at top priority
                self.env.add_reader(rdr, first=True)

        seeding = {
            "lon": lon.astype(np.float32),
            "lat": lat.astype(np.float32),
            "time": times,
            "origin_marker": np.full(number, origin_marker, dtype=np.int32),
        }
        for name, v in props.items():
            dtype = self.ElementType.variables[name].get("dtype", np.float32)
            seeding[name] = v.astype(dtype)
        self._seedings.append(seeding)
        self.num_elements_scheduled_total += number
        self.mode = Mode.Ready
        return self

    @require_mode([Mode.Config, Mode.Ready])
    def seed_cone(self, lon, lat, time, radius=0, number=None, **kwargs):
        """Seed along a cone (line from (lon0,lat0) to (lon1,lat1) with
        radius varying linearly), elements spread uniformly in time if a
        time interval is given (reference basemodel/__init__.py:1240)."""
        lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
        lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
        if number is None:
            number = int(self.get_config("seed:number"))
        if len(lon) == 1:
            lons = np.repeat(lon, number)
            lats = np.repeat(lat, number)
        elif len(lon) == 2:
            frac = np.linspace(0, 1, number)
            # interpolate along the geodesic between the two endpoints
            from ..utils.geodesic import inverse_np
            az12, _, dist = inverse_np(lat[0], lon[0], lat[1], lon[1])
            lats, lons = direct_np(np.repeat(lat[0], number),
                                   np.repeat(lon[0], number),
                                   np.repeat(az12, number), frac * dist)
        else:
            raise ValueError("seed_cone needs 1 or 2 points")
        radius = np.atleast_1d(np.asarray(radius, dtype=np.float64))
        if len(radius) == 2:
            radius = np.linspace(radius[0], radius[1], number)
        return self.seed_elements(lons, lats, time=time, radius=radius,
                                  number=number, **kwargs)

    @require_mode([Mode.Config, Mode.Ready])
    def seed_within_polygon(self, lons, lats, number=None, **kwargs):
        """Seed uniformly inside a polygon given by vertex arrays
        (reference basemodel/__init__.py:1459), via rejection sampling on
        an equal-area-ish local projection."""
        lons = np.asarray(lons, dtype=np.float64)
        lats = np.asarray(lats, dtype=np.float64)
        if number is None:
            number = int(self.get_config("seed:number"))
        from matplotlib.path import Path
        poly = Path(np.column_stack([lons, lats]))
        lo0, lo1 = lons.min(), lons.max()
        la0, la1 = lats.min(), lats.max()
        if not (-360 <= lo0 <= 360 and -90 <= la0 <= 90):
            raise ValueError(
                "Polygon coordinates look projected (not lon/lat): "
                f"lon {lo0}..{lo1}, lat {la0}..{la1}")
        out_lon = np.empty(0)
        out_lat = np.empty(0)
        # rejection-sample with cos(lat) area weighting
        for _attempt in range(1000):
            if len(out_lon) >= number:
                break
            n_try = max(4 * number, 128)
            cand_lon = self._np_random.uniform(lo0, lo1, n_try)
            sin0, sin1 = np.sin(np.radians([la0, la1]))
            cand_lat = np.degrees(np.arcsin(
                self._np_random.uniform(sin0, sin1, n_try)))
            inside = poly.contains_points(
                np.column_stack([cand_lon, cand_lat]))
            out_lon = np.concatenate([out_lon, cand_lon[inside]])
            out_lat = np.concatenate([out_lat, cand_lat[inside]])
        if len(out_lon) < number:
            raise ValueError(
                "Could not place elements inside the polygon (degenerate "
                "or zero-area geometry?)")
        return self.seed_elements(out_lon[:number], out_lat[:number],
                                  number=number, **kwargs)

    @require_mode([Mode.Config, Mode.Ready])
    def seed_letters(self, text, lon, lat, time, number, scale=1.2,
                     **kwargs):
        """Seed elements within the glyph outlines of ``text`` anchored at
        (lon, lat) — one seed_within_polygon call per glyph polygon
        (reference basemodel/__init__.py:1635-1652).  ``scale`` is the
        glyph height in degrees; ``number`` is per polygon."""
        from matplotlib.textpath import TextPath
        from matplotlib.font_manager import FontProperties
        fp = FontProperties(family="DejaVu Sans", weight="bold")
        path = TextPath((lon, lat), text, size=1 * scale, prop=fp)
        for p in path.to_polygons():
            if len(p) < 3:
                continue
            self.seed_within_polygon(lons=p[:, 0], lats=p[:, 1],
                                     number=number, time=time, **kwargs)
        return self

    @require_mode([Mode.Config, Mode.Ready])
    def seed_repeated_segment(self, lons, lats, start_time, end_time=None,
                              time_interval=None, number_per_segment=None,
                              **kwargs):
        """Seed the same line segment repeatedly in time
        (reference basemodel/__init__.py:1402-1457)."""
        if number_per_segment is None:
            number_per_segment = int(self.get_config("seed:number"))
        from ..utils.geodesic import inverse_np
        az12, _, dist = inverse_np(lats[0], lons[0], lats[-1], lons[-1])
        frac = np.linspace(0, 1, number_per_segment)
        seg_lats, seg_lons = direct_np(
            np.repeat(lats[0], number_per_segment),
            np.repeat(lons[0], number_per_segment),
            np.repeat(az12, number_per_segment), frac * dist)
        if time_interval is not None and end_time is not None:
            t = start_time
            while t <= end_time:
                self.seed_elements(seg_lons, seg_lats, time=t,
                                   number=number_per_segment, **kwargs)
                t = t + time_interval
        else:
            self.seed_elements(seg_lons, seg_lats, time=start_time,
                               number=number_per_segment, **kwargs)
        return self

    @require_mode([Mode.Config, Mode.Ready])
    def seed_from_geojson(self, gjson, **kwargs):
        """Seed from a GeoJSON string/dict: Point, LineString or Polygon
        features with optional 'time' and seed properties
        (reference basemodel/__init__.py:1356-1400)."""
        import json
        from datetime import datetime as _dt
        if isinstance(gjson, str):
            gjson = json.loads(gjson)
        if gjson.get("type") == "FeatureCollection":
            for feature in gjson["features"]:
                self.seed_from_geojson(feature, **kwargs)
            return self
        if gjson.get("type") != "Feature":
            raise ValueError("GeoJSON must be a Feature/FeatureCollection")
        props = dict(gjson.get("properties") or {})
        t = props.pop("time", None)
        if t is not None:
            if isinstance(t, (list, tuple)):
                t = [_dt.fromisoformat(str(x).rstrip("Z")) for x in t]
            else:
                t = _dt.fromisoformat(str(t).rstrip("Z"))
        props.update(kwargs)
        props.setdefault("time", t)
        geom = gjson["geometry"]
        coords = np.asarray(geom["coordinates"], dtype=float)
        if geom["type"] == "Point":
            return self.seed_elements(coords[0], coords[1], **props)
        if geom["type"] == "LineString":
            return self.seed_cone(coords[[0, -1], 0], coords[[0, -1], 1],
                                  **props)
        if geom["type"] == "Polygon":
            ring = np.asarray(geom["coordinates"][0], dtype=float)
            return self.seed_within_polygon(ring[:, 0], ring[:, 1], **props)
        raise ValueError(f"Unsupported geometry: {geom['type']}")

    @require_mode([Mode.Config, Mode.Ready])
    def seed_from_wkt(self, wkt, time, **kwargs):
        """Seed inside POLYGON/MULTIPOLYGON/POINT WKT strings
        (reference basemodel/__init__.py:1561-1571), parsed with a
        from-scratch reader (no GDAL)."""
        import re
        wkt = wkt.strip()
        nums = r"[-+0-9.eE\s,]+"
        if wkt.upper().startswith("POINT"):
            vals = [float(v) for v in re.findall(r"[-+0-9.eE]+", wkt)]
            return self.seed_elements(vals[0], vals[1], time=time, **kwargs)
        rings = re.findall(r"\(([^()]+)\)", wkt)
        if not rings:
            raise ValueError(f"Cannot parse WKT: {wkt[:60]}")
        for ring in rings[:1] if wkt.upper().startswith("POLYGON") \
                else rings:
            pts = np.array([[float(x) for x in pair.split()]
                            for pair in ring.split(",")])
            self.seed_within_polygon(pts[:, 0], pts[:, 1], time=time,
                                     **kwargs)
        return self

    @require_mode([Mode.Config, Mode.Ready])
    def seed_from_shapefile(self, shapefile, number=None, **kwargs):
        """Seed uniformly inside polygons of an ESRI shapefile
        (reference basemodel/__init__.py:1573-1583), using the bundled
        from-scratch .shp parser."""
        from ..utils.shapefile import shapefile_polygons
        polys = shapefile_polygons(shapefile)
        if not polys:
            raise ValueError(f"No polygons found in {shapefile}")
        if number is None:
            number = int(self.get_config("seed:number"))
        # distribute proportionally to (rough) polygon area
        areas = np.array([abs(np.trapezoid(p[:, 1], p[:, 0]))
                          for p in polys])
        areas = areas / max(areas.sum(), 1e-30)
        counts = np.maximum((areas * number).astype(int), 0)
        counts[0] += number - counts.sum()
        for poly, cnt in zip(polys, counts):
            if cnt > 0:
                self.seed_within_polygon(poly[:, 0], poly[:, 1],
                                         number=int(cnt), **kwargs)
        return self

    @require_mode([Mode.Config, Mode.Ready])
    def seed_from_dataset(self, ds, **kwargs):
        """Continue from the last valid state of a previous result
        (reference basemodel/__init__.py:1681-1732)."""
        lon = ds["lon"].values
        lat = ds["lat"].values
        status = ds["status"].values
        times = ds.coords["time"]
        n, T = lon.shape
        last = np.array([np.where(np.isfinite(row))[0][-1]
                         if np.isfinite(row).any() else -1 for row in lon])
        keep = (last >= 0) & (status[np.arange(n), np.maximum(last, 0)]
                              == ACTIVE)
        idx = np.where(keep)[0]
        if len(idx) == 0:
            raise ValueError("No active elements to continue from")
        seed_time = np.asarray(times)[last[idx]]
        seed_time = [t.astype("datetime64[us]").item() for t in seed_time]
        props = {}
        for name in self.ElementType.variables:
            if name in ("lon", "lat", "ID", "status"):
                continue
            if name in ds:
                props[name] = ds[name].values[idx, last[idx]]
        props.update(kwargs)
        return self.seed_elements(lon[idx, last[idx]], lat[idx, last[idx]],
                                  time=np.array(seed_time),
                                  number=len(idx), **props)

    @require_mode([Mode.Config, Mode.Ready])
    def seed_from_file(self, filename, **kwargs):
        """Continue from a previous output file
        (reference basemodel/__init__.py:1733-1744)."""
        from ..export.io_netcdf import read_result
        return self.seed_from_dataset(read_result(filename), **kwargs)

    # --------------------------------------------------------- status -----
    def register_status(self, reason):
        """Ensure a deactivation reason has a status code; return it."""
        if reason not in self.status_categories:
            self.status_categories.append(reason)
        return self.status_categories.index(reason)

    def status_code(self, reason):
        return self.register_status(reason)

    # ------------------------------------------------------------- run ----
    @require_mode(Mode.Ready, "Elements must be seeded before running")
    def run(self, time_step=None, steps=None, duration=None, end_time=None,
            time_step_output=None, outfile=None, export_variables=None,
            export_buffer_length=100):
        self.timer_start("preparing main loop")
        self.mode = Mode.Run

        # ---- time resolution (reference :1930-2013)
        if time_step is None:
            time_step = timedelta(
                minutes=self.get_config("general:time_step_minutes"))
        dt = _seconds(time_step)
        if dt == 0:
            raise ValueError("time_step must be non-zero")
        all_times = np.concatenate([s["time"] for s in self._seedings])
        tmin, tmax = all_times.min(), all_times.max()
        self.start_time = tmin if dt > 0 else tmax

        if steps is None:
            if duration is None:
                if end_time is None:
                    out_cfg = self.get_config(
                        "general:time_step_output_minutes")
                    raise ValueError(
                        "Provide one of steps, duration or end_time")
                duration = abs(_seconds(end_time - self.start_time))
            else:
                duration = abs(_seconds(duration))
            steps = int(round(duration / abs(dt)))
        steps = int(steps)
        if steps < 1:
            raise ValueError("Simulation needs at least one step")

        if time_step_output is None:
            out_cfg = self.get_config("general:time_step_output_minutes")
            dt_out = out_cfg * 60.0 if out_cfg else abs(dt)
        else:
            dt_out = abs(_seconds(time_step_output))
        K = max(1, int(round(dt_out / abs(dt))))
        if abs(K * abs(dt) - dt_out) > 1e-9 * abs(dt):
            raise ValueError(
                "Output time step must be an integer multiple of time step")
        n_intervals = steps // K
        if n_intervals * K != steps:
            steps = n_intervals * K
            logger.warning("Rounding steps down to %d (whole output steps)",
                           steps)
        self.time_step = timedelta(seconds=dt)
        self.time_step_output = timedelta(seconds=K * dt)
        self.steps_calculation = steps

        # sharded output needs per-slot IDs in every snapshot (slots
        # migrate under DD; particle sharding needs them for the concat)
        self._want_id_in_snapshot = bool(
            outfile is not None and self.get_config("export:sharded"))

        advance, final_snap, state, base_key = self.prepare_run(
            dt, K, export_variables=export_variables,
            total_steps=steps)

        def window(k):
            a = self.start_time + timedelta(seconds=k * K * dt)
            b = self.start_time + timedelta(seconds=(k + 1) * K * dt)
            return (min(a, b), max(a, b))

        self.timer_end("preparing main loop")
        self.timer_start("main loop")
        # device-level tracing: jax.profiler trace of the main loop
        # (the TPU counterpart of the reference's wall-clock timers)
        profile_dir = self.get_config("general:profile_dir")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        frames = []
        frame_times = []
        # host RSS per output interval (reference samples psutil into
        # self.memory_usage each step, basemodel/__init__.py:2194)
        self.memory_usage = []

        def _sample_memory():
            try:
                import resource
                self.memory_usage.append(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                    / 1024.0)  # MB on linux (ru_maxrss is KB)
            except Exception:  # noqa: BLE001 — diagnostics only
                pass
        # crash-safe incremental export: flush every buffer_length output
        # frames to the outfile with time as the record dimension
        # (reference export_buffer_length, basemodel/__init__.py:2390)
        writer = None
        flushed = 0
        # sharded multi-host output (export:sharded): every process
        # writes its addressable slots' raw frames to <outfile>.pNNN.nc
        # — O(local) per host per output step instead of gathering the
        # global snapshot to every host (the reference analogue is the
        # per-worker files + concat of its multiprocessing recipe,
        # reference examples/example_long_multiprocessing.py:16-50);
        # merge with tools/concat_shards.py
        sharded_out = False
        if outfile is not None:
            from ..parallel import multihost
            sharded_out = bool(self.get_config("export:sharded")) \
                and multihost.is_multihost()
            if multihost.is_multihost() and not multihost.is_primary() \
                    and not sharded_out:
                outfile = None
        buffer_length = self.get_config("export:buffer_length") or 0
        if outfile is not None and sharded_out:
            from ..export.io_netcdf import ShardWriter
            from ..parallel import multihost
            n_total = getattr(self, "_n_real_elements", None) \
                or int(state.data["lon"].shape[0])
            rank = multihost.process_index()
            self._shard_outfile = f"{outfile}.p{rank:03d}.nc"
            writer = None      # created lazily at first frame (needs
            buffer_length = max(buffer_length, 1)  # the local slot count)
        elif outfile is not None and buffer_length > 0:
            from ..export.io_netcdf import IncrementalWriter
            n_out = getattr(self, "_n_real_elements", None) \
                or int(state.data["lon"].shape[0])
            writer = IncrementalWriter(outfile, n_out)

        def flush(force=False):
            nonlocal flushed, writer
            if sharded_out and writer is None and frames:
                from ..export.io_netcdf import ShardWriter
                from ..parallel import multihost
                writer = ShardWriter(
                    self._shard_outfile, int(frames[0]["lon"].shape[0]),
                    n_total, multihost.process_index(),
                    multihost.process_count())
            if writer is None:
                return
            pending = frames[flushed:]
            if pending and (force or len(pending) >= buffer_length):
                n_real = None if sharded_out \
                    else getattr(self, "_n_real_elements", None)
                writer.append(
                    [{n: (v[..., :n_real] if n_real else v)
                      for n, v in f.items()} for f in pending],
                    frame_times[flushed:])
                flushed = len(frames)
        dd = getattr(self, "_dd", None)

        def get_frame(snap):
            if sharded_out:
                # O(local): only this process's addressable slots
                from ..parallel import multihost
                f, _ = multihost.local_rows(snap)
                return f
            if dd is not None:
                f = dd.gather(snap)
            elif self._mesh is not None:
                from ..parallel import multihost
                f = multihost.gather(snap, self._mesh)
            else:
                f = jax.device_get(snap)
            if dd is not None:
                export = self.export_variables
                # export=None means "all element variables" (including
                # ID, like the non-DD snapshot)
                f = dd.reorder_frame(
                    f, self._n_real_elements,
                    keep_id=export is None or "ID" in export)
            return f
        # multi-host: replicated inputs must be explicit global arrays
        # (single-process: _mh_global is the identity)
        if self._mesh is not None:
            from ..parallel import multihost as _mh
            _mh_global = lambda tree: _mh.ensure_global(tree, self._mesh)
        else:
            _mh_global = lambda tree: tree
        try:
            for k in range(n_intervals):
                t_rel = k * K * dt
                dev_states = self.env.build_device_states(*window(k))
                if dd is not None:
                    dev_states = dd.retile(dev_states)
                key = jax.random.fold_in(base_key, k)
                dev_states, t_arr, key = _mh_global(
                    (dev_states, jnp.float32(t_rel), key))
                state, snap = advance(state, dev_states, t_arr, key)
                if k + 1 < n_intervals:
                    # overlap next-window forcing I/O with device compute
                    self.env.prefetch_device_states(*window(k + 1))
                frames.append(get_frame(snap))
                frame_times.append(self.start_time
                                   + timedelta(seconds=t_rel))
                _sample_memory()
                flush()
            # final snapshot at end time
            t_rel = n_intervals * K * dt
            dev_states = self.env.build_device_states(
                *window(n_intervals - 1))
            if dd is not None:
                dev_states = dd.retile(dev_states)
            dev_states, t_arr = _mh_global((dev_states,
                                            jnp.float32(t_rel)))
            snap = final_snap(state, dev_states, t_arr)
            frames.append(get_frame(snap))
            frame_times.append(self.start_time + timedelta(seconds=t_rel))
            if dd is not None:
                self.state = dd.gather(state)
            elif self._mesh is not None:
                from ..parallel import multihost
                self.state = multihost.gather(state, self._mesh)
            else:
                self.state = jax.device_get(state)
        except Exception:
            # leave the partial record-layout file readable
            flush(force=True)
            if writer is not None:
                writer.abort_close()
            # reference parity: a failed run retains the steps computed
            # so far as ``self.result`` for inspection (the reference
            # ends gracefully keeping partial results, reference
            # basemodel/__init__.py:2286-2304); we keep the stricter
            # re-raise but assemble the in-memory partial result first
            if frames:
                try:
                    self.result = self._assemble_result(
                        frames, frame_times, trim=not sharded_out)
                    self.mode = Mode.Result
                except Exception:
                    logger.exception(
                        "could not assemble partial result after crash")
            if profile_dir:
                jax.profiler.stop_trace()
            self.timer_end("main loop")
            raise
        if profile_dir:
            jax.profiler.stop_trace()
            logger.info("jax.profiler trace written to %s", profile_dir)
        self.timer_end("main loop")

        self.timer_start("postprocessing")
        # sharded output: self.result holds this process's LOCAL slots
        # (with an ID variable); the canonical global file comes from
        # tools/concat_shards.py over all <outfile>.pNNN.nc shards
        self.result = self._assemble_result(frames, frame_times,
                                            trim=not sharded_out)
        if outfile is not None:
            if writer is not None:
                flush(force=True)
                writer.finalize(self.result)
            elif not sharded_out:
                from ..export.io_netcdf import write_result
                write_result(self.result, outfile)
        self.timer_end("postprocessing")
        self.timer_end("total time")
        self.mode = Mode.Result
        self.post_run()
        return self

    def post_run(self):
        """Model hook called after the run completes
        (reference basemodel/__init__.py post_run)."""

    def set_mesh(self, devices):
        """Restrict multi-device execution (particle sharding or domain
        decomposition) to an explicit device subset — used by the
        scaling harness; default is every visible device."""
        self._mesh_devices = list(devices) if devices is not None else None

    def simulation_direction(self):
        """+1 forward, -1 backward (reference basemodel
        ``simulation_direction``)."""
        ts = getattr(self, "time_step", None)
        if ts is None:
            return 1
        secs = ts.total_seconds() if hasattr(ts, "total_seconds") \
            else float(ts)
        return -1 if secs < 0 else 1

    def SRS(self):
        """The simulation coordinate reference system — always geographic
        WGS84 here (positions are lon/lat; reference basemodel ``SRS``)."""
        from ..utils.crs import LatLonCRS
        return LatLonCRS("+proj=latlong +datum=WGS84")

    def add_metadata(self, key, value):
        """Attach a metadata attribute stamped into the output file
        (reference basemodel ``add_metadata``)."""
        if not hasattr(self, "_extra_metadata"):
            self._extra_metadata = {}
        self._extra_metadata[key] = value

    @staticmethod
    def index_of_first_and_last(array):
        """Index of first and last finite value per row (reference
        basemodel ``index_of_last``/firstlast utilities)."""
        ok = np.isfinite(array)
        any_ok = ok.any(axis=1)
        first = np.where(any_ok, ok.argmax(axis=1), -1)
        last = np.where(any_ok,
                        array.shape[1] - 1 - ok[:, ::-1].argmax(axis=1),
                        -1)
        return first, last

    @staticmethod
    def points_within_polygon(lons, lats, polygon_lons, polygon_lats):
        """Boolean mask of points inside the polygon (the reference
        delegates to shapely, basemodel ``seed_within_polygon``
        internals)."""
        from matplotlib.path import Path
        poly = Path(np.column_stack([np.asarray(polygon_lons),
                                     np.asarray(polygon_lats)]))
        pts = np.column_stack([np.asarray(lons), np.asarray(lats)])
        return poly.contains_points(pts)

    def prepare_run(self, dt, K, export_variables=None, jit=True,
                    total_steps=None):
        """Finalise the environment, build the initial device state and the
        compiled (advance, final_snapshot) kernels.  Split out of ``run``
        so benchmarks and the multichip dry-run can drive the kernel
        directly."""
        if getattr(self, "start_time", None) is None:
            all_times = np.concatenate([s["time"] for s in self._seedings])
            self.start_time = all_times.min() if dt > 0 else all_times.max()
            self.time_step = timedelta(seconds=dt)
            self.time_step_output = timedelta(seconds=K * dt)

        # relocate land-seeded elements to the nearest ocean cell
        # (reference basemodel/__init__.py:1005-1070 closest_ocean_points)
        if self.get_config("seed:ocean_only"):
            for s in self._seedings:
                s["lon"], s["lat"] = self.closest_ocean_points(
                    s["lon"], s["lat"])

        # ---- build initial state arrays (host)
        state_np = self._build_initial_state(dt)

        # ---- environment finalisation
        constant_overrides = {}
        fallback_overrides = {}
        for var in self.required_variables:
            c = self.get_config(f"environment:constant:{var}", default=None)
            if c is not None:
                constant_overrides[var] = c
            f = self.get_config(f"environment:fallback:{var}", default=None)
            if f is not None:
                fallback_overrides[var] = f
        # drift:horizontal_diffusivity config acts as the fallback for the
        # horizontal_diffusivity variable (reference oceandrift behaviour)
        hd = self.get_config("drift:horizontal_diffusivity")
        if hd and "horizontal_diffusivity" in self.required_variables:
            fallback_overrides["horizontal_diffusivity"] = hd
        self.env.max_reader_fails = self.get_config(
            "readers:max_number_of_fails")
        profiles = self.required_profiles()
        self.env.finalize(self.start_time,
                          required_profiles=profiles,
                          constant_overrides=constant_overrides,
                          fallback_overrides=fallback_overrides)
        self._auto_landmask_fallback()

        # uncertainty injection config (reference environment.py:865-891)
        unc = []
        cu = self.get_config("drift:current_uncertainty")
        cuu = self.get_config("drift:current_uncertainty_uniform")
        wu = self.get_config("drift:wind_uncertainty")
        if cu:
            unc.append((("x_sea_water_velocity", "y_sea_water_velocity"),
                        float(cu), False))
        if cuu:
            unc.append((("x_sea_water_velocity", "y_sea_water_velocity"),
                        float(cuu), True))
        if wu:
            unc.append((("x_wind", "y_wind"), float(wu), False))
        self.env.uncertainty = unc

        # simulation extent: seed bbox grown by max_speed * duration
        # (reference basemodel/__init__.py:2018-2044)
        max_speed = float(self.get_config("drift:max_speed"))
        duration = abs(dt) * (total_steps if total_steps is not None else K)
        lons = np.concatenate([s["lon"] for s in self._seedings])
        lats = np.concatenate([s["lat"] for s in self._seedings])
        margin_m = max_speed * duration
        margin_lat = margin_m / 111000.0
        coslat = max(np.cos(np.radians(np.abs(lats).max())), 0.05)
        margin_lon = margin_lat / coslat
        extent = (float(lons.min() - margin_lon),
                  float(np.clip(lats.min() - margin_lat, -90, 90)),
                  float(lons.max() + margin_lon),
                  float(np.clip(lats.max() + margin_lat, -90, 90)))
        self.simulation_extent = extent
        end_time = self.start_time + timedelta(seconds=dt * (
            total_steps if total_steps is not None else K))
        try:
            truncate_depth = self.get_config(
                "drift:truncate_ocean_model_below_m")
        except ValueError:
            truncate_depth = None
        self.env.prepare_readers(
            extent=extent, start_time=min(self.start_time, end_time),
            end_time=max(self.start_time, end_time), max_speed=max_speed,
            interval_seconds=abs(dt) * K, truncate_depth=truncate_depth,
            # wide row tiers (full bilinear/trilinear stencil in ONE
            # gather, 'xy'/'xyz') win up to +91% end-to-end for
            # multi-fetch RK stages, and since r5 the corner-block
            # gather splits wide rows instead of discarding halves, so
            # single-fetch configs profit too (same held bytes, fewer
            # takes — measured, docs/performance.md)
            pair_hint="xy")

        # seafloor seeding: resolve z = -depth at the seed positions
        # (reference basemodel/__init__.py:1168-1210)
        if self.get_config("seed:seafloor", default=False):
            dev0 = self.env.build_device_states(
                self.start_time, self.start_time + timedelta(seconds=dt))
            envs0, _ = self.env.get_environment(
                dev0, ["sea_floor_depth_below_sea_level"],
                jnp.float32(0.0), jnp.asarray(state_np["lon"]),
                jnp.asarray(state_np["lat"]), jnp.asarray(state_np["z"]))
            depth0 = np.asarray(envs0["sea_floor_depth_below_sea_level"])
            state_np["z"] = (-depth0 + 0.01).astype(np.float32)
            state_np["prev_z"] = state_np["z"].copy()

        # ---- domain decomposition: tile the primary forcing grid over
        # the device mesh and re-layout elements into per-tile buffers
        # (the slot of reference basereader/structured.py:121-123 block
        # buffers at multi-chip scale; see parallel/tiled.py)
        self._dd = None
        if len(jax.devices()) > 1 and \
                self.get_config("parallel:domain_decomposition"):
            from ..parallel.tiled import DDContext
            self._dd = DDContext(
                self, max_speed=max_speed, dt=dt,
                capacity_factor=self.get_config(
                    "parallel:tile_capacity_factor"),
                devices=getattr(self, "_mesh_devices", None),
                tile_grid=self.get_config("parallel:tile_grid"))
            state_np = self._dd.bin_initial_state(
                state_np, self._n_real_elements)
            self._n_padded_elements = len(state_np["lon"])

        # ---- compile step
        self.export_variables = export_variables
        advance, final_snap = self._make_advance(K, dt, jit=jit)

        state = ElementState({k: jnp.asarray(v) for k, v in state_np.items()})
        if self.get_config("general:rng", default="threefry") == "rbg":
            base_key = jax.random.key(self.rng_seed, impl="rbg")
        else:
            base_key = jax.random.PRNGKey(self.rng_seed)

        # ---- multi-device particle sharding (DP over a 1D mesh)
        self._mesh = None
        n_dev = len(jax.devices())
        if self._dd is not None:
            state = self._dd.shard_state(state)
            self._mesh = self._dd.mesh
            logger.info("Domain decomposition over %d tiles", n_dev)
        elif n_dev > 1 and self.get_config("parallel:particle_sharding"):
            from ..parallel.mesh import particle_mesh, shard_state
            self._mesh = particle_mesh(
                getattr(self, "_mesh_devices", None))
            state = shard_state(state, self._mesh)
            logger.info("Sharding %d elements over %d devices",
                        state.capacity, n_dev)
        return advance, final_snap, state, base_key

    # ------------------------------------------------- initial state ------
    def _build_initial_state(self, dt):
        n = self.num_elements_scheduled_total
        # pad the capacity to a multiple of the device count so every
        # per-element array shards evenly; padding stays NOT_RELEASED
        n_dev = len(jax.devices())
        self._n_real_elements = n
        if n_dev > 1 and self.get_config("parallel:particle_sharding") \
                and not self.get_config("parallel:domain_decomposition"):
            n = ((n + n_dev - 1) // n_dev) * n_dev
        self._n_padded_elements = n
        sign = 1.0 if dt > 0 else -1.0
        arrays = {}
        for name, spec in self.ElementType.variables.items():
            dtype = spec.get("dtype", np.float32)
            default = spec.get("default", 0)
            arrays[name] = np.full(n, default, dtype=dtype)
        offset = 0
        for s in self._seedings:
            m = len(s["lon"])
            sl = slice(offset, offset + m)
            for kname, v in s.items():
                if kname == "time":
                    continue
                if kname in arrays:
                    arrays[kname][sl] = v
            offset += m
        arrays["ID"] = np.arange(1, n + 1, dtype=np.int32)
        arrays["status"] = np.full(n, NOT_RELEASED, dtype=np.int32)
        all_times = np.concatenate([s["time"] for s in self._seedings])
        rel = np.array([(t - self.start_time).total_seconds()
                        for t in all_times], dtype=np.float32)
        # padding elements (if any) are never released
        arrays["release_tau"] = np.full(n, np.inf, dtype=np.float32)
        arrays["release_tau"][:len(rel)] = (rel * sign).astype(np.float32)
        arrays["prev_lon"] = arrays["lon"].copy()
        arrays["prev_lat"] = arrays["lat"].copy()
        arrays["prev_z"] = arrays["z"].copy()
        # previous-step environment store (reference store_previous_if,
        # basemodel/__init__.py:642-668): NaN until first step
        for var in self.store_previous_env_vars():
            arrays[f"prev_env_{var}"] = np.full(n, np.nan, dtype=np.float32)
        return arrays

    def store_previous_env_vars(self):
        """Environment variables whose previous-step values the model
        needs (model hook; reference ``store_previous_if`` conditions)."""
        return []

    def _auto_landmask_fallback(self):
        """Resolve land_binary_mask when no reader provides it and no
        fallback is configured.  The reference auto-adds the GSHHG
        global landmask, which always covers
        (reference reader_global_landmask.py:201-260); our bundled
        raster is regional, so if it does not cover the seeds the run
        RAISES when a coastline action is active — an all-ocean
        default would silently turn 'stranding' into a no-op."""
        if "land_binary_mask" not in self.required_variables:
            return
        if bool(self.env.priority_list.get("land_binary_mask")) or \
                self.env.fallback_values.get("land_binary_mask",
                                             None) is not None:
            return
        if self.get_config("general:use_auto_landmask"):
            reason = "auto landmask failed"
            try:
                from ..fields.landmask import GlobalLandmask
                lm = GlobalLandmask()
                lon = np.concatenate([s["lon"] for s in self._seedings])
                lat = np.concatenate([s["lat"] for s in self._seedings])
                if bool(np.all(lm.covers_positions(lon, lat))):
                    self.env.add_reader(lm)
                    self.env._plan.append((lm, ["land_binary_mask"]))
                    return
                reason = ("the bundled coastline raster does not cover "
                          "the seeding area")
            except Exception as e:  # no landmask data available
                reason = f"no landmask data available ({e})"
        else:
            reason = "general:use_auto_landmask is False"
        if self.get_config("general:coastline_action") == "none":
            self.env.fallback_values["land_binary_mask"] = 0.0
            return
        raise ValueError(
            f"general:coastline_action="
            f"'{self.get_config('general:coastline_action')}' needs a "
            f"landmask, but {reason}. Either add a gridded ocean reader "
            "whose grid provides a land mask, supply a coastline "
            "shapefile (OPENDRIFT_LANDMASK_SHP), set "
            "environment:fallback:land_binary_mask=0 to explicitly "
            "treat the domain as all ocean, or set "
            "general:coastline_action='none'")

    def _cond_holds(self, cond):
        """Evaluate a conditional like ``['drift:vertical_mixing', 'is',
        False]`` (reference basemodel/__init__.py:4966
        ``evaluate_conditional``)."""
        key, op, value = cond
        current = self.get_config(key, default=None)
        if op == "is":
            return current is value or current == value
        if op == "is_not":
            return not (current is value or current == value)
        raise ValueError(f"Unknown conditional operator: {op}")

    def _skip_if_holds(self, spec):
        cond = spec.get("skip_if")
        return cond is not None and self._cond_holds(cond)

    def active_required_variables(self):
        """Required variables minus those skipped by config conditions."""
        return [v for v, spec in self.required_variables.items()
                if not self._skip_if_holds(spec)]

    def required_profiles(self):
        """Variables needing vertical profiles.  A variable's profile
        fetch (one gather set per z-level per step) can be gated by a
        ``profiles_if`` conditional — the reference only interpolates
        T/S profiles inside the mixing loop when
        vertical_mixing:TSprofiles is on (oceandrift.py:459-477), and
        only needs a diffusivity profile when the diffusivity comes from
        readers ('environment')."""
        out = []
        for v, spec in self.required_variables.items():
            if not spec.get("profiles", False) or self._skip_if_holds(spec):
                continue
            cond = spec.get("profiles_if")
            if cond is not None and not self._cond_holds(cond):
                continue
            out.append(v)
        return out

    # --------------------------------------------------- the fused step ---
    def _dynamic_params(self):
        """Config values resolved to a dict used inside the step (floats are
        baked as constants; recompile on change is accepted)."""
        maxage = self.get_config("drift:max_age_seconds")
        return {
            "dt": None,  # filled by _make_advance
            "hdiff": float(self.get_config("drift:horizontal_diffusivity")),
            "current_unc": float(self.get_config("drift:current_uncertainty")),
            "current_unc_uniform": float(
                self.get_config("drift:current_uncertainty_uniform")),
            "wind_unc": float(self.get_config("drift:wind_uncertainty")),
            "max_age": float(maxage) if maxage is not None else np.inf,
        }

    def _make_advance(self, K, dt, jit=True):
        """Build jitted (advance_interval, final_snapshot) callables."""
        params = self._dynamic_params()
        params["dt"] = float(dt)
        env = self.env
        dd = getattr(self, "_dd", None)
        sign = 1.0 if dt > 0 else -1.0
        coastline_action = self.get_config("general:coastline_action")
        coastline_bisection = self.get_config("general:coastline_bisection",
                                              default="refetch")
        seafloor_action = self.get_config("general:seafloor_action")
        env_vars = self.active_required_variables()
        profile_vars = self.env.required_profiles
        zlevels = self._profile_zlevels()

        has_seafloor = "sea_floor_depth_below_sea_level" in env_vars
        no_fallback_vars = [
            v for v in env_vars
            if env.fallback_values.get(v, None) is None]
        status_outside = self.status_code("outside")
        status_stranded = self.status_code("stranded")
        status_retired = self.status_code("retired")
        status_missing = self.status_code("missing_data")
        status_seafloor = self.status_code("seafloor")
        west = self.get_config("drift:deactivate_west_of")
        east = self.get_config("drift:deactivate_east_of")
        north = self.get_config("drift:deactivate_north_of")
        south = self.get_config("drift:deactivate_south_of")
        # EPS ensemble forcing: elements ride members round-robin by ID;
        # per-element constant readers also key on ID (same channel)
        has_ensemble = any(getattr(r, "ensemble_size", 1) > 1
                           or getattr(r, "needs_ids", False)
                           for r in env.readers.values())

        # block-backed env fetch: with single-fetch RK, one corner-block
        # gather serves the start-position environment AND every RK stage
        # (halves the per-step row gathers of the flagship configuration).
        # Resolved lazily at trace time — the plan needs the readers'
        # samplers, which exist only after device_state().
        want_block = False
        try:
            want_block = (
                self.get_config("drift:advection_single_fetch")
                and self.get_config("drift:advection_scheme") != "euler")
        except ValueError:
            pass
        block_plan_cache = []

        def _block_plan():
            if not block_plan_cache:
                plan = None
                idx = env.uv_block_plan_index() if want_block else None
                if idx is not None:
                    b_reader, b_served = env._plan[idx]
                    keep = [v for v in b_served if v in env_vars
                            and b_reader.name in
                            env.priority_list.get(v, [])]
                    for v in ("x_sea_water_velocity",
                              "y_sea_water_velocity"):
                        if v not in keep:
                            keep.append(v)
                    plan = (idx, keep)
                block_plan_cache.append(plan)
            return block_plan_cache[0]

        def fetch_block(d, dev_states):
            plan = _block_plan()
            if plan is None:
                return None
            block_idx, block_keep = plan
            b_reader = env._plan[block_idx][0]
            member_arg = d["ID"] if (
                getattr(b_reader, "ensemble_size", 1) > 1) else None
            block, covers0 = b_reader.corner_block(
                dev_states[block_idx], d["lon"], d["lat"], d["z"],
                member=member_arg, keep_vars=block_keep)
            return (block_idx, block, covers0)

        def pre_update(state, dev_states, t_rel, tau, key):
            """Release, env fetch, deactivations, coastline/seafloor —
            the phase before motion (reference loop :2193-2265)."""
            d = dict(state.data)
            release = (d["status"] == NOT_RELEASED) & \
                (d["release_tau"] < tau + abs(params["dt"]))
            d["status"] = jnp.where(release, ACTIVE, d["status"])
            active = d["status"] == ACTIVE

            block_ctx = fetch_block(d, dev_states)
            envs, missing = env.get_environment(
                dev_states, env_vars, t_rel, d["lon"], d["lat"], d["z"],
                key=key if env.uncertainty else None,
                member=d["ID"] if has_ensemble else None,
                block_ctx=block_ctx)

            # deactivate elements missing mandatory data (reference :2501)
            if no_fallback_vars:
                miss_any = jnp.zeros_like(active)
                for v in no_fallback_vars:
                    miss_any = miss_any | missing[v]
                d["status"] = jnp.where(active & miss_any, status_missing,
                                        d["status"])
                active = d["status"] == ACTIVE

            # deactivate outside validity box / invalid coordinates
            bad = (~jnp.isfinite(d["lon"])) | (~jnp.isfinite(d["lat"])) \
                | (jnp.abs(d["lat"]) > 90.0)
            if west is not None:
                bad = bad | (d["lon"] < west)
            if east is not None:
                bad = bad | (d["lon"] > east)
            if south is not None:
                bad = bad | (d["lat"] < south)
            if north is not None:
                bad = bad | (d["lat"] > north)
            d["status"] = jnp.where(active & bad, status_outside, d["status"])
            active = d["status"] == ACTIVE

            # coastline interaction (reference :670-746).  When no reader
            # serves the landmask (fallback constant only), the field has
            # no coast to cross: a fallback of 0 can never strand anything
            # and the 4 bisection refetches below would be pure waste.
            landmask_spatial = env.has_reader_for("land_binary_mask")
            if "land_binary_mask" in envs and coastline_action != "none" \
                    and (landmask_spatial
                         or float(env.fallback_values.get(
                             "land_binary_mask", 0.0) or 0.0) > 0.5):
                on_land = envs["land_binary_mask"] > 0.5
                if coastline_action == "stranding" and not landmask_spatial:
                    # uniform mask=1: everything strands where it is
                    strand = active & on_land
                    d["status"] = jnp.where(strand, status_stranded,
                                            d["status"])
                    active = d["status"] == ACTIVE
                elif coastline_action == "stranding":
                    # bisect the land crossing along the last transect so
                    # stranded elements sit at the coastline, not inland
                    # (reference coastline_crossing :81-134, replaced by a
                    # fixed-K sampled transect against the mask).  Gated
                    # behind lax.cond: on the typical step nothing strands
                    # and the K mask refetches (each a full-fleet gather)
                    # are skipped entirely at runtime.
                    K_ROUNDS = 3     # 1/2^3 transect resolution
                    strand = active & on_land
                    lon_a, lat_a = d["lon"], d["lat"]
                    plon, plat = d["prev_lon"], d["prev_lat"]
                    zz = d["z"]

                    # 'block' bisection: probes re-read the held corner
                    # block (general:coastline_bisection) — zero gathers
                    # per round instead of one full-fleet mask fetch
                    use_block_mask = (
                        coastline_bisection == "block"
                        and block_ctx is not None
                        and "land_binary_mask" in block_ctx[1][4])

                    def mask_at(slon, slat, zz):
                        if use_block_mask:
                            b_reader = env._plan[block_ctx[0]][0]
                            vals, _ = b_reader.sample_from_block(
                                dev_states[block_ctx[0]], block_ctx[1],
                                t_rel, slon, slat, ["land_binary_mask"])
                            return vals["land_binary_mask"]
                        menv, _ = env.get_environment(
                            dev_states, ["land_binary_mask"], t_rel,
                            slon, slat, zz)
                        return menv["land_binary_mask"]

                    def bisect(ops):
                        # true bisection of [prev(sea), current(land)]:
                        # each round is ONE mask fetch and halves the
                        # interval (the fixed-grid scan needed 2^k
                        # fetches for the same resolution)
                        lon_a, lat_a, plon, plat, zz = ops
                        lo = jnp.zeros_like(lon_a)
                        hi = jnp.ones_like(lon_a)
                        for _ in range(K_ROUNDS):
                            mid = 0.5 * (lo + hi)
                            slon = plon + mid * (lon_a - plon)
                            slat = plat + mid * (lat_a - plat)
                            land = mask_at(slon, slat, zz) > 0.5
                            hi = jnp.where(land, mid, hi)
                            lo = jnp.where(land, lo, mid)
                        return hi   # first-land point along the transect

                    frac_land = jax.lax.cond(
                        jnp.any(strand), bisect,
                        lambda ops: jnp.ones_like(ops[0]),
                        (lon_a, lat_a, plon, plat, zz))
                    d["lon"] = jnp.where(
                        strand, plon + frac_land * (lon_a - plon), lon_a)
                    d["lat"] = jnp.where(
                        strand, plat + frac_land * (lat_a - plat), lat_a)
                    d["status"] = jnp.where(strand, status_stranded,
                                            d["status"])
                    active = d["status"] == ACTIVE
                elif coastline_action == "previous":
                    d["lon"] = jnp.where(active & on_land, d["prev_lon"],
                                         d["lon"])
                    d["lat"] = jnp.where(active & on_land, d["prev_lat"],
                                         d["lat"])

            # seafloor interaction (reference :748-784)
            if has_seafloor and seafloor_action != "none":
                depth = envs["sea_floor_depth_below_sea_level"]
                below = d["z"] < -depth
                if seafloor_action == "lift_to_seafloor":
                    d["z"] = jnp.where(active & below, -depth, d["z"])
                elif seafloor_action == "deactivate":
                    d["status"] = jnp.where(active & below, status_seafloor,
                                            d["status"])
                    active = d["status"] == ACTIVE
                elif seafloor_action == "previous":
                    d["z"] = jnp.where(active & below, d["prev_z"], d["z"])

            return ElementState(d), envs, missing, block_ctx

        def snapshot(state, envs):
            snap = {}
            export = self.export_variables
            # domain decomposition: slots move with migration, so the
            # host re-indexes every frame by element ID
            always = ("lon", "lat", "z", "status") + \
                (("ID",) if dd is not None
                 or getattr(self, "_want_id_in_snapshot", False) else ())
            for name in self.ElementType.variables:
                if export is None or name in export or name in always:
                    snap[name] = state.data[name]
            for name, v in envs.items():
                if export is None or name in export:
                    snap[name] = v
            return snap

        def post_update(state, envs, dev_states, t_rel, tau, key,
                        block_ctx=None):
            """Aging/retirement, model physics, horizontal diffusion —
            the phase after the output snapshot (reference :2266-2304)."""
            d = dict(state.data)
            active = d["status"] == ACTIVE
            d["age_seconds"] = jnp.where(
                active, d["age_seconds"] + abs(params["dt"]),
                d["age_seconds"])
            d["status"] = jnp.where(
                active & (d["age_seconds"] > params["max_age"]),
                status_retired, d["status"])
            # previous positions, for 'previous'-type interactions
            d["prev_lon"] = d["lon"]
            d["prev_lat"] = d["lat"]
            d["prev_z"] = d["z"]
            state = ElementState(d)

            profiles = None
            if profile_vars:
                profiles = env.get_profiles(dev_states, profile_vars, t_rel,
                                            state.data["lon"],
                                            state.data["lat"], zlevels)

            ctx = StepContext(self, state, envs, profiles, dev_states,
                              t_rel, params, key, zlevels)
            if block_ctx is not None:
                b_reader = env._plan[block_ctx[0]][0]
                ctx.uv_block_ctx = (b_reader, dev_states[block_ctx[0]],
                                    block_ctx[1], block_ctx[2])
            self.update(ctx)
            ctx.horizontal_diffusion()
            ctx.flush_positions()
            # record this step's environment for next-step comparisons
            prev_updates = {f"prev_env_{v}": envs[v]
                            for v in self.store_previous_env_vars()
                            if v in envs}
            if prev_updates:
                ctx.state = ctx.state.replace(**prev_updates)
            return ctx.state

        def step(state, dev_states, t_rel, tau, key, want_snap):
            state, envs, missing, block_ctx = pre_update(
                state, dev_states, t_rel, tau,
                jax.random.fold_in(key, 987654))
            snap = snapshot(state, envs) if want_snap else None
            state = post_update(state, envs, dev_states, t_rel, tau, key,
                                block_ctx)
            if dd is not None:
                # hand off elements that crossed their tile's row band
                state = ElementState(dd.migrate(state.data))
            return state, snap

        def advance(state, dev_states, t0_rel, key):
            tau0 = t0_rel * sign
            state, snap = step(state, dev_states, t0_rel, tau0,
                               jax.random.fold_in(key, 0), True)

            def body(i, st):
                t_rel = t0_rel + i.astype(jnp.float32) * params["dt"]
                st, _ = step(st, dev_states, t_rel, t_rel * sign,
                             jax.random.fold_in(key, i), False)
                return st
            if K > 1:
                state = jax.lax.fori_loop(1, K, body, state)
            return state, snap

        def final_snapshot(state, dev_states, t_rel):
            state, envs, missing, _ = pre_update(state, dev_states, t_rel,
                                                 t_rel * sign,
                                                 jax.random.PRNGKey(0))
            return snapshot(state, envs)

        if dd is not None:
            # run the whole advance inside one shard_map over the tiles
            # mesh: halo-exchange the forcing bands, decorrelate the RNG
            # per tile, then execute the identical step program on each
            # tile's local particles and extended forcing tile
            def tile_advance(state, dev_states, t0_rel, key):
                local = dd.local_dev_states(dev_states)
                key = jax.random.fold_in(key, dd.tile_index())
                return advance(state, local, t0_rel, key)

            def tile_final(state, dev_states, t_rel):
                local = dd.local_dev_states(dev_states)
                return final_snapshot(state, local, t_rel)
            return dd.wrap_advance(tile_advance), dd.wrap_final(tile_final)
        if not jit:
            return advance, final_snapshot
        return (jax.jit(advance, donate_argnums=(0,)),
                jax.jit(final_snapshot))

    def _profile_zlevels(self):
        # numpy (host) on purpose: spacing etc. must stay concrete under jit
        zr = self.required_profiles_z_range
        if zr is None:
            zr = [-20.0, 0.0]
        return np.linspace(zr[1], zr[0], 9, dtype=np.float32)

    def update(self, ctx):
        """Model physics for one time step — must be overridden."""
        raise NotImplementedError(
            "Subclasses must define an update(ctx) method")

    # --------------------------------------------------- result assembly --
    def _assemble_result(self, frames, frame_times, trim=True):
        from ..export.io_netcdf import valid_mask
        T = len(frames)
        names = list(frames[0].keys())
        n_real = getattr(self, "_n_real_elements", None) if trim else None
        stacked = {n: np.stack([f[n][..., :n_real] if n_real else f[n]
                                for f in frames], axis=-1)
                   for n in names}  # (N, T)
        status = stacked["status"]
        # valid: active frames plus the first dead frame (the reference
        # records deactivated elements once, at the output step covering
        # their deactivation, basemodel/__init__.py:2390-2396)
        valid = valid_mask(status, ACTIVE)

        variables = {}
        for n in names:
            vals = stacked[n]
            attrs = {}
            if n in self.ElementType.variables:
                spec = self.ElementType.variables[n]
                attrs = {k: v for k, v in spec.items()
                         if k in ("units", "standard_name", "description")}
            if np.issubdtype(vals.dtype, np.floating):
                vals = np.where(valid, vals, np.nan)
            variables[n] = DataVar(("trajectory", "time"), vals, attrs)
        n_elem = status.shape[0]
        coords = {
            "trajectory": np.arange(1, n_elem + 1),
            "time": np.array(frame_times, dtype="datetime64[ns]"),
        }
        attrs = {
            "opendrift_class": type(self).__name__,
            "opendrift_module": type(self).__module__,
            "time_coverage_start": str(frame_times[0]),
            "time_coverage_end": str(frame_times[-1]),
            "time_step_calculation": str(self.time_step),
            "time_step_output": str(self.time_step_output),
            "status_categories": " ".join(self.status_categories),
        }
        attrs.update(self._config_to_attributes())
        attrs.update(getattr(self, "_extra_metadata", {}))
        return TrajectoryDataset(variables, coords, attrs)

    # ------------------------------------------------------ diagnostics ---
    def closest_ocean_points(self, lon, lat):
        """Move points that fall on land to the nearest ocean grid cell
        of the best available landmask (reference basemodel/
        __init__.py:1005-1070 via cKDTree over the mask raster)."""
        lon = np.atleast_1d(np.asarray(lon, dtype=np.float64)).copy()
        lat = np.atleast_1d(np.asarray(lat, dtype=np.float64)).copy()
        reader = None
        for r in self.env.readers.values():
            if "land_binary_mask" in getattr(r, "variables", []) \
                    and hasattr(r, "_load_frame"):
                reader = r
                break
        if reader is None:
            logger.warning("no gridded landmask available; cannot "
                           "relocate land points to ocean")
            return lon, lat
        land = np.asarray(reader._load_frame("land_binary_mask", 0))
        if land.ndim == 3:
            land = land[0]
        X, Y = np.meshgrid(reader.x, reader.y)
        if getattr(reader.crs, "is_latlon", False):
            lons_g, lats_g = X, Y
        else:
            lons_g, lats_g = reader.crs.inv(np, X, Y)
        ocean = land < 0.5
        if not ocean.any():
            logger.warning("landmask raster contains no ocean cells")
            return lon, lat
        from scipy.spatial import cKDTree
        pts = np.column_stack([lon, lat])
        # on-land test by nearest raster cell
        all_tree = cKDTree(np.column_stack([lons_g.ravel(),
                                            lats_g.ravel()]))
        _, idx = all_tree.query(pts)
        on_land = land.ravel()[idx] > 0.5
        if not on_land.any():
            return lon, lat
        logger.info("moving %d land-seeded points to the nearest "
                    "ocean cell", int(on_land.sum()))
        ocean_tree = cKDTree(np.column_stack([lons_g[ocean],
                                              lats_g[ocean]]))
        _, oidx = ocean_tree.query(pts[on_land])
        lon[on_land] = lons_g[ocean][oidx]
        lat[on_land] = lats_g[ocean][oidx]
        return lon, lat

    def num_elements_total(self):
        """(reference basemodel/__init__.py:999)."""
        return self.num_elements_scheduled_total

    def num_elements_activated(self):
        """Elements released so far (reference basemodel:995)."""
        if self.result is not None:
            status = self.result["status"].values
            return int((~np.isnan(
                np.asarray(self.result["lon"].values[:, -1]))).sum()
                + (status[:, -1] > 0).sum())
        return 0

    def get_time_array(self):
        """Output times of the last run (deprecated; use result.time)
        (reference basemodel/__init__.py:4506)."""
        times = np.asarray(self.result.coords["time"]) \
            .astype("datetime64[s]").tolist()
        rel = [t - times[0] for t in times]
        return times, rel

    def get_property(self, propname):
        """Deprecated accessor (reference basemodel:4603): returns
        (values.T, status.T) like the reference."""
        logger.warning("get_property is deprecated; use o.result[...]")
        prop = np.asarray(self.result[propname].values)
        status = np.asarray(self.result["status"].values)
        return prop.T, status.T

    def get_trajectory_lengths(self):
        """Lengths and speeds along trajectories
        (reference basemodel/__init__.py:4614-4634)."""
        from ..utils.geodesic import geodesic_inverse
        lon = np.asarray(self.result["lon"].values)   # (N, T)
        lat = np.asarray(self.result["lat"].values)
        _, _, dist = geodesic_inverse(np, lat[:, :-1], lon[:, :-1],
                                      lat[:, 1:], lon[:, 1:])
        dist = np.nan_to_num(dist, nan=0.0)
        dt_out = self.time_step_output.total_seconds()
        speeds = dist / dt_out
        bad = speeds > 100
        dist[bad] = 0
        speeds[bad] = 0
        total = np.cumsum(dist, axis=1)[:, -1]
        return total, dist, speeds

    def add_readers_from_file(self, filename, timeout=None, lazy=True):
        """Add readers from a text file of paths/URLs, one per line
        (reference basemodel/__init__.py:622-624)."""
        from ..fields.factory import reader_from_url
        with open(filename) as fd:
            urls = [ln.strip() for ln in fd
                    if ln.strip() and not ln.startswith("#")]
        for u in urls:
            try:
                self.add_reader(reader_from_url(u, lazy=lazy))
            except Exception as e:
                logger.warning("could not open reader %s: %s", u, e)

    def default_readers(self):
        """Paths from scripts/data_sources.txt
        (reference basemodel/__init__.py:626-631)."""
        import importlib.resources as res
        try:
            txt = (res.files("opendrift_tpu.scripts")
                   / "data_sources.txt").read_text()
        except Exception:
            return []
        return [ln.strip() for ln in txt.splitlines()
                if ln.strip() and not ln.startswith("#")]

    def seed_from_ladim(self, ladimfile, roms):
        """Seed from a LADiM *.rls release file [time, x, y, z]
        (reference basemodel/__init__.py:1655-1680); grid x/y are
        converted through the given ROMS reader's coordinates."""
        data = np.loadtxt(ladimfile,
                          dtype={"names": ("time", "x", "y", "z"),
                                 "formats": ("U20", "f4", "f4", "f4")},
                          usecols=(0, 1, 2, 3))
        time = np.array([datetime.strptime(t, "%Y-%m-%dT%H")
                         for t in np.atleast_1d(data["time"])])
        x = np.atleast_1d(data["x"])
        y = np.atleast_1d(data["y"])
        z = -np.abs(np.atleast_1d(data["z"]))
        # fractional ROMS grid indices -> lon/lat via the rho coordinates
        xi = np.clip(x.astype(int), 0, roms._lon_rho.shape[1] - 1)
        yi = np.clip(y.astype(int), 0, roms._lon_rho.shape[0] - 1)
        lon = roms._lon_rho[yi, xi]
        lat = roms._lat_rho[yi, xi]
        self.seed_elements(lon=lon, lat=lat, z=z, time=list(time))

    def seed_from_geopandas(self, geodataframe, time, **kwargs):
        """Seed within the polygons (or at the points) of a GeoPandas
        GeoDataFrame or any duck-typed equivalent
        (reference basemodel/__init__.py:1584-1652)."""
        g = geodataframe
        geoms = list(g.geometry)
        if all(getattr(geom, "geom_type", "") == "Point"
               for geom in geoms):
            self.seed_elements(lon=[p.x for p in geoms],
                               lat=[p.y for p in geoms],
                               time=time, **kwargs)
            return
        for geom in geoms:
            if hasattr(geom, "exterior"):
                lons, lats = zip(*list(geom.exterior.coords))
                self.seed_within_polygon(np.array(lons), np.array(lats),
                                         time=time, **kwargs)

    def num_elements_active(self):
        if self.result is not None:
            status = self.result["status"].values
            return int((status[:, -1] == ACTIVE).sum())
        return 0

    def num_elements_scheduled(self):
        return self.num_elements_scheduled_total

    def num_elements_deactivated(self):
        if self.result is not None:
            status = self.result["status"].values
            return int((status[:, -1] > ACTIVE).sum())
        return 0

    def store_message(self, msg):
        self.messages.append(msg)
        logger.warning(msg)

    def get_messages(self):
        return "\n".join(self.messages)

    def __repr__(self):
        s = f"Model: {type(self).__name__} (mode: {self.mode.name})\n"
        s += f"  {self.num_elements_scheduled_total} elements scheduled\n"
        s += f"  readers: {list(self.env.readers)}\n"
        return s


class StepContext(PhysicsContext):
    """Per-step context handed to model ``update`` implementations.

    Carries the element state, fetched environment, profiles and RNG, and
    provides the physics methods of the reference ``PhysicsMethods`` mixin
    (reference: opendrift/models/physics_methods.py:570) as methods that
    mutate ``self.state`` functionally.
    """

    def __init__(self, sim, state, env, profiles, dev_states, t_rel, params,
                 key, zlevels):
        self.sim = sim
        self.state = state
        self.environment = env
        self.profiles = profiles
        self.dev_states = dev_states
        self.t_rel = t_rel
        self.params = params
        self.zlevels = zlevels
        self._key = key
        self._key_counter = 0
        # pre-gathered u/v corner block (block-backed env fetch): set by
        # post_update when single-fetch RK is active, so advect stages
        # reuse the env fetch's gathers instead of re-gathering
        self.uv_block_ctx = None
        # fused position mode: accumulate process velocities, commit one
        # geodesic solve per step (see update_positions)
        try:
            self._fused_positions = (
                sim.get_config("drift:position_update") == "fused")
        except ValueError:
            self._fused_positions = True
        self._u_acc = None
        self._v_acc = None

    # -- RNG ---------------------------------------------------------------
    def next_key(self):
        self._key_counter += 1
        return jax.random.fold_in(self._key, self._key_counter)

    @property
    def dt(self):
        """Signed step length in seconds (negative for backward runs)."""
        return self.params["dt"]

    # -- state update helpers ---------------------------------------------
    @property
    def active(self):
        return self.state.data["status"] == ACTIVE

    def get_environment(self, varnames, t_rel, lon, lat, z):
        key = self.next_key() if self.sim.env.uncertainty else None
        member = None
        if any(getattr(r, "ensemble_size", 1) > 1
               for r in self.sim.env.readers.values()):
            member = self.state.data["ID"]
        envs, _ = self.sim.env.get_environment(
            self.dev_states, varnames, t_rel, lon, lat, z, key=key,
            member=member)
        return envs

    def update_positions(self, x_vel, y_vel):
        """Geodesic position update (reference basemodel/__init__.py:4631):
        masked to active, moving elements.

        In 'fused' mode (default) the per-process velocities are summed
        and ONE Vincenty solve commits the step in :meth:`flush_positions`
        — the reference instead runs ``Geod.fwd`` per process (current,
        windage, Stokes, diffusion each call update_positions).  All
        processes are evaluated from the same start-of-step environment,
        so the sequential solves differ from the fused one only by
        O((s/R)^2) path-curvature terms (mm at km steps)."""
        if self._fused_positions:
            mv = self.state.data["moving"]
            u, v = x_vel * mv, y_vel * mv
            if self._u_acc is None:
                self._u_acc, self._v_acc = u, v
            else:
                self._u_acc = self._u_acc + u
                self._v_acc = self._v_acc + v
            return
        self._commit_positions(x_vel * self.state.data["moving"],
                               y_vel * self.state.data["moving"])

    def flush_positions(self):
        """Commit accumulated fused-mode velocities (one geodesic solve)."""
        if self._u_acc is not None:
            u, v = self._u_acc, self._v_acc
            self._u_acc = self._v_acc = None
            self._commit_positions(u, v)

    def _commit_positions(self, u, v):
        from ..utils.geodesic import geodesic_step, \
            geodesic_step_second_order
        d = self.state.data
        mask = self.active
        try:
            vincenty = self.sim.get_config("drift:geodesy") == "vincenty"
        except ValueError:
            vincenty = False
        step_fn = geodesic_step if vincenty else geodesic_step_second_order
        lat2, lon2 = step_fn(jnp, d["lat"], d["lon"], u, v,
                             self.params["dt"])
        self.state = self.state.replace(
            lon=jnp.where(mask, lon2, d["lon"]),
            lat=jnp.where(mask, lat2, d["lat"]))

    def update_z(self, dz=None, new_z=None):
        d = self.state.data
        mask = self.active & (d["moving"] > 0)
        if new_z is None:
            new_z = d["z"] + dz
        self.state = self.state.replace(
            z=jnp.where(mask, new_z, d["z"]))

    def deactivate_elements(self, mask, reason):
        code = self.sim.status_code(reason)
        d = self.state.data
        self.state = self.state.replace(
            status=jnp.where(self.active & mask, code, d["status"]))

    def set_var(self, name, values, mask=None):
        d = self.state.data
        if mask is None:
            mask = self.active
        self.state = self.state.replace(
            **{name: jnp.where(mask, values, d[name])})

    # -- base stochastics --------------------------------------------------
    def horizontal_diffusion(self):
        """Random-walk horizontal diffusion (reference
        basemodel/__init__.py:1746-1772): v = sqrt(2 D / dt) * N(0,1)."""
        if "horizontal_diffusivity" in self.environment:
            D = self.environment["horizontal_diffusivity"]
        else:
            D = self.params["hdiff"]
            if D == 0.0:
                return
        d = self.state.data
        dt = abs(self.params["dt"])
        std = jnp.sqrt(2.0 * D / dt)
        noise = jax.random.normal(self.next_key(), (2,) + d["lon"].shape,
                                  dtype=d["lon"].dtype)
        self.update_positions(std * noise[0], std * noise[1])
