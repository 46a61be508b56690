"""Field provider framework: host-side readers that produce device samplers.

Architectural inversion vs the reference: upstream, ``Environment.
get_environment`` walks a Python reader stack on every step (reference:
opendrift/models/basemodel/environment.py:499-775, re-entered mid-step by
the RK stages, physics_methods.py:636-670).  Here a *reader* is a host-side
object whose only runtime job is to provide

* a pytree of device arrays (``device_state``) refreshed between jitted
  chunks (gridded forcing frames, landmask rasters, ...), and
* a pure ``sample`` method — traced once into the step kernel — that maps
  (device_state, t, lon, lat, z) -> ({var: values}, coverage_mask).

Reader priority, fallbacks and vector rotation then become a fixed chain of
``jnp.where`` merges compiled into the step (see fields/environment.py),
with zero host involvement per step.

Vector rotation: grid-relative velocity pairs are rotated to true east/north
using the analytic grid-convergence angle of the reader CRS (reference
rotates via finite-difference azimuths, basereader/variables.py:59-109).
"""

import datetime

import numpy as np
import jax.numpy as jnp

from ..utils import crs as crslib

# Variable pairs that are grid-x/grid-y vector components and must be
# rotated to east/north when sampled from a projected grid (reference:
# opendrift/readers/basereader/__init__.py:85-105).
VECTOR_PAIRS = [
    ("x_sea_water_velocity", "y_sea_water_velocity"),
    ("x_wind", "y_wind"),
    ("sea_ice_x_velocity", "sea_ice_y_velocity"),
    ("sea_surface_wave_stokes_drift_x_velocity",
     "sea_surface_wave_stokes_drift_y_velocity"),
]

# (x, y, speed, to_direction) rows for the derived environment mappings
# (reference basereader/consts.py:27 vector_pairs_xy)
SPEED_DIRECTION_PAIRS = [
    ("x_wind", "y_wind", "wind_speed", "wind_to_direction"),
    ("sea_ice_x_velocity", "sea_ice_y_velocity", "sea_ice_speed",
     "direction_of_sea_ice_velocity"),
    ("x_sea_water_velocity", "y_sea_water_velocity", "sea_water_speed",
     "sea_water_to_direction"),
    ("sea_surface_wave_stokes_drift_x_velocity",
     "sea_surface_wave_stokes_drift_y_velocity",
     "sea_surface_wave_stokes_drift_speed",
     "sea_surface_wave_stokes_drift_to_direction"),
]

# Physically plausible bounds per CF standard name, used to scrub corrupt
# input (reference: opendrift/readers/basereader/consts.py:2-22 and the
# masking in variables.py:630-668).
STANDARD_NAMES = {
    "x_sea_water_velocity": {"valid_min": -15.0, "valid_max": 15.0,
                             "units": "m s-1"},
    "y_sea_water_velocity": {"valid_min": -15.0, "valid_max": 15.0,
                             "units": "m s-1"},
    "x_wind": {"valid_min": -50.0, "valid_max": 50.0, "units": "m s-1"},
    "y_wind": {"valid_min": -50.0, "valid_max": 50.0, "units": "m s-1"},
    "sea_water_temperature": {"valid_min": -4.0, "valid_max": 40.0,
                              "units": "degC"},
    "sea_water_salinity": {"valid_min": 0.0, "valid_max": 45.0, "units": "1"},
    "sea_floor_depth_below_sea_level": {"valid_min": -20.0,
                                        "valid_max": 12000.0, "units": "m"},
    "sea_surface_height": {"valid_min": -15.0, "valid_max": 15.0, "units": "m"},
    "significant_height_of_combined_wind_waves_and_swell":
        {"valid_min": 0.0, "valid_max": 30.0, "units": "m"},
}


class BaseReader:
    """Host-side reader base.

    Subclasses set ``variables`` (list of CF standard names), ``proj4``
    and coverage metadata, and implement the device-side ``sample``.
    """

    name = None
    variables = None
    proj4 = "+proj=latlong"
    start_time = None          # datetime or None = always covered
    end_time = None
    time_step = None
    # spatial coverage in reader grid coordinates (None = infinite)
    xmin = None
    xmax = None
    ymin = None
    ymax = None
    always_valid = False       # data available for any time
    # maximum particle speed [m/s] for buffer sizing (reference
    # variables.py:588-620); used by gridded readers
    verticalbuffer = 1

    def __init__(self):
        if self.name is None:
            self.name = type(self).__name__
        # readers with a non-PROJ grid mapping (e.g. the ROMS
        # curvilinear index CRS) set self.crs themselves pre-super()
        if getattr(self, "crs", None) is None:
            self.crs = crslib.from_proj4(self.proj4)
        self.is_lazy = False
        self._setup_environment_mappings()

    # ----------------------------------------- derived environment mappings
    def _setup_environment_mappings(self):
        """Auto-derive component/magnitude variables from what the
        reader serves (reference basereader/variables.py:449-553 +
        consts.py:27 ``vector_pairs_xy``): speed + to_direction ->
        x/y components, components -> speed.  Derived names join
        ``self.variables``; the environment layer fetches the sources
        and evaluates the mapping on device."""
        self._derived = {}
        have = set(self.variables or [])
        # the reference registers vector_from_speed_and_direction only
        # when the reader's y axis points north (variables.py:538-546):
        # on a projected grid the derived components would bypass the
        # sampler's vector rotation and come out in the wrong frame
        y_is_north = getattr(self.crs, "is_latlon", False)
        for x, y, speed, direction in SPEED_DIRECTION_PAIRS:
            if speed in have and direction in have and x not in have \
                    and y_is_north:
                # NOTE: the reference's active mapping assigns
                # cos(direction) to the x component and sin to y
                # (vector_from_speed_and_direction, variables.py:469-473)
                # — reproduced verbatim for trajectory parity
                self._derived[x] = ((speed, direction),
                                    lambda v, s=speed, d=direction:
                                    v[s] * jnp.cos(jnp.deg2rad(v[d])))
                self._derived[y] = ((speed, direction),
                                    lambda v, s=speed, d=direction:
                                    v[s] * jnp.sin(jnp.deg2rad(v[d])))
                self.variables = list(self.variables) + [x, y]
            if x in have and y in have and speed not in have:
                self._derived[speed] = ((x, y),
                                        lambda v, a=x, b=y:
                                        jnp.hypot(v[a], v[b]))
                self.variables = list(self.variables) + [speed]

    @property
    def derived_variables(self):
        """Names served by mappings rather than data (reference
        ``Variables.derived_variables``)."""
        return list(getattr(self, "_derived", {}))

    def activate_environment_mapping(self, name):
        """Opt-in mappings (reference ``activate_environment_mapping``):
        currently 'land_binary_mask_from_ocean_depth'
        (variables.py:449-450, disabled by default there too)."""
        if name != "land_binary_mask_from_ocean_depth":
            raise ValueError(f"unknown environment mapping: {name}")
        src = "sea_floor_depth_below_sea_level"
        if src in (self.variables or []) \
                and "land_binary_mask" not in self.variables:
            self._derived["land_binary_mask"] = (
                (src,), lambda v, s=src: (v[s] <= 0).astype(jnp.float32))
            self.variables = list(self.variables) + ["land_binary_mask"]

    def expand_derived(self, want):
        """Split a request into (fetch list incl. sources, derived
        names); identity when the reader has no mappings."""
        if not getattr(self, "_derived", None):
            return list(want), []
        native = [v for v in want if v not in self._derived]
        derived = [v for v in want if v in self._derived]
        needed = dict.fromkeys(native)
        for v in derived:
            for s in self._derived[v][0]:
                needed.setdefault(s)
        return list(needed), derived

    def apply_derived(self, vals, derived):
        for v in derived:
            sources, fn = self._derived[v]
            vals[v] = fn(vals)
        return vals

    # ------------------------------------------------------------------ API
    def xy2lonlat(self, x, y):
        return self.crs.inv(np, np.asarray(x, float), np.asarray(y, float))

    def lonlat2xy(self, lon, lat):
        return self.crs.fwd(np, np.asarray(lon, float), np.asarray(lat, float))

    def covers_time(self, time):
        if self.always_valid or self.start_time is None:
            return True
        return self.start_time <= time <= self.end_time

    def covers_positions(self, lon, lat):
        """Host-side coverage check (seeding diagnostics)."""
        x, y = self.lonlat2xy(lon, lat)
        return np.asarray(self._covers_xy_host(x, y))

    def _covers_xy_host(self, x, y):
        ok = np.ones(np.shape(x), dtype=bool)
        if self.xmin is not None:
            # geographic grids: honour the file's longitude convention
            # (0..360 vs -180..180) before the range test
            if getattr(self.crs, "is_latlon", False):
                x = np.where(x > self.xmax, x - 360.0, x)
                x = np.where(x < self.xmin, x + 360.0, x)
            ok &= (x >= self.xmin) & (x <= self.xmax)
        if self.ymin is not None:
            ok &= (y >= self.ymin) & (y <= self.ymax)
        return ok

    def prepare(self, **kwargs):
        """Hook called at run start (reference structured.py:149)."""

    # ------------------------------------------------------- device protocol
    def device_state(self, window_start=None, window_end=None):
        """Return the pytree of arrays the sampler needs for this window."""
        return ()

    def sample(self, dev_state, varnames, t, lon, lat, z):
        """Device-side sampling (jnp, traceable).

        ``t``: float seconds relative to the run epoch (set via
        ``set_run_epoch``).  Returns ``({var: f32[N]}, covers: bool[N])``.
        """
        raise NotImplementedError

    def sample_profiles(self, dev_state, varnames, t, lon, lat, zlevels):
        """Sample variables at a fixed vector of z-levels for each element.

        Default: loop over levels through ``sample``.  Returns
        ``({var: f32[L, N]}, covers: bool[N])``.
        """
        outs = None
        covers = None
        for zi in range(zlevels.shape[0]):
            zvec = jnp.full_like(lon, zlevels[zi])
            vals, cov = self.sample(dev_state, varnames, t, lon, lat, zvec)
            if outs is None:
                outs = {v: [vals[v]] for v in varnames}
                covers = cov
            else:
                for v in varnames:
                    outs[v].append(vals[v])
        return {v: jnp.stack(outs[v]) for v in varnames}, covers

    def get_timeseries_at_position(self, lon, lat, variables=None,
                                   start_time=None, end_time=None,
                                   times=None, z=0.0):
        """Sample a time series of ``variables`` at one position — the
        standalone reader diagnostic (reference:
        readers/basereader/__init__.py:387-431).

        Returns ``{'time': [datetimes], var: np.ndarray[T], ...}``.  All
        times are sampled in one vmapped device call.
        """
        import jax

        if variables is None:
            variables = list(self.variables)
        variables = list(variables)
        if times is None:
            own = getattr(self, "times", None)
            if own:
                times = [t for t in own
                         if (start_time is None or t >= start_time)
                         and (end_time is None or t <= end_time)]
            else:
                t0 = start_time or self.start_time
                t1 = end_time or self.end_time
                if t0 is None or t1 is None:
                    raise ValueError(
                        "give explicit times for a reader without a "
                        "time axis")
                times = [t0 + i * (t1 - t0) / 19 for i in range(20)]
        if not times:
            raise ValueError("no times within the requested range")
        self.set_run_epoch(times[0])
        span = (times[-1] - times[0]).total_seconds()
        self.prepare(interval_seconds=span if span > 0 else None)
        dev = self.device_state(times[0], times[-1])
        trel = jnp.asarray([(t - times[0]).total_seconds() for t in times],
                           dtype=jnp.float32)
        lonv = jnp.asarray([lon], dtype=jnp.float32)
        latv = jnp.asarray([lat], dtype=jnp.float32)
        zv = jnp.asarray([z], dtype=jnp.float32)

        fetch, derived = self.expand_derived(variables)

        @jax.jit
        def run(ts):
            def one(t):
                vals, _ = self.sample(dev, fetch, t, lonv, latv, zv)
                if derived:
                    vals = self.apply_derived(vals, derived)
                return {v: vals[v][0] for v in variables}
            return jax.vmap(one)(ts)

        out = jax.device_get(run(trel))
        result = {"time": list(times)}
        for v in variables:
            result[v] = np.asarray(out[v])
        return result

    def sample_at(self, lon, lat, time, variables=None, z=0.0):
        """Host convenience: sample ``variables`` at arbitrary positions
        and one time; numpy in, numpy dict out.  The standalone-reader
        analogue of the reference's ``get_variables_interpolated``
        (reference basereader/variables.py:860-918); positions outside
        coverage return NaN."""
        import jax

        if variables is None:
            variables = list(self.variables)
        variables = list(variables)
        lon = np.atleast_1d(np.asarray(lon, dtype=np.float32)).ravel()
        lat = np.atleast_1d(np.asarray(lat, dtype=np.float32)).ravel()
        zv = np.broadcast_to(np.asarray(z, dtype=np.float32),
                             lon.shape).ravel()
        self.set_run_epoch(time)
        self.prepare()
        dev = self.device_state(time, time)
        fetch, derived = self.expand_derived(variables)

        @jax.jit
        def run(lonv, latv, zvv):
            vals, covers = self.sample(dev, fetch, jnp.float32(0.0),
                                       lonv, latv, zvv)
            if derived:
                vals = self.apply_derived(vals, derived)
            return {v: jnp.where(covers, vals[v], jnp.nan)
                    for v in variables}, covers
        out, covers = jax.device_get(
            run(jnp.asarray(lon), jnp.asarray(lat), jnp.asarray(zv)))
        return {v: np.asarray(out[v]) for v in variables}

    def set_run_epoch(self, epoch):
        """Record the run's t=0 (a datetime); samplers convert relative t."""
        self._run_epoch = epoch

    def _t_offset(self, reference_time):
        """Seconds from ``reference_time`` to the run epoch (python float,
        baked into the jitted kernel as a constant)."""
        if reference_time is None:
            return 0.0
        return (self._run_epoch - reference_time).total_seconds()

    # ------------------------------------------------------------- plumbing
    def rotate_vectors_sampled(self, values, varnames, gamma):
        """Rotate any known grid-x/y vector pairs in ``values`` to
        east/north by convergence angle ``gamma`` (radians)."""
        for xv, yv in VECTOR_PAIRS:
            if xv in varnames and yv in varnames:
                u, v = crslib.rotate_to_eastnorth(jnp, values[xv], values[yv],
                                                  gamma)
                values[xv] = u
                values[yv] = v
        return values

    # --------------------------------------------------- reader algebra
    # (reference operators/ops.py:9-92: Combine mixin on BaseReader)
    def __add__(self, other):
        from . import operators as _ops
        from numbers import Number
        if isinstance(other, Number):
            return _ops.ScaledReader(self, scale=1.0, offset=float(other))
        if isinstance(other, BaseReader):
            return _ops.combine_add(self, other)
        return NotImplemented

    def __radd__(self, other):
        return self.__add__(other)

    def __mul__(self, other):
        from . import operators as _ops
        from numbers import Number
        if isinstance(other, Number):
            return _ops.ScaledReader(self, scale=float(other))
        return NotImplemented

    def __rmul__(self, other):
        return self.__mul__(other)

    def __truediv__(self, other):
        from numbers import Number
        if isinstance(other, Number):
            return self.__mul__(1.0 / float(other))
        return NotImplemented

    def __sub__(self, other):
        from . import operators as _ops
        from numbers import Number
        if isinstance(other, Number):
            return _ops.ScaledReader(self, scale=1.0, offset=-float(other))
        if isinstance(other, BaseReader):
            return _ops.combine_sub(self, other)
        return NotImplemented

    def combine_gaussian(self, measurement_reader, std):
        """Blend a point observation into this background field with a
        gaussian weight of width ``std`` metres centred on the
        measurement reader's (lon, lat) (reference operators/ops.py:
        combine_gaussian)."""
        from . import operators as _ops
        return _ops.GaussianBlendReader(
            self, measurement_reader,
            lon0=measurement_reader.lon, lat0=measurement_reader.lat,
            radius_m=std)

    def plot(self, variable=None, time=None, vmin=None, vmax=None,
             filename=None, buffer=1.0):
        """Plot the reader's coverage outline, optionally with one
        variable's field sampled on its grid (reference
        basereader/__init__.py:240-330; cartopy land context is used by
        the simulation plots, this standalone view is plain
        matplotlib)."""
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        if self.xmin is not None and self.ymin is not None:
            xs = np.array([self.xmin, self.xmax, self.xmax, self.xmin,
                           self.xmin])
            ys = np.array([self.ymin, self.ymin, self.ymax, self.ymax,
                           self.ymin])
            blon, blat = self.xy2lonlat(xs, ys)
            ax.plot(blon, blat, "r-", lw=1.5, label="coverage")
        if variable is not None:
            import jax.numpy as jnp
            nx = ny = 80
            if self.xmin is not None:
                gx = np.linspace(self.xmin, self.xmax, nx)
                gy = np.linspace(self.ymin, self.ymax, ny)
                GX, GY = np.meshgrid(gx, gy)
                glon, glat = self.xy2lonlat(GX.ravel(), GY.ravel())
            else:
                raise ValueError("reader has no spatial extent to plot")
            t = time or getattr(self, "start_time", None)
            if getattr(self, "_run_epoch", None) is None:
                self.set_run_epoch(t or __import__("datetime")
                                   .datetime(2000, 1, 1))
            self.prepare()
            dev = self.device_state()
            trel = 0.0 if t is None else (
                t - self._run_epoch).total_seconds()
            vals, covers = self.sample(
                dev, [variable], jnp.float32(trel),
                jnp.asarray(glon, jnp.float32),
                jnp.asarray(glat, jnp.float32),
                jnp.zeros(len(glon), jnp.float32))
            field = np.asarray(vals[variable]).reshape(ny, nx)
            field = np.where(np.asarray(covers).reshape(ny, nx),
                             field, np.nan)
            m = ax.pcolormesh(np.asarray(glon).reshape(ny, nx),
                              np.asarray(glat).reshape(ny, nx), field,
                              vmin=vmin, vmax=vmax, shading="auto")
            fig.colorbar(m, ax=ax, label=variable)
        ax.set_xlabel("Longitude")
        ax.set_ylabel("Latitude")
        ax.set_title(self.name)
        if filename:
            fig.savefig(filename, dpi=100)
            plt.close(fig)
        else:
            return fig

    def __repr__(self):
        s = f"Reader: {self.name}\n  variables: {self.variables}\n"
        s += f"  proj4: {self.proj4}\n"
        if self.xmin is not None:
            s += f"  x: {self.xmin} .. {self.xmax}\n"
        if self.ymin is not None:
            s += f"  y: {self.ymin} .. {self.ymax}\n"
        if self.start_time is not None:
            s += f"  time: {self.start_time} .. {self.end_time}\n"
        return s


class ContinuousReader(BaseReader):
    """Analytic / point-source readers: defined everywhere in their domain,
    at any time, no blocks (reference: basereader/continuous.py:8-46)."""

    always_valid = True
