"""Environment orchestration: reader registry, priority lists, fallbacks.

Re-implements the contract of the reference ``Environment``
(reference: opendrift/models/basemodel/environment.py:20-923) with the
control flow *compiled into the step kernel*: the priority-ordered reader
chain becomes a static sequence of sampler calls merged with ``jnp.where``
on per-variable missing masks, and scalar fallbacks terminate each chain.
Host-side responsibilities that remain: registry/priority bookkeeping,
reader relevance checks, failure quarantine
(environment.py:656-674), and building per-window device states.
"""

import logging
from collections import OrderedDict

import numpy as np
import jax.numpy as jnp

from ..errors import VariableNotCoveredError
from .analytic import ConstantReader

logger = logging.getLogger(__name__)


class Environment:
    def __init__(self, required_variables, max_reader_fails=1):
        self.required_variables = required_variables
        self.readers = OrderedDict()
        self.priority_list = OrderedDict()
        self.max_reader_fails = max_reader_fails
        self.reader_fail_count = {}
        self.discarded_readers = {}
        self.fallback_values = {}
        self.uncertainty = []
        self._plan = None

    # ------------------------------------------------------------- registry
    def add_reader(self, readers, variables=None, first=False):
        if not isinstance(readers, (list, tuple)):
            readers = [readers]
        for reader in readers:
            name = reader.name
            base = name
            suffix = 0
            while name in self.readers \
                    and self.readers[name] is not reader:
                suffix += 1
                name = f"{base}_{suffix}"
            reader.name = name
            self.readers[name] = reader
            for var in reader.variables:
                if variables is not None and var not in variables:
                    continue
                chain = self.priority_list.setdefault(var, [])
                if name not in chain:
                    if first:
                        chain.insert(0, name)
                    else:
                        chain.append(name)

    def set_fallback(self, variable, value):
        self.fallback_values[variable] = value

    # ------------------------------------------------------------- finalize
    def finalize(self, run_epoch, required_profiles=(), constant_overrides=(),
                 fallback_overrides=None):
        """Resolve the sampling plan before a run.

        ``constant_overrides``: {var: value} from ``environment:constant:*``
        configs — inserted as a top-priority constant reader (reference
        environment.py:172-196).  ``fallback_overrides``: {var: value} from
        ``environment:fallback:*`` configs.
        """
        if constant_overrides:
            cr = ConstantReader(dict(constant_overrides),
                                name="constant_overrides")
            self.add_reader(cr, first=True)
        if fallback_overrides:
            for var, val in fallback_overrides.items():
                if val is not None:
                    self.fallback_values[var] = val
        # default fallbacks from the model's required_variables spec
        for var, spec in self.required_variables.items():
            if var not in self.fallback_values and "fallback" in spec:
                self.fallback_values[var] = spec["fallback"]

        # build plan: ordered (reader, [vars it serves]) honouring priorities
        plan = []
        for reader_name, reader in self.readers.items():
            served = [v for v in reader.variables
                      if v in self.required_variables]
            if served:
                plan.append((reader, served))
            reader.set_run_epoch(run_epoch)
        self._plan = plan

        # coverage check: every required var needs a reader or a fallback
        missing = [v for v in self.required_variables
                   if not self.priority_list.get(v)
                   and self.fallback_values.get(v, None) is None
                   and "fallback" not in self.required_variables[v]]
        if missing:
            raise VariableNotCoveredError(
                f"Missing required environment variables with no fallback: "
                f"{missing}")
        self.required_profiles = list(required_profiles)

    def prepare_readers(self, extent=None, start_time=None, end_time=None,
                        max_speed=None, interval_seconds=None,
                        truncate_depth=None, pair_hint=None):
        """Give every reader its run context: simulation extent (for halo
        subsetting), time range and per-interval window length (reference:
        ``reader.prepare`` at basemodel/__init__.py:2064 ->
        structured.py:149).  ``truncate_depth``: read forcing only down to
        this depth and extrapolate below (reference
        environment.py:554-562, config
        drift:truncate_ocean_model_below_m)."""
        for reader in self.readers.values():
            # always (re)assign so a reader reused by a later run without
            # the config does not keep a stale truncation
            reader.truncate_depth = (float(truncate_depth)
                                     if truncate_depth is not None
                                     else None)
            # row-pairing tier for the packed layout (grid.py): 'xy'
            # for multi-fetch advection, 'x' for single-fetch
            reader.pair_hint = pair_hint
            try:
                reader.prepare(extent=extent, start_time=start_time,
                               end_time=end_time, max_speed=max_speed,
                               interval_seconds=interval_seconds,
                               variables=list(self.required_variables))
            except TypeError:
                reader.prepare(extent=extent, start_time=start_time,
                               end_time=end_time, max_speed=max_speed)

    # ----------------------------------------------------- window device IO
    def prefetch_device_states(self, window_start, window_end):
        """Start assembling the next window's device states on a worker
        thread, overlapping forcing I/O + packing with device compute
        (the async double-buffer the reference lists as the multi-host
        scaling need, SURVEY.md §7 'host I/O throughput')."""
        import threading
        result = {}

        def work():
            try:
                result["states"] = self._build_device_states_now(
                    window_start, window_end)
            except Exception as e:  # noqa: BLE001
                result["error"] = e
        th = threading.Thread(target=work, daemon=True)
        th.start()
        self._prefetch = (window_start, window_end, th, result)

    def build_device_states(self, window_start=None, window_end=None):
        pf = getattr(self, "_prefetch", None)
        if pf is not None and pf[0] == window_start and pf[1] == window_end:
            self._prefetch = None
            pf[2].join()
            if "states" in pf[3]:
                return pf[3]["states"]
            logger.warning("Prefetch failed (%s); rebuilding synchronously",
                           pf[3].get("error"))
        return self._build_device_states_now(window_start, window_end)

    def _build_device_states_now(self, window_start=None, window_end=None):
        """Collect per-reader device pytrees for a time window, applying the
        failure-quarantine policy (reference environment.py:656-674)."""
        states = []
        for reader, served in self._plan:
            if reader.name in self.discarded_readers:
                states.append(None)
                continue
            try:
                states.append(reader.device_state(window_start, window_end))
            except Exception as e:  # noqa: BLE001 — any reader error counts
                n = self.reader_fail_count.get(reader.name, 0) + 1
                self.reader_fail_count[reader.name] = n
                if n >= self.max_reader_fails:
                    logger.warning(
                        "Reader %s failed %d time(s) — discarding: %s",
                        reader.name, n, e)
                    self.discarded_readers[reader.name] = str(e)
                states.append(None)
        return tuple(states)

    # ------------------------------------------------------ device sampling
    def has_reader_for(self, variable):
        """True when some active reader (not just a fallback value)
        serves ``variable`` — i.e. the field has spatial structure."""
        for reader, served in (self._plan or []):
            if reader.name in self.discarded_readers:
                continue
            if variable in served and \
                    reader.name in self.priority_list.get(variable, []):
                return True
        return False

    def get_environment(self, dev_states, varnames, t, lon, lat, z,
                        key=None, member=None, block_ctx=None):
        """The fused on-device equivalent of reference
        ``Environment.get_environment`` (environment.py:499-923).

        ``key``: optional PRNG key enabling the configured current/wind
        uncertainty injection (reference environment.py:865-891) — each
        fetch (including RK stage refetches) draws fresh noise, like the
        reference.  Returns (env dict var->f32[N], missing var->bool[N]).

        ``block_ctx``: optional (plan_idx, corner_block, covers0) — that
        reader's variables are evaluated from the pre-gathered corner
        block instead of fresh row gathers (single-fetch RK shares the
        same 4 gathers between the env fetch and every stage).
        """
        varnames = list(varnames)
        nanval = jnp.full_like(lon, jnp.nan)
        env = {v: nanval for v in varnames}
        missing = {v: jnp.ones_like(lon, dtype=bool) for v in varnames}

        for i, ((reader, served), dev_state) in enumerate(
                zip(self._plan, dev_states)):
            if reader.name in self.discarded_readers:
                continue
            want = [v for v in served if v in varnames
                    and reader.name in self.priority_list.get(v, [])]
            if not want:
                continue
            # derived mappings (speed/direction <-> components): fetch
            # the source variables, evaluate the mapping on device
            fetch, derived = reader.expand_derived(want)
            if block_ctx is not None and i == block_ctx[0]:
                vals, covers = reader.sample_from_block(
                    dev_state, block_ctx[1], t, lon, lat, fetch)
                covers = covers & block_ctx[2]
            elif member is not None and (
                    getattr(reader, "ensemble_size", 1) > 1
                    or getattr(reader, "needs_ids", False)):
                vals, covers = reader.sample(dev_state, fetch, t, lon,
                                             lat, z, member=member)
            else:
                vals, covers = reader.sample(dev_state, fetch, t, lon,
                                             lat, z)
            if derived:
                vals = reader.apply_derived(vals, derived)
            for v in want:
                good = missing[v] & covers & jnp.isfinite(vals[v])
                env[v] = jnp.where(good, vals[v], env[v])
                missing[v] = missing[v] & ~good

        for v in varnames:
            fb = self.fallback_values.get(v, None)
            if fb is not None:
                env[v] = jnp.where(missing[v], fb, env[v])
                missing[v] = jnp.zeros_like(missing[v])

        # Kelvin -> Celsius sanity (reference environment.py:829)
        if "sea_water_temperature" in env:
            T = env["sea_water_temperature"]
            env["sea_water_temperature"] = jnp.where(T > 100.0, T - 273.15, T)

        # current/wind uncertainty injection (reference :865-891)
        unc = getattr(self, "uncertainty", None)
        if key is not None and unc:
            import jax
            for i, (pair, std, uniform) in enumerate(unc):
                sub = jax.random.fold_in(key, i)
                for j, var in enumerate(pair):
                    if var not in env:
                        continue
                    k2 = jax.random.fold_in(sub, j)
                    if uniform:
                        noise = jax.random.uniform(
                            k2, lon.shape, minval=-std, maxval=std)
                    else:
                        noise = std * jax.random.normal(k2, lon.shape)
                    env[var] = env[var] + noise
        return env, missing

    def get_variables_along_trajectory(self, variables, lons, lats, times,
                                       z=0.0):
        """Sample environment variables at a sequence of (time, position)
        observations — the input builder for wind-drift-factor calibration
        (reference: environment.py:925-941, used by physics_methods.py:28).

        Requires ``finalize()`` to have been called.  Returns
        ``{'time': [...], var: np.ndarray[N], ...}``.
        """
        import jax
        import numpy as np

        if not getattr(self, "_plan", None):
            raise RuntimeError(
                "Environment not finalized — call finalize() first")
        variables = list(variables)
        epoch = times[0]
        for reader, _ in self._plan:
            reader.set_run_epoch(epoch)
        span = (times[-1] - times[0]).total_seconds()
        self.prepare_readers(interval_seconds=span if span > 0 else None)
        dev_states = self.build_device_states(times[0], times[-1])
        trel = jnp.asarray([(t - epoch).total_seconds() for t in times],
                           dtype=jnp.float32)
        lonv = jnp.asarray(lons, dtype=jnp.float32)
        latv = jnp.asarray(lats, dtype=jnp.float32)
        zv = jnp.full_like(lonv, z)

        @jax.jit
        def run(ts, lo, la, zz):
            def one(t, lo1, la1, z1):
                env, _ = self.get_environment(
                    dev_states, variables, t, lo1[None], la1[None],
                    z1[None])
                return {v: env[v][0] for v in variables}
            return jax.vmap(one)(ts, lo, la, zz)

        out = jax.device_get(run(trel, lonv, latv, zv))
        result = {"time": list(times)}
        for v in variables:
            result[v] = np.asarray(out[v])
        return result

    def uv_block_plan_index(self):
        """Plan index of the single top-priority reader serving BOTH
        current components through packed rows — the precondition for
        single-fetch RK (drift:advection_single_fetch).  None when the
        configuration doesn't qualify (multiple current sources, or a
        reader type without packed u/v)."""
        names = ("x_sea_water_velocity", "y_sea_water_velocity")
        tops = [self.priority_list.get(v, [None])[0] for v in names]
        if tops[0] is None or tops[0] != tops[1]:
            return None
        for i, (reader, served) in enumerate(self._plan or []):
            if reader.name == tops[0]:
                if getattr(reader, "supports_uv_block", lambda: False)():
                    return i
                return None
        return None

    def get_profiles(self, dev_states, varnames, t, lon, lat, zlevels):
        """Sample profile variables at fixed z-levels: ({var: f32[L, N]})."""
        varnames = list(varnames)
        L = zlevels.shape[0]
        nanval = jnp.full((L,) + lon.shape, jnp.nan, dtype=lon.dtype)
        env = {v: nanval for v in varnames}
        missing = {v: jnp.ones_like(lon, dtype=bool) for v in varnames}
        for (reader, served), dev_state in zip(self._plan, dev_states):
            if reader.name in self.discarded_readers:
                continue
            want = [v for v in served if v in varnames]
            if not want:
                continue
            vals, covers = reader.sample_profiles(dev_state, want, t, lon,
                                                  lat, zlevels)
            for v in want:
                good = missing[v] & covers
                env[v] = jnp.where(good[None, :], vals[v], env[v])
                missing[v] = missing[v] & ~good
        for v in varnames:
            fb = self.fallback_values.get(v, None)
            if fb is not None:
                env[v] = jnp.where(missing[v][None, :], fb, env[v])
        return env
