"""Element (particle) schema and device state.

The reference's ``LagrangianArray`` (reference: opendrift/elements/elements.py:22)
is a struct-of-arrays container that grows/shrinks as elements are seeded and
deactivated (``extend``/``move_elements``).  On TPU, dynamic shapes defeat
compilation, so the design splits in two:

* ``LagrangianArray`` here is a pure *schema*: an ordered ``variables`` dict
  of per-element variable specs (dtype/units/default/seed metadata), with the
  same ``add_variables`` class-composition mechanism models use in the
  reference (elements.py:168).  Models declare element types exactly as they
  do upstream.

* ``ElementState`` is the runtime state: a fixed-capacity pytree of device
  arrays (one per variable) plus a ``status`` code array.  Deactivation is a
  status flip, never a compaction; release is ``release_time <= t``
  (reproducing ``release_elements``, basemodel/__init__.py:909-934).  The
  pytree registers with JAX so the whole state threads through ``lax.scan``.
"""

from collections import OrderedDict

import numpy as np
import jax

# Status codes.  The reference grows a ``status_categories`` list dynamically;
# fixed codes keep the device side static.  0 = active, negatives = not yet
# in the simulation, positives = deactivated (terminal).
NOT_RELEASED = -1
ACTIVE = 0
# Deactivation reasons get codes >= 1, registered per-simulation (see
# ``Simulation.register_status``); these are the standard ones:
STANDARD_STATUS_CATEGORIES = [
    "active",          # 0
    "stranded",        # 1
    "retired",         # 2
    "outside",         # 3  (left simulation extent / invalid position)
    "missing_data",    # 4
    "seafloor",        # 5
    "died",            # 6  (biological models)
    "evaporated",      # 7  (oil)
    "dispersed",       # 8  (oil)
    "melted",          # 9  (icebergs)
    "grounded",        # 10 (icebergs)
    "hatched",         # 11 (eggs -> larvae transition marker)
    "sedimented",      # 12 (chemical/radionuclide/sediment burial)
]


class LagrangianArray:
    """Schema base class for element types.

    ``variables`` maps variable name -> spec dict with keys:
    ``dtype`` (numpy dtype), ``units``, ``default`` (scalar), ``seed``
    (bool: user-seedable), ``standard_name``, ``description``,
    ``profiles`` etc.  Mirrors reference elements.py:53-95.
    """

    variables = OrderedDict([
        ("ID", {"dtype": np.int32, "units": "1", "seed": False, "default": 0}),
        ("status", {"dtype": np.int32, "units": "1", "seed": False,
                    "default": NOT_RELEASED}),
        ("moving", {"dtype": np.float32, "units": "1", "seed": False,
                    "default": 1.0}),
        ("age_seconds", {"dtype": np.float32, "units": "s", "default": 0.0}),
        ("origin_marker", {"dtype": np.int32, "units": "1", "default": 0,
                           "description": "An integer kept constant over the "
                           "life of an element, to identify different seedings"}),
        ("lon", {"dtype": np.float32, "units": "degrees_east",
                 "standard_name": "longitude", "default": 0.0}),
        ("lat", {"dtype": np.float32, "units": "degrees_north",
                 "standard_name": "latitude", "default": 0.0}),
        ("z", {"dtype": np.float32, "units": "m", "standard_name": "depth",
               "default": 0.0, "description":
               "Depth below sea level (negative downward)"}),
    ])

    @classmethod
    def add_variables(cls, new_variables):
        """Compose a new ``variables`` OrderedDict = parent's + extras.

        Same contract as reference elements.py:168: called in a subclass body
        as ``variables = ParentType.add_variables([...])``.
        """
        variables = OrderedDict(cls.variables)
        if isinstance(new_variables, dict):
            items = new_variables.items()
        else:
            items = new_variables
        for name, spec in items:
            variables[name] = dict(spec)
        return variables

    @classmethod
    def seedable_variables(cls):
        return [n for n, s in cls.variables.items() if s.get("seed", True)]

    @classmethod
    def default(cls, name):
        return cls.variables[name].get("default", 0.0)


class PassiveTracer(LagrangianArray):
    """Trivial element (reference: opendrift/elements/passivetracer.py)."""
    variables = LagrangianArray.variables


@jax.tree_util.register_pytree_node_class
class ElementState:
    """Fixed-capacity struct-of-arrays particle state (a JAX pytree).

    ``data`` maps variable name -> array of shape (capacity,).  Extra
    bookkeeping arrays not in the element schema:

    * ``release_time`` — seconds (relative to run start) when the element
      enters the simulation; for backward runs the comparison flips.
    * ``lift_to_seafloor`` handling etc. live in model code, not here.

    Masks: ``active`` = status == ACTIVE; ``released`` = status >= ACTIVE.
    """

    def __init__(self, data):
        self.data = data

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        keys = tuple(sorted(self.data.keys()))
        return tuple(self.data[k] for k in keys), keys

    @classmethod
    def tree_unflatten(cls, keys, children):
        return cls(dict(zip(keys, children)))

    # -- convenience -------------------------------------------------------
    def __getattr__(self, name):
        data = object.__getattribute__(self, "data")
        if name in data:
            return data[name]
        raise AttributeError(name)

    def __getitem__(self, name):
        return self.data[name]

    def replace(self, **updates):
        new = dict(self.data)
        new.update(updates)
        return ElementState(new)

    @property
    def capacity(self):
        return self.data["lon"].shape[0]

    @property
    def active(self):
        return self.data["status"] == ACTIVE

    @property
    def released(self):
        return self.data["status"] >= ACTIVE

    def num_active(self):
        return int(np.asarray(self.active).sum())

    @classmethod
    def from_numpy(cls, arrays):
        """Build from a dict of host numpy arrays (run() does the transfer)."""
        return cls({k: np.asarray(v) for k, v in arrays.items()})
