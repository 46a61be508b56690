"""Multi-chip execution: particle sharding over a device mesh.

The scaling design (SURVEY.md §2.10/§7): particles are sharded uniformly
over a 1D ``dp`` mesh axis — a Lagrangian step is element-wise per
particle, so with forcing blocks replicated the jitted step partitions
with **zero collectives** (XLA inserts none; counter-based threefry RNG is
partitionable).  Forcing-field domain decomposition with halo exchange and
particle migration lives in ``parallel/domain.py`` and composes on top for
grids too large to replicate.

Used automatically by ``run()`` when more than one device is visible, or
explicitly via ``simulation.set_mesh(...)``.
"""

import logging

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def particle_mesh(devices=None):
    """A 1D mesh over all (or the given) devices, axis name 'dp'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), axis_names=("dp",))


def pad_to_multiple(n, k):
    return ((n + k - 1) // k) * k


def shard_state(state, mesh):
    """Place every per-element array of the state pytree on the mesh,
    sharded along the particle axis (last-dim for (C, N) matrices).
    On a multi-process mesh each host uploads only its shards (the host
    state is identical everywhere — seeding is deterministic host code)."""
    from . import multihost

    def spec_for(x):
        if x.ndim == 1:
            return NamedSharding(mesh, P("dp"))
        # component matrices (C, N): shard the particle axis
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["dp"])))
    if multihost.is_multihost():
        return jax.tree_util.tree_map(
            lambda x: multihost.make_global(np.asarray(x), spec_for(x)),
            state)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec_for(x)), state)


def replicate(tree, mesh):
    from . import multihost
    repl = NamedSharding(mesh, P())
    if multihost.is_multihost():
        return jax.tree_util.tree_map(
            lambda x: multihost.make_global(np.asarray(x), repl), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)
