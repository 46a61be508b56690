"""Multi-host scaffolding: ``jax.distributed`` entry path, per-host
shard construction, and host-gather helpers.

The reference is single-process (SURVEY.md §2.10; its documented scaling
story is geographic process-splitting, reference
docs/source/performance.rst "Quasi-parallelisation").  Here the scaling
axes are JAX-native instead: one process per host, each owning a slice
of the global device mesh; collectives ride ICI within a slice and DCN
between slices.  This module provides the pieces every multi-host run
needs:

* :func:`initialize` — the ``jax.distributed.initialize()`` entry path,
  env-var driven (``OPENDRIFT_COORDINATOR`` / ``OPENDRIFT_NUM_PROCESSES``
  / ``OPENDRIFT_PROCESS_ID``), with CPU-backend collectives (gloo)
  selected automatically so the same code path is testable as N
  processes x M virtual CPU devices on one machine (see
  tools/multihost_dryrun.py).
* :func:`make_global` / :func:`put_replicated` — build global arrays
  where each process materializes **only its addressable shards**; with
  a callable source this is a true per-host shard read (each host
  touches only its rows of the forcing file).
* :func:`gather` — bring a sharded array back to every host (jit
  identity to a fully-replicated layout, then ``device_get``).  O(global
  size) per host: right for small snapshots, wrong at the 10M x N-host
  scale — there, use ``export:sharded`` output, which goes through
  :func:`local_rows` (O(local) per host) + tools/concat_shards.py.

Everything degrades to a no-op on a single process, so engine code calls
these helpers unconditionally.
"""

import logging
import os
import weakref

import numpy as np

logger = logging.getLogger(__name__)

# keyed on the Mesh object itself (weakly, so a dead Mesh cannot alias a
# new one through id() reuse and serve a stale out_sharding)
_gather_cache = weakref.WeakKeyDictionary()


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, local_device_count=None,
               cpu_collectives="gloo"):
    """Initialise the JAX distributed runtime for a multi-host run.

    Arguments default from the environment (``OPENDRIFT_COORDINATOR``,
    ``OPENDRIFT_NUM_PROCESSES``, ``OPENDRIFT_PROCESS_ID``); on real TPU
    pods all three may be omitted entirely and JAX autodetects the
    topology.  Safe to call on a single process (returns without
    initialising) and idempotent.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "OPENDRIFT_COORDINATOR")
    if num_processes is None and "OPENDRIFT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["OPENDRIFT_NUM_PROCESSES"])
    if process_id is None and "OPENDRIFT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["OPENDRIFT_PROCESS_ID"])
    if num_processes in (None, 1) and coordinator_address is None:
        logger.debug("multihost.initialize: single process, nothing to do")
        return

    # The image's sitecustomize may pin the platform; honour an explicit
    # JAX_PLATFORMS (the virtual-CPU dryrun path) before backend init.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)
    if (env_platforms or "").startswith("cpu"):
        # cross-process collectives on the CPU backend need an explicit
        # implementation; gloo is bundled with jaxlib
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
        if local_device_count is None:
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + " --xla_force_host_platform_device_count="
                    f"{max(os.cpu_count() or 1, 1)}")
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{local_device_count}")

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    jax.config.update("jax_threefry_partitionable", True)
    logger.info("multihost: process %d/%d, %d local of %d global devices",
                jax.process_index(), jax.process_count(),
                len(jax.local_devices()), len(jax.devices()))


def process_count():
    import jax
    return jax.process_count()


def process_index():
    import jax
    return jax.process_index()


def is_primary():
    """True on the process that owns host-side side effects (output
    files, log summaries)."""
    return process_index() == 0


def is_multihost():
    return process_count() > 1


def global_mesh(axis_name="dp"):
    """1D mesh over ALL global devices (every process must build it)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), axis_names=(axis_name,))


def make_global(source, sharding, global_shape=None, dtype=None):
    """Build a global jax.Array, materializing only this process's
    addressable shards.

    ``source`` is either a host array identical on every process (it is
    sliced per shard — each host uploads only its part), or a callable
    ``source(index_tuple) -> np.ndarray`` invoked once per addressable
    shard — the per-host shard *read* used for forcing fields (each host
    reads only its rows from the file).
    """
    import jax

    if callable(source):
        assert global_shape is not None, \
            "make_global(callable) needs global_shape"
        return jax.make_array_from_callback(
            tuple(global_shape), sharding, source)
    arr = np.asarray(source, dtype=dtype)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def put_replicated(tree, mesh):
    """Replicate a host pytree onto every device of a (possibly
    multi-process) mesh.  All processes must pass identical values."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: make_global(np.asarray(x), sharding), tree)


def put_sharded(tree, sharding):
    """Shard a host pytree (identical on all processes) over the leading
    axis; each process uploads only its addressable shards."""
    import jax
    return jax.tree_util.tree_map(
        lambda x: make_global(x, sharding), tree)


def ensure_global(tree, mesh):
    """Make every leaf of a pytree a global array on the mesh: leaves
    that already span the mesh (non-fully-addressable) pass through;
    host/local leaves are replicated (identical on all processes).
    No-op on a single process."""
    import jax

    if not is_multihost():
        return tree
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())

    def fix(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x                     # already global
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            data = make_global(np.asarray(jax.random.key_data(x)), repl)
            return jax.random.wrap_key_data(
                data, impl=jax.random.key_impl(x))
        return make_global(np.asarray(x), repl)
    return jax.tree_util.tree_map(fix, tree)


def gather(tree, mesh):
    """Return host numpy copies of a (possibly cross-process) sharded
    pytree: jit identity into a fully-replicated layout, device_get.
    On one process this is just ``jax.device_get``."""
    import jax

    if not is_multihost():
        return jax.device_get(tree)
    from jax.sharding import NamedSharding, PartitionSpec as P
    fn = _gather_cache.get(mesh)
    if fn is None:
        fn = jax.jit(lambda x: x,
                     out_shardings=NamedSharding(mesh, P()))
        _gather_cache[mesh] = fn
    return jax.device_get(jax.tree_util.tree_map(
        lambda x: fn(x) if hasattr(x, "sharding") else x, tree))


def sync(name="barrier"):
    """Cross-process barrier (no-op single-process)."""
    if not is_multihost():
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def _local_unique_rows(x):
    """(indices, data) of the unique global rows addressable locally."""
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    idx = np.concatenate([
        np.arange(s.index[0].start or 0,
                  s.index[0].stop if s.index[0].stop is not None
                  else (s.index[0].start or 0) + s.data.shape[0])
        for s in shards])
    data = np.concatenate([np.asarray(s.data) for s in shards])
    uniq, first = np.unique(idx, return_index=True)
    return uniq, data[first]


def local_rows(tree):
    """Per-process LOCAL rows of a pytree of per-element arrays —
    the sharded-output counterpart of :func:`gather`: O(local), each
    process touches only the slots its devices own.

    The reference slot set comes from the most finely sharded leaf;
    replicated leaves (every row addressable, e.g. env variables
    computed outside the shard_map) are subset to those same slots so
    every array in the result has identical row order.

    Returns (local_tree, global_offsets)."""
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "addressable_shards")
              and getattr(x, "ndim", 0) >= 1]
    offsets = None
    for x in leaves:
        idx, _ = _local_unique_rows(x)
        if offsets is None or idx.size < offsets.size:
            offsets = idx
    if offsets is None:        # host arrays only (single process)
        return jax.tree_util.tree_map(np.asarray, tree), None

    def pick(x):
        if not hasattr(x, "addressable_shards"):
            arr = np.asarray(x)
            return arr[offsets] if arr.ndim >= 1 \
                and arr.shape[0] > offsets.size else arr
        idx, data = _local_unique_rows(x)
        if idx.size == offsets.size:
            return data
        pos = np.searchsorted(idx, offsets)
        return data[pos]

    return jax.tree_util.tree_map(pick, tree), offsets
