"""Multi-process (multi-host) execution support.

The reference is single-process with explicitly broken parallelism
("FIXME: can't use threads=n right now", reference fitting.py:55).
This framework's distributed design (SURVEY.md §5) shards the walker
ensemble over a global device mesh; on a multi-host TPU slice every
host runs the same program over its addressable shard of that mesh.
Three things must then be host-aware:

* **array placement** — ``jax.device_put`` cannot place a host array
  onto a sharding that spans non-addressable devices; each process must
  contribute its local shards (``jax.make_array_from_callback``).  All
  hosts hold identical host-side inputs (same seed, same model file),
  so the callback just slices the full array.
* **device→host fetch** — ``np.asarray`` on a non-fully-addressable
  array raises; the array must first be replicated (one all-gather over
  ICI/DCN) and the local replica read.
* **output IO** — the trace database, checkpoints, posterior images and
  progress lines must be written by **exactly one** process ("DB writes
  from host 0 only", SURVEY.md §5); every host computes, host 0 reports.

All helpers degrade to their trivial single-process forms, so the rest
of the package calls them unconditionally.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

__all__ = [
    "process_index",
    "process_count",
    "is_primary",
    "put_sharded",
    "put_replicated",
    "fetch",
    "barrier",
]


def barrier(name: str = "psfmc_barrier") -> None:
    """Block until every process reaches this point (no-op single-process).

    Used after primary-host file writes so no process can race ahead
    and observe a missing/partial trace database (e.g. a driver call
    immediately following a fit, whose resume logic branches on the DB
    file's existence — divergent control flow across hosts deadlocks
    the next collective).
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process responsible for all file/console output."""
    return jax.process_index() == 0


def _spans_processes(sharding) -> bool:
    """Does this sharding include devices this process cannot address?"""
    if sharding is None:
        return False
    try:
        return not sharding.is_fully_addressable
    except AttributeError:  # pragma: no cover - older jax
        return jax.process_count() > 1


def put_sharded(arr, sharding):
    """Place a host array onto a (possibly multi-process) sharding.

    Single-process: plain ``device_put``.  Multi-process: every host
    must hold the identical full ``arr`` (deterministic seeded init
    guarantees this); each contributes the shards it can address.
    """
    if not _spans_processes(sharding):
        return jax.device_put(arr, sharding)
    host = np.asarray(arr)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def put_replicated(x, mesh):
    """Place a host array fully replicated over a (global) mesh."""
    return put_sharded(np.asarray(x), NamedSharding(mesh, PartitionSpec()))


# jitted identity-with-replicated-output programs, one per mesh
_replicators: dict = {}


def _replicate(x):
    """All-gather a sharded global array into a fully replicated one."""
    mesh = x.sharding.mesh
    key = (id(mesh), x.ndim)
    fn = _replicators.get(key)
    if fn is None:
        fn = jax.jit(
            lambda a: a,
            out_shardings=NamedSharding(mesh, PartitionSpec()),
        )
        _replicators[key] = fn
    return fn(x)


def fetch(x, dtype=None):
    """Multi-process-safe ``np.asarray`` for device (or host) arrays.

    A fully addressable array (always the case single-process) is read
    directly.  A global array sharded over a multi-process mesh is
    replicated first (one collective) and the local replica read — every
    process receives the full value, so downstream host logic (progress,
    convergence checks, checkpoint payloads) stays identical on all
    hosts and only the primary's copy reaches disk.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        x = _replicate(x)
        x = x.addressable_data(0)
    out = np.asarray(x)
    return out if dtype is None else out.astype(dtype, copy=False)
