"""Walker-ensemble sharding over a TPU device mesh.

The natural parallel axis of this workload is the walker ensemble
(SURVEY.md section 2, "parallelism inventory"): each ensemble half-step
evaluates the posterior independently per walker, so we shard the walker
axis of positions / log-probabilities / per-walker images over a 1-D
mesh.  The only cross-device dependency is the stretch move's partner
gather from the complementary half-ensemble — positions are a tiny
(nwalkers, dim) array, so XLA lowers the gather to one small all-gather
over ICI per half-step while the expensive batched renders and FFTs stay
fully sharded.  Posterior-image accumulators reduce over walkers
(``psum`` inserted by XLA at the accumulation step).

Usage::

    mesh = walker_mesh()                    # all global devices
    sharding = walker_sharding(mesh)
    sampler = EnsembleSampler(..., sharding=sharding)

or pass ``mesh=`` to ``model_galaxy_mcmc``.

Multi-slice (DCN) note: a flat 1-D walker mesh is the right layout even
when the global devices span DCN-connected slices.  The only
communication is (a) the per-half-step partner gather of positions —
``nwalkers x dim x 4`` bytes, kilobytes even at 8k walkers, so DCN
latency is amortized by the milliseconds of batched render+conv compute
per half-step — and (b) the posterior-image accumulator reduction,
~0.3 MB once per retained step.  Neither is bandwidth-bound, so there
is nothing for a hierarchical ICI-inner/DCN-outer mesh to save; the
heavy data (per-walker images) never leaves its shard.  Host-side IO
gating for multi-process runs lives in ``parallel.multihost``.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "walker_mesh",
    "walker_sharding",
    "shard_walkers",
    "pad_walkers_to_mesh",
]

WALKER_AXIS = "walkers"


def walker_mesh(devices=None):
    """1-D mesh over all (or the given) devices, axis name 'walkers'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (WALKER_AXIS,))


def walker_sharding(mesh: Mesh) -> NamedSharding:
    """NamedSharding that splits the leading (walker) axis over the mesh."""
    return NamedSharding(mesh, PartitionSpec(WALKER_AXIS))


def shard_walkers(arr, mesh: Mesh):
    """Place an array with leading walker axis onto the mesh.

    Multi-process-safe: on a multi-host mesh each process contributes
    its addressable shards (see parallel.multihost.put_sharded).
    """
    from .multihost import put_sharded

    return put_sharded(arr, walker_sharding(mesh))


def pad_walkers_to_mesh(nwalkers: int, mesh: Mesh) -> int:
    """Smallest even walker count >= nwalkers divisible by 2*mesh size.

    Half-ensemble updates split the ensemble in two; each half must
    shard evenly over the mesh.
    """
    ndev = mesh.devices.size
    quantum = 2 * ndev
    return int(np.ceil(nwalkers / quantum) * quantum)
