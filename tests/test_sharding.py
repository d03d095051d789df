"""Walker-ensemble sharding over a virtual 8-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from psfmc_tpu.parallel.mesh import (
    pad_walkers_to_mesh,
    shard_walkers,
    walker_mesh,
    walker_sharding,
)
from psfmc_tpu.sampler.ensemble import EnsembleSampler
from tests.test_sampler import GaussianPosterior


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


def test_pad_walkers():
    mesh = walker_mesh()
    assert pad_walkers_to_mesh(30, mesh) == 32
    assert pad_walkers_to_mesh(32, mesh) == 32
    assert pad_walkers_to_mesh(33, mesh) == 48


def test_sharded_sampler_runs_and_matches_unsharded():
    post = GaussianPosterior()
    nwalkers, dim = 32, 3
    rng = np.random.RandomState(0)
    p0 = rng.randn(nwalkers, dim) * 0.1 + np.asarray(post.mean)

    mesh = walker_mesh()
    sharding = walker_sharding(mesh)

    s_sharded = EnsembleSampler(
        nwalkers, dim, post, seed=11, image_shape=(2, 2), sharding=sharding
    )
    s_sharded.init_state(shard_walkers(jnp.asarray(p0), mesh))
    s_sharded.run_sampling(50)

    s_plain = EnsembleSampler(nwalkers, dim, post, seed=11, image_shape=(2, 2))
    s_plain.init_state(p0)
    s_plain.run_sampling(50)

    # identical PRNG stream + deterministic math => identical chains
    assert np.allclose(s_sharded.chain, s_plain.chain, atol=1e-10)
    assert np.allclose(
        s_sharded.lnprobability, s_plain.lnprobability, atol=1e-10
    )


def test_positions_actually_sharded():
    post = GaussianPosterior()
    mesh = walker_mesh()
    p0 = np.random.RandomState(1).randn(16, 3)
    arr = shard_walkers(jnp.asarray(p0), mesh)
    assert len(arr.sharding.device_set) == 8


def test_large_ensemble_sharded():
    """BASELINE.json scaling config: 2000 walkers sharded over the mesh.

    Checks the full sampling step (stretch move + chain record + image
    accumulation) executes with the production walker count and that the
    accumulators reduce across shards correctly.
    """
    post = GaussianPosterior()
    nwalkers, dim = 2000, 3
    rng = np.random.RandomState(2)
    p0 = rng.randn(nwalkers, dim) * 0.1 + np.asarray(post.mean)

    mesh = walker_mesh()
    s = EnsembleSampler(
        nwalkers, dim, post, seed=7, image_shape=(2, 2),
        sharding=walker_sharding(mesh),
    )
    s.init_state(shard_walkers(jnp.asarray(p0), mesh))
    s.run_burn(5)
    s.reset()
    s.run_sampling(10)
    assert s.chain.shape == (nwalkers, 10, dim)
    assert np.all(np.isfinite(s.lnprobability))
    acc = s.accumulated_images["img"]
    # accumulated mean of theta[0] over all walkers/steps stays near the
    # posterior mean of the first component
    assert abs(float(acc.mean()) - 1.0) < 0.2
    assert s.accumulated_samples == nwalkers * 10


def test_init_state_applies_sharding():
    """The driver path passes plain host arrays; init_state must place
    them on the mesh itself (regression: mesh= was silently unsharded)."""
    post = GaussianPosterior()
    mesh = walker_mesh()
    s = EnsembleSampler(
        16, 3, post, seed=5, image_shape=(2, 2),
        sharding=walker_sharding(mesh),
    )
    s.init_state(np.random.RandomState(0).randn(16, 3))  # host numpy
    assert len(s.state.positions.sharding.device_set) == 8
    s.run_sampling(3)
    assert s.chain.shape == (16, 3, 3)


def test_pt_init_state_applies_sharding():
    from psfmc_tpu.sampler.tempered import PTEnsembleSampler

    post = GaussianPosterior()
    mesh = walker_mesh()
    s = PTEnsembleSampler(
        16, 3, post, ntemps=3, seed=5, image_shape=(2, 2),
        sharding=walker_sharding(mesh),
    )
    s.init_state(np.random.RandomState(0).randn(16, 3))
    assert s.state.positions.shape == (3, 16, 3)
    assert len(s.state.positions.sharding.device_set) == 8
    s.run_sampling(3)
    assert s.chain.shape == (16, 3, 3)
