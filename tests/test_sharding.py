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


def _flagship_shaped_components(rng, tmp_path=None):
    """Small but full-featured model: Sky + PointSource + 2 Sersics with
    TWO candidate PSFs (discrete PSF-index parameter + mismatch
    variance) — the flagship posterior's every code path."""
    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import (
        Configuration, PointSource, Sersic, Sky,
    )

    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf1 = np.exp(-((xx - 16) ** 2 + (yy - 16) ** 2) / (2 * 1.5**2))
    psf1 /= psf1.sum()
    psf2 = np.exp(-((xx - 16) ** 2 + (yy - 16) ** 2) / (2 * 2.0**2))
    psf2 /= psf2.sum()
    obs = 0.05 + rng.randn(h, w) * 0.01
    obs[14:18, 14:18] += 0.5  # bright center so the fit has signal
    config = Configuration(
        obs_file=obs,
        obsivm_file=np.ones_like(obs) / 0.01**2,
        psf_files=[psf1, psf2],
        psfivm_files=[np.ones_like(psf1) * 1e8, np.ones_like(psf2) * 1e8],
        mag_zeropoint=25.0,
    )
    center = np.array([16.0, 16.0])
    return [
        config,
        Sky(adu=D.Normal(loc=0.05, scale=0.02)),
        PointSource(
            xy=D.Uniform(loc=center - 4, scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=19.5, scale=2.0),
        ),
        Sersic(
            xy=D.Uniform(loc=center - 4, scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=20.5, scale=2.0),
            reff=D.Uniform(loc=1.0, scale=5.0),
            reff_b=D.Uniform(loc=1.0, scale=5.0),
            index=D.WeibullMinimum(c=1.5, scale=4),
            angle=D.Uniform(loc=0.0, scale=180.0),
            angle_degrees=True,
        ),
        Sersic(
            xy=D.Uniform(loc=np.array([8.0, 20.0]), scale=np.array([6.0, 6.0])),
            mag=D.Uniform(loc=22.0, scale=2.0),
            reff=D.Uniform(loc=1.0, scale=4.0),
            reff_b=D.Uniform(loc=1.0, scale=4.0),
            index=D.WeibullMinimum(c=1.5, scale=4),
            angle=D.Uniform(loc=0.0, scale=180.0),
            angle_degrees=True,
        ),
    ]


def test_real_model_sharded_fit_matches_unsharded(tmp_path, rng):
    """model_galaxy_mcmc(mesh=...) on the flagship-shaped posterior
    (renders + convolutions + multi-PSF gather) produces the SAME chain
    as the unsharded run (VERDICT round-1 item 2)."""
    import os

    from psfmc_tpu import load_database, model_galaxy_mcmc

    comps = _flagship_shaped_components(rng)
    prev = os.getcwd()
    os.chdir(tmp_path)
    try:
        db_plain = model_galaxy_mcmc(
            comps, output_name="plain", iterations=15, burn=15,
            chains=32, seed=9,
        )
        db_shard = model_galaxy_mcmc(
            comps, output_name="shard", iterations=15, burn=15,
            chains=32, seed=9, mesh=walker_mesh(),
        )
    finally:
        os.chdir(prev)
    assert len(db_shard) == len(db_plain) == 32 * 15
    for col in db_plain.colnames:
        a = np.asarray(db_plain[col], np.float64)
        b = np.asarray(db_shard[col], np.float64)
        assert np.allclose(a, b, atol=1e-5), col
    # posterior image products agree too (accumulators psum across shards)
    from psfmc_tpu.io import fits

    for ftype in ("raw_model", "convolved_model", "composite_ivm"):
        ap = fits.getdata(str(tmp_path / f"plain_{ftype}.fits"))
        bs = fits.getdata(str(tmp_path / f"shard_{ftype}.fits"))
        assert np.allclose(ap, bs, rtol=1e-4, atol=1e-7), ftype


def test_dryrun_multichip_in_suite():
    """The driver's multichip dry run must pass under pytest so entry-
    path regressions surface before the driver does."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry_test",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    # backend already initialized by conftest with 8 CPU devices; the
    # self-provisioning path must detect that and proceed
    graft.dryrun_multichip(8)


def test_sharded_ais_evidence_matches_unsharded():
    """Evidence groups are embarrassingly parallel: sharding the group
    axis over the mesh must not change the estimate (same program, same
    PRNG stream, no cross-group reductions)."""
    from psfmc_tpu.sampler.ais import ais_evidence
    from tests.test_evidence import TRUTH, BoxGaussianPosterior

    rng = np.random.RandomState(11)
    p0 = rng.uniform(-5.0, 5.0, (64, 2))

    def run(mesh):
        # fresh posterior object per run: the cached AIS program closes
        # over the fns, so reuse would blur the comparison
        post = BoxGaussianPosterior()
        return ais_evidence(
            post, nwalkers=64, nsteps=300, groups=8, seed=3, p0=p0,
            mesh=mesh,
        )

    plain = run(None)
    sharded = run(walker_mesh())
    assert np.allclose(plain.lnz_groups, sharded.lnz_groups, rtol=1e-6)
    assert np.isclose(plain.lnz, sharded.lnz)
    assert abs(sharded.lnz - TRUTH) < 0.3

    with pytest.raises(ValueError):
        run_bad = ais_evidence(
            BoxGaussianPosterior(), nwalkers=60, nsteps=20, groups=6,
            seed=0, p0=p0[:60], mesh=walker_mesh(),
        )


def test_nuts_sharded_matches_unsharded():
    """NUTS chains shard over the mesh; trajectories stay identical."""
    from psfmc_tpu.sampler.nuts import NUTSSampler
    from tests.test_nuts import _IdentityTransform

    post = GaussianPosterior()
    nwalkers, dim = 8, 3
    rng = np.random.RandomState(2)
    p0 = rng.randn(nwalkers, dim) * 0.1 + np.asarray(post.mean)

    mesh = walker_mesh()
    sharding = walker_sharding(mesh)

    kw = dict(dim=dim, posterior_fns=post, seed=4, image_shape=(2, 2),
              transform=_IdentityTransform(dim))
    s_sh = NUTSSampler(nwalkers=nwalkers, sharding=sharding, **kw)
    s_sh.init_state(p0)
    s_sh.run_burn(30)
    s_sh.reset()
    s_sh.run_sampling(20)

    s_pl = NUTSSampler(nwalkers=nwalkers, **kw)
    s_pl.init_state(p0)
    s_pl.run_burn(30)
    s_pl.reset()
    s_pl.run_sampling(20)

    assert np.allclose(s_sh.chain, s_pl.chain, atol=1e-8)
    assert np.allclose(s_sh.lnprobability, s_pl.lnprobability, atol=1e-8)
    # positions really live on the mesh
    assert len(s_sh.state["z"].sharding.device_set) == 8
