"""NUTS sampler: statistical correctness, efficiency, driver wiring."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psfmc_tpu.sampler.nuts import NUTSSampler
from tests.test_sampler import GaussianPosterior


class _IdentityTransform:
    """Trivial transform for unconstrained toy posteriors."""

    def __init__(self, dim):
        self.num_unconstrained = dim
        self.discrete_offsets = np.zeros(0, np.int32)

    def to_constrained(self, z):
        return z, jnp.zeros((), z.dtype)

    def to_unconstrained(self, theta):
        return np.asarray(theta, np.float64)


def test_nuts_gaussian_moments():
    post = GaussianPosterior()
    nchains, dim = 8, 3
    rng = np.random.RandomState(0)
    p0 = rng.randn(nchains, dim) * 0.1 + np.asarray(post.mean)

    s = NUTSSampler(
        nchains, dim, post, seed=1, image_shape=(2, 2),
        transform=_IdentityTransform(dim),
    )
    s.init_state(p0)
    s.run_burn(300)
    s.reset()
    s.run_sampling(700)

    flat = np.asarray(s.flatchain, np.float64)
    assert np.allclose(flat.mean(0), np.asarray(post.mean), atol=0.08)
    assert np.allclose(np.cov(flat.T), post.cov, atol=0.2)
    # warmup tuned the metric toward the target variances
    inv_mass = np.asarray(s.state["inv_mass"])
    assert np.all(inv_mass > 0.1) and np.all(inv_mass < 5.0)
    assert 0.5 < s.acceptance_fraction.mean() <= 1.0
    # image accumulation tracks E[theta_0] = 1
    acc = s.accumulated_images["img"]
    assert abs(float(acc.mean()) - 1.0) < 0.15
    assert s.accumulated_samples == nchains * 700
    assert s.n_leapfrog_total > 0


@pytest.fixture()
def small_model(rng, gaussian_psf):
    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import (
        Configuration, PointSource, Sersic, Sky,
    )
    from psfmc_tpu.models.spec import build_model_spec

    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    truth = np.full((h, w), 0.02)
    truth[15, 17] += 10 ** (-0.4 * (19.8 - 25.0))
    conv = np.fft.irfft2(
        np.fft.rfft2(truth) * np.fft.rfft2(np.fft.ifftshift(
            np.pad(gaussian_psf, 0)
        )),
        s=truth.shape,
    )
    sig = 0.004
    obs = conv + rng.randn(h, w) * sig
    config = Configuration(
        obs_file=obs,
        obsivm_file=np.ones_like(obs) / sig**2,
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e8,
        mag_zeropoint=25.0,
    )
    comps = [
        config,
        Sky(adu=D.Normal(loc=0.02, scale=0.01)),
        PointSource(
            xy=D.Uniform(loc=np.array([12.0, 12.0]), scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=19.0, scale=1.5),
        ),
    ]
    return build_model_spec(comps)


def test_nuts_matches_ensemble_with_fewer_evals(small_model, rng):
    """NUTS recovers the same posterior as the ensemble sampler with an
    order of magnitude fewer posterior evaluations (VERDICT item 5)."""
    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    spec = small_model
    fns = build_posterior(spec, dtype=jnp.float64)

    def prior_draws(n, seed):
        r = np.random.RandomState(seed)
        return np.stack([
            np.concatenate([np.ravel(s.dist.random(r)) for s in spec.slots])
            for _ in range(n)
        ])

    # ensemble reference: 32 walkers x (200 + 400)  => 19,200 evals
    ens = EnsembleSampler(32, spec.num_params, fns, seed=3)
    ens.init_state(prior_draws(32, 7))
    ens.run_burn(200)
    ens.reset()
    ens.run_sampling(400)
    ens_evals = 32 * 600
    ens_flat = np.asarray(ens.flatchain, np.float64)

    nuts = NUTSSampler(4, spec.num_params, fns, seed=3)
    # best-of-prior init (the driver does the same): imaging likelihood
    # gradients vanish far from the source, so chains must start where
    # the data are felt; include the 128 candidate evals in the budget
    n_pool = 128
    nuts.init_state(prior_draws(n_pool, 8))
    nuts.run_burn(150)
    nuts.reset()
    nuts.run_sampling(150)
    nuts_flat = np.asarray(nuts.flatchain, np.float64)
    nuts_evals = nuts.n_leapfrog_total + n_pool

    # same posterior: mean within 0.25 ensemble std, std within 30%
    mu_e, sd_e = ens_flat.mean(0), ens_flat.std(0)
    mu_n, sd_n = nuts_flat.mean(0), nuts_flat.std(0)
    assert np.all(np.abs(mu_n - mu_e) < 0.25 * sd_e + 1e-3), (mu_n, mu_e)
    assert np.all(np.abs(sd_n / sd_e - 1) < 0.3), (sd_n, sd_e)

    # fewer TOTAL posterior(-gradient) evaluations for matching moments
    assert nuts_evals < ens_evals, (nuts_evals, ens_evals)

    # and substantially fewer evaluations PER EFFECTIVE SAMPLE: compare
    # integrated autocorrelation times from a fixed-window ACF sum
    from psfmc_tpu.sampler.autocorr import function

    def tau_max(chain, m=100):
        f = function(np.mean(chain, axis=0), axis=0)
        return float(np.max(np.maximum(1.0 + 2.0 * np.sum(f[1:m], 0), 1.0)))

    tau_e = tau_max(ens.chain)
    tau_n = tau_max(nuts.chain, m=40)
    eff_e = ens_evals / (32 * 400 / tau_e)  # evals per effective sample
    eff_n = nuts_evals / (4 * 150 / tau_n)
    assert eff_n < 0.6 * eff_e, (eff_n, eff_e, tau_n, tau_e)
    assert nuts.n_divergent < 0.02 * 4 * 300


def test_nuts_driver_e2e(tmp_path, rng, gaussian_psf):
    """model_galaxy_mcmc(sampler='nuts') produces the standard DB and
    image products."""
    import os

    from psfmc_tpu import model_galaxy_mcmc
    from psfmc_tpu import distributions as D
    from psfmc_tpu.io import fits
    from psfmc_tpu.models.components import Configuration, PointSource, Sky

    obs = 0.02 + rng.randn(32, 32) * 0.004
    obs[15, 17] += 0.1
    comps = [
        Configuration(
            obs_file=obs,
            obsivm_file=np.ones_like(obs) / 0.004**2,
            psf_files=gaussian_psf,
            psfivm_files=np.ones_like(gaussian_psf) * 1e8,
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.02, scale=0.01)),
        PointSource(
            xy=D.Uniform(loc=np.array([12.0, 12.0]), scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=19.0, scale=1.5),
        ),
    ]
    prev = os.getcwd()
    os.chdir(tmp_path)
    try:
        db = model_galaxy_mcmc(
            comps, output_name="nuts_e2e", iterations=50, burn=100,
            chains=4, seed=2, sampler="nuts",
        )
        assert len(db) == 4 * 50
        assert db.meta["MCCHAINS"] == 4
        for ftype in ("raw_model", "residual", "composite_ivm"):
            data = fits.getdata(f"nuts_e2e_{ftype}.fits")
            assert np.all(np.isfinite(data))
    finally:
        os.chdir(prev)


def test_nuts_multipsf_gibbs(rng, gaussian_psf):
    """With two candidate PSFs the index is marginalized in the
    Hamiltonian and Gibbs-sampled per draw; the recorded chain prefers
    the PSF that generated the data."""
    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import Configuration, PointSource, Sky
    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.models.spec import build_model_spec

    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf_wrong = np.exp(-((xx - 16) ** 2 + (yy - 16) ** 2) / (2 * 3.0**2))
    psf_wrong /= psf_wrong.sum()

    truth = np.full((h, w), 0.02)
    truth[15, 17] += 10 ** (-0.4 * (19.8 - 25.0))
    conv = np.fft.irfft2(
        np.fft.rfft2(truth) * np.fft.rfft2(np.fft.ifftshift(gaussian_psf)),
        s=truth.shape,
    )
    sig = 0.002
    obs = conv + rng.randn(h, w) * sig

    comps = [
        Configuration(
            obs_file=obs,
            obsivm_file=np.ones_like(obs) / sig**2,
            psf_files=[gaussian_psf, psf_wrong],
            psfivm_files=[np.ones_like(gaussian_psf) * 1e8] * 2,
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.02, scale=0.01)),
        PointSource(
            xy=D.Uniform(loc=np.array([12.0, 12.0]), scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=19.0, scale=1.5),
        ),
    ]
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float64)
    idx_off = int(
        next(s.offset for s in spec.slots if s.is_discrete)
    )

    r = np.random.RandomState(5)
    p0 = np.stack([
        np.concatenate([np.ravel(s.dist.random(r)) for s in spec.slots])
        for _ in range(4)
    ])
    nuts = NUTSSampler(4, spec.num_params, fns, seed=5)
    assert nuts.zdim == spec.num_params - 1
    nuts.init_state(p0)
    nuts.run_burn(100)
    nuts.reset()
    nuts.run_sampling(100)
    idx_col = np.asarray(nuts.flatchain[:, idx_off])
    assert set(np.unique(idx_col)) <= {0.0, 1.0}
    # data were generated with PSF 0: the posterior must prefer it
    assert np.mean(idx_col == 0.0) > 0.9


def test_nuts_driver_resume(tmp_path, rng, gaussian_psf):
    """A NUTS run resumed through the driver keeps its adapted step
    size / metric and extends the chain."""
    import os

    from psfmc_tpu import load_database, model_galaxy_mcmc
    from psfmc_tpu import distributions as D
    from psfmc_tpu.database import load_checkpoint
    from psfmc_tpu.models.components import Configuration, PointSource, Sky

    obs = 0.02 + rng.randn(32, 32) * 0.004
    obs[15, 17] += 0.1
    comps = [
        Configuration(
            obs_file=obs,
            obsivm_file=np.ones_like(obs) / 0.004**2,
            psf_files=gaussian_psf,
            psfivm_files=np.ones_like(gaussian_psf) * 1e8,
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.02, scale=0.01)),
        PointSource(
            xy=D.Uniform(loc=np.array([12.0, 12.0]), scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=19.0, scale=1.5),
        ),
    ]
    prev = os.getcwd()
    os.chdir(tmp_path)
    try:
        db1 = model_galaxy_mcmc(
            comps, output_name="nres", iterations=30, burn=80,
            chains=4, seed=3, sampler="nuts",
        )
        ckpt = load_checkpoint("nres_db.fits")
        assert ckpt.get("nuts_eps", 0) > 0
        assert ckpt["nuts_inv_mass"].shape == (4,)  # 4 continuous params
        db2 = model_galaxy_mcmc(
            comps, output_name="nres", iterations=50, burn=80,
            chains=4, seed=3, sampler="nuts",
        )
        assert db2.meta["MCITER"] == 50
        assert len(db2) == 4 * 50
        old = np.asarray(db1["1_PointSource_mag"], np.float64)
        new = np.asarray(db2["1_PointSource_mag"], np.float64)
        assert np.allclose(old.reshape(4, 30), new.reshape(4, 50)[:, :30])
    finally:
        os.chdir(prev)


def test_nuts_sampling_segments_invoke_callback(rng):
    """run_sampling honors the driver's segment/callback contract
    (mid-phase checkpoints depend on per-segment callbacks)."""
    from tests.test_sampler import GaussianPosterior

    post = GaussianPosterior()
    s = NUTSSampler(4, 3, post, seed=3, image_shape=(2, 2),
                    transform=_IdentityTransform(3))
    p0 = np.asarray(post.mean) + rng.randn(16, 3)
    s.init_state(p0)
    s.run_burn(50)
    s.reset()
    calls = []
    s.run_sampling(30, segment=10, callback=lambda d, t: calls.append((d, t)))
    assert calls == [(10, 30), (20, 30), (30, 30)]
    assert s.chain.shape[1] == 30
    # uneven remainder segment
    s.run_sampling(25, segment=10, callback=lambda d, t: calls.append((d, t)))
    assert calls[-3:] == [(10, 25), (20, 25), (25, 25)]
    assert s.chain.shape[1] == 55
