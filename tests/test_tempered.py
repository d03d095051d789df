"""Parallel-tempered ensemble: mode-hopping on a bimodal posterior."""
import numpy as np
import pytest

import jax.numpy as jnp

from psfmc_tpu.sampler.ensemble import EnsembleSampler
from psfmc_tpu.sampler.tempered import PTEnsembleSampler, default_beta_ladder


class BimodalPosterior:
    """Equal-weight Gaussian mixture at +/-5 (sigma 0.5), 2-D.

    The modes are 10 sigma apart: affine-invariant stretch moves cannot
    cross between them when every walker starts in one mode, while a
    tempered ladder (hot rung at beta=1/64 ~ sigma_eff 4) crosses
    freely and feeds the cold chain through replica swaps.
    """

    dtype = jnp.float64

    def __init__(self):
        class _Spec:
            shape = (2, 2)

        self.spec = _Spec()

    def log_posterior(self, theta):
        def mode_lnp(mu):
            d = theta - mu
            return -0.5 * jnp.sum(d * d) / 0.25

        a = mode_lnp(jnp.asarray([5.0, 5.0]))
        b = mode_lnp(jnp.asarray([-5.0, -5.0]))
        return jnp.logaddexp(a, b) + jnp.log(0.5)

    def log_posterior_and_images(self, theta):
        lnp = self.log_posterior(theta)
        return lnp, {"img": jnp.ones((2, 2), self.dtype) * theta[0]}


def test_beta_ladder():
    b = default_beta_ladder(5, tmax=64.0)
    assert b[0] == 1.0 and np.isclose(b[-1], 1 / 64)
    assert np.all(np.diff(b) < 0)
    assert default_beta_ladder(1).tolist() == [1.0]


def test_pt_crosses_modes_where_plain_ensemble_cannot():
    post = BimodalPosterior()
    nwalkers = 64
    rng = np.random.RandomState(0)
    # every walker starts in the +5 mode
    p0 = 5.0 + rng.randn(nwalkers, 2) * 0.3

    plain = EnsembleSampler(nwalkers, 2, post, seed=1, image_shape=(2, 2))
    plain.init_state(p0)
    plain.run_burn(300)
    plain.reset()
    plain.run_sampling(700)
    frac_neg_plain = float(np.mean(plain.flatchain[:, 0] < 0))

    pt = PTEnsembleSampler(
        nwalkers, 2, post, ntemps=6, seed=1, image_shape=(2, 2)
    )
    pt.init_state(p0)
    pt.run_burn(300)
    pt.reset()
    pt.run_sampling(700)
    frac_neg_pt = float(np.mean(pt.flatchain[:, 0] < 0))

    # stuck vs mixed: the plain ensemble never finds the -5 mode
    assert frac_neg_plain < 0.05
    assert 0.3 < frac_neg_pt < 0.7
    # swaps actually happen on every rung pair
    assert np.all(pt.swap_acceptance_fraction > 0.05)
    # the cold chain is a true posterior draw: both modes at +/-5
    cold = pt.flatchain
    pos_mode = cold[cold[:, 0] > 0]
    neg_mode = cold[cold[:, 0] < 0]
    assert abs(pos_mode[:, 0].mean() - 5.0) < 0.2
    assert abs(neg_mode[:, 0].mean() + 5.0) < 0.2


def test_pt_matches_plain_on_unimodal(rng):
    """ntemps > 1 must not distort a unimodal posterior's cold chain."""
    from tests.test_sampler import GaussianPosterior

    post = GaussianPosterior()
    nwalkers = 32
    p0 = rng.randn(nwalkers, 3) * 0.1 + np.asarray(post.mean)

    pt = PTEnsembleSampler(
        nwalkers, 3, post, ntemps=4, seed=2, image_shape=(2, 2)
    )
    pt.init_state(p0)
    pt.run_burn(200)
    pt.reset()
    pt.run_sampling(800)
    flat = np.asarray(pt.flatchain, np.float64)
    assert np.allclose(flat.mean(0), np.asarray(post.mean), atol=0.1)
    assert np.allclose(
        flat.std(0), np.sqrt(np.diag(post.cov)), rtol=0.15
    )
    # emcee-compatible surface works
    assert pt.chain.shape == (nwalkers, 800, 3)
    assert pt.lnprobability.shape == (nwalkers, 800)
    assert 0.1 < pt.acceptance_fraction.mean() < 0.9
    pos, lnp, nacc, key = pt.checkpoint_state()
    assert np.asarray(pos).shape == (nwalkers, 3)
    assert np.asarray(lnp).shape == (nwalkers,)
    # accumulators track the cold rung's mean of theta[0]
    acc = pt.accumulated_images["img"]
    assert abs(float(acc.mean()) - 1.0) < 0.15
    assert pt.accumulated_samples == nwalkers * 800


def test_pt_with_real_posterior_prior_split(rng, gaussian_psf):
    """Tempering with the production posterior: only the likelihood is
    tempered (priors stay cold), and the fitting driver accepts ntemps."""
    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import Configuration, Sersic, Sky
    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.models.spec import build_model_spec

    obs = 0.1 + rng.randn(32, 32) * 0.01
    config = Configuration(
        obs_file=obs,
        obsivm_file=np.full((32, 32), 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e6,
        mag_zeropoint=25.0,
    )
    comps = [
        config,
        Sky(adu=D.Normal(loc=0.1, scale=0.05)),
        Sersic(
            xy=D.Uniform(loc=np.array([10.0, 10.0]),
                         scale=np.array([12.0, 12.0])),
            mag=D.Uniform(loc=19, scale=3),
            reff=D.Uniform(loc=2, scale=8),
            reff_b=D.Uniform(loc=2, scale=8),
            index=1.5,
            angle=30.0,
            angle_degrees=True,
        ),
    ]
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float64)
    nwalkers = 16
    base = np.array([0.1, 20.0, 5.0, 4.0, 16.0, 15.0])
    p0 = base + rng.randn(nwalkers, 6) * 0.01
    p0[:, 2:4] = np.sort(p0[:, 2:4], axis=1)[:, ::-1]

    pt = PTEnsembleSampler(nwalkers, 6, fns, ntemps=3, seed=4)
    pt.init_state(p0)
    pt.run_burn(10)
    pt.reset()
    pt.run_sampling(20)
    assert np.all(np.isfinite(pt.lnprobability))
    assert pt.chain.shape == (nwalkers, 20, 6)
    # hot rungs respect the prior: every stored position is in-support
    hot_pos = np.asarray(pt.state.positions[-1])
    assert np.all(hot_pos[:, 2] >= hot_pos[:, 3])  # reff >= reff_b
