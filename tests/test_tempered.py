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
    payload = pt.checkpoint_payload()
    assert payload["positions"].shape == (4, nwalkers, 3)
    assert payload["log_prob"].shape == (nwalkers,)
    assert payload["nswap"].shape == (3,)
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


def test_pt_checkpoint_restores_all_rungs(rng, tmp_path):
    """Checkpoint v2 persists every rung: a resumed tempered sampler
    continues hot rungs exactly instead of re-burning them from the
    cold positions (VERDICT round-1 weak item 6)."""
    from psfmc_tpu.database import load_checkpoint, save_database

    post = BimodalPosterior()
    nwalkers, dim, ntemps = 16, 2, 4
    p0 = rng.randn(nwalkers, dim) * 0.3 + 5.0

    pt = PTEnsembleSampler(nwalkers, dim, post, ntemps=ntemps, seed=7,
                           image_shape=(2, 2))
    pt.init_state(p0)
    pt.run_burn(50)
    pt.reset()
    pt.run_sampling(30)

    class _Model:
        param_names = ["0_X_xy"]
        param_lens = [2]

    path = str(tmp_path / "pt_db.fits")
    save_database(pt, _Model(), path, meta_dict={"MCITER": 30})
    ckpt = load_checkpoint(path)
    assert ckpt["ntemps"] == ntemps
    assert ckpt["positions"].shape == (ntemps, nwalkers, dim)

    pt2 = PTEnsembleSampler(nwalkers, dim, post, ntemps=ntemps, seed=99,
                            image_shape=(2, 2))
    pt2.restore_state(ckpt)
    # every rung's positions restored exactly (hot rungs too)
    assert np.allclose(
        np.asarray(pt2.state.positions), np.asarray(pt.state.positions)
    )
    assert np.array_equal(
        np.asarray(pt2.state.nswap), np.asarray(pt.state.nswap)
    )
    assert np.array_equal(np.asarray(pt2.state.key), np.asarray(pt.state.key))
    assert pt2.accumulated_samples == pt.accumulated_samples
    acc1, acc2 = pt.accumulated_images, pt2.accumulated_images
    assert all(np.allclose(acc1[k], acc2[k], atol=1e-6) for k in acc1)
    # the resumed sampler keeps sampling from the exact state
    pt2.run_sampling(5)
    assert np.all(np.isfinite(pt2.lnprobability))


def test_pt_checkpoint_ntemps_mismatch_falls_back(rng, tmp_path):
    """Restoring a checkpoint with different ntemps broadcasts the cold
    rung (with a warning) instead of crashing."""
    import warnings

    post = BimodalPosterior()
    pt = PTEnsembleSampler(16, 2, post, ntemps=4, seed=1, image_shape=(2, 2))
    pt.init_state(rng.randn(16, 2) + 5.0)
    pt.run_burn(10)
    payload = pt.checkpoint_payload()

    pt2 = PTEnsembleSampler(16, 2, post, ntemps=3, seed=2, image_shape=(2, 2))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        pt2.restore_state(payload)
    assert any("rungs" in str(r.message) for r in rec)
    # all rungs start from the checkpointed cold positions
    pos = np.asarray(pt2.state.positions)
    assert np.allclose(pos[1], pos[0]) and np.allclose(pos[2], pos[0])


class HighSNPosterior:
    """Gaussian likelihood whose lnL spread mimics a 16k-pixel imaging
    fit: std(lnL) ~ sqrt(d/2) * scale with a large curvature scale, so
    the geometric default ladder's swaps collapse to ~0 (the flagship
    failure mode, CLAUDE.md measured 0.1%)."""

    dtype = jnp.float64

    def __init__(self, dim=8, sigma=0.01):
        class _Spec:
            shape = (2, 2)

        self.spec = _Spec()
        self.dim = dim
        self.inv_var = 1.0 / sigma**2

    def log_posterior(self, theta):
        return -0.5 * self.inv_var * jnp.sum(theta * theta)

    def log_posterior_and_images(self, theta):
        return self.log_posterior(theta), {
            "img": jnp.ones((2, 2), self.dtype) * theta[0]
        }


def test_adaptive_ladder_fixes_high_sn_swaps(rng):
    """betas=None must auto-size the ladder so a high-S/N likelihood
    swaps in a healthy range without hand tuning (VERDICT item 3).
    The pinned geometric default on the same target swaps at ~0."""
    # std(lnL) at rung beta is sqrt(d/2)/beta: dim=32 makes the default
    # geometric ladder's swap log-ratio mean ~ -d/2*(db)^2/(bh*bc) = -36
    # for the first pair — effectively zero swaps, like the flagship
    post = HighSNPosterior(dim=32, sigma=0.01)
    nwalkers, dim, ntemps = 80, 32, 4
    p0 = rng.randn(nwalkers, dim) * 0.01

    pinned = PTEnsembleSampler(
        nwalkers, dim, post, ntemps=ntemps, seed=3, image_shape=(2, 2),
        betas=default_beta_ladder(ntemps), adapt_ladder=False,
    )
    pinned.init_state(p0)
    pinned.run_burn(300)
    assert pinned.swap_acceptance_fraction.mean() < 0.02  # the footgun

    auto = PTEnsembleSampler(
        nwalkers, dim, post, ntemps=ntemps, seed=3, image_shape=(2, 2),
    )
    assert auto.adapt_ladder
    auto.init_state(p0)
    auto.run_burn(300)
    # ladder moved off the geometric default and tightened toward 1
    assert auto.betas[-1] > 0.2
    # swap acceptance measured over a post-adaptation frozen phase
    auto.reset()
    auto.run_sampling(200)
    acc = auto.swap_acceptance_fraction
    assert np.all(acc > 0.05), acc
    assert np.all(acc < 0.8), acc
    # cold chain statistics are still correct (sigma = 0.01 Gaussian)
    flat = np.asarray(auto.flatchain, np.float64)
    assert np.allclose(flat.std(0), 0.01, rtol=0.2)


def test_adaptive_ladder_keeps_weak_data_behavior(rng):
    """On the weak-data bimodal target the auto ladder must still span
    enough temperature range to hop modes."""
    post = BimodalPosterior()
    nwalkers = 64
    p0 = 5.0 + rng.randn(nwalkers, 2) * 0.3
    pt = PTEnsembleSampler(
        nwalkers, 2, post, ntemps=6, seed=1, image_shape=(2, 2)
    )
    assert pt.adapt_ladder
    pt.init_state(p0)
    pt.run_burn(300)
    pt.reset()
    pt.run_sampling(700)
    frac_neg = float(np.mean(pt.flatchain[:, 0] < 0))
    assert 0.2 < frac_neg < 0.8
    assert np.all(pt.swap_acceptance_fraction > 0.03)


def test_pt_mixed_moves_preserve_posterior(rng):
    """moves='mixed' on the tempered sampler targets the same posterior
    (unimodal Gaussian moments recovered) and still swaps."""
    from tests.test_sampler import GaussianPosterior

    post = GaussianPosterior()
    nwalkers = 64
    p0 = np.asarray(post.mean) + rng.randn(nwalkers, 3)
    pt = PTEnsembleSampler(
        nwalkers, 3, post, ntemps=3, seed=6, image_shape=(2, 2),
        moves="mixed",
    )
    pt.init_state(p0)
    pt.run_burn(300)
    pt.reset()
    pt.run_sampling(1000)
    flat = np.asarray(pt.flatchain, np.float64)
    assert np.allclose(flat.mean(axis=0), np.asarray(post.mean), atol=0.1)
    assert np.allclose(np.cov(flat.T), np.asarray(post.cov), atol=0.3)
    assert np.all(pt.swap_acceptance_fraction > 0.05)


def test_pt_rejuvenate_stuck_per_rung():
    """Per-rung burn-phase walker rescue: stranded cold-rung walkers
    teleport onto same-rung donors; like/prior recomputed."""
    post = BimodalPosterior()
    nwalkers, ntemps = 32, 3
    rng = np.random.RandomState(2)
    p0 = np.broadcast_to(
        5.0 + rng.randn(nwalkers, 2) * 0.3, (ntemps, nwalkers, 2)
    ).copy()
    p0[0, :3] = 500.0  # strand 3 cold-rung walkers (lnp ~ -5e5)

    s = PTEnsembleSampler(
        nwalkers, 2, post, ntemps=ntemps, seed=4, image_shape=(2, 2)
    )
    s.init_state(p0)
    assert (np.asarray(s.state.log_like)[0, :3] < -1e4).all()
    n = s.rejuvenate_stuck(random_state=np.random.RandomState(0))
    assert n == 3
    lnl = np.asarray(s.state.log_like, np.float64)
    assert np.all(lnl[0] > -100.0)
    # donors came from the SAME rung: every cold-rung position is one
    # of the original healthy cold-rung positions
    pos = np.asarray(s.state.positions, np.float64)
    healthy = p0[0, 3:]
    for row in pos[0]:
        assert np.any(np.all(np.isclose(healthy, row[None]), axis=1))
    assert s.rejuvenate_stuck(random_state=np.random.RandomState(0)) == 0
