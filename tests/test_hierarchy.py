"""Hierarchical population inference (beyond the reference).

Anchors: semi-analytic Gaussian shrinkage (the per-target posteriors
must match the conjugate partial-pooling formula at the recovered
hyperparameters), conjugate recovery of the population mean at pinned
population width, NUTS/ensemble agreement, full-render population
recovery on PointSource mocks, and the input-validation surface.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.hierarchy import (
    HierarchicalResult,
    LogNormalPopulation,
    NormalPopulation,
    StudentTPopulation,
    fit_hierarchical,
)
from psfmc_tpu.models.components import (
    Configuration,
    PointSource,
    Sky,
)
from psfmc_tpu.models.multicomponent import MultiComponentModel


def _sky_model(hw, noise):
    psf = np.zeros((8, 8))
    psf[4, 4] = 1.0
    return MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((hw, hw)),
                obsivm_file=np.full((hw, hw), 1.0 / noise**2),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Uniform(loc=-2.0, scale=6.0)),
        ]
    )


def _sky_stacks(rng, k, hw, noise, mu, sig):
    adus = mu + sig * rng.randn(k)
    obs = adus[:, None, None] + rng.randn(k, hw, hw) * noise
    ivm = np.full((k, hw, hw), 1.0 / noise**2)
    return obs, ivm, adus


@pytest.mark.slow
def test_shrinkage_matches_conjugate_formula(rng):
    """Measurement error comparable to the population width: the
    per-target posteriors must partially pool, matching the conjugate
    formula  E[adu_k] = (y_k/s^2 + mu/sigma^2) / (1/s^2 + 1/sigma^2)
    evaluated at the recovered hyperparameters."""
    k, hw = 12, 16
    mu_true, sig_true = 0.5, 0.06
    noise = 0.9  # per-target sky precision s = noise/hw = 0.056
    obs, ivm, adus = _sky_stacks(rng, k, hw, noise, mu_true, sig_true)
    model = _sky_model(hw, noise)
    res = fit_hierarchical(
        model, obs, ivm,
        population={"0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.005, scale=0.8),
        )},
        sampler="nuts", chains=4, burn=500, iterations=500, seed=2,
    )
    assert isinstance(res, HierarchicalResult)
    # the centered parametrization leaves a mild funnel at small
    # sigma: a few divergent trajectories are expected, not a failure
    assert res.diagnostics["divergences"] < 0.05 * 4 * 500
    mu_hat, sig_hat = res.hyper_mean
    # population mean recovered within its own posterior error + slack
    assert abs(mu_hat - np.mean(adus)) < 4 * res.hyper_std[0] + 0.02

    # conjugate partial-pooling check at the recovered (mu, sigma)
    s_meas = noise / hw  # sky estimator std over hw*hw pixels
    y_k = obs.mean(axis=(1, 2))  # per-target MLE
    w = 1.0 / s_meas**2
    wp = 1.0 / sig_hat**2
    expect = (y_k * w + mu_hat * wp) / (w + wp)
    np.testing.assert_allclose(
        res.target_mean[:, 0], expect, atol=3 * s_meas / np.sqrt(k)
        + 0.01,
    )
    # genuine shrinkage: posterior means sit between MLE and mu
    shrunk = np.abs(res.target_mean[:, 0] - mu_hat)
    raw = np.abs(y_k - mu_hat)
    assert np.mean(shrunk < raw) > 0.8


@pytest.mark.slow
def test_pinned_width_conjugate_mu_posterior(rng):
    """With the population width pinned (razor-thin prior), mu | data
    is analytically Normal — mean and std must match."""
    k, hw = 10, 16
    mu_true, sig = 0.4, 0.05
    noise = 0.8
    obs, ivm, adus = _sky_stacks(rng, k, hw, noise, mu_true, sig)
    model = _sky_model(hw, noise)
    res = fit_hierarchical(
        model, obs, ivm,
        population={"0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=sig - 5e-4, scale=1e-3),
        )},
        sampler="nuts", chains=4, burn=500, iterations=500, seed=3,
    )
    s_meas = noise / hw
    tot = sig**2 + s_meas**2
    y_k = obs.mean(axis=(1, 2))
    mu_post = np.mean(y_k)  # flat prior: weighted mean, equal weights
    mu_std = np.sqrt(tot / k)
    chain = res.hyper_chain[:, 0]
    assert abs(chain.mean() - mu_post) < 4 * mu_std / np.sqrt(10)+0.01
    assert chain.std() == pytest.approx(mu_std, rel=0.35)


def test_ensemble_and_nuts_agree(rng):
    k, hw = 4, 12
    noise = 0.5
    obs, ivm, _ = _sky_stacks(rng, k, hw, noise, 0.3, 0.08)
    model = _sky_model(hw, noise)
    pop = {
        "0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.01, scale=0.6),
        )
    }
    r_nuts = fit_hierarchical(
        model, obs, ivm, population=pop, sampler="nuts", chains=4,
        burn=300, iterations=300, seed=4,
    )
    r_ens = fit_hierarchical(
        model, obs, ivm, population=pop, sampler="ensemble",
        burn=600, iterations=600, seed=5,
    )
    assert abs(
        r_nuts.hyper_chain[:, 0].mean() - r_ens.hyper_chain[:, 0].mean()
    ) < 0.08
    assert "0_Sky_adu:mu" in r_nuts.summary()
    assert r_nuts.target_mean.shape == (k, 1)
    assert r_ens.flatchain.shape[1] == k * 1 + 2


@pytest.mark.slow
def test_full_render_population_on_pointsource_mag(rng, gaussian_psf):
    """Population over a rendered parameter: K point sources with
    mags drawn from N(20.5, 0.25); the hierarchical fit recovers the
    population through the full render/convolve/likelihood chain."""
    from psfmc_tpu.batchfit import simulate_stack

    psf = gaussian_psf[8:24, 8:24]
    psf = psf / psf.sum()
    k, hw, noise = 6, 16, 0.02
    mu_true, sig_true = 20.5, 0.25
    rng2 = np.random.RandomState(11)
    mags = mu_true + sig_true * rng2.randn(k)
    gen = MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((hw, hw)),
                obsivm_file=np.full((hw, hw), 1.0 / noise**2),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.05, scale=0.02)),
            PointSource(
                xy=D.Uniform(loc=(6.0, 6.0), scale=(4.0, 4.0)),
                mag=D.Uniform(loc=19.5, scale=2.5),
            ),
        ]
    )
    thetas = gen.init_params_from_priors(k, random_state=rng2)
    # slot layout (adu, mag, xy_x, xy_y): mag is column 1
    names = list(gen.param_names)
    assert names == ["0_Sky_adu", "1_PointSource_mag",
                     "1_PointSource_xy"]
    thetas[:, 1] = mags
    obs, ivm, injected = simulate_stack(
        gen, k, seed=7, thetas=thetas
    )
    res = fit_hierarchical(
        gen, obs, ivm,
        population={"1_PointSource_mag": NormalPopulation(
            mu=D.Uniform(loc=19.5, scale=2.5),
            sigma=D.Uniform(loc=0.02, scale=1.5),
        )},
        sampler="nuts", chains=4, burn=400, iterations=400, seed=8,
    )
    mu_hat = res.hyper_mean[0]
    assert abs(mu_hat - np.mean(mags)) < 0.15, res.summary()
    # per-target mags recovered (high SNR: tight)
    assert np.all(
        np.abs(res.target_mean[:, 1] - mags) < 0.05
    ), res.target_mean[:, 1] - mags


def test_validation_errors(rng, gaussian_psf):
    model = _sky_model(12, 0.5)
    obs, ivm, _ = _sky_stacks(rng, 3, 12, 0.5, 0.3, 0.05)
    pop = NormalPopulation(
        mu=D.Uniform(loc=0.0, scale=1.0),
        sigma=D.Uniform(loc=0.01, scale=0.5),
    )
    with pytest.raises(ValueError, match="unknown parameter"):
        fit_hierarchical(model, obs, ivm, {"nope": pop})
    with pytest.raises(ValueError, match="at least one"):
        fit_hierarchical(model, obs, ivm, {})
    with pytest.raises(TypeError, match="prior distribution"):
        NormalPopulation(mu=1.0, sigma=pop.sigma)
    # vector slot rejected
    psf = gaussian_psf[8:24, 8:24] / gaussian_psf[8:24, 8:24].sum()
    m2 = MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((16, 16)),
                obsivm_file=np.full((16, 16), 400.0),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            PointSource(
                xy=D.Uniform(loc=(4.0, 4.0), scale=(8.0, 8.0)),
                mag=D.Uniform(loc=19.0, scale=3.0),
            ),
        ]
    )
    obs2 = np.zeros((3, 16, 16))
    ivm2 = np.full((3, 16, 16), 400.0)
    with pytest.raises(ValueError, match="vector"):
        fit_hierarchical(m2, obs2, ivm2, {"0_PointSource_xy": pop})


# ---------------------------------------------------------------------
# population-family densities and the non-centered parametrization
# ---------------------------------------------------------------------

def _u(a, b):
    return D.Uniform(loc=a, scale=b - a)


def test_population_densities_match_scipy():
    """Each family's centered density vs the scipy frozen logpdf, and
    the non-centered form's change-of-variables self-consistency
    (jax_logp(reconstruct(eta)) == eta_logp(eta) - sum log|dtheta/deta|
    — catches a reconstruct/eta_logp mismatch exactly)."""
    from scipy import stats

    mu, sig = 0.4, 0.7
    phi = jnp.asarray([mu, sig])
    eta = jnp.asarray([-1.3, 0.2, 2.1])
    x = np.array([0.3, 1.2, 2.5])

    pn = NormalPopulation(mu=_u(-1, 1), sigma=_u(0.01, 2))
    np.testing.assert_allclose(
        float(pn.jax_logp(jnp.asarray(x), phi)),
        stats.norm(mu, sig).logpdf(x).sum(), rtol=1e-5,
    )
    ln = LogNormalPopulation(mu=_u(-1, 1), sigma=_u(0.01, 2))
    np.testing.assert_allclose(
        float(ln.jax_logp(jnp.asarray(x), phi)),
        stats.lognorm(s=sig, scale=np.exp(mu)).logpdf(x).sum(),
        rtol=1e-5,
    )
    assert float(ln.jax_logp(jnp.asarray([-0.1, 1.0]), phi)) == -np.inf
    st = StudentTPopulation(mu=_u(-1, 1), sigma=_u(0.01, 2), df=3.0)
    np.testing.assert_allclose(
        float(st.jax_logp(jnp.asarray(x), phi)),
        stats.t(3.0, loc=mu, scale=sig).logpdf(x).sum(), rtol=1e-5,
    )
    for pop in (pn, st):
        th = pop.reconstruct(eta, phi)
        np.testing.assert_allclose(
            float(pop.jax_logp(th, phi)),
            float(pop.eta_logp(eta)) - len(x) * np.log(sig),
            rtol=1e-5,
        )
    th = ln.reconstruct(eta, phi)
    np.testing.assert_allclose(
        float(ln.jax_logp(th, phi)),
        float(ln.eta_logp(eta))
        - float(jnp.sum(jnp.log(sig * th))),
        rtol=1e-5,
    )
    # sigma <= 0 rejected by every family
    bad = jnp.asarray([mu, -0.2])
    for pop in (pn, ln, st):
        assert float(pop.jax_logp(jnp.asarray(x), bad)) == -np.inf
    with pytest.raises(ValueError, match="df"):
        StudentTPopulation(mu=_u(-1, 1), sigma=_u(0.01, 2), df=-1.0)


def test_centered_and_noncentered_agree(rng):
    """Same workload, both parametrizations: hyper posteriors agree
    and the non-centered flatchain is reported in theta space."""
    k, hw = 4, 12
    noise = 0.5
    obs, ivm, _ = _sky_stacks(rng, k, hw, noise, 0.3, 0.08)
    model = _sky_model(hw, noise)
    pop = {
        "0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.01, scale=0.6),
        )
    }
    r_c = fit_hierarchical(
        model, obs, ivm, population=pop, sampler="nuts", chains=4,
        burn=300, iterations=300, seed=14,
    )
    r_nc = fit_hierarchical(
        model, obs, ivm, population=pop, sampler="nuts", chains=4,
        burn=300, iterations=300, seed=15,
        parametrization="noncentered",
    )
    assert abs(
        r_c.hyper_chain[:, 0].mean() - r_nc.hyper_chain[:, 0].mean()
    ) < 0.08
    # reported targets live in theta space (near the data), not eta
    y_k = obs.mean(axis=(1, 2))
    assert np.all(np.abs(r_nc.target_mean[:, 0] - y_k) < 0.2)
    # and inside the template prior support
    assert np.all(r_nc.flatchain[:, :k] > -2.0)
    assert np.all(r_nc.flatchain[:, :k] < 4.0)


@pytest.mark.slow
def test_noncentered_kills_funnel(rng):
    """Data-limited population width (sig_true << per-target error):
    the centered form's small-sigma funnel produces divergent
    trajectories; the non-centered form must cut them to ~zero while
    agreeing on the population mean."""
    k, hw = 12, 16
    mu_true, sig_true = 0.5, 0.015
    noise = 0.9  # s_meas = 0.056 >> sig_true
    obs, ivm, adus = _sky_stacks(rng, k, hw, noise, mu_true, sig_true)
    model = _sky_model(hw, noise)
    pop = {
        "0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.001, scale=0.8),
        )
    }
    r_c = fit_hierarchical(
        model, obs, ivm, population=pop, sampler="nuts", chains=4,
        burn=500, iterations=500, seed=21,
    )
    r_nc = fit_hierarchical(
        model, obs, ivm, population=pop, sampler="nuts", chains=4,
        burn=500, iterations=500, seed=21,
        parametrization="noncentered",
    )
    total = 4 * 500
    assert r_nc.diagnostics["divergences"] <= 0.005 * total, (
        r_nc.diagnostics
    )
    assert (
        r_nc.diagnostics["divergences"]
        <= r_c.diagnostics["divergences"]
    ), (r_c.diagnostics, r_nc.diagnostics)
    for r in (r_c, r_nc):
        assert abs(r.hyper_mean[0] - np.mean(adus)) < 0.04, r.summary()
    # the funnel neck is where centered chains stall: the non-centered
    # sigma posterior must actually reach the small-sigma region
    assert np.quantile(r_nc.hyper_chain[:, 1], 0.1) < 0.03


@pytest.mark.slow
def test_lognormal_population_recovery(rng):
    """Positive multiplicative population: ln(adu) ~ N(mu, sig)
    recovered on the log scale (non-centered — sigma is data-limited
    at this depth for some draws)."""
    k, hw = 12, 16
    mu_true, sig_true = np.log(0.6), 0.25
    noise = 0.25  # s_meas ~ 0.016 << population spread
    adus = np.exp(mu_true + sig_true * rng.randn(k))
    obs = adus[:, None, None] + rng.randn(k, hw, hw) * noise
    ivm = np.full((k, hw, hw), 1.0 / noise**2)
    psf = np.zeros((8, 8))
    psf[4, 4] = 1.0
    model = MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((hw, hw)),
                obsivm_file=np.full((hw, hw), 1.0 / noise**2),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Uniform(loc=0.05, scale=4.0)),
        ]
    )
    res = fit_hierarchical(
        model, obs, ivm,
        population={"0_Sky_adu": LogNormalPopulation(
            mu=D.Uniform(loc=-3.0, scale=5.0),
            sigma=D.Uniform(loc=0.01, scale=1.5),
        )},
        sampler="nuts", chains=4, burn=500, iterations=500, seed=31,
        parametrization="noncentered",
    )
    lx = np.log(adus)
    assert abs(res.hyper_mean[0] - lx.mean()) < max(
        4 * res.hyper_std[0], 0.1
    ), res.summary()
    assert res.hyper_mean[1] == pytest.approx(
        lx.std(ddof=1), abs=max(4 * res.hyper_std[1], 0.12)
    ), res.summary()
    # reported targets are thetas (positive), near the truths
    assert np.all(res.flatchain[:, :k] > 0)
    assert np.all(np.abs(res.target_mean[:, 0] - adus) < 0.05)


@pytest.mark.slow
def test_student_population_resists_outlier(rng):
    """One catastrophic outlier target: the t population's mu stays on
    the bulk while the Gaussian population gets dragged."""
    k, hw = 10, 16
    noise = 0.3
    bulk = 0.5 + 0.04 * rng.randn(k)
    bulk[-1] = 2.8  # the contaminant
    obs = bulk[:, None, None] + rng.randn(k, hw, hw) * noise
    ivm = np.full((k, hw, hw), 1.0 / noise**2)
    model = _sky_model(hw, noise)
    kwargs = dict(
        sampler="nuts", chains=4, burn=400, iterations=400, seed=41
    )
    mu_p = D.Uniform(loc=-1.0, scale=5.0)
    sig_p = D.Uniform(loc=0.005, scale=2.0)
    r_t = fit_hierarchical(
        model, obs, ivm,
        population={"0_Sky_adu": StudentTPopulation(
            mu=mu_p, sigma=sig_p, df=2.0
        )},
        **kwargs,
    )
    r_n = fit_hierarchical(
        model, obs, ivm,
        population={"0_Sky_adu": NormalPopulation(
            mu=mu_p, sigma=sig_p
        )},
        **kwargs,
    )
    bulk_mean = bulk[:-1].mean()
    err_t = abs(r_t.hyper_mean[0] - bulk_mean)
    err_n = abs(r_n.hyper_mean[0] - bulk_mean)
    assert err_t < err_n, (r_t.summary(), r_n.summary())
    assert err_t < 0.06, r_t.summary()
    # Gaussian sigma inflates to absorb the outlier; t's does not
    assert r_t.hyper_mean[1] < 0.5 * r_n.hyper_mean[1]


def test_noncentered_validation(rng, gaussian_psf):
    model = _sky_model(12, 0.5)
    obs, ivm, _ = _sky_stacks(rng, 3, 12, 0.5, 0.3, 0.05)
    pop_ok = NormalPopulation(
        mu=D.Uniform(loc=0.0, scale=1.0),
        sigma=D.Uniform(loc=0.01, scale=0.5),
    )
    with pytest.raises(ValueError, match="parametrization"):
        fit_hierarchical(
            model, obs, ivm, {"0_Sky_adu": pop_ok},
            parametrization="typo",
        )
    # scale hyperprior reaching negative values is rejected up front
    pop_neg = NormalPopulation(
        mu=D.Uniform(loc=0.0, scale=1.0),
        sigma=D.Uniform(loc=-0.2, scale=0.7),
    )
    with pytest.raises(ValueError, match="nonnegative support"):
        fit_hierarchical(
            model, obs, ivm, {"0_Sky_adu": pop_neg},
            parametrization="noncentered",
        )

    class _CenteredOnly:
        hyper_names = ("mu", "sigma")

        @property
        def hyper_dists(self):
            return (D.Uniform(loc=0.0, scale=1.0),
                    D.Uniform(loc=0.01, scale=0.5))

        def jax_logp(self, x, phi):  # pragma: no cover - not reached
            return jnp.asarray(0.0)

    with pytest.raises(ValueError, match="no non-centered"):
        fit_hierarchical(
            model, obs, ivm, {"0_Sky_adu": _CenteredOnly()},
            parametrization="noncentered",
        )
    # axis-pair members cannot be governed non-centered
    from psfmc_tpu.models.components import Sersic

    psf = gaussian_psf[8:24, 8:24] / gaussian_psf[8:24, 8:24].sum()
    m2 = MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((16, 16)),
                obsivm_file=np.full((16, 16), 400.0),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            Sersic(
                xy=D.Uniform(loc=(6.0, 6.0), scale=(4.0, 4.0)),
                mag=D.Uniform(loc=19.0, scale=3.0),
                reff=D.Uniform(loc=1.0, scale=6.0),
                reff_b=D.Uniform(loc=0.5, scale=6.0),
                index=D.Uniform(loc=0.5, scale=5.0),
                angle=D.Uniform(loc=0.0, scale=180.0),
            ),
        ]
    )
    obs2 = np.zeros((3, 16, 16))
    ivm2 = np.full((3, 16, 16), 400.0)
    with pytest.raises(ValueError, match="axis-pair"):
        fit_hierarchical(
            m2, obs2, ivm2,
            {"0_Sersic_reff": NormalPopulation(
                mu=D.Uniform(loc=1.0, scale=5.0),
                sigma=D.Uniform(loc=0.01, scale=1.0),
            )},
            parametrization="noncentered",
        )


def test_target_sharded_matches_unsharded(rng):
    """shard='targets' splits the K-target axis over the mesh inside
    the vmapped likelihood (chains replicate); the posterior must
    agree with the unsharded run, and the positions stay usable."""
    from psfmc_tpu.parallel.mesh import walker_mesh

    k, hw = 8, 12  # K a mesh multiple (8 virtual devices)
    noise = 0.5
    obs, ivm, _ = _sky_stacks(rng, k, hw, noise, 0.3, 0.08)
    model = _sky_model(hw, noise)
    pop = {
        "0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.01, scale=0.6),
        )
    }
    kwargs = dict(
        sampler="nuts", chains=4, burn=300, iterations=300, seed=61
    )
    r_plain = fit_hierarchical(model, obs, ivm, population=pop,
                               **kwargs)
    r_shard = fit_hierarchical(
        model, obs, ivm, population=pop,
        mesh=walker_mesh(), shard="targets", **kwargs,
    )
    # sharding only changes the reduction layout: same trajectories up
    # to f32 reassociation -> posterior summaries must agree tightly
    assert abs(
        r_plain.hyper_chain[:, 0].mean()
        - r_shard.hyper_chain[:, 0].mean()
    ) < 0.05
    np.testing.assert_allclose(
        r_shard.target_mean[:, 0], r_plain.target_mean[:, 0],
        atol=0.05,
    )
    with pytest.raises(ValueError, match="unknown shard"):
        fit_hierarchical(
            model, obs, ivm, population=pop,
            mesh=walker_mesh(), shard="typo", **kwargs,
        )


def test_target_sharded_ensemble_path(rng):
    """The ensemble leg under shard='targets' (walker axis replicated,
    target axis split)."""
    from psfmc_tpu.parallel.mesh import walker_mesh

    k, hw = 8, 12
    noise = 0.5
    obs, ivm, _ = _sky_stacks(rng, k, hw, noise, 0.3, 0.08)
    model = _sky_model(hw, noise)
    res = fit_hierarchical(
        model, obs, ivm,
        population={"0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.01, scale=0.6),
        )},
        sampler="ensemble", burn=600, iterations=600, seed=62,
        mesh=walker_mesh(), shard="targets",
    )
    y_k = obs.mean(axis=(1, 2))
    assert abs(res.hyper_mean[0] - y_k.mean()) < 0.15, res.summary()
    assert np.all(np.abs(res.target_mean[:, 0] - y_k) < 0.25)


def test_noncentered_ensemble_path(rng):
    """The ensemble sampler works under the non-centered form too (the
    guard + clamp live in the posterior, not the transform)."""
    k, hw = 3, 12
    noise = 0.5
    obs, ivm, _ = _sky_stacks(rng, k, hw, noise, 0.3, 0.08)
    model = _sky_model(hw, noise)
    res = fit_hierarchical(
        model, obs, ivm,
        population={"0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.01, scale=0.6),
        )},
        sampler="ensemble", burn=600, iterations=600, seed=51,
        parametrization="noncentered",
    )
    y_k = obs.mean(axis=(1, 2))
    assert abs(res.hyper_mean[0] - y_k.mean()) < 0.15, res.summary()
    assert np.all(np.abs(res.target_mean[:, 0] - y_k) < 0.25)
