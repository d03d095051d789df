"""Hierarchical population inference (beyond the reference).

Anchors: semi-analytic Gaussian shrinkage (the per-target posteriors
must match the conjugate partial-pooling formula at the recovered
hyperparameters), conjugate recovery of the population mean at pinned
population width, NUTS/ensemble agreement, full-render population
recovery on PointSource mocks, and the input-validation surface.
"""
import numpy as np
import pytest
import jax
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


from _hierarchy_helpers import _sky_model, _sky_stacks  # noqa: E402


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
# multi-PSF: per-target marginalization of the discrete index
# ---------------------------------------------------------------------

def _two_psfs(hw=16, sigmas=(1.5, 1.8)):
    yy, xx = np.mgrid[:hw, :hw] - (hw - 1) / 2.0
    r2 = xx**2 + yy**2
    out = []
    for s in sigmas:
        p = np.exp(-r2 / (2 * s**2))
        out.append(p / p.sum())
    return out


def _ps_model_two_psf(hw, noise, sigmas=(1.5, 1.8)):
    p1, p2 = _two_psfs(sigmas=sigmas)
    return MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((hw, hw)),
                obsivm_file=np.full((hw, hw), 1.0 / noise**2),
                psf_files=[p1, p2],
                psfivm_files=[np.full_like(p1, 1e12)] * 2,
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.0, scale=0.05)),
            PointSource(
                xy=D.Uniform(loc=(6.0, 6.0), scale=(4.0, 4.0)),
                mag=D.Uniform(loc=19.5, scale=2.5),
            ),
        ]
    )


def test_multipsf_marginal_lnpost_exact(rng):
    """The hierarchical joint lnpost with num_psfs=2 equals the manual
    per-target logsumexp over indices + the uniform 1/num_psfs weight
    (which rides in base_prior's DiscreteUniform term at the inert
    index column) + the continuous priors."""
    from psfmc_tpu.hierarchy import _HierarchicalFns
    from psfmc_tpu.batchfit import prepare_obs_stack
    from psfmc_tpu.models.posterior import make_log_prior

    hw, noise, k = 16, 0.05, 2
    model = _ps_model_two_psf(hw, noise)
    fns = model.posterior_fns
    spec = model.spec
    obs_stack = 0.1 + rng.randn(k, hw, hw) * noise
    ivm_stack = np.full((k, hw, hw), 1.0 / noise**2)
    obs = prepare_obs_stack(spec, obs_stack, ivm_stack,
                            np.dtype(fns.dtype))
    d = spec.num_params
    slot = {s.name: s for s in spec.slots}["1_PointSource_mag"]
    gov_col = int(slot.offset)
    psf_col = next(int(s.offset) for s in spec.slots if s.is_discrete)
    pop = NormalPopulation(
        mu=D.Uniform(loc=19.5, scale=2.5),
        sigma=D.Uniform(loc=0.02, scale=1.5),
    )
    base_prior = make_log_prior(
        [s for s in spec.slots if int(s.offset) != gov_col],
        spec.comp_specs, fns.dtype,
    )
    hier = _HierarchicalFns(
        [{"fns": fns, "obs": obs, "psf": (psf_col, 2)}], d, k,
        [gov_col],
        [tuple(map(float, slot.dist.rv_frozen.support()))], [pop],
        [0], list(pop.hyper_dists), base_prior,
    )
    thetas = model.init_params_from_priors(k, random_state=rng)
    thetas[:, psf_col] = 0.0
    phi = np.array([20.5, 0.3])
    big = np.concatenate([thetas.reshape(-1), phi])

    got = float(hier.log_posterior(jnp.asarray(big)))
    # manual: continuous priors + pop density + per-target
    # logsumexp_j lnl_j - ln 2
    expect = float(pop.jax_logp(jnp.asarray(thetas[:, gov_col]),
                                jnp.asarray(phi)))
    for hd, v in zip(pop.hyper_dists, phi):
        expect += float(hd.jax_logp(jnp.asarray(v)))
    for t in range(k):
        th = jnp.asarray(thetas[t], fns.dtype)
        expect += float(base_prior(th))
        o = {"obs_data": jnp.asarray(obs["obs_data"][t]),
             "obs_var": jnp.asarray(obs["obs_var"][t]),
             "good_px": jnp.asarray(obs["good_px"][t])}
        lps = [float(fns.log_likelihood_obs(th.at[psf_col].set(j), o))
               for j in (0.0, 1.0)]
        expect += float(jax.scipy.special.logsumexp(jnp.asarray(lps)))
    np.testing.assert_allclose(got, expect, rtol=2e-5)


def _multipsf_workload(sigmas, seed_mags=23):
    from psfmc_tpu.batchfit import simulate_stack

    hw, noise, k = 16, 0.01, 6
    gen = _ps_model_two_psf(hw, noise, sigmas=sigmas)
    rng2 = np.random.RandomState(seed_mags)
    thetas = gen.init_params_from_priors(k, random_state=rng2)
    mags = 20.5 + 0.25 * rng2.randn(k)
    thetas[:, 1] = mags
    thetas[:, 4] = 1.0  # every mock rendered with PSF index 1
    obs, ivm, _ = simulate_stack(gen, k, seed=7, thetas=thetas)
    res = fit_hierarchical(
        gen, obs, ivm,
        population={"1_PointSource_mag": NormalPopulation(
            mu=D.Uniform(loc=19.5, scale=2.5),
            sigma=D.Uniform(loc=0.02, scale=1.5),
        )},
        sampler="nuts", chains=4, burn=400, iterations=400, seed=8,
    )
    idx_cols = res.flatchain[:, [t * 5 + 4 for t in range(6)]]
    return res, mags, idx_cols


@pytest.mark.slow
def test_multipsf_identical_psfs_anchor(rng):
    """CALIBRATION anchor: with two IDENTICAL PSF realizations the
    inter-PSF mismatch variance is zero and the marginalized posterior
    must collapse to the single-PSF one — tight, unbiased recovery —
    while the Gibbs indices are exactly uniform (no information)."""
    res, mags, idx_cols = _multipsf_workload(sigmas=(1.5, 1.5))
    assert abs(res.hyper_mean[0] - np.mean(mags)) < 0.15, res.summary()
    assert np.all(np.abs(res.target_mean[:, 1] - mags) < 0.05)
    assert set(np.unique(idx_cols)) <= {0.0, 1.0}
    assert 0.3 < idx_cols.mean() < 0.7, idx_cols.mean(axis=0)


@pytest.mark.slow
def test_multipsf_population_recovery(rng):
    """K point sources convolved with the BROADER of two distinct
    PSFs: the Gibbs-filled index columns identify the true PSF and the
    population is recovered within the posterior's OWN errors.

    With distinct realizations the inter-PSF mismatch variance
    (reference utils.py:136-157 parity, io/preprocess.py
    calculate_psf_variability) dominates the bright PS core: per-target
    mags are honestly WIDE (the model doubts its own PSF) and the
    var-proportional-to-model ln-det term can shift the mode — so the
    asserts here are calibration checks against the claimed stds, not
    tight truth recovery (that's the identical-PSF anchor's job)."""
    res, mags, idx_cols = _multipsf_workload(sigmas=(1.5, 1.8))
    assert abs(res.hyper_mean[0] - np.mean(mags)) < (
        4 * res.hyper_std[0] + 0.02
    ), res.summary()
    assert np.all(
        np.abs(res.target_mean[:, 1] - mags)
        < 4 * res.target_std[:, 1] + 0.05
    ), (res.target_mean[:, 1] - mags, res.target_std[:, 1])
    # index columns carry the Gibbs draws: the true PSF is identified
    assert set(np.unique(idx_cols)) <= {0.0, 1.0}
    assert idx_cols.mean() > 0.8, idx_cols.mean(axis=0)
    assert np.all(res.target_mean[:, 4] > 0.5), res.target_mean[:, 4]


def test_multipsf_ensemble_and_validation(rng):
    """Ensemble path under marginalization (inert index columns stay
    pinned), plus governing the index is rejected."""
    hw, noise, k = 16, 0.05, 3
    model = _ps_model_two_psf(hw, noise)
    obs = 0.1 + rng.randn(k, hw, hw) * noise
    ivm = np.full((k, hw, hw), 1.0 / noise**2)
    pop = {
        "0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-0.5, scale=1.0),
            sigma=D.Uniform(loc=0.005, scale=0.3),
        )
    }
    res = fit_hierarchical(
        model, obs, ivm, population=pop, sampler="ensemble",
        burn=200, iterations=100, seed=6,
    )
    assert np.all(np.isfinite(res.hyper_chain))
    # index columns were Gibbs-filled with integers
    idx_cols = res.flatchain[:, [t * 5 + 4 for t in range(k)]]
    assert set(np.unique(idx_cols)) <= {0.0, 1.0}
    with pytest.raises(ValueError, match="marginalized"):
        fit_hierarchical(
            model, obs, ivm,
            population={"PSF_Index": NormalPopulation(
                mu=D.Uniform(loc=0.0, scale=1.0),
                sigma=D.Uniform(loc=0.01, scale=0.5),
            )},
        )


# ---------------------------------------------------------------------
# joint multi-band hierarchical fits
# ---------------------------------------------------------------------

def _joint_sky_model(hw_a, hw_b, noise, npsf_b=1):
    """Two Sky-only bands (mixed shapes); band B optionally multi-PSF."""
    from psfmc_tpu.models.joint import JointModel

    def _cfg(hw, psfs):
        return Configuration(
            obs_file=np.zeros((hw, hw)),
            obsivm_file=np.full((hw, hw), 1.0 / noise**2),
            psf_files=psfs if len(psfs) > 1 else psfs[0],
            psfivm_files=(
                [np.full_like(psfs[0], 1e12)] * len(psfs)
                if len(psfs) > 1
                else np.full_like(psfs[0], 1e12)
            ),
            mag_zeropoint=25.0,
        )

    def _delta(hw):
        p = np.zeros((8, 8))
        p[4, 4] = 1.0
        return p

    psfs_b = [_delta(hw_b)]
    if npsf_b > 1:
        blur = np.full((8, 8), 0.0)
        blur[3:6, 3:6] = 1 / 9.0
        psfs_b.append(blur)
    return JointModel(
        [
            [_cfg(hw_a, [_delta(hw_a)]),
             Sky(adu=D.Uniform(loc=-2.0, scale=6.0))],
            [_cfg(hw_b, psfs_b),
             Sky(adu=D.Uniform(loc=-2.0, scale=6.0))],
        ]
    )


@pytest.mark.slow
def test_joint_multiband_hierarchy(rng):
    """Population on band A's sky level across K two-band targets
    (mixed band shapes): hyper + per-target recovery against the
    per-band MLEs, band B's independent levels untouched."""
    k, hw_a, hw_b, noise = 6, 12, 8, 0.4
    model = _joint_sky_model(hw_a, hw_b, noise)
    adus_a = 0.5 + 0.06 * rng.randn(k)
    adus_b = 1.2 + 0.3 * rng.randn(k)
    obs_a = adus_a[:, None, None] + rng.randn(k, hw_a, hw_a) * noise
    obs_b = adus_b[:, None, None] + rng.randn(k, hw_b, hw_b) * noise
    ivm_a = np.full((k, hw_a, hw_a), 1.0 / noise**2)
    ivm_b = np.full((k, hw_b, hw_b), 1.0 / noise**2)
    res = fit_hierarchical(
        model, [obs_a, obs_b], [ivm_a, ivm_b],
        population={"0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.005, scale=0.8),
        )},
        sampler="nuts", chains=4, burn=400, iterations=400, seed=71,
    )
    y_a = obs_a.mean(axis=(1, 2))
    y_b = obs_b.mean(axis=(1, 2))
    s_a = noise / hw_a
    assert abs(res.hyper_mean[0] - y_a.mean()) < (
        4 * res.hyper_std[0] + 0.02
    ), res.summary()
    # governed band-A levels shrink toward the population...
    np.testing.assert_allclose(
        res.target_mean[:, 0], y_a, atol=5 * s_a
    )
    # ...while band B's levels just follow their own data
    np.testing.assert_allclose(
        res.target_mean[:, 1], y_b, atol=5 * noise / hw_b
    )
    # stack-count validation
    with pytest.raises(ValueError, match="one obs/ivm stack per"):
        fit_hierarchical(
            model, [obs_a], [ivm_a],
            population={"0_Sky_adu": NormalPopulation(
                mu=D.Uniform(loc=-1.0, scale=3.0),
                sigma=D.Uniform(loc=0.005, scale=0.8),
            )},
        )


def test_joint_multiband_hierarchy_multipsf(rng):
    """Structural check: a joint template whose second band carries a
    stochastic 2-PSF selector runs under hierarchy (band-local
    marginalization) and reports Gibbs-filled integer index columns."""
    k, hw_a, hw_b, noise = 3, 12, 8, 0.4
    model = _joint_sky_model(hw_a, hw_b, noise, npsf_b=2)
    obs_a = 0.5 + rng.randn(k, hw_a, hw_a) * noise
    obs_b = 1.2 + rng.randn(k, hw_b, hw_b) * noise
    ivm_a = np.full((k, hw_a, hw_a), 1.0 / noise**2)
    ivm_b = np.full((k, hw_b, hw_b), 1.0 / noise**2)
    res = fit_hierarchical(
        model, [obs_a, obs_b], [ivm_a, ivm_b],
        population={"0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.005, scale=0.8),
        )},
        sampler="ensemble", burn=200, iterations=100, seed=72,
    )
    assert np.all(np.isfinite(res.hyper_chain))
    d = model.num_params
    idx_col = next(
        i for i, n in enumerate(res.param_names) if "PSF_Index" in n
    )
    idx = res.flatchain[:, [t * d + idx_col for t in range(k)]]
    assert set(np.unique(idx)) <= {0.0, 1.0}


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


def test_save_load_roundtrip(rng, tmp_path):
    """HierarchicalResult.save -> load_hierarchical_result rebuilds
    the result exactly (column layout, governed cards, diagnostics)."""
    from psfmc_tpu.hierarchy import load_hierarchical_result

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
        sampler="nuts", chains=2, burn=100, iterations=100, seed=81,
    )
    db = str(tmp_path / "hier_db.fits")
    res.save(db)
    back = load_hierarchical_result(db)
    assert back.param_names == res.param_names
    assert back.hyper_names == res.hyper_names
    assert back.num_targets == k
    assert back.governed == ["0_Sky_adu"]
    np.testing.assert_allclose(back.flatchain, res.flatchain,
                               rtol=0, atol=0)
    np.testing.assert_allclose(back.hyper_mean, res.hyper_mean)
    # the retained-draw lnp rides along (target_loglike's burn-in
    # leakage filter needs it)
    assert res.lnp is not None and len(res.lnp) == len(res.flatchain)
    np.testing.assert_allclose(back.lnp, res.lnp, rtol=0, atol=0)
    assert back.diagnostics["divergences"] == (
        res.diagnostics["divergences"]
    )
    # fit attaches the population families + template bounds; the
    # STATIC spec persists (round-3 verdict item 6), so a loaded
    # result predicts without resupplying populations=
    assert set(res.populations) == {"0_Sky_adu"}
    lo, hi = res.governed_bounds["0_Sky_adu"]
    assert (lo, hi) == (-2.0, 4.0)  # the Uniform template support
    draws = res.predict_population(n=500, seed=3)["0_Sky_adu"]
    assert draws.shape == (500,)
    assert np.all((draws > lo) & (draws < hi))
    assert back.governed_bounds["0_Sky_adu"] == (lo, hi)
    d2 = back.predict_population(n=500, seed=3)["0_Sky_adu"]
    np.testing.assert_allclose(d2, draws)  # same chain, same seed
    # loaded families are predict-only: refitting with their
    # placeholder hyper priors is refused loudly
    with pytest.raises(ValueError, match="placeholder"):
        fit_hierarchical(
            model, obs, ivm, population=back.populations,
            sampler="nuts", chains=2, burn=2, iterations=2, seed=1,
        )
    # a non-hierarchical file is rejected loudly
    other = str(tmp_path / "plain.fits")
    from psfmc_tpu.io.table import Table

    Table({"x": np.arange(4.0)}).write(other, format="fits",
                                       extname="TRACE")
    with pytest.raises(ValueError, match="not a hierarchical"):
        load_hierarchical_result(other)


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


# ---------------------------------------------------------------------
# leave-one-TARGET-out cross-validation (loo_targets)
# ---------------------------------------------------------------------

def test_target_loglike_matches_analytic(rng):
    """Each row of target_loglike equals the analytic f64 Gaussian
    log-density of that target's pixels at the draw's sky level (delta
    PSF, psfivm 1e12 -> PSF-variance channel negligible)."""
    from psfmc_tpu.hierarchy import target_loglike

    k, hw, noise = 3, 12, 0.5
    obs, ivm, _ = _sky_stacks(rng, k, hw, noise, 0.3, 0.08)
    model = _sky_model(hw, noise)
    # hand-built draws: (S, K*d) with d = 1 (adu); extra hyper columns
    # beyond K*d must be ignored
    thetas = np.array(
        [[0.10, 0.35, 0.52, 99.0, 99.0],
         [0.44, 0.21, -0.05, 99.0, 99.0]]
    )
    ll = target_loglike(model, obs, ivm, thetas)
    assert ll.shape == (2, k)
    var = noise**2
    for s in range(2):
        for t in range(k):
            r = obs[t].astype(np.float64) - thetas[s, t]
            expect = (-0.5 * np.sum(r * r) / var
                      - 0.5 * hw * hw * np.log(2 * np.pi * var))
            np.testing.assert_allclose(ll[s, t], expect, atol=0.1)


def test_target_loglike_multipsf_mixture_weight(rng):
    """With two IDENTICAL PSFs the marginalized per-target density is
    logsumexp(l, l) - ln 2 = l: it must equal the single-PSF model's
    value exactly — the proper-mixture constant check."""
    from psfmc_tpu.hierarchy import target_loglike

    hw, noise, k = 16, 0.05, 2
    obs = 0.1 + rng.randn(k, hw, hw) * noise
    ivm = np.full((k, hw, hw), 1.0 / noise**2)
    m2 = _ps_model_two_psf(hw, noise, sigmas=(1.5, 1.5))
    p1, _ = _two_psfs(sigmas=(1.5, 1.5))
    m1 = MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((hw, hw)),
                obsivm_file=np.full((hw, hw), 1.0 / noise**2),
                psf_files=p1,
                psfivm_files=np.full_like(p1, 1e12),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.0, scale=0.05)),
            PointSource(
                xy=D.Uniform(loc=(6.0, 6.0), scale=(4.0, 4.0)),
                mag=D.Uniform(loc=19.5, scale=2.5),
            ),
        ]
    )
    # shared slots: [adu, mag, xy_x, xy_y]; the 2-PSF layout appends
    # the index column (overridden by the marginalization)
    base = np.array(
        [[0.02, 20.5, 7.5, 8.0, 0.01, 21.0, 8.5, 7.0]]
    ).reshape(1, k, 4)
    th1 = base.reshape(1, -1)
    th2 = np.concatenate(
        [base, np.zeros((1, k, 1))], axis=2
    ).reshape(1, -1)
    ll1 = target_loglike(m1, obs, ivm, th1)
    ll2 = target_loglike(m2, obs, ivm, th2)
    np.testing.assert_allclose(ll2, ll1, rtol=1e-5, atol=2e-3)


def test_loo_targets_end_to_end(rng):
    """Grouped PSIS-LOO over targets from a real hierarchical fit:
    sane shapes/diagnostics, the paired compare() of a fit against
    itself is exactly zero, and the draw subsampler works."""
    from psfmc_tpu.analysis.model_comparison import compare
    from psfmc_tpu.hierarchy import loo_targets, target_loglike

    k, hw, noise = 4, 12, 0.5
    obs, ivm, _ = _sky_stacks(rng, k, hw, noise, 0.3, 0.08)
    model = _sky_model(hw, noise)
    res = fit_hierarchical(
        model, obs, ivm,
        population={"0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.01, scale=0.6),
        )},
        sampler="ensemble", burn=400, iterations=200, seed=9,
    )
    loo = loo_targets(model, obs, ivm, res, max_samples=200)
    assert loo.kind == "loo-target"
    assert loo.n_points == k
    assert np.isfinite(loo.elpd) and np.isfinite(loo.se)
    assert loo.pareto_k.shape == (k,)
    assert "targets" in loo.summary()
    # partial pooling on a well-specified mock: p_eff per target < 1
    assert 0.0 < loo.p_eff < 2.0 * k, loo.summary()
    d, sd = compare(loo, loo)
    assert d == 0.0 and sd == 0.0
    # subsampling caps the draw count deterministically
    ll = target_loglike(model, obs, ivm, res, max_samples=37, seed=1)
    assert ll.shape == (37, k)


# ---------------------------------------------------------------------
# posterior-predictive population draws (predict_population)
# ---------------------------------------------------------------------

def _synthetic_result(hyper_chain, hyper_names, populations=None,
                      governed_bounds=None):
    """Minimal HierarchicalResult carrying only the hyper posterior
    (predict_population reads nothing else)."""
    governed = sorted({n.split(":")[0] for n in hyper_names})
    return HierarchicalResult(
        param_names=["x"],
        hyper_names=list(hyper_names),
        num_targets=1,
        target_mean=np.zeros((1, 1)),
        target_std=np.ones((1, 1)),
        hyper_chain=np.asarray(hyper_chain, np.float64),
        governed=governed,
        populations=populations,
        governed_bounds=governed_bounds,
    )


def test_predict_population_folds_hyper_uncertainty(rng):
    """Normal population with mu ~ N(m0, s_mu) posterior and pinned
    sigma: the predictive is N(m0, sqrt(sigma^2 + s_mu^2)) exactly
    (Gaussian convolution) — wider than the plug-in N(m0, sigma)."""
    m0, s_mu, sigma = 2.0, 0.3, 0.5
    s = 4000
    chain = np.stack(
        [m0 + s_mu * rng.randn(s), np.full(s, sigma)], axis=1
    )
    pop = NormalPopulation(mu=D.Uniform(loc=0.0, scale=4.0),
                           sigma=D.Uniform(loc=0.01, scale=2.0))
    res = _synthetic_result(chain, ["p:mu", "p:sigma"],
                            populations={"p": pop})
    x = res.predict_population(n=200_000, seed=7)["p"]
    # fold the chain's own realized moments, not the nominal ones
    target_var = sigma**2 + chain[:, 0].var()
    assert abs(x.mean() - chain[:, 0].mean()) < 0.01
    assert abs(x.var() - target_var) < 0.01
    assert x.var() > sigma**2 + 0.5 * s_mu**2  # genuinely wider


def test_predict_population_truncation_matches_truncnorm(rng):
    """Pinned hyperparameters + a one-sided template bound: the
    rejection-truncated draws match scipy's truncnorm moments."""
    from scipy import stats

    mu, sigma, lo = 1.0, 1.0, 1.5
    chain = np.tile([[mu, sigma]], (64, 1))
    pop = NormalPopulation(mu=D.Uniform(loc=0.0, scale=4.0),
                           sigma=D.Uniform(loc=0.01, scale=2.0))
    res = _synthetic_result(
        chain, ["p:mu", "p:sigma"], populations={"p": pop},
        governed_bounds={"p": (lo, np.inf)},
    )
    x = res.predict_population(n=100_000, seed=11)["p"]
    ref = stats.truncnorm((lo - mu) / sigma, np.inf, loc=mu,
                          scale=sigma)
    assert np.all(x > lo)
    assert abs(x.mean() - ref.mean()) < 3e-2
    assert abs(x.std() - ref.std()) < 3e-2


def test_predict_population_lognormal_and_errors(rng):
    """LogNormal predictive draws live on the log scale; hopeless
    truncation raises instead of spinning; unknown families raise."""
    chain = np.tile([[0.5, 0.2]], (32, 1))
    pop = LogNormalPopulation(mu=D.Uniform(loc=-2.0, scale=4.0),
                              sigma=D.Uniform(loc=0.01, scale=2.0))
    res = _synthetic_result(chain, ["p:mu", "p:sigma"],
                            populations={"p": pop})
    x = res.predict_population(n=50_000, seed=5)["p"]
    assert np.all(x > 0)
    assert abs(np.log(x).mean() - 0.5) < 0.01
    assert abs(np.log(x).std() - 0.2) < 0.01
    # population mass nowhere near the template support -> loud error
    res.governed_bounds = {"p": (1e6, np.inf)}
    with pytest.raises(RuntimeError, match="barely overlaps"):
        res.predict_population(n=100, max_tries=5)
    # family without a sampler form
    class _NoSampler:
        hyper_names = ("mu", "sigma")
    res.populations = {"p": _NoSampler()}
    with pytest.raises(TypeError, match="no sampler"):
        res.predict_population(n=10)


def test_target_loglike_drops_burnin_leakage(rng):
    """A HierarchicalResult carrying lnp gets the robust floor filter:
    one descent row at lnp ~ -1e6 is dropped (with a warning) and the
    replay matrix matches the clean-result matrix exactly."""
    from psfmc_tpu.hierarchy import target_loglike

    k, hw, noise = 2, 12, 0.5
    obs, ivm, _ = _sky_stacks(rng, k, hw, noise, 0.3, 0.08)
    model = _sky_model(hw, noise)
    good = np.array(
        [[0.10, 0.35, 9.0, 9.0],
         [0.44, 0.21, 9.0, 9.0],
         [0.30, 0.28, 9.0, 9.0]]
    )
    poison = np.vstack([good, [[-1.9, 3.9, 9.0, 9.0]]])

    def _res(flat, lnp):
        return HierarchicalResult(
            param_names=["0_Sky_adu"], hyper_names=["h:a", "h:b"],
            num_targets=k, target_mean=np.zeros((k, 1)),
            target_std=np.ones((k, 1)),
            hyper_chain=flat[:, k:], governed=["0_Sky_adu"],
            flatchain=flat, lnp=lnp,
        )

    clean = target_loglike(model, obs, ivm, _res(good, None))
    lnp = np.array([-10.0, -11.0, -9.5, -1e6])
    with pytest.warns(UserWarning, match="burn-in leakage"):
        filtered = target_loglike(model, obs, ivm, _res(poison, lnp))
    np.testing.assert_allclose(filtered, clean, rtol=0, atol=0)
    # flatchain-less result objects error clearly
    bare = _res(good, None)
    bare.flatchain = None
    with pytest.raises(ValueError, match="no flatchain"):
        target_loglike(model, obs, ivm, bare)


def test_waic_unit_plumbing():
    """waic on a target matrix reports targets, not pixels."""
    from psfmc_tpu.analysis.model_comparison import compare, waic

    rng2 = np.random.RandomState(0)
    ll = -0.5 * rng2.rand(200, 4)
    w = waic(loglike=ll, unit="targets")
    assert "4 targets" in w.summary()
    with pytest.raises(ValueError, match="targets"):
        compare(w, waic(loglike=ll[:, :3], unit="targets"))


# ---------------------------------------------------------------------
# scaling-relation populations (RegressionPopulation)
# ---------------------------------------------------------------------

def _regression_setup(rng, k=10, hw=16, noise=0.3,
                      alpha_t=0.02, beta_t=0.05, sig_t=0.01, x0=0.5):
    """Sky(adu, dx) targets with dx_k = alpha + beta*(adu_k-x0) + eps:
    both per-target parameters are sharply measured (adu from the mean
    level, dx from the plane tilt), so the hyper posterior must land
    on the injected relation."""
    from psfmc_tpu.hierarchy import RegressionPopulation

    adus = x0 + 0.4 * rng.randn(k)
    dxs = alpha_t + beta_t * (adus - x0) + sig_t * rng.randn(k)
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
            Sky(adu=D.Uniform(loc=-2.0, scale=6.0),
                dx=D.Uniform(loc=-1.0, scale=2.0)),
        ]
    )
    xg = np.arange(hw) - (hw - 1) / 2.0
    obs = (adus[:, None, None]
           + dxs[:, None, None] * xg[None, None, :]
           + rng.randn(k, hw, hw) * noise)
    ivm = np.full((k, hw, hw), 1.0 / noise**2)
    pop = RegressionPopulation(
        covariate="0_Sky_adu",
        alpha=D.Uniform(loc=-0.5, scale=1.0),
        beta=D.Uniform(loc=-1.0, scale=2.0),
        sigma=D.Uniform(loc=0.001, scale=0.3),
        x0=x0,
    )
    return model, obs, ivm, pop, adus, dxs


@pytest.mark.slow
def test_regression_population_recovery(rng):
    """(alpha, beta, sigma) of the injected relation recovered through
    the pixel likelihood; the predictive at a covariate value sits on
    the line."""
    model, obs, ivm, pop, adus, dxs = _regression_setup(rng)
    res = fit_hierarchical(
        model, obs, ivm, population={"0_Sky_dx": pop},
        sampler="nuts", chains=2, burn=300, iterations=300, seed=1,
    )
    a_hat, b_hat, s_hat = res.hyper_mean
    a_sd, b_sd, s_sd = res.hyper_std
    # truth within posterior error (generous: K=10 targets)
    assert abs(a_hat - 0.02) < 4 * a_sd + 0.005, res.summary()
    assert abs(b_hat - 0.05) < 4 * b_sd + 0.005, res.summary()
    assert s_hat < 0.05, res.summary()  # scatter not inflated
    # per-target dx shrink toward the relation, not away
    assert np.all(np.abs(res.target_mean[:, 1] - dxs) < 0.01)
    # conditional predictive at x: mean on the line, var >= sigma^2
    pred = res.predict_population(
        n=20000, seed=2, covariates={"0_Sky_dx": 0.9}
    )["0_Sky_dx"]
    line = a_hat + b_hat * (0.9 - 0.5)
    assert abs(pred.mean() - line) < 0.005
    # array covariates broadcast per draw
    xs = np.linspace(0.1, 0.9, 20000)
    band = res.predict_population(
        n=20000, seed=3, covariates={"0_Sky_dx": xs}
    )["0_Sky_dx"]
    fit_beta = np.polyfit(xs, band, 1)[0]
    assert abs(fit_beta - b_hat) < 0.02
    # a conditional family without covariates= errors clearly
    with pytest.raises(ValueError, match="conditional density"):
        res.predict_population(n=10)


@pytest.mark.slow
def test_regression_noncentered_and_governed_covariate(rng):
    """The covariate itself governed (NormalPopulation on adu) with the
    regression listed after it, under parametrization='noncentered':
    hyper posteriors match the centered fit and the reported flatchain
    holds CONSTRAINED values (the double-reconstruction ordering)."""
    model, obs, ivm, pop, adus, dxs = _regression_setup(rng)
    pops = {
        "0_Sky_adu": NormalPopulation(
            mu=D.Uniform(loc=-1.0, scale=3.0),
            sigma=D.Uniform(loc=0.01, scale=2.0),
        ),
        "0_Sky_dx": pop,
    }
    r_c = fit_hierarchical(
        model, obs, ivm, population=pops, sampler="nuts",
        chains=2, burn=300, iterations=300, seed=3,
    )
    r_nc = fit_hierarchical(
        model, obs, ivm, population=pops, sampler="nuts",
        chains=2, burn=300, iterations=300, seed=4,
        parametrization="noncentered",
    )
    names = r_c.hyper_names
    assert names == ["0_Sky_adu:mu", "0_Sky_adu:sigma",
                     "0_Sky_dx:alpha", "0_Sky_dx:beta",
                     "0_Sky_dx:sigma"]
    for j in range(len(names)):
        tol = 4 * np.hypot(r_c.hyper_std[j], r_nc.hyper_std[j]) + 0.01
        assert abs(r_c.hyper_mean[j] - r_nc.hyper_mean[j]) < tol, (
            names[j], r_c.summary(), r_nc.summary())
    # flatchain reports constrained dx values (not residuals): the
    # per-target means must sit at the measured tilts for BOTH fits
    for r in (r_c, r_nc):
        assert np.all(np.abs(r.target_mean[:, 1] - dxs) < 0.01)


def test_regression_validation(rng):
    """Covariate plumbing errors are loud and specific."""
    from psfmc_tpu.hierarchy import RegressionPopulation

    model, obs, ivm, pop, _, _ = _regression_setup(rng, k=3)

    def fit(population):
        return fit_hierarchical(
            model, obs, ivm, population=population,
            sampler="ensemble", burn=10, iterations=10, seed=5,
        )

    mk = lambda cov: RegressionPopulation(
        covariate=cov,
        alpha=D.Uniform(loc=-0.5, scale=1.0),
        beta=D.Uniform(loc=-1.0, scale=2.0),
        sigma=D.Uniform(loc=0.001, scale=0.3),
    )
    with pytest.raises(ValueError, match="unknown covariate"):
        fit({"0_Sky_dx": mk("0_Sky_nope")})
    with pytest.raises(ValueError, match="own covariate"):
        fit({"0_Sky_dx": mk("0_Sky_dx")})
    # governed covariate listed AFTER its dependent: rejected
    with pytest.raises(ValueError, match="FIRST"):
        fit({
            "0_Sky_dx": mk("0_Sky_adu"),
            "0_Sky_adu": NormalPopulation(
                mu=D.Uniform(loc=-1.0, scale=3.0),
                sigma=D.Uniform(loc=0.01, scale=2.0),
            ),
        })
    with pytest.raises(TypeError, match="covariate must name"):
        mk(3)
    with pytest.raises(TypeError, match="must be a prior"):
        RegressionPopulation(covariate="0_Sky_adu", alpha=1.0,
                             beta=D.Uniform(loc=0, scale=1),
                             sigma=D.Uniform(loc=0, scale=1))


# ---------------------------------------------------------------------
# survey mode: per-target PSFs (psf_stack=) in hierarchical fits
# ---------------------------------------------------------------------

def _ps_model_sigma(hw, noise, sigma, mag_prior=None):
    """Single-PSF PointSource model with a Gaussian PSF of width sigma."""
    yy, xx = np.mgrid[:hw, :hw] - (hw - 1) / 2.0
    p = np.exp(-(xx**2 + yy**2) / (2 * sigma**2))
    p = p / p.sum()
    return MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((hw, hw)),
                obsivm_file=np.full((hw, hw), 1.0 / noise**2),
                psf_files=p,
                psfivm_files=np.full_like(p, 1e12),
                mag_zeropoint=25.0,
            ),
            PointSource(
                xy=D.Uniform(loc=(6.0, 6.0), scale=(4.0, 4.0)),
                mag=mag_prior or D.Uniform(loc=19.5, scale=2.5),
            ),
        ]
    ), p


def test_per_target_psf_replay_parity(rng):
    """psf_stack entries equal to the template's own PSF reproduce the
    baked-constant per-target log-likelihoods exactly."""
    from psfmc_tpu.hierarchy import target_loglike

    hw, noise, k = 16, 0.05, 3
    model, psf = _ps_model_sigma(hw, noise, 1.5)
    thetas = model.init_params_from_priors(4 * k, random_state=rng)
    flat = thetas.reshape(4, k * model.spec.num_params)
    obs = rng.randn(k, hw, hw) * noise
    ivm = np.full((k, hw, hw), 1.0 / noise**2)
    base = target_loglike(model, obs, ivm, flat)
    surv = target_loglike(
        model, obs, ivm, flat,
        psf_stack=[psf] * k,
        psfivm_stack=[np.full_like(psf, 1e12)] * k,
    )
    np.testing.assert_allclose(surv, base, rtol=1e-6, atol=1e-6)
    # a genuinely different PSF changes the likelihoods
    _, psf2 = _ps_model_sigma(hw, noise, 2.4)
    other = target_loglike(
        model, obs, ivm, flat,
        psf_stack=[psf2] * k,
        psfivm_stack=[np.full_like(psf2, 1e12)] * k,
    )
    assert np.max(np.abs(other - base)) > 1e-3


@pytest.mark.slow
def test_per_target_psf_population_recovery(rng):
    """K point sources each observed with its OWN PSF width: the
    survey-mode hierarchical fit recovers the mag population, and the
    per-target data terms prefer the true PSFs over forcing the
    template PSF on every target."""
    from psfmc_tpu.hierarchy import target_loglike

    hw, noise, k = 16, 0.02, 4
    sigmas = [1.2, 1.6, 2.0, 2.4]
    mu_true, sig_true = 20.6, 0.2
    rng2 = np.random.RandomState(21)
    mags = mu_true + sig_true * rng2.randn(k)
    template, _tpsf = _ps_model_sigma(hw, noise, sigmas[0])
    obs = np.zeros((k, hw, hw))
    psfs, psfivms = [], []
    thetas = template.init_params_from_priors(k, random_state=rng2)
    names = list(template.param_names)
    assert names == ["0_PointSource_mag", "0_PointSource_xy"]
    thetas[:, 0] = mags
    for t in range(k):
        gen, p = _ps_model_sigma(hw, noise, sigmas[t])
        mock, _ = gen.simulate(theta=thetas[t], random_state=100 + t)
        obs[t] = mock
        psfs.append(p)
        psfivms.append(np.full_like(p, 1e12))
    ivm = np.full((k, hw, hw), 1.0 / noise**2)
    pop = {"0_PointSource_mag": NormalPopulation(
        mu=D.Uniform(loc=19.5, scale=2.5),
        sigma=D.Uniform(loc=0.02, scale=1.5),
    )}
    res = fit_hierarchical(
        template, obs, ivm, population=pop,
        sampler="nuts", chains=2, burn=300, iterations=300, seed=9,
        psf_stack=psfs, psfivm_stack=psfivms,
    )
    assert abs(res.hyper_mean[0] - np.mean(mags)) < max(
        0.15, 4 * res.hyper_std[0]
    ), res.summary()
    assert np.all(np.abs(res.target_mean[:, 0] - mags) < 0.1), (
        res.target_mean[:, 0] - mags
    )
    # falsification: replaying the chain against the template PSF for
    # every target scores the broad-PSF targets much worse
    ll_true = target_loglike(
        template, obs, ivm, res,
        psf_stack=psfs, psfivm_stack=psfivms,
    )
    ll_wrong = target_loglike(template, obs, ivm, res)
    delta = ll_true.mean(axis=0) - ll_wrong.mean(axis=0)
    assert delta[0] == pytest.approx(0.0, abs=2.0)  # target 0 IS the template
    assert np.all(delta[1:] > 10.0), delta


def test_per_target_psf_validation(rng):
    model, psf = _ps_model_sigma(12, 0.5, 1.4)
    obs = rng.randn(3, 12, 12) * 0.5
    ivm = np.full((3, 12, 12), 4.0)
    pop = {"0_PointSource_mag": NormalPopulation(
        mu=D.Uniform(loc=19.5, scale=2.5),
        sigma=D.Uniform(loc=0.02, scale=1.5),
    )}
    ivms = [np.full_like(psf, 1e12)] * 2
    with pytest.raises(ValueError, match="together"):
        fit_hierarchical(model, obs, ivm, pop, psf_stack=[psf] * 3,
                         sampler="ensemble", burn=2, iterations=2)
    with pytest.raises(ValueError, match="target count"):
        fit_hierarchical(
            model, obs, ivm, pop,
            psf_stack=[psf] * 2, psfivm_stack=ivms,
            sampler="ensemble", burn=2, iterations=2,
        )


def test_population_spec_persistence_unit(tmp_path):
    """Static family specs (df, covariate, x0) and governed bounds
    round-trip through save/load without running a fit."""
    from psfmc_tpu.hierarchy import (
        HierarchicalResult,
        RegressionPopulation,
        StudentTPopulation,
        load_hierarchical_result,
    )

    n, k = 32, 2
    rng = np.random.RandomState(0)
    flat = rng.randn(n, k * 2 + 5)
    res = HierarchicalResult(
        param_names=["0_Sky_adu", "0_Sky_dx"],
        hyper_names=["0_Sky_adu:mu", "0_Sky_adu:sigma",
                     "0_Sky_dx:alpha", "0_Sky_dx:beta",
                     "0_Sky_dx:sigma"],
        num_targets=k,
        target_mean=flat[:, : k * 2].reshape(n, k, 2).mean(0),
        target_std=flat[:, : k * 2].reshape(n, k, 2).std(0),
        hyper_chain=flat[:, k * 2:],
        governed=["0_Sky_adu", "0_Sky_dx"],
        flatchain=flat,
        populations={
            "0_Sky_adu": StudentTPopulation(
                mu=D.Normal(loc=0.0, scale=1.0),
                sigma=D.Uniform(loc=0.0, scale=1.0),
                df=7.5,
            ),
            "0_Sky_dx": RegressionPopulation(
                covariate="0_Sky_adu",
                alpha=D.Normal(loc=0.0, scale=1.0),
                beta=D.Normal(loc=0.0, scale=1.0),
                sigma=D.Uniform(loc=0.0, scale=1.0),
                x0=21.25,
            ),
        },
        governed_bounds={
            "0_Sky_adu": (-2.0, 4.0),
            "0_Sky_dx": (-np.inf, np.inf),
        },
    )
    db = str(tmp_path / "spec_db.fits")
    res.save(db)
    back = load_hierarchical_result(db)
    st = back.populations["0_Sky_adu"]
    rg = back.populations["0_Sky_dx"]
    assert type(st).__name__ == "StudentTPopulation"
    assert st.df == 7.5
    assert type(rg).__name__ == "RegressionPopulation"
    assert rg.covariate == "0_Sky_adu"
    assert rg.x0 == 21.25
    assert back.governed_bounds["0_Sky_adu"] == (-2.0, 4.0)
    assert back.governed_bounds["0_Sky_dx"] == (-np.inf, np.inf)
    # predictions agree with the in-memory result (regression needs
    # its covariate value)
    a = res.predict_population(n=200, seed=5,
                               covariates={"0_Sky_dx": 21.0})
    b = back.predict_population(n=200, seed=5,
                                covariates={"0_Sky_dx": 21.0})
    np.testing.assert_allclose(a["0_Sky_adu"], b["0_Sky_adu"])
    np.testing.assert_allclose(a["0_Sky_dx"], b["0_Sky_dx"])
