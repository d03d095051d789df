"""Predictive model comparison: WAIC + PSIS-LOO (beyond the reference).

Anchors: the pointwise matrix decomposes the sampler's exact scalar
likelihood; the Zhang-Stephens GPD fit recovers known shapes; PSIS-LOO
matches the ANALYTIC leave-one-out predictive of a conjugate Normal
model; and an end-to-end fit prefers the true model over a
source-less one by a decisive, paired-significant margin.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.analysis.model_comparison import (
    ELPDResult,
    _gpd_fit,
    compare,
    loo_pit,
    pointwise_loglike,
    psis_loo,
    waic,
)
from psfmc_tpu.models import JointModel, Tied
from psfmc_tpu.models.components import (
    Configuration,
    PointSource,
    Sersic,
    Sky,
)
from psfmc_tpu.models.multicomponent import MultiComponentModel
from psfmc_tpu.sampler.ensemble import EnsembleSampler


# ---------------------------------------------------------------------------
# unit anchors
# ---------------------------------------------------------------------------

def _gpd_draws(rng, k, sigma, n):
    u = rng.random_sample(n)
    if abs(k) < 1e-12:
        return -sigma * np.log1p(-u)
    return sigma / k * ((1.0 - u) ** (-k) - 1.0)


@pytest.mark.parametrize("k_true", [-0.3, 0.1, 0.6])
def test_gpd_fit_recovers_known_shape(k_true):
    rng = np.random.RandomState(42)
    sigma_true = 1.7
    rows = np.sort(
        np.array(
            [_gpd_draws(rng, k_true, sigma_true, 4000) for _ in range(6)]
        ),
        axis=1,
    )
    k_hat, sigma_hat = _gpd_fit(rows)
    assert np.all(np.abs(k_hat - k_true) < 0.08), (k_hat, k_true)
    assert np.all(np.abs(sigma_hat / sigma_true - 1.0) < 0.12)


def test_psis_loo_matches_analytic_normal_loo():
    """Conjugate Normal: exact LOO predictive is available in closed
    form.  y_i ~ N(mu, 1), flat prior => mu | y ~ N(ybar, 1/n) and
    p(y_i | y_{-i}) = N(y_i; ybar_{-i}, 1 + 1/(n-1))."""
    rng = np.random.RandomState(7)
    n, s = 400, 4000
    y = rng.randn(n) + 2.0
    ybar = y.mean()
    mus = ybar + rng.randn(s) / np.sqrt(n)  # exact posterior draws
    ll = -0.5 * (y[None, :] - mus[:, None]) ** 2 - 0.5 * np.log(2 * np.pi)

    loo = psis_loo(loglike=ll)
    # exact leave-one-out predictive densities
    ybar_loo = (n * ybar - y) / (n - 1)
    var_loo = 1.0 + 1.0 / (n - 1)
    exact_i = -0.5 * (y - ybar_loo) ** 2 / var_loo - 0.5 * np.log(
        2 * np.pi * var_loo
    )
    exact = exact_i.sum()
    assert abs(loo.elpd - exact) < 0.5, (loo.elpd, exact)
    # one free parameter, well identified
    assert 0.5 < loo.p_eff < 2.0
    assert np.all(loo.pareto_k < 0.7)
    assert not loo.notes

    w = waic(loglike=ll)
    assert abs(w.elpd - loo.elpd) < 0.5
    assert 0.5 < w.p_eff < 2.0
    # ic is the deviance-scale alias
    assert np.isclose(w.ic, -2 * w.elpd)


def test_psis_smooths_heavy_tail_and_flags_it():
    """A pixel whose density is dominated by one posterior draw gets a
    large Pareto k and a warning."""
    rng = np.random.RandomState(3)
    s = 2000
    # healthy columns: nearly flat loglike -> light-tailed ratios
    ll = -0.5 * (0.2 * rng.randn(s, 3)) ** 2
    # rig column 0: importance ratios ~ exp(lognormal), far beyond any
    # power-law tail
    ll[:, 0] = -np.exp(3.5 * rng.randn(s))
    with pytest.warns(UserWarning, match="Pareto k"):
        loo = psis_loo(loglike=ll)
    assert loo.pareto_k[0] > 0.7
    assert np.all(loo.pareto_k[1:] < 0.7)
    assert loo.notes and "Pareto" in loo.summary()


# ---------------------------------------------------------------------------
# framework integration
# ---------------------------------------------------------------------------

def _config(obs, noise, psf, **kw):
    return Configuration(
        obs_file=obs,
        obsivm_file=np.full(obs.shape, 1.0 / noise**2),
        psf_files=psf,
        psfivm_files=np.full_like(psf, 1e10),
        mag_zeropoint=25.0,
        **kw,
    )


def _fit(model, nw=16, burn=300, keep=150, seed=0, rng_seed=5):
    sampler = EnsembleSampler(
        nw, model.num_params, model.posterior_fns, seed=seed
    )
    sampler.init_state(
        model.init_params_from_priors(
            nw, random_state=np.random.RandomState(rng_seed)
        )
    )
    sampler.run_burn(burn)
    sampler.reset()
    sampler.run_sampling(keep)
    return sampler


def test_pointwise_decomposes_scalar_likelihood(rng, gaussian_psf):
    noise = 0.01
    obs = 0.1 + rng.randn(32, 32) * noise
    obs[5, 7] = np.nan  # one masked pixel must drop out
    for kind in ("gaussian", "student"):
        comps = [
            _config(obs, noise, gaussian_psf, likelihood=kind),
            Sky(adu=D.Normal(loc=0.1, scale=0.05)),
            PointSource(
                xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
                mag=D.Uniform(loc=20.0, scale=2.0),
            ),
        ]
        model = MultiComponentModel(comps, dtype=jnp.float64)
        fns = model.posterior_fns
        thetas = model.init_params_from_priors(
            4, random_state=np.random.RandomState(2)
        )
        for th in thetas:
            pw = np.asarray(fns.pointwise_log_likelihood(jnp.asarray(th)))
            scalar = float(fns.log_likelihood(jnp.asarray(th)))
            assert np.isclose(pw.sum(), scalar, rtol=1e-10, atol=1e-8)
            # masked pixel contributes exactly zero
            assert pw[5, 7] == 0.0
        mat = pointwise_loglike(model, thetas=thetas, chunk=3)
        assert mat.shape == (4, 32 * 32 - 1)
        good = np.asarray(fns.constants["good_px"])
        pw0 = np.asarray(
            fns.pointwise_log_likelihood(jnp.asarray(thetas[0]))
        )
        # f32 device replay of f64-built thetas: compare loosely
        assert np.allclose(mat[0], pw0.reshape(-1)[good.reshape(-1)],
                           rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_model_selection_prefers_true_model(rng, gaussian_psf):
    noise = 0.01
    h = w = 32
    gen = MultiComponentModel(
        [
            _config(np.zeros((h, w)), noise, gaussian_psf),
            Sky(adu=0.1),
            PointSource(xy=np.array([16.2, 15.7]), mag=21.0),
        ],
        dtype=jnp.float64,
    )
    obs, _ = gen.simulate(random_state=rng)

    true_model = MultiComponentModel(
        [
            _config(obs, noise, gaussian_psf),
            Sky(adu=D.Uniform(loc=-0.2, scale=0.8)),
            PointSource(
                xy=D.Uniform(loc=(10.0, 10.0), scale=(12.0, 12.0)),
                mag=D.Uniform(loc=19.5, scale=3.0),
            ),
        ],
        dtype=jnp.float64,
    )
    null_model = MultiComponentModel(
        [
            _config(obs, noise, gaussian_psf),
            Sky(adu=D.Uniform(loc=-0.2, scale=0.8)),
        ],
        dtype=jnp.float64,
    )
    s_true = _fit(true_model)
    s_null = _fit(null_model, burn=150)

    ll_true = pointwise_loglike(true_model, thetas=s_true.flatchain[::4])
    ll_null = pointwise_loglike(null_model, thetas=s_null.flatchain[::4])
    loo_true = psis_loo(loglike=ll_true)
    loo_null = psis_loo(loglike=ll_null)
    assert isinstance(loo_true, ELPDResult)
    # The source carries ~orders-of-magnitude more predictive density.
    # NB the paired SE is inflated when the difference concentrates in
    # a handful of pixels (the source core) — sqrt(N var) assumes the
    # per-point differences are exchangeable, and here a few pixels
    # carry elpd differences of O(10^4) each; 3 sigma + a huge absolute
    # margin is the decisive criterion.
    delta, se = compare(loo_true, loo_null)
    assert delta > 1e3, (delta, se)
    assert delta > 3 * se, (delta, se)
    # well-specified model: p_eff ~ its 4 free parameters
    w_true = waic(loglike=ll_true)
    assert 1.5 < w_true.p_eff < 8.0
    assert not w_true.notes
    # misspecified model: the variance penalty explodes at the source
    # pixels (var(ln p) >> 0.4) and the reliability warning must fire —
    # WAIC's own failure mode under gross misfit, which is the reason
    # the diagnostic exists
    with pytest.warns(UserWarning, match="var"):
        w_null = waic(loglike=ll_null)
    assert w_null.notes
    assert w_null.elpd < loo_true.elpd
    # summaries render
    assert "PSIS-LOO" in loo_true.summary()
    assert "WAIC" in w_true.summary()


def test_compare_requires_same_data():
    a = ELPDResult("waic", 0.0, 1.0, 1.0, 10, np.zeros(5))
    b = ELPDResult("waic", 0.0, 1.0, 1.0, 10, np.zeros(6))
    with pytest.raises(ValueError, match="same data"):
        compare(a, b)


def test_compare_requires_same_unit():
    # per-pixel and per-target densities of coincidentally equal
    # length must NOT compare silently
    a = ELPDResult("loo", 0.0, 1.0, 1.0, 10, np.zeros(5), unit="pixels")
    b = ELPDResult("loo-target", 0.0, 1.0, 1.0, 10, np.zeros(5),
                   unit="targets")
    with pytest.raises(ValueError, match="unit"):
        compare(a, b)


def test_pointwise_loglike_joint_concatenates_bands(rng, gaussian_psf):
    noise = 0.05
    mk_obs = lambda: 0.05 + rng.randn(24, 24) * noise
    psf = gaussian_psf[4:28, 4:28]
    psf = psf / psf.sum()
    host = Sersic(
        xy=D.Uniform(loc=np.array([8.0, 8.0]), scale=np.array([8.0, 8.0])),
        mag=D.Uniform(loc=20.0, scale=2.0),
        reff=D.Uniform(loc=1.0, scale=4.0),
        reff_b=D.Uniform(loc=1.0, scale=4.0),
        index=1.0,
        angle=0.0,
    )
    tied = Sersic(
        xy=Tied(host, "xy"),
        mag=D.Uniform(loc=20.5, scale=2.0),
        reff=Tied(host, "reff"),
        reff_b=Tied(host, "reff_b"),
        index=Tied(host, "index"),
        angle=Tied(host, "angle"),
    )
    joint = JointModel(
        [
            [_config(mk_obs(), noise, psf), Sky(adu=0.05), host],
            [_config(mk_obs(), noise, psf), Sky(adu=0.05), tied],
        ]
    )
    thetas = joint.init_params_from_priors(
        3, random_state=np.random.RandomState(4)
    )
    mat = pointwise_loglike(joint, thetas=thetas)
    assert mat.shape == (3, 2 * 24 * 24)
    # per-band sums reproduce each band's scalar likelihood
    fns = joint.posterior_fns.band_fns
    for j, th in enumerate(thetas):
        s0 = float(fns[0].log_likelihood(jnp.asarray(th, jnp.float32)))
        s1 = float(fns[1].log_likelihood(jnp.asarray(th, jnp.float32)))
        np.testing.assert_allclose(
            mat[j, : 24 * 24].sum(), s0, rtol=1e-5
        )
        np.testing.assert_allclose(
            mat[j, 24 * 24 :].sum(), s1, rtol=1e-5
        )


def test_summary_cli_criticism(rng, tmp_path, gaussian_psf):
    """psfmc-summary --criticism MODEL_FILE prints LOO + sensitivity."""
    import io
    import os
    from contextlib import redirect_stdout

    from psfmc_tpu import model_galaxy_mcmc
    from psfmc_tpu.cli import summary_main
    from psfmc_tpu.io import fits

    h = w = 24
    psf = gaussian_psf[4:28, 4:28]
    psf = psf / psf.sum()
    noise = 0.05
    gen = MultiComponentModel(
        [
            _config(np.zeros((h, w)), noise, psf),
            Sky(adu=0.05),
            PointSource(xy=np.array([12.2, 11.7]), mag=20.5),
        ]
    )
    obs, _ = gen.simulate(random_state=rng)
    d = str(tmp_path)
    fits.writeto(os.path.join(d, "sci.fits"), obs.astype(np.float32))
    fits.writeto(os.path.join(d, "ivm.fits"),
                 np.full((h, w), 1.0 / noise**2, np.float32))
    fits.writeto(os.path.join(d, "psf.fits"), psf.astype(np.float32))
    fits.writeto(os.path.join(d, "psf_ivm.fits"),
                 np.full_like(psf, 1e10).astype(np.float32))
    with open(os.path.join(d, "model.py"), "w") as f:
        f.write(
            "from numpy import array\n"
            "from psfMC.ModelComponents import Configuration, Sky, "
            "PointSource\n"
            "from psfMC.distributions import Normal, Uniform\n"
            "Configuration(obs_file='sci.fits', obsivm_file='ivm.fits',"
            " psf_files='psf.fits', psfivm_files='psf_ivm.fits',"
            " mag_zeropoint=25.0)\n"
            "Sky(adu=Normal(loc=0.05, scale=0.1))\n"
            "PointSource(xy=Uniform(loc=array((8., 8.)),"
            " scale=array((8., 8.))), mag=Normal(loc=20.5, scale=1.0))\n"
        )
    prev = os.getcwd()
    os.chdir(d)
    try:
        model_galaxy_mcmc(
            "model.py", output_name="out_crit", iterations=150,
            burn=400, chains=16, seed=3,
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = summary_main(
                ["psfmc-summary", "--criticism", "model.py",
                 "out_crit_db.fits"]
            )
        out = buf.getvalue()
    finally:
        os.chdir(prev)
    assert "PSIS-LOO" in out
    assert "LOO-PIT" in out
    assert "power-scaling sensitivity" in out
    assert rc in (0, 1)
    # missing operand after the flag prints usage
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = summary_main(["psfmc-summary", "--criticism"])
    assert rc == 2


# ---------------------------------------------------------------------------
# LOO-PIT
# ---------------------------------------------------------------------------

def test_predictive_cdf_pointwise_matches_scipy():
    from scipy.stats import norm, t as t_dist

    from psfmc_tpu.ops.likelihood import (
        gaussian_cdf_pointwise,
        student_t_cdf_pointwise,
    )

    rng = np.random.RandomState(0)
    resid = rng.randn(5, 7) * 2.0
    ivm = np.exp(rng.randn(5, 7))
    good = rng.rand(5, 7) > 0.2
    g = np.asarray(gaussian_cdf_pointwise(resid, ivm, good))
    expect = norm.cdf(resid * np.sqrt(ivm))
    np.testing.assert_allclose(g[good], expect[good], atol=1e-6)
    assert np.all(g[~good] == 0.5)
    for df in (2.5, 4.0, 30.0):
        s = np.asarray(student_t_cdf_pointwise(resid, ivm, good, df))
        expect = t_dist.cdf(resid * np.sqrt(ivm), df)
        np.testing.assert_allclose(s[good], expect[good], atol=1e-5)


def test_loo_pit_uniform_and_overconfident():
    """Conjugate Normal: calibrated predictions give uniform PIT; the
    same posterior with an overconfident (halved-sigma) predictive
    noise piles PIT mass in the tails and fails the KS test."""
    from scipy.stats import norm

    rng = np.random.RandomState(11)
    n, s = 600, 3000
    y = rng.randn(n) + 1.0
    mus = y.mean() + rng.randn(s) / np.sqrt(n)
    resid = y[None, :] - mus[:, None]
    ll = -0.5 * resid**2 - 0.5 * np.log(2 * np.pi)
    cdf = norm.cdf(resid)
    res = loo_pit(loglike=ll, cdf=cdf)
    assert res.calibrated(), res.summary()
    assert "calibrated" in res.summary()
    # overconfident predictive: claimed sigma = 1/2
    ll_bad = -0.5 * (2 * resid) ** 2 - 0.5 * np.log(2 * np.pi / 4)
    cdf_bad = norm.cdf(2 * resid)
    bad = loo_pit(loglike=ll_bad, cdf=cdf_bad)
    assert not bad.calibrated(), bad.summary()
    assert np.mean((bad.pit < 0.05) | (bad.pit > 0.95)) > 0.15
    assert "NOT UNIFORM" in bad.summary()
    # shape mismatch guard
    with pytest.raises(ValueError, match="match"):
        loo_pit(loglike=ll, cdf=cdf[:, :-1])


@pytest.mark.slow
def test_loo_pit_e2e_detects_wrong_noise_model(rng, gaussian_psf):
    noise = 0.01
    h = w = 32
    gen = MultiComponentModel(
        [
            _config(np.zeros((h, w)), noise, gaussian_psf),
            Sky(adu=0.1),
            PointSource(xy=np.array([16.2, 15.7]), mag=21.0),
        ],
        dtype=jnp.float64,
    )
    obs, _ = gen.simulate(random_state=rng)

    def _model(claimed_noise):
        return MultiComponentModel(
            [
                _config(obs, claimed_noise, gaussian_psf),
                Sky(adu=D.Uniform(loc=-0.2, scale=0.8)),
                PointSource(
                    xy=D.Uniform(loc=(10.0, 10.0), scale=(12.0, 12.0)),
                    mag=D.Uniform(loc=19.5, scale=3.0),
                ),
            ],
            dtype=jnp.float64,
        )

    good_model = _model(noise)
    s_good = _fit(good_model, burn=500, keep=200)
    res = loo_pit(good_model, thetas=s_good.flatchain[::4])
    assert res.calibrated(), res.summary()

    # fit told the noise is half the truth: overconfident predictions
    bad_model = _model(noise / 2)
    s_bad = _fit(bad_model, burn=500, keep=200)
    res_bad = loo_pit(bad_model, thetas=s_bad.flatchain[::4])
    assert not res_bad.calibrated(), res_bad.summary()
    assert np.mean((res_bad.pit < 0.05) | (res_bad.pit > 0.95)) > 0.15


def test_resolve_thetas_filters_stuck_walkers(rng, gaussian_psf):
    """A walker stranded at catastrophic lnp must be dropped before
    replay (reference images.py:44 semantics) — measured on the
    flagship example, ONE stuck walker turned p_eff ~ 11 into 6e9."""
    from psfmc_tpu.database import load_database, save_database

    psf = gaussian_psf[8:24, 8:24]
    psf = psf / psf.sum()
    noise = 0.05
    obs = 0.1 + rng.randn(16, 16) * noise
    model = MultiComponentModel(
        [
            _config(obs, noise, psf),
            Sky(adu=D.Normal(loc=0.1, scale=0.2)),
        ],
        dtype=jnp.float64,
    )
    s = _fit(model, nw=8, burn=100, keep=100)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "db.fits")
        save_database(s, model, path)
        db = load_database(path)
        # doctor walker 3 into a stuck walker: absurd theta, terrible lnp
        wmask = np.asarray(db["walker"]) == 3
        adu = np.asarray(db["0_Sky_adu"], np.float64)
        lnp = np.asarray(db["lnprobability"], np.float64)
        adu[wmask] = 500.0
        lnp[wmask] = -1e6
        db["0_Sky_adu"] = adu
        db["lnprobability"] = lnp
        ll = pointwise_loglike(model, db)
        # every retained draw must be a sane one (the stuck rows would
        # contribute per-pixel lnl ~ -1e4)
        assert ll.min() > -1e3, ll.min()
        w = waic(loglike=ll)
        assert 0.2 < w.p_eff < 5.0, w.summary()


@pytest.mark.slow
def test_joint_model_criticism_from_database(rng, gaussian_psf):
    """The database entry path must work for joint multi-band models
    (thetas_from_database on JointModel)."""
    from psfmc_tpu.database import load_database, save_database
    from psfmc_tpu.analysis import power_scale_sensitivity

    noise = 0.05
    psf = gaussian_psf[4:28, 4:28]
    psf = psf / psf.sum()
    host = Sersic(
        xy=D.Uniform(loc=np.array([8.0, 8.0]), scale=np.array([8.0, 8.0])),
        mag=D.Normal(loc=20.5, scale=1.0),
        reff=D.Uniform(loc=1.0, scale=4.0),
        reff_b=D.Uniform(loc=1.0, scale=4.0),
        index=1.0,
        angle=0.0,
    )
    tied = Sersic(
        xy=Tied(host, "xy"),
        mag=D.Normal(loc=21.0, scale=1.0),
        reff=Tied(host, "reff"),
        reff_b=Tied(host, "reff_b"),
        index=Tied(host, "index"),
        angle=Tied(host, "angle"),
    )
    joint = JointModel(
        [
            [_config(0.05 + rng.randn(24, 24) * noise, noise, psf),
             Sky(adu=0.05), host],
            [_config(0.05 + rng.randn(24, 24) * noise, noise, psf),
             Sky(adu=0.05), tied],
        ]
    )
    s = _fit(joint, nw=16, burn=250, keep=100)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "db.fits")
        save_database(s, joint, path)
        db = load_database(path)
        loo = psis_loo(joint, db, max_samples=400)
        assert loo.elpd_i.size == 2 * 24 * 24
        assert np.isfinite(loo.elpd)
        pitres = loo_pit(joint, db, max_samples=400)
        assert np.isfinite(pitres.ks_stat)
        sens = power_scale_sensitivity(joint, db)
        assert np.all(np.isfinite(sens.prior))


def test_driver_criticism_headers(rng, tmp_path, gaussian_psf):
    """model_galaxy_mcmc(criticism=True) records the criticism block
    in every image product header."""
    import os

    from psfmc_tpu import model_galaxy_mcmc
    from psfmc_tpu.io import fits

    h = w = 24
    psf = gaussian_psf[4:28, 4:28]
    psf = psf / psf.sum()
    noise = 0.05
    gen = MultiComponentModel(
        [
            _config(np.zeros((h, w)), noise, psf),
            Sky(adu=0.05),
            PointSource(xy=np.array([12.2, 11.7]), mag=20.5),
        ]
    )
    obs, _ = gen.simulate(random_state=rng)
    d = str(tmp_path)
    fits.writeto(os.path.join(d, "sci.fits"), obs.astype(np.float32))
    fits.writeto(os.path.join(d, "ivm.fits"),
                 np.full((h, w), 1.0 / noise**2, np.float32))
    fits.writeto(os.path.join(d, "psf.fits"), psf.astype(np.float32))
    fits.writeto(os.path.join(d, "psf_ivm.fits"),
                 np.full_like(psf, 1e10).astype(np.float32))
    with open(os.path.join(d, "model.py"), "w") as f:
        f.write(
            "from numpy import array\n"
            "from psfMC.ModelComponents import Configuration, Sky, "
            "PointSource\n"
            "from psfMC.distributions import Normal, Uniform\n"
            "Configuration(obs_file='sci.fits', obsivm_file='ivm.fits',"
            " psf_files='psf.fits', psfivm_files='psf_ivm.fits',"
            " mag_zeropoint=25.0)\n"
            "Sky(adu=Normal(loc=0.05, scale=0.1))\n"
            "PointSource(xy=Uniform(loc=array((8., 8.)),"
            " scale=array((8., 8.))), mag=Normal(loc=20.5, scale=1.0))\n"
        )
    prev = os.getcwd()
    os.chdir(d)
    try:
        model_galaxy_mcmc(
            "model.py", output_name="out_hdr", iterations=150,
            burn=400, chains=16, seed=3, criticism=True,
        )
        hdr = fits.read_hdus("out_hdr_residual.fits")[0][0]
    finally:
        os.chdir(prev)
    for key in ("MCLOOELP", "MCLOOSE", "MCLOOPEF", "MCLOOKBD",
                "MCPITKS", "MCPITP", "MCPSFLAG"):
        assert key in hdr, key
    assert hdr["MCLOOPEF"] < 10.0
    assert hdr["MCPSFLAG"] == 0


def test_plot_criticism_sheet(rng, tmp_path, gaussian_psf):
    """plot_criticism writes the diagnostic pdf and returns results."""
    import matplotlib

    matplotlib.use("Agg")
    import os

    from psfmc_tpu.analysis import plot_criticism
    from psfmc_tpu.database import load_database, save_database

    psf = gaussian_psf[8:24, 8:24]
    psf = psf / psf.sum()
    noise = 0.05
    obs = 0.1 + rng.randn(16, 16) * noise
    obs[3, 4] = np.nan  # one masked pixel exercises the map rebuild
    model = MultiComponentModel(
        [
            _config(obs, noise, psf),
            Sky(adu=D.Normal(loc=0.1, scale=0.2)),
        ],
        dtype=jnp.float64,
    )
    s = _fit(model, nw=8, burn=150, keep=100)
    path = str(tmp_path / "critdb.fits")
    save_database(s, model, path)
    prev = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        loo, pit = plot_criticism(path, model, save=True, draws=200)
    finally:
        os.chdir(prev)
    assert os.path.exists(str(tmp_path / "critdb_criticism.pdf"))
    assert loo.elpd_i.size == 16 * 16 - 1
    assert np.isfinite(pit.ks_stat)
