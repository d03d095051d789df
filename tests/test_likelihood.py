"""Likelihood families: Gaussian (reference parity) + robust Student-t.

Anchors: scipy.stats parity for the Student-t density, Gaussian limit
at large df, build-time validation, and the robustness property the
feature exists for — unmasked outlier pixels drag a Gaussian fit but
not a Student-t one.
"""
import numpy as np
import pytest
import jax.numpy as jnp
from scipy import stats

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import Configuration, Sky
from psfmc_tpu.models.posterior import build_posterior
from psfmc_tpu.models.spec import build_model_spec
from psfmc_tpu.ops.likelihood import (
    gaussian_lnlike,
    make_lnlike,
    student_t_lnlike,
)


def test_student_t_matches_scipy(rng):
    resid = rng.randn(16, 16) * 0.3
    ivm = rng.rand(16, 16) * 10 + 0.5
    good = rng.rand(16, 16) > 0.1
    ivm = np.where(good, ivm, 0.0)
    for df in (1.5, 4.0, 30.0):
        got = float(
            student_t_lnlike(
                jnp.asarray(resid), jnp.asarray(ivm), jnp.asarray(good), df
            )
        )
        sigma = 1.0 / np.sqrt(ivm[good])
        want = stats.t.logpdf(resid[good], df, scale=sigma).sum()
        assert got == pytest.approx(want, rel=1e-6), df


def test_student_t_gaussian_limit(rng):
    resid = rng.randn(8, 8) * 0.1
    ivm = np.full((8, 8), 25.0)
    good = np.ones((8, 8), bool)
    g = float(gaussian_lnlike(jnp.asarray(resid), jnp.asarray(ivm),
                              jnp.asarray(good)))
    t = float(student_t_lnlike(jnp.asarray(resid), jnp.asarray(ivm),
                               jnp.asarray(good), 1e6))
    assert t == pytest.approx(g, abs=1e-2)


def test_validation():
    with pytest.raises(ValueError):
        make_lnlike("cauchy")
    with pytest.raises(ValueError):
        make_lnlike("student", df=-1.0)
    with pytest.raises(ValueError):
        Configuration(
            obs_file=np.zeros((8, 8)),
            obsivm_file=np.ones((8, 8)),
            psf_files=np.ones((4, 4)) / 16,
            psfivm_files=np.ones((4, 4)),
            mag_zeropoint=25.0,
            likelihood="cauchy",
        )


def test_student_fit_resists_outliers(rng, gaussian_psf):
    """Hot pixels NOT flagged in the IVM: the Gaussian sky estimate is
    dragged by many posterior sigma, the Student-t one is not."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    noise = 0.01
    sky_t = 0.2
    obs = np.full((32, 32), sky_t) + rng.randn(32, 32) * noise
    # 3 unmasked cosmic rays at +200 sigma
    for (y, x) in [(5, 7), (20, 11), (27, 28)]:
        obs[y, x] += 200 * noise

    def run(likelihood):
        config = Configuration(
            obs_file=obs,
            obsivm_file=np.full((32, 32), 1.0 / noise**2),
            psf_files=gaussian_psf,
            psfivm_files=np.ones_like(gaussian_psf) * 1e8,
            mag_zeropoint=25.0,
            likelihood=likelihood,
            likelihood_df=4.0,
        )
        spec = build_model_spec(
            [config, Sky(adu=D.Uniform(loc=0.0, scale=0.5))]
        )
        fns = build_posterior(spec, dtype=jnp.float64)
        nw = 16
        p0 = sky_t + rng.randn(nw, 1) * 0.01
        s = EnsembleSampler(nw, 1, fns, seed=0)
        s.init_state(p0)
        s.run_burn(150)
        s.reset()
        s.run_sampling(150)
        flat = np.asarray(s.chain).reshape(-1)
        return flat.mean(), flat.std()

    g_mean, g_std = run("gaussian")
    t_mean, t_std = run("student")
    # expected Gaussian drag: 3 * 200 sigma / 1024 px ~ 0.59 noise
    # ~ 19 posterior sigma; Student-t caps each outlier's pull
    assert (g_mean - sky_t) / g_std > 5.0
    assert abs(t_mean - sky_t) / t_std < 4.0
    assert abs(t_mean - sky_t) < abs(g_mean - sky_t) / 3.0


def test_joint_bands_keep_their_likelihood(rng, gaussian_psf):
    """A Configuration's likelihood choice must survive into joint
    (multi-band) fits — each band keeps its own family."""
    from psfmc_tpu.models import JointModel
    from psfmc_tpu.models.components import PointSource
    from psfmc_tpu.ops.likelihood import gaussian_lnlike

    noise = 0.01
    obs_fixed = 0.1 + rng.randn(24, 24) * noise

    def band(likelihood):
        cfg = Configuration(
            obs_file=obs_fixed.copy(),
            obsivm_file=np.full((24, 24), 1.0 / noise**2),
            psf_files=gaussian_psf[4:28, 4:28],
            psfivm_files=np.ones((24, 24)) * 1e8,
            mag_zeropoint=25.0,
            likelihood=likelihood,
        )
        return [
            cfg,
            PointSource(
                xy=D.Uniform(loc=(8.0, 8.0), scale=(8.0, 8.0)),
                mag=D.Uniform(loc=20.0, scale=2.0),
            ),
        ]

    joint = JointModel([band("student"), band("gaussian")])
    fns = joint.posterior_fns
    assert fns.band_fns[0]._lnlike is not gaussian_lnlike
    assert fns.band_fns[1]._lnlike is gaussian_lnlike
    # numeric: band-0 likelihood equals its standalone student value
    theta = np.array([20.5, 12.0, 11.5, 20.5, 12.0, 11.5])
    b0 = float(fns.band_fns[0].log_likelihood(
        jnp.asarray(theta)
    ))
    spec0 = build_model_spec(band("student"))
    solo = build_posterior(spec0, dtype=fns.band_fns[0].dtype)
    b0_solo = float(solo.log_likelihood(jnp.asarray(theta[:3])))
    assert b0 == pytest.approx(b0_solo, rel=1e-6)


def test_student_posterior_is_differentiable(rng, gaussian_psf):
    """NUTS/MAP differentiate the Student-t likelihood; gradients must
    be finite (including at large residuals where the Gaussian would
    saturate)."""
    import jax

    config = Configuration(
        obs_file=0.1 + rng.randn(32, 32) * 0.01,
        obsivm_file=np.full((32, 32), 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e8,
        mag_zeropoint=25.0,
        likelihood="student",
        likelihood_df=4.0,
    )
    spec = build_model_spec(
        [config, Sky(adu=D.Uniform(loc=-1.0, scale=3.0))]
    )
    fns = build_posterior(spec, dtype=jnp.float64)
    for adu in (0.1, 1.9):  # near truth and far (90-sigma residuals)
        g = jax.grad(fns.log_posterior)(jnp.asarray([adu]))
        assert np.all(np.isfinite(np.asarray(g))), (adu, np.asarray(g))


# ---------------------------------------------------------------------------
# Poisson (Cash) family — low-count imaging beyond the reference


def test_poisson_matches_scipy(rng):
    from psfmc_tpu.ops.likelihood import (
        make_lnlike_pointwise,
        poisson_lnlike,
    )

    model = np.abs(rng.rand(12, 12)) * 50 + 5
    k = rng.poisson(model).astype(np.float64)
    resid = k - model
    good = rng.rand(12, 12) > 0.1
    ivm = np.ones((12, 12))
    pw = make_lnlike_pointwise("poisson", gain=1.0)
    m = np.asarray(pw(jnp.asarray(resid), jnp.asarray(ivm),
                      jnp.asarray(good), jnp.asarray(model)))
    want = stats.poisson.logpmf(k, model)
    assert np.allclose(m[good], want[good], rtol=1e-8)
    assert np.all(m[~good] == 0.0)
    # single-twin rule: scalar == sum of the pointwise map
    s = float(poisson_lnlike(jnp.asarray(resid), jnp.asarray(ivm),
                             jnp.asarray(good), jnp.asarray(model), 1.0))
    assert s == pytest.approx(float(m.sum()), rel=1e-12)
    # gain invariance: ADU data at gain g == raw counts at gain 1
    g = 4.0
    s_g = float(poisson_lnlike(
        jnp.asarray(resid / g), jnp.asarray(ivm), jnp.asarray(good),
        jnp.asarray(model / g), g,
    ))
    assert s_g == pytest.approx(s, rel=1e-10)
    # nonpositive expected counts at a good pixel = invalid model
    bad_model = model.copy()
    bad_model[3, 3] = -0.5
    s_bad = float(poisson_lnlike(
        jnp.asarray(k - bad_model), jnp.asarray(ivm), jnp.asarray(good),
        jnp.asarray(bad_model), 1.0,
    ))
    assert s_bad == -np.inf


def test_poisson_cdf_matches_scipy(rng):
    from psfmc_tpu.ops.likelihood import make_cdf_pointwise

    model = np.abs(rng.rand(10, 10)) * 30 + 2
    k = rng.poisson(model).astype(np.float64)
    good = rng.rand(10, 10) > 0.1
    cdf = make_cdf_pointwise("poisson", gain=1.0)
    got = np.asarray(cdf(jnp.asarray(k - model), jnp.ones((10, 10)),
                         jnp.asarray(good), jnp.asarray(model)))
    want = stats.poisson.cdf(k, model)
    assert np.allclose(got[good], want[good], rtol=1e-8)
    assert np.all(got[~good] == 0.5)


def _poisson_config(obs, gain=1.0, **kw):
    h, w = obs.shape
    psf = np.zeros((8, 8))
    psf[3:5, 3:5] = 0.25
    return Configuration(
        obs_file=obs,
        obsivm_file=np.ones((h, w)),  # mask only under poisson
        psf_files=psf,
        psfivm_files=np.ones((8, 8)) * 1e12,
        mag_zeropoint=25.0,
        likelihood="poisson",
        likelihood_gain=gain,
        **kw,
    )


def test_poisson_validation(rng):
    from psfmc_tpu.models.components import NoiseScale

    with pytest.raises(ValueError, match="likelihood_gain"):
        make_lnlike("poisson", gain=0.0)
    # background-subtracted (negative) data rejected at build
    obs = np.abs(rng.rand(16, 16)) * 5
    obs[4, 4] = -0.3
    with pytest.raises(ValueError, match="non-negative"):
        build_model_spec([
            _poisson_config(obs),
            Sky(adu=D.Uniform(loc=0.1, scale=5.0)),
        ])
    # a sampled NoiseScale is inert under poisson -> rejected
    with pytest.raises(ValueError, match="NoiseScale"):
        build_model_spec([
            _poisson_config(np.abs(rng.rand(16, 16)) * 5),
            Sky(adu=D.Uniform(loc=0.1, scale=5.0)),
            NoiseScale(scale=D.Uniform(loc=0.5, scale=2.0)),
        ])


def test_poisson_fit_recovers_low_counts(rng):
    """End-to-end at ~3 counts/px sky: framework-generated Poisson mock
    (simulate routes noise through the shared replicate_noise rule),
    ensemble fit with the exact Poisson likelihood, truth recovered
    within the posterior's own uncertainty."""
    from psfmc_tpu.models.components import PointSource
    from psfmc_tpu.models.multicomponent import MultiComponentModel
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    sky_t, mag_t = 3.0, 22.0  # ~3 counts/px sky, ~158-count source
    comps = [
        _poisson_config(np.full((24, 24), sky_t)),
        Sky(adu=D.Uniform(loc=1.0, scale=4.0)),
        PointSource(
            xy=D.Uniform(loc=(10.0, 10.0), scale=(4.0, 4.0)),
            mag=D.Uniform(loc=21.0, scale=2.0),
        ),
    ]
    model = MultiComponentModel(components=comps)
    truth = np.array([sky_t, mag_t, 12.0, 12.0])
    mock, _ = model.simulate(theta=truth, random_state=7)
    assert np.all(mock >= 0) and np.all(mock == np.round(mock))

    refit = MultiComponentModel(components=[
        _poisson_config(mock),
        Sky(adu=D.Uniform(loc=1.0, scale=4.0)),
        PointSource(
            xy=D.Uniform(loc=(10.0, 10.0), scale=(4.0, 4.0)),
            mag=D.Uniform(loc=21.0, scale=2.0),
        ),
    ])
    nw, dim = 32, 4
    p0 = refit.init_params_from_priors(
        nw, random_state=np.random.RandomState(8)
    )
    s = EnsembleSampler(nw, dim, refit.posterior_fns, seed=9)
    s.init_state(p0)
    s.run_burn(400)
    s.reset()
    s.run_sampling(300)
    flat = np.asarray(s.chain, np.float64).reshape(-1, dim)
    mean, std = flat.mean(0), flat.std(0)
    pulls = (mean - truth) / std
    assert np.all(np.abs(pulls) < 5.0), (mean, std, pulls)
    # single-twin rule through the model: pointwise sum == scalar lnL
    # (host f64 re-sum of the fetched f32 map vs the device f32 tree
    # reduction — identical terms, different summation order)
    fns = refit.posterior_fns
    th = jnp.asarray(mean)
    assert float(np.sum(np.asarray(fns.pointwise_log_likelihood(th)))) \
        == pytest.approx(float(fns.log_likelihood(th)), rel=5e-6)
    # image products under poisson: MCCHI2NU switches to the reduced
    # Poisson deviance (the Gaussian chi^2 has no meaning without a
    # variance plane) and must come out O(1) on a true-model fit
    import os
    import tempfile

    from psfmc_tpu.analysis.images import save_posterior_images
    from psfmc_tpu.database import save_database
    from psfmc_tpu.io import fits as pfits

    with tempfile.TemporaryDirectory() as td:
        dbp = os.path.join(td, "poisson_db.fits")
        save_database(s, refit, dbp, meta_dict={"MCITER": 300})
        from psfmc_tpu.database import load_database

        refit.set_accumulated_from_sampler(s)
        out = os.path.join(td, "out_{}")
        save_posterior_images(
            refit, load_database(dbp), output_name=out, ppc_draws=20
        )
        hdr = pfits.getheader(out.format("residual") + ".fits")
        assert 0.3 < float(hdr["MCCHI2NU"]) < 3.0
        comment = next(
            c for k, _v, c in hdr.cards() if k == "MCCHI2NU"
        )
        assert "deviance" in comment


def test_poisson_posterior_is_differentiable(rng):
    import jax

    obs = rng.poisson(4.0, size=(16, 16)).astype(np.float64)
    spec = build_model_spec([
        _poisson_config(obs),
        Sky(adu=D.Uniform(loc=0.5, scale=10.0)),
    ])
    fns = build_posterior(spec, dtype=jnp.float64)
    for adu in (4.0, 9.0):
        g = jax.grad(fns.log_posterior)(jnp.asarray([adu]))
        assert np.all(np.isfinite(np.asarray(g))), (adu, np.asarray(g))


def test_poisson_beats_naive_gaussian_at_low_counts(rng):
    """The reason the family exists: at few-counts-per-pixel depth the
    common practice (Gaussian likelihood with ivm = 1/max(counts, 1))
    systematically biases the sky estimate — weighting by OBSERVED
    counts overweights downward fluctuations.  The exact Poisson
    likelihood is unbiased on the same data."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    sky_t = 2.0  # 2 counts/px
    counts = rng.poisson(sky_t, size=(48, 48)).astype(np.float64)

    def run(likelihood, ivm):
        comps = [
            Configuration(
                obs_file=counts,
                obsivm_file=ivm,
                psf_files=np.full((8, 8), 1.0 / 64),
                psfivm_files=np.full((8, 8), 1e12),
                mag_zeropoint=25.0,
                likelihood=likelihood,
            ),
            Sky(adu=D.Uniform(loc=0.5, scale=4.0)),
        ]
        spec = build_model_spec(comps)
        fns = build_posterior(spec, dtype=jnp.float64)
        s = EnsembleSampler(16, 1, fns, seed=2)
        s.init_state(sky_t + rng.randn(16, 1) * 0.1)
        s.run_burn(200)
        s.reset()
        s.run_sampling(200)
        flat = np.asarray(s.chain, np.float64).reshape(-1)
        return flat.mean(), flat.std()

    naive_ivm = 1.0 / np.maximum(counts, 1.0)
    g_mean, g_std = run("gaussian", naive_ivm)
    p_mean, p_std = run("poisson", np.ones_like(counts))
    g_pull = (g_mean - sky_t) / g_std
    p_pull = (p_mean - sky_t) / p_std
    # naive-Gaussian bias is many posterior sigma; Poisson is calibrated
    assert abs(g_pull) > 5.0, (g_mean, g_std)
    assert abs(p_pull) < 4.0, (p_mean, p_std)


def test_joint_band_poisson(rng, gaussian_psf):
    """A Poisson band inside a joint fit keeps its family and its gain
    (the per-band ModelSpec must carry likelihood_gain through)."""
    from psfmc_tpu.models import JointModel
    from psfmc_tpu.models.components import PointSource

    counts = rng.poisson(3.0, size=(24, 24)).astype(np.float64)
    obs_g = 0.1 + rng.randn(24, 24) * 0.01

    cfg_p = Configuration(
        obs_file=counts,
        obsivm_file=np.ones((24, 24)),
        psf_files=gaussian_psf[4:28, 4:28],
        psfivm_files=np.ones((24, 24)) * 1e8,
        mag_zeropoint=25.0,
        likelihood="poisson",
        likelihood_gain=2.0,
    )
    cfg_g = Configuration(
        obs_file=obs_g,
        obsivm_file=np.full((24, 24), 1e4),
        psf_files=gaussian_psf[4:28, 4:28],
        psfivm_files=np.ones((24, 24)) * 1e8,
        mag_zeropoint=25.0,
    )

    def band(cfg):
        # a Poisson band needs positive expected counts EVERYWHERE —
        # without the Sky, off-source pixels have mu = 0 and the model
        # is correctly rejected with -inf
        return [
            cfg,
            Sky(adu=D.Uniform(loc=0.01, scale=5.0)),
            PointSource(
                xy=D.Uniform(loc=(8.0, 8.0), scale=(8.0, 8.0)),
                mag=D.Uniform(loc=20.0, scale=2.0),
            ),
        ]

    joint = JointModel([band(cfg_p), band(cfg_g)])
    fns = joint.posterior_fns
    assert fns.band_fns[0].spec.likelihood == "poisson"
    assert fns.band_fns[0].spec.likelihood_gain == 2.0
    theta = np.array([3.0, 21.0, 12.0, 11.5, 0.1, 21.0, 12.0, 11.5])
    b0 = float(fns.band_fns[0].log_likelihood(jnp.asarray(theta)))
    assert np.isfinite(b0)
    # standalone twin at the same theta
    spec0 = build_model_spec(band(cfg_p))
    solo = build_posterior(spec0, dtype=fns.band_fns[0].dtype)
    b0_solo = float(solo.log_likelihood(jnp.asarray(theta[:4])))
    assert b0 == pytest.approx(b0_solo, rel=1e-8)
    assert np.isfinite(float(fns.log_posterior(jnp.asarray(theta))))
