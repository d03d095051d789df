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
