"""Marginal-likelihood estimation via parallel tempering.

Analytic anchor: a 2-D Uniform([-a, a]^2) prior with a standard-normal
likelihood has evidence

    Z = (2a)^{-2} * erf(a / sqrt(2))^2  ~  (2a)^{-2}   for a >> 1,

so lnZ = -2 ln(2a) up to ~1e-6 at a = 5.  Both estimators (stepping
stone and thermodynamic integration) must recover it.  The reference
has no evidence capability at all — this tests a beyond-reference
feature (SURVEY.md section 2 item 17 is the sampler family it extends).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from psfmc_tpu.sampler.tempered import (
    PTEnsembleSampler,
    evidence_beta_ladder,
)


class BoxGaussianPosterior:
    """Uniform([-a, a]^2) prior x N(0, I_2) likelihood."""

    dtype = jnp.float64
    a = 5.0

    def __init__(self):
        class _Spec:
            shape = (2, 2)

        self.spec = _Spec()

    def log_prior(self, theta):
        inside = jnp.all(jnp.abs(theta) <= self.a)
        return jnp.where(
            inside,
            jnp.asarray(-2.0 * np.log(2 * self.a), self.dtype),
            -jnp.inf,
        )

    def _log_like(self, theta):
        return -0.5 * jnp.sum(theta * theta) - jnp.log(2 * jnp.pi)

    def log_posterior(self, theta):
        return self.log_prior(theta) + self._log_like(theta)

    def log_posterior_and_images(self, theta):
        lnp = self.log_posterior(theta)
        return lnp, {"img": jnp.ones((2, 2), self.dtype) * theta[0]}


TRUTH = -2.0 * np.log(10.0)  # -4.60517...


def test_evidence_beta_ladder():
    b = evidence_beta_ladder(6, bmin=1e-3)
    assert b[0] == 1.0 and b[-1] == 0.0 and len(b) == 6
    assert np.all(np.diff(b) < 0)
    assert np.isclose(b[-2], 1e-3)


def _run_pt(nwalkers=64, ntemps=10, burn=300, steps=1200, seed=3):
    post = BoxGaussianPosterior()
    pt = PTEnsembleSampler(
        nwalkers,
        2,
        post,
        ntemps=ntemps,
        betas=evidence_beta_ladder(ntemps),
        seed=seed,
        image_shape=(2, 2),
    )
    rng = np.random.RandomState(0)
    pt.init_state(rng.uniform(-5, 5, (nwalkers, 2)))
    pt.run_burn(burn)
    pt.reset()
    pt.run_sampling(steps)
    return pt


def test_evidence_recovers_analytic_lnz():
    pt = _run_pt()

    lnz_ss, err_ss = pt.log_evidence("stepping-stone")
    lnz_ti, err_ti = pt.log_evidence("ti")

    # stepping stone is the precise one; TI pays trapezoid error on the
    # ~1/beta region of the mean-lnL curve
    assert abs(lnz_ss - TRUTH) < 0.15, (lnz_ss, TRUTH)
    assert abs(lnz_ti - TRUTH) < 0.6, (lnz_ti, TRUTH)
    # auto prefers stepping stone when the ladder reaches beta=0
    assert pt.log_evidence() == (lnz_ss, err_ss)
    # error bars are honest order-of-magnitude statements
    assert err_ss < 1.0 and err_ti < 1.5

    # per-rung diagnostics: mean lnL decreases towards the prior rung
    m = pt.rung_log_like_mean
    assert m[0] > m[-1]
    # cold rung: E[lnL] = -ln(2 pi) - d/2 = -2.838
    assert abs(m[0] - (-np.log(2 * np.pi) - 1.0)) < 0.1
    assert np.all(pt.rung_log_like_std >= 0)


def test_evidence_survives_checkpoint_roundtrip():
    pt = _run_pt(steps=400)
    lnz, err = pt.log_evidence()

    payload = pt.checkpoint_payload()
    fresh = PTEnsembleSampler(
        pt.nwalkers,
        2,
        BoxGaussianPosterior(),
        ntemps=pt.ntemps,
        betas=evidence_beta_ladder(pt.ntemps),
        seed=99,
        image_shape=(2, 2),
    )
    fresh.restore_state(payload)
    fresh._nsteps_total = payload["nsteps"]
    lnz2, err2 = fresh.log_evidence()
    assert np.isclose(lnz, lnz2) and np.isclose(err, err2)


def test_ais_recovers_analytic_lnz():
    from psfmc_tpu.sampler.ais import ais_beta_schedule, ais_evidence

    post = BoxGaussianPosterior()
    rng = np.random.RandomState(11)
    p0 = rng.uniform(-post.a, post.a, (128, 2))  # exact prior draws
    res = ais_evidence(
        post, nwalkers=128, nsteps=600, groups=8, seed=5, p0=p0
    )
    # AIS anneals in time: finer effective resolution than a 10-rung
    # ladder, so a tighter tolerance than the PT estimators
    assert abs(res.lnz - TRUTH) < 0.1, (res.lnz, TRUTH)
    # the group-to-group error bar covers the actual miss (3 sigma)
    assert abs(res.lnz - TRUTH) < 3.5 * max(res.err, 0.02)
    assert res.ess > 0.2 * res.nwalkers  # healthy weight dispersion
    assert 0.1 < res.accept_fraction < 0.9

    # schedule validation
    s = ais_beta_schedule(100)
    assert s[0] == 0.0 and s[-1] == 1.0 and np.all(np.diff(s) >= 0)
    with pytest.raises(ValueError):
        ais_evidence(post, nwalkers=128, p0=p0,
                     schedule=np.linspace(0.1, 1, 50))
    with pytest.raises(ValueError):
        ais_evidence(post, nwalkers=8, groups=8, p0=p0)  # 1 walker/group


def test_ais_imaging_posterior_group_consistency():
    """SMC evidence on a real (small) imaging posterior: independent
    walker groups must agree — group disagreement flags mode-finding
    failure (measured with 8 walkers/group; 64/group agrees to <1)."""
    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import Configuration, Sersic, Sky
    from psfmc_tpu.models.multicomponent import MultiComponentModel
    from psfmc_tpu.sampler.ais import ais_evidence

    rng = np.random.RandomState(3)
    h = w = 24
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 12) ** 2 + (yy - 12) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()
    obs = (
        0.02
        + 1.5 * np.exp(-(((xx - 11.4) ** 2 + (yy - 12.6) ** 2)) / (2 * 2.0**2))
        + rng.randn(h, w) * 0.03
    )
    comps = [
        Configuration(
            obs_file=obs,
            obsivm_file=np.full((h, w), 1.0 / 0.03**2),
            psf_files=psf,
            psfivm_files=np.full((h, w), 1e8),
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.0, scale=0.1)),
        Sersic(
            xy=D.Uniform(loc=np.array([8.0, 8.0]),
                         scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=19.0, scale=4.0),
            reff=D.Uniform(loc=0.5, scale=4.5),
            reff_b=D.Uniform(loc=0.5, scale=4.5),
            index=1.0,
            angle=0.0,
        ),
    ]
    mcm = MultiComponentModel(components=comps)
    res = ais_evidence(
        mcm.posterior_fns, nwalkers=128, nsteps=800, groups=2,
        sweeps=2, seed=1,
    )
    assert np.isfinite(res.lnz)
    assert res.nresample > 0  # imaging lnL ranges force resampling
    # both independent groups found the source mode and agree
    assert abs(res.lnz_groups[0] - res.lnz_groups[1]) < 6.0, res.lnz_groups


def test_model_comparison_bayes_factor():
    """model_galaxy_evidence: the ln Bayes factor must strongly favor
    the source+sky model over sky-only when a bright source is present
    — the actual scientific use case ('does this image need a host?')."""
    from psfmc_tpu import model_galaxy_evidence
    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import Configuration, Sersic, Sky

    rng = np.random.RandomState(6)
    h = w = 24
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 12) ** 2 + (yy - 12) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()
    obs = (
        0.02
        + 1.0 * np.exp(-(((xx - 12.2) ** 2 + (yy - 11.7) ** 2)) / (2 * 2.0**2))
        + rng.randn(h, w) * 0.05
    )

    def config():
        return Configuration(
            obs_file=obs,
            obsivm_file=np.full((h, w), 1.0 / 0.05**2),
            psf_files=psf,
            psfivm_files=np.full((h, w), 1e8),
            mag_zeropoint=25.0,
        )

    sky_only = [config(), Sky(adu=D.Normal(loc=0.0, scale=0.3))]
    sky_sersic = [
        config(),
        Sky(adu=D.Normal(loc=0.0, scale=0.3)),
        Sersic(
            xy=D.Uniform(loc=np.array([8.0, 8.0]),
                         scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=19.0, scale=4.0),
            reff=D.Uniform(loc=0.5, scale=4.5),
            reff_b=D.Uniform(loc=0.5, scale=4.5),
            index=1.0,
            angle=0.0,
        ),
    ]
    r_sky = model_galaxy_evidence(
        sky_only, nwalkers=64, nsteps=300, groups=2, sweeps=1, seed=1
    )
    r_full = model_galaxy_evidence(
        sky_sersic, nwalkers=128, nsteps=800, groups=2, sweeps=2, seed=1
    )
    ln_bayes = r_full.lnz - r_sky.lnz
    # the source is ~20 sigma significant in aggregate: the Bayes
    # factor must be decisively positive (and huge)
    assert ln_bayes > 100, (r_full.lnz, r_sky.lnz)


def test_ais_requires_prior_decomposition():
    from psfmc_tpu.sampler.ais import ais_evidence

    class NoPrior:
        dtype = jnp.float64

        def log_posterior(self, theta):
            return -0.5 * jnp.sum(theta * theta)

    with pytest.raises(ValueError):
        ais_evidence(NoPrior(), nwalkers=32, nsteps=10)


def test_driver_writes_evidence_metadata(tmp_path):
    """A tempered model_galaxy_mcmc run persists MCLNZ/MCLNZERR in the
    trace-database header (evidence rides the normal fit for free)."""
    import os

    from psfmc_tpu import model_galaxy_mcmc, load_database
    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import Configuration, Sersic, Sky

    rng = np.random.RandomState(4)
    h = w = 24
    psf = np.zeros((8, 8))
    psf[4, 4] = 1.0
    comps = [
        Configuration(
            obs_file=0.1 + rng.randn(h, w) * 0.02,
            obsivm_file=np.full((h, w), 2500.0),
            psf_files=psf,
            psfivm_files=np.ones_like(psf) * 1e8,
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.1, scale=0.05)),
        Sersic(
            xy=D.Uniform(loc=np.array([8.0, 8.0]),
                         scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=20.0, scale=4.0),
            reff=D.Uniform(loc=1.0, scale=5.0),
            reff_b=D.Uniform(loc=1.0, scale=5.0),
            index=1.0,
            angle=0.0,
        ),
    ]
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model_galaxy_mcmc(
            comps,
            output_name="evid",
            iterations=30,
            burn=30,
            chains=16,
            ntemps=3,
            max_iterations=1,
            convergence_check=lambda s, verbose=0: True,
        )
        db = load_database("evid_db.fits")
    finally:
        os.chdir(cwd)
    assert np.isfinite(db.meta["MCLNZ"])
    assert np.isfinite(db.meta["MCLNZERR"]) and db.meta["MCLNZERR"] >= 0


def test_evidence_requires_retained_samples():
    post = BoxGaussianPosterior()
    pt = PTEnsembleSampler(
        16, 2, post, ntemps=4, betas=evidence_beta_ladder(4),
        seed=0, image_shape=(2, 2),
    )
    rng = np.random.RandomState(1)
    pt.init_state(rng.uniform(-5, 5, (16, 2)))
    pt.run_burn(20)
    with pytest.raises(RuntimeError):
        pt.log_evidence()
    # mixing-oriented ladder (no beta=0 rung): stepping stone refuses,
    # TI integrates with an extrapolated tail
    pt2 = PTEnsembleSampler(
        16, 2, post, ntemps=4, seed=0, image_shape=(2, 2),
        adapt_ladder=False,
    )
    pt2.init_state(rng.uniform(-5, 5, (16, 2)))
    pt2.run_sampling(50)
    with pytest.raises(ValueError):
        pt2.log_evidence("stepping-stone")
    lnz, _err = pt2.log_evidence()  # auto falls back to TI
    assert np.isfinite(lnz)


def test_ais_mixed_moves():
    """SMC transitions with the stretch+DE mixture target the same
    tempered path: the analytic evidence is still recovered."""
    from psfmc_tpu.sampler.ais import ais_evidence

    post = BoxGaussianPosterior()
    rng = np.random.RandomState(21)
    p0 = rng.uniform(-post.a, post.a, (128, 2))
    res = ais_evidence(
        post, nwalkers=128, nsteps=500, groups=4, seed=9, p0=p0,
        moves="mixed",
    )
    assert abs(res.lnz - TRUTH) < 0.2, (res.lnz, TRUTH)
    with pytest.raises(ValueError):
        ais_evidence(post, nwalkers=128, nsteps=10, p0=p0, moves="bogus")


class TwoPlateauPosterior:
    """Rigged bimodal posterior: two likelihood plateaus separated by an
    impassable chasm, so walker groups initialized on opposite sides
    CANNOT exchange and their per-group evidence estimates disagree by
    ~10 lnZ units (the group-stranding failure mode)."""

    dtype = jnp.float64
    a = 10.0

    def __init__(self):
        class _Spec:
            shape = (2, 2)

        self.spec = _Spec()

    def log_prior(self, theta):
        inside = jnp.all(jnp.abs(theta) <= self.a)
        return jnp.where(
            inside,
            jnp.asarray(-2.0 * np.log(2 * self.a), self.dtype),
            -jnp.inf,
        )

    def _log_like(self, theta):
        x = theta[0]
        # left plateau lnL=0, right plateau lnL=10, chasm between
        return jnp.where(
            jnp.abs(x) < 8.0, -1e5, jnp.where(x > 0, 10.0, 0.0)
        )

    def log_posterior(self, theta):
        return self.log_prior(theta) + self._log_like(theta)


def test_ais_warns_on_group_stranding():
    """CRITICAL failure mode #1: groups stranded in different modes
    produce a large group spread; ais_evidence must warn, not average
    silently."""
    from psfmc_tpu.sampler.ais import ais_evidence

    post = TwoPlateauPosterior()
    rng = np.random.RandomState(3)
    # group 0 entirely in the left basin, group 1 in the right one
    m = 16
    left = np.column_stack(
        [rng.uniform(-10, -8.5, m), rng.uniform(-10, 10, m)]
    )
    right = np.column_stack(
        [rng.uniform(8.5, 10, m), rng.uniform(-10, 10, m)]
    )
    p0 = np.concatenate([left, right])
    with pytest.warns(UserWarning, match="stranded in"):
        res = ais_evidence(
            post, nwalkers=2 * m, nsteps=60, groups=2, seed=1, p0=p0
        )
    assert np.std(res.lnz_groups, ddof=1) > 3.0


def test_ais_warns_on_weight_degeneracy():
    """CRITICAL failure mode #2: a too-coarse anneal of a sharp
    likelihood collapses the importance weights (tiny pre-resample
    ESS); ais_evidence must warn that lnz is likely biased low."""
    from psfmc_tpu.sampler.ais import ais_evidence

    class SharpPosterior(BoxGaussianPosterior):
        def _log_like(self, theta):
            return -0.5 * jnp.sum(theta * theta) / 1e-4

    post = SharpPosterior()
    rng = np.random.RandomState(4)
    p0 = rng.uniform(-post.a, post.a, (64, 2))
    with pytest.warns(UserWarning, match="under-mixing"):
        res = ais_evidence(
            post,
            nwalkers=64,
            groups=2,
            seed=2,
            p0=p0,
            schedule=np.array([0.0, 0.5, 1.0]),
        )
    assert res.ess < 0.1 * res.nwalkers
