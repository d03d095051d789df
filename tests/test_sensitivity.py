"""Power-scaling sensitivity diagnostics (Kallioinen et al. 2023).

Anchors: CJS distance basics, the four conjugate-Normal diagnostic
regimes (robust / conflict / prior dominance / likelihood dominance),
and an end-to-end framework fit that comes back unflagged.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.analysis.sensitivity import (
    SensitivityResult,
    cjs_distance,
    power_scale_from_logs,
    power_scale_sensitivity,
)
from psfmc_tpu.models.components import Configuration, PointSource, Sky
from psfmc_tpu.models.multicomponent import MultiComponentModel
from psfmc_tpu.sampler.ensemble import EnsembleSampler


def test_cjs_distance_basics():
    rng = np.random.RandomState(0)
    x = rng.randn(3000)
    # identical weightings -> 0
    assert cjs_distance(x, np.ones_like(x)) == 0.0
    # a shift-reweight moves it away from 0, monotonically in strength
    d_weak = cjs_distance(x, np.exp(0.1 * x))
    d_strong = cjs_distance(x, np.exp(1.0 * x))
    assert 0 < d_weak < d_strong
    # degenerate input: constant sample
    assert cjs_distance(np.ones(100), np.ones(100)) == 0.0


def _conjugate_case(m0, s0, ybar_true, n, sigma=1.0, s_draws=4000, seed=0):
    rng = np.random.RandomState(seed)
    y = ybar_true + sigma * rng.randn(n)
    prec = 1 / s0**2 + n / sigma**2
    mpost = (m0 / s0**2 + y.sum() / sigma**2) / prec
    mus = mpost + rng.randn(s_draws) / np.sqrt(prec)
    lnprior = -0.5 * (mus - m0) ** 2 / s0**2
    lnlik = np.array([-0.5 * np.sum((y - m) ** 2) / sigma**2 for m in mus])
    return power_scale_from_logs(mus[:, None], lnprior, lnlik)


def test_conjugate_normal_diagnostic_regimes():
    # vague prior + strong data: prior index ~0, likelihood-dominated
    r = _conjugate_case(0.0, 100.0, 2.0, 50)
    assert r.prior[0] < 0.05
    assert r.likelihood[0] > 0.05
    assert r.diagnosis(0) == "likelihood-dominated (prior uninformative)"
    assert not r.flagged()

    # genuine prior-data conflict: both indices flag
    r = _conjugate_case(-5.0, 1.0, 5.0, 10)
    assert r.prior[0] > 0.2 and r.likelihood[0] > 0.2
    assert r.diagnosis(0) == "prior-data conflict"
    assert r.flagged() == ["p0"]

    # prior dominates agreeable but weak data
    r = _conjugate_case(0.0, 0.1, 0.0, 2)
    assert r.prior[0] > 0.05 > r.likelihood[0]
    assert r.diagnosis(0) == "strong prior / weak likelihood"

    # summary renders the table with the flag marker
    assert "prior-data conflict" in _conjugate_case(
        -5.0, 1.0, 5.0, 10
    ).summary()


def test_power_scale_requires_enough_draws(gaussian_psf):
    psf = gaussian_psf[8:24, 8:24]
    psf = psf / psf.sum()
    model = MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((16, 16)),
                obsivm_file=np.ones((16, 16)),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e8),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.0, scale=1.0)),
        ]
    )
    with pytest.raises(ValueError, match="100"):
        power_scale_sensitivity(model, thetas=np.zeros((5, 1)))


@pytest.mark.slow
def test_sensitivity_e2e_well_specified_fit(rng, gaussian_psf):
    noise = 0.01
    gaussian_psf = gaussian_psf[4:28, 4:28]
    gaussian_psf = gaussian_psf / gaussian_psf.sum()
    gen = MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((24, 24)),
                obsivm_file=np.full((24, 24), 1.0 / noise**2),
                psf_files=gaussian_psf,
                psfivm_files=np.full_like(gaussian_psf, 1e10),
                mag_zeropoint=25.0,
            ),
            Sky(adu=0.1),
            PointSource(xy=np.array([12.2, 11.7]), mag=21.0),
        ],
        dtype=jnp.float64,
    )
    obs, _ = gen.simulate(random_state=rng)
    model = MultiComponentModel(
        [
            Configuration(
                obs_file=obs,
                obsivm_file=np.full((24, 24), 1.0 / noise**2),
                psf_files=gaussian_psf,
                psfivm_files=np.full_like(gaussian_psf, 1e10),
                mag_zeropoint=25.0,
            ),
            # generous Normal priors (Uniform priors power-scale to
            # themselves — a Normal makes the prior term non-trivial)
            Sky(adu=D.Normal(loc=0.1, scale=0.2)),
            PointSource(
                xy=D.Uniform(loc=(8.0, 8.0), scale=(8.0, 8.0)),
                mag=D.Normal(loc=21.0, scale=1.5),
            ),
        ],
        dtype=jnp.float64,
    )
    s = EnsembleSampler(16, model.num_params, model.posterior_fns, seed=0)
    s.init_state(
        model.init_params_from_priors(
            16, random_state=np.random.RandomState(7)
        )
    )
    s.run_burn(300)
    s.reset()
    s.run_sampling(200)
    res = power_scale_sensitivity(model, thetas=s.flatchain)
    assert isinstance(res, SensitivityResult)
    assert res.param_names == [
        "0_Sky_adu",
        "1_PointSource_mag",
        "1_PointSource_xy_x",
        "1_PointSource_xy_y",
    ]
    # generous priors + informative data: nothing flagged
    assert not res.flagged(), res.summary()
    assert np.all(res.prior < 0.05), res.summary()
    for i in range(4):
        assert res.diagnosis(i) in (
            "robust",
            "likelihood-dominated (prior uninformative)",
        )


@pytest.mark.slow
def test_sensitivity_e2e_detects_conflicting_prior(rng, gaussian_psf):
    # NB the noise level is what makes this a CONFLICT: power-scaling
    # only registers a prior that is comparable in strength to the
    # likelihood.  At noise 0.01 the mag likelihood is ~1e-4 mag wide
    # and a sigma=0.1 prior 5 sigma away cannot move the posterior at
    # all (prior index ~0.02 — correctly unflagged, verified); at 0.5
    # the two pull with similar strength from incompatible centers.
    noise = 0.5
    gaussian_psf = gaussian_psf[4:28, 4:28]
    gaussian_psf = gaussian_psf / gaussian_psf.sum()
    gen = MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((24, 24)),
                obsivm_file=np.full((24, 24), 1.0 / noise**2),
                psf_files=gaussian_psf,
                psfivm_files=np.full_like(gaussian_psf, 1e10),
                mag_zeropoint=25.0,
            ),
            Sky(adu=0.1),
            PointSource(xy=np.array([12.2, 11.7]), mag=21.0),
        ],
        dtype=jnp.float64,
    )
    obs, _ = gen.simulate(random_state=rng)
    model = MultiComponentModel(
        [
            Configuration(
                obs_file=obs,
                obsivm_file=np.full((24, 24), 1.0 / noise**2),
                psf_files=gaussian_psf,
                psfivm_files=np.full_like(gaussian_psf, 1e10),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.1, scale=0.2)),
            PointSource(
                xy=D.Uniform(loc=(8.0, 8.0), scale=(8.0, 8.0)),
                # true mag is 21.0; this prior sits 5 of its own
                # sigmas away with strength comparable to the
                # likelihood (see the noise note above)
                mag=D.Normal(loc=21.5, scale=0.1),
            ),
        ],
        dtype=jnp.float64,
    )
    s = EnsembleSampler(16, model.num_params, model.posterior_fns, seed=0)
    s.init_state(
        model.init_params_from_priors(
            16, random_state=np.random.RandomState(7)
        )
    )
    s.run_burn(400)
    s.reset()
    s.run_sampling(200)
    res = power_scale_sensitivity(model, thetas=s.flatchain)
    assert "1_PointSource_mag" in res.flagged(), res.summary()
    assert res.diagnosis("1_PointSource_mag") == "prior-data conflict"
