"""Posterior-predictive simulation: mock observations from the model.

``MultiComponentModel.simulate`` is the injection step of detection /
completeness simulations — render a model realization, add the
observation's per-pixel noise, feed it back through a fit.
"""
import numpy as np

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import Configuration, Sersic, Sky
from psfmc_tpu.models.multicomponent import MultiComponentModel


def _model(rng, noise=0.02):
    h = w = 24
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 12) ** 2 + (yy - 12) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()
    ivm = np.full((h, w), 1.0 / noise**2)
    ivm[0, 0] = 0.0  # one bad pixel (infinite variance)
    comps = [
        Configuration(
            obs_file=0.05 + rng.randn(h, w) * noise,
            obsivm_file=ivm,
            psf_files=psf,
            psfivm_files=np.full((h, w), 1e8),
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.05, scale=0.1)),
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
    return MultiComponentModel(components=comps), noise


def test_simulate_noise_statistics():
    rng = np.random.RandomState(0)
    mcm, noise = _model(rng)

    mock, theta = mcm.simulate(random_state=1)
    clean, theta2 = mcm.simulate(theta=theta, random_state=2,
                                 add_noise=False)
    assert mock.shape == clean.shape == mcm.spec.shape
    assert np.array_equal(theta, theta2)
    # noiseless simulate is exactly the convolved model render
    render = mcm.render_images_batch(theta[None])["convolved_model"][0]
    assert np.allclose(clean, render)
    # residual noise matches the variance map
    resid = mock - clean
    good = np.isfinite(np.asarray(mcm.spec.obs_var)) & (
        np.asarray(mcm.spec.obs_var) < 1e10
    )
    assert abs(np.std(resid[good]) - noise) < 0.15 * noise
    # the bad pixel (infinite variance) receives zero noise
    assert resid[0, 0] == 0.0


def test_simulate_deterministic_and_refittable():
    rng = np.random.RandomState(3)
    mcm, noise = _model(rng)

    m1, t1 = mcm.simulate(random_state=7)
    m2, t2 = mcm.simulate(random_state=7)
    assert np.array_equal(m1, m2) and np.array_equal(t1, t2)

    # completeness-sim loop: inject with known params, refit with MAP,
    # recover the injected magnitude
    from psfmc_tpu.optimize import fit_map

    inject = t1.copy()
    mock, _ = mcm.simulate(theta=inject, random_state=11)

    h = w = 24
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 12) ** 2 + (yy - 12) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()
    refit = MultiComponentModel(components=[
        Configuration(
            obs_file=mock,
            obsivm_file=np.full((h, w), 1.0 / noise**2),
            psf_files=psf,
            psfivm_files=np.full((h, w), 1e8),
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.05, scale=0.1)),
        Sersic(
            xy=D.Uniform(loc=np.array([8.0, 8.0]),
                         scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=19.0, scale=4.0),
            reff=D.Uniform(loc=0.5, scale=4.5),
            reff_b=D.Uniform(loc=0.5, scale=4.5),
            index=1.0,
            angle=0.0,
        ),
    ])
    pool = refit.init_params_from_priors(128,
                                         random_state=np.random.RandomState(5))
    res = fit_map(refit.posterior_fns, n_starts=16, steps=300, p0=pool)
    # param layout: Sky_adu, Sersic(mag, reff, reff_b, xy)- alphabetical
    names = refit.param_names
    lens = refit.param_lens
    pos = 0
    got = {}
    for name, ln in zip(names, lens):
        got[name] = res.theta[pos:pos + ln]
        pos += ln
    inj = {}
    pos = 0
    for name, ln in zip(mcm.param_names, mcm.param_lens):
        inj[name] = inject[pos:pos + ln]
        pos += ln
    mag_key = [k for k in names if k.endswith("Sersic_mag")][0]
    assert abs(got[mag_key][0] - inj[mag_key][0]) < 0.3, (
        got[mag_key], inj[mag_key]
    )
