"""NoiseScale component: sampled variance inflation (beyond reference).

Anchors: exact likelihood algebra (scale folds into the total variance),
layout/naming, prior support in all three enforcement layers, the
linearized carry-means accumulation with per-walker weights, Pallas
gating, and the headline e2e: a fit whose claimed IVM is 4x too
optimistic recovers scale ~ 4 and comes back LOO-PIT calibrated, while
the scale-free fit is flagged.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import (
    Configuration,
    NoiseScale,
    PointSource,
    Sky,
)
from psfmc_tpu.models.multicomponent import MultiComponentModel
from psfmc_tpu.models.spec import build_model_spec
from psfmc_tpu.models.posterior import build_posterior
from psfmc_tpu.sampler.ensemble import EnsembleSampler


def _psf16(gaussian_psf):
    psf = gaussian_psf[8:24, 8:24]
    return psf / psf.sum()


def _comps(obs, noise, psf, scale=None, extra=()):
    comps = [
        Configuration(
            obs_file=obs,
            obsivm_file=np.full(obs.shape, 1.0 / noise**2),
            psf_files=psf,
            psfivm_files=np.full_like(psf, 1e12),
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.1, scale=0.2)),
    ]
    comps.extend(extra)
    if scale is not None:
        comps.append(NoiseScale(scale=scale))
    return comps


def test_layout_naming_and_scale_algebra(rng, gaussian_psf):
    psf = _psf16(gaussian_psf)
    noise = 0.05
    obs = 0.1 + rng.randn(16, 16) * noise
    model = MultiComponentModel(
        _comps(obs, noise, psf, scale=D.Uniform(loc=0.5, scale=3.0)),
        dtype=jnp.float64,
    )
    assert model.param_names == ["0_Sky_adu", "1_NoiseScale_scale"]
    assert "NSC_SCL" in model.param_fits_abbrs[1]

    base = MultiComponentModel(_comps(obs, noise, psf),
                               dtype=jnp.float64)
    fns = model.posterior_fns
    for s in (0.5, 1.0, 2.7):
        th = np.array([0.1, s])
        # scaling the variance by s == base lnL with ivm/s, exactly:
        # per good pixel -0.5*(r^2*ivm/s - ln(ivm/(2 pi s)))
        imgs = base.posterior_fns._images_impl(jnp.asarray([0.1]))
        var = np.asarray(imgs["var"], np.float64)
        resid = obs - np.asarray(imgs["conv"], np.float64)
        manual = -0.5 * np.sum(
            resid**2 / (s * var) + np.log(2 * np.pi * s * var)
        )
        got = float(fns.log_likelihood(jnp.asarray(th)))
        np.testing.assert_allclose(got, manual, rtol=1e-10)
        # s = 1 is exact reference behavior
        if s == 1.0:
            np.testing.assert_allclose(
                got,
                float(base.posterior_fns.log_likelihood(
                    jnp.asarray([0.1])
                )),
                rtol=1e-12,
            )


def test_prior_support_three_layers(rng, gaussian_psf):
    psf = _psf16(gaussian_psf)
    noise = 0.05
    obs = 0.1 + rng.randn(16, 16) * noise
    # prior with mass at negative values exercises all three layers
    model = MultiComponentModel(
        _comps(obs, noise, psf, scale=D.Normal(loc=1.0, scale=2.0)),
        dtype=jnp.float64,
    )
    fns = model.posterior_fns
    # device prior: -inf at scale <= 0
    assert np.isneginf(float(fns.log_prior(jnp.asarray([0.1, -0.5]))))
    assert np.isneginf(float(fns.log_posterior(jnp.asarray([0.1, 0.0]))))
    assert np.isfinite(float(fns.log_prior(jnp.asarray([0.1, 1.5]))))
    # batch draws honor the constraint
    draws = model.init_params_from_priors(
        256, random_state=np.random.RandomState(0)
    )
    assert np.all(draws[:, 1] > 0)
    # host log_priors
    comp = NoiseScale(scale=D.Normal(loc=1.0, scale=2.0))
    comp.scale = -1.0
    assert np.isneginf(comp.log_priors())


def test_carry_means_match_per_walker_images(rng, gaussian_psf):
    """The linearized accumulation must weight the variance channel by
    each walker's scale (scalar weights commute with convolution)."""
    psf = _psf16(gaussian_psf)
    noise = 0.05
    obs = 0.1 + rng.randn(16, 16) * noise
    spec = build_model_spec(
        _comps(obs, noise, psf, scale=D.Uniform(loc=0.5, scale=3.0))
    )
    fns = build_posterior(spec, dtype=jnp.float64)
    thetas = np.column_stack(
        [
            0.1 + 0.01 * rng.randn(6),
            rng.uniform(0.6, 3.2, size=6),
        ]
    )
    means = fns.ensemble_carry_means(jnp.asarray(thetas))
    per_walker = [
        fns.carry_images(jnp.asarray(th)) for th in thetas
    ]
    for key in ("raw", "conv", "var", "ps_conv"):
        expect = np.mean(
            [np.asarray(ci[key], np.float64) for ci in per_walker],
            axis=0,
        )
        np.testing.assert_allclose(
            np.asarray(means[key], np.float64), expect, rtol=1e-9,
            atol=1e-12, err_msg=key,
        )


def test_pallas_batched_kernel_gates_off(rng, gaussian_psf):
    from psfmc_tpu.ops.pallas.lnpost_batched import batched_lnl_supported

    psf = _psf16(gaussian_psf)
    noise = 0.05
    obs = 0.1 + rng.randn(16, 16) * noise
    spec = build_model_spec(
        _comps(obs, noise, psf, scale=D.Uniform(loc=0.5, scale=3.0))
    )
    assert not batched_lnl_supported(spec)


def test_dsl_parse(tmp_path, rng, gaussian_psf):
    import os

    from psfmc_tpu.io import fits
    from psfmc_tpu.model_parser import component_list_from_file

    psf = _psf16(gaussian_psf)
    d = str(tmp_path)
    fits.writeto(os.path.join(d, "sci.fits"),
                 rng.randn(16, 16).astype(np.float32))
    fits.writeto(os.path.join(d, "ivm.fits"),
                 np.full((16, 16), 400.0, np.float32))
    fits.writeto(os.path.join(d, "psf.fits"), psf.astype(np.float32))
    fits.writeto(os.path.join(d, "pivm.fits"),
                 np.full_like(psf, 1e12).astype(np.float32))
    with open(os.path.join(d, "model.py"), "w") as f:
        f.write(
            "Configuration(obs_file='sci.fits', obsivm_file='ivm.fits',"
            " psf_files='psf.fits', psfivm_files='pivm.fits',"
            " mag_zeropoint=25.0)\n"
            "Sky(adu=Normal(loc=0.0, scale=0.1))\n"
            "NoiseScale(scale=Uniform(loc=0.3, scale=4.0))\n"
        )
    comps = component_list_from_file(os.path.join(d, "model.py"))
    kinds = [type(c).__name__ for c in comps]
    assert "NoiseScale" in kinds


@pytest.mark.slow
def test_e2e_recovers_inflation_and_calibrates_pit(rng, gaussian_psf):
    """Data noise is 2x the claimed sigma (ivm 4x optimistic): the
    scale-free fit fails LOO-PIT; with NoiseScale the posterior finds
    scale ~ 4 and the calibration check passes."""
    from psfmc_tpu.analysis import loo_pit

    psf = gaussian_psf[4:28, 4:28]
    psf = psf / psf.sum()
    true_noise = 0.10
    claimed = 0.05  # ivm built from this: 4x too optimistic
    gen = MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((24, 24)),
                obsivm_file=np.full((24, 24), 1.0 / true_noise**2),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            Sky(adu=0.1),
            PointSource(xy=np.array([12.2, 11.7]), mag=20.0),
        ],
        dtype=jnp.float64,
    )
    obs, _ = gen.simulate(random_state=rng)

    ps_prior = dict(
        xy=D.Uniform(loc=(8.0, 8.0), scale=(8.0, 8.0)),
        mag=D.Uniform(loc=19.0, scale=2.0),
    )

    def _fit(with_scale):
        extra = [PointSource(**ps_prior)]
        scale = (
            D.Uniform(loc=0.2, scale=9.8) if with_scale else None
        )
        model = MultiComponentModel(
            _comps(obs, claimed, psf, scale=scale, extra=extra),
            dtype=jnp.float64,
        )
        s = EnsembleSampler(
            16, model.num_params, model.posterior_fns, seed=0
        )
        s.init_state(
            model.init_params_from_priors(
                16, random_state=np.random.RandomState(7)
            )
        )
        s.run_burn(500)
        s.reset()
        s.run_sampling(250)
        return model, s

    from psfmc_tpu.models.multicomponent import slot_param_names

    model_ns, s_ns = _fit(True)
    scale_col = slot_param_names(
        model_ns.param_names, model_ns.param_lens
    ).index("2_NoiseScale_scale")
    post_scale = np.mean(s_ns.flatchain[:, scale_col])
    assert post_scale == pytest.approx(4.0, rel=0.35), post_scale
    pit_ns = loo_pit(model_ns, thetas=s_ns.flatchain[::4])
    assert pit_ns.calibrated(), pit_ns.summary()

    model_no, s_no = _fit(False)
    pit_no = loo_pit(model_no, thetas=s_no.flatchain[::4])
    assert not pit_no.calibrated(), pit_no.summary()
    # overconfident: PIT mass piles in the tails
    assert np.mean((pit_no.pit < 0.05) | (pit_no.pit > 0.95)) > 0.15


def test_joint_per_band_noise_scales(rng, gaussian_psf):
    """Each band scales only its own variance budget."""
    from psfmc_tpu.models import JointModel

    psf = gaussian_psf[4:28, 4:28]
    psf = psf / psf.sum()
    noise = 0.05

    def band(scale_val):
        return [
            Configuration(
                obs_file=0.1 + rng.randn(24, 24) * noise,
                obsivm_file=np.full((24, 24), 1.0 / noise**2),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.1, scale=0.2)),
            NoiseScale(scale=scale_val),
        ]

    joint = JointModel(
        [band(D.Uniform(loc=0.5, scale=3.0)),
         band(D.Uniform(loc=0.5, scale=3.0))]
    )
    names = joint.param_names
    assert names.count("1_NoiseScale_scale") == 1
    assert names.count("4_NoiseScale_scale") == 1
    fns = joint.posterior_fns
    # scaling band 1's variance changes band 1's lnl only
    th = np.array([0.1, 1.0, 0.1, 1.0])
    th_b1 = np.array([0.1, 1.0, 0.1, 2.0])
    l0a = float(fns.band_fns[0].log_likelihood(jnp.asarray(th)))
    l0b = float(fns.band_fns[0].log_likelihood(jnp.asarray(th_b1)))
    l1a = float(fns.band_fns[1].log_likelihood(jnp.asarray(th)))
    l1b = float(fns.band_fns[1].log_likelihood(jnp.asarray(th_b1)))
    assert l0a == l0b
    assert l1a != l1b
    assert np.isfinite(float(fns.log_posterior(jnp.asarray(th))))
