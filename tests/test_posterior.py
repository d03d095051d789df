"""Posterior math: lnpost parity vs hand-computed numpy, guards, layout."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import Configuration, PointSource, Sersic, Sky
from psfmc_tpu.models.posterior import build_posterior
from psfmc_tpu.models.spec import build_model_spec


@pytest.fixture()
def simple_model(rng, gaussian_psf):
    obs = 0.1 + rng.randn(32, 32) * 0.01
    ivm = np.full((32, 32), 1e4)
    ivm[3, 4] = 0.0  # one bad pixel
    config = Configuration(
        obs_file=obs,
        obsivm_file=ivm,
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e6,
        mag_zeropoint=25.0,
    )
    comps = [config, Sky(adu=D.Normal(loc=0.1, scale=0.05))]
    spec = build_model_spec(comps)
    return spec, build_posterior(spec, dtype=jnp.float64), obs, ivm


def test_sky_only_lnpost_matches_numpy(simple_model):
    spec, fns, obs, ivm = simple_model
    adu = 0.105
    theta = np.array([adu])

    # Hand-computed: flat model convolved with unit-sum psf stays flat
    f_psf = spec.f_psf_stack[0]
    f_var = spec.f_var_stack[0]
    raw = np.full(obs.shape, adu)
    conv = np.fft.ifftshift(
        np.fft.irfft2(np.fft.rfft2(raw) * f_psf, s=obs.shape)
    )
    model_var = np.fft.ifftshift(
        np.fft.irfft2(np.fft.rfft2(raw**2) * f_var, s=obs.shape)
    )
    good = ivm > 0
    obs_var = np.where(good, 1.0 / np.where(good, ivm, 1.0), np.inf)
    comp_ivm = 1.0 / (model_var + obs_var)
    resid = obs - conv
    lnl = -0.5 * np.sum(
        resid[good] ** 2 * comp_ivm[good]
        - np.log(0.5 / np.pi * comp_ivm[good])
    )
    # prior: Normal(0.1, 0.05)
    lnprior = -0.5 * ((adu - 0.1) / 0.05) ** 2 - np.log(
        0.05 * np.sqrt(2 * np.pi)
    )

    got = float(fns.log_posterior(jnp.asarray(theta)))
    assert got == pytest.approx(lnl + lnprior, rel=1e-8)


def test_bad_pixel_excluded(simple_model):
    spec, fns, obs, ivm = simple_model
    assert spec.bad_px[3, 4]
    imgs = fns.render_images(jnp.asarray([0.1]))
    assert np.asarray(imgs["composite_ivm"])[3, 4] == 0.0


def test_prior_violation_gives_neg_inf(rng, gaussian_psf):
    config = Configuration(
        obs_file=np.ones((32, 32)),
        obsivm_file=np.ones((32, 32)),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf),
        mag_zeropoint=25.0,
    )
    comps = [
        config,
        Sersic(
            xy=D.Uniform(loc=np.array([10.0, 10.0]), scale=np.array([10.0, 10.0])),
            mag=D.Uniform(loc=19, scale=3),
            reff=D.Uniform(loc=2, scale=8),
            reff_b=D.Uniform(loc=2, scale=8),
            index=1.0,
            angle=0.0,
        ),
    ]
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float64)
    # order: angle? angle is const; priors alphabetical: mag, reff, reff_b, xy
    good = np.array([20.0, 5.0, 4.0, 15.0, 15.0])
    bad = np.array([20.0, 4.0, 5.0, 15.0, 15.0])  # reff_b > reff
    outside = np.array([20.0, 5.0, 4.0, 50.0, 15.0])  # xy outside prior
    assert np.isfinite(float(fns.log_posterior(jnp.asarray(good))))
    assert float(fns.log_posterior(jnp.asarray(bad))) == -np.inf
    assert float(fns.log_posterior(jnp.asarray(outside))) == -np.inf
    assert float(fns.log_posterior(jnp.asarray(good * np.nan))) == -np.inf


def test_param_layout_matches_reference_convention(rng, gaussian_psf):
    """File order between components, alphabetical within, PSF last."""
    config = Configuration(
        obs_file=np.ones((16, 16)),
        obsivm_file=np.ones((16, 16)),
        psf_files=[gaussian_psf[8:24, 8:24], gaussian_psf[8:24, 8:24] * 1.0],
        psfivm_files=[np.ones((16, 16))] * 2,
        mag_zeropoint=25.0,
    )
    comps = [
        config,
        Sky(adu=D.Normal(loc=0, scale=1)),
        PointSource(
            xy=D.Uniform(loc=np.array([2.0, 2.0]), scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=19, scale=3),
        ),
        Sersic(
            xy=D.Uniform(loc=np.array([2.0, 2.0]), scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=19, scale=3),
            reff=D.Uniform(loc=1, scale=4),
            reff_b=D.Uniform(loc=1, scale=4),
            index=D.WeibullMinimum(c=1.5, scale=4),
            angle=D.Uniform(loc=0, scale=180),
        ),
    ]
    spec = build_model_spec(comps)
    assert spec.param_names == [
        "0_Sky_adu",
        "1_PointSource_mag",
        "1_PointSource_xy",
        "2_Sersic_angle",
        "2_Sersic_index",
        "2_Sersic_mag",
        "2_Sersic_reff",
        "2_Sersic_reff_b",
        "2_Sersic_xy",
        "PSF_Index",
    ]
    assert spec.param_lens == [1, 1, 2, 1, 1, 1, 1, 1, 2, 1]
    assert spec.param_fits_abbrs[1] == "1PS_mag"
    assert spec.param_fits_abbrs[7] == "2SER_REB"
    assert spec.num_params == 12
    assert spec.num_psfs == 2


def test_conv_modes_agree(rng, gaussian_psf):
    """The matmul-DFT posterior matches the FFT posterior end to end."""
    obs = 0.1 + rng.randn(32, 32) * 0.01
    config = Configuration(
        obs_file=obs,
        obsivm_file=np.full((32, 32), 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e6,
        mag_zeropoint=25.0,
    )

    def make(conv_mode):
        comps = [
            config,
            Sky(adu=D.Normal(loc=0.1, scale=0.05)),
            Sersic(
                xy=D.Uniform(
                    loc=np.array([10.0, 10.0]), scale=np.array([12.0, 12.0])
                ),
                mag=D.Uniform(loc=19, scale=3),
                reff=D.Uniform(loc=2, scale=8),
                reff_b=D.Uniform(loc=2, scale=8),
                index=1.5,
                angle=30.0,
                angle_degrees=True,
            ),
        ]
        spec = build_model_spec(comps)
        return build_posterior(spec, dtype=jnp.float64, conv_mode=conv_mode)

    fns_fft = make("fft")
    fns_dft = make("dft")
    theta = np.array([0.105, 20.0, 5.0, 4.0, 16.0, 15.0])
    lp_fft = float(fns_fft.log_posterior(jnp.asarray(theta)))
    lp_dft = float(fns_dft.log_posterior(jnp.asarray(theta)))
    assert lp_fft == pytest.approx(lp_dft, rel=1e-10)
    imgs_fft = fns_fft.render_images(jnp.asarray(theta))
    imgs_dft = fns_dft.render_images(jnp.asarray(theta))
    for k in imgs_fft:
        assert np.allclose(
            np.asarray(imgs_fft[k]), np.asarray(imgs_dft[k]), rtol=1e-9
        ), k


def test_conv_stack_matches_default(rng, gaussian_psf, monkeypatch):
    """PSFMC_CONV_STACK=1 (channel-stacked DFT convolutions, the 8th
    measured micro-variant — 5.5% slower on TPU, knob kept for
    reproducibility) is numerically equivalent: lnpost, per-walker
    images and the accumulation carry means all match the default."""
    obs = 0.1 + rng.randn(32, 32) * 0.01
    config = Configuration(
        obs_file=obs,
        obsivm_file=np.full((32, 32), 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e6,
        mag_zeropoint=25.0,
    )

    def make(stack):
        if stack:
            monkeypatch.setenv("PSFMC_CONV_STACK", "1")
        else:
            monkeypatch.delenv("PSFMC_CONV_STACK", raising=False)
        comps = [
            config,
            Sky(adu=D.Normal(loc=0.1, scale=0.05)),
            Sersic(
                xy=D.Uniform(
                    loc=np.array([10.0, 10.0]), scale=np.array([12.0, 12.0])
                ),
                mag=D.Uniform(loc=19, scale=3),
                reff=D.Uniform(loc=2, scale=8),
                reff_b=D.Uniform(loc=2, scale=8),
                index=1.5,
                angle=30.0,
                angle_degrees=True,
            ),
        ]
        spec = build_model_spec(comps)
        return build_posterior(spec, dtype=jnp.float64, conv_mode="dft")

    fns0 = make(False)
    fns1 = make(True)
    assert not fns0.conv_stack and fns1.conv_stack
    thetas = np.array([0.105, 20.0, 5.0, 4.0, 16.0, 15.0])[None, :] + \
        np.abs(rng.randn(6, 6)) * 0.01
    lp0 = np.asarray(jax.vmap(fns0.log_posterior)(jnp.asarray(thetas)))
    lp1 = np.asarray(jax.vmap(fns1.log_posterior)(jnp.asarray(thetas)))
    np.testing.assert_allclose(lp0, lp1, rtol=1e-10)
    cm0 = fns0.ensemble_carry_means(jnp.asarray(thetas))
    cm1 = fns1.ensemble_carry_means(jnp.asarray(thetas))
    for k in cm0:
        np.testing.assert_allclose(
            np.asarray(cm0[k]), np.asarray(cm1[k]), rtol=1e-9,
            atol=1e-12, err_msg=k,
        )


def test_psf_index_gather(rng):
    """Multiple PSFs: the discrete index selects the right Fourier stack."""
    psf1 = np.zeros((8, 8))
    psf1[4, 4] = 1.0  # delta
    psf2 = np.full((8, 8), 1.0 / 64)  # flat
    config = Configuration(
        obs_file=rng.rand(16, 16),
        obsivm_file=np.ones((16, 16)) * 100,
        psf_files=[psf1, psf2],
        psfivm_files=[np.ones((8, 8)) * 1e8] * 2,
        mag_zeropoint=25.0,
    )
    # A point source distinguishes the kernels (a flat sky cannot)
    comps = [
        config,
        PointSource(xy=np.array([8.0, 8.0]), mag=D.Uniform(loc=19, scale=3)),
    ]
    spec = build_model_spec(comps)
    assert spec.param_names == ["0_PointSource_mag", "PSF_Index"]
    fns = build_posterior(spec, dtype=jnp.float64)
    # theta = [mag, psf_index]
    img0 = np.asarray(fns.render_images(jnp.asarray([20.0, 0.0]))["convolved_model"])
    img1 = np.asarray(fns.render_images(jnp.asarray([20.0, 1.0]))["convolved_model"])
    flux = 10 ** (-0.4 * (20.0 - 25.0))
    # delta kernel concentrates the flux; the flat 8x8 kernel spreads it
    # over an 8x8 window at flux/64 per pixel
    assert img0.max() == pytest.approx(flux, rel=1e-6)
    assert img1.max() == pytest.approx(flux / 64, rel=1e-6)
    assert img1.sum() == pytest.approx(flux, rel=1e-6)
    # fractional index rounds to the nearest PSF (reference rint semantics)
    img_round = np.asarray(
        fns.render_images(jnp.asarray([20.0, 0.4]))["convolved_model"]
    )
    assert np.allclose(img_round, img0)


def test_ensemble_carry_means_match_per_walker(rng):
    """Linearity shortcut: mean carry images over walkers computed with
    per-PSF-group convolutions must equal the naive per-walker average
    (single- and multi-PSF)."""
    psf1 = np.zeros((8, 8)); psf1[4, 4] = 1.0
    psf2 = np.full((8, 8), 1.0 / 64)
    for psfs, ivms in [
        (psf1, np.ones((8, 8)) * 1e8),
        ([psf1, psf2], [np.ones((8, 8)) * 1e8] * 2),
    ]:
        config = Configuration(
            obs_file=rng.rand(16, 16),
            obsivm_file=np.ones((16, 16)) * 100,
            psf_files=psfs,
            psfivm_files=ivms,
            mag_zeropoint=25.0,
        )
        comps = [
            config,
            Sky(adu=D.Normal(loc=0.1, scale=0.05)),
            PointSource(
                xy=D.Uniform(loc=np.array([4.0, 4.0]),
                             scale=np.array([8.0, 8.0])),
                mag=D.Uniform(loc=19, scale=3),
            ),
            Sersic(
                xy=D.Uniform(loc=np.array([4.0, 4.0]),
                             scale=np.array([8.0, 8.0])),
                mag=D.Uniform(loc=20, scale=2),
                reff=D.Uniform(loc=1, scale=4),
                reff_b=D.Uniform(loc=1, scale=4),
                index=1.5,
                angle=20.0,
                angle_degrees=True,
            ),
        ]
        spec = build_model_spec(comps)
        fns = build_posterior(spec, dtype=jnp.float64)
        nw = 12
        thetas = []
        rs = np.random.RandomState(3)
        for _ in range(nw):
            thetas.append(np.concatenate([
                np.ravel(s.dist.random(rs)) for s in spec.slots
            ]))
        thetas = np.stack(thetas)
        # enforce reff >= reff_b (not required for rendering, tidy anyway)
        got = fns.ensemble_carry_means(jnp.asarray(thetas))
        per_walker = jax.vmap(fns.carry_images)(jnp.asarray(thetas))
        for k in got:
            if k == "raw_m2":
                # batch SUM of squared deviations, not a mean key
                raws = np.asarray(per_walker["raw"], np.float64)
                want = np.sum((raws - raws.mean(axis=0)) ** 2, axis=0)
                assert np.allclose(np.asarray(got[k]), want, rtol=1e-9,
                                   atol=1e-12), k
                continue
            want = np.mean(np.asarray(per_walker[k]), axis=0)
            assert np.allclose(np.asarray(got[k]), want, rtol=1e-9,
                               atol=1e-12), k


def test_gradient_sky_render_and_layout(rng, gaussian_psf):
    """GALFIT-style tilted-plane sky: raw model is the exact plane and
    the dx/dy slots slot in alphabetically after adu."""
    config = Configuration(
        obs_file=0.1 + rng.randn(32, 32) * 0.01,
        obsivm_file=np.full((32, 32), 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e6,
        mag_zeropoint=25.0,
    )
    comps = [
        config,
        Sky(
            adu=D.Normal(loc=0.1, scale=0.05),
            dx=D.Normal(loc=0.0, scale=0.01),
            dy=D.Normal(loc=0.0, scale=0.01),
        ),
    ]
    spec = build_model_spec(comps)
    assert spec.param_names == ["0_Sky_adu", "0_Sky_dx", "0_Sky_dy"]
    fns = build_posterior(spec, dtype=jnp.float64)
    adu, dx, dy = 0.12, 3e-3, -2e-3
    raw = np.asarray(
        fns.render_images(jnp.asarray([adu, dx, dy]))["raw_model"]
    )
    yy, xx = np.mgrid[0:32, 0:32].astype(float)
    want = adu + dx * (xx - 15.5) + dy * (yy - 15.5)
    assert np.allclose(raw, want, rtol=1e-12, atol=1e-12)
    # the plane is a post-convolution background: the convolved model
    # must BE the plane everywhere, including the frame edges (a
    # pre-convolution ramp would wrap and flatten the edge columns)
    conv = np.asarray(
        fns.render_images(jnp.asarray([adu, dx, dy]))["convolved_model"]
    )
    assert np.allclose(conv, want, rtol=1e-10, atol=1e-12)
    assert np.isfinite(float(fns.log_posterior(jnp.asarray([adu, dx, dy]))))


def test_gradient_sky_dx_only_and_constant(rng, gaussian_psf):
    """A lone dx (stochastic) or a constant gradient must both render;
    a flat Sky's spec must carry no gradient rules at all."""
    config = Configuration(
        obs_file=np.full((16, 16), 0.1),
        obsivm_file=np.full((16, 16), 1e4),
        psf_files=gaussian_psf[8:24, 8:24],
        psfivm_files=np.ones((16, 16)) * 1e6,
        mag_zeropoint=25.0,
    )
    # stochastic dx only
    spec = build_model_spec(
        [config, Sky(adu=D.Normal(loc=0.1, scale=0.05),
                     dx=D.Uniform(loc=-0.01, scale=0.02))]
    )
    assert spec.param_names == ["0_Sky_adu", "0_Sky_dx"]
    fns = build_posterior(spec, dtype=jnp.float64)
    raw = np.asarray(fns.render_images(jnp.asarray([0.1, 4e-3]))["raw_model"])
    xx = np.arange(16.0)
    assert np.allclose(raw[0], 0.1 + 4e-3 * (xx - 7.5), rtol=1e-12)
    assert np.allclose(raw, raw[:1], rtol=1e-12)  # no y dependence

    # constant dy, no dx
    spec_c = build_model_spec(
        [config, Sky(adu=D.Normal(loc=0.1, scale=0.05), dy=5e-3)]
    )
    assert spec_c.param_names == ["0_Sky_adu"]
    fns_c = build_posterior(spec_c, dtype=jnp.float64)
    raw_c = np.asarray(fns_c.render_images(jnp.asarray([0.1]))["raw_model"])
    yy = np.arange(16.0)
    assert np.allclose(raw_c[:, 0], 0.1 + 5e-3 * (yy - 7.5), rtol=1e-12)

    # flat sky: spec rules carry only 'adu' (legacy layout untouched)
    spec_f = build_model_spec([config, Sky(adu=D.Normal(loc=0.1, scale=0.05))])
    sky_rule = next(c for c in spec_f.comp_specs if c.kind == "sky")
    assert set(sky_rule.params) == {"adu"}


def test_gradient_sky_recovery(rng, gaussian_psf):
    """Short ensemble fit recovers an injected sky plane (1-sigma-ish)."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    adu_t, dx_t, dy_t = 0.2, 4e-3, -3e-3
    noise = 0.005

    def make_config(obs):
        return Configuration(
            obs_file=obs,
            obsivm_file=np.full((32, 32), 1.0 / noise**2),
            psf_files=gaussian_psf,
            psfivm_files=np.ones_like(gaussian_psf) * 1e8,
            mag_zeropoint=25.0,
        )

    def make_comps(config):
        return [
            config,
            Sky(
                adu=D.Uniform(loc=0.0, scale=0.5),
                dx=D.Uniform(loc=-0.02, scale=0.04),
                dy=D.Uniform(loc=-0.02, scale=0.04),
            ),
        ]

    # generate the mock THROUGH the model (wrap-boundary convolution
    # distorts a plane near the edges; a hand-rolled numpy plane would
    # bias the gradient recovery — the round-2 example lesson)
    spec_gen = build_model_spec(make_comps(make_config(np.zeros((32, 32)))))
    fns_gen = build_posterior(spec_gen, dtype=jnp.float64)
    conv_truth = np.asarray(
        fns_gen.render_images(jnp.asarray([adu_t, dx_t, dy_t]))[
            "convolved_model"
        ]
    )
    obs = conv_truth + rng.randn(32, 32) * noise
    config = make_config(obs)
    spec = build_model_spec(make_comps(config))
    fns = build_posterior(spec, dtype=jnp.float64)
    nw = 16
    p0 = np.stack([
        np.concatenate([np.ravel(s.dist.random(rng)) for s in spec.slots])
        for _ in range(nw)
    ])
    sampler = EnsembleSampler(nw, spec.num_params, fns, seed=0)
    sampler.init_state(p0)
    sampler.run_burn(150)
    sampler.reset()
    sampler.run_sampling(100)
    flat = np.asarray(sampler.chain).reshape(-1, spec.num_params)
    mean = flat.mean(axis=0)
    std = flat.std(axis=0)
    for got, sig, want in zip(mean, std, (adu_t, dx_t, dy_t)):
        assert abs(got - want) < 5 * sig + 1e-5
    # gradient posterior should be tight: ~noise/(N*std(x)) per axis
    assert std[1] < 5e-4 and std[2] < 5e-4


def test_gradient_sky_rejected_by_fused_kernel(rng, gaussian_psf):
    """PSFMC_LNPOST=pallas must fall back (warn) on a gradient sky —
    the fused kernel renders sky as one scalar."""
    from psfmc_tpu.ops.pallas.lnpost_pallas import fused_lnl_supported

    config = Configuration(
        obs_file=np.full((32, 32), 0.1),
        obsivm_file=np.full((32, 32), 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e6,
        mag_zeropoint=25.0,
    )
    spec_flat = build_model_spec(
        [config, Sky(adu=D.Normal(loc=0.1, scale=0.05))]
    )
    spec_grad = build_model_spec(
        [config, Sky(adu=D.Normal(loc=0.1, scale=0.05),
                     dx=D.Normal(loc=0.0, scale=0.01))]
    )
    # only the gradient model is rejected (flat support is whatever the
    # platform says — compare the two, don't assert pallas availability)
    assert not fused_lnl_supported(spec_grad, "dft")
    assert fused_lnl_supported(spec_flat, "dft") == fused_lnl_supported(
        spec_flat, "dft"
    )


def test_conv_pad_kills_wraparound(rng, gaussian_psf):
    """conv_pad (GALFIT convolution-box analogue): a source near the
    left edge wraps onto the right edge at pad=0 (reference behavior)
    and does not with sufficient padding; interior sources agree."""
    from psfmc_tpu.models.components import PointSource

    def fns_for(pad, x=1.5, y=16.0):
        # psf ivm huge: the PSF *variance* kernel is spatially flat, so
        # its wrap-vs-pad difference is real and large — suppress it so
        # the interior check isolates the conv channel
        config = Configuration(
            obs_file=np.zeros((32, 32)),
            obsivm_file=np.full((32, 32), 1e4),
            psf_files=gaussian_psf,
            psfivm_files=np.ones_like(gaussian_psf) * 1e12,
            mag_zeropoint=25.0,
            conv_pad=pad,
        )
        comps = [
            config,
            PointSource(xy=np.array([x, y]),
                        mag=D.Uniform(loc=19.0, scale=3.0)),
        ]
        return build_posterior(build_model_spec(comps), dtype=jnp.float64)

    theta = jnp.asarray([20.0])
    img_wrap = np.asarray(fns_for(0).render_images(theta)["convolved_model"])
    img_pad = np.asarray(fns_for(12).render_images(theta)["convolved_model"])
    flux = 10 ** (-0.4 * (20.0 - 25.0))
    # wrap: PSF wings of the x=1.5 source appear at the right edge
    assert img_wrap[:, -1].max() > 1e-6 * flux
    # padded: nothing wraps (f64 render floor)
    assert img_pad[:, -1].max() < 1e-12 * flux
    # the padded image loses exactly the wrapped flux off-frame
    assert img_pad.sum() < img_wrap.sum()

    # interior source: pad and wrap agree to the render floor
    fi_wrap = np.asarray(
        fns_for(0, 16.2, 15.7).render_images(theta)["convolved_model"]
    )
    fi_pad = np.asarray(
        fns_for(12, 16.2, 15.7).render_images(theta)["convolved_model"]
    )
    assert np.allclose(fi_wrap, fi_pad, rtol=1e-9, atol=1e-12 * flux)
    lnp0 = float(fns_for(0, 16.2, 15.7).log_posterior(theta))
    lnp1 = float(fns_for(12, 16.2, 15.7).log_posterior(theta))
    assert lnp0 == pytest.approx(lnp1, rel=1e-8)


def test_conv_pad_carry_means_match_per_walker(rng, gaussian_psf):
    """The linearized accumulation path survives conv_pad cropping."""
    config = Configuration(
        obs_file=0.1 + rng.randn(32, 32) * 0.01,
        obsivm_file=np.full((32, 32), 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e6,
        mag_zeropoint=25.0,
        conv_pad=6,
    )
    comps = [
        config,
        Sky(adu=D.Normal(loc=0.1, scale=0.05),
            dx=D.Normal(loc=0.0, scale=0.01)),
        Sersic(
            xy=D.Uniform(loc=(10.0, 10.0), scale=(12.0, 12.0)),
            mag=D.Uniform(loc=19, scale=3),
            reff=D.Uniform(loc=2, scale=6),
            reff_b=D.Uniform(loc=2, scale=6),
            index=1.5,
            angle=30.0,
            angle_degrees=True,
        ),
    ]
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float64)
    rs = np.random.RandomState(5)
    thetas = np.stack([
        np.concatenate([np.ravel(s.dist.random(rs)) for s in spec.slots])
        for _ in range(8)
    ])
    got = fns.ensemble_carry_means(jnp.asarray(thetas))
    per_walker = jax.vmap(fns.carry_images)(jnp.asarray(thetas))
    for k in got:
        if k == "raw_m2":
            raws = np.asarray(per_walker["raw"], np.float64)
            want = np.sum((raws - raws.mean(axis=0)) ** 2, axis=0)
        else:
            want = np.mean(np.asarray(per_walker[k]), axis=0)
        assert got[k].shape == (32, 32), k
        assert np.allclose(np.asarray(got[k]), want, rtol=1e-9,
                           atol=1e-12), k


def test_conv_pad_propagates_to_joint_bands(rng, gaussian_psf):
    from psfmc_tpu.models import JointModel

    def band(pad):
        cfg = Configuration(
            obs_file=0.1 + rng.randn(24, 24) * 0.01,
            obsivm_file=np.full((24, 24), 1e4),
            psf_files=gaussian_psf[4:28, 4:28],
            psfivm_files=np.ones((24, 24)) * 1e8,
            mag_zeropoint=25.0,
            conv_pad=pad,
        )
        return [
            cfg,
            PointSource(
                xy=D.Uniform(loc=(8.0, 8.0), scale=(8.0, 8.0)),
                mag=D.Uniform(loc=20.0, scale=2.0),
            ),
        ]

    joint = JointModel([band(6), band(0)])
    fns = joint.posterior_fns
    assert fns.band_fns[0].pad == 6
    assert fns.band_fns[0].render_shape == (36, 36)
    assert fns.band_fns[1].pad == 0
    theta = jnp.asarray([20.5, 12.0, 11.5, 20.5, 12.0, 11.5])
    assert np.isfinite(float(fns.log_posterior(theta)))
