"""Boxy/disky Sersic isophotes (GALFIT-style c0 — beyond the reference).

Anchors: exact degeneration to the elliptical renderer at c0=0, exact
total-flux normalization for any c0 (superellipse area factor), the
boxy/disky diagonal-brightness signature, layout invariance for
elliptical models, prior support, and mock-injection recovery through
the public fit driver.
"""
import numpy as np
import pytest
import jax.numpy as jnp
from scipy.special import gamma as scipy_gamma

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import Configuration, Sersic, Sky
from psfmc_tpu.models.posterior import build_posterior
from psfmc_tpu.models.spec import build_model_spec
from psfmc_tpu.ops.sersic import (
    render_sersic,
    render_sersic_gen,
    sersic_gen_area_factor,
)


def _grids(n):
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    return jnp.asarray(xx), jnp.asarray(yy)


def test_area_factor_matches_scipy():
    for c in (0.5, 1.0, 2.0, 2.7, 4.0, 10.0):
        want = 4.0 * scipy_gamma(1 + 1 / c) ** 2 / scipy_gamma(1 + 2 / c)
        got = float(sersic_gen_area_factor(jnp.asarray(c, jnp.float64)))
        assert got == pytest.approx(want, rel=1e-12), c
    assert float(
        sersic_gen_area_factor(jnp.asarray(2.0, jnp.float64))
    ) == pytest.approx(np.pi, rel=1e-12)


def test_c0_zero_degenerates_to_elliptical():
    xg, yg = _grids(64)
    args = (
        jnp.asarray([31.2, 30.7], jnp.float64),
        21.5,
        6.3,
        5.1,
        2.4,
        25.35,
        26.2303,
    )
    ell = np.asarray(render_sersic(xg, yg, *args, angle_degrees=True))
    gen = np.asarray(
        render_sersic_gen(
            xg, yg, *args[:6], 0.0, args[6], angle_degrees=True
        )
    )
    assert np.allclose(gen, ell, rtol=1e-10, atol=0)


def test_total_flux_c0_invariant():
    """mag stays the total magnitude for any c0: the superellipse area
    renormalization makes the image sum c0-invariant (pixel point
    sampling carries a ~2% bias shared with the elliptical renderer,
    so the anchor is the c0=0 sum, plus a loose absolute check)."""
    n = 256
    xg, yg = _grids(n)
    mag, zp = 22.0, 25.0
    flux = 10 ** (-0.4 * (mag - zp))

    def total(c0):
        img = np.asarray(
            render_sersic_gen(
                xg,
                yg,
                jnp.asarray([127.3, 128.2], jnp.float64),
                mag,
                4.0,
                3.0,
                1.0,
                20.0,
                c0,
                zp,
                angle_degrees=True,
            )
        )
        return img.sum()

    base = total(0.0)
    assert base == pytest.approx(flux, rel=0.03)
    for c0 in (-0.8, 1.2, 3.0):
        assert total(c0) == pytest.approx(base, rel=0.01), c0


def test_boxy_brightens_disky_dims_the_diagonal():
    """At equal elliptical radius, a boxy profile (c0>0) is brighter on
    the diagonal of the scaled frame, a disky one fainter."""
    n = 129
    xg, yg = _grids(n)
    cen = jnp.asarray([64.0, 64.0], jnp.float64)
    kw = dict(angle_degrees=True)
    # angle=-90 puts the +90deg-convention major axis along +x; circular
    # axes make the scaled frame the pixel frame
    args = (cen, 21.0, 8.0, 8.0, 1.5, -90.0)

    def at(img, dx, dy):
        return np.asarray(img)[64 + dy, 64 + dx]

    r = 12
    d = int(round(r / np.sqrt(2)))
    imgs = {
        c0: render_sersic_gen(xg, yg, *args, c0, 25.0, **kw)
        for c0 in (-0.7, 0.0, 1.0)
    }
    for c0, img in imgs.items():
        # axis point is identical up to the flux renormalization factor
        ratio_axis = at(img, r, 0) / at(imgs[0.0], r, 0)
        ratio_diag = at(img, d, d) / at(imgs[0.0], d, d)
        if c0 > 0:
            assert ratio_diag > ratio_axis * 1.05
        elif c0 < 0:
            assert ratio_diag < ratio_axis * 0.95


def _config(obs, noise, psf):
    return Configuration(
        obs_file=obs,
        obsivm_file=np.full(obs.shape, 1.0 / noise**2),
        psf_files=psf,
        psfivm_files=np.full_like(psf, 1e8),
        mag_zeropoint=25.0,
    )


def test_layout_and_prior_support(rng, gaussian_psf):
    cfg = _config(np.zeros((32, 32)), 0.01, gaussian_psf)

    def sersic(**kw):
        return Sersic(
            xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
            mag=D.Uniform(loc=20.0, scale=2.0),
            reff=D.Uniform(loc=2.0, scale=6.0),
            reff_b=D.Uniform(loc=2.0, scale=6.0),
            index=1.5,
            angle=30.0,
            angle_degrees=True,
            **kw,
        )

    # elliptical layout untouched; c0 slots in alphabetically
    spec_e = build_model_spec([cfg, sersic()])
    assert spec_e.param_names == [
        "0_Sersic_mag", "0_Sersic_reff", "0_Sersic_reff_b", "0_Sersic_xy",
    ]
    assert all(
        "c0" not in cs.params
        for cs in spec_e.comp_specs
        if cs.kind == "sersic"
    )
    spec_b = build_model_spec(
        [cfg, sersic(c0=D.Uniform(loc=-1.0, scale=2.0))]
    )
    assert spec_b.param_names == [
        "0_Sersic_c0", "0_Sersic_mag", "0_Sersic_reff", "0_Sersic_reff_b",
        "0_Sersic_xy",
    ]
    fns = build_posterior(spec_b, dtype=jnp.float64)
    good = np.array([0.5, 21.0, 5.0, 4.0, 16.0, 15.0])
    assert np.isfinite(float(fns.log_posterior(jnp.asarray(good))))
    # support edge: the device prior rejects c0 <= -1.95 even if the
    # declared prior allowed it
    comp = sersic(c0=D.Uniform(loc=-3.0, scale=4.0))
    spec_w = build_model_spec([cfg, comp])
    fns_w = build_posterior(spec_w, dtype=jnp.float64)
    bad = np.array([-2.5, 21.0, 5.0, 4.0, 16.0, 15.0])
    assert float(fns_w.log_posterior(jnp.asarray(bad))) == -np.inf
    # vectorized prior-draw init respects the same constraint
    draws = comp.draw_batch(256, random_state=np.random.RandomState(0))
    assert np.all(draws[:, 0] > -1.95)
    # host-side joint prior agrees
    comp.set_stochastic_values(bad)
    assert comp.log_priors() == -np.inf


def test_fused_kernel_rejects_c0(rng, gaussian_psf):
    from psfmc_tpu.ops.pallas.lnpost_pallas import fused_lnl_supported

    cfg = _config(np.zeros((32, 32)), 0.01, gaussian_psf)
    spec = build_model_spec([
        cfg,
        Sersic(
            xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
            mag=D.Uniform(loc=20.0, scale=2.0),
            reff=D.Uniform(loc=2.0, scale=6.0),
            reff_b=D.Uniform(loc=2.0, scale=6.0),
            index=1.5,
            angle=30.0,
            angle_degrees=True,
            c0=D.Uniform(loc=-0.5, scale=1.0),
        ),
    ])
    assert not fused_lnl_supported(spec, "dft")


def test_c0_recovery(rng, gaussian_psf):
    """Short ensemble fit recovers an injected boxy c0 from a
    framework-generated mock."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    noise = 0.002
    c0_t = 0.9

    def comps(cfg):
        return [
            cfg,
            Sky(adu=D.Normal(loc=0.05, scale=0.05)),
            Sersic(
                xy=D.Uniform(loc=(13.0, 13.0), scale=(6.0, 6.0)),
                mag=D.Uniform(loc=20.0, scale=2.0),
                reff=5.0,
                reff_b=4.0,
                index=1.5,
                angle=30.0,
                angle_degrees=True,
                c0=D.Uniform(loc=-1.0, scale=3.0),
            ),
        ]

    # truth theta layout: [0_Sky_adu, 1_Sersic_c0, 1_Sersic_mag, xy]
    truth = np.array([0.05, c0_t, 20.8, 16.2, 15.7])
    spec_g = build_model_spec(
        comps(_config(np.zeros((32, 32)), noise, gaussian_psf))
    )
    fns_g = build_posterior(spec_g, dtype=jnp.float64)
    conv = np.asarray(
        fns_g.render_images(jnp.asarray(truth))["convolved_model"]
    )
    obs = conv + rng.randn(32, 32) * noise
    spec = build_model_spec(comps(_config(obs, noise, gaussian_psf)))
    assert spec.param_names[1] == "1_Sersic_c0"
    fns = build_posterior(spec, dtype=jnp.float64)
    nw = 16
    p0 = truth[None, :] + rng.randn(nw, truth.size) * np.array(
        [0.01, 0.1, 0.05, 0.1, 0.1]
    )
    sampler = EnsembleSampler(nw, spec.num_params, fns, seed=0)
    sampler.init_state(p0)
    sampler.run_burn(200)
    sampler.reset()
    sampler.run_sampling(150)
    flat = np.asarray(sampler.chain).reshape(-1, spec.num_params)
    mean, std = flat.mean(axis=0), flat.std(axis=0)
    assert abs(mean[1] - c0_t) < 5 * std[1] + 0.05
    # a boxy injection must be detected as boxy with confidence
    assert mean[1] > 3 * std[1]


# ---- azimuthal Fourier modes -----------------------------------------


def test_fourier_zero_amp_degenerates_to_elliptical():
    xg, yg = _grids(64)
    args = (
        jnp.asarray([31.2, 30.7], jnp.float64),
        21.5, 6.3, 5.1, 2.4, 25.35,
    )
    ell = np.asarray(
        render_sersic_gen(
            xg, yg, *args, 0.0, 26.2303, angle_degrees=True
        )
    )
    gen = np.asarray(
        render_sersic_gen(
            xg, yg, *args, 0.0, 26.2303, angle_degrees=True,
            fourier=((1, 0.0, 0.0), (3, 0.0, 10.0)),
        )
    )
    # area factor goes through the azimuthal quadrature instead of the
    # closed form — spectral convergence keeps them equal to ~1e-12
    assert np.allclose(gen, ell, rtol=1e-9, atol=0)


def test_fourier_flux_invariant_and_combined_with_c0():
    n = 256
    xg, yg = _grids(n)
    mag, zp = 22.0, 25.0

    def total(c0, fourier):
        img = np.asarray(
            render_sersic_gen(
                xg, yg,
                jnp.asarray([127.3, 128.2], jnp.float64),
                mag, 4.0, 3.0, 1.0, 20.0, c0, zp,
                angle_degrees=True, fourier=fourier,
            )
        )
        return img.sum()

    base = total(0.0, ())
    for c0, fourier in [
        (0.0, ((1, 0.35, 0.0),)),
        (0.0, ((1, 0.2, 30.0), (3, 0.15, -20.0), (4, 0.1, 5.0))),
        (0.8, ((1, 0.3, 45.0),)),
        (-0.6, ((2, 0.25, 0.0),)),
    ]:
        assert total(c0, fourier) == pytest.approx(base, rel=0.015), (
            c0, fourier,
        )


def test_fourier_m1_lopsided_and_phase():
    """m=1, phase 0 brightens the +major-axis side; phase 90deg rotates
    the bright side to +v (the minor axis)."""
    n = 129
    xg, yg = _grids(n)
    cen = jnp.asarray([64.0, 64.0], jnp.float64)
    # angle=-90 puts the major axis along +x; circular axes
    common = (cen, 21.0, 8.0, 8.0, 1.5, -90.0)

    def img(fourier):
        return np.asarray(
            render_sersic_gen(
                xg, yg, *common, 0.0, 25.0, angle_degrees=True,
                fourier=fourier,
            )
        )

    r = 12
    i0 = img(((1, 0.3, 0.0),))
    assert i0[64, 64 + r] > 1.3 * i0[64, 64 - r]
    assert i0[64 + r, 64] == pytest.approx(i0[64 - r, 64], rel=1e-6)
    i90 = img(((1, 0.3, 90.0),))
    assert i90[64 + r, 64] > 1.3 * i90[64 - r, 64]
    assert i90[64, 64 + r] == pytest.approx(i90[64, 64 - r], rel=1e-6)


def test_fourier_layout_priors_and_validation(rng, gaussian_psf):
    cfg = _config(np.zeros((32, 32)), 0.01, gaussian_psf)

    def sersic(**kw):
        return Sersic(
            xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
            mag=D.Uniform(loc=20.0, scale=2.0),
            reff=5.0, reff_b=4.0, index=1.5, angle=30.0,
            angle_degrees=True, **kw,
        )

    spec = build_model_spec([
        cfg,
        sersic(f1=D.Uniform(loc=-0.5, scale=1.0),
               f1_phi=D.Uniform(loc=0.0, scale=360.0),
               f3=0.1),
    ])
    assert spec.param_names == [
        "0_Sersic_f1", "0_Sersic_f1_phi", "0_Sersic_mag", "0_Sersic_xy",
    ]
    rule = next(c for c in spec.comp_specs if c.kind == "sersic")
    assert rule.params["f3"] == ("const", 0.1)
    assert rule.params["f3_phi"] == ("const", 0.0)  # omitted phase

    fns = build_posterior(spec, dtype=jnp.float64)
    good = np.array([0.3, 45.0, 21.0, 16.0, 15.0])
    assert np.isfinite(float(fns.log_posterior(jnp.asarray(good))))
    # sum|a_m| = 0.85 + 0.1 > 0.9 -> rejected on device
    bad = np.array([0.85, 45.0, 21.0, 16.0, 15.0])
    assert float(fns.log_posterior(jnp.asarray(bad))) == -np.inf

    comp = sersic(f1=D.Uniform(loc=-2.0, scale=4.0))
    draws = comp.draw_batch(256, random_state=np.random.RandomState(0))
    assert np.all(np.abs(draws[:, 0]) <= 0.9)
    comp.set_stochastic_values(np.array([1.5, 21.0, 16.0, 15.0]))
    assert comp.log_priors() == -np.inf

    with pytest.raises(ValueError):
        sersic(f2_phi=10.0)  # phase without amplitude
    with pytest.raises(TypeError):
        Sersic(xy=(1.0, 1.0), mag=20.0, reff=3.0, reff_b=2.0,
               index=1.0, angle=0.0, f9=0.1)

    from psfmc_tpu.ops.pallas.lnpost_pallas import fused_lnl_supported

    assert not fused_lnl_supported(spec, "dft")


def test_fourier_recovery(rng, gaussian_psf):
    """Short ensemble fit recovers an injected m=1 lopsidedness."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    noise = 0.002
    f1_t = 0.35

    def comps(cfg):
        return [
            cfg,
            Sky(adu=D.Normal(loc=0.05, scale=0.05)),
            Sersic(
                xy=D.Uniform(loc=(13.0, 13.0), scale=(6.0, 6.0)),
                mag=D.Uniform(loc=20.0, scale=2.0),
                reff=5.0, reff_b=4.0, index=1.5, angle=30.0,
                angle_degrees=True,
                f1=D.Uniform(loc=-0.8, scale=1.6),
            ),
        ]

    # layout: [0_Sky_adu, 1_Sersic_f1, 1_Sersic_mag, xy]
    truth = np.array([0.05, f1_t, 20.8, 16.2, 15.7])
    spec_g = build_model_spec(
        comps(_config(np.zeros((32, 32)), noise, gaussian_psf))
    )
    fns_g = build_posterior(spec_g, dtype=jnp.float64)
    conv = np.asarray(
        fns_g.render_images(jnp.asarray(truth))["convolved_model"]
    )
    obs = conv + rng.randn(32, 32) * noise
    spec = build_model_spec(comps(_config(obs, noise, gaussian_psf)))
    assert spec.param_names[1] == "1_Sersic_f1"
    fns = build_posterior(spec, dtype=jnp.float64)
    nw = 16
    p0 = truth[None, :] + rng.randn(nw, truth.size) * np.array(
        [0.01, 0.05, 0.05, 0.1, 0.1]
    )
    sampler = EnsembleSampler(nw, spec.num_params, fns, seed=0)
    sampler.init_state(p0)
    sampler.run_burn(200)
    sampler.reset()
    sampler.run_sampling(150)
    flat = np.asarray(sampler.chain).reshape(-1, spec.num_params)
    mean, std = flat.mean(axis=0), flat.std(axis=0)
    assert abs(mean[1] - f1_t) < 5 * std[1] + 0.03
    assert mean[1] > 3 * std[1]


# ---- shared shape machinery on Moffat --------------------------------


def test_moffat_shapes():
    """Moffat gets the same isophote freedom: zero-shape degeneration,
    flux invariance, and the constraint plumbing."""
    from psfmc_tpu.models.components import Moffat
    from psfmc_tpu.ops.moffat import render_moffat, render_moffat_gen

    n = 256
    xg, yg = _grids(n)
    mag, zp = 22.0, 25.0
    args = (
        jnp.asarray([127.3, 128.2], jnp.float64),
        mag, 7.0, 5.0, 2.8, 20.0,
    )
    ell = np.asarray(render_moffat(xg, yg, *args, zp, angle_degrees=True))
    gen = np.asarray(
        render_moffat_gen(xg, yg, *args, 0.0, zp, angle_degrees=True)
    )
    assert np.allclose(gen, ell, rtol=1e-10, atol=0)

    def total(c0, fourier):
        return np.asarray(
            render_moffat_gen(
                xg, yg, *args, c0, zp, angle_degrees=True,
                fourier=fourier,
            )
        ).sum()

    base = total(0.0, ())
    for c0, fourier in [(0.9, ()), (-0.6, ()), (0.5, ((1, 0.3, 40.0),))]:
        assert total(c0, fourier) == pytest.approx(base, rel=0.015), (
            c0, fourier,
        )

    # spec/prior plumbing: layout + device constraint
    yy, xx = np.mgrid[0:32, 0:32].astype(float)
    psf = np.exp(-((xx - 16) ** 2 + (yy - 16) ** 2) / 4.5)
    psf /= psf.sum()
    cfg = _config(np.full((32, 32), 0.05), 0.01, psf)
    comp = Moffat(
        xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
        mag=D.Uniform(loc=20.0, scale=2.0),
        fwhm=6.0, fwhm_b=5.0, index=2.8, angle=0.0, angle_degrees=True,
        c0=D.Uniform(loc=-1.0, scale=2.0),
        f1=D.Uniform(loc=-0.5, scale=1.0),
    )
    spec = build_model_spec([cfg, comp])
    assert spec.param_names == [
        "0_Moffat_c0", "0_Moffat_f1", "0_Moffat_mag", "0_Moffat_xy",
    ]
    fns = build_posterior(spec, dtype=jnp.float64)
    good = np.array([0.5, 0.2, 21.0, 16.0, 15.0])
    assert np.isfinite(float(fns.log_posterior(jnp.asarray(good))))
    bad_c0 = np.array([-1.99, 0.2, 21.0, 16.0, 15.0])
    assert float(fns.log_posterior(jnp.asarray(bad_c0))) == -np.inf
    draws = comp.draw_batch(128, random_state=np.random.RandomState(0))
    assert np.all(draws[:, 0] > -1.95)
    assert np.all(np.abs(draws[:, 1]) <= 0.9)


def test_shaped_posterior_is_differentiable(rng, gaussian_psf):
    """NUTS/MAP differentiate through the shape machinery: the area
    quadrature, the log-space power chain and the Chebyshev azimuth
    recurrences (incl. the rsqrt near the profile center) must give
    finite gradients."""
    import jax

    cfg = _config(np.full((32, 32), 0.05), 0.01, gaussian_psf)
    comp = Sersic(
        xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
        mag=D.Uniform(loc=20.0, scale=2.0),
        reff=D.Uniform(loc=2.0, scale=6.0),
        reff_b=D.Uniform(loc=2.0, scale=6.0),
        index=D.Uniform(loc=0.8, scale=3.0),
        angle=D.Uniform(loc=0.0, scale=180.0),
        angle_degrees=True,
        c0=D.Uniform(loc=-1.0, scale=2.0),
        f1=D.Uniform(loc=-0.5, scale=1.0),
        f1_phi=D.Uniform(loc=0.0, scale=360.0),
        f3=D.Uniform(loc=-0.3, scale=0.6),
    )
    spec = build_model_spec([cfg, comp])
    fns = build_posterior(spec, dtype=jnp.float64)
    # alphabetical: angle, c0, f1, f1_phi, f3, index, mag, reff, reff_b, xy
    theta = jnp.asarray(
        [30.0, 0.5, 0.25, 40.0, -0.1, 1.5, 21.0, 5.0, 4.0, 16.0, 15.5]
    )
    g = jax.grad(fns.log_posterior)(theta)
    assert np.all(np.isfinite(np.asarray(g))), np.asarray(g)
    # exact pixel-center hit: xy on an integer pixel stresses the
    # rsqrt/clamp guards in the azimuth recurrence
    theta_hit = theta.at[9].set(16.0).at[10].set(15.0)
    g2 = jax.grad(fns.log_posterior)(theta_hit)
    assert np.all(np.isfinite(np.asarray(g2))), np.asarray(g2)


def test_fourier_area_factor_accuracy_vs_adaptive_quadrature():
    """The area-factor quadrature must hold accuracy over the FULL c0
    support including the disky range (a theta-only midpoint rule lost
    0.4%-37% for c < 1 — the review regression this test pins)."""
    from scipy import integrate

    from psfmc_tpu.ops.isophote import isophote_area_factor

    modes = ((1, 0.3, 0.5), (3, 0.2, -0.3), (4, 0.15, 1.0))

    def ref(c):
        def integrand(th):
            rho2 = (
                np.abs(np.cos(th)) ** c + np.abs(np.sin(th)) ** c
            ) ** (-2.0 / c)
            f = sum(a * np.cos(m * th - p) for m, a, p in modes)
            return 0.5 * rho2 * (1 + f) ** 2

        val, _ = integrate.quad(
            integrand, 0, 2 * np.pi, limit=800, epsabs=1e-13,
            epsrel=1e-13,
        )
        return val

    for c0 in (-1.9, -1.5, -1.0, -0.99, -0.5, 0.0, 1.0, 4.0, 18.0):
        c = c0 + 2.0
        got = float(
            isophote_area_factor(jnp.asarray(c, jnp.float64), modes)
        )
        assert got == pytest.approx(ref(c), rel=2e-4), c0


def test_fourier_area_factor_closed_form_at_c2():
    """Independent anchor: at c=2 (rho==1) the perturbed area factor is
    exactly pi*(1 + sum a_m^2 / 2), phase-independent."""
    from psfmc_tpu.ops.isophote import isophote_area_factor

    modes = ((1, 0.3, 0.4), (2, 0.25, -1.0), (4, 0.2, 2.2))
    want = np.pi * (1.0 + 0.5 * (0.3**2 + 0.25**2 + 0.2**2))
    got = float(
        isophote_area_factor(jnp.asarray(2.0, jnp.float64), modes)
    )
    assert got == pytest.approx(want, rel=1e-10)
    # phase independence at c=2
    modes2 = tuple((m, a, p + 0.7) for m, a, p in modes)
    got2 = float(
        isophote_area_factor(jnp.asarray(2.0, jnp.float64), modes2)
    )
    assert got2 == pytest.approx(got, rel=1e-10)


def test_expdisk_devauc_aliases(rng, gaussian_psf):
    """ExpDisk/DeVaucouleurs = Sersic with fixed index (GALFIT names)."""
    from psfmc_tpu.models.components import DeVaucouleurs, ExpDisk

    cfg = _config(np.full((32, 32), 0.05), 0.01, gaussian_psf)

    def kw():
        return dict(
            xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
            mag=D.Uniform(loc=20.0, scale=2.0),
            reff=5.0, reff_b=4.0, angle=30.0, angle_degrees=True,
        )

    for cls, n, abbr in (
        (ExpDisk, 1.0, "0EXP_mag"),
        (DeVaucouleurs, 4.0, "0DEV_mag"),
    ):
        comp = cls(**kw())
        spec = build_model_spec([cfg, comp])
        assert spec.param_names == [
            f"0_{cls.__name__}_mag", f"0_{cls.__name__}_xy",
        ]
        assert spec.param_fits_abbrs[0] == abbr
        fns = build_posterior(spec, dtype=jnp.float64)
        ser = Sersic(index=n, **kw())
        spec_s = build_model_spec([cfg, ser])
        fns_s = build_posterior(spec_s, dtype=jnp.float64)
        theta = jnp.asarray([20.7, 16.2, 15.6])
        a = np.asarray(fns.render_images(theta)["raw_model"])
        b = np.asarray(fns_s.render_images(theta)["raw_model"])
        assert np.allclose(a, b, rtol=1e-12)
        with pytest.raises(TypeError):
            cls(index=2.0, **kw())

    # DSL: the class names are injected into model files
    import tempfile, os
    from psfmc_tpu.model_parser import component_list_from_file

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.py")
        with open(path, "w") as f:
            f.write(
                "ExpDisk(xy=(3.0, 3.0), mag=Uniform(loc=20, scale=2),\n"
                "        reff=3.0, reff_b=2.0, angle=0.0)\n"
            )
        comps = component_list_from_file(path)
        assert type(comps[0]).__name__ == "ExpDisk"


def test_deep_disky_c0_prior_warns_at_build():
    """c0 support reaching below -1.5 gets a model-build warning: the
    extreme-disky flux normalization is measurably unreliable there
    (round-5 hypothesis-discovered 2.3x corner; calibration sweep in
    test_properties)."""
    import warnings

    import pytest

    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import Sersic

    kw = dict(
        xy=D.Uniform(loc=(10.0, 10.0), scale=(4.0, 4.0)),
        mag=D.Uniform(loc=20.0, scale=2.0),
        reff=D.Uniform(loc=2.0, scale=4.0),
        reff_b=D.Uniform(loc=2.0, scale=4.0),
        index=1.5,
        angle=0.0,
        angle_degrees=True,
    )
    with pytest.warns(UserWarning, match="extreme-disky"):
        Sersic(c0=D.Uniform(loc=-1.9, scale=2.0), **kw)
    with pytest.warns(UserWarning, match="extreme-disky"):
        Sersic(c0=-1.7, **kw)
    # bounded priors, ordinary constants, and unbounded-support priors
    # with negligible mass below -1.5 (review finding: interval(1.0)
    # made EVERY Normal c0 prior warn) stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        Sersic(c0=D.Uniform(loc=-1.2, scale=2.0), **kw)
        Sersic(c0=D.Normal(loc=0.0, scale=0.1), **kw)
        Sersic(c0=0.4, **kw)
        Sersic(**kw)
