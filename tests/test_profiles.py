"""King / Ferrer / Nuker profile families + the Gaussian alias.

Anchors: radial flux factors against scipy adaptive quadrature (and the
King 1962 closed form), on-grid flux normalization, shape-machinery
degeneration, layout/abbreviation conventions, prior support, DSL
availability, and a short injection-recovery fit.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import (
    Configuration,
    EdgeDisk,
    Ferrer,
    Gaussian,
    King,
    Nuker,
    Sersic,
    Sky,
)
from psfmc_tpu.models.posterior import build_posterior
from psfmc_tpu.models.spec import build_model_spec
from psfmc_tpu.ops import profiles as P


def test_king_quadrature_matches_closed_form():
    for x in (0.3, 1.0, 3.0, 10.0, 30.0):
        q = float(P.king_radial_factor(x * x, 2.0))
        c = float(P.king_radial_factor_alpha2(x * x))
        assert q == pytest.approx(c, rel=1e-12)


def test_king_quadrature_matches_scipy():
    from scipy.integrate import quad

    for x, a in [(3.0, 0.5), (3.0, 1.0), (5.0, 3.5), (10.0, 0.3),
                 (1.5, 7.0)]:
        pedestal = (1 + x * x) ** (-1 / a)
        s, _ = quad(
            lambda t: max((1 + t * t) ** (-1 / a) - pedestal, 0.0) ** a
            * 2 * t,
            0, x, limit=200,
        )
        assert float(P.king_radial_factor(x * x, a)) == pytest.approx(
            s, rel=1e-10
        )


def test_ferrer_beta_function_matches_scipy():
    from scipy.integrate import quad

    for a, b in [(0.5, 0.0), (2.0, 1.0), (1.0, 1.8), (4.0, 0.3),
                 (0.2, 0.5)]:
        s, _ = quad(
            lambda t: (1 - t ** (2 - b)) ** a * 2 * t, 0, 1, limit=200
        )
        assert float(P.ferrer_radial_factor(a, b)) == pytest.approx(
            s, rel=1e-10
        )


def test_nuker_quadrature_matches_scipy():
    from scipy.integrate import quad

    for a, b, g in [(0.5, 2.5, 0.5), (1.0, 4.0, 1.0), (2.0, 8.0, 0.0),
                    (0.3, 2.1, 1.9), (5.0, 3.0, -0.5)]:
        pref = 2 ** ((b - g) / a)
        s, _ = quad(
            lambda t: pref * t ** (-g) * (1 + t ** a) ** ((g - b) / a)
            * 2 * t,
            0, np.inf, limit=400,
        )
        # the cuspy corner (gamma=1.9) is where scipy itself warns of
        # roundoff; 1e-5 covers its own uncertainty there
        assert float(P.nuker_radial_factor(a, b, g)) == pytest.approx(
            s, rel=1e-5
        )


def _grid(n=128):
    yy, xx = np.mgrid[0:n, 0:n]
    return (jnp.asarray(xx, jnp.float64), jnp.asarray(yy, jnp.float64))


FLUX = 10.0 ** (-0.4 * (20.0 - 25.0))


def test_flux_normalization_on_grid():
    xg, yg = _grid()
    xy = jnp.asarray([64.0, 64.0], jnp.float64)
    king = P.render_king(
        xg, yg, xy, 20.0, 3.0, 2.0, 20.0, 2.0, 0.4, 25.0
    )
    assert float(king.sum()) == pytest.approx(FLUX, rel=2e-4)
    fer = P.render_ferrer(
        xg, yg, xy, 20.0, 25.0, 20.0, 2.0, 0.5, 0.0, 25.0
    )
    assert float(fer.sum()) == pytest.approx(FLUX, rel=2e-4)
    # Nuker extends to infinity: point-sampling a gamma=0.7 cusp loses
    # a few % of the central flux (documented; render_oversample
    # recovers it — see test_nuker_cusp_handling)
    nuk = P.render_nuker(
        xg, yg, jnp.asarray([64.3, 63.6], jnp.float64),
        20.0, 4.0, 3.0, 2.0, 5.0, 0.7, 45.0, 25.0,
    )
    assert float(nuk.sum()) == pytest.approx(FLUX, rel=5e-2)


def test_nuker_cusp_handling(rng, gaussian_psf):
    """Exact pixel-center hit: the radius floor bounds the central
    sample; render_oversample recovers the cusp photometry."""
    xg, yg = _grid()
    center = jnp.asarray([64.0, 64.0], jnp.float64)
    args = (20.0, 4.0, 3.0, 2.0, 5.0, 0.7, 45.0, 25.0)
    exact = np.asarray(P.render_nuker(xg, yg, center, *args))
    assert np.all(np.isfinite(exact))
    # bounded: the floored center cannot dominate the image
    assert exact[64, 64] < 0.5 * exact.sum()
    # oversampled posterior render integrates the cusp: flux within 1%
    config = Configuration(
        obs_file=np.zeros((128, 128)),
        obsivm_file=np.full((128, 128), 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e12,
        mag_zeropoint=25.0,
        render_oversample=8, oversample_window=16,
    )
    spec = build_model_spec([
        config,
        Nuker(xy=(64.0, 64.0), mag=20.0, rb=4.0, rb_b=3.0, alpha=2.0,
              beta=5.0, gamma=0.7, angle=45.0, angle_degrees=True),
    ])
    fns = build_posterior(spec, dtype=jnp.float64)
    raw, _ = fns._raw_and_ps(jnp.zeros(0))
    assert float(raw.sum()) == pytest.approx(FLUX, rel=1e-2)


def test_truncation_is_exact_zero():
    xg, yg = _grid(64)
    xy = jnp.asarray([32.0, 32.0], jnp.float64)
    king = np.asarray(
        P.render_king(xg, yg, xy, 20.0, 2.0, 2.0, 8.0, 2.0, 0.0, 25.0)
    )
    rr = np.hypot(np.arange(64) - 32.0, (np.arange(64) - 32.0)[:, None])
    assert np.all(king[rr > 8.5] == 0.0)
    assert np.all(king[rr < 7.5] > 0.0)
    fer = np.asarray(
        P.render_ferrer(xg, yg, xy, 20.0, 8.0, 8.0, 2.0, 0.5, 0.0, 25.0)
    )
    assert np.all(fer[rr > 8.5] == 0.0)
    assert np.all(fer[rr < 7.5] > 0.0)


def test_gen_degenerates_to_elliptical():
    xg, yg = _grid(64)
    xy = jnp.asarray([31.4, 32.6], jnp.float64)
    cases = [
        (P.render_king, P.render_king_gen,
         (xy, 20.0, 3.0, 2.0, 10.0, 2.0, 0.4)),
        (P.render_ferrer, P.render_ferrer_gen,
         (xy, 20.0, 10.0, 8.0, 2.0, 0.5, 0.4)),
        (P.render_nuker, P.render_nuker_gen,
         (xy, 20.0, 3.0, 2.0, 2.0, 5.0, 0.7, 0.4)),
    ]
    for plain, gen, args in cases:
        a = np.asarray(plain(xg, yg, *args, 25.0))
        b = np.asarray(gen(xg, yg, *args, 0.0, 25.0))
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-30)


def test_boxy_flux_invariance():
    """c0 and Fourier modes must not change the total flux (isophote
    area renormalization) — same contract as the Sersic/Moffat gens.

    Radii are kept comfortably resolved: the residual is pure
    pixelization (disky axis cusps concentrate it — measured 1.6% at
    rc=3 falling to 0.25% at rc=6, scale-dependence confirming it is
    sampling error, not a normalization bug).
    """
    xg, yg = _grid(192)
    xy = jnp.asarray([96.0, 96.0], jnp.float64)
    for c0 in (-0.8, 0.0, 1.5):
        img = P.render_king_gen(
            xg, yg, xy, 20.0, 6.0, 5.0, 30.0, 2.0, 0.0, c0, 25.0,
        )
        assert float(img.sum()) == pytest.approx(FLUX, rel=5e-3)
    img = P.render_ferrer_gen(
        xg, yg, xy, 20.0, 40.0, 32.0, 2.0, 0.5, 0.0, 0.6, 25.0,
        fourier=((1, 0.2, 0.3),),
    )
    assert float(img.sum()) == pytest.approx(FLUX, rel=5e-3)


def _config(rng, gaussian_psf, shape=(32, 32), **kw):
    obs = rng.randn(*shape) * 0.01
    return Configuration(
        obs_file=obs,
        obsivm_file=np.full(shape, 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e12,
        mag_zeropoint=25.0,
        **kw,
    )


def test_layout_and_abbrs(rng, gaussian_psf):
    spec = build_model_spec([
        _config(rng, gaussian_psf),
        King(xy=D.Normal(loc=[16.0, 16.0], scale=[1.0, 1.0]),
             mag=D.Uniform(loc=19.0, scale=2.0),
             rc=D.Uniform(loc=1.0, scale=4.0), rc_b=1.5,
             rt=D.Uniform(loc=8.0, scale=8.0), angle=0.0),
        Ferrer(xy=(10.0, 10.0), mag=D.Uniform(loc=19.0, scale=2.0),
               rout=D.Uniform(loc=4.0, scale=6.0), rout_b=3.0,
               alpha=D.Uniform(loc=0.5, scale=3.0), beta=0.5,
               angle=0.0),
        Nuker(xy=(20.0, 20.0), mag=21.0, rb=3.0, rb_b=2.0,
              alpha=D.Uniform(loc=0.5, scale=3.0),
              beta=D.Uniform(loc=2.5, scale=3.0),
              gamma=D.Uniform(loc=0.0, scale=1.5), angle=0.0),
    ])
    # alphabetical within component, file order across components
    assert spec.param_names == [
        "0_King_mag", "0_King_rc", "0_King_rt", "0_King_xy",
        "1_Ferrer_alpha", "1_Ferrer_mag", "1_Ferrer_rout",
        "2_Nuker_alpha", "2_Nuker_beta", "2_Nuker_gamma",
    ]
    abbrs = spec.param_fits_abbrs
    assert "0KNG_RC" in abbrs and "0KNG_RT" in abbrs
    assert "1FER_AL" in abbrs and "2NUK_GA" in abbrs


def test_prior_support_rejected_on_device(rng, gaussian_psf):
    spec = build_model_spec([
        _config(rng, gaussian_psf),
        Nuker(xy=(16.0, 16.0), mag=20.0, rb=3.0, rb_b=2.0,
              alpha=D.Uniform(loc=0.1, scale=5.0),
              beta=D.Uniform(loc=0.1, scale=8.0),
              gamma=D.Uniform(loc=-1.0, scale=4.0), angle=0.0),
    ])
    fns = build_posterior(spec, dtype=jnp.float64)
    # layout: alpha, beta, gamma
    ok = float(fns.log_posterior(jnp.asarray([1.0, 4.0, 0.5])))
    assert np.isfinite(ok)
    for bad in ([1.0, 1.5, 0.5],   # beta <= 2
                [1.0, 4.0, 2.5],   # gamma >= 2 (also > beta? no: <4)
                [1.0, 3.0, 3.5],   # gamma >= beta
                [-0.5, 4.0, 0.5]):  # alpha <= 0 (outside prior too)
        assert float(fns.log_posterior(jnp.asarray(bad))) == -np.inf


def test_draw_batch_respects_constraints():
    king = King(xy=D.Normal(loc=[16.0, 16.0], scale=[1.0, 1.0]),
                mag=D.Uniform(loc=19.0, scale=2.0),
                rc=D.Uniform(loc=1.0, scale=4.0),
                rc_b=D.Uniform(loc=1.0, scale=4.0),
                rt=D.Uniform(loc=8.0, scale=8.0), angle=0.0)
    king.update_stochastic_names(count=0)
    draws = king.draw_batch(256, np.random.RandomState(0))
    # columns in alphabetical stochastic order: mag, rc, rc_b, rt, xy
    rc = draws[:, 1]
    rc_b = draws[:, 2]
    assert draws.shape == (256, 6)
    assert np.all(rc_b <= rc)


def test_gaussian_alias(rng, gaussian_psf):
    g = Gaussian(xy=(16.0, 16.0), mag=20.0, reff=3.0, reff_b=2.0,
                 angle=0.3)
    s = Sersic(xy=(16.0, 16.0), mag=20.0, reff=3.0, reff_b=2.0,
               index=0.5, angle=0.3)
    spec_g = build_model_spec([_config(rng, gaussian_psf), g])
    rng2 = np.random.RandomState(1234)
    spec_s = build_model_spec([_config(rng2, gaussian_psf), s])
    fg = build_posterior(spec_g, dtype=jnp.float64)
    fs = build_posterior(spec_s, dtype=jnp.float64)
    a, _ = fg._raw_and_ps(jnp.zeros(0))
    b, _ = fs._raw_and_ps(jnp.zeros(0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the half-maximum falls exactly at reff: FWHM = 2 reff (checked
    # on the bare profile — the composite includes the sub-pixel
    # trapezoid correction, which shifts point values slightly)
    from psfmc_tpu.ops.sersic import render_sersic

    pts = render_sersic(
        jnp.asarray([[16.0, 19.0]], jnp.float64),
        jnp.asarray([[16.0, 16.0]], jnp.float64),
        jnp.asarray([16.0, 16.0], jnp.float64),
        20.0, 3.0, 3.0, 0.5, 0.0, 25.0, correction=False,
    )
    assert float(pts[0, 1]) == pytest.approx(
        float(pts[0, 0]) / 2, rel=1e-6
    )
    with pytest.raises(TypeError, match="index"):
        Gaussian(xy=(0, 0), mag=20.0, reff=2.0, reff_b=2.0, angle=0.0,
                 index=1.0)


def test_dsl_parses_new_families(tmp_path):
    from psfmc_tpu.model_parser import component_list_from_string

    src = """
Configuration(obs_file=__import__('numpy').zeros((8,8)),
              obsivm_file=__import__('numpy').ones((8,8)),
              psf_files=__import__('numpy').ones((4,4))/16.,
              psfivm_files=__import__('numpy').ones((4,4))*1e6,
              mag_zeropoint=25.)
King(xy=(4,4), mag=20., rc=1., rc_b=1., rt=3., angle=0.)
Ferrer(xy=(4,4), mag=21., rout=3., rout_b=2., alpha=1., beta=0.5, angle=0.)
Nuker(xy=(4,4), mag=22., rb=1., rb_b=1., alpha=1., beta=4., gamma=0.5, angle=0.)
Gaussian(xy=(4,4), mag=23., reff=1., reff_b=1., angle=0.)
"""
    comps = component_list_from_string(src)
    kinds = [type(c).__name__ for c in comps]
    assert kinds == [
        "Configuration", "King", "Ferrer", "Nuker", "Gaussian",
    ]


def test_axisratio_derived_trace_new_families():
    from psfmc_tpu.analysis.plotting import _get_trace
    from psfmc_tpu.io.table import Table

    rng = np.random.RandomState(3)
    db = Table({
        "0_King_rc": 3.0 + rng.rand(16),
        "0_King_rc_b": 1.5 + rng.rand(16),
        "1_Nuker_rb": 4.0 + rng.rand(16),
        "1_Nuker_rb_b": 2.0 + rng.rand(16),
    })
    ar = _get_trace("0_King_axisratio", db)
    np.testing.assert_allclose(
        np.ravel(ar),
        np.asarray(db["0_King_rc_b"]) / np.asarray(db["0_King_rc"]),
    )
    ar = _get_trace("1_Nuker_axisratio", db)
    np.testing.assert_allclose(
        np.ravel(ar),
        np.asarray(db["1_Nuker_rb_b"]) / np.asarray(db["1_Nuker_rb"]),
    )


def test_king_injection_recovery(rng, gaussian_psf):
    """Short e2e: inject a King cluster through the framework's own
    renderer, recover mag/rc within a few sigma."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    noise = 0.002
    truth = np.array([20.5, 2.5, 16.2, 15.7])  # mag, rc, x, y

    def comps(obs):
        cfg = Configuration(
            obs_file=obs, obsivm_file=np.full((32, 32), 1 / noise**2),
            psf_files=gaussian_psf,
            psfivm_files=np.ones_like(gaussian_psf) * 1e12,
            mag_zeropoint=25.0,
        )
        return [cfg, King(
            xy=D.Uniform(loc=(13.0, 13.0), scale=(6.0, 6.0)),
            mag=D.Uniform(loc=19.5, scale=2.0),
            rc=D.Uniform(loc=1.0, scale=4.0),
            rc_b=2.0, rt=12.0, angle=0.0,
        )]

    spec_g = build_model_spec(comps(np.zeros((32, 32))))
    fns_g = build_posterior(spec_g, dtype=jnp.float64)
    conv = np.asarray(
        fns_g.render_images(jnp.asarray(truth))["convolved_model"]
    )
    obs = conv + rng.randn(32, 32) * noise
    spec = build_model_spec(comps(obs))
    fns = build_posterior(spec, dtype=jnp.float64)
    nw = 32
    p0 = truth[None, :] + rng.randn(nw, 4) * [0.01, 0.05, 0.05, 0.05]
    sampler = EnsembleSampler(nw, spec.num_params, fns, seed=0)
    sampler.init_state(p0)
    sampler.run_burn(150)
    sampler.reset()
    sampler.run_sampling(150)
    flat = sampler.chain.reshape(-1, 4)
    mean = flat.mean(axis=0)
    std = flat.std(axis=0)
    for i, name in enumerate(["mag", "rc", "x", "y"]):
        assert abs(mean[i] - truth[i]) < 5 * std[i] + 0.02, (
            name, mean[i], truth[i], std[i]
        )


# ------------------------------------------------------------ EdgeDisk

def test_xk1_matches_scipy():
    from scipy.special import k1

    x = np.concatenate([
        np.logspace(-10, np.log10(2.0), 200),
        np.linspace(2.0, 60.0, 200),
    ])
    got = np.asarray(P.xk1(jnp.asarray(x, jnp.float64)))
    exact = x * k1(x)
    np.testing.assert_allclose(got, exact, rtol=5e-7)
    # x -> 0 limit is exactly 1 and finite at 0 (clamped branch)
    assert float(P.xk1(jnp.asarray(0.0, jnp.float64))) == pytest.approx(
        1.0, abs=1e-9
    )


def test_edgedisk_flux_and_orientation():
    xg, yg = _grid(256)
    xy = jnp.asarray([128.0, 128.0], jnp.float64)
    img = np.asarray(
        P.render_edgedisk(xg, yg, xy, 20.0, 4.0, 1.5, 0.0, 25.0)
    )
    assert np.all(np.isfinite(img))
    assert float(img.sum()) == pytest.approx(FLUX, rel=5e-3)
    # +90deg convention: angle=0 puts the midplane along +y (same as
    # every other component's major axis)
    dy2 = (img * (yg - 128.0) ** 2).sum()
    dx2 = (img * (xg - 128.0) ** 2).sum()
    assert float(dy2) > 4 * float(dx2)
    # rotated 90deg: moments swap
    rot = np.asarray(
        P.render_edgedisk(xg, yg, xy, 20.0, 4.0, 1.5, 90.0, 25.0,
                          angle_degrees=True)
    )
    assert float((rot * (xg - 128.0) ** 2).sum()) > 4 * float(
        (rot * (yg - 128.0) ** 2).sum()
    )


def test_edgedisk_center_hit_finite_with_gradient(rng, gaussian_psf):
    """Exact pixel-center hit along the midplane: value and gradient
    stay finite (the x*K1 log term rides the radius clamp)."""
    spec = build_model_spec([
        _config(rng, gaussian_psf),
        EdgeDisk(xy=D.Uniform(loc=(14.0, 14.0), scale=(4.0, 4.0)),
                 mag=D.Uniform(loc=19.0, scale=2.0),
                 rs=D.Uniform(loc=1.0, scale=6.0),
                 hs=D.Uniform(loc=0.5, scale=3.0),
                 angle=D.Uniform(loc=0.0, scale=180.0),
                 angle_degrees=True),
    ])
    fns = build_posterior(spec, dtype=jnp.float64)
    # layout: angle, hs, mag, rs, xy — xy on the exact pixel center
    theta = jnp.asarray([40.0, 1.2, 20.0, 3.0, 16.0, 16.0])
    lp = float(fns.log_posterior(theta))
    assert np.isfinite(lp)
    g = np.asarray(jax.grad(fns.log_posterior)(theta))
    assert np.all(np.isfinite(g))


def test_edgedisk_layout_support_and_dsl(rng, gaussian_psf):
    spec = build_model_spec([
        _config(rng, gaussian_psf),
        EdgeDisk(xy=(16.0, 16.0), mag=20.0,
                 rs=D.Uniform(loc=-1.0, scale=6.0),
                 hs=D.Uniform(loc=-1.0, scale=3.0),
                 angle=0.0),
    ])
    assert spec.param_names == ["0_EdgeDisk_hs", "0_EdgeDisk_rs"]
    assert spec.param_fits_abbrs == ["0EDG_HS", "0EDG_RS"]
    fns = build_posterior(spec, dtype=jnp.float64)
    assert np.isfinite(float(fns.log_posterior(jnp.asarray([1.0, 3.0]))))
    # device support: either scale <= 0 is rejected even inside the
    # (deliberately loose) prior box
    assert float(fns.log_posterior(jnp.asarray([-0.5, 3.0]))) == -np.inf
    assert float(fns.log_posterior(jnp.asarray([1.0, -0.5]))) == -np.inf

    from psfmc_tpu.model_parser import component_list_from_string

    comps = component_list_from_string("""
Configuration(obs_file=__import__('numpy').zeros((8,8)),
              obsivm_file=__import__('numpy').ones((8,8)),
              psf_files=__import__('numpy').ones((4,4))/16.,
              psfivm_files=__import__('numpy').ones((4,4))*1e6,
              mag_zeropoint=25.)
EdgeDisk(xy=(4,4), mag=20., rs=2., hs=0.8, angle=0.)
""")
    assert type(comps[1]).__name__ == "EdgeDisk"

    from psfmc_tpu.analysis.plotting import _get_trace
    from psfmc_tpu.io.table import Table

    db = Table({
        "0_EdgeDisk_rs": 3.0 + np.random.RandomState(5).rand(8),
        "0_EdgeDisk_hs": 1.0 + np.random.RandomState(6).rand(8),
    })
    ar = _get_trace("0_EdgeDisk_axisratio", db)
    np.testing.assert_allclose(
        np.ravel(ar),
        np.asarray(db["0_EdgeDisk_hs"]) / np.asarray(db["0_EdgeDisk_rs"]),
    )


def test_edgedisk_injection_recovery(rng, gaussian_psf):
    """Short e2e: inject an edge-on disk through the framework's own
    renderer, recover mag/rs/hs within a few sigma."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    noise = 0.002
    truth = np.array([20.5, 1.2, 3.0, 16.2, 15.7])  # hs, mag order below

    def comps(obs):
        cfg = Configuration(
            obs_file=obs, obsivm_file=np.full((32, 32), 1 / noise**2),
            psf_files=gaussian_psf,
            psfivm_files=np.ones_like(gaussian_psf) * 1e12,
            mag_zeropoint=25.0,
        )
        return [cfg, EdgeDisk(
            xy=D.Uniform(loc=(13.0, 13.0), scale=(6.0, 6.0)),
            mag=D.Uniform(loc=19.5, scale=2.0),
            rs=D.Uniform(loc=1.0, scale=4.0),
            hs=D.Uniform(loc=0.5, scale=2.0),
            angle=30.0, angle_degrees=True,
        )]

    # layout: hs, mag, rs, xy
    theta_true = np.array([1.2, 20.5, 3.0, 16.2, 15.7])
    spec_g = build_model_spec(comps(np.zeros((32, 32))))
    fns_g = build_posterior(spec_g, dtype=jnp.float64)
    conv = np.asarray(
        fns_g.render_images(jnp.asarray(theta_true))["convolved_model"]
    )
    obs = conv + rng.randn(32, 32) * noise
    spec = build_model_spec(comps(obs))
    fns = build_posterior(spec, dtype=jnp.float64)
    nw = 32
    p0 = theta_true[None, :] + rng.randn(nw, 5) * [
        0.02, 0.01, 0.05, 0.05, 0.05
    ]
    sampler = EnsembleSampler(nw, spec.num_params, fns, seed=0)
    sampler.init_state(p0)
    sampler.run_burn(150)
    sampler.reset()
    sampler.run_sampling(150)
    flat = sampler.chain.reshape(-1, 5)
    mean = flat.mean(axis=0)
    std = flat.std(axis=0)
    for i, name in enumerate(["hs", "mag", "rs", "x", "y"]):
        assert abs(mean[i] - theta_true[i]) < 5 * std[i] + 0.02, (
            name, mean[i], theta_true[i], std[i]
        )
