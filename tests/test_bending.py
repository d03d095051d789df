"""Bending modes (GALFIT-style B1/B2/B3 — beyond the reference).

Anchors: exact degeneration at zero amplitude, exact total-flux
invariance (the shear has unit Jacobian, so no renormalization is
needed — composed or not with c0/Fourier shapes), the banana/S-shape
geometric signatures (mirror/rotation symmetries), layout + naming,
prior-draw batching, differentiability, and mock-injection recovery
through the sampler.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import (
    Configuration, King, Moffat, Sersic, Sky,
)
from psfmc_tpu.models.posterior import build_posterior
from psfmc_tpu.models.spec import build_model_spec
from psfmc_tpu.ops.sersic import render_sersic, render_sersic_gen


def _grids(n):
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    return jnp.asarray(xx), jnp.asarray(yy)


def _config(obs, noise, psf):
    return Configuration(
        obs_file=obs,
        obsivm_file=np.full(obs.shape, 1.0 / noise**2),
        psf_files=psf,
        psfivm_files=np.full_like(psf, 1e8),
        mag_zeropoint=25.0,
    )


ARGS = (
    jnp.asarray([63.5, 63.5], jnp.float64),  # centered on the grid
    20.5,
    4.0,
    3.0,
    1.5,
    30.0,
    25.0,
)


def test_zero_amp_degenerates_to_elliptical():
    xg, yg = _grids(128)
    ell = np.asarray(render_sersic(xg, yg, *ARGS, angle_degrees=True))
    gen = np.asarray(
        render_sersic_gen(
            xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True,
            bending=((2, 0.0), (3, 0.0)),
        )
    )
    assert np.allclose(gen, ell, rtol=1e-10, atol=0)


@pytest.mark.parametrize("bending", [((1, 0.4),), ((2, 0.5),)])
def test_total_flux_bending_invariant(bending):
    """Unit-Jacobian shear: the image sum matches the unbent sum.

    The continuum integral over the INFINITE plane is exactly
    invariant (no area-factor change, unlike c0/Fourier shapes which
    need explicit renormalization).  On a finite frame two real,
    physically-correct effects remain: midpoint-sampling error and
    flux the bent arms carry off the frame edge — both < 2e-3 here
    (compact profile, moderate amplitudes; see
    test_strong_bend_deficit_is_offframe_flux for the strong-bend
    regime).
    """
    xg, yg = _grids(128)
    base = float(
        jnp.sum(render_sersic(xg, yg, *ARGS, angle_degrees=True))
    )
    bent = float(
        jnp.sum(
            render_sersic_gen(
                xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True,
                bending=bending,
            )
        )
    )
    assert bent == pytest.approx(base, rel=2e-3), bending


def test_strong_bend_deficit_is_offframe_flux():
    """A strong b3 bend measurably LOSES frame flux — and that deficit
    is off-frame flux, not a normalization error: it shrinks steadily
    as the frame grows (measured -0.73% @128, -0.10% @384,
    -0.021% @768 for this configuration).  Finer sub-pixel sampling
    does NOT shrink it (the plateau is real flux outside the frame,
    documented behavior)."""
    deficits = {}
    for n in (128, 384):
        c = (n - 1) / 2.0
        yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
        xg, yg = jnp.asarray(xx), jnp.asarray(yy)
        xy = jnp.asarray([c, c], jnp.float64)
        base = float(
            jnp.sum(
                render_sersic_gen(
                    xg, yg, xy, *ARGS[1:6], 0.0, ARGS[6],
                    angle_degrees=True, correction=False,
                )
            )
        )
        bent = float(
            jnp.sum(
                render_sersic_gen(
                    xg, yg, xy, *ARGS[1:6], 0.0, ARGS[6],
                    angle_degrees=True, bending=((3, -0.2),),
                    correction=False,
                )
            )
        )
        deficits[n] = (base - bent) / base
    assert deficits[128] > 3e-3  # the strong bend really sheds flux
    assert deficits[384] < 0.25 * deficits[128]  # ...off the frame


def test_flux_invariant_combined_with_c0_and_fourier():
    n = 256
    c = (n - 1) / 2.0
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    xg, yg = jnp.asarray(xx), jnp.asarray(yy)
    xy = jnp.asarray([c, c], jnp.float64)
    kw = dict(angle_degrees=True, fourier=((1, 0.2, 40.0),))
    base = float(
        jnp.sum(
            render_sersic_gen(xg, yg, xy, *ARGS[1:6], 0.6, ARGS[6],
                              **kw)
        )
    )
    bent = float(
        jnp.sum(
            render_sersic_gen(
                xg, yg, xy, *ARGS[1:6], 0.6, ARGS[6],
                bending=((2, 0.35), (3, -0.1)), **kw,
            )
        )
    )
    assert bent == pytest.approx(base, rel=2e-3)


def test_bending_sign_mirror_and_rotation_symmetry():
    """+b2 and -b2 are mirror images across the major axis; a pure b3
    image is 180-degree rotation symmetric (odd shear)."""
    xg, yg = _grids(128)
    # angle=-90deg + the +90deg convention => u along x, v along y:
    # the mirror across the major axis is a flip of the y (row) axis
    args = ARGS[:5] + (-90.0,)
    plus = np.asarray(
        render_sersic_gen(
            xg, yg, *args, 0.0, ARGS[6], angle_degrees=True,
            bending=((2, 0.4),),
        )
    )
    minus = np.asarray(
        render_sersic_gen(
            xg, yg, *args, 0.0, ARGS[6], angle_degrees=True,
            bending=((2, -0.4),),
        )
    )
    assert np.allclose(plus, minus[::-1, :], rtol=1e-8, atol=0)
    # and b2 != 0 actually changes the image
    base = np.asarray(
        render_sersic_gen(
            xg, yg, *args, 0.0, ARGS[6], angle_degrees=True,
        )
    )
    assert not np.allclose(plus, base, rtol=1e-3)

    s_shape = np.asarray(
        render_sersic_gen(
            xg, yg, *args, 0.0, ARGS[6], angle_degrees=True,
            bending=((3, 0.3),),
        )
    )
    assert np.allclose(s_shape, s_shape[::-1, ::-1], rtol=1e-8, atol=0)
    # but NOT mirror-symmetric about the major axis (it is bent)
    assert not np.allclose(s_shape, s_shape[::-1, :], rtol=1e-3)


def test_banana_sags_away_from_bend_sign():
    """b2 > 0 lifts the isophote ends: at offsets along the major axis
    the flux-weighted minor-axis centroid moves opposite to the vertex
    (v_bent = v + b2 u^2 => constant-radius locus v = t - b2 u^2)."""
    xg, yg = _grids(128)
    args = ARGS[:5] + (-90.0,)
    img = np.asarray(
        render_sersic_gen(
            xg, yg, *args, 0.0, ARGS[6], angle_degrees=True,
            bending=((2, 0.5),),
        )
    )
    # column at u = +2 reff (x = 63.5 + 8 -> col 71/72): centroid in y
    col = img[:, 72]
    y = np.arange(128)
    cen = float((col * y).sum() / col.sum())
    assert cen < 63.5 - 0.5  # sagged at least half a pixel downward


def test_layout_naming_and_fused_gate(gaussian_psf):
    cfg = _config(np.zeros((32, 32)), 0.01, gaussian_psf)
    s = Sersic(
        xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
        mag=D.Uniform(loc=20.0, scale=2.0),
        reff=4.0,
        reff_b=3.0,
        index=1.5,
        angle=30.0,
        angle_degrees=True,
        b2=D.Normal(loc=0.0, scale=0.3),
        b3=0.1,
    )
    spec = build_model_spec([cfg, s])
    # b2 slots in alphabetically (before c0/f*/mag); the constant b3
    # contributes no slot but must reach the render rule
    assert spec.param_names[0] == "0_Sersic_b2"
    assert "b3" in spec.comp_specs[0].params
    # bending disqualifies the packed elliptical fused kernel
    from psfmc_tpu.ops.pallas.lnpost_pallas import fused_lnl_supported

    assert not fused_lnl_supported(spec, "dft")
    # unknown shape kwargs still rejected
    with pytest.raises(TypeError):
        Sersic(xy=(1.0, 1.0), mag=20.0, reff=3.0, reff_b=2.0,
               index=1.0, angle=0.0, b9=0.1)


def test_draw_batch_and_host_prior_with_bending(rng):
    s = Sersic(
        xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
        mag=D.Uniform(loc=20.0, scale=2.0),
        reff=D.Uniform(loc=2.0, scale=4.0),
        reff_b=D.Uniform(loc=2.0, scale=4.0),
        index=1.5,
        angle=30.0,
        angle_degrees=True,
        b1=D.Normal(loc=0.0, scale=0.2),
        b2=D.Normal(loc=0.0, scale=0.2),
    )
    draws = s.draw_batch(64, random_state=np.random.RandomState(0))
    assert draws.shape == (64, 7)  # b1 b2 mag reff reff_b xy(2)
    assert np.isfinite(draws).all()
    s.set_stochastic_values(draws[0])
    assert np.isfinite(s.log_priors())


def test_bent_posterior_is_differentiable(rng, gaussian_psf):
    noise = 0.01
    obs = rng.randn(32, 32) * noise
    cfg = _config(obs, noise, gaussian_psf)
    comps = [
        cfg,
        Sersic(
            xy=D.Uniform(loc=(13.0, 13.0), scale=(6.0, 6.0)),
            mag=D.Uniform(loc=20.0, scale=2.0),
            reff=4.0,
            reff_b=3.0,
            index=1.5,
            angle=30.0,
            angle_degrees=True,
            b1=D.Normal(loc=0.0, scale=0.3),
            b2=D.Normal(loc=0.0, scale=0.3),
            b3=D.Normal(loc=0.0, scale=0.3),
        ),
    ]
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float64)
    theta = jnp.asarray([0.25, -0.3, 0.1, 20.8, 16.2, 15.7])
    g = jax.grad(fns.log_posterior)(theta)
    assert np.isfinite(np.asarray(g)).all()


def test_moffat_and_king_bending_flux_invariant():
    from psfmc_tpu.ops.moffat import render_moffat_gen
    from psfmc_tpu.ops.profiles import render_king_gen

    xg, yg = _grids(128)
    m_args = (jnp.asarray([63.5, 63.5]), 20.5, 6.0, 4.5, 3.0, 30.0)
    base = float(
        jnp.sum(
            render_moffat_gen(
                xg, yg, *m_args, 0.0, 25.0, True
            )
        )
    )
    bent = float(
        jnp.sum(
            render_moffat_gen(
                xg, yg, *m_args, 0.0, 25.0, True,
                bending=((2, 0.4),),
            )
        )
    )
    assert bent == pytest.approx(base, rel=2e-3)

    k_args = (jnp.asarray([63.5, 63.5]), 20.5, 4.0, 3.0, 16.0, 2.0,
              30.0)
    base = float(
        jnp.sum(render_king_gen(xg, yg, *k_args, 0.0, 25.0, True))
    )
    bent = float(
        jnp.sum(
            render_king_gen(
                xg, yg, *k_args, 0.0, 25.0, True,
                bending=((3, 0.2),),
            )
        )
    )
    assert bent == pytest.approx(base, rel=2e-3)


def test_b2_recovery(rng, gaussian_psf):
    """Short ensemble fit recovers an injected banana bend from a
    framework-generated mock."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    noise = 0.002
    b2_t = 0.45

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
                b2=D.Uniform(loc=-1.0, scale=2.0),
            ),
        ]

    # layout: [0_Sky_adu, 1_Sersic_b2, 1_Sersic_mag, xy]
    truth = np.array([0.05, b2_t, 20.8, 16.2, 15.7])
    spec_g = build_model_spec(
        comps(_config(np.zeros((32, 32)), noise, gaussian_psf))
    )
    fns_g = build_posterior(spec_g, dtype=jnp.float64)
    conv = np.asarray(
        fns_g.render_images(jnp.asarray(truth))["convolved_model"]
    )
    obs = conv + rng.randn(32, 32) * noise
    spec = build_model_spec(comps(_config(obs, noise, gaussian_psf)))
    assert spec.param_names[1] == "1_Sersic_b2"
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
    assert abs(mean[1] - b2_t) < 5 * std[1] + 0.05
    # a bent injection must be detected as bent with confidence
    assert mean[1] > 3 * std[1]
