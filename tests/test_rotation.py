"""Spiral/swirl coordinate rotation (GALFIT power rotation, simplified
— beyond the reference).

Anchors: exact flux invariance (the swirl preserves every annulus, so
unlike bending there is no off-frame caveat at all), zero-rotation and
circular-profile degeneration, the bar region (no rotation inside
``rot_in``), 180-degree point symmetry, layout + validation, device
prior support, differentiability, and e2e recovery of the winding
angle.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import (
    Configuration, King, Sersic, Sky,
)
from psfmc_tpu.models.posterior import build_posterior
from psfmc_tpu.models.spec import build_model_spec
from psfmc_tpu.ops.sersic import render_sersic_gen


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
    jnp.asarray([63.5, 63.5], jnp.float64),
    20.5, 4.0, 2.4, 1.5, 30.0, 25.0,
)


def test_zero_rotation_degenerates():
    xg, yg = _grids(128)
    base = np.asarray(
        render_sersic_gen(
            xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True
        )
    )
    rot0 = np.asarray(
        render_sersic_gen(
            xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True,
            rotation=(0.0, 12.0, 0.0, 1.0),
        )
    )
    assert np.allclose(rot0, base, rtol=1e-6, atol=0)


def test_swirl_invisible_on_circular_profile():
    """A radius-dependent rotation of a circularly symmetric profile is
    the identity — the strongest internal consistency check."""
    xg, yg = _grids(128)
    args = (ARGS[0], 20.5, 4.0, 4.0, 1.5, 0.0, 25.0)  # q = 1
    base = np.asarray(
        render_sersic_gen(
            xg, yg, *args[:6], 0.0, args[6], angle_degrees=True
        )
    )
    swirled = np.asarray(
        render_sersic_gen(
            xg, yg, *args[:6], 0.0, args[6], angle_degrees=True,
            rotation=(170.0, 10.0, 0.0, 1.0),
        )
    )
    assert np.allclose(swirled, base, rtol=1e-4, atol=1e-12)


@pytest.mark.parametrize(
    "rotation",
    [(90.0, 12.0, 0.0, 1.0), (-150.0, 10.0, 3.0, 0.7),
     (300.0, 8.0, 2.0, 2.0)],
)
def test_total_flux_rotation_invariant(rotation):
    """The swirl permutes flux WITHIN each annulus, so even the frame
    sum is invariant (no off-frame loss, unlike strong bending) —
    only point-sampling error remains."""
    xg, yg = _grids(128)
    base = float(
        jnp.sum(
            render_sersic_gen(
                xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True
            )
        )
    )
    swirled = float(
        jnp.sum(
            render_sersic_gen(
                xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True,
                rotation=rotation,
            )
        )
    )
    assert swirled == pytest.approx(base, rel=2e-3), rotation


def test_flux_invariant_combined_with_all_shapes():
    xg, yg = _grids(128)
    kw = dict(
        angle_degrees=True,
        fourier=((1, 0.15, 40.0),),
        bending=((2, 0.15),),
    )
    base = float(
        jnp.sum(
            render_sersic_gen(
                xg, yg, *ARGS[:6], 0.5, ARGS[6], **kw
            )
        )
    )
    swirled = float(
        jnp.sum(
            render_sersic_gen(
                xg, yg, *ARGS[:6], 0.5, ARGS[6],
                rotation=(120.0, 10.0, 2.0, 1.0), **kw,
            )
        )
    )
    assert swirled == pytest.approx(base, rel=5e-3)


def test_bar_region_and_point_symmetry():
    xg, yg = _grids(128)
    base = np.asarray(
        render_sersic_gen(
            xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True
        )
    )
    img = np.asarray(
        render_sersic_gen(
            xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True,
            rotation=(120.0, 12.0, 6.0, 1.0),
        )
    )
    # inside rot_in (6 px, a PIXEL radius in the component frame) the
    # profile is untouched — check a conservative 5-px disk
    yy, xx = np.mgrid[0:128, 0:128]
    r = np.hypot(xx - 63.5, yy - 63.5)
    inner = r < 5.0
    assert np.allclose(img[inner], base[inner], rtol=1e-6)
    # outside it genuinely winds
    assert not np.allclose(img, base, rtol=1e-3)
    # and the swirl preserves 180-degree point symmetry
    assert np.allclose(img, img[::-1, ::-1], rtol=1e-7, atol=0)


def test_rotation_on_king():
    from psfmc_tpu.ops.profiles import render_king_gen

    xg, yg = _grids(128)
    k_args = (jnp.asarray([63.5, 63.5]), 20.5, 4.0, 2.5, 16.0, 2.0,
              30.0)
    base = float(
        jnp.sum(render_king_gen(xg, yg, *k_args, 0.0, 25.0, True))
    )
    swirled = float(
        jnp.sum(
            render_king_gen(
                xg, yg, *k_args, 0.0, 25.0, True,
                rotation=(140.0, 10.0, 0.0, 1.0),
            )
        )
    )
    assert swirled == pytest.approx(base, rel=2e-3)


def test_layout_validation_and_fused_gate(gaussian_psf):
    cfg = _config(np.zeros((32, 32)), 0.01, gaussian_psf)
    s = Sersic(
        xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
        mag=D.Uniform(loc=20.0, scale=2.0),
        reff=4.0, reff_b=3.0, index=1.5, angle=30.0,
        angle_degrees=True,
        rot_ang=D.Uniform(loc=-180.0, scale=360.0),
        rot_out=10.0,
    )
    spec = build_model_spec([cfg, s])
    assert spec.param_names == [
        "0_Sersic_mag", "0_Sersic_rot_ang", "0_Sersic_xy",
    ]
    assert spec.comp_specs[0].params["rot_out"] == ("const", 10.0)
    from psfmc_tpu.ops.pallas.lnpost_pallas import fused_lnl_supported

    assert not fused_lnl_supported(spec, "dft")
    with pytest.raises(ValueError):
        Sersic(xy=(1.0, 1.0), mag=20.0, reff=3.0, reff_b=2.0,
               index=1.0, angle=0.0, rot_ang=90.0)
    with pytest.raises(ValueError):
        Sersic(xy=(1.0, 1.0), mag=20.0, reff=3.0, reff_b=2.0,
               index=1.0, angle=0.0, rot_pow=1.5)
    # rotation is an isophote freedom: the King family takes it too
    k = King(xy=(1.0, 1.0), mag=20.0, rc=3.0, rc_b=2.0, rt=10.0,
             alpha=2.0, angle=0.0, rot_ang=90.0, rot_out=8.0)
    assert np.isfinite(k.log_priors())


def test_device_prior_rejects_bad_rotation(gaussian_psf):
    cfg = _config(np.zeros((32, 32)), 0.01, gaussian_psf)
    comps = [
        cfg,
        Sersic(
            xy=(16.0, 16.0), mag=20.5, reff=4.0, reff_b=3.0,
            index=1.5, angle=30.0, angle_degrees=True,
            rot_ang=90.0,
            rot_out=D.Uniform(loc=-5.0, scale=20.0),
            rot_in=D.Uniform(loc=-2.0, scale=8.0),
            rot_pow=D.Uniform(loc=-1.0, scale=4.0),
        ),
    ]
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float64)
    # layout: rot_in, rot_out, rot_pow
    assert spec.param_names == [
        "0_Sersic_rot_in", "0_Sersic_rot_out", "0_Sersic_rot_pow",
    ]
    assert np.isfinite(
        float(fns.log_posterior(jnp.asarray([2.0, 10.0, 1.0])))
    )
    # rot_out <= rot_in
    assert float(
        fns.log_posterior(jnp.asarray([5.0, 4.0, 1.0]))
    ) == -np.inf
    # negative rot_in
    assert float(
        fns.log_posterior(jnp.asarray([-1.0, 10.0, 1.0]))
    ) == -np.inf
    # non-positive power
    assert float(
        fns.log_posterior(jnp.asarray([2.0, 10.0, -0.5]))
    ) == -np.inf


def test_rotated_posterior_is_differentiable(rng, gaussian_psf):
    noise = 0.01
    obs = rng.randn(32, 32) * noise
    cfg = _config(obs, noise, gaussian_psf)
    comps = [
        cfg,
        Sersic(
            xy=D.Uniform(loc=(13.0, 13.0), scale=(6.0, 6.0)),
            mag=D.Uniform(loc=20.0, scale=2.0),
            reff=4.0, reff_b=2.5, index=1.5, angle=30.0,
            angle_degrees=True,
            rot_ang=D.Uniform(loc=-180.0, scale=360.0),
            rot_out=D.Uniform(loc=4.0, scale=12.0),
            rot_in=D.Uniform(loc=0.5, scale=3.0),
            rot_pow=D.Uniform(loc=0.3, scale=2.0),
        ),
    ]
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float64)
    # layout: mag, rot_ang, rot_in, rot_out, rot_pow, xy
    theta = jnp.asarray([20.8, 95.0, 1.5, 9.0, 0.8, 16.2, 15.7])
    g = jax.grad(fns.log_posterior)(theta)
    assert np.isfinite(np.asarray(g)).all()


def test_draw_batch_with_rotation(rng):
    s = Sersic(
        xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
        mag=D.Uniform(loc=20.0, scale=2.0),
        reff=4.0, reff_b=3.0, index=1.5, angle=30.0,
        angle_degrees=True,
        rot_ang=D.Uniform(loc=-180.0, scale=360.0),
        rot_out=D.Uniform(loc=-2.0, scale=14.0),  # can draw <= 0
        rot_in=1.0,
    )
    draws = s.draw_batch(64, random_state=np.random.RandomState(0))
    # rot_out column must respect rot_out > rot_in = 1
    names = [k for k, _ in s.sorted_prior_items()]
    i = names.index("rot_out")
    start = sum(
        int(np.asarray(p.value).size)
        for k, p in s.sorted_prior_items()[:i]
    )
    assert np.all(draws[:, start] > 1.0)


def test_rot_ang_recovery(rng, gaussian_psf):
    """Short ensemble fit recovers an injected winding angle."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    noise = 0.002
    ang_t = 110.0

    def comps(cfg):
        return [
            cfg,
            Sky(adu=D.Normal(loc=0.05, scale=0.05)),
            Sersic(
                xy=D.Uniform(loc=(13.0, 13.0), scale=(6.0, 6.0)),
                mag=D.Uniform(loc=20.0, scale=2.0),
                reff=5.0, reff_b=2.5, index=1.0, angle=30.0,
                angle_degrees=True,
                rot_ang=D.Uniform(loc=-180.0, scale=360.0),
                rot_out=8.0,
            ),
        ]

    # layout: [0_Sky_adu, 1_Sersic_mag, 1_Sersic_rot_ang, xy]
    truth = np.array([0.05, 20.8, ang_t, 16.2, 15.7])
    spec_g = build_model_spec(
        comps(_config(np.zeros((32, 32)), noise, gaussian_psf))
    )
    fns_g = build_posterior(spec_g, dtype=jnp.float64)
    conv = np.asarray(
        fns_g.render_images(jnp.asarray(truth))["convolved_model"]
    )
    obs = conv + rng.randn(32, 32) * noise
    spec = build_model_spec(comps(_config(obs, noise, gaussian_psf)))
    assert spec.param_names[2] == "1_Sersic_rot_ang"
    fns = build_posterior(spec, dtype=jnp.float64)
    nw = 16
    p0 = truth[None, :] + rng.randn(nw, truth.size) * np.array(
        [0.01, 0.05, 2.0, 0.1, 0.1]
    )
    sampler = EnsembleSampler(nw, spec.num_params, fns, seed=0)
    sampler.init_state(p0)
    sampler.run_burn(200)
    sampler.reset()
    sampler.run_sampling(150)
    flat = np.asarray(sampler.chain).reshape(-1, spec.num_params)
    mean, std = flat.mean(axis=0), flat.std(axis=0)
    assert abs(mean[2] - ang_t) < 5 * std[2] + 1.0
    assert std[2] < 20.0  # the winding is actually constrained
