"""Radial truncation (GALFIT truncation functions — beyond the
reference).

Anchors: the device tanh-sinh flux ratio against scipy adaptive
quadrature, exact total flux of truncated renders (truncated profiles
are compactly supported, so the image sum must hit ``mag`` to
point-sampling accuracy), the untruncated limit, envelope geometry
(outer kill / inner ring), layout + validation, device prior support,
differentiability, and e2e recovery of an injected break radius.
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
from psfmc_tpu.ops.coords import mag_to_flux
from psfmc_tpu.ops.gammainc import sersic_kappa
from psfmc_tpu.ops.sersic import render_sersic, render_sersic_gen
from psfmc_tpu.ops.truncation import (
    moffat_trunc_ratio, sersic_trunc_ratio,
)


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


def _scipy_ratio(f, r_closed, scale, outer, inner):
    from scipy.integrate import quad

    def env(r):
        e = 1.0
        if outer is not None:
            ro, so = outer
            e = e / (1.0 + np.exp(np.clip((r - ro) / so, -500, 500)))
        if inner is not None:
            ri, si = inner
            e = e / (1.0 + np.exp(np.clip((ri - r) / si, -500, 500)))
        return e

    r_t, _ = quad(lambda t: f(t) * env(t * scale), 0, np.inf,
                  limit=500)
    return r_closed / r_t


@pytest.mark.parametrize("n", [0.7, 1.0, 2.5, 4.0])
@pytest.mark.parametrize(
    "outer,inner",
    [((12.0, 1.5), None), ((20.0, 4.0), (3.0, 0.8)),
     (None, (5.0, 1.0))],
)
def test_sersic_ratio_matches_scipy(n, outer, inner):
    from scipy.special import gamma

    kappa = float(sersic_kappa(jnp.asarray(n, jnp.float64)))
    reff = 4.0
    got = float(
        sersic_trunc_ratio(
            jnp.asarray(kappa, jnp.float64), jnp.asarray(n, jnp.float64),
            jnp.asarray(reff, jnp.float64), outer, inner,
        )
    )
    want = _scipy_ratio(
        lambda t: np.exp(-kappa * (t ** (1.0 / n) - 1.0)) * 2 * t,
        2 * n * np.exp(kappa) * kappa ** (-2 * n) * gamma(2 * n),
        reff, outer, inner,
    )
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("beta", [1.5, 3.0, 6.0])
@pytest.mark.parametrize(
    "outer,inner",
    [((10.0, 1.0), None), ((15.0, 3.0), (2.0, 0.5)),
     (None, (4.0, 1.2))],
)
def test_moffat_ratio_matches_scipy(beta, outer, inner):
    aa = 2.5
    got = float(
        moffat_trunc_ratio(
            jnp.asarray(beta, jnp.float64),
            jnp.asarray(aa, jnp.float64), outer, inner,
        )
    )
    from scipy.integrate import quad

    def env(r):
        e = 1.0
        if outer is not None:
            ro, so = outer
            e = e / (1.0 + np.exp(np.clip((r - ro) / so, -500, 500)))
        if inner is not None:
            ri, si = inner
            e = e / (1.0 + np.exp(np.clip((ri - r) / si, -500, 500)))
        return e

    r_t, _ = quad(lambda u: (1 + u) ** (-beta) * env(np.sqrt(u) * aa),
                  0, np.inf, limit=500)
    assert got == pytest.approx((1.0 / (beta - 1.0)) / r_t, rel=1e-5)


ARGS = (
    jnp.asarray([63.5, 63.5], jnp.float64),
    20.5, 4.0, 3.0, 1.5, 30.0, 25.0,
)


def _fine_grids(n, s):
    f = (np.arange(n * s) + 0.5) / s - 0.5
    yy, xx = np.meshgrid(f, f, indexing="ij")
    return jnp.asarray(xx), jnp.asarray(yy)


def test_truncated_flux_is_exactly_mag():
    """A truncated profile is compactly supported, so the fine-binned
    image sum must recover the total flux — no off-frame caveat
    (unlike strong bending).  4x midpoint sampling with the trapezoid
    correction off isolates the normalization from the documented ~2%
    point-sampling bias of compact coarse renders."""
    xg, yg = _fine_grids(128, 4)
    flux = float(mag_to_flux(jnp.asarray(20.5), jnp.asarray(25.0)))
    img = render_sersic_gen(
        xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True,
        trunc=((14.0, 2.0), None), correction=False,
    )
    assert float(jnp.sum(img)) / 16 == pytest.approx(flux, rel=1e-3)
    # ring (inner truncation) too
    ring = render_sersic_gen(
        xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True,
        trunc=((20.0, 2.0), (6.0, 1.5)), correction=False,
    )
    assert float(jnp.sum(ring)) / 16 == pytest.approx(flux, rel=1e-3)


def test_truncated_flux_exact_with_shapes():
    xg, yg = _fine_grids(128, 4)
    flux = float(mag_to_flux(jnp.asarray(20.5), jnp.asarray(25.0)))
    img = render_sersic_gen(
        xg, yg, *ARGS[:6], 0.7, ARGS[6], angle_degrees=True,
        fourier=((1, 0.15, 30.0),), bending=((2, 0.1),),
        trunc=((14.0, 2.0), None), correction=False,
    )
    assert float(jnp.sum(img)) / 16 == pytest.approx(flux, rel=3e-3)


def test_untruncated_limit():
    """A break radius far beyond the frame reproduces the untruncated
    render (envelope -> 1, flux ratio -> 1)."""
    xg, yg = _grids(128)
    base = np.asarray(render_sersic(xg, yg, *ARGS, angle_degrees=True))
    far = np.asarray(
        render_sersic_gen(
            xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True,
            trunc=((4000.0, 10.0), None),
        )
    )
    assert np.allclose(far, base, rtol=1e-5)


def test_envelope_geometry():
    xg, yg = _grids(128)
    img = np.asarray(
        render_sersic_gen(
            xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True,
            trunc=((12.0, 1.0), None),
        )
    )
    base = np.asarray(render_sersic(xg, yg, *ARGS, angle_degrees=True))
    # well beyond the break (+8 softenings) the profile is crushed
    # relative to its untruncated self; well inside it is BRIGHTER
    # (flux renormalization pushes the same mag into less area)
    yy, xx = np.mgrid[0:128, 0:128]
    r = np.hypot(xx - 63.5, yy - 63.5)
    far = (r > 30.0) & (base > 0)
    assert np.all(img[far] < 0.05 * base[far])
    near = r < 3.0
    assert np.all(img[near] > base[near])

    # inner truncation carves a ring: center dimmer than the ring peak
    ring = np.asarray(
        render_sersic_gen(
            xg, yg, *ARGS[:6], 0.0, ARGS[6], angle_degrees=True,
            trunc=(None, (8.0, 1.0)),
        )
    )
    assert ring[63, 63] < 0.1 * ring.max()
    assert ring.max() > 0


def test_moffat_truncation_flux_and_ring():
    from psfmc_tpu.ops.moffat import render_moffat_gen

    xg, yg = _grids(128)
    flux = float(mag_to_flux(jnp.asarray(20.5), jnp.asarray(25.0)))
    m_args = (jnp.asarray([63.5, 63.5]), 20.5, 6.0, 4.5, 3.0, 30.0)
    img = render_moffat_gen(
        xg, yg, *m_args, 0.0, 25.0, True, trunc=((15.0, 2.0), None)
    )
    # the Moffat core is flat (no cusp), so the native-resolution sum
    # is already accurate
    assert float(jnp.sum(img)) == pytest.approx(flux, rel=5e-3)
    ring = np.asarray(
        render_moffat_gen(
            xg, yg, *m_args, 0.0, 25.0, True,
            trunc=((20.0, 2.0), (5.0, 1.0)),
        )
    )
    # nearest pixel center sits 0.7 px from the profile center where
    # the logistic envelope is ~1.3% — suppressed but not zero
    assert ring[63, 63] < 0.25 * ring.max()
    # and the brightest pixel rides the ring, not the center
    iy, ix = np.unravel_index(np.argmax(ring), ring.shape)
    assert np.hypot(ix - 63.5, iy - 63.5) > 2.0


def test_layout_validation_and_fused_gate(gaussian_psf):
    cfg = _config(np.zeros((32, 32)), 0.01, gaussian_psf)
    s = Sersic(
        xy=D.Uniform(loc=(12.0, 12.0), scale=(8.0, 8.0)),
        mag=D.Uniform(loc=20.0, scale=2.0),
        reff=4.0, reff_b=3.0, index=1.5, angle=30.0,
        angle_degrees=True,
        rtrunc=D.Uniform(loc=8.0, scale=8.0),
        rsoft=1.5,
    )
    spec = build_model_spec([cfg, s])
    # alphabetical: mag < rtrunc < xy; constant rsoft reaches params
    assert spec.param_names == [
        "0_Sersic_mag", "0_Sersic_rtrunc", "0_Sersic_xy",
    ]
    assert spec.comp_specs[0].params["rsoft"] == ("const", 1.5)
    from psfmc_tpu.ops.pallas.lnpost_pallas import fused_lnl_supported

    assert not fused_lnl_supported(spec, "dft")
    # a break radius without a softening length is rejected, and
    # truncation attrs on families without renderer support are too
    with pytest.raises(ValueError):
        Sersic(xy=(1.0, 1.0), mag=20.0, reff=3.0, reff_b=2.0,
               index=1.0, angle=0.0, rtrunc=8.0)
    with pytest.raises(TypeError):
        King(xy=(1.0, 1.0), mag=20.0, rc=3.0, rc_b=2.0, rt=10.0,
             alpha=2.0, angle=0.0, rtrunc=8.0, rsoft=1.0)


def test_device_prior_rejects_nonpositive_trunc(gaussian_psf):
    cfg = _config(np.zeros((32, 32)), 0.01, gaussian_psf)
    comps = [
        cfg,
        Sersic(
            xy=(16.0, 16.0), mag=20.5, reff=4.0, reff_b=3.0,
            index=1.5, angle=30.0, angle_degrees=True,
            rtrunc=D.Uniform(loc=-5.0, scale=20.0),
            rsoft=D.Uniform(loc=-2.0, scale=5.0),
        ),
    ]
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float64)
    assert spec.param_names == ["0_Sersic_rsoft", "0_Sersic_rtrunc"]
    ok = float(fns.log_posterior(jnp.asarray([1.5, 10.0])))
    assert np.isfinite(ok)
    assert float(fns.log_posterior(jnp.asarray([-0.5, 10.0]))) == -np.inf
    assert float(fns.log_posterior(jnp.asarray([1.5, -1.0]))) == -np.inf


def test_truncated_posterior_is_differentiable(rng, gaussian_psf):
    noise = 0.01
    obs = rng.randn(32, 32) * noise
    cfg = _config(obs, noise, gaussian_psf)
    comps = [
        cfg,
        Sersic(
            xy=D.Uniform(loc=(13.0, 13.0), scale=(6.0, 6.0)),
            mag=D.Uniform(loc=20.0, scale=2.0),
            reff=4.0, reff_b=3.0, index=1.5, angle=30.0,
            angle_degrees=True,
            rtrunc=D.Uniform(loc=6.0, scale=10.0),
            rsoft=D.Uniform(loc=0.5, scale=3.0),
            rtrunc_in=D.Uniform(loc=1.0, scale=4.0),
            rsoft_in=D.Uniform(loc=0.3, scale=2.0),
        ),
    ]
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float64)
    # layout: mag, rsoft, rsoft_in, rtrunc, rtrunc_in, xy
    theta = jnp.asarray([20.8, 1.5, 0.8, 10.0, 2.0, 16.2, 15.7])
    g = jax.grad(fns.log_posterior)(theta)
    assert np.isfinite(np.asarray(g)).all()


def test_rtrunc_recovery(rng, gaussian_psf):
    """Short ensemble fit recovers an injected outer break radius."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    noise = 0.002
    rt_t = 9.0

    def comps(cfg):
        return [
            cfg,
            Sky(adu=D.Normal(loc=0.05, scale=0.05)),
            Sersic(
                xy=D.Uniform(loc=(13.0, 13.0), scale=(6.0, 6.0)),
                mag=D.Uniform(loc=20.0, scale=2.0),
                reff=5.0, reff_b=4.0, index=1.5, angle=30.0,
                angle_degrees=True,
                rtrunc=D.Uniform(loc=4.0, scale=12.0),
                rsoft=1.2,
            ),
        ]

    # layout: [0_Sky_adu, 1_Sersic_mag, 1_Sersic_rtrunc, xy]
    truth = np.array([0.05, 20.8, rt_t, 16.2, 15.7])
    spec_g = build_model_spec(
        comps(_config(np.zeros((32, 32)), noise, gaussian_psf))
    )
    fns_g = build_posterior(spec_g, dtype=jnp.float64)
    conv = np.asarray(
        fns_g.render_images(jnp.asarray(truth))["convolved_model"]
    )
    obs = conv + rng.randn(32, 32) * noise
    spec = build_model_spec(comps(_config(obs, noise, gaussian_psf)))
    assert spec.param_names[2] == "1_Sersic_rtrunc"
    fns = build_posterior(spec, dtype=jnp.float64)
    nw = 16
    p0 = truth[None, :] + rng.randn(nw, truth.size) * np.array(
        [0.01, 0.05, 0.3, 0.1, 0.1]
    )
    sampler = EnsembleSampler(nw, spec.num_params, fns, seed=0)
    sampler.init_state(p0)
    sampler.run_burn(200)
    sampler.reset()
    sampler.run_sampling(150)
    flat = np.asarray(sampler.chain).reshape(-1, spec.num_params)
    mean, std = flat.mean(axis=0), flat.std(axis=0)
    assert abs(mean[2] - rt_t) < 5 * std[2] + 0.1
    assert std[2] < 1.0  # the break is actually constrained
