"""Moffat profile component (beyond the reference).

Analytic anchors: exact flux normalization (F = pi a b I0 / (beta-1))
and the FWHM definition (I(fwhm/2) = I0/2 along the major axis).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import Configuration, Moffat, Sky
from psfmc_tpu.models.multicomponent import MultiComponentModel
from psfmc_tpu.ops.moffat import render_moffat


def _grid(n):
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    return jnp.asarray(xx), jnp.asarray(yy)


def test_moffat_flux_normalization():
    n = 256
    xg, yg = _grid(n)
    mag, zp = 20.0, 25.0
    flux = 10 ** (-0.4 * (mag - zp))
    img = np.asarray(
        jax.jit(render_moffat, static_argnames=("angle_degrees",))(
            xg, yg, jnp.asarray([n / 2, n / 2]), mag, 6.0, 4.0, 2.5,
            30.0, zp, angle_degrees=True,
        )
    )
    # beta=2.5 truncation beyond r=128 is ~1e-4 of the total
    assert abs(img.sum() - flux) / flux < 2e-3
    assert np.all(np.isfinite(img)) and img.min() >= 0


def test_moffat_fwhm_definition():
    n = 128
    xg, yg = _grid(n)
    c = n / 2
    fwhm = 10.0
    img = np.asarray(
        render_moffat(xg, yg, jnp.asarray([c, c]), 20.0, fwhm, fwhm,
                      3.0, 0.0, 25.0)
    )
    i0 = img[int(c), int(c)]
    # half maximum at r = fwhm/2 (circular: any direction)
    half = img[int(c), int(c + fwhm / 2)]
    assert abs(half / i0 - 0.5) < 0.02  # pixel-center sampling slop


def _moffat_model(rng, noise=0.01):
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 16) ** 2 + (yy - 16) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()

    truth = dict(x=16.4, y=15.6, mag=20.0, fwhm=6.0, fwhm_b=4.5,
                 index=2.5, angle=30.0, sky=0.02)
    clean_comps = [
        Configuration(
            obs_file=np.zeros((h, w)),
            obsivm_file=np.full((h, w), 1 / noise**2),
            psf_files=psf,
            psfivm_files=np.full((h, w), 1e8),
            mag_zeropoint=25.0,
        ),
        Sky(adu=truth["sky"]),
        Moffat(xy=np.array([truth["x"], truth["y"]]), mag=truth["mag"],
               fwhm=truth["fwhm"], fwhm_b=truth["fwhm_b"],
               index=truth["index"], angle=truth["angle"],
               angle_degrees=True),
    ]
    clean = MultiComponentModel(components=clean_comps)
    obs = clean.render_images_batch(
        np.zeros((1, clean.num_params))
    )["convolved_model"][0] + rng.randn(h, w) * noise

    comps = [
        Configuration(
            obs_file=obs,
            obsivm_file=np.full((h, w), 1 / noise**2),
            psf_files=psf,
            psfivm_files=np.full((h, w), 1e8),
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.0, scale=0.1)),
        Moffat(
            xy=D.Uniform(loc=np.array([12.0, 12.0]),
                         scale=np.array([8.0, 8.0])),
            mag=D.Uniform(loc=18.0, scale=4.0),
            fwhm=D.Uniform(loc=2.0, scale=8.0),
            fwhm_b=D.Uniform(loc=2.0, scale=8.0),
            index=D.Uniform(loc=1.5, scale=3.5),
            angle=D.Uniform(loc=0.0, scale=180.0),
            angle_degrees=True,
        ),
    ]
    return comps, truth


def test_moffat_map_recovers_truth():
    from psfmc_tpu.optimize import fit_map

    rng = np.random.RandomState(8)
    comps, truth = _moffat_model(rng)
    mcm = MultiComponentModel(components=comps)
    pool = mcm.init_params_from_priors(256, random_state=rng)
    res = fit_map(mcm.posterior_fns, n_starts=24, steps=400, p0=pool,
                  seed=1)
    vals = {}
    pos = 0
    for name, ln in zip(mcm.param_names, mcm.param_lens):
        vals[name] = res.theta[pos:pos + ln]
        pos += ln
    assert abs(vals["1_Moffat_mag"][0] - truth["mag"]) < 0.1
    assert abs(vals["1_Moffat_fwhm"][0] - truth["fwhm"]) < 0.5
    assert abs(vals["1_Moffat_xy"][0] - truth["x"]) < 0.2
    assert abs(vals["1_Moffat_xy"][1] - truth["y"]) < 0.2
    # ordering constraint honored at the optimum
    assert vals["1_Moffat_fwhm"][0] >= vals["1_Moffat_fwhm_b"][0]


def test_moffat_constraints_and_fallbacks():
    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.models.spec import build_model_spec
    from psfmc_tpu.models.transforms import build_transform
    from psfmc_tpu.ops.pallas.lnpost_pallas import fused_lnl_supported

    rng = np.random.RandomState(1)
    comps, _ = _moffat_model(rng)
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float64)

    # fwhm_b > fwhm is outside the prior support
    theta = np.asarray(
        MultiComponentModel(components=comps).init_params_from_priors(
            1, random_state=rng
        )[0]
    )
    names = spec.param_names
    i_f = names.index("1_Moffat_fwhm")
    i_b = names.index("1_Moffat_fwhm_b")
    bad = theta.copy()
    bad[i_f], bad[i_b] = 3.0, 7.0
    assert np.isneginf(float(fns.log_prior(jnp.asarray(bad))))

    # beta <= 1 has no finite total flux: hard -inf, never a
    # negative-normalization render
    bad2 = theta.copy()
    bad2[names.index("1_Moffat_index")] = 0.9
    assert np.isneginf(float(fns.log_prior(jnp.asarray(bad2))))

    # the unconstraining transform enforces fwhm >= fwhm_b by
    # construction
    tr = build_transform(spec, dtype=jnp.float64)
    z = rng.randn(64, tr.num_unconstrained) * 2.0
    thetas = np.asarray(
        jax.vmap(lambda zz: tr.to_constrained(zz)[0])(jnp.asarray(z))
    )
    assert np.all(thetas[:, i_f] >= thetas[:, i_b])

    # the fused Pallas likelihood must NOT claim a model it cannot
    # render (it would silently drop the Moffat)
    assert not fused_lnl_supported(spec, "dft")


def test_moffat_model_file_dsl(tmp_path):
    """Moffat is available in model files without imports."""
    import os

    from psfmc_tpu.model_parser import component_list_from_string

    src = (
        "import numpy as np\n"
        "Configuration(obs_file=np.zeros((16,16)),\n"
        "    obsivm_file=np.ones((16,16)),\n"
        "    psf_files=np.eye(16)/16.0,\n"
        "    psfivm_files=np.ones((16,16)), mag_zeropoint=25.0)\n"
        "Moffat(xy=np.array([8.,8.]), mag=20.0, fwhm=4.0, fwhm_b=3.0,\n"
        "       index=Uniform(loc=1.5, scale=3.0), angle=0.0)\n"
    )
    comps = component_list_from_string(src)
    kinds = [type(c).__name__ for c in comps]
    assert "Moffat" in kinds
