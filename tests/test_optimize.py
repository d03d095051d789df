"""Gradient MAP fit: parameter recovery on synthetic imaging data.

Beyond-reference capability (the reference relies on hand-run GALFIT
fits for warm starts).  The MAP of a high-S/N synthetic Sersic+Sky
image must land near the generating parameters, and ``init='map'``
must produce in-support walker clouds through the driver.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import Configuration, Sersic, Sky
from psfmc_tpu.models.multicomponent import MultiComponentModel
from psfmc_tpu.optimize import fit_map, scatter_around


TRUE = dict(x=16.3, y=15.7, mag=20.0, reff=3.0, reff_b=2.2, index=1.5,
            angle=40.0, sky=0.05)


def _make_components(rng, noise=0.01, psf_files=None, psfivm_files=None):
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    psf = np.exp(-((xx - w / 2) ** 2 + (yy - h / 2) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()
    if psf_files is None:
        psf_files = psf
        psfivm_files = np.ones_like(psf) * 1e8

    # render the ground truth through the model itself at high S/N
    comps_clean = [
        Configuration(
            obs_file=np.zeros((h, w)),
            obsivm_file=np.full((h, w), 1.0 / noise**2),
            psf_files=psf_files,
            psfivm_files=psfivm_files,
            mag_zeropoint=25.0,
        ),
        Sky(adu=TRUE["sky"]),
        Sersic(
            xy=np.array([TRUE["x"], TRUE["y"]]),
            mag=TRUE["mag"],
            reff=TRUE["reff"],
            reff_b=TRUE["reff_b"],
            index=TRUE["index"],
            angle=TRUE["angle"],
            angle_degrees=True,
        ),
    ]
    mcm_clean = MultiComponentModel(components=comps_clean)
    fns = mcm_clean.posterior_fns
    images = jax.jit(fns._render_images)(
        jnp.zeros(mcm_clean.num_params, fns.dtype)
    )
    clean = np.asarray(images["convolved_model"], np.float64)
    obs = clean + rng.randn(h, w) * noise

    comps = [
        Configuration(
            obs_file=obs,
            obsivm_file=np.full((h, w), 1.0 / noise**2),
            psf_files=psf_files,
            psfivm_files=psfivm_files,
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.0, scale=0.2)),
        Sersic(
            xy=D.Uniform(loc=np.array([10.0, 10.0]),
                         scale=np.array([12.0, 12.0])),
            mag=D.Uniform(loc=18.0, scale=4.0),
            reff=D.Uniform(loc=0.5, scale=7.5),
            reff_b=D.Uniform(loc=0.5, scale=7.5),
            index=D.Uniform(loc=0.6, scale=3.0),
            angle=D.Uniform(loc=0.0, scale=180.0),
            angle_degrees=True,
        ),
    ]
    return comps


def test_fit_map_recovers_truth():
    rng = np.random.RandomState(42)
    comps = _make_components(rng)
    mcm = MultiComponentModel(components=comps)
    fns = mcm.posterior_fns

    pool = mcm.init_params_from_priors(256, random_state=rng)
    res = fit_map(fns, n_starts=24, steps=400, p0=pool, seed=1)

    by_name = dict(zip(mcm.param_names, np.nan * np.ones(len(mcm.param_names))))
    # map flat vector back through the slot layout
    vals = {}
    pos = 0
    for name, ln in zip(mcm.param_names, mcm.param_lens):
        vals[name] = res.theta[pos:pos + ln]
        pos += ln

    sersic_xy = [v for k, v in vals.items() if k.endswith("Sersic_xy")][0]
    sersic_mag = [v for k, v in vals.items() if k.endswith("Sersic_mag")][0]
    sersic_idx = [v for k, v in vals.items() if k.endswith("Sersic_index")][0]
    sky = [v for k, v in vals.items() if k.endswith("Sky_adu")][0]

    assert np.isfinite(res.lnpost)
    assert abs(sersic_xy[0] - TRUE["x"]) < 0.2
    assert abs(sersic_xy[1] - TRUE["y"]) < 0.2
    assert abs(sersic_mag[0] - TRUE["mag"]) < 0.1
    assert abs(sersic_idx[0] - TRUE["index"]) < 0.4
    assert abs(sky[0] - TRUE["sky"]) < 0.02
    # the MAP beats every raw prior draw it started from
    lnp_pool = np.asarray(fns.batched_lnpost(jnp.asarray(pool, fns.dtype)))
    assert res.lnpost > np.nanmax(np.where(np.isfinite(lnp_pool), lnp_pool,
                                           -np.inf))


def test_scatter_around_in_support():
    rng = np.random.RandomState(0)
    comps = _make_components(rng)
    mcm = MultiComponentModel(components=comps)
    fns = mcm.posterior_fns

    center = mcm.init_params_from_priors(1, random_state=rng)[0]
    cloud = scatter_around(fns, center, 64, seed=2)
    assert cloud.shape == (64, mcm.num_params)
    lnp = np.asarray(fns.batched_lnpost(jnp.asarray(cloud, fns.dtype)))
    # every scattered walker is inside the prior support
    assert np.all(np.isfinite(lnp))


def test_laplace_std_matches_mcmc_posterior():
    """Laplace error bars at the MAP agree with the MCMC posterior std
    on a high-S/N (Gaussian-like) posterior."""
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    rng = np.random.RandomState(42)
    comps = _make_components(rng)
    mcm = MultiComponentModel(components=comps)
    fns = mcm.posterior_fns

    pool = mcm.init_params_from_priors(256, random_state=rng)
    res = fit_map(fns, n_starts=16, steps=400, p0=pool, seed=1,
                  laplace=True)
    assert res.theta_std is not None and res.cov is not None
    import os as _os
    if _os.environ.get("PSFMC_KAPPA", "table") == "newton":
        # the Newton kappa is only once-differentiable; Laplace
        # degrades to NaN with a warning (asserted) and the MCMC
        # comparison below is meaningless
        assert np.all(~np.isfinite(res.theta_std))
        return
    assert np.all(np.isfinite(res.theta_std))
    # covariance is symmetric positive on the diagonal
    assert np.allclose(res.cov, res.cov.T, equal_nan=True)

    # MCMC posterior around the same mode
    from psfmc_tpu.optimize import scatter_around

    p0 = scatter_around(fns, res.theta, 64, scale=0.1, seed=3)
    s = EnsembleSampler(64, mcm.num_params, fns, seed=4)
    s.init_state(p0)
    s.run_burn(300)
    s.reset()
    s.run_sampling(400)
    mcmc_std = np.std(
        np.asarray(s.flatchain, np.float64), axis=0
    )
    # high-S/N posterior is near-Gaussian: agree within a factor ~2
    ratio = res.theta_std / np.maximum(mcmc_std, 1e-12)
    assert np.all(ratio > 0.4), (res.theta_std, mcmc_std)
    assert np.all(ratio < 2.5), (res.theta_std, mcmc_std)


def test_laplace_theta_is_runtime_argument():
    """Two laplace_covariance calls on the SAME fns at different theta
    must give different curvature — guards against the jitted Hessian
    baking the first call's theta into the compiled closure."""
    from psfmc_tpu.optimize import laplace_covariance

    rng = np.random.RandomState(1)
    comps = _make_components(rng)
    mcm = MultiComponentModel(components=comps)
    fns = mcm.posterior_fns

    t1 = mcm.init_params_from_priors(1, random_state=rng)[0]
    t2 = mcm.init_params_from_priors(1, random_state=rng)[0]
    _, s1 = laplace_covariance(fns, t1)
    _, s2 = laplace_covariance(fns, t2)
    finite = np.isfinite(s1) & np.isfinite(s2)
    if np.any(finite):
        assert not np.allclose(s1[finite], s2[finite])
    else:
        # both random points may be saddles; re-evaluating t1 must at
        # least reproduce itself (cache keyed correctly)
        _, s1b = laplace_covariance(fns, t1)
        assert np.array_equal(np.isnan(s1), np.isnan(s1b))


def test_model_galaxy_map_quicklook(tmp_path):
    """model_galaxy_map writes the five MAP image products with
    parameter values +/- Laplace errors in the headers."""
    import os

    from psfmc_tpu import model_galaxy_map
    from psfmc_tpu.io import fits

    rng = np.random.RandomState(9)
    comps = _make_components(rng)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        res = model_galaxy_map(
            comps, output_name="quick", n_starts=16, steps=300, seed=0
        )
        for ftype in (
            "raw_model",
            "convolved_model",
            "composite_ivm",
            "residual",
            "point_source_subtracted",
        ):
            assert os.path.exists(f"quick_{ftype}.fits"), ftype
        hdr = fits.getheader("quick_residual.fits")
        assert np.isclose(hdr["MAPLNP"], res.lnpost, rtol=1e-5)
        # per-parameter cards present under the FITS abbreviations,
        # with the +/- Laplace error rendered (bare values under the
        # once-differentiable newton kappa)
        import os as _os
        if _os.environ.get("PSFMC_KAPPA", "table") != "newton":
            assert any("+/-" in str(card[1]) for card in hdr._cards)
        # residual of a converged MAP fit is noise-like
        resid = fits.getdata("quick_residual.fits")
        assert np.sqrt(np.mean(resid**2)) < 0.02
    finally:
        os.chdir(cwd)


def test_quick_fit_cli(tmp_path):
    """The quick_fit console entry point: model file -> MAP images."""
    import os

    from psfmc_tpu.cli import quick_fit_main

    rng = np.random.RandomState(2)
    h = w = 24
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 12) ** 2 + (yy - 12) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()
    obs = 0.05 + 1.0 * np.exp(
        -(((xx - 12.0) ** 2 + (yy - 12.0) ** 2)) / (2 * 2.0**2)
    ) + rng.randn(h, w) * 0.03

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        np.save("obs.npy", obs)
        np.save("psf.npy", psf)
        open("m.py", "w").write(
            "import numpy as np\n"
            "Configuration(obs_file=np.load('obs.npy'),\n"
            "    obsivm_file=np.full((24,24), 1111.0),\n"
            "    psf_files=np.load('psf.npy'),\n"
            "    psfivm_files=np.full((24,24), 1e8), mag_zeropoint=25.0)\n"
            "Sky(adu=Normal(loc=0.05, scale=0.1))\n"
            "Sersic(xy=Uniform(loc=np.array([8.,8.]),"
            " scale=np.array([8.,8.])),\n"
            "    mag=Uniform(loc=19., scale=4.),"
            " reff=Uniform(loc=0.5, scale=4.5),\n"
            "    reff_b=Uniform(loc=0.5, scale=4.5), index=1.0, angle=0.0)\n"
        )
        assert quick_fit_main(["quick_fit"]) == 0  # doc text
        assert quick_fit_main(["quick_fit", "m.py", "bogus=1"]) == 2
        assert quick_fit_main(["quick_fit", "n_starts=8"]) == 2  # no model
        assert quick_fit_main(["quick_fit", "m.py", "steps=abc"]) == 2
        rc = quick_fit_main(
            ["quick_fit", "m.py", "n_starts=8", "steps=150"]
        )
        assert rc == 0
        assert os.path.exists("out_m_residual.fits")
    finally:
        os.chdir(cwd)


def test_driver_init_map(tmp_path):
    rng = np.random.RandomState(7)
    comps = _make_components(rng, noise=0.02)
    import os

    from psfmc_tpu import model_galaxy_mcmc, load_database

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model_galaxy_mcmc(
            comps,
            output_name="mapinit",
            iterations=30,
            burn=30,
            chains=16,
            max_iterations=1,
            init="map",
            convergence_check=lambda s, verbose=0: True,
        )
        db = load_database("mapinit_db.fits")
        assert len(db) == 30 * 16
        with pytest.raises(ValueError):
            model_galaxy_mcmc(
                comps,
                output_name="badinit",
                iterations=2,
                burn=2,
                chains=8,
                init="bogus",
                convergence_check=lambda s, verbose=0: True,
            )
    finally:
        os.chdir(cwd)
