"""Posterior-predictive checks (beyond the reference).

Anchors: a well-specified fit yields a healthy p-value, a misspecified
one (unmodeled source) is flagged near zero, and the replicated mocks
carry the model's own noise budget.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.database import save_database, load_database
from psfmc_tpu.models.components import Configuration, PointSource, Sky
from psfmc_tpu.models.multicomponent import MultiComponentModel
from psfmc_tpu.sampler.ensemble import EnsembleSampler


def _fit(obs, noise, psf, rng):
    comps = [
        Configuration(
            obs_file=obs,
            obsivm_file=np.full(obs.shape, 1.0 / noise**2),
            psf_files=psf,
            psfivm_files=np.full_like(psf, 1e10),
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Uniform(loc=-0.2, scale=0.8)),
        PointSource(
            xy=D.Uniform(loc=(10.0, 10.0), scale=(12.0, 12.0)),
            mag=D.Uniform(loc=19.5, scale=2.0),
        ),
    ]
    model = MultiComponentModel(comps, dtype=jnp.float64)
    nw = 16
    sampler = EnsembleSampler(
        nw, model.num_params, model.posterior_fns, seed=0
    )
    sampler.init_state(model.init_params_from_priors(nw, random_state=rng))
    sampler.run_burn(300)
    sampler.reset()
    sampler.run_sampling(150)
    return model, sampler


def test_ppc_calibrated_vs_misspecified(rng, gaussian_psf):
    noise = 0.01
    h = w = 32
    psf = gaussian_psf
    gen = [
        Configuration(
            obs_file=np.zeros((h, w)),
            obsivm_file=np.full((h, w), 1.0 / noise**2),
            psf_files=psf,
            psfivm_files=np.full_like(psf, 1e10),
            mag_zeropoint=25.0,
        ),
        Sky(adu=0.1),
        PointSource(xy=np.array([16.2, 15.7]), mag=20.3),
    ]
    gen_model = MultiComponentModel(gen, dtype=jnp.float64)
    truth = np.array([])  # all constants
    clean = np.asarray(
        gen_model.render_images_batch(np.zeros((1, 0)))["convolved_model"][0]
    )
    obs_good = clean + rng.randn(h, w) * noise

    model, sampler = _fit(obs_good, noise, psf, rng)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        db_path = os.path.join(d, "db.fits")
        save_database(sampler, model, db_path)
        db = load_database(db_path)

        # replicated mocks: shape + the model's own noise level
        mocks, thetas = model.posterior_predictive(
            db, n=20, random_state=1
        )
        assert mocks.shape == (20, h, w)
        assert thetas.shape == (20, model.num_params)
        resid_std = (mocks - mocks.mean(axis=0)).std()
        assert 0.5 * noise < resid_std < 2.0 * noise

        p_good = model.posterior_predictive_pvalue(
            db, n=300, random_state=2
        )
        assert 0.02 < p_good < 0.98, p_good

    # misspecified: a second bright source the model cannot explain
    obs_bad = obs_good.copy()
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    blob = np.exp(-((xx - 8.0) ** 2 + (yy - 24.0) ** 2) / (2 * 2.0**2))
    obs_bad += 0.3 * blob  # 30x the noise at peak
    model_b, sampler_b = _fit(obs_bad, noise, psf, rng)
    with tempfile.TemporaryDirectory() as d:
        db_path = os.path.join(d, "db.fits")
        save_database(sampler_b, model_b, db_path)
        db_b = load_database(db_path)
        p_bad = model_b.posterior_predictive_pvalue(
            db_b, n=300, random_state=3
        )
    assert p_bad < 0.01, p_bad


def test_ppc_pvalue_written_to_image_headers(rng, gaussian_psf):
    """save_posterior_images records MCPPCP."""
    import os
    import tempfile

    from psfmc_tpu.analysis.images import save_posterior_images
    from psfmc_tpu.io.fits import getheader

    noise = 0.01
    obs = 0.1 + rng.randn(32, 32) * noise
    model, sampler = _fit(obs, noise, gaussian_psf, rng)
    with tempfile.TemporaryDirectory() as d:
        db_path = os.path.join(d, "db.fits")
        save_database(sampler, model, db_path)
        out = os.path.join(d, "out")
        save_posterior_images(
            model, load_database(db_path), out, filetypes=["residual"]
        )
        hdr = getheader(out + "_residual.fits")
        p = float(hdr["MCPPCP"])
        assert 0.0 < p < 1.0
