"""End-to-end driver test: model file -> MCMC fit -> DB + image products."""
import os

import numpy as np
import pytest

from psfmc_tpu import load_database, model_galaxy_mcmc
from psfmc_tpu.io import fits

MODEL_TEMPLATE = """
from numpy import array
from psfMC.ModelComponents import Configuration, Sky, PointSource
from psfMC.distributions import Normal, Uniform

Configuration(obs_file='sci.fits', obsivm_file='ivm.fits',
              psf_files='psf.fits', psfivm_files='psf_ivm.fits',
              mag_zeropoint=25.0)
Sky(adu=Normal(loc=0.02, scale=0.01))
PointSource(xy=Uniform(loc=array((12., 12.)), scale=array((8., 8.))),
            mag=Uniform(loc=19.0, scale=1.5))
"""


@pytest.fixture()
def workdir(tmp_path, rng):
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 16) ** 2 + (yy - 16) ** 2) / (2 * 1.5**2))
    psf /= psf.sum()

    truth = np.full((h, w), 0.02)
    truth[15, 17] += 10 ** (-0.4 * (19.8 - 25.0))
    conv = np.fft.irfft2(
        np.fft.rfft2(truth) * np.fft.rfft2(np.fft.ifftshift(psf)),
        s=truth.shape,
    )
    sig = 0.004
    obs = conv + rng.randn(h, w) * sig

    d = str(tmp_path)
    fits.writeto(os.path.join(d, "sci.fits"), obs.astype(np.float32))
    fits.writeto(
        os.path.join(d, "ivm.fits"),
        (np.ones_like(obs) / sig**2).astype(np.float32),
    )
    fits.writeto(os.path.join(d, "psf.fits"), psf.astype(np.float32))
    fits.writeto(
        os.path.join(d, "psf_ivm.fits"),
        (np.ones_like(psf) * 1e8).astype(np.float32),
    )
    with open(os.path.join(d, "model.py"), "w") as f:
        f.write(MODEL_TEMPLATE)
    prev = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(prev)


def test_full_fit_and_outputs(workdir):
    db = model_galaxy_mcmc(
        "model.py",
        output_name="out_e2e",
        iterations=80,
        burn=80,
        chains=32,
        seed=5,
    )
    assert len(db) == 32 * 80
    assert db.meta["MCCHAINS"] == 32
    assert 0.1 < db.meta["MCACCEPT"] < 0.9

    # posterior close to the injected source
    mag = np.asarray(db["1_PointSource_mag"], dtype=np.float64)
    xy = np.asarray(db["1_PointSource_xy"], dtype=np.float64)
    assert np.mean(mag) == pytest.approx(19.8, abs=0.1)
    assert np.mean(xy[:, 0]) == pytest.approx(17.0, abs=0.3)
    assert np.mean(xy[:, 1]) == pytest.approx(15.0, abs=0.3)

    # all five posterior image products written with stats headers
    for ftype in (
        "raw_model",
        "convolved_model",
        "composite_ivm",
        "residual",
        "point_source_subtracted",
    ):
        path = f"out_e2e_{ftype}.fits"
        assert os.path.exists(path)
        data = fits.getdata(path)
        assert data.shape == (32, 32)
        assert np.all(np.isfinite(data))
    hdr = fits.getheader("out_e2e_residual.fits")
    assert hdr["OBJECT"] == "residual"
    assert "1PS_mag" in hdr
    assert hdr["MCITER"] == 80

    # residual is noise-like
    resid = fits.getdata("out_e2e_residual.fits")
    assert np.sqrt(np.mean(resid**2)) < 0.01

    # rerunning with an existing complete DB skips sampling
    db2 = model_galaxy_mcmc(
        "model.py",
        output_name="out_e2e",
        iterations=80,
        burn=80,
        chains=32,
        seed=5,
    )
    assert len(db2) == len(db)


def test_resume_from_checkpoint(workdir):
    model_galaxy_mcmc(
        "model.py", output_name="out_res", iterations=30, burn=30,
        chains=16, seed=2,
    )
    db1 = load_database("out_res_db.fits")
    assert len(db1) == 16 * 30
    # Ask for more iterations: must resume from checkpoint, not restart
    db2 = model_galaxy_mcmc(
        "model.py", output_name="out_res", iterations=50, burn=30,
        chains=16, seed=2,
    )
    assert len(db2) == 16 * 50
    assert db2.meta["MCITER"] == 50
    # first 30 iterations preserved from the original run
    w0_old = np.asarray(db1["1_PointSource_mag"][:30])
    w0_new = np.asarray(db2["1_PointSource_mag"][:50])
    assert np.allclose(w0_old, w0_new[:30])


def _crash_after_n_checkpoints(monkeypatch, n):
    """Make the driver die on its (n+1)-th mid-phase checkpoint write —
    simulates a kill mid-run with n checkpoints already on disk."""
    import psfmc_tpu.fitting as fitting_mod

    real = fitting_mod.save_database
    calls = {"n": 0}

    def dying(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] > n:
            raise RuntimeError("simulated kill")
        return real(*args, **kwargs)

    monkeypatch.setattr(fitting_mod, "save_database", dying)
    return calls


def test_killed_mid_burn_resumes_from_segment(workdir, monkeypatch):
    """A run killed during burn-in restarts from the last burn segment,
    not from scratch (VERDICT round-1 item 4)."""
    calls = _crash_after_n_checkpoints(monkeypatch, 1)
    with pytest.raises(RuntimeError, match="simulated kill"):
        model_galaxy_mcmc(
            "model.py", output_name="out_kb", iterations=20, burn=40,
            chains=16, seed=3, checkpoint_interval=10,
        )
    monkeypatch.undo()
    db = load_database("out_kb_db.fits")
    assert db.meta["MCITER"] == 0
    assert db.meta["MCBURNDN"] == 10  # one completed segment on disk
    assert len(db) == 0

    db2 = model_galaxy_mcmc(
        "model.py", output_name="out_kb", iterations=20, burn=40,
        chains=16, seed=3, checkpoint_interval=10,
    )
    assert len(db2) == 16 * 20
    assert db2.meta["MCBURNDN"] == 40
    assert db2.meta["MCITER"] == 20


def test_killed_mid_sampling_resumes_from_segment(workdir, monkeypatch):
    """A run killed during retained sampling keeps the completed
    segments' chain and continues from them."""
    # saves: burn@10 (#1), sampling@10 (#2), crash attempting sampling@20
    calls = _crash_after_n_checkpoints(monkeypatch, 2)
    with pytest.raises(RuntimeError, match="simulated kill"):
        model_galaxy_mcmc(
            "model.py", output_name="out_ks", iterations=40, burn=20,
            chains=16, seed=4, checkpoint_interval=10,
        )
    monkeypatch.undo()
    db = load_database("out_ks_db.fits")
    assert db.meta["MCITER"] == 10
    assert db.meta["MCBURNDN"] == 20  # burn completed before the kill
    assert len(db) == 16 * 10
    partial = np.asarray(db["1_PointSource_mag"], np.float64)

    db2 = model_galaxy_mcmc(
        "model.py", output_name="out_ks", iterations=40, burn=20,
        chains=16, seed=4, checkpoint_interval=10,
    )
    assert db2.meta["MCITER"] == 40
    assert len(db2) == 16 * 40
    # completed segments preserved verbatim
    full = np.asarray(db2["1_PointSource_mag"], np.float64).reshape(16, 40)
    assert np.allclose(full[:, :10], partial.reshape(16, 10))


def test_resumed_run_keeps_accumulators(workdir, monkeypatch):
    """After a mid-sampling resume the model reuses streaming image
    means instead of replaying the whole chain (checkpoint v2)."""
    import psfmc_tpu.analysis.images as images_mod
    from psfmc_tpu.models.multicomponent import MultiComponentModel

    calls = _crash_after_n_checkpoints(monkeypatch, 2)
    with pytest.raises(RuntimeError):
        model_galaxy_mcmc(
            "model.py", output_name="out_ac", iterations=40, burn=20,
            chains=16, seed=6, checkpoint_interval=10,
        )
    monkeypatch.undo()

    replayed = {"n": 0}
    real_replay = MultiComponentModel.replay_posterior_means

    def counting(self, *a, **k):
        replayed["n"] += 1
        return real_replay(self, *a, **k)

    monkeypatch.setattr(
        MultiComponentModel, "replay_posterior_means", counting
    )
    db2 = model_galaxy_mcmc(
        "model.py", output_name="out_ac", iterations=40, burn=20,
        chains=16, seed=6, checkpoint_interval=10,
    )
    assert db2.meta["MCITER"] == 40
    # weighted mode's fast path replays nothing: streaming means carried
    # across the resume cover every retained sample (the single MAP
    # render for the MCCHI2NU header stat is not a replay)
    assert replayed["n"] == 0, "image writer fell back to chain replay"


def test_map_mode_images(workdir):
    """MAP ('maximum') posterior images — the mode the reference's
    lnprobablity typo broke (reference images.py:60)."""
    from psfmc_tpu.analysis.images import save_posterior_images
    from psfmc_tpu.models.multicomponent import MultiComponentModel

    model_galaxy_mcmc(
        "model.py", output_name="map", iterations=30, burn=30,
        chains=16, max_iterations=1,
    )
    db = load_database("map_db.fits")
    model = MultiComponentModel("model.py")
    save_posterior_images(
        model, db, output_name="mapimg_{}", mode="maximum"
    )
    hdr, raw = fits.read_hdus("mapimg_raw_model.fits")[0]
    assert np.all(np.isfinite(raw))
    # the MAP raw model contains the point source's flux
    flux = 10 ** (-0.4 * (19.8 - 25.0))
    assert 0.2 * flux < float(raw.max()) < 5 * flux
    hdr2, conv = fits.read_hdus("mapimg_convolved_model.fits")[0]
    assert np.isclose(float(np.sum(conv)), float(np.sum(raw)), rtol=0.05)


def test_replay_matches_on_device_accumulation(workdir):
    """The on-device replay path (used when the stuck-walker filter
    changes the retained set) must reproduce the sampler's streaming
    accumulation when given the same samples — both run the identical
    linearity-shortcut means, so they agree to float summation order."""
    from psfmc_tpu.models.multicomponent import MultiComponentModel
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    mcm = MultiComponentModel("model.py")
    s = EnsembleSampler(16, mcm.num_params, mcm.posterior_fns, seed=5)
    s.init_state(mcm.init_params_from_priors(16,
                 random_state=np.random.RandomState(1)))
    s.run_burn(20)
    s.reset()
    s.run_sampling(30)

    mcm.set_accumulated_from_sampler(s)
    accumulated = {k: v.copy() for k, v in mcm.posterior_images.items()}

    # replay the identical retained samples (DB row order: walker-major)
    chain = np.asarray(s.chain, np.float64)  # (nw, ns, dim)
    flat = chain.reshape(-1, chain.shape[-1])
    mcm.reset_images()
    mcm.replay_posterior_means(flat, chunk=128)

    assert mcm.accumulated_samples == flat.shape[0]
    for k in accumulated:
        a, b = accumulated[k], mcm.posterior_images[k]
        # f32 sum-order differences between the scan accumulation and
        # the chunked replay are O(1e-7) absolute; near-zero-mean
        # residual pixels need the absolute term (pure relative
        # tolerance blows up where the mean crosses zero)
        scale = np.maximum(np.abs(a), 1e-6)
        assert np.all(np.abs(a - b) < 1e-3 * scale + 1e-6), (
            k, float(np.max(np.abs(a - b))),
        )


def test_raw_model_std_product(workdir):
    """The beyond-reference per-pixel posterior-STD image: requested
    via write_fits, consistent with a direct per-sample computation."""
    import jax
    import jax.numpy as jnp

    from psfmc_tpu.analysis.images import default_filetypes
    from psfmc_tpu.database import row_to_param_vector
    from psfmc_tpu.models.multicomponent import MultiComponentModel

    db = model_galaxy_mcmc(
        "model.py",
        output_name="out_std",
        iterations=40,
        burn=40,
        chains=16,
        seed=11,
        write_fits=tuple(default_filetypes) + ("raw_model_std",),
    )
    assert os.path.exists("out_std_raw_model_std.fits")
    std_img = fits.getdata("out_std_raw_model_std.fits")
    assert np.all(std_img >= 0)
    assert std_img.max() > 0  # the source position varies over samples

    # direct check: std over the per-sample raw renders of the SAME
    # retained rows that fed the accumulators (the writer filters
    # stuck walkers only for the header stats, not the accumulation)
    model = MultiComponentModel(components="model.py")
    thetas = np.stack(
        [row_to_param_vector(r) for r in db[list(model.param_names)]]
    )
    raws = np.stack(
        [
            np.asarray(
                jax.vmap(model.posterior_fns.carry_images)(
                    jnp.asarray(chunk, model.posterior_fns.dtype)
                )["raw"]
            )
            for chunk in np.array_split(thetas, 8)
        ]
    ).reshape(len(thetas), *std_img.shape)
    direct = np.std(raws.astype(np.float64), axis=0)
    np.testing.assert_allclose(std_img, direct, rtol=5e-3, atol=2e-6)


def test_map_reduced_chi2_in_headers(workdir):
    """Posterior-image headers carry MCCHI2NU, equal to the reduced
    chi^2 of an independent MAP re-render (goodness-of-fit number the
    reference never wrote).  Note the absolute value sits BELOW 1 here:
    the composite IVM includes PSF-mismatch variance scaling with
    source brightness^2 while this synthetic scene has none — the
    header must report the model's own noise budget, not assume it."""
    from psfmc_tpu.database import row_to_param_vector
    from psfmc_tpu.models.multicomponent import MultiComponentModel

    db = model_galaxy_mcmc(
        "model.py",
        output_name="out_chi2",
        iterations=40,
        burn=60,
        chains=16,
        seed=2,
    )
    hdr = fits.getheader("out_chi2_residual.fits")
    chi2nu = float(hdr["MCCHI2NU"])
    assert 0.0 < chi2nu < 2.0, chi2nu

    model = MultiComponentModel(components="model.py")
    best = int(np.argmax(np.asarray(db["lnprobability"])))
    theta = row_to_param_vector(db[list(model.param_names)][best])
    imgs = model.render_images_batch(theta[None])
    resid = np.asarray(imgs["residual"][0], np.float64)
    ivm = np.asarray(imgs["composite_ivm"][0], np.float64)
    good = ~np.asarray(model.spec.bad_px)
    dof = max(int(good.sum()) - model.num_params, 1)
    expect = float(np.sum((resid * resid * ivm)[good])) / dof
    assert chi2nu == pytest.approx(expect, rel=1e-3)


def test_resume_with_changed_model_restarts_attributably(workdir):
    """Resuming a checkpoint after the model FILE changed (component
    added) must warn naming the mismatch and re-run from scratch —
    round-5 probe found a bare KeyError('2_Sersic_angle') from deep
    inside the restore instead."""
    model_galaxy_mcmc(
        "model.py", output_name="out_chg", iterations=20, burn=20,
        chains=16, seed=3,
    )
    with open("model.py", "a") as f:
        f.write(
            "Sersic(xy=Uniform(loc=array((12., 12.)), "
            "scale=array((8., 8.))),\n"
            "       mag=Uniform(loc=20.0, scale=3.0),\n"
            "       reff=Uniform(loc=1.0, scale=3.0),\n"
            "       reff_b=Uniform(loc=1.0, scale=3.0),\n"
            "       index=Uniform(loc=0.5, scale=2.0),\n"
            "       angle=Uniform(loc=0.0, scale=180.0))\n"
        )
    with pytest.warns(UserWarning, match="model changed"):
        db = model_galaxy_mcmc(
            "model.py", output_name="out_chg", iterations=30, burn=20,
            chains=16, seed=3,
        )
    assert db.meta["MCITER"] == 30
    assert "2_Sersic_angle" in db.colnames


def test_resume_with_different_sampler_restarts_attributably(workdir):
    """An ensemble checkpoint resumed with sampler='nuts' must warn and
    re-run from scratch: the state families are not interchangeable and
    mixing two samplers' chains in one DB corrupts autocorrelation
    diagnostics (round-5 probe: it silently concatenated)."""
    model_galaxy_mcmc(
        "model.py", output_name="out_sw", iterations=20, burn=20,
        chains=16, seed=4,
    )
    with pytest.warns(UserWarning, match="written by the 'ensemble'"):
        db = model_galaxy_mcmc(
            "model.py", output_name="out_sw", iterations=30, burn=20,
            chains=16, seed=4, sampler="nuts", max_depth=4,
        )
    assert db.meta["MCITER"] == 30


def test_resume_with_changed_data_restarts_attributably(workdir):
    """Re-reduced observation data between runs must not silently mix
    two posteriors in one resumed chain: the DB records a data
    fingerprint (MCDATSUM) and a mismatch warns + restarts."""
    model_galaxy_mcmc(
        "model.py", output_name="out_dat", iterations=20, burn=20,
        chains=16, seed=5,
    )
    # "re-reduce" the observation: same shape, different pixels
    obs = fits.getdata("sci.fits")
    fits.writeto("sci.fits", (obs + 0.01).astype(np.float32))
    with pytest.warns(UserWarning, match="different\\s+observation data"):
        db = model_galaxy_mcmc(
            "model.py", output_name="out_dat", iterations=30, burn=20,
            chains=16, seed=5,
        )
    assert db.meta["MCITER"] == 30
