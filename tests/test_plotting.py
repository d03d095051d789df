"""Plotting + CLI smoke tests (Agg backend, pdf outputs)."""
import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from psfmc_tpu.analysis.plotting import _axis_label, _get_trace
from psfmc_tpu.database import save_database
from psfmc_tpu.io.table import Table


class FakeModel:
    param_names = [
        "0_Sky_adu",
        "1_PointSource_mag",
        "1_PointSource_xy",
        "2_Sersic_index",
        "2_Sersic_mag",
        "2_Sersic_reff",
        "2_Sersic_reff_b",
    ]
    param_lens = [1, 1, 2, 1, 1, 1, 1]


class FakeSampler:
    state = None

    def __init__(self, nwalkers=8, niter=40, seed=0):
        rng = np.random.RandomState(seed)
        dim = sum(FakeModel.param_lens)
        base = np.array([0.02, 19.5, 16.0, 15.0, 2.0, 20.5, 4.0, 3.0])
        self.chain = base + rng.randn(nwalkers, niter, dim) * 0.1
        self.lnprobability = rng.randn(nwalkers, niter)


@pytest.fixture()
def db_file(tmp_path):
    path = str(tmp_path / "testdb.fits")
    save_database(FakeSampler(), FakeModel(), path, meta_dict={"MCITER": 40})
    return path


def test_axis_labels():
    assert _axis_label("lnprobability").startswith("Model posterior")
    assert _axis_label("1_PointSource_mag") == "(1) PointSource mag"
    assert (
        _axis_label("1_PointSource_2_Sersic_magdiff")
        == "$m_{(1) PointSource} - m_{(2) Sersic}$"
    )


def test_derived_traces(db_file):
    from psfmc_tpu.database import load_database

    db = load_database(db_file)
    magdiff = _get_trace("1_PointSource_2_Sersic_magdiff", db)
    want = np.asarray(db["1_PointSource_mag"]) - np.asarray(db["2_Sersic_mag"])
    assert np.allclose(magdiff[:, 0], want)

    ar = _get_trace("2_Sersic_axisratio", db)
    want = np.asarray(db["2_Sersic_reff_b"]) / np.asarray(db["2_Sersic_reff"])
    assert np.allclose(ar[:, 0], want)

    sbeff = _get_trace("2_Sersic_sbeff", db)
    assert np.all(np.isfinite(sbeff))

    with pytest.raises(KeyError):
        _get_trace("nonexistent_trace", db)


def test_plot_hist_trace_autocorr_corner(db_file, tmp_path):
    os.chdir(tmp_path)
    from psfmc_tpu.analysis import (
        corner_plot,
        plot_autocorr,
        plot_hist,
        plot_trace,
    )

    plot_hist("1_PointSource_mag", db_file, save=True)
    assert os.path.exists("testdb_1_PointSource_mag_hist.pdf")
    plot_trace("1_PointSource_xy", db_file, save=True)
    assert os.path.exists("testdb_1_PointSource_xy_trace.pdf")
    plot_autocorr("0_Sky_adu", db_file, save=True)
    assert os.path.exists("testdb_0_Sky_adu_acorr.pdf")
    corner_plot(db_file, save=True)
    assert os.path.exists("testdb_corner.pdf")
    corner_plot(
        db_file,
        disp_parameters=["1_PointSource_mag", "2_Sersic_mag"],
        save=True,
    )


def test_cli_entrypoints(db_file, tmp_path):
    os.chdir(tmp_path)
    from psfmc_tpu.cli import corner_plot_main, plot_chain_main

    assert plot_chain_main(["plot_chain"]) == 0  # usage text
    assert (
        plot_chain_main(["plot_chain", "0_Sky_adu", "save", db_file]) == 0
    )
    assert corner_plot_main(["corner_plot", "save", db_file]) == 0
    assert (
        corner_plot_main(
            ["corner_plot", "1_PointSource_mag,2_Sersic_mag", "save", db_file]
        )
        == 0
    )


def test_radial_profile_numerics():
    from psfmc_tpu.analysis.plotting import radial_profile

    h = w = 33
    yy, xx = np.mgrid[0:h, 0:w]
    center = (16.0, 16.0)
    r = np.hypot(xx - center[0], yy - center[1])
    img = 2.0 + r  # linear ramp: annulus mean ~ mid-radius + 2
    var = np.full((h, w), 0.25)
    good = np.ones((h, w), bool)
    good[0:2, :] = False  # a masked stripe

    r_mid, mean, err, npx = radial_profile(
        img, center, variance=var, good=good, bin_px=1.0
    )
    assert np.all(np.isfinite(mean[npx > 0]))
    # the annulus mean of (2 + r) tracks 2 + r_mid to half a bin
    ok = npx > 3
    assert np.all(np.abs(mean[ok] - (2.0 + r_mid[ok])) < 0.5)
    # error of the mean: sqrt(sum var)/N = 0.5/sqrt(N)
    assert np.allclose(err[ok], 0.5 / np.sqrt(npx[ok]), rtol=1e-12)
    # masked pixels excluded: counts are below the full annulus area
    full = radial_profile(img, center, bin_px=1.0)[3]
    assert np.all(npx <= full) and np.any(npx < full)
    # constant image: every annulus mean is the constant
    cmean = radial_profile(np.full((h, w), 7.0), center, bin_px=2.0)[1]
    assert np.allclose(cmean[~np.isnan(cmean)], 7.0)


def test_plot_profile_end_to_end(tmp_path):
    """Tiny real fit -> db -> radial profile pdf; model curve must track
    the data profile of the injected source within the noise."""
    import jax.numpy as jnp

    from psfmc_tpu import distributions as D
    from psfmc_tpu.analysis.plotting import plot_profile
    from psfmc_tpu.models.components import (
        Configuration,
        PointSource,
        Sky,
    )
    from psfmc_tpu.models.multicomponent import MultiComponentModel
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    rng = np.random.RandomState(11)
    h = w = 24
    noise = 0.01
    psf = np.zeros((8, 8))
    psf[3:5, 3:5] = 0.25

    def build(obs):
        return MultiComponentModel([
            Configuration(
                obs_file=obs,
                obsivm_file=np.full((h, w), 1.0 / noise**2),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.05, scale=0.05)),
            PointSource(
                xy=D.Uniform(loc=(10.0, 10.0), scale=(4.0, 4.0)),
                mag=D.Uniform(loc=20.5, scale=1.5),
            ),
        ])

    truth = np.array([0.05, 21.3, 12.0, 12.0])
    mock, _ = build(np.zeros((h, w))).simulate(theta=truth, random_state=3)
    model = build(mock)
    s = EnsembleSampler(16, 4, model.posterior_fns, seed=5)
    s.init_state(model.init_params_from_priors(16, random_state=rng))
    s.run_burn(150)
    s.reset()
    s.run_sampling(100)

    dbp = str(tmp_path / "prof_db.fits")
    save_database(s, model, dbp, meta_dict={"MCITER": 100})

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        r, d_mean, m_mean, d_err = plot_profile(dbp, model=model, save=True)
    finally:
        os.chdir(cwd)
    assert os.path.exists(tmp_path / "prof_db_profile.pdf")
    # model profile tracks the data within a few annulus sigma
    ok = np.isfinite(d_mean) & np.isfinite(m_mean) & (d_err > 0)
    assert ok.sum() >= 5
    z = (d_mean[ok] - m_mean[ok]) / d_err[ok]
    assert np.all(np.abs(z) < 6.0), z


def test_radial_profile_elliptical_annuli():
    """Elliptical annuli: on an image that is a pure function of the
    elliptical radius, shape-matched annuli reproduce the 1-D profile
    almost exactly while circular annuli smear it."""
    from psfmc_tpu.analysis.plotting import radial_profile

    h = w = 49
    cx = cy = 24.0
    q, ang = 0.5, 0.6  # radians, component convention
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    a = ang + 0.5 * np.pi  # renderer's +90 PA rotation
    u = np.cos(a) * (xx - cx) + np.sin(a) * (yy - cy)
    v = -np.sin(a) * (xx - cx) + np.cos(a) * (yy - cy)
    r_ell = np.hypot(u, v / q)
    img = np.exp(-r_ell / 6.0)

    r, mean, _, npx = radial_profile(
        img, (cx, cy), bin_px=2.0, rmax=20.0, axis_ratio=q, angle=ang
    )
    ok = npx > 8
    resid_ell = np.abs(mean[ok] - np.exp(-r[ok] / 6.0))
    rc, mc, _, npc = radial_profile(
        img, (cx, cy), bin_px=2.0, rmax=20.0
    )
    okc = npc > 8
    resid_circ = np.abs(mc[okc] - np.exp(-rc[okc] / 6.0))
    # matched ellipses: sub-percent; circles: badly mixed radii
    assert resid_ell.max() < 0.02, resid_ell
    assert resid_circ.max() > 5 * resid_ell.max()
