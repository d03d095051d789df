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
