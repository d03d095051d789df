"""Convergence statistics + float32-chain moment safety."""
import numpy as np

from psfmc_tpu.analysis.statistics import (
    num_effective_samples,
    potential_scale_reduction,
)


def test_psrf_converged_chains():
    rng = np.random.RandomState(0)
    traces = [10.0 + 0.01 * rng.randn(5000) for _ in range(8)]
    assert abs(potential_scale_reduction(traces) - 1.0) < 0.01
    assert num_effective_samples(traces) > 1000


def test_psrf_diverged_chains():
    rng = np.random.RandomState(0)
    # chains at different levels -> R-hat far above 1
    traces = [i * 1.0 + 0.01 * rng.randn(5000) for i in range(8)]
    assert potential_scale_reduction(traces) > 2.0


def test_float32_chain_moments_not_corrupted():
    """Sequential f32 summation of ~1e5 large-offset samples drifts by
    ~1e-3; the statistics must promote to f64 internally.

    Regression: this artifact once inflated apparent posterior stds by
    2.4x (sqrt(sigma^2 + drift^2)) and was misdiagnosed as a sampler
    numerics bug on TPU.
    """
    rng = np.random.RandomState(1)
    true_mean, true_std = 11.3, 0.0027
    traces32 = [
        (true_mean + true_std * rng.randn(96000)).astype(np.float32)
        for _ in range(4)
    ]
    # raw f32 full-array mean drifts (the hazard being guarded against);
    # if numpy ever makes this accurate the guard is moot but harmless
    psrf = potential_scale_reduction(traces32)
    assert abs(psrf - 1.0) < 0.01
    neff = num_effective_samples(traces32)
    assert neff > 10000
    # the within-chain variance implied by the statistics stays at
    # truth on the promoted stack
    from psfmc_tpu.analysis.statistics import _gelman_w_b

    wv, _b_over_n, _n, _m = _gelman_w_b(traces32)
    assert abs(np.sqrt(wv) - true_std) / true_std < 0.02


def test_summary_table():
    """summary(): f64 stats per scalar trace, vector columns expanded."""
    from collections import OrderedDict

    import numpy as np
    import pytest

    from psfmc_tpu.analysis import summary
    from psfmc_tpu.io.table import Table

    rng = np.random.RandomState(0)
    n = 4000
    tbl = Table(
        OrderedDict(
            [
                ("0_Sky_adu", rng.normal(0.5, 0.1, n)),
                ("1_PointSource_xy", rng.normal([10.0, 20.0], 0.5, (n, 2))),
                ("lnprobability", rng.normal(-100, 3, n)),
                ("walker", np.zeros(n)),
                ("sample", np.arange(n, dtype=float)),
            ]
        )
    )
    s = summary(tbl)
    assert set(s) == {
        "0_Sky_adu", "1_PointSource_xy_0", "1_PointSource_xy_1",
        "lnprobability",
    }
    assert s["0_Sky_adu"]["mean"] == pytest.approx(0.5, abs=0.01)
    assert s["0_Sky_adu"]["std"] == pytest.approx(0.1, abs=0.01)
    assert s["1_PointSource_xy_1"]["p50"] == pytest.approx(20.0, abs=0.05)
    assert s["0_Sky_adu"]["p16"] < s["0_Sky_adu"]["p84"]


# ---- modern rank-normalized diagnostics (Vehtari et al. 2021) --------


def test_rhat_rank_iid_and_shifted():
    from psfmc_tpu.analysis.statistics import rhat_rank

    rs = np.random.RandomState(0)
    good = rs.randn(8, 500)
    assert abs(rhat_rank(good) - 1.0) < 0.01
    # location disagreement
    shifted = good.copy()
    shifted[0] += 3.0
    assert rhat_rank(shifted) > 1.05
    # SCALE disagreement at identical means: classic mean-based R-hat
    # is blind to this; the folded/tail variant catches it
    from psfmc_tpu.analysis.statistics import potential_scale_reduction

    scaled = good.copy()
    scaled[0] *= 4.0
    classic = potential_scale_reduction(
        [scaled[i] for i in range(scaled.shape[0])]
    )
    assert abs(classic - 1.0) < 0.05  # blind
    assert rhat_rank(scaled) > 1.05   # caught


def test_ess_bulk_matches_ar1_theory():
    from psfmc_tpu.analysis.statistics import ess_bulk

    rs = np.random.RandomState(1)
    m, n, phi = 8, 4000, 0.7
    chains = np.empty((m, n))
    for c in range(m):
        x = 0.0
        innov = rs.randn(n) * np.sqrt(1 - phi**2)
        xs = np.empty(n)
        for i in range(n):
            x = phi * x + innov[i]
            xs[i] = x
        chains[c] = xs
    ess = ess_bulk(chains)
    want = m * n * (1 - phi) / (1 + phi)
    assert 0.6 * want < ess < 1.5 * want
    # iid chains: ESS ~ total draws
    iid = rs.randn(m, n)
    assert ess_bulk(iid) > 0.75 * m * n


def test_ess_tail_penalizes_clipped_tails():
    from psfmc_tpu.analysis.statistics import ess_tail

    rs = np.random.RandomState(2)
    good = rs.randn(8, 1000)
    assert ess_tail(good) > 0.5 * good.size
    # clip the tails of half the chains: tail exploration broken while
    # the bulk looks fine
    clipped = good.copy()
    clipped[:4] = np.clip(clipped[:4], -1.0, 1.0)
    assert ess_tail(clipped) < 0.5 * ess_tail(good)


def test_convergence_summary_roundtrip(rng):
    """convergence_summary reconstructs walker chains from a DB."""
    from collections import OrderedDict

    from psfmc_tpu.analysis.statistics import convergence_summary

    nw, ns = 6, 300

    class FakeDB(OrderedDict):
        @property
        def colnames(self):
            return list(self.keys())

    walker = np.repeat(np.arange(nw), ns)
    sample = np.tile(np.arange(ns), nw)
    vals = rng.randn(nw * ns)
    xy = rng.randn(nw * ns, 2)
    db = FakeDB(
        walker=walker, sample=sample, lnprobability=vals,
        a=vals + 1.0, xy=xy,
    )
    out = convergence_summary(db)
    assert set(out) == {"lnprobability", "a", "xy_0", "xy_1"}
    for v in out.values():
        assert abs(v["rhat"] - 1.0) < 0.02
        assert v["ess_bulk"] > 0.5 * nw * ns
        assert v["ess_tail"] > 0.3 * nw * ns


def test_summary_cli(rng, tmp_path, gaussian_psf):
    """psfmc-summary prints the table and flags under-converged fits."""
    import io
    from contextlib import redirect_stdout

    from psfmc_tpu import distributions as D
    from psfmc_tpu.cli import summary_main
    from psfmc_tpu.database import save_database
    from psfmc_tpu.models.components import Configuration, Sky
    from psfmc_tpu.models.multicomponent import MultiComponentModel
    from psfmc_tpu.sampler.ensemble import EnsembleSampler
    import jax.numpy as jnp

    obs = 0.1 + rng.randn(16, 16) * 0.01
    model = MultiComponentModel(
        [
            Configuration(
                obs_file=obs,
                obsivm_file=np.full((16, 16), 1e4),
                psf_files=gaussian_psf[8:24, 8:24],
                psfivm_files=np.ones((16, 16)) * 1e8,
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Uniform(loc=-0.2, scale=0.6)),
        ],
        dtype=jnp.float64,
    )
    s = EnsembleSampler(8, 1, model.posterior_fns, seed=0)
    s.init_state(model.init_params_from_priors(8, random_state=rng))
    s.run_burn(200)
    s.reset()
    s.run_sampling(400)
    db_path = str(tmp_path / "db.fits")
    save_database(s, model, db_path)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = summary_main(["psfmc-summary", db_path])
    out = buf.getvalue()
    assert "0_Sky_adu" in out and "rhat" in out
    assert rc in (0, 1)  # exit 1 only when a parameter is flagged


def test_frozen_chain_is_flagged_not_healthy():
    """A zero-variance (frozen) parameter must read as UNDIAGNOSABLE
    (NaN), never as rhat=1/full ESS — the stretch move freezes
    all-equal coordinates, the diagnostic's worst false negative."""
    from psfmc_tpu.analysis.statistics import ess_bulk, rhat_rank

    frozen = np.full((8, 400), 3.14)
    assert np.isnan(rhat_rank(frozen))
    assert np.isnan(ess_bulk(frozen))


def test_convergence_summary_non_contiguous_walkers(rng):
    """Filtered databases keep original (non-contiguous) walker IDs."""
    from collections import OrderedDict

    from psfmc_tpu.analysis.statistics import convergence_summary

    class FakeDB(OrderedDict):
        @property
        def colnames(self):
            return list(self.keys())

    ns = 200
    ids = [0, 2, 5, 9]  # walkers 1,3,4,... filtered out
    walker = np.repeat(ids, ns)
    sample = np.tile(np.arange(ns), len(ids))
    vals = rng.randn(len(ids) * ns)
    db = FakeDB(walker=walker, sample=sample, a=vals)
    out = convergence_summary(db)
    assert abs(out["a"]["rhat"] - 1.0) < 0.03
    assert out["a"]["ess_bulk"] > 0.4 * len(ids) * ns


def test_to_inference_dict_roundtrip():
    """ArviZ-dict export: (chain, draw) reshape must invert the DB's
    walker/sample row layout exactly (incl. non-contiguous walker IDs
    after filter_lowp_walkers and vector xy columns)."""
    from psfmc_tpu.analysis.statistics import to_inference_dict
    from psfmc_tpu.io.table import Table

    nw, ns = 4, 6
    rng = np.random.RandomState(0)
    walker = np.repeat([0, 2, 5, 7], ns)  # non-contiguous IDs
    sample = np.tile(np.arange(ns), nw)
    a = rng.randn(nw * ns)
    xy = rng.randn(nw * ns, 2)
    lnp = rng.randn(nw * ns)
    # shuffle rows: the exporter must not rely on row order
    perm = rng.permutation(nw * ns)
    db = Table(
        {
            "walker": walker[perm],
            "sample": sample[perm],
            "0_Sky_adu": a[perm],
            "1_PointSource_xy": xy[perm],
            "lnprobability": lnp[perm],
        }
    )
    d = to_inference_dict(db)
    post = d["posterior"]
    assert set(post) == {"0_Sky_adu", "1_PointSource_xy"}
    assert post["0_Sky_adu"].shape == (nw, ns)
    assert post["1_PointSource_xy"].shape == (nw, ns, 2)
    assert d["sample_stats"]["lp"].shape == (nw, ns)
    # chain 1 (walker ID 2), draw 3 must be the right original row
    assert post["0_Sky_adu"][1, 3] == a[1 * ns + 3]
    assert np.all(post["1_PointSource_xy"][2, 0] == xy[2 * ns])
    assert d["sample_stats"]["lp"][3, 5] == lnp[3 * ns + 5]
