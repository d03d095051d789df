"""Trace database round-trip, walker filter, checkpoint/resume state."""
import numpy as np
import pytest

from psfmc_tpu.database import (
    annotate_metadata,
    filter_lowp_walkers,
    get_sampler_state,
    load_checkpoint,
    load_database,
    row_to_param_vector,
    save_database,
)
from psfmc_tpu.io.table import Table


class FakeModel:
    param_names = ["0_Sky_adu", "1_PointSource_xy", "1_PointSource_mag"]
    param_lens = [1, 2, 1]


class FakeState:
    def __init__(self, nwalkers, dim, rng):
        import jax.numpy as jnp

        self.positions = jnp.asarray(rng.randn(nwalkers, dim))
        self.log_prob = jnp.asarray(rng.randn(nwalkers))
        self.naccept = jnp.asarray(rng.randint(0, 50, nwalkers))
        import jax

        self.key = jax.random.PRNGKey(99)


class FakeSampler:
    def __init__(self, nwalkers=6, niter=20, dim=4, seed=0, accum=None):
        rng = np.random.RandomState(seed)
        self.nwalkers = nwalkers
        self.chain = rng.randn(nwalkers, niter, dim) if niter else None
        self.lnprobability = rng.randn(nwalkers, niter) if niter else None
        self.state = FakeState(nwalkers, dim, rng)
        self.accum = accum

    def checkpoint_payload(self):
        s = self.state
        return {
            "version": 2,
            "ntemps": 1,
            "positions": np.asarray(s.positions, np.float64),
            "log_prob": np.asarray(s.log_prob, np.float64),
            "naccept": np.asarray(s.naccept, np.int64),
            "nsteps": 17,
            "key": np.asarray(s.key).astype(np.uint32),
            "accum": self.accum,
            "accum_count": 0 if self.accum is None else 120,
        }


def test_save_load_roundtrip(tmp_path):
    sampler = FakeSampler()
    path = str(tmp_path / "db.fits")
    db = save_database(sampler, FakeModel(), path, meta_dict={"MCITER": 20})
    assert len(db) == 6 * 20
    assert db.colnames == [
        "0_Sky_adu",
        "1_PointSource_xy",
        "1_PointSource_mag",
        "lnprobability",
        "walker",
        "sample",
    ]
    # walker-major row order; sample column tiles (reference bug fixed)
    assert np.array_equal(db["walker"][:21], [0] * 20 + [1])
    assert np.array_equal(db["sample"][:21], list(range(20)) + [0])
    # chain values survive, row 0 of walker 1 = chain[1, 0]
    row = db[20]
    vec = row_to_param_vector(row[:3])
    assert np.allclose(vec, sampler.chain[1, 0])
    # MAP indices recorded
    best = np.unravel_index(
        np.argmax(sampler.lnprobability), sampler.lnprobability.shape
    )
    assert db.meta["MAPWLKR"] == best[0]
    assert db.meta["MAPSAMP"] == best[1]


def test_get_sampler_state(tmp_path):
    sampler = FakeSampler()
    path = str(tmp_path / "db.fits")
    save_database(sampler, FakeModel(), path)
    db = load_database(path)
    pos, lnp = get_sampler_state(db)
    assert pos.shape == (6, 4)
    assert np.allclose(pos, sampler.chain[:, -1, :])
    assert np.allclose(lnp, sampler.lnprobability[:, -1])


def test_checkpoint_roundtrip(tmp_path):
    sampler = FakeSampler()
    path = str(tmp_path / "db.fits")
    save_database(sampler, FakeModel(), path)
    ckpt = load_checkpoint(path)
    assert ckpt is not None
    assert ckpt["version"] == 2
    assert ckpt["ntemps"] == 1
    assert np.allclose(ckpt["positions"], np.asarray(sampler.state.positions))
    assert np.allclose(ckpt["log_prob"], np.asarray(sampler.state.log_prob))
    assert np.array_equal(ckpt["naccept"], np.asarray(sampler.state.naccept))
    assert np.array_equal(ckpt["key"], np.asarray(sampler.state.key))
    assert ckpt["nsteps"] == 17
    assert ckpt["accum"] is None and ckpt["accum_count"] == 0


def test_checkpoint_accumulators_roundtrip(tmp_path):
    """v2 checkpoints persist the posterior-image running means."""
    rng = np.random.RandomState(3)
    accum = {
        "raw": rng.rand(16, 16).astype(np.float32),
        "conv": rng.rand(16, 16).astype(np.float32),
    }
    sampler = FakeSampler(accum=accum)
    path = str(tmp_path / "db.fits")
    save_database(sampler, FakeModel(), path)
    ckpt = load_checkpoint(path)
    assert ckpt["accum_count"] == 120
    assert set(ckpt["accum"]) == {"raw", "conv"}
    for k in accum:
        assert np.allclose(ckpt["accum"][k], accum[k])


def test_burn_phase_checkpoint_zero_row_trace(tmp_path):
    """A sampler with no recorded chain yet still checkpoints (mid-burn)."""
    sampler = FakeSampler(niter=0)
    path = str(tmp_path / "db.fits")
    db = save_database(
        sampler, FakeModel(), path,
        meta_dict={"MCITER": 0, "MCBURNDN": 40, "MCBURN": 100},
    )
    assert len(db) == 0
    assert db.meta["MCITER"] == 0
    assert db.meta["MCBURNDN"] == 40
    ckpt = load_checkpoint(path)
    assert np.allclose(ckpt["positions"], np.asarray(sampler.state.positions))


def test_filter_lowp_walkers():
    nwalkers, niter = 10, 50
    rng = np.random.RandomState(0)
    lnp = rng.randn(nwalkers, niter)
    lnp[3] -= 100  # stuck walker, all samples terrible
    db = Table(
        {
            "x": rng.randn(nwalkers * niter),
            "lnprobability": lnp.reshape(-1),
            "walker": np.repeat(np.arange(nwalkers), niter),
        }
    )
    filtered = filter_lowp_walkers(db, percentile=10)
    assert 3 not in np.unique(filtered["walker"])
    assert len(filtered) == 9 * niter


def test_annotate_metadata():
    meta = annotate_metadata({"MCITER": 100, "CUSTOM": 1.5})
    assert meta["MCITER"] == (100, "number of retained samples")
    assert meta["CUSTOM"][1] == "psfMC model parameter"


def test_checkpoint_long_ladder_and_evidence_roundtrip(tmp_path):
    """Long-ladder tempered checkpoints: nswap rides a per-row column
    (the old header CSV silently truncated at the 68-char FITS card
    limit and corrupted large counts), and the evidence accumulators
    survive the disk round trip (without them a resumed run recomputes
    MCLNZ from post-resume steps only)."""

    class PTFake(FakeSampler):
        def __init__(self):
            super().__init__(nwalkers=4, niter=5, seed=2)
            self.ntemps = 10

        def checkpoint_payload(self):
            p = super().checkpoint_payload()
            rng = np.random.RandomState(7)
            p["ntemps"] = self.ntemps
            p["positions"] = rng.randn(self.ntemps, self.nwalkers, 4)
            p["naccept"] = rng.randint(
                0, 100, (self.ntemps, self.nwalkers)
            ).astype(np.int64)
            # large counts: the CSV form was 80+ chars and truncated
            p["nswap"] = np.full(self.ntemps - 1, 12345678, np.int64)
            p["betas"] = np.linspace(1.0, 0.0, self.ntemps)
            p["lnl_sum"] = rng.randn(self.ntemps) * 1e4
            p["lnl_sq_sum"] = rng.rand(self.ntemps) * 1e8
            p["ss_max"] = rng.randn(self.ntemps - 1)
            p["ss_sum"] = rng.rand(self.ntemps - 1) * 1e3
            p["evid_steps"] = 4321
            return p

    sampler = PTFake()
    path = str(tmp_path / "db.fits")
    save_database(sampler, FakeModel(), path)
    ckpt = load_checkpoint(path)
    src = sampler.checkpoint_payload()
    assert np.array_equal(ckpt["nswap"], src["nswap"])  # no truncation
    assert np.allclose(ckpt["betas"], src["betas"])
    assert np.allclose(ckpt["lnl_sum"], src["lnl_sum"])
    assert np.allclose(ckpt["lnl_sq_sum"], src["lnl_sq_sum"])
    assert np.allclose(ckpt["ss_max"], src["ss_max"])
    assert np.allclose(ckpt["ss_sum"], src["ss_sum"])
    assert ckpt["evid_steps"] == 4321
