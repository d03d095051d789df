"""Simulation-based calibration (Talts et al. 2018) on the batched
multi-target machinery.

Anchors: exact rank arithmetic (incl. randomized tie-breaking), a
calibrated end-to-end run (prior draws -> framework mocks -> batched
fits -> uniform ranks), and DETECTION of a rigged overconfident
pipeline (fitting with a claimed noise 2x smaller than the one the
mocks carry) — the kind of noise-model mismatch SBC exists to catch.
"""
import numpy as np
import pytest

from psfmc_tpu import distributions as D
from psfmc_tpu.analysis.sbc import (
    SBCResult, run_sbc, sbc_ranks_from_chains,
)
from psfmc_tpu.batchfit import fit_batch, simulate_stack
from psfmc_tpu.models.components import Configuration, Sersic, Sky
from psfmc_tpu.models.multicomponent import MultiComponentModel


def test_rank_arithmetic_and_ties():
    chains = np.zeros((2, 3, 2, 1))
    chains[0, :, :, 0] = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    chains[1, :, :, 0] = [[1.0, 1.0], [1.0, 1.0], [1.0, 9.0]]
    inj = np.array([[3.5], [1.0]])
    ranks = sbc_ranks_from_chains(
        chains, inj, rng=np.random.RandomState(0)
    )
    assert ranks[0, 0] == 3  # 1,2,3 below 3.5
    # 5 ties at 1.0: rank uniform in {0..5}; deterministic given rng
    assert 0 <= ranks[1, 0] <= 5
    # across many rng draws the tie-broken rank covers the whole block
    seen = {
        int(
            sbc_ranks_from_chains(
                chains, inj, rng=np.random.RandomState(s)
            )[1, 0]
        )
        for s in range(200)
    }
    assert seen == set(range(6))


def _noise_model(noise, gaussian_psf):
    cfg = Configuration(
        obs_file=np.zeros((32, 32)),
        obsivm_file=np.full((32, 32), 1.0 / noise**2),
        psf_files=gaussian_psf,
        psfivm_files=np.full_like(gaussian_psf, 1e8),
        mag_zeropoint=25.0,
    )
    comps = [
        cfg,
        Sky(adu=D.Normal(loc=0.05, scale=0.02)),
        Sersic(
            xy=(16.0, 16.0),
            mag=D.Uniform(loc=20.3, scale=0.8),
            reff=3.0, reff_b=2.4, index=1.5, angle=30.0,
            angle_degrees=True,
        ),
    ]
    return MultiComponentModel(components=comps)


@pytest.mark.slow
def test_sbc_end_to_end_calibrated_and_rigged(gaussian_psf):
    noise = 0.01
    model = _noise_model(noise, gaussian_psf)
    res = run_sbc(
        model, n_sims=64, nwalkers=16, burn=250, iterations=300,
        record_every=30, seed=3,
    )
    assert res.ranks.shape == (64, 2)
    assert res.param_names == ["0_Sky_adu", "1_Sersic_mag"]
    assert res.n_posterior == 10 * 16
    # healthy pipeline: uniform ranks per parameter
    assert res.calibrated(), res.summary()
    # both tails actually visited (a stuck sampler would not)
    assert res.ranks.min() < res.n_posterior // 4
    assert res.ranks.max() > 3 * res.n_posterior // 4

    # rigged: mocks carry noise sigma, but the fit is told sigma/2
    # (ivm x4) -> overconfident posteriors -> ranks pile in the tails
    obs, ivm, injected = simulate_stack(model, 64, seed=3)
    rigged = fit_batch(
        model, obs, 4.0 * ivm, nwalkers=16, burn=250, iterations=300,
        seed=4, record_every=30,
    )
    ranks = sbc_ranks_from_chains(
        rigged.chains, injected, rng=np.random.RandomState(5)
    )
    bad = SBCResult(
        param_names=res.param_names, ranks=ranks,
        n_posterior=res.n_posterior, injected=np.asarray(injected),
    )
    assert not bad.calibrated(), bad.summary()
    assert "MISCALIBRATED" in bad.summary()


def test_run_sbc_validates_record_every(gaussian_psf):
    model = _noise_model(0.01, gaussian_psf)
    with pytest.raises(ValueError):
        run_sbc(model, n_sims=4, record_every=0)


def test_uniformity_discrete_support_binning():
    """Equal-width bins over a DISCRETE rank support must use per-bin
    integer counts as the expectation: with n_posterior+1 = 17 values
    and 20 requested bins, a flat k/b expectation would guarantee a
    false MISCALIBRATED (structurally empty bins)."""
    rng = np.random.RandomState(0)
    n_post = 16  # support {0..16}: 17 values, not divisible by 20
    k = 128
    ranks = rng.randint(0, n_post + 1, size=(k, 2))
    res = SBCResult(
        param_names=["a", "b"], ranks=ranks, n_posterior=n_post,
        injected=np.zeros((k, 2)),
    )
    p = res.uniformity_pvalues()
    assert np.all(p > 0.01 / 2), p  # calibrated stays calibrated
    assert res.calibrated()
    # a rank distribution piled at one end still rejects
    piled = np.clip(ranks, 0, 3)
    bad = SBCResult(
        param_names=["a", "b"], ranks=piled, n_posterior=n_post,
        injected=np.zeros((k, 2)),
    )
    assert not bad.calibrated()
