"""Sampler statistical correctness: known-posterior moment recovery."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from psfmc_tpu.sampler.autocorr import AutocorrError, function, integrated_time
from psfmc_tpu.sampler.ensemble import EnsembleSampler


class GaussianPosterior:
    """Minimal posterior_fns stand-in: correlated 3-D Gaussian."""

    dtype = jnp.float64

    def __init__(self):
        self.mean = jnp.asarray([1.0, -2.0, 0.5])
        cov = np.array(
            [[1.0, 0.5, 0.0], [0.5, 2.0, 0.3], [0.0, 0.3, 0.5]]
        )
        self.cov = cov
        self.prec = jnp.asarray(np.linalg.inv(cov))

        class _Spec:
            shape = (2, 2)

        self.spec = _Spec()

    def log_posterior(self, theta):
        d = theta - self.mean
        return -0.5 * d @ self.prec @ d

    def log_posterior_and_images(self, theta):
        lnp = self.log_posterior(theta)
        # dummy per-walker image: the parameter outer product
        img = jnp.ones((2, 2), self.dtype) * theta[0]
        return lnp, {"img": img}


def test_gaussian_moments_recovered():
    post = GaussianPosterior()
    nwalkers, dim = 64, 3
    rng = np.random.RandomState(0)
    p0 = rng.randn(nwalkers, dim) * 0.1 + np.asarray(post.mean)

    s = EnsembleSampler(nwalkers, dim, post, seed=42, image_shape=(2, 2))
    s.init_state(p0)
    s.run_burn(500)
    s.reset()
    s.run_sampling(3000)

    flat = s.flatchain
    mean = flat.mean(axis=0)
    cov = np.cov(flat.T)
    # tolerance ~4x the Monte Carlo standard error at this chain length
    assert np.allclose(mean, np.asarray(post.mean), atol=0.06)
    assert np.allclose(cov, post.cov, atol=0.15)
    # GW acceptance for a well-scaled Gaussian sits in a healthy band
    assert 0.2 < s.acceptance_fraction.mean() < 0.8
    # accumulated image mean tracks E[theta_0] = 1.0
    acc = s.accumulated_images
    assert acc["img"].mean() == pytest.approx(1.0, abs=0.05)


def test_reproducible_with_seed():
    post = GaussianPosterior()
    rng = np.random.RandomState(3)
    p0 = rng.randn(16, 3) * 0.1

    chains = []
    for _ in range(2):
        s = EnsembleSampler(16, 3, post, seed=7, image_shape=(2, 2))
        s.init_state(p0)
        s.run_sampling(20)
        chains.append(s.chain.copy())
    assert np.array_equal(chains[0], chains[1])


def test_reset_clears_chain():
    post = GaussianPosterior()
    s = EnsembleSampler(16, 3, post, seed=0, image_shape=(2, 2))
    s.init_state(np.random.RandomState(0).randn(16, 3))
    s.run_sampling(10)
    assert s.chain.shape == (16, 10, 3)
    s.reset()
    assert s.chain is None
    assert s.accumulated_samples == 0


def test_odd_walkers_rejected():
    post = GaussianPosterior()
    with pytest.raises(ValueError):
        EnsembleSampler(15, 3, post)


def test_autocorr_function_basics():
    rng = np.random.RandomState(0)
    # AR(1) series with known integrated time tau = (1+rho)/(1-rho)
    rho = 0.8
    n = 200_000
    x = np.zeros(n)
    eps = rng.randn(n)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + eps[i]
    acf = function(x)
    assert acf[0] == pytest.approx(1.0)
    assert acf[1] == pytest.approx(rho, abs=0.02)
    tau = integrated_time(x, c=5)
    want = (1 + rho) / (1 - rho)
    assert tau == pytest.approx(want, rel=0.15)


def test_autocorr_error_on_short_chain():
    x = np.cumsum(np.random.RandomState(0).randn(40))  # random walk
    with pytest.raises(AutocorrError):
        integrated_time(x, c=10)


def test_thinned_chain_matches_unthinned_subsample():
    """thin=k records exactly every k-th state of the identical chain,
    and image accumulation still covers every step."""
    post = GaussianPosterior()
    nwalkers, dim = 32, 3
    rng = np.random.RandomState(3)
    p0 = rng.randn(nwalkers, dim) * 0.1 + np.asarray(post.mean)

    full = EnsembleSampler(nwalkers, dim, post, seed=8, image_shape=(2, 2))
    full.init_state(p0)
    full.run_sampling(40)

    thinned = EnsembleSampler(
        nwalkers, dim, post, seed=8, image_shape=(2, 2), thin=4
    )
    thinned.init_state(p0)
    thinned.run_sampling(40)

    assert thinned.chain.shape == (nwalkers, 10, dim)
    # every recorded state equals the corresponding unthinned state
    assert np.allclose(thinned.chain, full.chain[:, 3::4], atol=1e-12)
    assert np.allclose(thinned.lnprobability, full.lnprobability[:, 3::4])
    # accumulators saw all 40 steps, identical to the full run
    assert thinned.accumulated_samples == full.accumulated_samples
    assert np.allclose(
        thinned.accumulated_images["img"], full.accumulated_images["img"]
    )
    # segmented + thinned runs stay consistent
    seg = EnsembleSampler(
        nwalkers, dim, post, seed=8, image_shape=(2, 2), thin=4
    )
    seg.init_state(p0)
    seg.run_sampling(40, segment=18)  # rounded down to 16, remainder 8
    assert np.allclose(seg.chain, thinned.chain, atol=1e-12)

    with pytest.raises(ValueError, match="not divisible"):
        thinned.run_sampling(41)


def test_on_device_moments_match_chain():
    """track_moments=True maintains Welford mean/std over every retained
    step that matches f64 statistics of the full chain."""
    post = GaussianPosterior()
    nwalkers, dim = 32, 3
    rng = np.random.RandomState(4)
    p0 = rng.randn(nwalkers, dim) * 0.1 + np.asarray(post.mean)

    s = EnsembleSampler(
        nwalkers, dim, post, seed=9, image_shape=(2, 2),
        thin=10, track_moments=True,
    )
    s.init_state(p0)
    s.run_burn(100)
    s.reset()
    s.run_sampling(400)

    mean, std = s.posterior_moments
    # reference: full-chain f64 statistics from an unthinned twin
    twin = EnsembleSampler(nwalkers, dim, post, seed=9, image_shape=(2, 2))
    twin.init_state(p0)
    twin.run_burn(100)
    twin.reset()
    twin.run_sampling(400)
    flat = np.asarray(twin.flatchain, np.float64)
    assert np.allclose(mean, flat.mean(0), rtol=1e-5, atol=1e-7)
    assert np.allclose(std, flat.std(0, ddof=1), rtol=1e-4)
    # the thinned chain shipped 10x less data
    assert s.chain.shape[1] == 40


@pytest.mark.parametrize("moves", ["de", "mixed"])
def test_de_moves_recover_gaussian_moments(moves):
    """Differential-evolution and mixed proposals target the same
    posterior: moments of the correlated Gaussian must match."""
    post = GaussianPosterior()
    nwalkers = 64
    rng = np.random.RandomState(3)
    p0 = np.asarray(post.mean) + rng.randn(nwalkers, 3)

    s = EnsembleSampler(nwalkers, 3, post, seed=4, image_shape=(2, 2),
                        moves=moves)
    s.init_state(p0)
    s.run_burn(400)
    s.reset()
    s.run_sampling(1500)
    flat = np.asarray(s.flatchain, np.float64)
    assert np.allclose(flat.mean(axis=0), np.asarray(post.mean), atol=0.08)
    assert np.allclose(
        np.cov(flat.T), np.asarray(post.cov), atol=0.25
    )
    acc = float(s.acceptance_fraction.mean())
    assert 0.1 < acc < 0.9

    with pytest.raises(ValueError):
        EnsembleSampler(nwalkers, 3, post, moves="bogus", image_shape=(2, 2))


class BigMeanRawPosterior:
    """Posterior whose 'raw' image has mean/std ~ 1e6: the adversarial
    case for per-pixel posterior-variance accumulation in float32."""

    dtype = jnp.float32

    def __init__(self):
        class _Spec:
            shape = (2, 2)

        self.spec = _Spec()

    def log_posterior(self, theta):
        return -0.5 * jnp.sum(theta * theta)

    def log_posterior_and_images(self, theta):
        raw = jnp.full((2, 2), 1.0e4, self.dtype) + 0.01 * theta[0]
        return self.log_posterior(theta), {"raw": raw}


def test_raw_m2_accumulation_survives_huge_mean():
    """Welford/Chan image accumulation: per-pixel posterior std stays
    exact in f32 at std/mean ~ 1e-6 — the naive E[raw^2]-E[raw]^2 form
    is pure cancellation noise there (f32 ulp of mean^2=1e8 is ~8,
    five orders above the true variance of 1e-4)."""
    post = BigMeanRawPosterior()
    nwalkers, dim = 32, 3
    rng = np.random.RandomState(7)
    s = EnsembleSampler(
        nwalkers, dim, post, seed=3, image_shape=(2, 2)
    )
    s.init_state(rng.randn(nwalkers, dim))
    s.run_sampling(300)

    m2 = np.asarray(s.state.accum["raw_m2"], np.float64)
    count = s.accumulated_samples
    assert count == nwalkers * 300
    got_std = np.sqrt(m2 / count)

    # ground truth from the recorded chain (f64): raw = 1e4 + 0.01*t0
    t0 = np.asarray(s.chain[:, :, 0], np.float64).ravel()
    want_std = 0.01 * np.std(t0)
    assert want_std > 1e-3  # the chain really moved
    np.testing.assert_allclose(got_std, want_std, rtol=0.02)

    # and the mean accumulator agrees with the chain mean
    want_mean = 1.0e4 + 0.01 * np.mean(t0)
    np.testing.assert_allclose(
        np.asarray(s.state.accum["raw"], np.float64), want_mean, rtol=1e-6
    )


def test_rejuvenate_stuck_repairs_stranded_walkers():
    """Burn-phase walker rescue: stranded walkers teleport onto healthy
    donors; healthy ensembles and majority-stuck ensembles are no-ops."""
    post = GaussianPosterior()
    nwalkers, dim = 32, 3
    rng = np.random.RandomState(3)
    p0 = rng.randn(nwalkers, dim) * 0.3 + np.asarray(post.mean)
    # strand 4 walkers absurdly far out (lnp ~ -5e5)
    p0[:4] = 1000.0

    s = EnsembleSampler(nwalkers, dim, post, seed=1, image_shape=(2, 2))
    s.init_state(p0)
    lnp0 = np.asarray(s.state.log_prob, np.float64)
    assert (lnp0[:4] < -1e4).all()

    n = s.rejuvenate_stuck(random_state=np.random.RandomState(0))
    assert n == 4
    lnp1 = np.asarray(s.state.log_prob, np.float64)
    pos1 = np.asarray(s.state.positions, np.float64)
    med = np.median(lnp1)
    assert np.all(lnp1 > med - 50.0)
    # teleported rows are exact copies of healthy rows
    healthy = pos1[4:]
    for row in pos1[:4]:
        assert np.any(np.all(np.isclose(healthy, row[None]), axis=1))
    # second call: nothing left to fix
    assert s.rejuvenate_stuck(random_state=np.random.RandomState(0)) == 0

    # majority stuck -> refuse (not a stragglers problem)
    p_bad = p0.copy()
    p_bad[: nwalkers // 2 + 2] = 1000.0
    s2 = EnsembleSampler(nwalkers, dim, post, seed=1, image_shape=(2, 2))
    s2.init_state(p_bad)
    assert s2.rejuvenate_stuck(random_state=np.random.RandomState(0)) == 0


def test_rejuvenate_stuck_handles_minus_inf():
    """-inf walkers (outside the prior support) count as stuck even
    though they poison MAD arithmetic."""

    class HardSupport(GaussianPosterior):
        def log_posterior(self, theta):
            lnp = super().log_posterior(theta)
            return jnp.where(theta[0] > -5.0, lnp, -jnp.inf)

        def log_posterior_and_images(self, theta):
            return self.log_posterior(theta), {
                "img": jnp.ones((2, 2), self.dtype) * theta[0]
            }

    post = HardSupport()
    nwalkers, dim = 16, 3
    rng = np.random.RandomState(5)
    p0 = rng.randn(nwalkers, dim) * 0.3 + np.asarray(post.mean)
    p0[0, 0] = -100.0  # outside support -> -inf
    s = EnsembleSampler(nwalkers, dim, post, seed=2, image_shape=(2, 2))
    s.init_state(p0)
    assert not np.isfinite(np.asarray(s.state.log_prob)[0])
    assert s.rejuvenate_stuck(random_state=np.random.RandomState(1)) == 1
    assert np.all(np.isfinite(np.asarray(s.state.log_prob)))


def test_sample_generator_reference_idiom():
    """emcee-2.x generator parity: the reference's own fitting loop
    (reference fitting.py:68-74) must run verbatim against our sampler —
    burn via sample() + clear_blobs(), reset(), sample() again with the
    final position, one (pos, lnprob, rstate) yield per iteration."""
    post = GaussianPosterior()
    nwalkers, dim = 32, 3
    rng = np.random.RandomState(3)
    param_vec = rng.randn(nwalkers, dim) * 0.1 + np.asarray(post.mean)

    sampler = EnsembleSampler(nwalkers, dim, post, seed=7, image_shape=(2, 2))

    burn, iters = 25, 40
    nsteps = 0
    for step, result in enumerate(sampler.sample(param_vec, iterations=burn)):
        param_vec = result[0]
        sampler.clear_blobs()
        nsteps += 1
    assert nsteps == burn
    assert param_vec.shape == (nwalkers, dim)

    sampler.reset()
    assert sampler.chain is None

    lnp_seen = []
    for step, result in enumerate(
            sampler.sample(param_vec, iterations=iters)):
        pos, lnprob, rstate = result
        assert pos.shape == (nwalkers, dim)
        assert lnprob.shape == (nwalkers,)
        assert np.all(np.isfinite(lnprob))
        lnp_seen.append(lnprob)
        nsteps += 1
    assert nsteps == burn + iters

    # yields replay the recorded chain exactly
    assert sampler.chain.shape == (nwalkers, iters, dim)
    np.testing.assert_array_equal(
        np.stack(lnp_seen, axis=1), sampler.lnprobability
    )
    # image accumulation ran during the retained phase
    assert sampler.accumulated_samples == nwalkers * iters

    # segmented run yields identically often and continues the chain
    for _ in sampler.sample(iterations=10, segment=4):
        nsteps += 1
    assert nsteps == burn + iters + 10
    assert sampler.chain.shape == (nwalkers, iters + 10, dim)

    # storechain=False advances positions without recording
    before = sampler.chain.shape[1]
    last = None
    for result in sampler.sample(iterations=5, storechain=False):
        last = result[0]
    assert sampler.chain.shape[1] == before
    assert last is not None and np.all(np.isfinite(last))


def test_sample_generator_requires_thin_one():
    post = GaussianPosterior()
    s = EnsembleSampler(16, 3, post, seed=1, image_shape=(2, 2), thin=2)
    with pytest.raises(ValueError, match="thin"):
        next(s.sample(np.zeros((16, 3)), iterations=2))


def test_sample_generator_rejects_typo_kwargs():
    """Review finding (round 5): a misspelled 'iterations' must raise,
    not silently run the default 1 step."""
    post = GaussianPosterior()
    s = EnsembleSampler(16, 3, post, seed=1, image_shape=(2, 2))
    with pytest.raises(TypeError, match="iteration"):
        next(s.sample(np.zeros((16, 3)), iteration=500))
    with pytest.raises(ValueError, match="mh_proposal"):
        next(s.sample(np.zeros((16, 3)), mh_proposal=object()))
