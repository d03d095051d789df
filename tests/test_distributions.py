"""Prior distribution tests: jax_logp parity vs scipy, value semantics."""
import numpy as np
import pytest
import jax.numpy as jnp

from psfmc_tpu import distributions as D


CASES = [
    (lambda: D.Uniform(loc=2.0, scale=3.0), np.linspace(1.5, 5.5, 31)),
    (lambda: D.Normal(loc=0.0, scale=0.01), np.linspace(-0.05, 0.05, 21)),
    (lambda: D.WeibullMinimum(c=1.5, scale=4), np.linspace(0.01, 15, 31)),
    (lambda: D.WeibullMaximum(c=2.0, scale=3.0), np.linspace(-10, 1, 23)),
    (lambda: D.DiscreteUniform(low=0, high=3), np.array([-1.0, 0.0, 1.0, 2.0, 2.4, 3.0])),
    (lambda: D.Gamma(a=2.5, scale=1.3), np.linspace(0.01, 9, 17)),
    (lambda: D.Beta(a=2.0, b=3.0), np.linspace(0.01, 0.99, 17)),
    (lambda: D.LogNormal(s=0.8, scale=2.0), np.linspace(0.05, 9, 17)),
    (lambda: D.TruncatedNormal(a=-1.0, b=2.0, loc=0.5, scale=2.0), np.linspace(-2, 5, 23)),
    (lambda: D.Cauchy(loc=1.0, scale=2.0), np.linspace(-5, 5, 11)),
    (lambda: D.T(df=4.0), np.linspace(-5, 5, 11)),
    (lambda: D.Poisson(mu=3.0), np.arange(0, 10.0)),
    (lambda: D.GumbelRight(loc=1.0, scale=2.0), np.linspace(-4, 8, 13)),
    (lambda: D.GumbelLeft(loc=1.0, scale=2.0), np.linspace(-8, 4, 13)),
    (lambda: D.Logistic(loc=0.0, scale=1.5), np.linspace(-6, 6, 13)),
    (lambda: D.VonMises(kappa=2.0), np.linspace(-3, 3, 13)),
    (lambda: D.Triangular(c=0.3, loc=1.0, scale=4.0), np.linspace(0.5, 5.5, 17)),
    (lambda: D.HalfNormal(scale=2.0), np.linspace(-1, 5, 13)),
    (lambda: D.Exponential(scale=3.0), np.linspace(-1, 9, 11)),
    (lambda: D.Laplace(loc=1.0, scale=0.5), np.linspace(-3, 5, 13)),
    (lambda: D.ChiSquared(df=3.0), np.linspace(0.1, 9, 11)),
    (lambda: D.InverseGamma(a=3.0, scale=2.0), np.linspace(0.1, 5, 11)),
    (lambda: D.Rayleigh(scale=2.0), np.linspace(-1, 8, 11)),
    (lambda: D.Pareto(b=2.5), np.linspace(0.5, 6, 11)),
    (lambda: D.PowerLaw(a=1.7), np.linspace(-0.2, 1.2, 11)),
    (lambda: D.Maxwell(scale=1.5), np.linspace(-1, 6, 11)),
    (lambda: D.Wald(), np.linspace(0.05, 5, 11)),
    (lambda: D.Binomial(n=10, p=0.3), np.arange(0, 11.0)),
    (lambda: D.Geometric(p=0.4), np.arange(0, 8.0)),
    (lambda: D.Bernoulli(p=0.7), np.array([-1.0, 0.0, 1.0, 2.0])),
    (lambda: D.Arcsine(), np.linspace(-0.2, 1.2, 13)),
    (lambda: D.TruncatedExponential(b=2.0, scale=1.5), np.linspace(-1, 4, 13)),
]


@pytest.mark.parametrize("make_dist,xs", CASES, ids=lambda c: getattr(c, "__name__", None))
def test_jax_logp_matches_scipy(make_dist, xs):
    dist = make_dist()
    want = dist.logp(xs)
    got = np.asarray(dist.jax_logp(jnp.asarray(xs, jnp.float64)))
    both_inf = np.isneginf(want) & np.isneginf(got)
    ok = np.isclose(want, got, rtol=1e-8, atol=1e-8) | both_inf
    assert ok.all(), f"{type(dist).__name__}: {want[~ok]} vs {got[~ok]}"


def test_fallback_callback_logp():
    """Families without a hand-written JAX density fall back to scipy."""
    dist = D.Alpha(a=2.0)
    xs = np.linspace(0.1, 3, 7)
    got = np.asarray(dist.jax_logp(jnp.asarray(xs, jnp.float64)))
    assert np.allclose(got, dist.logp(xs), rtol=1e-8)


def test_discrete_value_rounding():
    d = D.DiscreteUniform(low=0, high=3)
    d.value = 1.7
    assert d.value == 2
    assert isinstance(d.value, (int, np.integer))


def test_vector_valued_prior():
    d = D.Uniform(loc=np.array([1.0, 2.0]), scale=np.array([3.0, 3.0]))
    sample = d.random(np.random.RandomState(0))
    assert np.shape(sample) == (2,)
    assert np.shape(d.median()) == (2,)
    d.value = np.array([1.5, 2.5])
    assert np.allclose(d.value, [1.5, 2.5])
    lp = np.asarray(d.jax_logp(jnp.asarray([1.5, 2.5])))
    assert np.allclose(lp, d.logp(np.array([1.5, 2.5])))


def test_registry_covers_reference_table():
    """Every alias in the reference's distribution table must exist."""
    for alias in ("Uniform", "Normal", "WeibullMinimum", "DiscreteUniform",
                  "Gamma", "Beta", "Cauchy", "Poisson", "TruncatedNormal",
                  "LogNormal", "VonMises", "Pareto", "SkewNormal", "Levy"):
        assert hasattr(D, alias), alias


def test_median_and_interval():
    d = D.Normal(loc=5.0, scale=2.0)
    assert d.median() == pytest.approx(5.0)
    lo, hi = d.interval(0.95)
    assert lo < 5.0 < hi
