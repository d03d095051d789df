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
    # round-3 long-tail families (device-side densities; previously
    # pure_callback fallbacks — reference distributions.py:9-63 parity)
    (lambda: D.Alpha(a=2.0), np.linspace(0.05, 3, 17)),
    (lambda: D.Anglit(loc=0.5, scale=2.0), np.linspace(-1.5, 2.5, 17)),
    (lambda: D.Bradford(c=1.7), np.linspace(-0.2, 1.2, 17)),
    (lambda: D.Burr3(c=2.0, d=1.5), np.linspace(0.05, 4, 17)),
    (lambda: D.Burr12(c=2.0, d=1.5), np.linspace(0.05, 4, 17)),
    (lambda: D.Chi(df=3.0), np.linspace(0.05, 4, 17)),
    (lambda: D.Cosine(), np.linspace(-4, 4, 17)),
    (lambda: D.DoubleGamma(a=1.7), np.linspace(-4, 4, 17)),
    (lambda: D.DoubleGamma(a=0.7), np.linspace(-4, 4, 16)),
    (lambda: D.DoubleWeibull(c=2.0), np.linspace(-3, 3, 17)),
    (lambda: D.ExponentialNormal(K=1.5), np.linspace(-4, 8, 17)),
    (lambda: D.ExponentialWeibull(a=2.0, c=1.5), np.linspace(0.05, 4, 17)),
    (lambda: D.ExponentialPower(b=1.8), np.linspace(-0.2, 2.0, 17)),
    (lambda: D.F(dfn=5.0, dfd=7.0), np.linspace(0.05, 5, 17)),
    (lambda: D.FatigueLife(c=0.8), np.linspace(0.05, 5, 17)),
    (lambda: D.Fisk(c=2.2), np.linspace(0.05, 5, 17)),
    (lambda: D.FoldedCauchy(c=1.5), np.linspace(-0.5, 6, 17)),
    (lambda: D.FoldedNormal(c=1.5), np.linspace(-0.5, 6, 17)),
    (lambda: D.GeneralLogistic(c=2.0), np.linspace(-5, 5, 17)),
    (lambda: D.GeneralNormal(beta=1.5), np.linspace(-4, 4, 17)),
    (lambda: D.HalfGeneralNormal(beta=1.5), np.linspace(-0.5, 4, 17)),
    (lambda: D.GeneralPareto(c=0.5), np.linspace(-0.5, 5, 17)),
    (lambda: D.GeneralPareto(c=-0.5), np.linspace(-0.5, 2.5, 17)),
    (lambda: D.GeneralPareto(c=0.0), np.linspace(-0.5, 5, 17)),
    (lambda: D.GeneralExtreme(c=0.3), np.linspace(-4, 3, 17)),
    (lambda: D.GeneralExtreme(c=-0.3), np.linspace(-3, 6, 17)),
    (lambda: D.GeneralExtreme(c=0.0), np.linspace(-3, 6, 17)),
    (lambda: D.GeneralExponential(a=1.5, b=2.0, c=1.0),
     np.linspace(-0.5, 4, 17)),
    (lambda: D.GeneralGamma(a=2.0, c=1.5), np.linspace(0.05, 4, 17)),
    (lambda: D.GeneralGamma(a=2.0, c=-1.5), np.linspace(0.05, 4, 17)),
    (lambda: D.GeneralHalfLogistic(c=0.7), np.linspace(-0.2, 1.6, 17)),
    (lambda: D.Gilbrat(), np.linspace(0.05, 6, 17)),
    (lambda: D.Gompertz(c=1.2), np.linspace(-0.5, 3, 17)),
    (lambda: D.HalfLogistic(), np.linspace(-0.5, 5, 17)),
    (lambda: D.HyperbolicSecant(), np.linspace(-5, 5, 17)),
    (lambda: D.InverseGaussian(mu=1.3), np.linspace(0.05, 5, 17)),
    (lambda: D.InverseWeibull(c=2.0), np.linspace(0.05, 5, 17)),
    (lambda: D.JohnsonSB(a=1.0, b=2.0), np.linspace(-0.2, 1.2, 17)),
    (lambda: D.JohnsonSU(a=1.0, b=2.0), np.linspace(-5, 5, 17)),
    (lambda: D.Kappa3(a=1.5), np.linspace(0.05, 5, 17)),
    (lambda: D.Levy(), np.linspace(0.05, 8, 17)),
    (lambda: D.LevyLeft(), np.linspace(-8, -0.05, 17)),
    (lambda: D.LogGamma(c=1.5), np.linspace(-5, 2, 17)),
    (lambda: D.LogLaplace(c=1.8), np.linspace(0.05, 4, 17)),
    (lambda: D.Lomax(c=2.0), np.linspace(-0.5, 5, 17)),
    (lambda: D.Mielke(k=2.0, s=1.5), np.linspace(0.05, 5, 17)),
    (lambda: D.Nakagami(nu=1.5), np.linspace(0.05, 3, 17)),
    (lambda: D.PearsonType3(skew=0.8), np.linspace(-3, 5, 17)),
    (lambda: D.PearsonType3(skew=-0.8), np.linspace(-5, 3, 17)),
    (lambda: D.PearsonType3(skew=0.0), np.linspace(-4, 4, 17)),
    (lambda: D.PowerLogNormal(c=2.0, s=0.8), np.linspace(0.05, 4, 17)),
    (lambda: D.PowerNormal(c=2.0), np.linspace(-4, 4, 17)),
    (lambda: D.RDistributed(c=3.0), np.linspace(-1.2, 1.2, 17)),
    (lambda: D.ReciprocalInverseGaussian(mu=1.3), np.linspace(0.05, 5, 17)),
    (lambda: D.Rice(b=2.0), np.linspace(-0.5, 6, 17)),
    (lambda: D.Semicircular(), np.linspace(-1.3, 1.3, 17)),
    (lambda: D.SkewNormal(a=3.0), np.linspace(-4, 4, 17)),
    (lambda: D.Trapezoidal(c=0.2, d=0.7), np.linspace(-0.2, 1.2, 17)),
    (lambda: D.WrappedCauchy(c=0.4), np.linspace(-1, 7, 17)),
    (lambda: D.GaussHypergeometric(a=1.5, b=2.0, c=1.0, z=0.5),
     np.linspace(-0.2, 1.2, 17)),
    (lambda: D.Boltzmann(lambda_=0.7, N=10), np.arange(-1.0, 12.0)),
    (lambda: D.DiscreteLaplace(a=0.8), np.arange(-6.0, 7.0)),
    (lambda: D.Hypergeometric(M=20, n=7, N=12), np.arange(-1.0, 14.0)),
    (lambda: D.LogSeries(p=0.6), np.arange(0.0, 10.0)),
    (lambda: D.Planck(lambda_=0.5), np.arange(-1.0, 10.0)),
    (lambda: D.Zipf(a=2.5), np.arange(0.0, 10.0)),
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
    """Families without a hand-written JAX density fall back to scipy.

    After round 3 the callback tail is only the special-function-heavy
    families (noncentral chi2/F/t, levy_stable, KS statistics, kappa4,
    tukeylambda, skellam).
    """
    dist = D.NonCentralT(df=4.0, nc=1.5)
    xs = np.linspace(-2, 5, 7)
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
