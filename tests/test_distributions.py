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
    # final special-function tail (round 3): exact device-side series /
    # quadrature — previously pure_callback (broken on TPU backends)
    (lambda: D.NonCentralChiSquared(df=3.0, nc=2.0), np.linspace(0.05, 20, 23)),
    (lambda: D.NonCentralChiSquared(df=7.0, nc=40.0), np.linspace(1, 140, 23)),
    (lambda: D.NonCentralF(dfn=5.0, dfd=7.0, nc=2.0), np.linspace(0.05, 8, 23)),
    (lambda: D.NonCentralF(dfn=2.0, dfd=30.0, nc=15.0), np.linspace(0.05, 30, 23)),
    (lambda: D.NonCentralT(df=4.0, nc=1.5), np.linspace(-6, 10, 23)),
    (lambda: D.NonCentralT(df=2.0, nc=-3.0), np.linspace(-12, 6, 23)),
    (lambda: D.Kappa4(h=0.5, k=0.3), np.linspace(-3, 3.5, 23)),
    (lambda: D.Kappa4(h=-0.5, k=-0.3), np.linspace(-3, 6, 23)),
    (lambda: D.Kappa4(h=0.0, k=0.0), np.linspace(-3, 6, 23)),
    (lambda: D.Skellam(mu1=3.0, mu2=2.0), np.arange(-12.0, 16.0)),
    (lambda: D.Skellam(mu1=40.0, mu2=10.0), np.arange(-10.0, 90.0, 3.0)),
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


@pytest.mark.parametrize("lam", [0.5, -0.5, 0.14, 0.0, -2.0])
def test_tukeylambda_device_density(lam):
    """Quantile-function inversion on device, implicit gradient."""
    import jax

    dist = D.TukeyLambda(lam=lam)
    lo, hi = dist.interval(1 - 2e-6)
    xs = np.linspace(lo, hi, 41)
    got = np.asarray(dist.jax_logp(jnp.asarray(xs, jnp.float64)))
    assert np.allclose(got, dist.logp(xs), rtol=1e-6, atol=1e-6)
    # out-of-support for lam>0
    if lam > 0:
        out = np.asarray(dist.jax_logp(jnp.asarray(1.0 / lam + 0.1)))
        assert np.isneginf(out)
    # bisection must carry the implicit-function gradient, not the
    # (zero) iteration gradient — NUTS/MAP depend on it
    g = jax.grad(lambda x: dist.jax_logp(x))(jnp.asarray(0.3, jnp.float64))
    gn = (dist.logp(0.3 + 1e-6) - dist.logp(0.3 - 1e-6)) / 2e-6
    assert np.isclose(float(g), gn, rtol=1e-4)


def test_nct_gradient():
    import jax

    dist = D.NonCentralT(df=4.0, nc=1.5)
    g = jax.grad(lambda x: dist.jax_logp(x))(jnp.asarray(0.7, jnp.float64))
    gn = (dist.logp(0.7 + 1e-6) - dist.logp(0.7 - 1e-6)) / 2e-6
    assert np.isclose(float(g), gn, rtol=1e-5)


@pytest.mark.parametrize(
    "make_dist",
    [
        lambda: D.KSOneSided(n=20),
        lambda: D.KSTwoSided(),
        lambda: D.LevyStable(alpha=1.5, beta=0.3),
    ],
    ids=["ksone", "kstwobign", "levy_stable"],
)
def test_tabulated_device_density(make_dist):
    """No-closed-form families: tabulated cubic-Hermite density, no
    host callback (pure_callback is UNIMPLEMENTED on the axon TPU
    backend), heavy-tail extrapolation linear in asinh coordinates."""
    import warnings

    dist = make_dist()
    lo, hi = dist.interval(1 - 2e-6)
    xs = np.linspace(lo, hi, 101)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # callback path would warn
        got = np.asarray(dist.jax_logp(jnp.asarray(xs, jnp.float64)))
    want = dist.logp(xs)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-5), (
        np.max(np.abs(got - want))
    )
    # beyond-grid behavior: bounded support masks to -inf; unbounded
    # power-law tails extrapolate within a few percent of scipy
    a, b = dist.rv_frozen.support()
    if np.isfinite(b):
        assert np.isneginf(float(dist.jax_logp(jnp.asarray(b + 0.1))))
    else:
        xt = dist.rv_frozen.isf(1e-12) * 5
        got_t = float(dist.jax_logp(jnp.asarray(xt, jnp.float64)))
        want_t = float(dist.logp(xt))
        assert np.isclose(got_t, want_t, rtol=0.05), (got_t, want_t)


def test_vector_hyperparams_tabulated():
    """Vector-valued hyperparameters on no-closed-form continuous
    families build one scalar table per element — device-side, no host
    callback (which is UNIMPLEMENTED on the axon TPU backend)."""
    import warnings

    dist = D.KSOneSided(n=np.array([20, 30]))
    xs = np.array([0.2, 0.3])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # callback path would warn
        got = np.asarray(dist.jax_logp(jnp.asarray(xs, jnp.float64)))
    assert np.allclose(got, dist.logp(xs), rtol=1e-4, atol=1e-5)
    # families whose closed form bakes scalar host constants fall
    # through TypeError to the same per-element tables
    d2 = D.NonCentralChiSquared(df=np.array([4.0, 6.0]),
                                nc=np.array([2.0, 1.0]))
    x2 = np.array([3.0, 5.0])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        g2 = np.asarray(d2.jax_logp(jnp.asarray(x2, jnp.float64)))
    assert np.allclose(g2, d2.logp(x2), rtol=1e-4, atol=1e-5)


def test_fallback_callback_logp():
    """The pure_callback last resort survives only for cases a table
    cannot represent: vector-valued hyperparameters on a DISCRETE
    family with host-constant densities.  It must warn (it cannot run
    on TPU)."""
    dist = D.Skellam(mu1=np.array([2.0, 3.0]), mu2=np.array([1.0, 1.0]))
    xs = np.array([1.0, 2.0])
    with pytest.warns(UserWarning, match="host callback"):
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
