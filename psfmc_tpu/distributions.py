"""Prior distributions: scipy-compatible declaration API, pure-JAX log-density.

API parity with the reference (``/root/reference/psfMC/distributions.py``):
every scipy.stats distribution is exposed under the same descriptive alias
(``Uniform``, ``Normal``, ``WeibullMinimum``, ``DiscreteUniform``, ...), a
frozen instance carries ``.value`` (mutable current value, discrete ones
round to int on set), ``.logp``, ``.random``, ``.median``, ``.name`` and
``.fitsname``.

TPU-first redesign: the reference evaluates priors through scipy inside
its Python posterior.  Here each distribution *also* provides
``jax_logp(x)`` — a pure-JAX log-density with the frozen hyperparameters
baked in — so the joint prior traces into the single XLA posterior
computation (SURVEY.md section 7, step 2).  Densities are taken from
``jax.scipy.stats`` where available, hand-written for the remaining
common families, and fall back to a ``jax.pure_callback`` into scipy for
the long tail (functional everywhere, host round-trip cost only if such a
prior is actually used).

Host-side operations (``random`` for walker initialization, ``median``,
``interval`` for plot ranges) delegate to the frozen scipy object, which
is exactly what the reference does.
"""
from __future__ import annotations

import numpy as np
import scipy.stats as sps

import jax
import jax.numpy as jnp
import jax.scipy.special as jspecial
import jax.scipy.stats as jstats

# Friendly alias -> scipy.stats name (same public API surface as the
# reference's table at distributions.py:9-63).
SCIPY_DIST_NAMES = {
    "Alpha": "alpha", "Anglit": "anglit", "Arcsine": "arcsine",
    "Beta": "beta", "BetaPrime": "betaprime", "Bradford": "bradford",
    "Burr3": "burr", "Burr12": "burr12", "Cauchy": "cauchy", "Chi": "chi",
    "ChiSquared": "chi2", "Cosine": "cosine", "DoubleGamma": "dgamma",
    "DoubleWeibull": "dweibull", "Erlang": "erlang",
    "Exponential": "expon", "ExponentialNormal": "exponnorm",
    "ExponentialWeibull": "exponweib", "ExponentialPower": "exponpow",
    "F": "f", "FatigueLife": "fatiguelife", "Fisk": "fisk",
    "FoldedCauchy": "foldcauchy", "FoldedNormal": "foldnorm",
    "GeneralLogistic": "genlogistic", "GeneralNormal": "gennorm",
    "GeneralPareto": "genpareto", "GeneralExponential": "genexpon",
    "GeneralExtreme": "genextreme", "GaussHypergeometric": "gausshyper",
    "Gamma": "gamma", "GeneralGamma": "gengamma",
    "GeneralHalfLogistic": "genhalflogistic", "Gilbrat": "gibrat",
    "Gompertz": "gompertz", "GumbelRight": "gumbel_r",
    "GumbelLeft": "gumbel_l", "HalfCauchy": "halfcauchy",
    "HalfLogistic": "halflogistic", "HalfNormal": "halfnorm",
    "HalfGeneralNormal": "halfgennorm", "HyperbolicSecant": "hypsecant",
    "InverseGamma": "invgamma", "InverseGaussian": "invgauss",
    "InverseWeibull": "invweibull", "JohnsonSB": "johnsonsb",
    "JohnsonSU": "johnsonsu", "Kappa4": "kappa4", "Kappa3": "kappa3",
    "KSOneSided": "ksone", "KSTwoSided": "kstwobign", "Laplace": "laplace",
    "Levy": "levy", "LevyLeft": "levy_l", "LevyStable": "levy_stable",
    "Logistic": "logistic", "LogGamma": "loggamma",
    "LogLaplace": "loglaplace", "LogNormal": "lognorm", "Lomax": "lomax",
    "Maxwell": "maxwell", "Mielke": "mielke", "Nakagami": "nakagami",
    "NonCentralChiSquared": "ncx2", "NonCentralF": "ncf",
    "NonCentralT": "nct", "Normal": "norm", "Pareto": "pareto",
    "PearsonType3": "pearson3", "PowerLaw": "powerlaw",
    "PowerLogNormal": "powerlognorm", "PowerNormal": "powernorm",
    "RDistributed": "rdist", "Reciprocal": "loguniform",
    "Rayleigh": "rayleigh", "Rice": "rice",
    "ReciprocalInverseGaussian": "recipinvgauss",
    "Semicircular": "semicircular", "SkewNormal": "skewnorm", "T": "t",
    "Trapezoidal": "trapezoid", "Triangular": "triang",
    "TruncatedExponential": "truncexpon", "TruncatedNormal": "truncnorm",
    "TukeyLambda": "tukeylambda", "Uniform": "uniform",
    "VonMises": "vonmises", "VonMisesLine": "vonmises_line", "Wald": "wald",
    "WeibullMinimum": "weibull_min", "WeibullMaximum": "weibull_max",
    "WrappedCauchy": "wrapcauchy",
    # discrete
    "Bernoulli": "bernoulli", "Binomial": "binom", "Boltzmann": "boltzmann",
    "DiscreteLaplace": "dlaplace", "Geometric": "geom",
    "Hypergeometric": "hypergeom", "LogSeries": "logser",
    "NegativeBinomial": "nbinom", "Planck": "planck", "Poisson": "poisson",
    "DiscreteUniform": "randint", "Skellam": "skellam", "Zipf": "zipf",
}


# ---------------------------------------------------------------------------
# Pure-JAX standardized log-densities.
# Each entry: fn(z, *shapes) -> log-density of the *standardized* variable
# (continuous: z = (x - loc)/scale, caller subtracts log(scale);
#  discrete: z = k - loc).
# ---------------------------------------------------------------------------

def _lp_uniform(z):
    return jnp.where((z >= 0) & (z <= 1), 0.0, -jnp.inf)


def _lp_norm(z):
    return -0.5 * z * z - 0.5 * jnp.log(2 * jnp.pi)


def _lp_weibull_min(z, c):
    zc = jnp.maximum(z, 1e-300)
    lp = jnp.log(c) + (c - 1.0) * jnp.log(zc) - zc**c
    return jnp.where(z > 0, lp, -jnp.inf)


def _lp_weibull_max(z, c):
    return _lp_weibull_min(-z, c)


def _lp_expon(z):
    return jnp.where(z >= 0, -z, -jnp.inf)


def _lp_gamma(z, a):
    zc = jnp.maximum(z, 1e-300)
    lp = (a - 1.0) * jnp.log(zc) - zc - jspecial.gammaln(a)
    return jnp.where(z > 0, lp, -jnp.inf)


def _lp_beta(z, a, b):
    zc = jnp.clip(z, 1e-300, 1 - 1e-16)
    lp = (
        (a - 1.0) * jnp.log(zc)
        + (b - 1.0) * jnp.log1p(-zc)
        - jspecial.betaln(a, b)
    )
    return jnp.where((z > 0) & (z < 1), lp, -jnp.inf)


def _lp_lognorm(z, s):
    zc = jnp.maximum(z, 1e-300)
    lz = jnp.log(zc)
    lp = -(lz**2) / (2 * s * s) - lz - jnp.log(s) - 0.5 * jnp.log(2 * jnp.pi)
    return jnp.where(z > 0, lp, -jnp.inf)


def _lp_laplace(z):
    return -jnp.abs(z) - jnp.log(2.0)


def _lp_cauchy(z):
    return -jnp.log(jnp.pi) - jnp.log1p(z * z)


def _lp_halfnorm(z):
    lp = 0.5 * jnp.log(2 / jnp.pi) - 0.5 * z * z
    return jnp.where(z >= 0, lp, -jnp.inf)


def _lp_halfcauchy(z):
    lp = jnp.log(2 / jnp.pi) - jnp.log1p(z * z)
    return jnp.where(z >= 0, lp, -jnp.inf)


def _lp_t(z, df):
    return (
        jspecial.gammaln((df + 1) / 2)
        - jspecial.gammaln(df / 2)
        - 0.5 * jnp.log(df * jnp.pi)
        - (df + 1) / 2 * jnp.log1p(z * z / df)
    )


def _lp_chi2(z, df):
    zc = jnp.maximum(z, 1e-300)
    lp = (
        (df / 2 - 1) * jnp.log(zc)
        - zc / 2
        - (df / 2) * jnp.log(2.0)
        - jspecial.gammaln(df / 2)
    )
    return jnp.where(z > 0, lp, -jnp.inf)


def _lp_invgamma(z, a):
    zc = jnp.maximum(z, 1e-300)
    lp = -(a + 1) * jnp.log(zc) - 1.0 / zc - jspecial.gammaln(a)
    return jnp.where(z > 0, lp, -jnp.inf)


def _lp_rayleigh(z):
    zc = jnp.maximum(z, 1e-300)
    lp = jnp.log(zc) - z * z / 2
    return jnp.where(z >= 0, lp, -jnp.inf)


def _lp_pareto(z, b):
    zc = jnp.maximum(z, 1.0)
    lp = jnp.log(b) - (b + 1) * jnp.log(zc)
    return jnp.where(z >= 1, lp, -jnp.inf)


def _lp_powerlaw(z, a):
    zc = jnp.clip(z, 1e-300, 1.0)
    lp = jnp.log(a) + (a - 1) * jnp.log(zc)
    return jnp.where((z >= 0) & (z <= 1), lp, -jnp.inf)


def _lp_logistic(z):
    return -z - 2 * jnp.logaddexp(0.0, -z)


def _lp_gumbel_r(z):
    return -z - jnp.exp(-z)


def _lp_gumbel_l(z):
    return z - jnp.exp(z)


def _lp_truncnorm(z, a, b):
    lognorm_const = jnp.log(jspecial.ndtr(b) - jspecial.ndtr(a))
    lp = -0.5 * z * z - 0.5 * jnp.log(2 * jnp.pi) - lognorm_const
    return jnp.where((z >= a) & (z <= b), lp, -jnp.inf)


def _lp_truncexpon(z, b):
    lp = -z - jnp.log(-jnp.expm1(-b))
    return jnp.where((z >= 0) & (z <= b), lp, -jnp.inf)


def _lp_vonmises(z, kappa):
    log_i0 = jnp.log(jspecial.i0e(kappa)) + kappa
    return kappa * jnp.cos(z) - jnp.log(2 * jnp.pi) - log_i0


def _lp_arcsine(z):
    zc = jnp.clip(z, 1e-300, 1 - 1e-16)
    lp = -jnp.log(jnp.pi) - 0.5 * jnp.log(zc * (1 - zc))
    return jnp.where((z > 0) & (z < 1), lp, -jnp.inf)


def _lp_triang(z, c):
    up = jnp.log(2.0) + jnp.log(jnp.maximum(z, 1e-300)) - jnp.log(jnp.maximum(c, 1e-300))
    down = (
        jnp.log(2.0)
        + jnp.log(jnp.maximum(1 - z, 1e-300))
        - jnp.log(jnp.maximum(1 - c, 1e-300))
    )
    lp = jnp.where(z < c, up, down)
    return jnp.where((z >= 0) & (z <= 1), lp, -jnp.inf)


def _lp_loguniform(z, a, b):
    zc = jnp.maximum(z, 1e-300)
    lp = -jnp.log(zc) - jnp.log(jnp.log(b) - jnp.log(a))
    return jnp.where((z >= a) & (z <= b), lp, -jnp.inf)


def _lp_maxwell(z):
    zc = jnp.maximum(z, 1e-300)
    lp = jnp.log(jnp.sqrt(2 / jnp.pi)) + 2 * jnp.log(zc) - z * z / 2
    return jnp.where(z >= 0, lp, -jnp.inf)


def _lp_wald(z):
    zc = jnp.maximum(z, 1e-300)
    lp = -0.5 * jnp.log(2 * jnp.pi * zc**3) - (zc - 1) ** 2 / (2 * zc)
    return jnp.where(z > 0, lp, -jnp.inf)


# Discrete (z = k - loc already applied by the caller)
def _lp_randint(z, low, high):
    k = jnp.round(z)
    lp = -jnp.log(high - low)
    return jnp.where((k >= low) & (k <= high - 1), lp, -jnp.inf)


def _lp_poisson(z, mu):
    k = jnp.round(z)
    lp = k * jnp.log(mu) - mu - jspecial.gammaln(k + 1)
    return jnp.where(k >= 0, lp, -jnp.inf)


def _lp_bernoulli(z, p):
    k = jnp.round(z)
    lp = jnp.where(k == 1, jnp.log(p), jnp.log1p(-p))
    return jnp.where((k == 0) | (k == 1), lp, -jnp.inf)


def _lp_binom(z, n, p):
    k = jnp.round(z)
    lp = (
        jspecial.gammaln(n + 1)
        - jspecial.gammaln(k + 1)
        - jspecial.gammaln(n - k + 1)
        + k * jnp.log(p)
        + (n - k) * jnp.log1p(-p)
    )
    return jnp.where((k >= 0) & (k <= n), lp, -jnp.inf)


def _lp_geom(z, p):
    k = jnp.round(z)
    lp = (k - 1) * jnp.log1p(-p) + jnp.log(p)
    return jnp.where(k >= 1, lp, -jnp.inf)


def _lp_nbinom(z, n, p):
    k = jnp.round(z)
    lp = (
        jspecial.gammaln(k + n)
        - jspecial.gammaln(k + 1)
        - jspecial.gammaln(n)
        + n * jnp.log(p)
        + k * jnp.log1p(-p)
    )
    return jnp.where(k >= 0, lp, -jnp.inf)


_JAX_STD_LOGP = {
    "uniform": _lp_uniform,
    "norm": _lp_norm,
    "weibull_min": _lp_weibull_min,
    "weibull_max": _lp_weibull_max,
    "expon": _lp_expon,
    "gamma": _lp_gamma,
    "erlang": _lp_gamma,
    "beta": _lp_beta,
    "lognorm": _lp_lognorm,
    "laplace": _lp_laplace,
    "cauchy": _lp_cauchy,
    "halfnorm": _lp_halfnorm,
    "halfcauchy": _lp_halfcauchy,
    "t": _lp_t,
    "chi2": _lp_chi2,
    "invgamma": _lp_invgamma,
    "rayleigh": _lp_rayleigh,
    "pareto": _lp_pareto,
    "powerlaw": _lp_powerlaw,
    "logistic": _lp_logistic,
    "gumbel_r": _lp_gumbel_r,
    "gumbel_l": _lp_gumbel_l,
    "truncnorm": _lp_truncnorm,
    "truncexpon": _lp_truncexpon,
    "vonmises": _lp_vonmises,
    "vonmises_line": _lp_vonmises,
    "arcsine": _lp_arcsine,
    "triang": _lp_triang,
    "loguniform": _lp_loguniform,
    "maxwell": _lp_maxwell,
    "wald": _lp_wald,
    "randint": _lp_randint,
    "poisson": _lp_poisson,
    "bernoulli": _lp_bernoulli,
    "binom": _lp_binom,
    "geom": _lp_geom,
    "nbinom": _lp_nbinom,
}


class Distribution:
    """Base prior distribution wrapping a frozen scipy rv.

    Subclasses are generated per scipy.stats family (see module docstring).
    """

    scipy_name: str = ""

    def __init__(self, *args, **kwargs):
        cls = type(self)
        self.rv_class = getattr(sps, cls.scipy_name)
        self.rv_frozen = self.rv_class(*args, **kwargs)
        self.is_discrete = isinstance(self.rv_frozen.dist, sps.rv_discrete)
        if not self.is_discrete and not isinstance(
            self.rv_frozen.dist, sps.rv_continuous
        ):
            raise TypeError(
                "Only rv_continuous and rv_discrete distributions are supported"
            )

        # Frozen hyperparameters for the pure-JAX density.
        parsed = self.rv_frozen.dist._parse_args(
            *self.rv_frozen.args, **self.rv_frozen.kwds
        )
        if self.is_discrete:
            shapes, loc = parsed[0], parsed[1]
            scale = 1.0
        else:
            shapes, loc, scale = parsed
        self._shapes = tuple(np.asarray(s, dtype=np.float64) for s in shapes)
        self._loc = np.asarray(loc, dtype=np.float64)
        self._scale = np.asarray(scale, dtype=np.float64)

        self.name = ""
        self.fitsname = ""
        self._value = self.random()

    # -- host-side (init, plotting) ------------------------------------
    def random(self, random_state=None):
        return self.rv_frozen.rvs(random_state=random_state)

    def median(self):
        return self.rv_frozen.median()

    def interval(self, confidence):
        return self.rv_frozen.interval(confidence)

    def logp(self, x):
        """Host-side log-density (scipy), matching the reference exactly."""
        if self.is_discrete:
            return self.rv_frozen.logpmf(np.rint(np.asarray(x)))
        return self.rv_frozen.logpdf(x)

    # -- device-side (jitted posterior) ---------------------------------
    def jax_logp(self, x):
        """Pure-JAX log-density with frozen hyperparameters baked in."""
        fn = _JAX_STD_LOGP.get(type(self).scipy_name)
        x = jnp.asarray(x)
        if fn is not None:
            if self.is_discrete:
                z = x - self._loc
                return fn(z, *self._shapes)
            z = (x - self._loc) / self._scale
            return fn(z, *self._shapes) - jnp.log(self._scale)
        # Long-tail fallback: host callback into scipy (slow but complete).
        def _cb(xv):
            return np.asarray(self.logp(xv), dtype=np.float64).astype(
                xv.dtype
            )

        return jax.pure_callback(
            _cb,
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            x,
            vmap_method="expand_dims",
        )

    # -- mutable current value (reference semantics) ---------------------
    def get_value(self):
        return self._value

    def set_value(self, val):
        if self.is_discrete:
            new_val = np.rint(val).astype(int)
        else:
            new_val = val
        arr = np.asarray(new_val)
        self._value = arr.item() if arr.size == 1 else arr

    value = property(fget=get_value, fset=set_value)

    def __repr__(self):
        return (
            f"{type(self).__name__}(args={self.rv_frozen.args}, "
            f"kwds={self.rv_frozen.kwds})"
        )


def _make_dist_class(alias, scipy_name):
    if not hasattr(sps, scipy_name):
        return None
    cls = type(
        alias,
        (Distribution,),
        {
            "scipy_name": scipy_name,
            "__doc__": f"{alias} prior (scipy.stats.{scipy_name}).",
        },
    )
    return cls


__all__ = ["Distribution"]
for _alias, _scipy_name in SCIPY_DIST_NAMES.items():
    _cls = _make_dist_class(_alias, _scipy_name)
    if _cls is not None:
        globals()[_alias] = _cls
        __all__.append(_alias)
