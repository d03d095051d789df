"""Hierarchical (population-level) inference over a target catalog.

The reference's production endgame — measuring POPULATION properties
(host-galaxy size/luminosity distributions, quasar/host flux ratios) —
is done there by fitting targets one at a time and histogramming the
point estimates, which both ignores the per-target uncertainties and
cannot shrink poorly-constrained targets toward the population.  Here
the whole catalog is ONE posterior:

    ln P(theta_1..theta_K, phi | data)
        = sum_k ln L_k(theta_k)                 (vmapped renders)
        + sum_k ln pi_base(theta_k)             (non-governed priors)
        + sum_k sum_j ln p_pop(theta_k[j] | phi) (population densities)
        + ln p(phi)                             (hyper priors)

sampled jointly with NUTS over the K*d + h dimensional space (the
ensemble sampler is available for small K).  TPU-first: the K
per-target likelihoods are a single ``vmap`` over a stacked
observation axis — one compiled program evaluates the entire catalog's
gradient per leapfrog step — exactly the axis :mod:`psfmc_tpu.batchfit`
already shards.

Usage::

    from psfmc_tpu.hierarchy import NormalPopulation, fit_hierarchical

    pop = {"1_Sersic_index": NormalPopulation(
        mu=Uniform(loc=0.5, scale=5.0),
        sigma=Uniform(loc=0.05, scale=3.0))}
    res = fit_hierarchical(model, obs_stack, ivm_stack, population=pop,
                           chains=4, burn=500, iterations=500)
    print(res.summary())     # hyper posterior + shrunken targets

Semantics notes:

* A governed parameter KEEPS its original prior's support as a hard
  truncation (the population density applies inside it).  This keeps
  the NUTS bound-transforms exact and protects renderer domains
  (e.g. a population on a Sersic index can never push a target to
  index <= 0); choose the template prior's support generously.
* ``parametrization='noncentered'`` samples the standardized residual
  ``eta_k`` instead of ``theta_k`` (``theta_k = reconstruct(eta_k,
  phi)``, e.g. ``mu + sigma * eta_k``).  Because eta's prior scale no
  longer depends on sigma, the small-sigma funnel that produces
  divergent NUTS trajectories in the centered form disappears — use it
  whenever the population width is data-limited (sigma posterior
  reaching down to ~the per-target measurement error).  Trade-off: the
  original-prior truncation becomes a hard wall in a moving location
  (the bound-transform can no longer encode it), so trajectories that
  cross the template support edge diverge — keep that support
  generous.  Results (``target_mean``/``flatchain``) are always
  reported in the CONSTRAINED theta space regardless of
  parametrization.
* multiple PSFs: the discrete PSF index is MARGINALIZED per target
  (the joint marginal over K index slots factorizes because lnL sums
  over targets — one logsumexp over the PSF stack inside the vmapped
  per-target likelihood, cost ~num_psfs x), exactly like the regular
  NUTS sampler (sampler/nuts.py).  The reported chain's index columns
  are Gibbs-sampled back per retained draw from the exact conditional.
  Governing the index itself is rejected.
* multi-band: a :class:`psfmc_tpu.models.JointModel` template works
  directly (one obs/ivm stack per band, like
  :func:`psfmc_tpu.batchfit.fit_batch`): per-target lnL sums the band
  likelihoods against the GLOBAL slot layout (``Tied`` shares
  structure), the slot prior + all band constraints evaluate once via
  the joint comp_specs, and any band's stochastic PSF index
  marginalizes independently.
* survey mode: ``psf_stack=`` gives every target its own PSF star(s)
  (same preprocessing as the template PSF — see
  :func:`psfmc_tpu.batchfit.prepare_psf_stack`); the spectra ride the
  per-target stacks into the vmapped likelihood and the stochastic
  index gathers into them exactly as into the baked constants.
* v1 scope: scalar governed slots.  The target axis is fully
  data-parallel; ``shard='targets'`` rides it over a mesh following
  the batchfit pattern.
"""
from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "NormalPopulation",
    "LogNormalPopulation",
    "StudentTPopulation",
    "RegressionPopulation",
    "HierarchicalResult",
    "fit_hierarchical",
    "target_loglike",
    "loo_targets",
]

_LOG_2PI = float(np.log(2.0 * np.pi))


class _LocScalePopulation:
    """Shared plumbing for two-hyperparameter (mu, sigma) populations.

    Subclasses define the centered density :meth:`jax_logp` and — when
    a non-centered form exists — :meth:`reconstruct` (theta from the
    standardized residual eta) + :meth:`eta_logp` / :meth:`eta_random`
    (the phi-independent residual density / sampler).
    """

    hyper_names = ("mu", "sigma")
    #: index into hyper_dists of the scale hyperparameter — its prior
    #: must have nonnegative support under the non-centered form (a
    #: negative sigma would make reconstruct() two-to-one).
    scale_hyper_index = 1

    def __init__(self, mu, sigma):
        for name, d in (("mu", mu), ("sigma", sigma)):
            if not hasattr(d, "jax_logp"):
                raise TypeError(
                    f"{type(self).__name__} {name}= must be a prior "
                    f"distribution, got {type(d).__name__}"
                )
        self.mu = mu
        self.sigma = sigma

    @property
    def hyper_dists(self):
        return (self.mu, self.sigma)


class NormalPopulation(_LocScalePopulation):
    """Gaussian population: governed values ~ N(mu, sigma) (truncated
    to the governed parameter's original prior support).

    ``mu`` and ``sigma`` are prior :class:`~psfmc_tpu.distributions.
    Distribution` objects over the two hyperparameters; ``sigma``'s
    prior should have positive support (a device-side guard rejects
    sigma <= 0 regardless).
    """

    def jax_logp(self, x, phi):
        """Population log-density of governed values x (K,) given
        phi = (mu, sigma).  -inf when sigma <= 0."""
        mu, sigma = phi[0], phi[1]
        safe = jnp.where(sigma > 0, sigma, 1.0)
        lp = jnp.sum(
            -0.5 * ((x - mu) / safe) ** 2
            - jnp.log(safe)
            - 0.5 * _LOG_2PI
        )
        return jnp.where(sigma > 0, lp, -jnp.inf)

    # -- non-centered form: theta = mu + sigma * eta, eta ~ N(0, 1) --
    def reconstruct(self, eta, phi):
        return phi[0] + phi[1] * eta

    def eta_logp(self, eta):
        return jnp.sum(-0.5 * eta**2 - 0.5 * _LOG_2PI)

    def eta_random(self, random_state, size):
        return random_state.standard_normal(size)


class LogNormalPopulation(_LocScalePopulation):
    """Log-normal population: ln(theta) ~ N(mu, sigma), theta > 0.

    The natural choice for positive, multiplicatively-scattered
    parameters (effective radii, fluxes): the population is skewed in
    theta but the hyperparameters live on the symmetric log scale.
    Values <= 0 get density -inf (the governed parameter's own prior
    support should already be positive).
    """

    def jax_logp(self, x, phi):
        mu, sigma = phi[0], phi[1]
        safe = jnp.where(sigma > 0, sigma, 1.0)
        ok = jnp.all(x > 0) & (sigma > 0)
        xs = jnp.where(x > 0, x, 1.0)
        lx = jnp.log(xs)
        lp = jnp.sum(
            -0.5 * ((lx - mu) / safe) ** 2
            - jnp.log(safe)
            - lx
            - 0.5 * _LOG_2PI
        )
        return jnp.where(ok, lp, -jnp.inf)

    # -- non-centered form: theta = exp(mu + sigma * eta) --
    def reconstruct(self, eta, phi, xp=jnp):
        # xp=np gives predict_population a pure-host path (no JAX
        # backend init from an analysis process, f64 preserved); the
        # traced posterior uses the jnp default — one implementation
        return xp.exp(phi[0] + phi[1] * eta)

    def eta_logp(self, eta):
        return jnp.sum(-0.5 * eta**2 - 0.5 * _LOG_2PI)

    def eta_random(self, random_state, size):
        return random_state.standard_normal(size)


class StudentTPopulation(_LocScalePopulation):
    """Student-t population: (theta - mu)/sigma ~ t(df), df static.

    Robust to outlier targets — a catalog contaminated by a few
    misclassified or badly-fit objects drags a Gaussian population's
    (mu, sigma) while the t population downweights them (same logic as
    ``Configuration(likelihood='student')`` at the pixel level).
    """

    def __init__(self, mu, sigma, df=4.0):
        super().__init__(mu, sigma)
        df = float(df)
        if not df > 0:
            raise ValueError(f"df must be positive, got {df}")
        self.df = df
        from scipy.special import gammaln

        # host-folded normalization (df is static)
        self._lognorm = float(
            gammaln((df + 1.0) / 2.0)
            - gammaln(df / 2.0)
            - 0.5 * np.log(df * np.pi)
        )

    def jax_logp(self, x, phi):
        mu, sigma = phi[0], phi[1]
        safe = jnp.where(sigma > 0, sigma, 1.0)
        t = (x - mu) / safe
        lp = jnp.sum(
            self._lognorm
            - 0.5 * (self.df + 1.0) * jnp.log1p(t * t / self.df)
            - jnp.log(safe)
        )
        return jnp.where(sigma > 0, lp, -jnp.inf)

    # -- non-centered form: theta = mu + sigma * eta, eta ~ t(df) --
    def reconstruct(self, eta, phi):
        return phi[0] + phi[1] * eta

    def eta_logp(self, eta):
        return jnp.sum(
            self._lognorm
            - 0.5 * (self.df + 1.0) * jnp.log1p(eta * eta / self.df)
        )

    def eta_random(self, random_state, size):
        return random_state.standard_t(self.df, size)


class RegressionPopulation:
    """Scaling-relation population: y ~ N(alpha + beta*(x - x0), sigma).

    The hierarchical regression of one per-target parameter on another
    — size-luminosity relations, fundamental-plane style fits — run
    through the full pixel likelihood: ``fit_hierarchical(model, obs,
    ivm, population={'1_Sersic_reff': RegressionPopulation(
    covariate='1_Sersic_mag', alpha=..., beta=..., sigma=...,
    x0=20.5)})`` infers (alpha, beta, sigma) jointly with every
    target's parameters, so measurement error in BOTH axes is handled
    exactly (the classic regression-dilution bias of fitting a line to
    point estimates disappears — each target's x_k and y_k are sampled,
    not plugged in).

    ``covariate`` names another per-target SCALAR slot: its own
    template prior stays in force (the regression is the conditional
    density y | x).  The covariate may itself be governed by another
    population — list it EARLIER in the ``population`` dict (its
    constrained value feeds this density).  ``x0`` is a fixed pivot
    (choose ~the sample midpoint: decorrelates alpha and beta).
    ``alpha``/``beta``/``sigma`` are prior distributions over the
    hyperparameters; sigma's prior needs positive support.

    Non-centered form: y = alpha + beta*(x - x0) + sigma*eta with
    eta ~ N(0,1) — same funnel cure as the location families.
    """

    hyper_names = ("alpha", "beta", "sigma")
    scale_hyper_index = 2

    def __init__(self, covariate, alpha, beta, sigma, x0=0.0):
        if not isinstance(covariate, str):
            raise TypeError(
                "covariate must name a per-target parameter slot, "
                f"got {type(covariate).__name__}"
            )
        for name, dd in (("alpha", alpha), ("beta", beta),
                         ("sigma", sigma)):
            if not hasattr(dd, "jax_logp"):
                raise TypeError(
                    f"RegressionPopulation {name}= must be a prior "
                    f"distribution, got {type(dd).__name__}"
                )
        self.covariate = covariate
        self.alpha = alpha
        self.beta = beta
        self.sigma = sigma
        self.x0 = float(x0)

    @property
    def hyper_dists(self):
        return (self.alpha, self.beta, self.sigma)

    def jax_logp(self, y, phi, x):
        """Conditional log-density of y (K,) given phi = (alpha, beta,
        sigma) and covariate values x (K,).  -inf when sigma <= 0."""
        alpha, beta, sigma = phi[0], phi[1], phi[2]
        safe = jnp.where(sigma > 0, sigma, 1.0)
        r = (y - alpha - beta * (x - self.x0)) / safe
        lp = jnp.sum(-0.5 * r * r - jnp.log(safe) - 0.5 * _LOG_2PI)
        return jnp.where(sigma > 0, lp, -jnp.inf)

    # -- non-centered form ------------------------------------------------
    def reconstruct(self, eta, phi, x, xp=jnp):
        return phi[0] + phi[1] * (x - self.x0) + phi[2] * eta

    def eta_logp(self, eta):
        return jnp.sum(-0.5 * eta**2 - 0.5 * _LOG_2PI)

    def eta_random(self, random_state, size):
        return random_state.standard_normal(size)


# -- population persistence (round-3 verdict item 6) ---------------------
# predict_population after load_hierarchical_result needs the family's
# STATIC structure (class + covariate/x0/df), not its hyper priors (the
# hyper posterior rides hyper_chain).  Loaded families carry placeholder
# hyper priors and are flagged — fit_hierarchical refuses them.
_POP_FAMILIES = {}


def _register_population(cls):
    _POP_FAMILIES[cls.__name__] = cls
    return cls


for _cls in (NormalPopulation, LogNormalPopulation, StudentTPopulation,
             RegressionPopulation):
    _register_population(_cls)


def _pop_static_spec(pop):
    """(family_name, {static kwargs}) for a population family, or
    (None, reason) when the family is custom/unregistered."""
    name = type(pop).__name__
    if name not in _POP_FAMILIES:
        return None, (
            f"{name} is not a built-in population family — its spec "
            "is not persisted; pass populations= after loading"
        )
    extra = {}
    if isinstance(pop, StudentTPopulation):
        extra["df"] = float(pop.df)
    if isinstance(pop, RegressionPopulation):
        extra["covariate"] = str(pop.covariate)
        extra["x0"] = float(pop.x0)
    return name, extra


def _pop_from_spec(name, extra):
    """Predict-only family instance from a persisted spec."""
    from . import distributions as D

    cls = _POP_FAMILIES[name]
    # placeholder hyper priors: predict_population never evaluates
    # them (draws come from hyper_chain rows); sigma's placeholder has
    # positive support to satisfy constructor conventions
    loc = D.Normal(loc=0.0, scale=1.0)
    scale = D.Uniform(loc=0.0, scale=1.0)
    if cls is RegressionPopulation:
        pop = cls(
            covariate=extra["covariate"],
            alpha=loc, beta=D.Normal(loc=0.0, scale=1.0), sigma=scale,
            x0=float(extra.get("x0", 0.0)),
        )
    elif cls is StudentTPopulation:
        pop = cls(mu=loc, sigma=scale, df=float(extra.get("df", 4.0)))
    else:
        pop = cls(mu=loc, sigma=scale)
    pop._hyper_priors_placeholder = True
    return pop


@dataclass
class HierarchicalResult:
    """Posterior of a hierarchical catalog fit.

    ``target_mean``/``target_std`` are per-target marginal moments of
    the SHRUNKEN posteriors; ``hyper_chain`` is the flattened hyper
    posterior sample.
    """

    param_names: List[str]  # per-target slot names (d entries)
    hyper_names: List[str]  # e.g. '1_Sersic_index:mu'
    num_targets: int
    target_mean: np.ndarray  # (K, d)
    target_std: np.ndarray  # (K, d)
    hyper_chain: np.ndarray  # (S, h)
    governed: List[str] = field(default_factory=list)
    diagnostics: Dict[str, float] = field(default_factory=dict)
    flatchain: Optional[np.ndarray] = None  # (S, K*d + h)
    #: (S,) retained-draw log-posterior — lets target_loglike drop
    #: burn-in leakage rows (robust lnp floor) before the PSIS replay
    lnp: Optional[np.ndarray] = None
    #: population family objects keyed by governed name (attached by
    #: fit_hierarchical; built-in families persist their STATIC spec
    #: through save()/load_hierarchical_result — loaded instances are
    #: predict-only, with placeholder hyper priors)
    populations: Optional[Dict[str, object]] = None
    #: (lo, hi) template-prior truncation per governed name (attached
    #: by fit_hierarchical; persisted through save()/load)
    governed_bounds: Optional[Dict[str, tuple]] = None

    @property
    def hyper_mean(self) -> np.ndarray:
        return self.hyper_chain.mean(axis=0)

    @property
    def hyper_std(self) -> np.ndarray:
        return self.hyper_chain.std(axis=0)

    def summary(self) -> str:
        lines = [
            f"hierarchical fit: {self.num_targets} targets, "
            f"population on {self.governed}"
        ]
        m, s = self.hyper_mean, self.hyper_std
        for i, name in enumerate(self.hyper_names):
            lines.append(f"  {name:<28s} {m[i]:10.4g} +/- {s[i]:.4g}")
        for k, v in self.diagnostics.items():
            lines.append(f"  {k}: {v:.4g}")
        return "\n".join(lines)

    def predict_population(self, n=4000, seed=0, populations=None,
                           bounds=None, max_tries=1000,
                           covariates=None):
        """Posterior-predictive draws of a NEW target's governed values.

        For each draw, a hyper-posterior row ``phi_s`` is picked (with
        replacement) and ``theta_new ~ p(theta | phi_s)`` is drawn from
        the population family, rejection-truncated to the governed
        template prior's support exactly like the fit's density (module
        docstring: hard truncation, renormalized implicitly by the
        rejection).  This is the inferred POPULATION distribution with
        hyperparameter uncertainty folded in — e.g. the scatter of
        Sersic indices a new catalog member would be drawn from — and
        is wider than plugging in ``hyper_mean``.

        ``populations``/``bounds`` (dicts keyed by governed name)
        default to the objects :func:`fit_hierarchical` attached; after
        :func:`load_hierarchical_result` they are gone — pass the same
        ``population=`` families again (bounds omitted means
        unbounded).  Returns ``{governed_name: (n,) draws}``.

        A :class:`RegressionPopulation` is a CONDITIONAL density —
        pass ``covariates={governed_name: x}`` (scalar, or (n,) array)
        naming where on the relation to predict; e.g. the credible
        band of the size-luminosity relation at ``mag=21``.
        """
        pops = populations if populations is not None else self.populations
        if pops is None:
            raise ValueError(
                "no population families on this result (loaded from "
                "disk?) — pass populations={name: family} matching the "
                "fit's population= argument"
            )
        if bounds is None:
            bounds = self.governed_bounds or {}
        rng = np.random.RandomState(seed)
        s_total = self.hyper_chain.shape[0]
        hyper_index = {nm: j for j, nm in enumerate(self.hyper_names)}
        out = {}
        for name in self.governed:
            pop = pops.get(name)
            if pop is None:
                raise ValueError(f"populations is missing {name!r}")
            if not (hasattr(pop, "reconstruct")
                    and hasattr(pop, "eta_random")):
                raise TypeError(
                    f"{type(pop).__name__} defines no sampler "
                    "(reconstruct/eta_random) — cannot draw "
                    "predictive values"
                )
            cols = [hyper_index[f"{name}:{h}"] for h in pop.hyper_names]
            rows = rng.randint(0, s_total, size=n)
            phi = tuple(
                np.asarray(self.hyper_chain[rows, c], np.float64)
                for c in cols
            )
            lo, hi = bounds.get(name, (-np.inf, np.inf))
            xv = None
            if getattr(pop, "covariate", None) is not None:
                if covariates is None or name not in covariates:
                    raise ValueError(
                        f"{type(pop).__name__} on {name!r} is a "
                        "conditional density — pass covariates="
                        f"{{{name!r}: x}} (the {pop.covariate!r} "
                        "value(s) to predict at)"
                    )
                xv = np.broadcast_to(
                    np.asarray(covariates[name], np.float64), (n,)
                )

            # host path: xp=np where the family supports it keeps this
            # pure numpy (no JAX backend init from a fresh analysis
            # process — the axon backend hangs outside
            # Python-forced-CPU contexts — and f64 throughout).
            # Signature inspection, NOT try/except TypeError: a real
            # TypeError inside a custom family's reconstruct must
            # surface, not silently re-run the jnp path.
            try:
                _rparams = inspect.signature(
                    pop.reconstruct
                ).parameters
                _has_xp = "xp" in _rparams or any(
                    p.kind is inspect.Parameter.VAR_KEYWORD
                    for p in _rparams.values()
                )
            except (TypeError, ValueError):  # builtins/C callables
                _has_xp = False

            def _draw(m, phi_m, x_m):
                # np.array copies (a JAX fallback returns a read-only
                # view and the rejection loop writes in place)
                eta = pop.eta_random(rng, m)
                args = (eta, phi_m) if x_m is None else (eta, phi_m,
                                                         x_m)
                if _has_xp:
                    v = pop.reconstruct(*args, xp=np)
                else:
                    v = pop.reconstruct(*args)
                return np.array(v, np.float64)

            x = _draw(n, phi, xv)
            bad = ~((x > lo) & (x < hi) & np.isfinite(x))
            tries = 0
            while bad.any():
                tries += 1
                if tries > max_tries:
                    raise RuntimeError(
                        f"predict_population: {int(bad.sum())}/{n} "
                        f"draws of {name!r} still outside "
                        f"({lo}, {hi}) after {max_tries} rejection "
                        "rounds — the population mass barely "
                        "overlaps the template support"
                    )
                x[bad] = _draw(
                    int(bad.sum()),
                    tuple(p[bad] for p in phi),
                    None if xv is None else xv[bad],
                )
                bad = ~((x > lo) & (x < hi) & np.isfinite(x))
            out[name] = x
        return out

    def save(self, db_name, meta=None):
        """Write the hierarchical trace as a FITS database.

        One TRACE bintable (same extension name as the regular trace
        database, so ``plot_chain``/``corner_plot`` work on it by
        column name): per-target columns ``T{t}_<slot>`` in layout
        order, then the hyper columns under their ``<param>:<hyper>``
        names.  Governed names ride one ``GOVERN{i}`` card each
        (a joined CSV would silently truncate at the 68-char FITS
        card limit — the checkpoint nswap lesson).
        """
        from collections import OrderedDict

        from .database import annotate_metadata
        from .io.table import Table
        from .parallel.multihost import barrier, is_primary

        if self.flatchain is None:
            raise ValueError(
                "no flatchain on this result — nothing to save"
            )
        k, d = self.num_targets, len(self.param_names)
        cols = OrderedDict()
        for t in range(k):
            for j, nm in enumerate(self.param_names):
                cols[f"T{t}_{nm}"] = self.flatchain[:, t * d + j]
        for j, nm in enumerate(self.hyper_names):
            cols[nm] = self.flatchain[:, k * d + j]
        if self.lnp is not None:
            # same column name as the regular trace database; load
            # special-cases it so it never reads as a hyper column
            cols["lnprobability"] = np.asarray(self.lnp, np.float64)
        m = OrderedDict(meta or {})
        m["MCHIER"] = (1, "hierarchical population fit")
        m["NTARGETS"] = (k, "targets in the joint posterior")
        for i, g in enumerate(self.governed):
            m[f"GOVERN{i}"] = (g, "population-governed parameter")
            pop = (self.populations or {}).get(g)
            if pop is not None:
                fam, extra = _pop_static_spec(pop)
                if fam is None:
                    from warnings import warn

                    warn(extra)
                else:
                    m[f"POPFAM{i}"] = (fam, "population family")
                    if "df" in extra:
                        m[f"POPDF{i}"] = (extra["df"], "population df")
                    if "covariate" in extra:
                        m[f"POPCOV{i}"] = (
                            extra["covariate"], "regression covariate"
                        )
                    if "x0" in extra:
                        m[f"POPX0{i}"] = (extra["x0"], "regression pivot")
            lo, hi = (self.governed_bounds or {}).get(
                g, (-np.inf, np.inf)
            )
            # non-finite bounds are simply absent (FITS float cards)
            if np.isfinite(lo):
                m[f"GBLO{i}"] = (float(lo), "governed support lo")
            if np.isfinite(hi):
                m[f"GBHI{i}"] = (float(hi), "governed support hi")
        if "divergences" in self.diagnostics:
            m["MCNDIV"] = (
                float(self.diagnostics["divergences"]),
                "divergent NUTS trajectories",
            )
        if "mean_accept" in self.diagnostics:
            m["MCACCEPT"] = (
                float(self.diagnostics["mean_accept"]),
                "mean acceptance",
            )
        tbl = Table(cols, meta=annotate_metadata(m))
        if is_primary():
            tbl.write(db_name, format="fits", extname="TRACE")
        barrier("save_hierarchical")
        return tbl


def load_hierarchical_result(db_name):
    """Rebuild a :class:`HierarchicalResult` from ``save()`` output."""
    import re

    from .io.table import Table

    tbl = Table.read(db_name, extname="TRACE")
    meta = tbl.meta
    if not meta.get("MCHIER"):
        raise ValueError(
            f"{db_name!r} is not a hierarchical trace database"
        )
    k = int(meta["NTARGETS"])
    governed = []
    for i in range(len(meta)):
        key = f"GOVERN{i}"
        if key not in meta:
            break
        governed.append(meta[key])
    names, hyper_names = [], []
    per_cols, hyper_cols = [], []
    pat = re.compile(r"^T(\d+)_(.+)$")
    for cname in tbl.colnames:
        mm = pat.match(cname)
        if mm:
            if int(mm.group(1)) == 0:
                names.append(mm.group(2))
            per_cols.append(cname)
        elif cname != "lnprobability":
            hyper_names.append(cname)
            hyper_cols.append(cname)
    d = len(names)
    n = len(tbl[per_cols[0]])
    flat = np.empty((n, k * d + len(hyper_cols)), np.float64)
    for t in range(k):
        for j, nm in enumerate(names):
            flat[:, t * d + j] = np.asarray(tbl[f"T{t}_{nm}"])
    for j, cname in enumerate(hyper_cols):
        flat[:, k * d + j] = np.asarray(tbl[cname])
    per = flat[:, : k * d].reshape(n, k, d)
    diags = {}
    if "MCNDIV" in meta:
        diags["divergences"] = float(meta["MCNDIV"])
    if "MCACCEPT" in meta:
        diags["mean_accept"] = float(meta["MCACCEPT"])
    lnp = None
    if "lnprobability" in tbl.colnames:
        lnp = np.asarray(tbl["lnprobability"], np.float64)
    pops, bounds = {}, {}
    for i, g in enumerate(governed):
        fam = meta.get(f"POPFAM{i}")
        if fam:
            extra = {}
            if f"POPDF{i}" in meta:
                extra["df"] = float(meta[f"POPDF{i}"])
            if f"POPCOV{i}" in meta:
                extra["covariate"] = str(meta[f"POPCOV{i}"])
            if f"POPX0{i}" in meta:
                extra["x0"] = float(meta[f"POPX0{i}"])
            pops[g] = _pop_from_spec(fam, extra)
        lo = float(meta.get(f"GBLO{i}", -np.inf))
        hi = float(meta.get(f"GBHI{i}", np.inf))
        bounds[g] = (lo, hi)
    return HierarchicalResult(
        param_names=names,
        hyper_names=hyper_names,
        num_targets=k,
        target_mean=per.mean(axis=0),
        target_std=per.std(axis=0),
        hyper_chain=flat[:, k * d :],
        governed=governed,
        diagnostics=diags,
        flatchain=flat,
        lnp=lnp,
        populations=pops or None,
        governed_bounds=bounds or None,
    )


def target_loglike(model, obs_stack, ivm_stack, result,
                   max_samples=1000, chunk=256, seed=0,
                   psf_stack=None, psfivm_stack=None, psf_oversample=1):
    """(S, K) per-target log-likelihood replay at the retained draws.

    The data term of target k at each retained draw's theta_k — bands
    summed, discrete PSF indices marginalized INCLUDING the uniform
    1/num_psfs mixture weight (so rows are proper per-target
    log-densities; the constant cancels between models with the same
    PSF stack).  The pointwise unit here is a TARGET, not a pixel —
    feed the matrix to :func:`psfmc_tpu.analysis.psis_loo` /
    ``waic(loglike=..., unit='targets')`` via :func:`loo_targets`.

    Rows below the robust lnp floor (burn-in leakage from
    late-converging chains — see
    :func:`psfmc_tpu.analysis.model_comparison.robust_lnp_keep`) are
    dropped first when the result carries ``lnp``; per-target density
    variances have the same zero tolerance for descent rows the
    pixel-level criticism replay measured.
    """
    from .analysis.model_comparison import robust_lnp_keep
    from .models.multicomponent import as_model

    model = as_model(model)
    fns = model.posterior_fns
    spec = model.spec
    d = spec.num_params
    bands, k = _build_bands(
        fns, spec, obs_stack, ivm_stack,
        psf_stack=psf_stack, psfivm_stack=psfivm_stack,
        psf_oversample=psf_oversample,
    )
    if isinstance(result, HierarchicalResult):
        flat = result.flatchain
        if flat is None:
            raise ValueError(
                "result has no flatchain — nothing to replay"
            )
        if result.lnp is not None and len(result.lnp) == len(flat):
            keep = robust_lnp_keep(result.lnp)
            if not keep.all():
                flat = flat[keep]
    else:
        flat = np.asarray(result, np.float64)
        if flat.ndim != 2:
            raise ValueError(
                "result must be a HierarchicalResult or an "
                "(S, K*d [+ h]) draw matrix"
            )
    if flat.shape[1] < k * d:
        raise ValueError(
            f"flatchain has {flat.shape[1]} columns — expected at "
            f"least K*d = {k * d} for {k} targets x {d} params"
        )
    per = np.asarray(flat[:, : k * d], np.float64).reshape(-1, k, d)
    n = per.shape[0]
    if n > max_samples:
        rows = np.random.RandomState(seed).choice(
            n, max_samples, replace=False
        )
        per = per[np.sort(rows)]
        n = per.shape[0]

    # the replay program takes the obs stacks as ARGUMENTS (not baked
    # constants) and caches on the posterior bundle — the canonical
    # two-fit loo_targets comparison replays the same model/obs twice
    # and must not compile twice (tunnel compiles cost minutes)
    stacks = _band_stacks(bands)
    cache = getattr(fns, "programs", None)
    key = ("hier_target_loglike", k, chunk,
           tuple(tuple(s.shape) for s in stacks))
    prog = cache.get(key) if cache is not None else None
    if prog is None:
        lnl_one = _make_lnl_one(bands, fns.dtype)

        def _replay(kd, *st):
            return jax.vmap(
                lambda one: jax.vmap(lnl_one)(one, *st)
            )(kd)

        prog = jax.jit(_replay)
        if cache is not None:
            cache[key] = prog
    out = np.zeros((n, k), np.float64)
    for lo in range(0, n, chunk):
        block = per[lo : lo + chunk]
        m = block.shape[0]
        if m < chunk and n > chunk:
            block = np.concatenate(
                [block, np.repeat(block[-1:], chunk - m, axis=0)]
            )
        out[lo : lo + chunk] = np.asarray(
            prog(jnp.asarray(block, fns.dtype), *stacks), np.float64
        )[:m]
    # proper mixture density: fold the uniform index weights the
    # posterior convention leaves to base_prior
    out += sum(
        -np.log(b["psf"][1]) for b in bands if b["psf"] is not None
    )
    return out


def loo_targets(model, obs_stack, ivm_stack, result, **kw):
    """Leave-one-TARGET-out PSIS-LOO of a hierarchical fit.

    Grouped cross-validation for comparing POPULATION models (e.g.
    :class:`NormalPopulation` vs :class:`StudentTPopulation` on the
    same catalog): the importance ratio for dropping target k is
    1/p(y_k | theta_k) (Vehtari's leave-one-group-out construction —
    p(theta | y_-k) ∝ p(theta | y)/p(y_k | theta)), so the estimate
    correctly integrates over how the population prior would re-predict
    the held-out target.  Compare two fits with
    :func:`psfmc_tpu.analysis.model_comparison.compare`.

    HONESTY NOTE: for targets whose own data dominate their posterior
    (the no-pooling regime) removing y_k shifts theta_k a lot and the
    importance weights go heavy-tailed — the per-target Pareto ``k``
    diagnostic flags exactly those.  In practice k > 0.7 flags are
    COMMON here because every NON-governed per-target parameter
    (centroid, sky, …) is data-dominated by construction — dropping
    y_k reverts them to the base prior no matter how strong the
    pooling on the governed slot.  Two consequences: (1) absolute
    elpd values are noisy, but the PAIRED comparison of two
    population families via :func:`analysis.model_comparison.compare`
    is much more stable (both fits share the same heavy-tail draws,
    so the noise largely cancels in the per-target differences);
    (2) tightening the template priors on nuisance parameters
    (e.g. a narrow xy prior from a detection catalog) directly
    improves the weights.  Verified behavior (2026-08-19 drive,
    8 PS targets, mag pooled): all 8 targets k > 0.7 yet
    delta_elpd = -1.6 +/- 0.7 reproducible across fits.
    """
    from .analysis.model_comparison import psis_loo

    ll = target_loglike(model, obs_stack, ivm_stack, result, **kw)
    res = psis_loo(
        loglike=ll,
        unit="targets",
        advice=(
            "those targets are in the no-pooling regime (their own "
            "data dominate their posterior, so dropping them shifts "
            "theta_k too far for importance sampling) — their grouped "
            "LOO terms, and any elpd comparison leaning on them, are "
            "not trustworthy"
        ),
    )
    res.kind = "loo-target"
    return res


class _HierarchicalFns:
    """Duck-typed posterior bundle the samplers consume.

    ``log_posterior`` is the joint catalog posterior; image
    accumulation is disabled (``carry_images`` is empty — the
    per-target posterior-mean images of a catalog fit are a replay
    product, not a streaming one).
    """

    def __init__(self, bands, d, k, governed_cols, bounds,
                 populations, hyper_offsets, hyper_dists, base_prior,
                 noncentered=False, target_sharding=None,
                 cov_cols=None):
        from types import SimpleNamespace

        if cov_cols is None:
            cov_cols = [None] * len(populations)

        self._bands = bands  # [{"fns", "obs", "psf": (col, npsf)|None}]
        self.dtype = bands[0]["fns"].dtype
        d = int(d)
        h = int(sum(len(p.hyper_dists) for p in populations))
        self.k, self.d, self.h = int(k), d, h
        self.spec = SimpleNamespace(
            num_params=int(k) * d + h, num_psfs=1
        )
        self.programs: Dict = {}
        self._governed_cols = governed_cols
        self._bounds = bounds
        self._populations = populations
        self._hyper_offsets = hyper_offsets
        self._hyper_dists = hyper_dists
        self._base_prior = base_prior
        self.noncentered = bool(noncentered)
        self._target_sharding = target_sharding
        # discrete PSF-index columns being marginalized (reporting
        # Gibbs pass + init pinning read this)
        self.psf_margs = [b["psf"] for b in bands if b["psf"]]

        def log_posterior(big):
            big = jnp.asarray(big, self.dtype)
            sampled = big[: self.k * d].reshape(self.k, d)
            phi = big[self.k * d :]

            thetas = sampled
            lp = jnp.asarray(0.0, self.dtype)
            for (col, (a, b)), pop, off, xcol in zip(
                zip(governed_cols, bounds), populations, hyper_offsets,
                cov_cols,
            ):
                nh = len(pop.hyper_dists)
                phi_p = jax.lax.dynamic_slice(phi, (off,), (nh,))
                # regression covariate: read from THETAS, not sampled —
                # a governed covariate processed earlier (dict order is
                # validated) has already been reconstructed/clamped
                # there under the non-centered form
                xtra = () if xcol is None else (thetas[:, xcol],)
                if noncentered:
                    # sampled value is the standardized residual eta;
                    # its density is phi-independent (no funnel) and
                    # theta is reconstructed for the likelihood
                    eta = sampled[:, col]
                    x = pop.reconstruct(eta, phi_p, *xtra).astype(
                        self.dtype
                    )
                    lp = lp + pop.eta_logp(eta)
                else:
                    x = sampled[:, col]
                    lp = lp + pop.jax_logp(x, phi_p, *xtra)
                # truncation to the original prior support (see module
                # docstring) — in the centered NUTS path the transform
                # already enforces it; here it also guards the
                # ensemble path and the non-centered moving wall
                if np.isfinite(a):
                    lp = jnp.where(jnp.any(x < a), -jnp.inf, lp)
                if np.isfinite(b):
                    lp = jnp.where(jnp.any(x > b), -jnp.inf, lp)
                if noncentered:
                    # clamp the value fed to the renderer into the
                    # template support: the guard above already voids
                    # the density outside, and an unclamped excursion
                    # (e.g. Sersic index <= 0) would render NaN whose
                    # gradient poisons BOTH branches of the final
                    # where()
                    if np.isfinite(a):
                        x = jnp.maximum(x, jnp.asarray(a, self.dtype))
                    if np.isfinite(b):
                        x = jnp.minimum(x, jnp.asarray(b, self.dtype))
                    thetas = thetas.at[:, col].set(x)

            lnl_one = _make_lnl_one(self._bands, self.dtype)
            stacks = _band_stacks(self._bands)
            if self._target_sharding is not None:
                # shard the TARGET axis: each device renders its K/ndev
                # targets; the only collective is the scalar psum of
                # the per-target lnl sum below (chains replicate).
                # Only the UNBATCHED obs constants carry the
                # constraint — thetas is chain-batched when the
                # sampler vmaps this function, and a leading-axis spec
                # would shard chains instead; XLA propagates the
                # partition to the renders from the obs contraction.
                # Constants stay host numpy until this traced
                # constraint — never committed arrays (axon d2h).
                stacks = [
                    jax.lax.with_sharding_constraint(
                        s, self._target_sharding
                    )
                    for s in stacks
                ]
            lnl = jnp.sum(jax.vmap(lnl_one)(thetas, *stacks))
            lp = lp + jnp.sum(
                jax.vmap(base_prior)(thetas)
            ).astype(self.dtype)
            for off, dist in enumerate(hyper_dists):
                lp = lp + jnp.sum(dist.jax_logp(phi[off]))
            out = jnp.where(jnp.isfinite(lp), lnl + lp, -jnp.inf)
            return jnp.where(jnp.isnan(out), -jnp.inf, out).astype(
                self.dtype
            )

        self.log_posterior = log_posterior
        self.carry_images = lambda theta: {}
        self.ensemble_carry_means = lambda thetas: {}
        self.log_posterior_and_images = lambda theta: (
            log_posterior(theta), {}
        )

    def gibbs_psf_indices(self, per, seed, chunk=256):
        """Per-draw, per-target PSF indices for the reported chain.

        Sampling marginalizes the discrete indices out of the posterior
        (the index columns ride inert at 0); reporting Gibbs-samples
        them back per retained draw from the exact conditional
        p(j | theta_k, y_k) ∝ exp(lnl_kj) — the hierarchical analogue
        of the regular NUTS sampler's per-draw Gibbs pass.  Each
        marginalized band's conditional is independent given theta
        (its lnl term is the only one touching its index).

        :param per: (n, k, d) constrained per-target thetas.
        :returns: dict ``{theta_column: (n, k) float indices}``.
        """
        rng = np.random.RandomState(seed)
        n = per.shape[0]
        result = {}
        for band in self._bands:
            if band["psf"] is None:
                continue
            col, npsf = band["psf"]
            f = band["fns"]
            keys = _band_keys(band)
            obs = [jnp.asarray(band["obs"][kk]) for kk in keys]

            def lnls_one_draw(theta_kd, _f=f, _col=col, _n=npsf,
                              _obs=obs, _keys=keys):
                def per_target(th, *planes):
                    o = dict(zip(_keys, planes))
                    return jnp.stack(
                        [
                            _f.log_likelihood_obs(
                                th.at[_col].set(
                                    jnp.asarray(j, th.dtype)
                                ),
                                o,
                            )
                            for j in range(_n)
                        ]
                    )

                return jax.vmap(per_target)(theta_kd, *_obs)

            prog = jax.jit(jax.vmap(lnls_one_draw))
            out = np.zeros(per.shape[:2], np.float64)
            for lo in range(0, n, chunk):
                block = per[lo : lo + chunk]
                m = block.shape[0]
                if m < chunk and n > chunk:
                    # pad the tail chunk to the compiled shape
                    block = np.concatenate(
                        [block,
                         np.repeat(block[-1:], chunk - m, axis=0)]
                    )
                lnls = np.asarray(
                    prog(jnp.asarray(block, self.dtype)), np.float64
                )[:m]
                # Gumbel-max categorical draw per (draw, target)
                g = rng.gumbel(size=lnls.shape)
                out[lo : lo + chunk] = np.argmax(lnls + g, axis=-1)
            result[col] = out
        return result


def _band_keys(band):
    """Static obs-dict key order for one band's per-target arrays.

    Three planes always; plus the survey-mode per-target PSF spectra
    when the band carries them (dict membership is static per trace).
    """
    keys = ["obs_data", "obs_var", "good_px"]
    # survey-mode per-target PSF spectra ride as real/imag planes
    # (complex h2d is UNIMPLEMENTED on axon — see prepare_psf_stack)
    if "psf_f_re" in band["obs"]:
        keys += ["psf_f_re", "psf_f_im", "var_f_re", "var_f_im"]
    elif "psf_f" in band["obs"]:  # legacy complex dicts still accepted
        keys += ["psf_f", "var_f"]
    return keys


def _make_lnl_one(bands, dtype):
    """Per-target data term: sum of band likelihoods, PSF-marginalized.

    ``lnl_one(th, *flat)`` takes one target's theta plus that target's
    per-band arrays in :func:`_band_keys` order (obs_data, obs_var,
    good_px, and — in survey mode — the per-target PSF + variance
    half-spectra, which :meth:`PosteriorFns.log_likelihood_obs` gathers
    the stochastic index into exactly as it would into the baked
    constants).  The discrete PSF index is marginalized PER TARGET AND
    BAND (the joint marginal over K x bands index slots factorizes:
    lnL sums over targets and bands, and each band's term depends only
    on its own index) — same logsumexp the regular NUTS sampler uses
    (sampler/nuts.py _marginal_lnpost).  The uniform 1/num_psfs mixture
    weight is NOT added here: base_prior evaluates the DiscreteUniform
    density at the inert index column (placeholder 0, inside support),
    contributing exactly -ln(num_psfs).
    """
    keylists = [_band_keys(b) for b in bands]
    offs = np.concatenate([[0], np.cumsum([len(ks) for ks in keylists])])

    def lnl_one(th, *flat):
        tot = jnp.asarray(0.0, dtype)
        for bi, band in enumerate(bands):
            o = dict(zip(keylists[bi], flat[offs[bi] : offs[bi + 1]]))
            f = band["fns"]
            if band["psf"] is None:
                tot = tot + f.log_likelihood_obs(th, o)
                continue
            col, npsf = band["psf"]
            lps = jnp.stack(
                [
                    f.log_likelihood_obs(
                        th.at[col].set(jnp.asarray(j, th.dtype)), o
                    )
                    for j in range(npsf)
                ]
            )
            tot = tot + jax.scipy.special.logsumexp(lps)
        return tot

    return lnl_one


def _band_stacks(bands):
    """Flat per-band device-array list in :func:`_band_keys` order."""
    stacks = []
    for band in bands:
        stacks += [jnp.asarray(band["obs"][k]) for k in _band_keys(band)]
    return stacks


def _build_bands(fns, spec, obs_stack, ivm_stack, psf_stack=None,
                 psfivm_stack=None, psf_oversample=1):
    """Band descriptors (prepared obs + per-band fns + PSF marg) and K.

    Single-band models take plain (K, H, W) stacks; joint models take a
    LIST of one stack per band.  ``psf_stack``/``psfivm_stack`` add
    survey-mode per-target PSFs (:func:`psfmc_tpu.batchfit.
    prepare_psf_stack` semantics; for a joint model a list with one
    entry per band, ``None`` entries keeping that band's template PSF).
    Shared by :func:`fit_hierarchical` and the :func:`target_loglike`
    replay so the two can never disagree on the observation
    preprocessing.
    """
    from .batchfit import prepare_obs_stack, prepare_psf_stack

    if (psf_stack is None) != (psfivm_stack is None):
        raise ValueError(
            "psf_stack and psfivm_stack must be given together"
        )
    band_specs = getattr(spec, "band_specs", None)
    if band_specs is None:
        band_specs = [spec]
        band_fns_list = [fns]
        obs_stacks, ivm_stacks = [obs_stack], [ivm_stack]
        psf_stacks = [psf_stack]
        psfivm_stacks = [psfivm_stack]
    else:
        band_fns_list = fns.band_fns
        if len(obs_stack) != len(band_specs) or len(ivm_stack) != len(
            band_specs
        ):
            raise ValueError(
                f"joint fit_hierarchical needs one obs/ivm stack per "
                f"band ({len(band_specs)}), got {len(obs_stack)}/"
                f"{len(ivm_stack)}"
            )
        if psf_stack is not None and (
            len(psf_stack) != len(band_specs)
            or len(psfivm_stack) != len(band_specs)
        ):
            raise ValueError(
                f"joint psf_stack needs one entry per band "
                f"({len(band_specs)}; None keeps that band's template "
                f"PSF), got {len(psf_stack)}/{len(psfivm_stack)}"
            )
        obs_stacks, ivm_stacks = list(obs_stack), list(ivm_stack)
        psf_stacks = (
            list(psf_stack) if psf_stack is not None
            else [None] * len(band_specs)
        )
        psfivm_stacks = (
            list(psfivm_stack) if psfivm_stack is not None
            else [None] * len(band_specs)
        )
    bands = []
    k = None
    for bs, bf, ob_s, iv_s, ps_s, pi_s in zip(
        band_specs, band_fns_list, obs_stacks, ivm_stacks,
        psf_stacks, psfivm_stacks,
    ):
        ob = prepare_obs_stack(bs, ob_s, iv_s, np.dtype(fns.dtype))
        k_b = ob["obs_data"].shape[0]
        if k is None:
            k = k_b
        elif k_b != k:
            raise ValueError(
                f"bands disagree on target count: {k_b} vs {k}"
            )
        if ps_s is not None:
            if pi_s is None:
                raise ValueError(
                    "a band's psf_stack entry needs a matching "
                    "psfivm_stack entry"
                )
            psf = prepare_psf_stack(
                bs, ps_s, pi_s, psf_oversample, np.dtype(fns.dtype)
            )
            if psf["psf_f_re"].shape[0] != k_b:
                raise ValueError(
                    f"psf_stack target count {psf['psf_f_re'].shape[0]} "
                    f"!= obs target count {k_b}"
                )
            ob.update(psf)
        bands.append({"fns": bf, "obs": ob, "psf": _psf_marg_for(bs)})
    return bands, k


def _psf_marg_for(band_spec):
    """(theta_column, num_psfs) when the band's PSF index is sampled,
    else None (single PSF, or index held constant)."""
    npsf = int(getattr(band_spec, "num_psfs", 1))
    if npsf == 1:
        return None
    cs = next(
        (c for c in band_spec.comp_specs if c.kind == "psfselector"),
        None,
    )
    if cs is None:
        return None
    kind, payload = cs.params["psf_index"]
    if kind != "theta":
        return None
    return (int(payload[0]), npsf)


def _hyper_slots(populations, names, dists):
    """ParamSlot list for the hyper block (transform building)."""
    from .models.spec import ParamSlot

    slots = []
    for off, (name, dist) in enumerate(zip(names, dists)):
        slots.append(
            ParamSlot(
                comp_index=-1,
                attr=name,
                offset=off,
                size=1,
                name=name,
                fitsname=name[:8],
                dist=dist,
                is_discrete=False,
            )
        )
    return slots


class _HierTransform:
    """K copies of the per-target bijection + the hyper bijection.

    z layout mirrors theta: ``[K x base_z, hyper_z]``.
    """

    def __init__(self, base, hyper, k, d):
        self.base = base
        self.hyper = hyper
        self.k = int(k)
        self.d = int(d)
        self.num_unconstrained = (
            self.k * base.num_unconstrained + hyper.num_unconstrained
        )
        self.discrete_offsets = np.asarray([], np.int32)

    def cache_token(self):
        return ("hier", self.k, self.base.cache_token(),
                self.hyper.cache_token())

    def to_constrained(self, z):
        bz = self.base.num_unconstrained
        zt = z[: self.k * bz].reshape(self.k, bz)
        th, ld = jax.vmap(self.base.to_constrained)(zt)
        ph, ldh = self.hyper.to_constrained(z[self.k * bz :])
        return (
            jnp.concatenate([th.reshape(-1), ph]),
            jnp.sum(ld) + ldh,
        )

    def to_unconstrained(self, theta):
        theta = np.asarray(theta, np.float64)
        squeeze = theta.ndim == 1
        theta = np.atleast_2d(theta)
        n = theta.shape[0]
        per = theta[:, : self.k * self.d].reshape(n * self.k, self.d)
        zt = self.base.to_unconstrained(per).reshape(n, -1)
        zh = self.hyper.to_unconstrained(theta[:, self.k * self.d :])
        z = np.concatenate([zt, np.atleast_2d(zh)], axis=1)
        return z[0] if squeeze else z


class _UnboundedStandin:
    """Stand-in dist whose support is all of R — makes the
    UnconstrainingTransform treat a governed slot as identity (the
    non-centered residual eta is unbounded)."""

    class _RV:
        @staticmethod
        def support():
            return (-np.inf, np.inf)

    rv_frozen = _RV()


def _noncentered_transform(fns, spec, governed_cols):
    """Per-target bijection with governed slots identity-mapped.

    Built from a shallow slot copy whose governed dists report
    unbounded support; cached on the posterior bundle per governed-set.
    Axis-pair members (reff/reff_b etc.) cannot be governed
    non-centered: their dependent-bound bijection would read the RAW
    residual as the bound value.
    """
    import dataclasses
    from types import SimpleNamespace

    from .models.transforms import UnconstrainingTransform

    cache = getattr(fns, "programs", None)
    key = ("hier_nc_transform", tuple(sorted(governed_cols)))
    tr = cache.get(key) if cache is not None else None
    if tr is None:
        gov = set(int(c) for c in governed_cols)
        slots = [
            dataclasses.replace(s, dist=_UnboundedStandin())
            if int(s.offset) in gov
            else s
            for s in spec.slots
        ]
        mod = SimpleNamespace(
            slots=slots,
            comp_specs=spec.comp_specs,
            num_params=spec.num_params,
        )
        tr = UnconstrainingTransform(mod, dtype=fns.dtype)
        for zb, za, _kb in tr.reffb_pairs:
            if int(tr.offsets[zb]) in gov or int(tr.offsets[za]) in gov:
                raise ValueError(
                    "parametrization='noncentered' cannot govern an "
                    "axis-pair parameter (reff/reff_b, fwhm/fwhm_b, "
                    "...): the dependent minor-axis bound needs the "
                    "constrained value — use parametrization="
                    "'centered'"
                )
        if cache is not None:
            cache[key] = tr
    return tr


def fit_hierarchical(
    model,
    obs_stack,
    ivm_stack,
    population,
    sampler="nuts",
    chains=4,
    nwalkers=None,
    burn=500,
    iterations=500,
    seed=0,
    max_depth=8,
    init_pool=16,
    mesh=None,
    shard="chains",
    parametrization="centered",
    psf_stack=None,
    psfivm_stack=None,
    psf_oversample=1,
):
    """Joint hierarchical fit of K stacked observations.

    :param model: template model (instance / component list / model
        file, single-band or :class:`psfmc_tpu.models.JointModel`) —
        its Configuration(s) supply PSF/mask/zeropoint/geometry;
        per-target priors come from its component priors.  Multi-PSF
        templates marginalize the discrete index per target (see
        module docstring).
    :param obs_stack / ivm_stack: (K, H, W) stacks — or, for a joint
        model, a LIST of one (K, H_b, W_b) stack per band (same
        semantics as :func:`psfmc_tpu.batchfit.fit_batch`).
    :param population: dict mapping a SCALAR parameter trace name
        (e.g. ``'1_Sersic_index'``) to a population object
        (:class:`NormalPopulation`); that parameter's per-target prior
        density is replaced by the population density (truncated to the
        original support) and the population's hyperparameters are
        sampled.
    :param sampler: ``'nuts'`` (default — the joint space is
        ``K*d + h`` dimensional, where gradients shine) or
        ``'ensemble'`` (small K only; walkers default to
        ``2*(K*d+h) + 2``).  A minimal prior-initialized ensemble on
        razor per-target posteriors mixes slowly — verified drive:
        22 walkers x 500 burn sat at the hyper prior edge while 64
        walkers x 2000 burn matched NUTS to 3 digits; prefer NUTS, or
        give the ensemble ~4x the minimal walkers and a generous burn.
    :param chains: NUTS chains (vmapped).
    :param mesh: optional :func:`psfmc_tpu.parallel.walker_mesh` — see
        ``shard`` for which axis it splits.
    :param shard: which axis rides the mesh.  ``'chains'`` (default)
        shards the NUTS chain / ensemble walker axis — right when
        chains >= devices.  ``'targets'`` shards the K-target axis
        inside the vmapped likelihood instead (chains replicate):
        each device renders its K/ndev targets and the only collective
        is the scalar psum of the per-target lnL sum — right for
        big catalogs sampled with a handful of NUTS chains (K should
        be a mesh multiple for even splits).
    :param parametrization: ``'centered'`` (default — governed values
        sampled directly) or ``'noncentered'`` (standardized residuals
        sampled; kills the small-sigma funnel, see module docstring).
        Results are reported in constrained theta space either way.
    :param psf_stack / psfivm_stack: optional survey-mode per-target
        PSFs (each target observed with its own PSF star) — same
        structure as :func:`psfmc_tpu.batchfit.fit_batch`: a length-K
        sequence of PSFs (or per-target lists of ``num_psfs`` PSFs
        under a stochastic index, marginalized per target as usual);
        for a joint model, a list with one such entry per band
        (``None`` keeps that band's template PSF).  Pass the SAME
        stacks to :func:`target_loglike`/:func:`loo_targets` when
        replaying.
    :param psf_oversample: per-target PSF oversampling factor.
    :returns: :class:`HierarchicalResult`.
    """
    from .models.multicomponent import as_model, slot_param_names
    from .models.posterior import make_log_prior

    model = as_model(model)
    fns = model.posterior_fns
    spec = model.spec
    d = spec.num_params
    bands, k = _build_bands(
        fns, spec, obs_stack, ivm_stack,
        psf_stack=psf_stack, psfivm_stack=psfivm_stack,
        psf_oversample=psf_oversample,
    )

    if not population:
        raise ValueError("population must name at least one parameter")
    if parametrization not in ("centered", "noncentered"):
        raise ValueError(
            f"unknown parametrization {parametrization!r}: expected "
            "'centered' or 'noncentered'"
        )
    noncentered = parametrization == "noncentered"
    slot_by_name = {s.name: s for s in spec.slots}
    governed_cols, bounds, populations, cov_cols = [], [], [], []
    hyper_names, hyper_dists, hyper_offsets = [], [], []
    for name, pop in population.items():
        if getattr(pop, "_hyper_priors_placeholder", False):
            raise ValueError(
                f"population on {name!r}: this family was loaded from "
                "a saved result — its hyper priors are placeholders "
                "(predict-only).  Construct a fresh family with real "
                "hyper priors to fit."
            )
        slot = slot_by_name.get(name)
        if slot is None:
            raise ValueError(
                f"unknown parameter {name!r}: expected one of "
                f"{sorted(slot_by_name)}"
            )
        if slot.size != 1:
            raise ValueError(
                f"population on {name!r}: vector slots (xy) are not "
                "supported — govern scalar parameters"
            )
        if slot.is_discrete:
            raise ValueError(
                f"population on {name!r}: the discrete PSF index is "
                "marginalized, not governed"
            )
        governed_cols.append(int(slot.offset))
        a, b = slot.dist.rv_frozen.support()
        bounds.append((float(a), float(b)))
        populations.append(pop)
        xname = getattr(pop, "covariate", None)
        if xname is None:
            cov_cols.append(None)
        else:
            xslot = slot_by_name.get(xname)
            if xslot is None:
                raise ValueError(
                    f"population on {name!r}: unknown covariate "
                    f"{xname!r} — expected one of {sorted(slot_by_name)}"
                )
            if xslot.size != 1 or xslot.is_discrete:
                raise ValueError(
                    f"population on {name!r}: covariate {xname!r} must "
                    "be a continuous scalar slot"
                )
            if xname == name:
                raise ValueError(
                    f"population on {name!r}: a parameter cannot be "
                    "its own covariate"
                )
            keys = list(population)
            if xname in population and (
                keys.index(xname) >= keys.index(name)
            ):
                raise ValueError(
                    f"population on {name!r}: its covariate {xname!r} "
                    "is governed too — list the covariate's population "
                    "FIRST (its constrained value feeds the regression "
                    "density)"
                )
            cov_cols.append(int(xslot.offset))
        hyper_offsets.append(len(hyper_dists))
        for hname, hdist in zip(pop.hyper_names, pop.hyper_dists):
            hyper_names.append(f"{name}:{hname}")
            hyper_dists.append(hdist)
        if noncentered:
            if not hasattr(pop, "reconstruct"):
                raise ValueError(
                    f"{type(pop).__name__} defines no non-centered "
                    "form (reconstruct/eta_logp) — use "
                    "parametrization='centered'"
                )
            si = getattr(pop, "scale_hyper_index", None)
            if si is not None:
                lo_s = float(
                    pop.hyper_dists[si].rv_frozen.support()[0]
                )
                if lo_s < 0:
                    raise ValueError(
                        f"population on {name!r}: the scale "
                        "hyperparameter's prior must have nonnegative "
                        "support under parametrization='noncentered' "
                        "(a negative sigma makes theta = "
                        "reconstruct(eta, phi) two-to-one)"
                    )

    base_prior = make_log_prior(
        [s for s in spec.slots if int(s.offset) not in governed_cols],
        spec.comp_specs,
        fns.dtype,
    )
    if shard not in ("chains", "targets"):
        raise ValueError(
            f"unknown shard {shard!r}: expected 'chains' or 'targets'"
        )
    target_sharding = None
    if mesh is not None and shard == "targets":
        from .parallel.mesh import walker_sharding

        target_sharding = walker_sharding(mesh)
        if jax.default_backend() == "cpu" and any(
            b["fns"].conv_mode == "fft" for b in bands
        ):
            # XLA's CPU fft thunk RET_CHECKs on the non-dim0-major
            # layout the target partition propagates into the batched
            # rfft2 (fft_thunk.cc LayoutUtil::IsMonotonicWithDim0Major,
            # measured 2026-08-19); the dft matmul path shards fine
            # and is the TPU default anyway.
            import warnings

            from .models.posterior import build_posterior

            warnings.warn(
                "shard='targets' with the CPU fft convolution hits an "
                "XLA CPU fft layout limitation — using the dft "
                "convolution for this fit"
            )
            for b in bands:
                if b["fns"].conv_mode == "fft":
                    b["fns"] = build_posterior(
                        b["fns"].spec, dtype=b["fns"].dtype,
                        conv_mode="dft",
                    )
    hier = _HierarchicalFns(
        bands, d, k, governed_cols, bounds, populations,
        hyper_offsets, hyper_dists, base_prior,
        noncentered=noncentered, target_sharding=target_sharding,
        cov_cols=cov_cols,
    )
    dim = hier.spec.num_params

    # initial positions: per-target prior draws + hyper prior draws
    # (governed columns hold eta under the non-centered form)
    rng = np.random.RandomState(seed)

    def draw(n):
        per = model.init_params_from_priors(
            n * k, random_state=rng
        ).reshape(n, k, d)
        for col, _npsf in hier.psf_margs:
            # the index is marginalized: pin its columns at 0 so the
            # inert coordinates stay valid under base_prior (a frozen
            # all-equal coordinate is stable under stretch/DE moves)
            per[:, :, col] = 0.0
        if noncentered:
            for col, pop in zip(governed_cols, populations):
                per[:, :, col] = pop.eta_random(rng, (n, k))
        hyp = np.column_stack(
            [
                np.ravel(hd.random(random_state=rng, size=n))
                for hd in hyper_dists
            ]
        )
        return np.concatenate([per.reshape(n, k * d), hyp], axis=1)

    if sampler == "nuts":
        from types import SimpleNamespace

        from .models.transforms import UnconstrainingTransform
        from .sampler.nuts import NUTSSampler

        hyper_spec = SimpleNamespace(
            slots=_hyper_slots(populations, hyper_names, hyper_dists),
            comp_specs=[],
            num_params=len(hyper_dists),
        )
        base_tr = (
            _noncentered_transform(fns, spec, governed_cols)
            if noncentered
            else fns_transform(fns, spec)
        )
        transform = _HierTransform(
            base_tr,
            UnconstrainingTransform(hyper_spec, dtype=fns.dtype),
            k,
            d,
        )
        sharding = None
        if mesh is not None and shard == "chains":
            from .parallel.mesh import walker_sharding

            sharding = walker_sharding(mesh)
        smp = NUTSSampler(
            int(chains), dim, hier, seed=seed, max_depth=max_depth,
            transform=transform, sharding=sharding,
        )
        smp.init_state(draw(int(chains) * int(init_pool)))
        smp.run_burn(int(burn))
        smp.reset()
        smp.run_sampling(int(iterations))
        diags = {
            "divergences": float(smp._n_divergent),
            "mean_accept": float(smp.acceptance_fraction.mean()),
        }
    elif sampler == "ensemble":
        from .sampler.ensemble import EnsembleSampler

        nw = nwalkers or 2 * dim + 2
        if nw % 2:
            nw += 1
        sharding = None
        if mesh is not None and shard == "chains":
            from .parallel.mesh import walker_sharding

            sharding = walker_sharding(mesh)
        smp = EnsembleSampler(nw, dim, hier, seed=seed,
                              sharding=sharding)
        smp.init_state(draw(nw))
        smp.run_burn(int(burn))
        smp.reset()
        smp.run_sampling(int(iterations))
        diags = {
            "mean_accept": float(smp.acceptance_fraction.mean()),
        }
    else:
        raise ValueError(
            f"unknown sampler {sampler!r}: expected 'nuts' or 'ensemble'"
        )

    flat = np.asarray(smp.flatchain, np.float64)
    # flatchain is chain.reshape(-1, dim) — lnprobability (nchains, S)
    # flattens in the same row order
    lnp_flat = np.asarray(smp.lnprobability, np.float64).reshape(-1)
    per = flat[:, : k * d].reshape(len(flat), k, d)
    if noncentered:
        # report constrained thetas: reconstruct governed columns from
        # the sampled residuals + that sample's own hyperparameters
        # (single-twin rule — same reconstruct() the posterior used).
        # Dict order means a governed regression covariate is already
        # constrained in `per` when its dependent reads it.
        for col, pop, off, xcol in zip(
            governed_cols, populations, hyper_offsets, cov_cols
        ):
            nh = len(pop.hyper_dists)
            phi_chain = jnp.asarray(
                flat[:, k * d + off : k * d + off + nh]
            )
            eta_chain = jnp.asarray(per[:, :, col])
            xtra = (
                () if xcol is None
                else (jnp.asarray(per[:, :, xcol]),)
            )
            rec = jax.vmap(pop.reconstruct)(
                eta_chain, phi_chain, *xtra
            )
            per[:, :, col] = np.asarray(rec, np.float64)
        flat = np.concatenate(
            [per.reshape(len(flat), k * d), flat[:, k * d :]], axis=1
        )
    if hier.psf_margs:
        # Gibbs-sample the marginalized indices back per retained draw
        # (exact conditionals) so the reported chain carries them like
        # the regular trace database's PSF_Index column(s)
        for col, idx in hier.gibbs_psf_indices(per, seed=seed + 1
                                               ).items():
            per[:, :, col] = idx
        flat = np.concatenate(
            [per.reshape(len(flat), k * d), flat[:, k * d :]], axis=1
        )
    res = HierarchicalResult(
        param_names=slot_param_names(
            list(spec.param_names), list(spec.param_lens)
        ),
        hyper_names=hyper_names,
        num_targets=k,
        target_mean=per.mean(axis=0),
        target_std=per.std(axis=0),
        hyper_chain=flat[:, k * d :],
        governed=list(population.keys()),
        diagnostics=diags,
        flatchain=flat,
        lnp=lnp_flat,
        populations=dict(population),
        governed_bounds={
            nm: bounds[i] for i, nm in enumerate(population.keys())
        },
    )
    return res


def fns_transform(fns, spec):
    """Per-target transform (cached on the posterior bundle)."""
    from .models.transforms import build_transform

    cache = getattr(fns, "programs", None)
    key = "hier_base_transform"
    tr = cache.get(key) if cache is not None else None
    if tr is None:
        tr = build_transform(spec, dtype=fns.dtype)
        if cache is not None:
            cache[key] = tr
    return tr


