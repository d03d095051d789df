"""Predictive model comparison: WAIC and PSIS-LOO over pixels.

The package already offers *marginal-likelihood* model comparison
(PT stepping-stone / SMC evidence).  This module adds the
*predictive* family — WAIC (Watanabe 2010) and PSIS-LOO (Vehtari,
Gelman & Gabry 2017) — which answers a different question: not "which
model explains the prior-predictive data best" but "which model
predicts held-out pixels best".  Predictive scores are insensitive to
prior volume, so they complement the evidence when priors are
deliberately weak.  The reference has no analogue of either — its only
model-comparison product is eyeballing residual images
(/root/reference/psfMC/analysis/images.py renders them; nothing scores
them).

Data points are the unmasked pixels.  The per-pixel log-density matrix
comes from replaying thinned posterior draws through the model's own
jitted pointwise likelihood (``PosteriorFns.pointwise_log_likelihood``
— exactly the density the sampler used, asserted in tests), batched on
device in chunks; only the (chunk, H, W) log-density maps cross to the
host, where the order statistics / Pareto fits run in f64 (moment rule:
never reduce big f32 chains on the host in f32).

PSIS implements the procedure of Vehtari et al. 2017 (arXiv:1507.02646)
with the Zhang & Stephens (2009) profile-posterior generalized-Pareto
fit, vectorized over pixel chunks.  The Pareto shape diagnostic ``k``
is reported per pixel: k > 0.7 means the importance weights for that
pixel are too heavy-tailed to trust (the usual cause here is a single
pixel whose density is dominated by one posterior draw — e.g. an
unmasked artifact under a Gaussian likelihood).
"""
from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

__all__ = [
    "ELPDResult",
    "LOOPITResult",
    "pointwise_loglike",
    "waic",
    "psis_loo",
    "loo_pit",
    "compare",
]


# ---------------------------------------------------------------------------
# pointwise log-likelihood matrix
# ---------------------------------------------------------------------------

def robust_lnp_keep(lnp):
    """Keep-mask over retained rows: drop burn-in leakage by lnp floor.

    The floor is a generous robust bound (median - max(50, 20 * 1.4826
    * MAD)): genuine posterior lnp spread is ~sqrt(dim/2), so nothing
    within dozens of its sigmas is touched; rows from still-descending
    walkers at lnp ~ -1e6 (posterior weight e^-1e6, sample frequency
    ~0.5%) ARE dropped — harmless to posterior-mean images, fatal to
    per-point density variances (measured: 0.5% such rows turned
    p_eff ~ 11 into 7e6 and flagged 44% of pixels k > 0.7).  Warns
    when anything is dropped.  Shared by the pixel-level replay and
    :func:`psfmc_tpu.hierarchy.target_loglike`.
    """
    lnp = np.asarray(lnp, np.float64)
    med = np.median(lnp)
    mad = np.median(np.abs(lnp - med))
    floor = med - max(50.0, 20.0 * 1.4826 * mad)
    keep = lnp >= floor
    ndrop = int(np.sum(~keep))
    if ndrop:
        warnings.warn(
            f"dropping {ndrop}/{keep.size} retained rows with lnp "
            f"below {floor:.1f} (posterior median {med:.1f}) before "
            "replay — burn-in leakage from late-converging walkers; "
            "if this is more than a few percent, extend the burn"
        )
    return keep


def _resolve_thetas(model, database, thetas, max_samples):
    if thetas is None:
        if database is None:
            raise ValueError(
                "pointwise replay needs database= or thetas="
            )
        # Drop non-posterior debris before replay.  Two layers:
        # (1) fully-stuck walkers (reference images.py:44 semantics);
        # (2) individual rows below the robust lnp floor (see
        # robust_lnp_keep — per-point density variances have zero
        # tolerance for burn-in leakage posterior means shrug off).
        from ..database import filter_lowp_walkers

        database = filter_lowp_walkers(database, percentile=10)
        lnp = np.asarray(database["lnprobability"], np.float64)
        keep = robust_lnp_keep(lnp)
        if not keep.all():
            database = database[keep]
        thetas = model.thetas_from_database(database)
        if len(thetas) > max_samples:
            sel = np.linspace(0, len(thetas) - 1, max_samples).astype(int)
            thetas = thetas[sel]
    thetas = np.asarray(thetas, np.float64)
    if thetas.ndim != 2:
        raise ValueError("thetas must be (n_samples, num_params)")
    return thetas


def _pointwise_matrix(model, method, prog_key, thetas, chunk):
    """Replay ``thetas`` through a per-pixel device map, good px only.

    ``method`` names a PosteriorFns (H, W)-map method; joint models
    concatenate the per-band good-pixel axes.
    """
    import jax

    fns = model.posterior_fns
    band_fns = getattr(fns, "band_fns", [fns])
    mats = []
    for f in band_fns:
        progs = getattr(f, "programs", {})
        prog = progs.get(prog_key)
        if prog is None:
            prog = jax.jit(jax.vmap(getattr(f, method)))
            progs[prog_key] = prog
        good = np.asarray(f.constants["good_px"]).reshape(-1)
        h_dtype = np.dtype(np.float64 if f.dtype == np.float64 else
                           np.float32)
        cols = []
        for lo in range(0, len(thetas), chunk):
            part = np.asarray(thetas[lo : lo + chunk], h_dtype)
            maps = np.asarray(prog(part), np.float64)
            cols.append(maps.reshape(maps.shape[0], -1)[:, good])
        mats.append(np.concatenate(cols, axis=0))
    return np.concatenate(mats, axis=1)


def _pointwise_matrix_pair(model, thetas, chunk):
    """(loglike, cdf) matrices from the fused single-render program."""
    import jax

    fns = model.posterior_fns
    band_fns = getattr(fns, "band_fns", [fns])
    ll_mats, cdf_mats = [], []
    for f in band_fns:
        progs = getattr(f, "programs", {})
        prog = progs.get("pointwise_lnl_cdf")
        if prog is None:
            prog = jax.jit(jax.vmap(f.pointwise_lnl_and_cdf))
            progs["pointwise_lnl_cdf"] = prog
        good = np.asarray(f.constants["good_px"]).reshape(-1)
        h_dtype = np.dtype(np.float64 if f.dtype == np.float64 else
                           np.float32)
        ll_cols, cdf_cols = [], []
        for lo in range(0, len(thetas), chunk):
            part = np.asarray(thetas[lo : lo + chunk], h_dtype)
            lmap, cmap = prog(part)
            lmap = np.asarray(lmap, np.float64)
            cmap = np.asarray(cmap, np.float64)
            ll_cols.append(lmap.reshape(lmap.shape[0], -1)[:, good])
            cdf_cols.append(cmap.reshape(cmap.shape[0], -1)[:, good])
        ll_mats.append(np.concatenate(ll_cols, axis=0))
        cdf_mats.append(np.concatenate(cdf_cols, axis=0))
    return (
        np.concatenate(ll_mats, axis=1),
        np.concatenate(cdf_mats, axis=1),
    )


def pointwise_loglike(model, database=None, thetas=None, max_samples=1000,
                      chunk=256):
    """(S, N_goodpx) f64 log-density matrix from posterior draws.

    ``model`` is anything :func:`psfmc_tpu.models.multicomponent.
    as_model` accepts (model instance, model file, JointModel).  Draws
    come from ``thetas`` (S, num_params) when given, else evenly thinned
    rows of ``database`` (at most ``max_samples`` — WAIC/LOO converge
    like 1/S and 1000 draws puts the Monte-Carlo error well below the
    pixel-count standard error).

    Joint multi-band models concatenate the per-band good-pixel axes —
    every unmasked pixel of every band is one data point.
    """
    from ..models.multicomponent import as_model

    model = as_model(model)
    thetas = _resolve_thetas(model, database, thetas, max_samples)
    return _pointwise_matrix(
        model, "pointwise_log_likelihood", "pointwise_lnl", thetas, chunk
    )


# ---------------------------------------------------------------------------
# results container
# ---------------------------------------------------------------------------

@dataclass
class ELPDResult:
    """Expected log pointwise predictive density estimate.

    ``elpd_i`` is per data point (pixel); ``elpd = sum(elpd_i)``; the
    standard error is the usual sqrt(N * var(elpd_i)) over data points.
    ``pareto_k`` is per pixel for PSIS-LOO, ``None`` for WAIC.
    """

    kind: str  # 'waic' | 'loo' | 'loo-target'
    elpd: float
    p_eff: float
    se: float
    n_samples: int
    elpd_i: np.ndarray
    pareto_k: Optional[np.ndarray] = None
    notes: List[str] = field(default_factory=list)
    #: what one data point is ('pixels'; 'targets' for the
    #: hierarchical grouped LOO, psfmc_tpu.hierarchy.loo_targets)
    unit: str = "pixels"

    @property
    def n_points(self) -> int:
        return int(self.elpd_i.size)

    @property
    def ic(self) -> float:
        """Deviance-scale information criterion (-2 * elpd)."""
        return -2.0 * self.elpd

    def summary(self) -> str:
        name = {
            "waic": "WAIC",
            "loo": "PSIS-LOO",
            # hierarchical leave-one-TARGET-out (hierarchy.loo_targets)
            "loo-target": "PSIS-LOO (targets)",
        }[self.kind]
        lines = [
            f"{name}: elpd = {self.elpd:.1f} +/- {self.se:.1f} "
            f"({self.n_points} {self.unit}, {self.n_samples} draws)",
            f"  p_eff = {self.p_eff:.2f}",
        ]
        if self.pareto_k is not None:
            k = self.pareto_k
            lines.append(
                f"  pareto_k: max {np.max(k):.2f}, "
                f"{int(np.sum(k > 0.7))} {self.unit} > 0.7"
            )
        lines.extend(f"  WARNING: {n}" for n in self.notes)
        return "\n".join(lines)


# ---------------------------------------------------------------------------
# WAIC
# ---------------------------------------------------------------------------

def waic(model=None, database=None, loglike=None, unit="pixels", **kw):
    """WAIC (Watanabe 2010) from a fit.

    Either pass ``loglike`` (an (S, N) matrix from
    :func:`pointwise_loglike`) directly, or ``model`` + ``database``
    and it is computed on device.  Returns :class:`ELPDResult`.
    ``unit`` names what one data point is ('pixels', or e.g. 'targets'
    for a :func:`psfmc_tpu.hierarchy.target_loglike` matrix).

    Per pixel: ``lppd_i = log mean_s p(y_i|theta_s)`` (log-sum-exp) and
    ``p_i = var_s(ln p(y_i|theta_s))``; ``elpd_i = lppd_i - p_i``.
    Pixels with ``p_i > 0.4`` make the variance-based penalty
    unreliable (Vehtari et al. 2017 rule of thumb) and are counted in
    a warning note — prefer PSIS-LOO when any appear.
    """
    if loglike is None:
        loglike = pointwise_loglike(model, database, **kw)
    ll = np.asarray(loglike, np.float64)
    s, _n = ll.shape
    lppd_i = _logsumexp(ll, axis=0) - np.log(s)
    p_i = np.var(ll, axis=0, ddof=1)
    elpd_i = lppd_i - p_i
    res = ELPDResult(
        kind="waic",
        elpd=float(np.sum(elpd_i)),
        p_eff=float(np.sum(p_i)),
        se=float(np.sqrt(elpd_i.size * np.var(elpd_i))),
        n_samples=s,
        elpd_i=elpd_i,
        unit=unit,
    )
    nbad = int(np.sum(p_i > 0.4))
    if nbad:
        res.notes.append(
            f"{nbad} {unit} have var(ln p) > 0.4 — the WAIC penalty is "
            "unreliable there; use psis_loo"
        )
        warnings.warn(res.notes[-1])
    return res


# ---------------------------------------------------------------------------
# PSIS-LOO
# ---------------------------------------------------------------------------

def psis_loo(model=None, database=None, loglike=None, point_chunk=2048,
             unit="pixels", advice=None, **kw):
    """PSIS-LOO (Vehtari, Gelman & Gabry 2017) from a fit.

    Leave-one-pixel-out predictive density by importance sampling from
    the full posterior, with the weight tails Pareto-smoothed per pixel
    (vectorized over ``point_chunk`` pixels at a time).  Returns
    :class:`ELPDResult` with the per-pixel Pareto ``k`` diagnostic.

    ``unit``/``advice`` customize the heavy-tail warning when the data
    points are not pixels (e.g. targets in
    :func:`psfmc_tpu.hierarchy.loo_targets`' grouped LOO).
    """
    if advice is None:
        advice = ("inspect those pixels (unmasked artifacts?) or "
                  "refit with the Student-t likelihood")
    if loglike is None:
        loglike = pointwise_loglike(model, database, **kw)
    ll = np.asarray(loglike, np.float64)
    s, n = ll.shape
    elpd_i = np.empty(n)
    kss = np.empty(n)
    for lo in range(0, n, point_chunk):
        part = ll[:, lo : lo + point_chunk]
        lw, ks = _psis_smooth(-part.T)  # raw log-ratios = -loglike
        lw = lw.T
        elpd_i[lo : lo + part.shape[1]] = _logsumexp(
            lw + part, axis=0
        ) - _logsumexp(lw, axis=0)
        kss[lo : lo + part.shape[1]] = ks
    lppd_i = _logsumexp(ll, axis=0) - np.log(s)
    res = ELPDResult(
        kind="loo",
        elpd=float(np.sum(elpd_i)),
        p_eff=float(np.sum(lppd_i - elpd_i)),
        se=float(np.sqrt(n * np.var(elpd_i))),
        n_samples=s,
        elpd_i=elpd_i,
        pareto_k=kss,
        unit=unit,
    )
    nbad = int(np.sum(kss > 0.7))
    if nbad:
        res.notes.append(
            f"{nbad} {unit} have Pareto k > 0.7 — their LOO terms are "
            f"unreliable (importance weights too heavy-tailed); "
            f"{advice}"
        )
        warnings.warn(res.notes[-1])
    return res


@dataclass
class LOOPITResult:
    """Leave-one-out probability integral transform per pixel.

    Under a calibrated model, ``pit`` is uniform on [0, 1]: values
    piling at both ends mean the model is overconfident (claimed noise
    too small), piling in the middle means over-dispersion, a one-sided
    pile means bias.  ``ks_pvalue`` is the Kolmogorov-Smirnov test of
    uniformity over pixels.
    """

    pit: np.ndarray  # (N,) in [0, 1]
    ks_stat: float
    ks_pvalue: float
    pareto_k: np.ndarray
    notes: List[str] = field(default_factory=list)

    def calibrated(self, alpha=0.01) -> bool:
        return bool(self.ks_pvalue > alpha)

    def summary(self) -> str:
        lines = [
            f"LOO-PIT: KS = {self.ks_stat:.4f} "
            f"(p = {self.ks_pvalue:.4g}, {self.pit.size} pixels)",
            "  " + ("calibrated" if self.calibrated()
                    else "NOT UNIFORM — miscalibrated predictions"),
        ]
        tails = float(np.mean((self.pit < 0.05) | (self.pit > 0.95)))
        lines.append(
            f"  tail mass (<0.05 or >0.95): {tails:.3f} (uniform: 0.100; "
            "higher = overconfident, lower = overdispersed)"
        )
        lines.extend(f"  WARNING: {n}" for n in self.notes)
        return "\n".join(lines)


def loo_pit(model=None, database=None, thetas=None, loglike=None,
            cdf=None, max_samples=1000, chunk=256, point_chunk=2048):
    """LOO-PIT calibration check (Gabry et al. 2019 visualization's
    quantitative twin).

    For each pixel, the leave-one-out predictive CDF at the observed
    value — estimated by PSIS-weighting the per-draw predictive CDFs
    with the SAME smoothed weights LOO uses.  Pass precomputed
    ``loglike``/``cdf`` matrices (both (S, N)) or let them be replayed
    from ``model`` + ``database``/``thetas`` on device.
    """
    if loglike is None or cdf is None:
        from ..models.multicomponent import as_model

        model = as_model(model)
        thetas = _resolve_thetas(model, database, thetas, max_samples)
        if loglike is None and cdf is None:
            # one fused program: the render + convolutions are shared
            loglike, cdf = _pointwise_matrix_pair(model, thetas, chunk)
        elif loglike is None:
            loglike = _pointwise_matrix(
                model, "pointwise_log_likelihood", "pointwise_lnl",
                thetas, chunk,
            )
        else:
            cdf = _pointwise_matrix(
                model, "pointwise_predictive_cdf", "pointwise_cdf",
                thetas, chunk,
            )
    ll = np.asarray(loglike, np.float64)
    cc = np.asarray(cdf, np.float64)
    if ll.shape != cc.shape:
        raise ValueError(
            f"loglike {ll.shape} and cdf {cc.shape} shapes must match"
        )
    s, n = ll.shape
    pit = np.empty(n)
    kss = np.empty(n)
    for lo in range(0, n, point_chunk):
        part_ll = ll[:, lo : lo + point_chunk]
        part_c = cc[:, lo : lo + point_chunk]
        lw, ks = _psis_smooth(-part_ll.T)
        w = np.exp(lw - np.max(lw, axis=1, keepdims=True))
        pit[lo : lo + part_ll.shape[1]] = np.sum(
            w.T * part_c, axis=0
        ) / np.sum(w.T, axis=0)
        kss[lo : lo + part_ll.shape[1]] = ks
    from scipy.stats import kstest

    ks_stat, ks_p = kstest(pit, "uniform")
    res = LOOPITResult(
        pit=pit,
        ks_stat=float(ks_stat),
        ks_pvalue=float(ks_p),
        pareto_k=kss,
    )
    nbad = int(np.sum(kss > 0.7))
    if nbad:
        res.notes.append(
            f"{nbad} pixels have Pareto k > 0.7 — their PIT values are "
            "unreliable"
        )
        warnings.warn(res.notes[-1])
    return res


def criticism_header_stats(model, database, draws=500):
    """FITS header cards summarizing the criticism diagnostics.

    One fused chain replay (LOO + PIT share the device maps and the
    smoothed weights' inputs) + the sensitivity replay; returns
    ``{KEY: (value, comment)}`` for the posterior-image headers — the
    same observability convention the reference established (metadata
    lives in FITS headers) extended with the modern diagnostics.
    """
    from collections import OrderedDict

    from ..models.multicomponent import as_model
    from .sensitivity import power_scale_sensitivity

    model = as_model(model)
    thetas = _resolve_thetas(model, database, None, draws)
    ll, cdfm = _pointwise_matrix_pair(model, thetas, 256)
    loo = psis_loo(loglike=ll)
    pit = loo_pit(loglike=ll, cdf=cdfm)
    sens = power_scale_sensitivity(model, thetas=thetas)
    return OrderedDict(
        [
            ("MCLOOELP", (round(loo.elpd, 2),
                          "PSIS-LOO expected log pred density")),
            ("MCLOOSE", (round(loo.se, 2), "PSIS-LOO standard error")),
            ("MCLOOPEF", (round(loo.p_eff, 2),
                          "PSIS-LOO effective parameter count")),
            ("MCLOOKBD", (int(np.sum(loo.pareto_k > 0.7)),
                          "pixels with Pareto k > 0.7 (unreliable)")),
            ("MCPITKS", (round(pit.ks_stat, 4),
                         "LOO-PIT KS distance from uniform")),
            ("MCPITP", (round(pit.ks_pvalue, 4),
                        "LOO-PIT KS p-value (low = miscalibrated)")),
            ("MCPSFLAG", (len(sens.flagged()),
                          "params w/ prior power-scaling sensitivity")),
        ]
    )


def compare(a: ELPDResult, b: ELPDResult):
    """Paired comparison of two fits of the SAME data.

    Returns ``(delta_elpd, se_delta)`` for ``a - b``: positive favors
    ``a``.  The standard error is computed from the PAIRED per-pixel
    differences (the pixelwise sampling noise is shared between the two
    models, so the paired SE is far smaller than combining the two
    marginal SEs — same data points required, asserted).
    """
    if a.unit != b.unit:
        raise ValueError(
            "compare() cannot mix ELPD units: "
            f"{a.unit} vs {b.unit} (per-pixel and per-target "
            "densities are not on the same scale)"
        )
    if a.elpd_i.shape != b.elpd_i.shape:
        raise ValueError(
            "compare() needs two fits of the same data "
            f"(got {a.elpd_i.shape} vs {b.elpd_i.shape} "
            f"{a.unit}/{b.unit})"
        )
    d = a.elpd_i - b.elpd_i
    return float(np.sum(d)), float(np.sqrt(d.size * np.var(d)))


# ---------------------------------------------------------------------------
# internals
# ---------------------------------------------------------------------------

def _logsumexp(a, axis):
    m = np.max(a, axis=axis, keepdims=True)
    out = np.log(np.sum(np.exp(a - m), axis=axis)) + np.squeeze(m, axis)
    return out


def _gpd_fit(x):
    """Generalized-Pareto (shape k, scale sigma) fit to exceedances.

    ``x`` is (P, M) ascending-sorted positive exceedances; returns
    (k, sigma) arrays of shape (P,).  Method: the profile-posterior
    point estimate of Zhang & Stephens 2009 (their quadrature grid over
    the reparametrization b = k/sigma, weights from the profile
    likelihood), plus the weak mean-0.5 shape prior of Vehtari et al.
    2017 appendix C that stabilizes small tails.  Written from the
    papers; vectorized over the leading point axis.
    """
    p, m = x.shape
    n_grid = 30 + int(np.sqrt(m))
    j = np.arange(1.0, n_grid + 1.0)
    x_quart = x[:, int(m / 4.0 + 0.5) - 1]
    x_max = x[:, -1]
    # grid over b; each row's grid adapts to its own scale
    b = (
        1.0 / x_max[:, None]
        + (1.0 - np.sqrt(n_grid / (j - 0.5)))[None, :]
        / (3.0 * x_quart[:, None])
    )  # (P, G)
    # Profile likelihood over the grid.  NB sign convention: our
    # k_b = mean log(1 - b x) is the STANDARD GPD shape xi, which is
    # the NEGATIVE of Zhang & Stephens' k — their profile
    # l(b) = M [log(b/k_ZS) + k_ZS - 1] therefore reads -k_b here.
    with np.errstate(invalid="ignore", divide="ignore"):
        k_b = np.mean(np.log1p(-b[:, :, None] * x[:, None, :]), axis=2)
        l_b = m * (np.log(-b / k_b) - k_b - 1.0)
    l_b = np.where(np.isfinite(l_b), l_b, -np.inf)
    # normalized profile-posterior weights over the grid
    w = np.exp(l_b - np.max(l_b, axis=1, keepdims=True))
    w /= np.sum(w, axis=1, keepdims=True)
    b_hat = np.sum(b * w, axis=1)
    k_hat = np.mean(np.log1p(-b_hat[:, None] * x), axis=1)
    # sigma comes from the UNregularized k (k and b are linked by
    # sigma = -k/b; shrinking k first would break the link and can even
    # flip sigma's sign near k ~ 0); only the returned shape gets the
    # weak mean-0.5 prior (10 pseudo-observations) that stabilizes the
    # k diagnostic for short tails
    sigma = -k_hat / b_hat
    k_hat = (m * k_hat + 10 * 0.5) / (m + 10.0)
    return k_hat, sigma


def _gpd_quantile(q, k, sigma):
    """Inverse CDF of the GPD at probabilities q (broadcast over rows)."""
    k = k[:, None]
    sigma = sigma[:, None]
    small = np.abs(k) < 1e-12
    safe_k = np.where(small, 1.0, k)
    return np.where(
        small,
        -sigma * np.log1p(-q),
        sigma / safe_k * (np.power(1.0 - q, -safe_k) - 1.0),
    )


def _psis_smooth(lr):
    """Pareto-smooth raw log importance ratios.

    ``lr`` is (P, S) — one row of S log-ratios per data point.
    Returns (smoothed log-weights (P, S) — NOT normalized, capped at
    the per-row raw max — and the Pareto shape k per row).  Rows whose
    tail is too short or degenerate (S too small, zero-variance
    weights) are passed through with k = -inf (nothing to smooth).
    """
    p, s = lr.shape
    lw = lr - np.max(lr, axis=1, keepdims=True)
    m = int(min(0.2 * s, 3.0 * np.sqrt(s)))
    ks = np.full(p, -np.inf)
    if m < 5:
        return lw, ks
    order = np.argsort(lw, axis=1)
    tail_idx = order[:, s - m :]
    rows = np.arange(p)[:, None]
    tail_lw = lw[rows, tail_idx]  # ascending (P, M)
    cutoff = np.exp(lw[rows[:, 0], order[:, s - m - 1]])  # (P,)
    exceed = np.exp(tail_lw) - cutoff[:, None]
    # Degenerate rows: (a) a tail that never exceeds the cutoff
    # (all-equal weights) stays unsmoothed with k = -inf; (b) a tail so
    # extreme that all but the top few weights underflowed to zero on
    # the max-normalized scale (the quartile order statistic the grid
    # needs is 0) cannot be fit — flag it k = +inf, which is the honest
    # verdict: one draw dominates the weights completely.
    quart = exceed[:, max(int(m / 4.0 + 0.5) - 1, 0)]
    has_tail = exceed[:, -1] > 1e-300
    ks[has_tail & ~(quart > 0.0)] = np.inf
    ok = has_tail & (quart > 0.0)
    if np.any(ok):
        k_ok, sig_ok = _gpd_fit(exceed[ok])
        # a fit that did not converge to a proper GPD (non-finite or
        # non-positive scale) cannot smooth anything — flag those rows
        # unreliable and leave their raw weights in place
        fit_ok = (
            np.isfinite(k_ok) & np.isfinite(sig_ok) & (sig_ok > 0.0)
        )
        ks_ok = np.where(fit_ok, k_ok, np.inf)
        ks[ok] = ks_ok
        if np.any(fit_ok):
            idx_ok = np.flatnonzero(ok)[fit_ok]
            q = (np.arange(1.0, m + 1.0) - 0.5) / m
            smoothed = cutoff[idx_ok, None] + _gpd_quantile(
                q[None, :], k_ok[fit_ok], sig_ok[fit_ok]
            )
            # cap at the raw max (= 1 on this scale): smoothing must
            # not create weights larger than any observed ratio
            new_lw = np.minimum(
                np.log(np.maximum(smoothed, 1e-300)), 0.0
            )
            sub = lw[idx_ok]
            sub[np.arange(sub.shape[0])[:, None], tail_idx[idx_ok]] = (
                new_lw
            )
            lw[idx_ok] = sub
    return lw, ks
