"""Convergence statistics: Gelman-Rubin PSRF, effective samples, autocorr.

Parity with reference analysis/statistics.py:7-155.  The default
convergence check used by the fitting driver is
:func:`check_convergence_autocorr`: converged when the chain is at least
``min_chain_to_tau_ratio`` times longer than the integrated
autocorrelation time of every parameter (estimated with the dirty c=1
window, like the reference).
"""
from __future__ import annotations

from warnings import warn

import numpy as np

from ..sampler.autocorr import AutocorrError

__all__ = [
    "potential_scale_reduction",
    "num_effective_samples",
    "check_convergence_autocorr",
    "check_convergence_psrf",
    "summary",
]


def _between_variance(traces):
    """Variance of the individual chain means (Gelman 2nd ed. p.303)."""
    nsamples, nchains = traces.shape
    chain_means = np.mean(traces, axis=0)
    total_mean = np.mean(chain_means)
    return nsamples / (nchains - 1) * np.sum((chain_means - total_mean) ** 2)


def _within_variance(traces):
    """Mean of the individual chain variances (Gelman 2nd ed. p.303)."""
    nsamples, _nchains = traces.shape
    chain_means = np.mean(traces, axis=0)
    col_vars = np.sum((traces - chain_means) ** 2, axis=0) / (nsamples - 1)
    return np.mean(col_vars)


def _pooled_posterior_variance(traces):
    """Weighted average of within/between variance (Gelman Eqn 11.3)."""
    nsamples, _ = traces.shape
    return (nsamples - 1) / nsamples * _within_variance(traces) + \
        _between_variance(traces) / nsamples


def potential_scale_reduction(traces):
    """Gelman-Rubin R-hat over a list of 1-D chains.

    Chains are promoted to float64 before any reduction: summing tens of
    thousands of float32 samples sequentially accumulates rounding drift
    of order 1e-3 on O(10) values — enough to visibly corrupt means and
    (through the two-pass variance) inflate stds.
    """
    all_samps = np.column_stack(traces).astype(np.float64)
    nsamples, nchains = all_samps.shape
    psrf_scale = (nchains + 1) / nchains
    psrf_offset = (1 - nsamples) / (nchains * nsamples)
    pooled_var = _pooled_posterior_variance(all_samps)
    within_var = _within_variance(all_samps)
    if within_var == 0:
        return 1.0
    return np.sqrt(psrf_scale * pooled_var / within_var + psrf_offset)


def num_effective_samples(traces):
    """Effective sample count corrected for chain autocorrelation."""
    all_samps = np.column_stack(traces).astype(np.float64)
    nsamples, nchains = all_samps.shape
    pooled_var = _pooled_posterior_variance(all_samps)
    between_var = _between_variance(all_samps)
    if between_var == 0 or pooled_var > between_var:
        return nsamples * nchains
    return nsamples * nchains * pooled_var / between_var


def check_convergence_autocorr(sampler, min_chain_to_tau_ratio=10, verbose=0):
    """True when chain length > ratio x integrated autocorrelation time.

    ``sampler`` is an EnsembleSampler (or anything exposing
    ``get_autocorr_time(c=1)`` and ``chain`` of shape
    (nwalkers, nsteps, dim)).
    """
    try:
        acorr = sampler.get_autocorr_time(c=1)
    except AutocorrError:
        warn(
            "Unable to estimate the autocorrelation time; assuming chain "
            "is not converged"
        )
        return False
    if verbose > 0:
        print(f"Autocorrelation times: {acorr}")
    nsamples = sampler.chain.shape[1]
    return bool(np.all(nsamples > min_chain_to_tau_ratio * np.asarray(acorr)))


def check_convergence_psrf(chains, psrf_tol=0.05, verbose=0):
    """Gelman-Rubin convergence over a (nwalkers, nsteps, dim) chain array.

    Converged when |R-hat - 1| < tol for every parameter.  (The
    reference's PSRF check targeted its legacy pymc interface; this is
    the working ensemble-chain equivalent.)
    """
    chains = np.asarray(chains)
    if chains.shape[0] < 2:
        return True
    converged = True
    for p in range(chains.shape[2]):
        traces = [chains[w, :, p] for w in range(chains.shape[0])]
        psrf = potential_scale_reduction(traces)
        if verbose > 0:
            print(f"param {p}: PSRF = {psrf}")
        converged &= abs(psrf - 1.0) < psrf_tol
    return bool(converged)


def summary(database, percentiles=(16.0, 50.0, 84.0)):
    """Posterior summary table: one row per scalar trace column.

    Returns an OrderedDict mapping trace name (vector stochastics like
    ``xy`` expand to ``name_0``/``name_1``) to a dict with ``mean``,
    ``std`` and one ``p{q:g}`` entry per requested percentile —
    everything promoted to f64 before reduction (the f32 summation
    drift documented in the project notes corrupts means of long
    chains).  A quick programmatic companion to the FITS header stats.
    """
    from collections import OrderedDict

    out = OrderedDict()
    skip = {"walker", "sample"}
    for name in database.colnames:
        if name in skip:
            continue
        col = np.asarray(database[name], dtype=np.float64)
        cols = (
            [(name, col)]
            if col.ndim == 1
            else [(f"{name}_{i}", col[:, i]) for i in range(col.shape[1])]
        )
        for cname, values in cols:
            stats = {
                "mean": float(np.mean(values)),
                "std": float(np.std(values)),
            }
            qs = np.percentile(values, percentiles)
            for q, v in zip(percentiles, qs):
                stats[f"p{q:g}"] = float(v)
            out[cname] = stats
    return out
