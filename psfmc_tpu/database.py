"""MCMC trace database: FITS binary table + sampler checkpoint.

Format parity with the reference (reference database.py:6-56): one
binary-table column per stochastic (vector stochastics like ``xy`` are
2-wide columns), plus ``lnprobability``, ``walker``, ``sample``; sampler
metadata and MAP indices live in the table header.

Fixed reference bugs (documented divergences, SURVEY.md section 7):

* the reference's ``sample`` column used ``np.repeat`` where the
  per-walker sample index requires tiling (database.py:28) — correct
  here,
* ``get_sampler_state`` had an off-by-one row index and read the
  ``walker`` column as lnprobability (database.py:73,80) — correct here,
* the reference never persisted sampler random state (its resume TODO,
  fitting.py:63); we store a CHECKPOINT extension with the final walker
  positions, log-probabilities, accumulated posterior-image means and
  the JAX PRNG key, enabling true resume.
"""
from __future__ import annotations

from collections import OrderedDict

import numpy as np

from .io import fits
from .io.table import Table

__all__ = [
    "save_database",
    "load_database",
    "get_sampler_state",
    "load_checkpoint",
    "row_to_param_vector",
    "annotate_metadata",
    "filter_lowp_walkers",
]

_HEADER_COMMENTS = {
    "MCITER": "number of retained samples",
    "MCBURN": "number of burn-in (discarded) samples",
    "MCCHAINS": "number of walkers run",
    "MCWALKRS": "number of walkers run",
    "MCCONVRG": "Has MCMC sampler converged?",
    "MCACCEPT": "Acceptance fraction (avg of all walkers)",
    "MAPWLKR": "Walker index of maximum posterior model",
    "MAPSAMP": "Sample index of maximum posterior model",
    "PSFIMG": "PSF image of maximum posterior model",
}


def annotate_metadata(input_dict):
    """Attach FITS comments to metadata keys (unknown => model param)."""
    out = OrderedDict()
    for key, value in input_dict.items():
        if isinstance(value, tuple):
            out[key] = value
        else:
            out[key] = (value, _HEADER_COMMENTS.get(key, "psfMC model parameter"))
    return out


def _chain_columns(chain, param_names, param_lens):
    """Split a flat (nsamples, dim) chain into named columns."""
    split_inds = np.cumsum(param_lens)[:-1]
    cols = np.split(chain, split_inds, axis=1)
    out = OrderedDict()
    for name, col in zip(param_names, cols):
        out[name] = col[:, 0] if col.shape[1] == 1 else col
    return out


def save_database(sampler, model, db_name, meta_dict=None):
    """Write the trace database + checkpoint extension; returns the Table.

    ``sampler`` is a :class:`psfmc_tpu.sampler.EnsembleSampler` (chain
    layout (nwalkers, niter, dim) — same as emcee's).
    """
    chain = np.asarray(sampler.chain, dtype=np.float64)
    lnprobability = np.asarray(sampler.lnprobability, dtype=np.float64)
    nwalkers, niter, dim = chain.shape

    flat = chain.reshape(nwalkers * niter, dim)
    columns = _chain_columns(flat, model.param_names, model.param_lens)

    walker_col = np.repeat(np.arange(nwalkers, dtype=np.int64), niter)
    sample_col = np.tile(np.arange(niter, dtype=np.int64), nwalkers)
    columns["lnprobability"] = lnprobability.reshape(-1)
    columns["walker"] = walker_col
    columns["sample"] = sample_col

    meta = OrderedDict(meta_dict or {})
    map_row = int(np.argmax(columns["lnprobability"]))
    meta["MAPWLKR"] = int(walker_col[map_row])
    meta["MAPSAMP"] = int(sample_col[map_row])
    meta = annotate_metadata(meta)

    tbl = Table(columns, meta=meta)

    extra_hdus = []
    state = getattr(sampler, "state", None)
    if state is not None:
        extra_hdus.append(_checkpoint_hdu(sampler))

    tbl.write(db_name, format="fits", extname="TRACE", extra_hdus=extra_hdus)
    return load_database(db_name)


def _checkpoint_hdu(sampler):
    """Build the CHECKPOINT bintable HDU from sampler state."""
    positions, log_prob, naccept_, key_ = sampler.checkpoint_state()
    pos = np.asarray(positions, dtype=np.float64)
    lnp = np.asarray(log_prob, dtype=np.float64)
    key = np.asarray(key_).astype(np.int64)
    naccept = np.asarray(naccept_, dtype=np.int64)
    nw = pos.shape[0]
    cols = OrderedDict(
        [
            ("position", pos),
            ("log_prob", lnp),
            ("naccept", naccept),
            # PRNG key replicated per row for rectangular storage
            ("prng_key", np.tile(key[None, :], (nw, 1))),
        ]
    )
    meta = [("CKPTVERS", (1, "checkpoint format version"))]
    hdr, raw = fits.make_bintable_hdu(
        list(cols.keys()), cols, meta=meta, extname="CHECKPOINT"
    )
    return (hdr, raw)


def load_database(db_name):
    """Load the TRACE table from a database file."""
    return Table.read(db_name, format="fits", extname="TRACE")


def load_checkpoint(db_name):
    """Load sampler resume state: (positions, log_prob, naccept, key).

    Returns None if the database has no CHECKPOINT extension.
    """
    try:
        ckpt = Table.read(db_name, format="fits", extname="CHECKPOINT")
    except IOError:
        return None
    positions = np.asarray(ckpt["position"], dtype=np.float64)
    lnp = np.asarray(ckpt["log_prob"], dtype=np.float64)
    naccept = np.asarray(ckpt["naccept"], dtype=np.int64)
    key = np.asarray(ckpt["prng_key"][0], dtype=np.uint32)
    return positions, lnp, naccept, key


def get_sampler_state(database):
    """Final walker positions + lnprobability from the trace table.

    (Bug-fixed version of reference database.py:59-83.)  Prefer
    :func:`load_checkpoint` when the CHECKPOINT extension exists.
    """
    stochastic_cols = [
        c
        for c in database.colnames
        if c not in ("walker", "sample", "lnprobability")
    ]
    nwalkers = int(database["walker"].max()) + 1
    niter = len(database) // nwalkers
    last_rows = np.arange(nwalkers) * niter + (niter - 1)

    parts = [
        np.asarray(database[c], dtype=np.float64).reshape(len(database), -1)
        for c in stochastic_cols
    ]
    flat = np.concatenate(parts, axis=1)
    walker_pos = flat[last_rows]
    ln_prob = np.asarray(database["lnprobability"], dtype=np.float64)[last_rows]
    return walker_pos, ln_prob


def row_to_param_vector(table_row):
    """Concatenate a table row (tuple of per-column values) to a vector."""
    return np.concatenate(
        [np.atleast_1d(np.asarray(v, dtype=np.float64)) for v in table_row]
    )


def filter_lowp_walkers(database, percentile=10):
    """Drop walkers whose every sample is below the lnp percentile.

    Removes "lost" walkers that never reach the high-probability region
    (reference database.py:112-126).
    """
    pct_value = np.percentile(database["lnprobability"], percentile)
    ok_walkers = np.unique(
        database["walker"][database["lnprobability"] > pct_value]
    )
    return database[np.isin(database["walker"], ok_walkers)]
