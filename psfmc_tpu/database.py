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
from .parallel.multihost import barrier, is_primary

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
    "MCDATSUM": "crc32 of obs+ivm data (resume identity check)",
    "MCLNZ": "ln marginal likelihood (tempered-run estimate)",
    "MCLNZERR": "ln evidence error (estimator spread)",
    "MCPPCP": "posterior-predictive p-value (deviance)",
    "MAPLNP": "Log-posterior of the MAP fit",
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
    layout (nwalkers, niter, dim) — same as emcee's).  A sampler with no
    recorded chain yet (mid-burn checkpoint) writes a zero-row trace
    table whose CHECKPOINT extension still enables resume.
    """
    if sampler.chain is None:
        dim = sum(model.param_lens)
        chain = np.zeros((getattr(sampler, "nwalkers", 0), 0, dim))
        lnprobability = np.zeros(chain.shape[:2])
    else:
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
    if niter > 0:
        map_row = int(np.argmax(columns["lnprobability"]))
        meta["MAPWLKR"] = int(walker_col[map_row])
        meta["MAPSAMP"] = int(sample_col[map_row])
    meta = annotate_metadata(meta)

    tbl = Table(columns, meta=meta)

    extra_hdus = []
    state = getattr(sampler, "state", None)
    if state is not None:
        ckpt_payload = sampler.checkpoint_payload()
        ckpt_payload["sampler_kind"] = getattr(
            sampler, "checkpoint_kind", "ensemble"
        )
        extra_hdus.extend(_checkpoint_hdus(ckpt_payload))

    if not is_primary():
        # Multi-process run: every host assembles the identical table
        # (the sampler's device->host fetches replicate global arrays to
        # all hosts) but only process 0 touches the filesystem
        # (SURVEY.md section 5, "DB writes from host 0 only").  Return
        # the in-memory table with loaded-style meta (values only).
        tbl.meta = OrderedDict(
            (k, v[0] if isinstance(v, tuple) else v)
            for k, v in tbl.meta.items()
        )
        barrier("save_database")  # pairs with the primary's post-write
        return tbl

    tbl.write(db_name, format="fits", extname="TRACE", extra_hdus=extra_hdus)
    # No host may proceed until the file is on disk: a follow-up driver
    # call branches on the DB's existence (resume), and a non-primary
    # host racing ahead would diverge control flow and deadlock the
    # next collective.
    barrier("save_database")
    return load_database(db_name)


def _checkpoint_hdus(payload):
    """Serialize a sampler checkpoint payload (v2) to bintable HDUs.

    CHECKPOINT holds the per-walker state — for tempered samplers every
    rung, row-major ``(ntemps * nwalkers)`` rows with CKPTTEMP in the
    header.  CKPTIMGS holds the running posterior-image accumulators
    (one (h, w) column per image type, CKPTACCN samples), so a resumed
    run keeps streaming means instead of replaying the chain.
    """
    ntemps = int(payload.get("ntemps", 1))
    pos = np.asarray(payload["positions"], dtype=np.float64)
    if pos.ndim == 3:
        pos = pos.reshape(-1, pos.shape[-1])
    nrows = pos.shape[0]
    lnp = np.asarray(payload["log_prob"], dtype=np.float64).reshape(-1)
    if lnp.shape[0] != nrows:  # cold-rung lnp with multi-rung positions
        lnp = np.concatenate([lnp, np.zeros(nrows - lnp.shape[0])])
    naccept = np.asarray(payload["naccept"], dtype=np.int64).reshape(-1)
    key = np.asarray(payload["key"]).astype(np.int64)
    cols = OrderedDict(
        [
            ("position", pos),
            ("log_prob", lnp),
            ("naccept", naccept),
            # PRNG key replicated per row for rectangular storage
            ("prng_key", np.tile(key[None, :], (nrows, 1))),
        ]
    )
    meta = [
        ("CKPTVERS", (2, "checkpoint format version")),
        ("CKPTSMPL", (str(payload.get("sampler_kind", "ensemble")),
                      "sampler family that wrote this checkpoint")),
        ("CKPTTEMP", (ntemps, "parallel-tempering rungs in checkpoint")),
        ("CKPTACCN", (int(payload.get("accum_count", 0)),
                      "samples in image accumulators")),
        ("CKPTSTEP", (int(payload.get("nsteps", 0)),
                      "steps since last sampler reset")),
    ]
    def _padded_col(values, fill=0.0):
        # small per-rung arrays ride as padded per-row columns: header
        # CSVs silently truncate at the 68-char FITS card limit (which
        # corrupted long nswap ladders)
        out = np.full(nrows, fill, np.float64)
        v = np.ravel(np.asarray(values, np.float64))
        out[: len(v)] = v
        return out

    nswap = payload.get("nswap")
    if nswap is not None:
        cols["nswap"] = _padded_col(nswap, fill=-1.0)
    betas = payload.get("betas")
    if betas is not None and ntemps > 1:
        # per-row rung beta (a header CSV would overflow the 68-char
        # FITS card limit for long ladders)
        cols["beta"] = np.repeat(
            np.asarray(betas, np.float64), nrows // ntemps
        )
    # tempered evidence accumulators (checkpoint v2.1): without these a
    # resumed run silently recomputes MCLNZ from post-resume steps only
    if payload.get("lnl_sum") is not None:
        cols["evid_lnl_sum"] = _padded_col(payload["lnl_sum"])
        cols["evid_lnl_sq_sum"] = _padded_col(payload["lnl_sq_sum"])
        cols["evid_ss_max"] = _padded_col(payload["ss_max"])
        cols["evid_ss_sum"] = _padded_col(payload["ss_sum"])
        meta.append(
            ("CKPTEVID", (int(payload.get("evid_steps", 0)),
                          "retained steps in evidence accumulators"))
        )
    if payload.get("sum_accept") is not None:
        meta.append(
            ("CKPTACCS", (float(payload["sum_accept"]),
                          "acceptance-statistic numerator"))
        )
    if payload.get("nuts_eps") is not None:
        meta.append(
            ("CKPTEPS", (float(payload["nuts_eps"]),
                         "NUTS warmup-adapted step size"))
        )
    hdr, raw = fits.make_bintable_hdu(
        list(cols.keys()), cols, meta=meta, extname="CHECKPOINT"
    )
    hdus = [(hdr, raw)]

    accum = payload.get("accum")
    if accum and int(payload.get("accum_count", 0)) > 0:
        shapes = {name: np.asarray(img).shape for name, img in accum.items()}
        if len(set(shapes.values())) == 1:
            # uniform shapes (single-band): rows = H, width = W — the
            # v2.1 layout, kept for checkpoint compatibility
            img_cols = OrderedDict(
                (name, np.asarray(img, dtype=np.float64))
                for name, img in accum.items()
            )
            img_hdr, img_raw = fits.make_bintable_hdu(
                list(img_cols.keys()), img_cols, extname="CKPTIMGS"
            )
        else:
            # mixed shapes (joint multi-band accumulators): one ROW of
            # per-column array cells (bintable widths may differ per
            # column only with a single row); shapes ride meta cards
            img_cols = OrderedDict(
                (name, np.asarray(img, np.float64).ravel()[None, :])
                for name, img in accum.items()
            )
            img_meta = [
                (f"CKIMSH{i}", ("%d,%d" % shapes[name],
                                f"shape of column {i}"))
                for i, name in enumerate(img_cols)
            ]
            img_hdr, img_raw = fits.make_bintable_hdu(
                list(img_cols.keys()), img_cols, meta=img_meta,
                extname="CKPTIMGS",
            )
        hdus.append((img_hdr, img_raw))

    inv_mass = payload.get("nuts_inv_mass")
    if inv_mass is not None:
        # NUTS diagonal metric: its length (unconstrained dim) differs
        # from the walker-row count, so it gets its own extension
        m_hdr, m_raw = fits.make_bintable_hdu(
            ["inv_mass"],
            {"inv_mass": np.asarray(inv_mass, np.float64)},
            extname="CKPTNUTS",
        )
        hdus.append((m_hdr, m_raw))
    return hdus


def load_database(db_name):
    """Load the TRACE table from a database file."""
    return Table.read(db_name, format="fits", extname="TRACE")


def load_checkpoint(db_name):
    """Load sampler resume state as a payload dict (see
    ``EnsembleSampler.checkpoint_payload``), or None if the database has
    no CHECKPOINT extension.  Reads both v1 (cold state only) and v2
    (tempering rungs + image accumulators) checkpoints.
    """
    try:
        ckpt = Table.read(db_name, format="fits", extname="CHECKPOINT")
    except IOError:
        return None
    version = int(ckpt.meta.get("CKPTVERS", 1))
    ntemps = int(ckpt.meta.get("CKPTTEMP", 1))
    positions = np.asarray(ckpt["position"], dtype=np.float64)
    lnp = np.asarray(ckpt["log_prob"], dtype=np.float64)
    naccept = np.asarray(ckpt["naccept"], dtype=np.int64)
    key = np.asarray(ckpt["prng_key"][0], dtype=np.uint32)
    payload = {
        "version": version,
        "ntemps": ntemps,
        "positions": positions,
        "log_prob": lnp,
        "naccept": naccept,
        "key": key,
        "accum": None,
        "accum_count": int(ckpt.meta.get("CKPTACCN", 0)),
        "nsteps": int(ckpt.meta.get("CKPTSTEP", 0)),
        # older checkpoints carry no CKPTSMPL: infer nuts from its
        # adaptation cards, else stretch-family
        "sampler_kind": str(ckpt.meta.get(
            "CKPTSMPL",
            "nuts" if ckpt.meta.get("CKPTEPS") is not None
            else "ensemble",
        )),
    }
    if ntemps > 1:
        dim = positions.shape[-1]
        payload["positions"] = positions.reshape(ntemps, -1, dim)
        payload["naccept"] = naccept.reshape(ntemps, -1)
        payload["log_prob"] = lnp.reshape(ntemps, -1)[0]
        if "nswap" in ckpt.colnames:
            payload["nswap"] = np.asarray(
                ckpt["nswap"], np.float64
            )[: ntemps - 1].astype(np.int64)
        else:
            # legacy header CSV (card-truncated beyond ~68 chars; keep
            # best-effort reading for old files)
            nswap = ckpt.meta.get("CKPTNSWP")
            if nswap is not None:
                try:
                    payload["nswap"] = np.array(
                        [int(v) for v in str(nswap).split(",")],
                        dtype=np.int64,
                    )
                except ValueError:
                    pass
        if "evid_lnl_sum" in ckpt.colnames:
            payload["lnl_sum"] = np.asarray(
                ckpt["evid_lnl_sum"], np.float64
            )[:ntemps]
            payload["lnl_sq_sum"] = np.asarray(
                ckpt["evid_lnl_sq_sum"], np.float64
            )[:ntemps]
            payload["ss_max"] = np.asarray(
                ckpt["evid_ss_max"], np.float64
            )[: ntemps - 1]
            payload["ss_sum"] = np.asarray(
                ckpt["evid_ss_sum"], np.float64
            )[: ntemps - 1]
            payload["evid_steps"] = int(ckpt.meta.get("CKPTEVID", 0))
        if "beta" in ckpt:
            payload["betas"] = np.asarray(
                ckpt["beta"], dtype=np.float64
            ).reshape(ntemps, -1)[:, 0]
    if payload["accum_count"] > 0:
        try:
            imgs = Table.read(db_name, format="fits", extname="CKPTIMGS")
            accum = {}
            for i, name in enumerate(imgs.colnames):
                col = np.asarray(imgs[name], dtype=np.float64)
                shape_card = imgs.meta.get(f"CKIMSH{i}")
                if shape_card is not None:
                    # mixed-shape layout: single row of array cells
                    shape = tuple(
                        int(v) for v in str(shape_card).split(",")
                    )
                    col = col.reshape(shape)
                accum[name] = col
            payload["accum"] = accum
        except IOError:
            payload["accum_count"] = 0
    accs = ckpt.meta.get("CKPTACCS")
    if accs is not None:
        payload["sum_accept"] = float(accs)
    eps = ckpt.meta.get("CKPTEPS")
    if eps is not None:
        payload["nuts_eps"] = float(eps)
        try:
            metric = Table.read(db_name, format="fits", extname="CKPTNUTS")
            payload["nuts_inv_mass"] = np.asarray(
                metric["inv_mass"], dtype=np.float64
            )
        except IOError:
            pass
    return payload


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
