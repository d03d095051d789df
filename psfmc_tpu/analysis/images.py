"""Posterior model image writer.

Parity with reference analysis/images.py:17-152: writes the five image
types as FITS in two modes —

* ``weighted`` (default): per-pixel posterior mean over retained
  samples.  If the model already accumulated running means during
  sampling those are reused; otherwise every database row is replayed
  through the model — here as **batched vmapped renders** (one XLA
  program over row chunks) instead of the reference's per-row Python
  loop (images.py:74-83),
* ``maximum`` / ``MAP``: single highest-probability sample (the
  reference's MAP mode was broken by a ``lnprobablity`` typo at
  images.py:60 — fixed here).

Headers carry the sampler metadata, per-parameter posterior mean +/- std
under FITS-abbreviated names, MAP indices, and the PSF filename.
"""
from __future__ import annotations

from collections import OrderedDict
from warnings import warn

import numpy as np

from ..database import annotate_metadata, filter_lowp_walkers, row_to_param_vector
from ..io import fits

__all__ = ["save_posterior_images", "default_filetypes"]

default_filetypes = (
    "raw_model",
    "convolved_model",
    "composite_ivm",
    "residual",
    "point_source_subtracted",
)

_REPLAY_CHUNK = 2048  # rows per on-device batched mean


def save_posterior_images(
    model,
    database,
    output_name="out_{}",
    mode="weighted",
    filetypes=default_filetypes,
    bad_px_value=0,
    walker_min_percentile=10,
    ppc_draws=100,
    criticism_draws=0,
):
    """Write posterior model images as FITS files.

    :param model: MultiComponentModel defining the model.
    :param database: trace Table (from save_database/load_database).
    :param output_name: base output name; '{}' is replaced per filetype.
    :param mode: 'weighted' (posterior-mean) or 'maximum'/'MAP'.
    :param bad_px_value: replacement value for non-finite pixels.
    :param walker_min_percentile: stuck-walker filter threshold.
    :param ppc_draws: posterior draws for the MCPPCP header stat
        (posterior-predictive p-value); 0 disables it — the check
        renders ``ppc_draws`` models, which costs one extra batched
        compile on cold caches.
    :param criticism_draws: posterior draws replayed for the criticism
        header block (MCLOOELP/SE/PEF/KBD, MCPITKS/P, MCPSFLAG — see
        analysis.model_comparison.criticism_header_stats); 0 (default)
        disables it — the replay costs ~one more batched render pass.
    """
    header = model.obs_header.copy() if model.obs_header else fits.Header()
    if "{}" not in output_name:
        output_name += "_{}"

    database = filter_lowp_walkers(database, percentile=walker_min_percentile)

    _add_stats_to_header(header, model, database, ppc_draws=ppc_draws)
    if criticism_draws:
        import warnings as _warnings

        from .model_comparison import criticism_header_stats

        try:
            with _warnings.catch_warnings():
                _warnings.simplefilter("ignore")
                cards = criticism_header_stats(
                    model, database, draws=criticism_draws
                )
            for key, (value, comment) in cards.items():
                header.set(key, value, comment)
        except Exception as err:  # noqa: BLE001 - headers must not kill IO
            warn(f"could not compute criticism header stats: {err}")

    from ..parallel.multihost import is_primary

    if is_primary():
        print("Saving posterior models")
    unknown = {ftype for ftype in filetypes if not hasattr(model, ftype)}
    if unknown:
        warn(
            f"Unknown filetypes requested: {unknown} Output images will "
            "not be generated for these types."
        )
        filetypes = [f for f in filetypes if f not in unknown]

    stochastic_cols = list(model.param_names)
    output_data = {}

    if mode in ("maximum", "MAP"):
        best = int(np.argmax(database["lnprobability"]))
        best_row = database[stochastic_cols][best]
        model.param_values = row_to_param_vector(best_row)
        imgs = model.render_images_batch(model._param_vector[None, :])
        for ftype in filetypes:
            if ftype not in imgs:
                # posterior-dispersion products (raw_model_std) are
                # undefined for a single MAP sample
                warn(f"{ftype} is not defined in MAP mode; skipping")
                continue
            data = np.asarray(imgs[ftype][0], dtype=np.float64)
            data[~np.isfinite(data)] = bad_px_value
            output_data[ftype] = data

    elif mode in ("weighted",):
        total_samples = len(database)
        if total_samples != model.accumulated_samples:
            # Replay every retained row, averaging ON DEVICE (the old
            # host-side reduction fetched every per-sample image stack
            # — hundreds of GB d2h for a production chain)
            rows = database[stochastic_cols]
            thetas = np.stack([row_to_param_vector(r) for r in rows])
            model.reset_images()
            model.replay_posterior_means(thetas, chunk=_REPLAY_CHUNK)

        for ftype in filetypes:
            if ftype not in model.posterior_images:
                # e.g. raw_model_std with accumulators restored from a
                # pre-raw_sq checkpoint
                warn(f"{ftype} was not accumulated for this run; skipping")
                continue
            out_img = np.asarray(
                model.posterior_images[ftype], dtype=np.float64
            ).copy()
            out_img[~np.isfinite(out_img)] = bad_px_value
            output_data[ftype] = out_img

    else:
        warn(
            f"Unknown posterior output mode ({mode}). Posterior model "
            "images will not be saved."
        )
        return

    write_image_products(
        output_name, output_data, header, filetypes, bad_px_value
    )


def write_image_products(
    output_name,
    images,
    header,
    filetypes=default_filetypes,
    bad_px_value=0,
):
    """Write a dict of (H, W) images as the standard FITS products.

    Shared by the posterior writer and the MAP quick-look driver so
    the two cannot drift: '{}' handling, unknown-filetype warn-and-skip,
    non-finite-pixel replacement, f32 output, OBJECT card per type.

    Multi-process runs write from the primary host only (SURVEY.md
    section 5); other hosts compute the same images and return.
    """
    from ..parallel.multihost import barrier, is_primary

    if not is_primary():
        barrier("write_image_products")
        return
    if "{}" not in output_name:
        output_name += "_{}"
    known = [f for f in filetypes if f in images]
    unknown = set(filetypes) - set(known)
    if unknown:
        warn(
            f"Unknown filetypes requested: {unknown} Output images will "
            "not be generated for these types."
        )
    for ftype in known:
        data = np.array(images[ftype], dtype=np.float64)
        data[~np.isfinite(data)] = bad_px_value
        header.set("OBJECT", ftype)
        fits.writeto(
            output_name.format(ftype) + ".fits",
            data.astype(np.float32),
            header=header,
            overwrite=True,
        )
    barrier("write_image_products")


def _add_stats_to_header(header, model, database, ppc_draws=100):
    """Sampler metadata + per-parameter posterior stats into the header."""
    header.extend(_fits_section_header("psfMC MCMC SAMPLER PARAMETERS"))
    for key, value in annotate_metadata(database.meta).items():
        header.set(key, value[0], value[1])

    header.extend(_fits_section_header("psfMC POSTERIOR MODEL INFORMATION"))

    model_stats = OrderedDict()
    for col_name, fits_abbr in zip(model.param_names, model.param_fits_abbrs):
        col = np.asarray(database[col_name], dtype=np.float64)
        mean_post = np.mean(col, axis=0)
        std_post = np.std(col, axis=0)
        if np.ndim(mean_post) == 0:
            val = f"{mean_post:0.4g} +/- {std_post:0.4g}"
        else:
            strmean = ",".join(f"{dim:0.4g}" for dim in mean_post)
            strstd = ",".join(f"{dim:0.4g}" for dim in std_post)
            val = f"({strmean}) +/- ({strstd})"
        model_stats[fits_abbr] = val

    # Goodness of fit at the MAP sample: reduced chi^2 over good pixels
    # (a quick-look fit-quality number the reference never reported)
    try:
        best = int(np.argmax(np.asarray(database["lnprobability"])))
        best_row = database[list(model.param_names)][best]
        theta_map = row_to_param_vector(best_row)
        imgs = model.render_images_batch(theta_map[None, :])
        resid = np.asarray(imgs["residual"][0], np.float64)
        ivm = np.asarray(imgs["composite_ivm"][0], np.float64)
        good = np.asarray(~model.spec.bad_px)
        n_good = int(good.sum())
        dof = max(n_good - model.num_params, 1)
        if getattr(model.spec, "likelihood", "gaussian") == "poisson":
            # Poisson deviance replaces chi^2: the IVM input is mask-
            # only under this likelihood, so a chi^2 against it would
            # be meaningless
            g = float(getattr(model.spec, "likelihood_gain", 1.0))
            obs_c = np.asarray(model.spec.obs_data, np.float64) * g
            mu = np.maximum(
                np.asarray(imgs["convolved_model"][0], np.float64), 0.0
            ) * g
            ok = good & (mu > 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                r = np.where(
                    obs_c > 0,
                    obs_c * np.log(np.where(obs_c > 0, obs_c, 1.0)
                                   / np.where(mu > 0, mu, 1.0)),
                    0.0,
                )
            dev = 2.0 * float(np.sum(np.where(ok, mu - obs_c + r, 0.0)))
            model_stats["MCCHI2NU"] = (
                round(dev / dof, 4),
                "reduced Poisson deviance of the MAP model",
            )
        else:
            chi2 = float(np.sum((resid * resid * ivm)[good]))
            model_stats["MCCHI2NU"] = (
                round(chi2 / dof, 4),
                "reduced chi-squared of the MAP model",
            )
    except Exception as err:  # noqa: BLE001 - header stat must not kill IO
        warn(f"could not compute MAP reduced chi^2: {err}")

    # Posterior-predictive p-value (deviance PPC): a calibrated
    # misfit flag — near 0 = the model cannot produce data this
    # discrepant, ~0.5 healthy (multicomponent.posterior_predictive_
    # pvalue; joint models expose no single-band PPC here)
    try:
        if ppc_draws and hasattr(model, "posterior_predictive_pvalue"):
            p = model.posterior_predictive_pvalue(
                database, n=ppc_draws, random_state=0
            )
            model_stats["MCPPCP"] = (
                round(p, 4),
                "posterior-predictive p-value (deviance)",
            )
    except Exception as err:  # noqa: BLE001
        warn(f"could not compute posterior-predictive p-value: {err}")

    # PSF of the maximum-posterior sample (reference picked argmax of the
    # walker column by mistake, images.py:137 — use lnprobability).
    psf_selector = model.config.psf_selector
    if len(psf_selector.spatial_psfs) > 1 and "PSF_Index" in database:
        best_row = int(np.argmax(database["lnprobability"]))
        best_psf_index = database["PSF_Index"][best_row]
        psf_selector.set_stochastic_values(np.array([best_psf_index]))
    model_stats["PSFIMG"] = psf_selector.filename

    for key, value in annotate_metadata(model_stats).items():
        header.set(key, value[0], value[1])


def _fits_section_header(section_name):
    """Drizzle-style blank/comment/blank section separator cards."""
    return [("", "", ""), ("", "/ " + section_name, ""), ("", "", "")]
