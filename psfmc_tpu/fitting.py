"""Top-level MCMC fitting driver.

Signature and behavior parity with the reference driver
(``model_galaxy_mcmc``, reference fitting.py:13-113): burn-in, retained
sampling with a convergence-retry loop (chain keeps extending up to
``max_iterations`` rounds), sampler metadata, trace-database save, and
posterior image generation.

TPU-first differences:

* the sampler is this framework's jitted ensemble sampler — each phase
  is a single on-device ``lax.scan`` program rather than a Python
  step loop; posterior-image running means accumulate on device,
* true resume: if the database exists but holds fewer retained samples
  than requested, sampling resumes from the CHECKPOINT extension
  (positions + lnp + PRNG key) — completing the reference's TODO
  (fitting.py:63),
* ``chains`` is rounded up to an even count (half-ensemble moves).
"""
from __future__ import annotations

import os
from collections import OrderedDict
from warnings import warn

import numpy as np

from .analysis.images import default_filetypes, save_posterior_images
from .analysis.statistics import check_convergence_autocorr
from .database import load_checkpoint, load_database, save_database
from .models.multicomponent import MultiComponentModel, as_model
from .parallel.multihost import is_primary
from .sampler.ensemble import EnsembleSampler


def _print(*args, **kwargs):
    """Console output from the primary host only (multi-process runs)."""
    if is_primary():
        print(*args, **kwargs)


__all__ = [
    "model_galaxy_mcmc",
    "model_galaxy_evidence",
    "model_galaxy_map",
]


def model_galaxy_map(
    model_file,
    output_name=None,
    write_fits=default_filetypes,
    n_starts: int = 64,
    steps: int = 500,
    seed: int = 0,
    laplace: bool = True,
):
    """Quick-look gradient MAP fit: best-fit model images in seconds.

    The GALFIT-replacement mode: a multi-start Adam ascent of the
    log-posterior (:func:`psfmc_tpu.optimize.fit_map`) followed by the
    same five FITS image products as a full MCMC run, with best-fit
    parameter values (+/- Laplace standard errors when ``laplace``) in
    the headers under the usual FITS abbreviations.  No trace database
    is written — for posteriors, run :func:`model_galaxy_mcmc` (which
    accepts ``init='map'`` to reuse this fit as its warm start).

    :returns: the :class:`psfmc_tpu.optimize.MAPResult`.
    """
    from collections import OrderedDict as _OD

    from .analysis.images import _fits_section_header, write_image_products
    from .database import annotate_metadata
    from .io import fits
    from .optimize import fit_map

    if output_name is None:
        name = model_file if isinstance(model_file, str) else "model"
        output_name = "out_" + os.path.basename(name).replace(".py", "")
    if "{}" not in output_name:
        output_name += "_{}"

    mc_model = as_model(model_file)
    if hasattr(mc_model.posterior_fns, "band_fns"):
        raise NotImplementedError(
            "model_galaxy_map's quick-look image products are "
            "single-band; for joint models run psfmc_tpu.fit_map on "
            "model.posterior_fns directly (tested) and render per band "
            "with posterior_fns.render_images"
        )
    rng = np.random.RandomState(seed)
    pool = mc_model.init_params_from_priors(
        max(4 * n_starts, 128), random_state=rng
    )
    res = fit_map(
        mc_model.posterior_fns,
        n_starts=n_starts,
        steps=steps,
        seed=seed,
        p0=pool,
        laplace=laplace,
    )
    _print(f"MAP fit: lnpost = {res.lnpost:.2f}")

    header = (
        mc_model.obs_header.copy() if mc_model.obs_header else fits.Header()
    )
    header.extend(_fits_section_header("psfMC MAP FIT PARAMETERS"))
    stats = _OD()
    stats["MAPLNP"] = float(res.lnpost)
    pos = 0
    for name, ln, abbr in zip(
        mc_model.param_names, mc_model.param_lens, mc_model.param_fits_abbrs
    ):
        val = res.theta[pos : pos + ln]
        std = (
            res.theta_std[pos : pos + ln]
            if res.theta_std is not None
            else np.full(ln, np.nan)
        )
        if ln == 1:
            s = f"{val[0]:0.4g}"
            if np.isfinite(std[0]):
                s += f" +/- {std[0]:0.4g}"
        else:
            s = "(" + ",".join(f"{v:0.4g}" for v in val) + ")"
            if np.all(np.isfinite(std)):
                s += " +/- (" + ",".join(f"{v:0.4g}" for v in std) + ")"
        stats[abbr] = s
        pos += ln
    for key, value in annotate_metadata(stats).items():
        header.set(key, value[0], value[1])

    imgs = mc_model.render_images_batch(res.theta[None, :])
    _print("Saving MAP models")
    write_image_products(
        output_name, {k: v[0] for k, v in imgs.items()}, header, write_fits
    )
    return res


def model_galaxy_evidence(
    model_file,
    nwalkers: int = 512,
    nsteps: int = 3000,
    groups: int = 4,
    sweeps: int = 2,
    seed: int = 0,
    mesh=None,
    moves: str = "mixed",
    **ais_kwargs,
):
    """Marginal likelihood of a model file (Bayesian model comparison).

    Builds the model and runs the SMC/AIS evidence estimator
    (:func:`psfmc_tpu.sampler.ais.ais_evidence`).  Compare two model
    definitions of the same data — e.g. point-source-only vs
    point-source + host galaxy — via their log Bayes factor::

        r1 = model_galaxy_evidence('model_ps_only.py')
        r2 = model_galaxy_evidence('model_ps_host.py')
        ln_bayes = r2.lnz - r1.lnz   # > 0 favors the host model

    A capability the reference lacks entirely; evidence conventions and
    diagnostics are documented on :mod:`psfmc_tpu.sampler.ais`.

    :param model_file: model definition filename or component list
        (same as :func:`model_galaxy_mcmc`).
    :param nwalkers: total walkers; walkers-per-group
        (``nwalkers // groups``) must be enough to find the posterior
        modes from prior draws — keep >= 64 for imaging models.
    :param nsteps: annealing steps (>> std(lnL) ~ sqrt(n_good_px / 2)).
    :param mesh: optional device mesh; the group axis shards over it.
    :returns: :class:`psfmc_tpu.sampler.ais.AISResult`.
    """
    from .sampler.ais import ais_evidence

    mc_model = as_model(model_file)  # prepared models pass through
    rng = np.random.RandomState(seed)
    p0 = mc_model.init_params_from_priors(nwalkers, random_state=rng)
    return ais_evidence(
        mc_model.posterior_fns,
        nwalkers=nwalkers,
        nsteps=nsteps,
        groups=groups,
        sweeps=sweeps,
        seed=seed,
        p0=p0,
        mesh=mesh,
        moves=moves,
        **ais_kwargs,
    )


def _data_fingerprint(mc_model):
    """crc32 over the baked observation data + variance (all bands).

    Identifies WHICH data a trace database was sampled against: a
    resumed fit whose obs/ivm files were re-reduced in between would
    silently mix two posteriors in one chain (round-5 resume guard).
    """
    import zlib

    spec = mc_model.spec
    specs = getattr(spec, "band_specs", None) or [spec]
    h = 0
    for s in specs:
        for arr in (s.obs_data, s.obs_var):
            h = zlib.crc32(np.ascontiguousarray(arr).tobytes(), h)
    return int(h)


def model_galaxy_mcmc(
    model_file,
    output_name=None,
    write_fits=default_filetypes,
    iterations=0,
    burn=0,
    chains=None,
    max_iterations=1,
    convergence_check=check_convergence_autocorr,
    seed=0,
    mesh=None,
    ntemps=1,
    betas=None,
    checkpoint_interval=None,
    sampler="ensemble",
    init="prior",
    moves="stretch",
    max_depth=8,
    criticism=False,
    rejuvenate=True,
):
    """Model the surface brightness distribution of a galaxy or galaxies
    using multi-component MCMC parameter estimation.

    :param model_file: Model definition filename (or component list) —
        components from psfmc_tpu.models with parameters given as fixed
        values or prior distributions.
    :param output_name: Base name for output files (no extension).
        Default: ``out_<model_filename>``.
    :param write_fits: Image types to write (see
        analysis.images.default_filetypes).
    :param iterations: Number of retained MCMC samples (per round).
    :param burn: Number of discarded burn-in samples.
    :param chains: Number of walkers. Default: emcee-style minimum
        ``2 * num_params + 2``.
    :param max_iterations: Maximum sampling rounds before convergence is
        enforced (each round adds ``iterations`` steps).
    :param convergence_check: Function of the sampler returning bool.
    :param seed: PRNG seed for reproducible sampling.
    :param mesh: optional jax.sharding.Mesh to shard the walker axis
        over devices (see psfmc_tpu.parallel).
    :param ntemps: number of parallel-tempering rungs (1 = plain
        ensemble).  Tempering helps the genuinely multimodal posteriors
        of quasar/host decomposition (component flux/position swaps);
        the recorded chain is the cold rung.  Checkpoints persist every
        rung, so a resumed run (same ntemps) continues hot rungs
        without re-paying their burn-in.
    :param betas: explicit inverse-temperature ladder (ntemps values,
        betas[0] == 1).  Default None AUTO-SIZES the ladder during
        burn-in: pilot spacing from the measured per-rung std(lnL)
        (so |dbeta| * std(lnL) ~ 1 even for high-S/N imaging
        likelihoods where the classic geometric ladder swaps at ~0.1%),
        then a proportional controller steering every rung pair toward
        ~30% swap acceptance; the ladder freezes for the retained
        phase.  Pass explicit betas to pin the ladder.
    :param checkpoint_interval: steps between progress lines and
        mid-phase resume checkpoints (both burn and sampling phases are
        chunked into scans of this length).  Default: automatic —
        ~10%% of the phase, at least 25 steps; short phases (<=50
        steps) run as one scan.  Pass 0 to disable chunking entirely.
    :param sampler: 'ensemble' (affine-invariant stretch moves, the
        reference's emcee semantics — default) or 'nuts' (gradient-
        based No-U-Turn sampler over the autodiff'd posterior; `chains`
        becomes the number of independent NUTS chains and `burn` the
        adaptation length — typically needs ~10x fewer posterior
        evaluations per effective sample).  ntemps only applies to the
        ensemble sampler.
    :param moves: proposal family: ``'stretch'`` (emcee-2.x parity,
        default), ``'de'`` (differential evolution) or ``'mixed'``
        (50/50 per step; cuts the autocorrelation of flux-sharing
        degeneracies).  Applies to the plain AND tempered ensemble
        (ignored by NUTS).
    :param max_depth: NUTS maximum tree depth (2^depth - 1 leapfrog
        steps per trajectory); raise to 10-12 when trajectories
        saturate the cap (sampler='nuts' only).
    :param criticism: when True, replay the final chain for the model
        criticism block and record it in every image product's header
        (PSIS-LOO elpd/SE/p_eff + Pareto-k census, LOO-PIT KS
        uniformity, prior power-scaling flags — MCLOO*/MCPIT*/MCPSFLAG
        cards).  Costs roughly one extra batched render pass; run it
        on converged chains (the diagnostics flag under-burned runs
        loudly, by design).
    :param rejuvenate: when True (default), walkers stranded far below
        the ensemble's lnp bulk are teleported onto randomly chosen
        healthy walkers between BURN segments (burn-phase only — never
        during retained sampling; seeded, so runs stay reproducible).
        The reference instead drops such walkers after the fact
        (``filter_lowp_walkers``), silently wasting their samples.
        Refuses to act when half the ensemble is below the floor
        (that's multimodality or misfit, not stragglers).  Applies to
        the ensemble and PT samplers; NUTS chains are independent and
        are never teleported.
    :param init: ``'prior'`` (default) initializes walkers from prior
        draws (reference models.py:108-130 semantics); ``'map'`` first
        runs a multi-start gradient MAP fit (:func:`psfmc_tpu.optimize.
        fit_map`) and starts the walkers from a tight in-support cloud
        around the mode — far shorter burn-in on well-identified
        posteriors, at the cost of a few hundred batched posterior+grad
        evaluations up front.
    """
    # validate cheap knobs up front: a typo must fail before the
    # expensive model build, and on EVERY branch (a checkpoint-resume
    # run never reaches the fresh-run init dispatch)
    if init not in ("prior", "map"):
        raise ValueError(f"Unknown init {init!r}: expected 'prior' or 'map'")
    if moves not in ("stretch", "de", "mixed"):
        raise ValueError(
            f"Unknown moves {moves!r}: expected 'stretch', 'de' or 'mixed'"
        )

    if output_name is None:
        name = model_file if isinstance(model_file, str) else "model"
        output_name = "out_" + os.path.basename(name).replace(".py", "")
    output_name += "_{}"

    # prepared model objects (MultiComponentModel or JointModel) pass
    # through — the whole driver (phases, convergence retries,
    # checkpoints, DB) is model-agnostic; only the image-products
    # branch below differs
    mc_model = as_model(model_file)
    is_joint = hasattr(mc_model.posterior_fns, "band_fns")

    sampler_name = sampler
    if chains is None:
        # ensemble: emcee-style 2*dim+2 walkers; NUTS: independent
        # chains, a handful suffices
        chains = 8 if sampler_name == "nuts" else 2 * mc_model.num_params + 2
    if sampler_name != "nuts" and chains % 2 != 0:
        chains += 1  # half-ensemble moves need an even walker count

    sharding = None
    if mesh is not None:
        from .parallel.mesh import walker_sharding

        sharding = walker_sharding(mesh)

    if sampler == "nuts":
        from .sampler.nuts import NUTSSampler

        if ntemps > 1:
            warn("ntemps is ignored with sampler='nuts'")
        if moves != "stretch":
            warn("moves= is ignored with sampler='nuts'")
        sampler = NUTSSampler(
            nwalkers=chains,
            max_depth=max_depth,
            dim=mc_model.num_params,
            posterior_fns=mc_model.posterior_fns,
            seed=seed,
            sharding=sharding,
        )
    elif sampler == "ensemble":
        if ntemps > 1:
            from .sampler.tempered import PTEnsembleSampler

            sampler = PTEnsembleSampler(
                nwalkers=chains,
                dim=mc_model.num_params,
                posterior_fns=mc_model.posterior_fns,
                ntemps=ntemps,
                betas=betas,
                seed=seed,
                sharding=sharding,
                moves=moves,
            )
        else:
            sampler = EnsembleSampler(
                nwalkers=chains,
                dim=mc_model.num_params,
                posterior_fns=mc_model.posterior_fns,
                seed=seed,
                sharding=sharding,
                moves=moves,
            )
    else:
        raise ValueError(
            f"Unknown sampler {sampler!r}: expected 'ensemble' or 'nuts'"
        )

    db_name = output_name.format("db") + ".fits"

    database = None
    if os.path.exists(db_name):
        database = load_database(db_name)
        existing_iter = int(database.meta.get("MCITER", 0))
        if existing_iter >= iterations and iterations > 0:
            _print(
                "Database already contains sampled chains, skipping sampling"
            )
        else:
            ckpt = load_checkpoint(db_name)
            db_chains = int(database.meta.get("MCCHAINS", chains))
            if ckpt is None:
                warn(
                    "Existing database has no checkpoint; re-running "
                    "sampling from scratch"
                )
                database = None
            elif db_chains != sampler.nwalkers:
                # Resuming with a different chains= would silently
                # interleave samples across the wrong walkers on the
                # (nwalkers, niter, dim) reshape below.
                warn(
                    f"Existing database was sampled with {db_chains} "
                    f"walkers but chains={sampler.nwalkers} was requested; "
                    "re-running sampling from scratch"
                )
                database = None
            elif (
                database.meta.get("MCDATSUM") is not None
                and int(database.meta["MCDATSUM"])
                != _data_fingerprint(mc_model)
            ):
                # the obs/ivm data changed since the checkpoint was
                # written (re-reduction?): resuming would mix two
                # posteriors in one chain
                warn(
                    "Existing database was sampled against different "
                    "observation data (MCDATSUM mismatch — obs/ivm "
                    "files changed?); re-running sampling from scratch"
                )
                database = None
            elif (
                ckpt.get("sampler_kind", "ensemble")
                != getattr(sampler, "checkpoint_kind", "ensemble")
            ):
                # nuts <-> stretch-family state is not interchangeable,
                # and silently concatenating two samplers' chains in
                # one DB corrupts autocorrelation-based diagnostics
                warn(
                    "Existing checkpoint was written by the "
                    f"{ckpt.get('sampler_kind', 'ensemble')!r} sampler "
                    f"but sampler={getattr(sampler, 'checkpoint_kind', 'ensemble')!r} "
                    "was requested; re-running sampling from scratch"
                )
                database = None
            elif (
                int(np.asarray(ckpt["positions"]).shape[-1])
                != int(sum(mc_model.param_lens))
                or any(
                    n not in database.colnames
                    for n in mc_model.param_names
                )
            ):
                # The model FILE changed since the checkpoint was
                # written (components added/removed/renamed): restoring
                # would either mis-seat the parameter vector or die on
                # a missing trace column deep inside the restore — fail
                # soft and attributably instead.
                n_match = sum(
                    n in database.colnames for n in mc_model.param_names
                )
                warn(
                    "Existing checkpoint was written for a model with "
                    f"{int(np.asarray(ckpt['positions']).shape[-1])} "
                    f"parameters ({n_match}/{len(mc_model.param_names)} "
                    "trace columns match) but the current model file "
                    f"defines {int(sum(mc_model.param_lens))} — the "
                    "model changed; re-running sampling from scratch"
                )
                database = None
            else:
                burn_total = max(burn, int(database.meta.get("MCBURN", 0)))
                burn_done = int(database.meta.get("MCBURNDN", burn_total))
                _print(
                    f"Resuming from checkpoint: {burn_done}/{burn_total} "
                    f"burn-in + {existing_iter} retained iterations done"
                )
                database = _run_sampling(
                    sampler,
                    mc_model,
                    None,
                    burn=max(0, burn_total - burn_done),
                    iterations=iterations - existing_iter,
                    max_iterations=max_iterations,
                    convergence_check=convergence_check,
                    db_name=db_name,
                    burn_total=burn_total,
                    burn_done=burn_done,
                    resume_payload=ckpt,
                    prior_db=(
                        (database, mc_model) if existing_iter > 0 else None
                    ),
                    checkpoint_interval=checkpoint_interval,
                    rejuvenate=rejuvenate,
                    seed=seed,
                )

    if database is None:
        rng = np.random.RandomState(seed)
        # NUTS chains start from the best of a larger prior pool (see
        # NUTSSampler.init_state); the ensemble uses one draw per walker
        n_init = max(32 * chains, 256) if sampler_name == "nuts" else chains
        if init == "map":
            from .optimize import fit_map, scatter_around

            pool = mc_model.init_params_from_priors(
                max(n_init, 256), random_state=rng
            )
            map_res = fit_map(mc_model.posterior_fns, p0=pool, seed=seed)
            _print(f"MAP fit: lnpost = {map_res.lnpost:.2f}")
            param_vec = scatter_around(
                mc_model.posterior_fns, map_res.theta, n_init, seed=seed
            )
        else:  # 'prior' (validated above)
            param_vec = mc_model.init_params_from_priors(
                n_init, random_state=rng
            )
        database = _run_sampling(
            sampler,
            mc_model,
            param_vec,
            burn=burn,
            iterations=iterations,
            max_iterations=max_iterations,
            convergence_check=convergence_check,
            db_name=db_name,
            burn_total=burn,
            checkpoint_interval=checkpoint_interval,
            rejuvenate=rejuvenate,
            seed=seed,
        )

    if is_joint:
        # joint multi-band products: one set of the five image types
        # per band, from the sampler's per-band accumulators.  When the
        # run skipped sampling (DB already complete), read the
        # accumulators straight off the checkpoint — restoring full
        # sampler state would pay a joint-posterior compile + batched
        # lnpost eval just to rewrite images
        accum_src = sampler
        if sampler.accumulated_samples == 0:
            ckpt = load_checkpoint(db_name)
            if (
                ckpt is not None
                and ckpt.get("accum")
                and int(ckpt.get("accum_count", 0)) > 0
            ):
                from types import SimpleNamespace

                accum_src = SimpleNamespace(
                    accumulated_images=ckpt["accum"],
                    accumulated_samples=int(ckpt["accum_count"]),
                )
        if accum_src.accumulated_samples > 0:
            mc_model.save_posterior_images(
                accum_src,
                output_name[: -len("_{}")],
                database=database,
                filetypes=write_fits,
                criticism_draws=500 if criticism else 0,
            )
        else:
            warn(
                "no accumulated images available for the joint model "
                "(no retained sampling ran and the checkpoint has no "
                "accumulators); skipping image products"
            )
    else:
        save_posterior_images(
            mc_model, database, output_name=output_name,
            filetypes=write_fits,
            criticism_draws=500 if criticism else 0,
        )
    return database


def _auto_segment(nsteps, checkpoint_interval):
    """Scan segment length for a phase (None = single scan).

    Auto mode chunks long phases into ~10 segments (at least 25 steps
    each) so progress prints and mid-phase checkpoints happen without
    measurably adding dispatches; short phases stay a single program.
    """
    if checkpoint_interval is not None:
        return None if checkpoint_interval <= 0 else int(checkpoint_interval)
    if nsteps <= 50:
        return None
    return max(25, min(2500, nsteps // 10))


def _run_sampling(
    sampler,
    mc_model,
    initial_positions,
    burn,
    iterations,
    max_iterations,
    convergence_check,
    db_name,
    burn_total,
    burn_done=0,
    resume_payload=None,
    prior_db=None,
    checkpoint_interval=None,
    rejuvenate=True,
    seed=0,
):
    """Burn + retained sampling with convergence retries; saves the DB.

    Both phases are chunked (see ``_auto_segment``): each segment
    prints reference-style percent progress (utils.py:167-171) and
    persists a resume checkpoint, so a killed long run restarts from
    the last segment rather than from scratch.
    """
    from .profiling import PhaseTimer, trace
    from .utils import print_progress

    timer = PhaseTimer()
    with timer.phase("init"):
        if resume_payload is not None:
            sampler.restore_state(resume_payload)
        else:
            sampler.init_state(initial_positions)

    def checkpoint_meta(converged=False):
        niter = 0 if sampler.chain is None else sampler.chain.shape[1]
        meta = OrderedDict(
            [
                ("MCITER", niter),
                ("MCBURN", burn_total),
                ("MCBURNDN", min(burn_done + sampler._nsteps_total
                                 if niter == 0 else burn_total, burn_total)),
                ("MCCHAINS", sampler.nwalkers),
                ("MCCONVRG", bool(converged)),
                ("MCACCEPT", float(sampler.acceptance_fraction.mean())),
                ("MCDATSUM", _data_fingerprint(mc_model)),
            ]
        )
        if niter > 0 and getattr(sampler, "ntemps", 1) >= 3:
            # tempered runs get a marginal-likelihood estimate for free
            try:
                lnz, dlnz = sampler.log_evidence()
            except (RuntimeError, ValueError):
                pass
            else:
                meta["MCLNZ"] = float(lnz)
                meta["MCLNZERR"] = float(dlnz)
        return meta

    if burn > 0:
        _print(f"Burning: {burn} iterations x {sampler.nwalkers} walkers")

        rejuv_rng = np.random.RandomState(np.uint32(seed) ^ 0x5EED)

        def burn_cb(done, total):
            if (
                rejuvenate
                and done < total
                and hasattr(sampler, "rejuvenate_stuck")
            ):
                # burn-only walker rescue (see EnsembleSampler.
                # rejuvenate_stuck); runs BEFORE the checkpoint so a
                # resume continues from the repaired ensemble
                n_fix = sampler.rejuvenate_stuck(random_state=rejuv_rng)
                if n_fix:
                    _print(f"  rejuvenated {n_fix} stuck walkers")
            print_progress(burn_done + done - 1, burn_total, "Burning")
            if done < total:  # final state is checkpointed by save_round
                save_database(
                    sampler, mc_model, db_name, meta_dict=checkpoint_meta()
                )

        with timer.phase("burn"), trace("burn"):
            sampler.run_burn(
                burn,
                segment=_auto_segment(burn, checkpoint_interval),
                callback=burn_cb,
            )

    if resume_payload is None or burn > 0 or prior_db is None:
        # Fresh retained phase: zero accumulators + accept counts.  A
        # mid-sampling resume (burn complete, retained samples exist)
        # skips this so the restored image accumulators keep streaming.
        sampler.reset()

    if prior_db is not None:
        # Preload the already-retained chain so the saved database holds
        # the full concatenated run.
        from .database import row_to_param_vector

        database, model = prior_db
        cols = database[list(model.param_names)]
        flat = np.stack([row_to_param_vector(r) for r in cols])
        nwalkers = sampler.nwalkers
        niter = len(database) // nwalkers
        sampler._chain = flat.reshape(nwalkers, niter, model.num_params)
        sampler._lnprob = np.asarray(
            database["lnprobability"], dtype=np.float64
        ).reshape(nwalkers, niter)
        sampler._nsteps_total = niter

    def save_round(converged):
        mc_model.set_accumulated_from_sampler(sampler)
        return save_database(
            sampler, mc_model, db_name, meta_dict=checkpoint_meta(converged)
        )

    def sample_cb(done, total):
        print_progress(done - 1, total, "Sampling")
        if done < total:
            save_database(
                sampler, mc_model, db_name, meta_dict=checkpoint_meta()
            )

    database = None
    for sampling_iter in range(max_iterations):
        _print(
            f"Sampling: {iterations} iterations x {sampler.nwalkers} walkers"
        )
        with timer.phase("sampling"), trace("sampling"):
            sampler.run_sampling(
                iterations,
                segment=_auto_segment(iterations, checkpoint_interval),
                callback=sample_cb,
            )
        converged = bool(convergence_check(sampler))
        # Persist the chain + resume checkpoint after EVERY round: a
        # crash mid-retry-loop resumes from the last completed round
        # instead of losing the whole run.
        database = save_round(converged)
        if converged:
            break
        warn(
            "Not yet converged after "
            f"{(sampling_iter + 1) * iterations:d} iterations:"
        )
        convergence_check(sampler, verbose=1)
    return database
