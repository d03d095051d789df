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
from .models.multicomponent import MultiComponentModel
from .sampler.ensemble import EnsembleSampler

__all__ = ["model_galaxy_mcmc"]


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
        the recorded chain is the cold rung.  On resume, hot rungs
        restart from the checkpointed cold-rung positions.
    :param betas: explicit inverse-temperature ladder (ntemps values,
        betas[0] == 1).  IMPORTANT for high-S/N imaging likelihoods:
        replica swaps only accept when adjacent rungs' likelihood
        distributions overlap, which for a 16k-pixel likelihood needs a
        much finer ladder than the weak-data default (geometric to
        1/64) — e.g. np.linspace(1.0, 0.9, ntemps)-like spacing.
    """
    if output_name is None:
        name = model_file if isinstance(model_file, str) else "model"
        output_name = "out_" + os.path.basename(name).replace(".py", "")
    output_name += "_{}"

    mc_model = MultiComponentModel(components=model_file)

    if chains is None:
        chains = 2 * mc_model.num_params + 2
    if chains % 2 != 0:
        chains += 1  # half-ensemble moves need an even walker count

    sharding = None
    if mesh is not None:
        from .parallel.mesh import walker_sharding

        sharding = walker_sharding(mesh)

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
        )
    else:
        sampler = EnsembleSampler(
            nwalkers=chains,
            dim=mc_model.num_params,
            posterior_fns=mc_model.posterior_fns,
            seed=seed,
            sharding=sharding,
        )

    db_name = output_name.format("db") + ".fits"

    database = None
    if os.path.exists(db_name):
        database = load_database(db_name)
        existing_iter = int(database.meta.get("MCITER", 0))
        if existing_iter >= iterations:
            print(
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
            else:
                print(
                    f"Resuming from checkpoint at {existing_iter} retained "
                    f"iterations"
                )
                positions, _lnp, _naccept, key = ckpt
                database = _run_sampling(
                    sampler,
                    mc_model,
                    positions,
                    burn=0,
                    iterations=iterations - existing_iter,
                    max_iterations=max_iterations,
                    convergence_check=convergence_check,
                    db_name=db_name,
                    burn_total=int(database.meta.get("MCBURN", burn)),
                    resume_key=key,
                    prior_db=(database, mc_model),
                )

    if database is None:
        rng = np.random.RandomState(seed)
        param_vec = mc_model.init_params_from_priors(chains, random_state=rng)
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
        )

    save_posterior_images(
        mc_model, database, output_name=output_name, filetypes=write_fits
    )
    return database


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
    resume_key=None,
    prior_db=None,
):
    """Burn + retained sampling with convergence retries; saves the DB."""
    key = None
    if resume_key is not None:
        import jax.numpy as jnp

        key = jnp.asarray(resume_key, dtype=jnp.uint32)
    from .profiling import PhaseTimer, trace

    timer = PhaseTimer()
    with timer.phase("init"):
        sampler.init_state(initial_positions, key=key)

    if burn > 0:
        print(f"Burning: {burn} iterations x {sampler.nwalkers} walkers")
        with timer.phase("burn"), trace("burn"):
            sampler.run_burn(burn)
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
        db_metadata = OrderedDict(
            [
                ("MCITER", sampler.chain.shape[1]),
                ("MCBURN", burn_total),
                ("MCCHAINS", sampler.nwalkers),
                ("MCCONVRG", bool(converged)),
                ("MCACCEPT", float(sampler.acceptance_fraction.mean())),
            ]
        )
        return save_database(sampler, mc_model, db_name, meta_dict=db_metadata)

    database = None
    for sampling_iter in range(max_iterations):
        print(
            f"Sampling: {iterations} iterations x {sampler.nwalkers} walkers"
        )
        with timer.phase("sampling"), trace("sampling"):
            sampler.run_sampling(iterations)
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
