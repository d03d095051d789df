"""Sampler-efficiency shootout on the flagship fit (TPU).

Measured 2026-08-16 (one v5e chip, defaults): both samplers decorrelate
per-sequence at the same rate (max tau ~180 for the slowest posterior
direction, identical for stretch moves and NUTS at max_depth 8 or 10),
so wall-clock ESS/s is decided by batch width vs per-step cost:
ensemble 250 walkers x 800 steps = 1.06 s -> 643 ESS/s; NUTS 8 chains
pay ~159 gradient evals per step -> ~1 ESS/s.  On TPU the vmapped
ensemble is the right default for flagship-class posteriors; NUTS earns
its keep when per-eval cost dominates (few chains, huge images) or in
high-dimensional models where stretch moves degrade.

Measures effective samples per second (and per posterior evaluation)
for the ensemble sampler vs NUTS on the real J0005-0006 model, so the
"which sampler should I use" guidance in the docs is a number, not an
opinion.  ESS = nwalkers_or_chains * nsteps / max(integrated
autocorrelation time); posterior evaluations count both half-ensemble
updates (ensemble: nwalkers per step) and leapfrog steps (NUTS: one
posterior+gradient each, counted as ~2 evals of work).

Usage (TPU host):  python tools/bench_samplers.py
Env: SHOOT_BURN (300), SHOOT_STEPS (500), SHOOT_WALKERS (250),
     SHOOT_CHAINS (8).
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time

import numpy as np

BURN = int(os.environ.get("SHOOT_BURN", "300"))
STEPS = int(os.environ.get("SHOOT_STEPS", "500"))
WALKERS = int(os.environ.get("SHOOT_WALKERS", "250"))
CHAINS = int(os.environ.get("SHOOT_CHAINS", "8"))
MAXDEPTH = int(os.environ.get("SHOOT_MAXDEPTH", "8"))
SKIP_ENSEMBLE = os.environ.get("SHOOT_SKIP_ENSEMBLE", "0") == "1"


def _ess(sampler, nsteps):
    try:
        tau = np.asarray(sampler.get_autocorr_time(c=1), np.float64)
        tau = np.maximum(tau, 1.0)
    except Exception as exc:  # chain too short: report pessimistically
        print(f"  (autocorr estimate failed: {exc}; tau := nsteps/10)")
        tau = np.asarray([nsteps / 10.0])
    nseq = sampler.chain.shape[0]
    return nseq * nsteps / float(np.max(tau)), float(np.max(tau))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    spec_mod = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(repo, "__graft_entry__.py")
    )
    graft = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(graft)

    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.models.spec import build_model_spec
    from psfmc_tpu.sampler.ensemble import EnsembleSampler
    from psfmc_tpu.sampler.nuts import NUTSSampler

    comps = graft._flagship_components()
    spec = build_model_spec(comps)
    fns = build_posterior(spec)
    rng = np.random.RandomState(0)
    pool = np.stack(
        [
            np.concatenate([np.ravel(s.dist.random(rng)) for s in spec.slots])
            for _ in range(max(32 * CHAINS, WALKERS, 256))
        ]
    )
    pool = graft._enforce_axis_order(pool, spec)

    def run_ensemble():
        ens = EnsembleSampler(WALKERS, spec.num_params, fns, seed=1)
        ens.init_state(pool[:WALKERS])
        ens.run_burn(BURN)
        ens.reset()
        ens.run_sampling(STEPS)
        return ens

    # -- ensemble ------------------------------------------------------------
    # pass 1 compiles the burn/sampling programs (cached in
    # fns.programs, keyed by phase shape); pass 2 is the timed run
    if SKIP_ENSEMBLE:
        ess_e = t_ens = None
    else:
        run_ensemble()
        t0 = time.perf_counter()
        ens = run_ensemble()
        t_ens = time.perf_counter() - t0
        ess_e, tau_e = _ess(ens, STEPS)
        evals_e = WALKERS * (BURN + STEPS)
        print(
            f"ensemble: {WALKERS} walkers x {BURN}+{STEPS} steps = "
            f"{evals_e} evals in {t_ens:.2f}s | max tau {tau_e:.1f} | "
            f"ESS {ess_e:.0f} -> {ess_e / t_ens:.0f} ESS/s, "
            f"{evals_e / max(ess_e, 1):.0f} evals/ESS"
        )

    def run_nuts():
        nuts = NUTSSampler(CHAINS, spec.num_params, fns, seed=2,
                           max_depth=MAXDEPTH)
        nuts.init_state(pool)
        nuts.run_burn(BURN)
        nuts.reset()
        nuts.run_sampling(STEPS)
        return nuts

    # -- NUTS ---------------------------------------------------------------
    run_nuts()
    t0 = time.perf_counter()
    nuts = run_nuts()
    t_nuts = time.perf_counter() - t0
    ess_n, tau_n = _ess(nuts, STEPS)
    n_lf = nuts._n_leapfrog_total
    print(
        f"NUTS:     {CHAINS} chains x {BURN}+{STEPS} steps, "
        f"{n_lf} leapfrog steps ({nuts._n_divergent} divergent) "
        f"in {t_nuts:.2f}s | max tau {tau_n:.1f} | "
        f"ESS {ess_n:.0f} -> {ess_n / t_nuts:.0f} ESS/s, "
        f"{n_lf / max(ess_n, 1):.0f} grad-evals/ESS"
    )

    if not SKIP_ENSEMBLE:
        winner = "ensemble" if ess_e / t_ens > ess_n / t_nuts else "NUTS"
        print(f"wall-clock ESS/s winner on this hardware: {winner}")


if __name__ == "__main__":
    main()
