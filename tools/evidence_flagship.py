"""Measure SMC/AIS evidence on the flagship J0005-0006 fit (TPU).

Runs ``psfmc_tpu.sampler.ais_evidence`` on the real HST example model
(Sky + PointSource + 2 Sersics, 128x128 obs, 18 free params) twice with
independent seeds, printing lnZ +/- err, group spread, wall-clock, and
the cross-seed agreement.  std(lnL) at the posterior is ~sqrt(n_good/2)
~ 80 for this cutout, so the default 3000 steps keep the per-step
weight spread ~0.03.

Usage (on the TPU host):  python tools/evidence_flagship.py
Env: EVID_WALKERS (512), EVID_STEPS (3000), EVID_GROUPS (4),
     EVID_SWEEPS (2), EVID_SEEDS (2).
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time

import numpy as np

WALKERS = int(os.environ.get("EVID_WALKERS", "512"))
STEPS = int(os.environ.get("EVID_STEPS", "3000"))
GROUPS = int(os.environ.get("EVID_GROUPS", "4"))
SWEEPS = int(os.environ.get("EVID_SWEEPS", "2"))
SEEDS = int(os.environ.get("EVID_SEEDS", "2"))
MOVES = os.environ.get("EVID_MOVES", "stretch")


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
    from psfmc_tpu.profiling import device_sync
    from psfmc_tpu.sampler.ais import ais_evidence

    comps = graft._flagship_components()
    spec = build_model_spec(comps)
    fns = build_posterior(spec)
    print(
        f"flagship: {spec.num_params} params, {WALKERS} walkers x "
        f"{STEPS} steps x {SWEEPS} sweeps, {GROUPS} groups, moves={MOVES}"
    )

    results = []
    for seed in range(1, SEEDS + 1):
        t0 = time.perf_counter()
        # p0=None: ais_evidence rejection-samples an exact
        # constrained-prior draw itself (a hand-rolled pool is only
        # distributionally correct while reff/reff_b priors coincide)
        res = ais_evidence(
            fns,
            nwalkers=WALKERS,
            nsteps=STEPS,
            groups=GROUPS,
            sweeps=SWEEPS,
            seed=seed,
            moves=MOVES,
        )
        device_sync(res.lnz)  # lnz is host float; sync is for timing hygiene
        dt = time.perf_counter() - t0
        label = "warmup+run" if seed == 1 else "run"
        print(
            f"seed {seed}: lnZ = {res.lnz:.2f} +/- {res.err:.2f}  "
            f"groups {np.round(res.lnz_groups, 1)}  "
            f"acc={res.accept_fraction:.2f} nres={res.nresample} "
            f"[{label}: {dt:.2f}s]"
        )
        results.append(res)

    if len(results) >= 2:
        spread = max(r.lnz for r in results) - min(r.lnz for r in results)
        joint = float(np.hypot(results[0].err, results[1].err))
        print(
            f"cross-seed spread: {spread:.2f} (joint err {joint:.2f}) — "
            + ("CONSISTENT" if spread < 5 * max(joint, 0.2) else "INCONSISTENT")
        )


if __name__ == "__main__":
    main()
