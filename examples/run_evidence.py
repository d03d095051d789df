#!/usr/bin/env python
"""Bayesian model comparison on the example data.

Fits the synthetic quasar+host image with two competing models —
point-source-only vs point-source + Sersic host — and prints the ln
Bayes factor from the SMC/AIS evidence estimator.  Since the synthetic
data contain an injected host galaxy, the full model must win
decisively.
"""
import os
import sys

# runnable from a repo checkout without installing the package
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import numpy as np


def main():
    os.chdir(os.path.dirname(os.path.abspath(__file__)) or ".")
    # persistent compile cache: first-run tunnel compiles take minutes
    import jax

    from psfmc_tpu.utils import apply_platform_env

    apply_platform_env()  # PSFMC_PLATFORM=cpu for smokes (see utils)

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass
    if not os.path.exists("sci_example.fits"):
        import make_example_data

        make_example_data.main()

    from psfmc_tpu import model_galaxy_evidence
    from psfmc_tpu.model_parser import component_list_from_file

    full = component_list_from_file("model_example.py")
    # point-source-only alternative: drop the Sersic component
    ps_only = [c for c in full if type(c).__name__ != "Sersic"]

    print("evidence: point-source-only model ...")
    r_ps = model_galaxy_evidence(
        ps_only, nwalkers=256, nsteps=1500, groups=4, sweeps=2, seed=1
    )
    print(f"  lnZ = {r_ps.lnz:.2f} +/- {r_ps.err:.2f}")

    print("evidence: point-source + host model ...")
    # the host+PS posterior has a hard mode-finding problem (two
    # overlapping sources); give each group plenty of walkers
    r_full = model_galaxy_evidence(
        "model_example.py", nwalkers=512, nsteps=2000, groups=4,
        sweeps=2, seed=1,
    )
    print(f"  lnZ = {r_full.lnz:.2f} +/- {r_full.err:.2f}")

    ln_bf = r_full.lnz - r_ps.lnz
    err = float(np.hypot(r_full.err, r_ps.err))
    verdict = (
        "decisive for the host model" if ln_bf > 5
        else "inconclusive" if abs(ln_bf) <= 5
        else "decisive against the host model"
    )
    print(f"\nln Bayes factor (host vs no-host): {ln_bf:.2f} +/- {err:.2f}"
          f"  -> {verdict}")


if __name__ == "__main__":
    main()
