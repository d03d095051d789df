#!/usr/bin/env python
"""Run the example quasar/host decomposition end to end.

Generates synthetic data (if missing), runs the MCMC fit, prints the
posterior summary against the injected ground truth, and writes trace
histograms.  Equivalent workflow to the reference's
examples/run_example.py.
"""
import os
import sys

# runnable from a repo checkout without installing the package
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import numpy as np

# Sampler arguments: the flux-sharing PS/host degeneracy has an
# integrated autocorrelation time of ~180 steps, so retained chains
# must be well past 10x that to pass the convergence check; the mixed
# stretch+DE proposals cut the degeneracy's autocorrelation further.
# Env-tunable for quick smokes (BURN=100 ITERATIONS=100 CHAINS=50).
MC_ARGS = {
    "burn": int(os.environ.get("BURN", "1000")),
    "iterations": int(os.environ.get("ITERATIONS", "2000")),
    "chains": int(os.environ.get("CHAINS", "250")),
    "moves": "mixed",
}


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

    from psfmc_tpu import load_database, model_galaxy_mcmc

    model_file = "model_example.py"
    output_name = "out_example"
    model_galaxy_mcmc(model_file, output_name=output_name, **MC_ARGS)

    db = load_database(output_name + "_db.fits")
    from make_example_data import TRUTH

    print("\nPosterior vs injected ground truth:")
    rows = [
        ("0_Sky_adu", TRUTH["sky"]),
        ("1_PointSource_mag", TRUTH["ps_mag"]),
        ("1_PointSource_xy", TRUTH["ps_xy"]),
        ("2_Sersic_mag", TRUTH["ser_mag"]),
        ("2_Sersic_reff", TRUTH["ser_reff"]),
        ("2_Sersic_reff_b", TRUTH["ser_reff_b"]),
        ("2_Sersic_index", TRUTH["ser_index"]),
        ("2_Sersic_angle", TRUTH["ser_angle"]),
        ("2_Sersic_xy", TRUTH["ser_xy"]),
    ]
    for col, truth in rows:
        arr = np.asarray(db[col], dtype=np.float64)
        mean = np.mean(arr, axis=0)
        std = np.std(arr, axis=0)
        print(f"  {col:24s} {np.round(mean, 3)} +/- {np.round(std, 3)}"
              f"   (truth {truth})")

    # diagnostic plots (saved as pdf)
    import matplotlib

    matplotlib.use("Agg")
    from psfmc_tpu.analysis import plot_hist

    for trace_name in ("0_Sky_adu", "1_PointSource_mag",
                       "1_PointSource_2_Sersic_magdiff"):
        plot_hist(trace_name, output_name + "_db.fits", model=model_file,
                  save=True)
    print("\nWrote FITS products + histogram pdfs to", os.getcwd())


if __name__ == "__main__":
    main()
