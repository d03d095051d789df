#!/usr/bin/env python
"""The model-criticism workflow on the example decomposition.

Runs (or reuses) the example fit and then every validation layer the
framework offers — answering "should I believe this fit?" from four
directions:

1. Posterior-predictive check (PPC): can the fitted model generate
   data as discrepant as the observation?  (misfit detector)
2. PSIS-LOO + WAIC: out-of-sample predictive score, with per-pixel
   Pareto-k reliability census.  (model comparison currency)
3. LOO-PIT: are the leave-one-out predictive CDFs uniform?
   (noise-model calibration)
4. Power-scaling sensitivity: is any parameter's posterior being
   driven by its prior rather than the data?  (prior influence)

Equivalent single command: ``psfmc-summary --criticism model_example.py
out_example_db.fits``.  The reference has no analogue of any of these —
its model criticism is eyeballing residual images.
"""
import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

MC_ARGS = {
    "burn": int(os.environ.get("BURN", "1000")),
    "iterations": int(os.environ.get("ITERATIONS", "2000")),
    "chains": int(os.environ.get("CHAINS", "250")),
    "moves": "mixed",
}


def main():
    os.chdir(os.path.dirname(os.path.abspath(__file__)) or ".")
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
    from psfmc_tpu.analysis import (
        loo_pit,
        power_scale_sensitivity,
        psis_loo,
        waic,
    )
    from psfmc_tpu.analysis.model_comparison import pointwise_loglike
    from psfmc_tpu.models.multicomponent import as_model

    model_file = "model_example.py"
    output_name = "out_example"
    db_name = output_name + "_db.fits"
    if not os.path.exists(db_name):
        # reuses the standard example fit when already run
        model_galaxy_mcmc(model_file, output_name=output_name, **MC_ARGS)
    db = load_database(db_name)
    model = as_model(model_file)

    print("\n=== 1. posterior-predictive check ===")
    p = model.posterior_predictive_pvalue(db, n=200, random_state=0)
    verdict = "healthy" if 0.02 < p < 0.98 else "MISFIT FLAGGED"
    print(f"deviance PPC p-value: {p:.3f}  ({verdict}; ~0.5 is ideal, "
          "near 0 = model cannot reach the data's discrepancy)")

    print("\n=== 2. predictive model comparison scores ===")
    ll = pointwise_loglike(model, db)
    loo = psis_loo(loglike=ll)
    print(loo.summary())
    print(waic(loglike=ll).summary())

    print("\n=== 3. LOO-PIT calibration ===")
    print(loo_pit(model, db, loglike=ll).summary())

    print("\n=== 4. power-scaling sensitivity ===")
    print(power_scale_sensitivity(model, db).summary())

    import matplotlib

    matplotlib.use("Agg")
    from psfmc_tpu.analysis import plot_criticism

    plot_criticism(db_name, model, save=True)
    print("\nwrote the diagnostic sheet "
          f"{output_name}_db_criticism.pdf")
    print("(one-command equivalent: psfmc-summary --criticism "
          f"{model_file} {db_name})")


if __name__ == "__main__":
    main()
