#!/usr/bin/env python
"""Hierarchical scaling-relation demo: the size-luminosity relation.

Simulates K host galaxies whose effective radii follow a relation
reff = alpha + beta * (mag - x0) + intrinsic scatter, then recovers
(alpha, beta, sigma) through the FULL pixel likelihood with
`RegressionPopulation` — every target's mag and reff are sampled
jointly with the hyperparameters, so measurement error in BOTH axes
is handled exactly.  For contrast it also prints the classic
two-step estimate (independent fits, then ordinary least squares on
the point estimates), whose slope is diluted by the covariate's
measurement error.

Runs in ~2 minutes on CPU (reduced K); seconds warm on a TPU chip.
"""
import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import numpy as np

K = int(os.environ.get("K", "10"))
BURN = int(os.environ.get("BURN", "500"))
ITERATIONS = int(os.environ.get("ITERATIONS", "500"))


def main():
    os.chdir(os.path.dirname(os.path.abspath(__file__)) or ".")
    import jax

    from psfmc_tpu.utils import apply_platform_env

    apply_platform_env()
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

    from psfmc_tpu import distributions as D
    from psfmc_tpu.batchfit import fit_batch, simulate_stack
    from psfmc_tpu.hierarchy import (
        RegressionPopulation,
        fit_hierarchical,
    )
    from psfmc_tpu.models.components import Configuration, Sersic, Sky
    from psfmc_tpu.models.multicomponent import (
        MultiComponentModel,
        slot_param_names,
    )

    rng = np.random.RandomState(24)
    hw, noise = 32, 0.03
    yy, xx = np.mgrid[0:11, 0:11].astype(float)
    psf = np.exp(-((xx - 5) ** 2 + (yy - 5) ** 2) / (2 * 1.5**2))
    psf /= psf.sum()

    # truth: reff = alpha + beta*(mag - x0) + N(0, sig) — brighter
    # hosts are bigger (beta < 0 on the mag axis).  Mags cover the
    # prior range (a lever arm for the slope); the Sersic index is a
    # CONSTANT in the model — leaving it free adds the classic
    # index-reff degeneracy, which at this depth widens every
    # per-target reff until the K~10 regression is prior-dominated
    # (measured while building this demo).
    alpha_t, beta_t, sig_t, x0 = 3.2, -1.1, 0.25, 20.75
    mags = 20.15 + 1.2 * rng.rand(K)
    reffs = np.clip(
        alpha_t + beta_t * (mags - x0) + sig_t * rng.randn(K), 2.1, 4.9
    )

    model = MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((hw, hw)),
                obsivm_file=np.full((hw, hw), 1.0 / noise**2),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.05, scale=0.02)),
            Sersic(
                xy=D.Uniform(loc=(14.0, 14.0), scale=(4.0, 4.0)),
                mag=D.Uniform(loc=20.0, scale=1.5),
                reff=D.Uniform(loc=2.0, scale=3.0),
                reff_b=D.Uniform(loc=1.5, scale=3.0),
                index=1.5,
                angle=D.Uniform(loc=0.0, scale=180.0),
                angle_degrees=True,
            ),
        ]
    )
    names = slot_param_names(model.param_names, model.param_lens)
    mag_col = names.index("1_Sersic_mag")
    reff_col = names.index("1_Sersic_reff")
    reffb_col = names.index("1_Sersic_reff_b")
    thetas = model.init_params_from_priors(K, random_state=rng)
    thetas[:, mag_col] = mags
    thetas[:, reff_col] = reffs
    # keep the minor axis below reff (the joint constraint)
    thetas[:, reffb_col] = np.minimum(
        thetas[:, reffb_col], reffs - 0.2
    )
    obs, ivm, injected = simulate_stack(model, K, seed=5, thetas=thetas)

    print(
        f"=== {K} mock hosts, reff = {alpha_t} + {beta_t}*(mag - {x0})"
        f" + N(0, {sig_t}) ==="
    )

    # 1. two-step: independent fits then OLS on the point estimates
    res_ind = fit_batch(
        model, obs, ivm, burn=BURN, iterations=ITERATIONS, seed=1
    )
    m_hat = res_ind.mean[:, mag_col]
    r_hat = res_ind.mean[:, reff_col]
    b_ols, a_ols = np.polyfit(m_hat - x0, r_hat, 1)
    resid = r_hat - (a_ols + b_ols * (m_hat - x0))
    print(
        "two-step OLS on point estimates: "
        f"alpha {a_ols:.3f}, beta {b_ols:.3f}, "
        f"scatter {resid.std(ddof=2):.3f} "
        "(slope diluted by mag measurement error, scatter inflated "
        "by reff error)"
    )

    # 2. hierarchical regression through the pixel likelihood
    res = fit_hierarchical(
        model, obs, ivm,
        population={"1_Sersic_reff": RegressionPopulation(
            covariate="1_Sersic_mag",
            alpha=D.Uniform(loc=1.0, scale=4.0),
            beta=D.Uniform(loc=-3.0, scale=6.0),
            sigma=D.Uniform(loc=0.02, scale=2.0),
            x0=x0,
        )},
        sampler="nuts", chains=4, burn=BURN, iterations=ITERATIONS,
        seed=2,
    )
    print(res.summary())
    print(f"truth: alpha {alpha_t}, beta {beta_t}, sigma {sig_t}")

    # 3. the relation's credible band at chosen magnitudes
    for mag in (20.25, x0, 21.25):
        d = res.predict_population(
            n=20000, seed=3, covariates={"1_Sersic_reff": mag}
        )["1_Sersic_reff"]
        q = np.percentile(d, [16, 50, 84])
        print(
            f"  predicted reff at mag {mag:5.2f}: {q[1]:.2f} "
            f"[{q[0]:.2f}, {q[2]:.2f}] px "
            f"(truth line {alpha_t + beta_t * (mag - x0):.2f})"
        )


if __name__ == "__main__":
    main()
