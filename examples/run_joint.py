#!/usr/bin/env python
"""Joint two-band fit: shared structure, per-band magnitudes.

Beyond the reference's one-band-at-a-time workflow: a quasar + host
scene observed in two bands (different depths, PSFs and image sizes) is
fit SIMULTANEOUSLY — the host's centroid/size/shape and the quasar
position are shared across bands via ``Tied`` while each band keeps its
own magnitudes and sky.  One jitted posterior evaluates the global
prior once and sums the two band likelihoods.

Everything here is synthetic and generated through the framework's own
renderer (``JointModel.simulate``), so the printed recovery is an
end-to-end statistical check.  Runs in ~a minute on CPU; sizes are
env-tunable (STEPS=..., SIZE=...).

This script drives the sampler directly to show the pieces; the
one-liner equivalent with convergence retries + checkpoint resume is
``model_galaxy_mcmc(joint_model, output_name=..., burn=..., iterations=...)``.
"""
import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import numpy as np

STEPS = int(os.environ.get("STEPS", "600"))
SIZE = int(os.environ.get("SIZE", "32"))


def _band_config(rng, h, w, noise, psf_sigma):
    from psfmc_tpu.models import Configuration

    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(
        -((xx - w // 2) ** 2 + (yy - h // 2) ** 2) / (2 * psf_sigma**2)
    )
    psf /= psf.sum()
    return Configuration(
        obs_file=np.zeros((h, w)),  # placeholder; replaced by the mock
        obsivm_file=np.full((h, w), 1.0 / noise**2),
        psf_files=psf,
        psfivm_files=np.full((h, w), 1e8),
        mag_zeropoint=25.0,
    )


def main():
    import jax

    from psfmc_tpu.utils import apply_platform_env

    apply_platform_env()  # PSFMC_PLATFORM=cpu for smokes (see utils)

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from psfmc_tpu import distributions as D
    from psfmc_tpu.database import load_database, save_database
    from psfmc_tpu.models import (
        JointModel,
        PointSource,
        Sersic,
        Sky,
        Tied,
    )
    from psfmc_tpu.sampler import EnsembleSampler

    rng = np.random.RandomState(0)
    h = w = SIZE
    c = h / 2.0

    # band A: deep, sharp PSF; band B: shallower, broader PSF, smaller
    cfg_a = _band_config(rng, h, w, noise=0.05, psf_sigma=1.3)
    cfg_b = _band_config(rng, 3 * h // 4, 3 * w // 4, noise=0.10,
                         psf_sigma=2.2)

    host_a = Sersic(
        xy=D.Uniform(loc=np.array([c - 6, c - 6]),
                     scale=np.array([12.0, 12.0])),
        mag=D.Uniform(loc=20.0, scale=2.5),
        reff=D.Uniform(loc=1.5, scale=5.0),
        reff_b=D.Uniform(loc=1.5, scale=5.0),
        index=1.0,
        angle=0.0,
    )
    host_b = Sersic(
        xy=Tied(host_a, "xy"),
        reff=Tied(host_a, "reff"),
        reff_b=Tied(host_a, "reff_b"),
        index=Tied(host_a, "index"),
        angle=Tied(host_a, "angle"),
        mag=D.Uniform(loc=20.5, scale=2.5),  # own color
    )
    ps_a = PointSource(xy=Tied(host_a, "xy"),
                       mag=D.Uniform(loc=19.5, scale=2.0))
    ps_b = PointSource(xy=Tied(host_a, "xy"),
                       mag=D.Uniform(loc=20.0, scale=2.0))

    bands = [
        [cfg_a, Sky(adu=D.Normal(loc=0.0, scale=0.02)), host_a, ps_a],
        [cfg_b, Sky(adu=D.Normal(loc=0.0, scale=0.02)), host_b, ps_b],
    ]
    joint = JointModel(bands)
    print(f"{joint.num_params} free parameters over 2 bands:"
          f" {joint.param_names}")

    # inject a known scene through the framework's own renderer
    mocks, truth = joint.simulate(random_state=1)
    for bs, f, mock in zip(joint.spec.band_specs,
                           joint.posterior_fns.band_fns, mocks):
        f.constants["obs_data"] = np.asarray(
            mock, np.float32
        )  # fit against the mock

    nw = max(2 * joint.num_params + 2, 24)
    sampler = EnsembleSampler(
        nw, joint.num_params, joint.posterior_fns, seed=2, moves="mixed"
    )
    sampler.init_state(joint.init_params_from_priors(
        nw, random_state=np.random.RandomState(3)
    ))
    print(f"burning {STEPS} + sampling {STEPS} steps, {nw} walkers...")
    sampler.run_burn(STEPS)
    sampler.reset()
    sampler.run_sampling(STEPS)

    flat = sampler.flatchain.astype(np.float64)
    off = np.cumsum([0] + joint.param_lens)
    print(f"\n{'parameter':22s} {'posterior':>24s}   {'injected':>10s}")
    for name, o, ln in zip(joint.param_names, off, joint.param_lens):
        for j in range(ln):
            m, s = flat[:, o + j].mean(), flat[:, o + j].std()
            print(f"{name:22s} {m:12.3f} +/- {s:8.3f}   "
                  f"{truth[o + j]:10.3f}")

    save_database(sampler, joint, "out_joint_db.fits")
    db = load_database("out_joint_db.fits")
    joint.save_posterior_images(sampler, "out_joint", database=db)
    print("\nwrote out_joint_db.fits + per-band image products "
          "(out_joint_b0_*.fits, out_joint_b1_*.fits)")


if __name__ == "__main__":
    main()
