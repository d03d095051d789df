#!/usr/bin/env python
"""Posterior-moment parity check on REAL TPU hardware.

Runs the same independent-numpy-reference comparison as
``tests/test_moment_parity.py`` (which executes on CPU under pytest),
but with the jax pipeline on the actual TPU chip at production settings:
float32, matmul-DFT convolution, table kappa, HIGH matmul precision.
This is the hardware-numerics evidence behind those defaults — run it
after changing any hot-path numeric (precision, kappa mode, conv mode).

Exit code 0 = all moments within tolerance; prints a per-parameter table.
"""
from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax.numpy as jnp

    # reuse the test module's reference pipeline (pure numpy, no jax)
    from tests.test_moment_parity import (
        H,
        TRUTH,
        ZP,
        _np_log_posterior,
        _np_sersic,
        _np_stretch_sampler,
        _priors,
    )
    from tests import test_moment_parity as M

    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import Configuration, Sersic, Sky
    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.models.spec import build_model_spec
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    # -- workload (identical to the test fixture) --
    rng = np.random.RandomState(99)
    yy, xx = np.mgrid[0:H, 0:H].astype(float)
    psf = np.exp(-((xx - H / 2) ** 2 + (yy - H / 2) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()
    t = TRUTH
    truth_img = t["adu"] + _np_sersic(
        xx, yy, t["x"], t["y"], t["mag"], t["reff"], t["reff_b"],
        t["index"], t["angle"], ZP,
    )
    f_psf = np.fft.rfft2(np.fft.ifftshift(psf))
    obs = np.fft.irfft2(np.fft.rfft2(truth_img) * f_psf, s=(H, H))
    obs = obs + rng.randn(H, H) * M.NOISE
    ivm = np.full((H, H), 1.0 / M.NOISE**2)
    grids = (xx, yy)
    pri = _priors()

    rng = np.random.RandomState(5)
    nwalkers = 64
    base = np.array([t["adu"], t["angle"], t["index"], t["mag"], t["reff"],
                     t["reff_b"], t["x"], t["y"]])
    scatter = np.array([0.01, 5.0, 0.1, 0.05, 0.15, 0.15, 0.2, 0.2])
    p0 = base + rng.randn(nwalkers, 8) * scatter
    p0[:, 4:6] = np.sort(p0[:, 4:6], axis=1)[:, ::-1]

    # -- reference pipeline (f64 numpy on host) --
    f_var = np.fft.rfft2(np.zeros_like(psf))

    def lnpost(theta):
        return _np_log_posterior(theta, obs, ivm, f_psf, f_var, grids)

    ref_cache = "/tmp/psfmc_moment_ref.npy"
    if os.path.exists(ref_cache):
        print("using cached numpy f64 reference chain")
        flat_np = np.load(ref_cache)
    else:
        print("running numpy f64 reference sampler ...")
        burn = _np_stretch_sampler(lnpost, p0, 300, np.random.RandomState(7))
        chain_np = _np_stretch_sampler(
            lnpost, burn[-1], 1500, np.random.RandomState(8)
        )
        flat_np = chain_np.reshape(-1, 8)
        np.save(ref_cache, flat_np)

    # -- TPU pipeline at production settings --
    config = Configuration(
        obs_file=obs, obsivm_file=ivm,
        psf_files=psf, psfivm_files=np.full_like(psf, 1e12),
        mag_zeropoint=ZP,
    )
    comps = [
        config,
        Sky(adu=D.Uniform(loc=pri["adu"][0], scale=pri["adu"][1])),
        Sersic(
            xy=D.Uniform(loc=np.array([pri["x"][0], pri["y"][0]]),
                         scale=np.array([pri["x"][1], pri["y"][1]])),
            mag=D.Uniform(loc=pri["mag"][0], scale=pri["mag"][1]),
            reff=D.Uniform(loc=pri["reff"][0], scale=pri["reff"][1]),
            reff_b=D.Uniform(loc=pri["reff_b"][0], scale=pri["reff_b"][1]),
            index=D.Uniform(loc=pri["index"][0], scale=pri["index"][1]),
            angle=D.Uniform(loc=pri["angle"][0], scale=pri["angle"][1]),
            angle_degrees=True,
        ),
    ]
    spec = build_model_spec(comps)
    fns = build_posterior(spec, dtype=jnp.float32)
    print(
        f"jax pipeline: dtype=float32 conv={fns.conv_mode} "
        f"kappa={fns.kappa_mode} render={fns.render_mode} "
        f"precision={os.environ.get('PSFMC_CONV_PRECISION', 'high')}"
    )
    s = EnsembleSampler(nwalkers, 8, fns, seed=3)
    s.init_state(p0.astype(np.float32))
    print("running TPU sampler (compile + 300 burn + 1500 sample) ...")
    s.run_burn(300)
    s.reset()
    s.run_sampling(1500)
    # float64 BEFORE moments: sequential f32 summation of ~1e5 samples
    # drifts by ~1e-3 on O(10) values and the two-pass std inflates by
    # the mean's bias — this artifact once mimicked a pipeline bug
    # (x-std appeared doubled) until traced to the statistics themselves
    flat_jax = np.asarray(s.flatchain, np.float64)
    print(f"acceptance: {s.acceptance_fraction.mean():.3f}")

    mean_np, mean_jx = flat_np.mean(0), flat_jax.mean(0)
    std_np, std_jx = flat_np.std(0), flat_jax.std(0)
    # Proper MC error: measure the integrated autocorrelation time of the
    # walker-averaged reference chain per parameter, and combine BOTH
    # chains' standard errors (each run is an independent estimate).
    from psfmc_tpu.sampler.autocorr import integrated_time

    nsteps = flat_np.shape[0] // nwalkers
    mean_chain = flat_np.reshape(nsteps, nwalkers, 8).mean(axis=1)
    try:
        tau = np.atleast_1d(integrated_time(mean_chain, axis=0, c=1))
    except Exception:
        tau = np.full(8, 25.0)
    tau = np.clip(tau, 1.0, nsteps / 10)
    se_one = std_np * np.sqrt(tau / flat_np.shape[0])
    se = np.sqrt(2.0) * se_one
    names = ["adu", "angle", "index", "mag", "reff", "reff_b", "x", "y"]

    print(f"\n{'param':>8} {'mean_np':>10} {'mean_tpu':>10} {'dev/se':>7} "
          f"{'std_np':>9} {'std_tpu':>9}")
    ok = True
    for i, name in enumerate(names):
        dev = abs(mean_jx[i] - mean_np[i]) / max(se[i], 1e-12)
        line_ok = dev < 5.0 and np.isclose(std_jx[i], std_np[i], rtol=0.35)
        ok &= bool(line_ok)
        print(f"{name:>8} {mean_np[i]:10.4f} {mean_jx[i]:10.4f} {dev:7.2f} "
              f"{std_np[i]:9.4f} {std_jx[i]:9.4f} {'' if line_ok else ' <-- FAIL'}")
    print("\nRESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
