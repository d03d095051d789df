#!/usr/bin/env python
"""Same-process A/B: centroid-correction divide vs Newton reciprocal.

Round-3 verdict stretch item 9.  The suggested shared-log fusion is
already the implementation (sersic_profile_core cancels the gradient's
sqrt analytically), so the measured lever left in the correction term
is its per-pixel f32 divide.  Stage-level (scan-timed render, batch
125, 2026-08-20): divide 0.110 ms/iter vs fast_recip 0.041 ms/iter.
This tool measures whether that survives end-to-end fusion at headline
scale (same methodology as tools/ab_headline.py).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench_common import (  # noqa: E402
    REPO, apply_knobs, flagship_setup, setup_jax_cache,
)

sys.path.insert(0, REPO)

import jax  # noqa: E402

setup_jax_cache()

from psfmc_tpu.models.posterior import build_posterior  # noqa: E402
from psfmc_tpu.models.spec import build_model_spec  # noqa: E402
from psfmc_tpu.profiling import device_sync  # noqa: E402
from psfmc_tpu.sampler.ensemble import EnsembleSampler  # noqa: E402

BURN = int(os.environ.get("BENCH_BURN", "200"))
ITER = int(os.environ.get("BENCH_ITER", "200"))
CHAINS = int(os.environ.get("BENCH_WALKERS", "250"))

CONFIGS = [
    ("corr=div (old)", {"PSFMC_CORR_RECIP": "0"}),
    ("corr=recip (new)", {"PSFMC_CORR_RECIP": "1"}),
]


def timed_pass(spec, fns, p0, seed):
    sampler = EnsembleSampler(CHAINS, spec.num_params, fns, seed=seed)
    sampler.init_state(p0)
    t0 = time.time()
    sampler.run_burn(BURN)
    sampler.reset()
    sampler.run_sampling(ITER)
    device_sync(sampler.state.positions)
    return time.time() - t0, float(np.mean(sampler.lnprobability[:, -1]))


def main():
    reps = int(os.environ.get("AB_REPS", "4"))
    print(f"# devices: {jax.devices()}", flush=True)
    t0 = time.time()
    device_sync(jax.numpy.ones(4) * 2)
    print(f"# tunnel first contact: {time.time() - t0:.1f} s", flush=True)

    _, comps, _, p0 = flagship_setup(CHAINS)
    built = []
    for name, env in CONFIGS:
        apply_knobs(env)
        spec = build_model_spec(comps)
        fns = build_posterior(spec)
        dt, lnp = timed_pass(spec, fns, p0, seed=0)
        print(f"# built+warmed {name}: warm pass {dt:.3f}s "
              f"lnp={lnp:.1f}", flush=True)
        built.append((name, env, spec, fns, [], lnp))

    for rep in range(reps):
        for name, env, spec, fns, times, _ in built:
            apply_knobs(env)
            dt, _ = timed_pass(spec, fns, p0, seed=rep + 1)
            times.append(dt)
            print(f"  rep{rep} {name}: {dt:.3f}s", flush=True)

    print(f"\n=== corr-recip A/B ({CHAINS}x{BURN}+{ITER}, "
          f"reps={reps}) ===")
    base = min(built[0][4])
    for name, _, _, _, times, lnp in built:
        best, med = min(times), float(np.median(times))
        print(f"{name:<18s} best={best:.3f}s median={med:.3f}s "
              f"vs-div={best / base - 1:+.1%} lnp={lnp:.1f}")


if __name__ == "__main__":
    main()
