#!/usr/bin/env python
"""Same-process A/B of PSFMC_* knob configs at headline-bench scale.

Separate bench.py runs vary 0.574-0.703 s across a single day (tunnel
+ chip state), so knob comparisons are only meaningful when every
config is built and timed inside ONE process/tunnel session, ideally
interleaved (CLAUDE.md round-3 methodology).  This tool runs each
config's full 250-walker burn+sample pass ``--reps`` times in
round-robin order and reports per-config best and median.

Usage:
    python tools/ab_headline.py                 # default config set
    python tools/ab_headline.py --reps 3
"""
from __future__ import annotations

import argparse
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

CONFIG_SETS = {
    "pallas": [
        ("xla-default", {}),
        ("pallas-batched tile=8",
         {"PSFMC_LNPOST": "pallas_batched", "PSFMC_LNPOST_TILE": "8"}),
        ("pallas-batched tile=5",
         {"PSFMC_LNPOST": "pallas_batched", "PSFMC_LNPOST_TILE": "5"}),
        ("pallas-lnpost dot=highest",
         {"PSFMC_LNPOST": "pallas", "PSFMC_CONV": "dft",
          "PSFMC_LNPOST_DOT": "highest"}),
        ("pallas-lnpost dot=bf16x3",
         {"PSFMC_LNPOST": "pallas", "PSFMC_CONV": "dft",
          "PSFMC_LNPOST_DOT": "bf16x3"}),
    ],
    # conv-channel stacking (round-4 verdict item 2): three M=125
    # GEMM groups per DFT stage -> one M=375 group
    "stack": [
        ("xla-default", {}),
        ("conv-stack", {"PSFMC_CONV_STACK": "1"}),
    ],
}
DEFAULT_CONFIGS = CONFIG_SETS["pallas"]


def build(env, comps):
    apply_knobs(env)
    spec = build_model_spec(comps)
    fns = build_posterior(spec)
    return spec, fns


def timed_pass(spec, fns, p0, seed):
    sampler = EnsembleSampler(CHAINS, spec.num_params, fns, seed=seed)
    sampler.init_state(p0)
    t0 = time.time()
    sampler.run_burn(BURN)
    sampler.reset()
    sampler.run_sampling(ITER)
    device_sync(sampler.state.positions)
    dt = time.time() - t0
    lnp = float(np.mean(sampler.lnprobability[:, -1]))
    return dt, lnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--set", choices=sorted(CONFIG_SETS), default="pallas",
                    dest="config_set")
    args = ap.parse_args()
    global DEFAULT_CONFIGS
    DEFAULT_CONFIGS = CONFIG_SETS[args.config_set]

    print(f"# devices: {jax.devices()}", flush=True)
    t0 = time.time()
    device_sync(jax.numpy.ones(4) * 2)
    print(f"# tunnel first contact: {time.time() - t0:.1f} s", flush=True)

    _, comps, _, p0 = flagship_setup(CHAINS)

    built = []
    for name, env in DEFAULT_CONFIGS:
        t0 = time.time()
        spec, fns = build(env, comps)
        # warm every program once before any timing
        dt, lnp = timed_pass(spec, fns, p0, seed=0)
        print(f"# built+warmed {name}: {time.time()-t0:.1f}s "
              f"(warm pass {dt:.3f}s lnp={lnp:.1f})", flush=True)
        built.append((name, spec, fns, [], lnp))

    for rep in range(args.reps):
        for name, spec, fns, times, _ in built:
            dt, _ = timed_pass(spec, fns, p0, seed=rep + 1)
            times.append(dt)
            print(f"  rep{rep} {name}: {dt:.3f}s", flush=True)

    print("\n=== A/B SUMMARY "
          f"({CHAINS} walkers x {BURN}+{ITER}, reps={args.reps}) ===")
    base = min(built[0][3])
    for name, _, _, times, lnp in built:
        best, med = min(times), float(np.median(times))
        print(f"{name:<28s} best={best:.3f}s median={med:.3f}s "
              f"vs-base={best / base - 1:+.1%} lnp={lnp:.1f}")


if __name__ == "__main__":
    main()
