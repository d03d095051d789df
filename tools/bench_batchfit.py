#!/usr/bin/env python
"""Throughput of batched multi-target fitting on TPU (fits per second).

The completeness-simulation production number: K mock observations of
the flagship J0005-0006 field, each fit with its own (2*dim+2)-walker
ensemble for burn+sample steps, all as ONE vmapped program with the
target axis on the chip.  Compares against running the same program at
K=1 sequentially — the reference's only option (serial per-mock
processes, reference fitting.py:55).

Usage (TPU):  python tools/bench_batchfit.py
Env: BENCH_TARGETS (default 16), BENCH_STEPS (default 200 = burn and
sampling steps each), BENCH_SEED.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench_common import REPO, setup_jax_cache  # noqa: E402

sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

setup_jax_cache()

K = int(os.environ.get("BENCH_TARGETS", "16"))
STEPS = int(os.environ.get("BENCH_STEPS", "200"))
SEED = int(os.environ.get("BENCH_SEED", "0"))


def main():
    from _bench_common import load_graft

    from psfmc_tpu.batchfit import fit_batch, simulate_stack
    from psfmc_tpu.models.multicomponent import MultiComponentModel
    from psfmc_tpu.profiling import device_sync

    print(f"# devices: {jax.devices()}", flush=True)
    t0 = time.time()
    device_sync(jnp.ones(4) * 2)
    print(f"# first contact: {time.time() - t0:.1f} s", flush=True)

    graft = load_graft()
    model = MultiComponentModel(graft._flagship_components())
    dim = model.spec.num_params
    nwalkers = 2 * dim + 2
    print(
        f"# flagship model: dim={dim}, {nwalkers} walkers/target, "
        f"{STEPS}+{STEPS} steps, K={K} targets",
        flush=True,
    )

    t0 = time.time()
    obs, ivm, injected = simulate_stack(model, K, seed=SEED)
    print(f"# simulate_stack: {time.time() - t0:.1f} s", flush=True)

    def run(k_targets, seed):
        return fit_batch(
            model,
            obs[:k_targets],
            ivm[:k_targets],
            nwalkers=nwalkers,
            burn=STEPS,
            iterations=STEPS,
            seed=seed,
        )

    # compile both program shapes
    t0 = time.time()
    run(K, SEED)
    print(f"# K={K} compile+first run: {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    run(1, SEED)
    print(f"# K=1 compile+first run: {time.time() - t0:.1f} s", flush=True)

    # warm measurements (fit_batch fetches results, so wall time is
    # an honest end-to-end number including the O(dim) d2h)
    t0 = time.time()
    res = run(K, SEED + 1)
    t_batch = time.time() - t0

    t0 = time.time()
    for i in range(min(4, K)):
        run(1, SEED + 2 + i)
    t_serial_per = (time.time() - t0) / min(4, K)

    # max|pull| is reported as an FYI only: flagship mocks contain
    # BRIGHT sources whose razor-thin posteriors (std ~1e-3 mag) need
    # thousands of steps before the chain mean settles to sub-std
    # precision — at the 200+200 throughput schedule large pulls are
    # expected chain-length behavior, not mis-fitting (calibration at
    # marginal S/N is asserted in tests/test_batchfit.py: max |pull|
    # 1.95 over 8 targets).  The health gate is finiteness + sane
    # acceptance.
    pulls = np.abs(res.pulls(injected)).max()
    # acceptance floor 0.01, not 0.05: ~1 in 64 prior-drawn flagship
    # mocks lands on a hard double-Sersic config that accepts at ~4%
    # (dim-18 flux-sharing degeneracy) — a workload property, measured
    # 2026-08-17, not a sampler fault
    ok = bool(
        np.all(np.isfinite(res.mean))
        and np.all((res.acceptance > 0.01) & (res.acceptance < 0.95))
    )
    result = {
        "metric": f"batchfit_{K}x_flagship_{STEPS}+{STEPS}",
        "seconds_batched": round(t_batch, 3),
        "per_fit_ms": round(1e3 * t_batch / K, 1),
        "fits_per_s": round(K / t_batch, 2),
        "seconds_per_serial_fit": round(t_serial_per, 3),
        "batch_speedup": round(t_serial_per * K / t_batch, 2),
        "max_abs_pull": round(float(pulls), 2),
        "acc_min": round(float(res.acceptance.min()), 3),
        "acc_max": round(float(res.acceptance.max()), 3),
        "n_nonfinite": int(np.sum(~np.isfinite(res.mean))),
        "health_ok": ok,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
