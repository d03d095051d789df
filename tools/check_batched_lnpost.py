#!/usr/bin/env python
"""On-hardware check of the walker-batched fused lnpost kernel.

Compiles PSFMC_LNPOST=pallas_batched on the real chip (Mosaic, not
interpret) at the flagship shape and asserts agreement with the XLA
posterior — the round-2 lesson says interpret-mode coverage is NOT
hardware coverage for Pallas kernels.
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


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    t0 = time.time()
    device_sync(jax.numpy.ones(4) * 2)
    print(f"# tunnel first contact: {time.time() - t0:.1f} s", flush=True)

    _, comps, spec0, p0 = flagship_setup(125)

    apply_knobs({})
    fx = build_posterior(build_model_spec(comps))
    ref = jax.jit(jax.vmap(fx.log_posterior))
    t0 = time.time()
    b = np.asarray(ref(p0.astype(np.float32)))
    print(f"# xla eval: {time.time() - t0:.1f} s", flush=True)

    for tile in ("4", "8"):
        apply_knobs({"PSFMC_LNPOST": "pallas_batched",
                     "PSFMC_LNPOST_TILE": tile})
        fb = build_posterior(build_model_spec(comps))
        assert hasattr(fb, "log_posterior_batch"), "kernel not selected"
        prog = jax.jit(fb.log_posterior_batch)
        t0 = time.time()
        a = np.asarray(prog(p0.astype(np.float32)))
        print(f"# tile={tile} compile+eval: {time.time() - t0:.1f} s",
              flush=True)
        finite = np.isfinite(b)
        ok_mask = np.array_equal(finite, np.isfinite(a))
        d = np.abs(a[finite] - b[finite])
        rel = d / np.maximum(np.abs(b[finite]), 1.0)
        print(f"tile={tile}: finite-mask match={ok_mask} "
              f"max_abs={d.max():.3g} max_rel={rel.max():.3g}",
              flush=True)
        assert ok_mask
        assert rel.max() < 1e-4, rel.max()
    print("PASS: pallas_batched matches XLA on hardware", flush=True)


if __name__ == "__main__":
    main()
