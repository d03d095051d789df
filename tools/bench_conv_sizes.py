#!/usr/bin/env python
"""Measure the dft-vs-fft convolution crossover by image size on TPU.

The matmul-DFT path (PSFMC_CONV=dft, the TPU default) costs ~24*N^3
flops per NxN convolution but runs on the MXU; XLA's FFT lowering costs
~10*N^2*log2(N) on a far slower unit.  At the flagship 128x128 the DFT
wins (measured round 1); this probe times both paths at a batch of
walkers across sizes so the default's validity range is MEASURED, not
assumed.  Paste the dated table into CLAUDE.md.
"""
from __future__ import annotations

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

from psfmc_tpu.ops.fourier import (  # noqa: E402
    convolve,
    convolve_rdft,
    pad_and_rfft_image,
    rdft_matrices,
)
from psfmc_tpu.profiling import device_sync  # noqa: E402

BATCH = int(os.environ.get("BENCH_WALKERS", "125"))
SIZES = tuple(
    int(s) for s in os.environ.get(
        "BENCH_SIZES", "64,128,192,256,384,512"
    ).split(",")
)
REPS = 20


def scan_timed(conv_one, imgs):
    """Time REPS chained convolutions inside ONE dispatched program.

    Standalone jit calls measure tunnel dispatch latency (~2-30 ms
    each), not compute — CLAUDE.md: profile with scan-timed stages.
    The scan carry feeds each output into the next input so nothing is
    dead-code-eliminated or parallelized away.
    """
    def prog(x):
        return jax.lax.scan(
            lambda c, _: (conv_one(c), None), x, None, length=REPS
        )[0]

    prog_j = jax.jit(prog)
    device_sync(prog_j(imgs))  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        device_sync(prog_j(imgs))
        best = min(best, (time.time() - t0) / REPS)
    return best


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    t0 = time.time()
    device_sync(jnp.ones(4) * 2)
    print(f"# first contact: {time.time() - t0:.1f} s", flush=True)
    rng = np.random.RandomState(0)

    print(f"# batch={BATCH} reps={REPS}; per-call = one batched "
          "convolution (conv of raw; the hot path runs 2/step)")
    rows = []
    for n in SIZES:
        imgs = rng.rand(BATCH, n, n).astype(np.float32)
        # normalized kernel: the scan chains convolutions through the
        # carry, and an unnormalized random kernel (sum ~ n^2/8) would
        # overflow f32 to inf within a few reps
        psf = rng.rand(n // 2, n // 2).astype(np.float32)
        psf /= psf.sum()
        fk = pad_and_rfft_image(psf, (n, n)).astype(np.complex64)
        kr = np.ascontiguousarray(fk.real)
        ki = np.ascontiguousarray(fk.imag)
        mats = rdft_matrices((n, n), np.float32)

        dft = lambda x, _m=mats, _r=kr, _i=ki: convolve_rdft(x, _r, _i, _m)
        fft = lambda x, _k=fk: convolve(x, _k)

        a = np.asarray(jax.jit(dft)(imgs))
        b = np.asarray(jax.jit(fft)(imgs))
        err = float(np.max(np.abs(a - b)) / np.max(np.abs(b)))

        t_dft = scan_timed(dft, imgs)
        t_fft = scan_timed(fft, imgs)
        winner = "dft" if t_dft < t_fft else "fft"
        rows.append((n, t_dft, t_fft, winner))
        print(f"N={n:4d}  dft={t_dft*1e3:8.3f} ms  fft={t_fft*1e3:8.3f} ms"
              f"  ratio={t_dft/t_fft:5.2f}  winner={winner}  parity={err:.2e}",
              flush=True)

    print("\n# summary (paste into CLAUDE.md):")
    print("# " + " | ".join(
        f"{n}:{w}({td*1e3:.2f}/{tf*1e3:.2f}ms)" for n, td, tf, w in rows
    ))


if __name__ == "__main__":
    main()
