#!/usr/bin/env python
"""Scan-timed decomposition of the Sersic render's VPU cost (TPU).

Round-3 verdict stretch item 9 asked for one more render micro-A/B.
The suggested fusion — sharing ``log(r^2)`` between the profile and
the centroid correction — is ALREADY the implementation: the
correction's normalized-gradient form cancels the sqrt analytically,
so the per-pixel chain is exactly 1 log + 2 exp
(``ops/sersic.py sersic_profile_core``).  What remains to measure is
what each irreducible piece of that chain costs, so the plateau is a
number, not a claim:

* full render (2 Sersics, batch 125, the flagship configuration);
* ``correction=False`` — isolates the centroid-correction term
  (1 divide + ~5 fma per pixel);
* profile with hardware exp/log — the transcendental swap (already
  A/B'd end-to-end at parity, re-measured here at stage level).

Run on TPU; paste the dated numbers into CLAUDE.md.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from psfmc_tpu.ops.fastmath import (
        accurate_exp_unsafe,
        accurate_log_unsafe,
    )
    from psfmc_tpu.ops.sersic import (
        render_sersic,
        sersic_profile_core,
        sersic_scalar_params,
    )
    from psfmc_tpu.profiling import device_sync

    B = int(os.environ.get("BENCH_WALKERS", "125"))
    N = int(os.environ.get("BENCH_REPS", "200"))
    H = W = 128
    yg, xg = np.mgrid[0:H, 0:W].astype(np.float32)
    xg = jnp.asarray(xg)
    yg = jnp.asarray(yg)

    rng = np.random.RandomState(0)
    # two flagship-like Sersic parameter batches
    def batch():
        return dict(
            xy=jnp.asarray(
                np.stack([64 + rng.randn(B), 64 + rng.randn(B)], -1),
                jnp.float32,
            ),
            mag=jnp.asarray(20.5 + 0.1 * rng.randn(B), jnp.float32),
            reff=jnp.asarray(5.0 + 0.3 * rng.rand(B), jnp.float32),
            reff_b=jnp.asarray(4.0 + 0.3 * rng.rand(B), jnp.float32),
            index=jnp.asarray(2.0 + 0.2 * rng.rand(B), jnp.float32),
            angle=jnp.asarray(90.0 * rng.rand(B), jnp.float32),
        )

    b1, b2 = batch(), batch()

    def scan_time(label, fn, carry0):
        def body(c, _):
            out = fn(c)
            bump = (jnp.ravel(out)[0] * 1e-20).astype(c.dtype)
            return c + bump, None

        prog = jax.jit(
            lambda c0: jax.lax.scan(body, c0, None, length=N)[0]
        )
        device_sync(prog(carry0))
        t0 = time.time()
        device_sync(prog(carry0))
        dt = (time.time() - t0) / N * 1000
        print(f"{label}: {dt:.3f} ms/iter")
        return dt

    def render_two(correction):
        def one(seed_shift):
            def f(s):
                img = 0.0
                for b in (b1, b2):
                    img = img + jax.vmap(
                        lambda xy, m, r, rb, n, a: render_sersic(
                            xg, yg, xy, m + s * 0.0, r, rb, n, a,
                            25.9463, angle_degrees=True,
                            kappa_mode="table",
                            correction=correction,
                        )
                    )(b["xy"], b["mag"], b["reff"], b["reff_b"],
                      b["index"], b["angle"])
                return img
            return f
        return one(0)

    def render_hw():
        """Same chain with raw hardware exp/log (accuracy-unsafe)."""
        def f(s):
            img = 0.0
            for b in (b1, b2):
                def comp(xy, m, r, rb, n, a):
                    (x, y, m00, m01, m10, m11, kappa, rp,
                     sbeff) = sersic_scalar_params(
                        xy, m + s * 0.0, r, rb, n, a, 25.9463,
                        angle_degrees=True, kappa_mode="table",
                    )
                    return sersic_profile_core(
                        xg - x, yg - y, m00, m01, m10, m11, kappa,
                        rp, sbeff, jnp.exp, jnp.log,
                    )
                img = img + jax.vmap(comp)(
                    b["xy"], b["mag"], b["reff"], b["reff_b"],
                    b["index"], b["angle"])
            return img
        return f

    seed = jnp.float32(0.0)
    full = scan_time("render 2xSersic batch %d (full)" % B,
                     render_two(True), seed)
    nocorr = scan_time("render 2xSersic (correction=False)",
                       render_two(False), seed)
    hw = scan_time("render 2xSersic (hw exp/log)", render_hw(), seed)
    print(
        f"correction term: {full - nocorr:+.3f} ms "
        f"({(full - nocorr) / full:+.1%} of the full render); "
        f"software transcendentals: {full - hw:+.3f} ms vs hardware "
        f"({(full - hw) / full:+.1%})"
    )


if __name__ == "__main__":
    main()
