#!/usr/bin/env python
"""Stage-level TPU profile of the flagship posterior (scan-timed).

Times each pipeline stage INSIDE a lax.scan so per-call dispatch over
the axon tunnel (~2 ms) does not pollute the numbers — the equivalent
of the reference's timeit micro-benchmarks (reference
tests/test_components.py:111-118,150-160), but for the real fused hot
path. Run on the TPU after any hot-path change; see CLAUDE.md for the
measured budget history.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.models.spec import build_model_spec
    from psfmc_tpu.ops.fourier import convolve_rdft
    from psfmc_tpu.profiling import device_sync
    from psfmc_tpu.sampler.ensemble import EnsembleSampler, run_stretch_move

    spec_mod = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO, "__graft_entry__.py")
    )
    graft = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(graft)

    comps = graft._flagship_components()
    spec = build_model_spec(comps)
    fns = build_posterior(spec)
    c = fns.constants
    B = 125  # half-ensemble batch at the default 250 walkers
    rng = np.random.RandomState(0)
    p0 = np.stack(
        [
            np.concatenate([np.ravel(s.dist.random(rng)) for s in spec.slots])
            for _ in range(2 * B)
        ]
    )
    p0 = graft._enforce_axis_order(p0, spec)
    th = jnp.asarray(p0[:B], jnp.float32)
    imgs = jnp.asarray(rng.rand(B, 128, 128), jnp.float32)

    def scan_time(label, fn, carry_init, n=200):
        def body(carry, _):
            out = fn(carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = (jnp.ravel(leaf)[0] * 1e-20).astype(carry.dtype)
            return carry + bump, None

        prog = jax.jit(lambda c0: jax.lax.scan(body, c0, None, length=n)[0])
        r = prog(carry_init)
        device_sync(r)
        t0 = time.time()
        r = prog(carry_init)
        device_sync(r)
        print(f"{label}: {(time.time() - t0) / n * 1000:.3f} ms/iter")

    kr = jnp.asarray(c["psf_r"][0]) if "psf_r" in c else None

    scan_time(
        "render only (raw+ps, batch 125)",
        lambda t: jax.vmap(lambda x: fns._raw_and_ps(x)[0])(t),
        th,
    )
    if kr is not None:
        ki = jnp.asarray(c["psf_i"][0])
        vr = jnp.asarray(c["var_r"][0])
        vi = jnp.asarray(c["var_i"][0])
        mats = c["rdft_mats"]

        def conv2(x):
            return (
                convolve_rdft(x, kr, ki, mats),
                convolve_rdft(x * x, vr, vi, mats),
            )

        scan_time("2 convs only (batch 125)", conv2, imgs)
    scan_time(
        "full lnpost (batch 125)",
        lambda t: jax.vmap(fns.log_posterior)(t),
        th,
    )

    # whole-phase programs (the real thing the fit runs)
    s = EnsembleSampler(2 * B, spec.num_params, fns, seed=0)
    s.init_state(p0)
    state = s.state
    for label, kw in [
        ("burn 200 steps", dict(accumulate=False, record=False)),
        ("sampling 200 steps (compute)", dict(accumulate=True, record=True)),
    ]:
        prog = jax.jit(
            partial(
                run_stretch_move,
                fns.log_posterior,
                fns.carry_images,
                ensemble_means_fn=fns.ensemble_carry_means,
                **kw,
            ),
            static_argnames=("nsteps",),
        )
        out = prog(state, nsteps=200)
        device_sync(out[0].positions)
        t0 = time.time()
        out = prog(state, nsteps=200)
        device_sync(out[0].positions)
        print(f"{label}: {(time.time() - t0) * 1000:.0f} ms")


if __name__ == "__main__":
    main()
