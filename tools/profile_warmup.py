#!/usr/bin/env python
"""Warmup (time-to-first-sample) breakdown for the headline bench.

BENCH_r02 flagged a warmup regression (11.3 s -> 55.1 s); measurements
here split it into the only four places it can live:

* Python import + model build (host),
* trace+lower of each phase program (host; ``jit.lower``),
* backend compile of each lowered program (tunnel RPC on axon;
  ``lowered.compile()`` — the persistent cache should absorb repeats),
* first execution (h2d + dispatch).

Run twice back-to-back to see the persistent-cache effect:
    python tools/profile_warmup.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

t0 = time.time()
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import importlib.util  # noqa: E402

spec_mod = importlib.util.spec_from_file_location(
    "graft_entry", os.path.join(repo, "__graft_entry__.py")
)
graft = importlib.util.module_from_spec(spec_mod)
spec_mod.loader.exec_module(graft)

from psfmc_tpu.models.posterior import build_posterior  # noqa: E402
from psfmc_tpu.models.spec import build_model_spec  # noqa: E402
from psfmc_tpu.profiling import device_sync  # noqa: E402
from psfmc_tpu.sampler.ensemble import EnsembleSampler  # noqa: E402

t_import = time.time() - t0

BURN = int(os.environ.get("BENCH_BURN", "200"))
ITERATIONS = int(os.environ.get("BENCH_ITER", "200"))
CHAINS = int(os.environ.get("BENCH_WALKERS", "250"))


def stamp(label, t):
    print(f"{label:<42s} {time.time() - t:8.2f} s", flush=True)
    return time.time()


t = time.time()
comps = graft._flagship_components()
spec = build_model_spec(comps)
fns = build_posterior(spec)
t = stamp("model build (host)", t)

rng = np.random.RandomState(0)
p0 = np.stack(
    [
        np.concatenate([np.ravel(s.dist.random(rng)) for s in spec.slots])
        for _ in range(CHAINS)
    ]
)
p0 = graft._enforce_axis_order(p0, spec)

sampler = EnsembleSampler(CHAINS, spec.num_params, fns, seed=0)
t = stamp("sampler ctor (program objects, no compile)", t)

# --- batched lnpost (used by init_state) ---------------------------------
import jax.numpy as jnp  # noqa: E402

blp = sampler._batched_lnpost()
lowered = blp.lower(jnp.asarray(p0, fns.dtype))
t = stamp("batched_lnpost trace+lower", t)
compiled = lowered.compile()
t = stamp("batched_lnpost backend compile", t)

sampler.init_state(p0)
device_sync(sampler.state.log_prob)
t = stamp("init_state (exec)", t)

# --- burn program --------------------------------------------------------
lowered = sampler._burn_prog.lower(sampler.state, nsteps=BURN)
t = stamp(f"burn program trace+lower (nsteps={BURN})", t)
compiled = lowered.compile()
t = stamp("burn program backend compile", t)

sampler.run_burn(BURN)
device_sync(sampler.state.positions)
t = stamp("burn exec", t)

# --- sampling program ----------------------------------------------------
sampler.reset()
lowered = sampler._sample_prog.lower(sampler.state, nsteps=ITERATIONS)
t = stamp(f"sample program trace+lower (nsteps={ITERATIONS})", t)
compiled = lowered.compile()
t = stamp("sample program backend compile", t)

sampler.run_sampling(ITERATIONS)
device_sync(sampler.state.positions)
t = stamp("sampling exec (incl. chain d2h)", t)

print(f"{'import':<42s} {t_import:8.2f} s")
print(f"{'TOTAL':<42s} {time.time() - t0:8.2f} s")
