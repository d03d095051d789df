"""Shared plumbing for the on-hardware tools (tpu_smoke, ab_headline).

Single source of truth for the knob-env list and the flagship setup —
the two scripts' KNOB_KEYS once diverged (PSFMC_LNPOST_DOT was missing
from the smoke), which silently let ambient env leak into a "default"
measurement.
"""
from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# EVERY env var read by build_posterior()/the kernels.  run_config-style
# sweeps must pop all of these before applying a config's env, or the
# shell's leftovers contaminate the measurement.
KNOB_KEYS = [
    "PSFMC_CONV",
    "PSFMC_CONV_PRECISION",
    "PSFMC_CONV_STACK",
    "PSFMC_KAPPA",
    "PSFMC_RENDER",
    "PSFMC_LNPOST",
    "PSFMC_LNPOST_DOT",
    "PSFMC_FASTMATH",
    "PSFMC_NEWTON_ITERS",
    "PSFMC_LNPOST_TILE",
    "PSFMC_CORR_RECIP",
]


def setup_jax_cache():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass

    # cache prune-policy support (tools/prune_jaxcache.py)
    from psfmc_tpu.cachelog import maybe_record_cache_keys

    maybe_record_cache_keys()


def load_graft():
    spec_mod = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO, "__graft_entry__.py")
    )
    graft = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(graft)
    return graft


def apply_knobs(env):
    """Clear every knob, then apply ``env`` — config isolation."""
    for k in KNOB_KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)


def flagship_setup(chains, seed=0):
    """(graft, comps, spec, p0) for the headline-bench model."""
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from psfmc_tpu.models.spec import build_model_spec

    graft = load_graft()
    comps = graft._flagship_components()
    rng = np.random.RandomState(seed)
    spec = build_model_spec(comps)
    p0 = np.stack(
        [
            np.concatenate(
                [np.ravel(s.dist.random(rng)) for s in spec.slots]
            )
            for _ in range(chains)
        ]
    )
    p0 = graft._enforce_axis_order(p0, spec)
    return graft, comps, spec, p0
