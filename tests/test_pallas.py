"""Pallas fused render kernel vs the XLA renderer (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psfmc_tpu.ops.coords import coord_grids
from psfmc_tpu.ops.pallas import (
    pack_sersic_params,
    render_sersics_pallas,
    render_sersics_pallas_one,
)
from psfmc_tpu.ops.sersic import render_sersic


def _random_sersic_args(rng):
    xy = jnp.asarray([20 + 20 * rng.rand(), 20 + 20 * rng.rand()], jnp.float32)
    return (
        xy,
        20.0 + rng.rand(),
        3.0 + 3 * rng.rand(),
        2.0 + 2 * rng.rand(),
        0.7 + 3 * rng.rand(),
        180.0 * rng.rand(),
        25.0,
        True,
    )


def test_pallas_matches_xla_render(rng):
    B, S, H, W = 4, 2, 64, 64
    xg, yg = coord_grids((H, W), jnp.float32)

    params, skies, want = [], [], []
    for _b in range(B):
        sky = np.float32(rng.rand() * 0.1)
        img = np.full((H, W), sky, np.float32)
        rows = []
        for _s in range(S):
            args = _random_sersic_args(rng)
            rows.append(pack_sersic_params(*args, kappa_mode="table"))
            img += np.asarray(
                render_sersic(xg, yg, *args, kappa_mode="table")
            )
        params.append(jnp.stack(rows))
        skies.append(sky)
        want.append(img)
    params = jnp.stack(params)
    got = np.asarray(
        render_sersics_pallas(params, jnp.asarray(skies), (H, W))
    )
    want = np.stack(want)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-12)
    assert rel.max() < 5e-6


def test_pallas_posterior_mode(rng, gaussian_psf):
    """Full posterior with render_mode=pallas matches the XLA posterior."""
    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import Configuration, Sersic, Sky
    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.models.spec import build_model_spec

    cfg = Configuration(
        obs_file=rng.rand(32, 32),
        obsivm_file=np.ones((32, 32)) * 100,
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e8,
        mag_zeropoint=25.0,
    )
    comps = [
        cfg,
        Sky(adu=D.Normal(loc=0.1, scale=1.0)),
        Sersic(
            xy=D.Uniform(loc=np.array([10.0, 10.0]), scale=np.array([10.0, 10.0])),
            mag=D.Uniform(loc=19, scale=3),
            reff=D.Uniform(loc=2, scale=6),
            reff_b=D.Uniform(loc=2, scale=6),
            index=1.7,
            angle=30.0,
        ),
    ]
    spec = build_model_spec(comps)
    fx = build_posterior(spec)
    fp = build_posterior(spec)
    fp.render_mode = "pallas"

    thetas = jnp.asarray(
        np.column_stack(
            [
                rng.uniform(0.05, 0.15, 8),
                rng.uniform(19.5, 21.5, 8),
                rng.uniform(3, 7, 8),
                rng.uniform(2.2, 2.9, 8),
                rng.uniform(12, 18, 8),
                rng.uniform(12, 18, 8),
            ]
        ),
        jnp.float32,
    )
    lx = np.asarray(jax.vmap(fx.log_posterior)(thetas))
    lp = np.asarray(jax.vmap(fp.log_posterior)(thetas))
    assert np.all(np.isfinite(lx))
    assert np.allclose(lp, lx, rtol=1e-4)
