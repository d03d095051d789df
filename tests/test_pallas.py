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


@pytest.mark.parametrize("lnpost_mode", ["pallas", "pallas_batched"])
@pytest.mark.parametrize(
    "dot_mode,rtol,atol",
    [("highest", 2e-6, 2e-2), ("bf16x3", 5e-5, 1.0)],
)
def test_fused_lnpost_matches_xla(rng, gaussian_psf, monkeypatch,
                                  dot_mode, rtol, atol, lnpost_mode):
    """The fused Pallas render+DFT+likelihood kernel matches the XLA
    posterior (interpret mode on CPU).

    dot_mode=highest: true-f32 dots, f32-roundoff agreement.
    dot_mode=bf16x3 (the f32 default): hand-emulated 3-pass bf16 dots —
    same scheme as the XLA conv path's validated HIGH precision, but
    re-split at every one of the 12 chained DFT stages, so compounding
    leaves ~0.5 lnpost units on lnl ~ -1e4..-8e4 (rel ~3e-5; the knob
    matrix treats +-5 units as agreement, fastmath modes differ by
    ~0.2)."""
    import jax.numpy as jnp

    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import (
        Configuration, PointSource, Sersic, Sky,
    )
    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.models.spec import build_model_spec

    obs = 0.1 + rng.randn(32, 32) * 0.01
    comps = [
        Configuration(
            obs_file=obs,
            obsivm_file=np.full((32, 32), 1e4),
            psf_files=gaussian_psf,
            psfivm_files=np.ones_like(gaussian_psf) * 1e6,
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.1, scale=0.05)),
        PointSource(
            xy=D.Uniform(loc=np.array([10.0, 10.0]), scale=np.array([12.0, 12.0])),
            mag=D.Uniform(loc=19.0, scale=3.0),
        ),
        Sersic(
            xy=D.Uniform(loc=np.array([10.0, 10.0]), scale=np.array([12.0, 12.0])),
            mag=D.Uniform(loc=20.0, scale=3.0),
            reff=D.Uniform(loc=1.0, scale=6.0),
            reff_b=D.Uniform(loc=1.0, scale=6.0),
            index=D.WeibullMinimum(c=1.5, scale=4),
            angle=D.Uniform(loc=0.0, scale=180.0),
            angle_degrees=True,
        ),
    ]
    spec = build_model_spec(comps)

    monkeypatch.setenv("PSFMC_CONV", "dft")
    monkeypatch.setenv("PSFMC_LNPOST", lnpost_mode)
    monkeypatch.setenv("PSFMC_LNPOST_DOT", dot_mode)
    # tile 4 on a batch of 6: exercises both the multi-program grid and
    # the pad-to-whole-tiles path of the walker-batched kernel
    monkeypatch.setenv("PSFMC_LNPOST_TILE", "4")
    fns_fused = build_posterior(spec)
    assert hasattr(fns_fused, "log_posterior_batch")
    monkeypatch.setenv("PSFMC_LNPOST", "xla")
    fns_xla = build_posterior(spec)

    thetas = np.stack([
        np.concatenate([np.ravel(s.dist.random(rng)) for s in spec.slots])
        for _ in range(6)
    ])
    thetas[:, :] = thetas  # reff>=reff_b not enforced: priors gate it
    import jax

    a = np.asarray(fns_fused.log_posterior_batch(jnp.asarray(thetas, jnp.float32)))
    b = np.asarray(jax.vmap(fns_xla.log_posterior)(jnp.asarray(thetas, jnp.float32)))
    finite = np.isfinite(b)
    assert np.array_equal(finite, np.isfinite(a))
    assert np.allclose(a[finite], b[finite], rtol=rtol, atol=atol)

    # the ensemble sampler picks up the fused path transparently
    from psfmc_tpu.sampler.ensemble import EnsembleSampler

    s = EnsembleSampler(8, spec.num_params, fns_fused, seed=0)
    good = thetas[np.isfinite(b)]
    p0 = np.concatenate([good] * 3)[:8]
    off = {sl.name: sl.offset for sl in spec.slots}
    ra, rb = off["2_Sersic_reff"], off["2_Sersic_reff_b"]
    p0[:, ra] = np.maximum(p0[:, ra], p0[:, rb] + 1e-3)  # in-support
    s.init_state(p0)
    s.run_sampling(3)
    assert np.all(np.isfinite(s.lnprobability))


def test_batched_lnpost_component_agnostic(rng, gaussian_psf, monkeypatch):
    """pallas_batched covers components the per-walker fused kernel
    whitelists away (Moffat): the render stays in XLA, so any component
    mix must match the XLA posterior."""
    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import (
        Configuration, Moffat, Sky,
    )
    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.models.spec import build_model_spec

    comps = [
        Configuration(
            obs_file=0.1 + rng.randn(32, 32) * 0.01,
            obsivm_file=np.full((32, 32), 1e4),
            psf_files=gaussian_psf,
            psfivm_files=np.ones_like(gaussian_psf) * 1e6,
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.1, scale=0.05)),
        Moffat(
            xy=D.Uniform(loc=np.array([10.0, 10.0]),
                         scale=np.array([12.0, 12.0])),
            mag=D.Uniform(loc=20.0, scale=3.0),
            fwhm=D.Uniform(loc=2.0, scale=6.0),
            fwhm_b=D.Uniform(loc=2.0, scale=6.0),
            index=D.Uniform(loc=1.5, scale=3.0),
            angle=D.Uniform(loc=0.0, scale=180.0),
        ),
    ]
    spec = build_model_spec(comps)

    monkeypatch.setenv("PSFMC_LNPOST", "pallas_batched")
    fb = build_posterior(spec)
    assert hasattr(fb, "log_posterior_batch")
    monkeypatch.setenv("PSFMC_LNPOST", "xla")
    fx = build_posterior(spec)

    thetas = np.stack([
        np.concatenate([np.ravel(s.dist.random(rng))
                        for s in spec.slots])
        for _ in range(5)
    ])
    a = np.asarray(
        fb.log_posterior_batch(jnp.asarray(thetas, jnp.float32))
    )
    b = np.asarray(jax.vmap(fx.log_posterior)(
        jnp.asarray(thetas, jnp.float32)
    ))
    finite = np.isfinite(b)
    assert finite.any()
    assert np.array_equal(finite, np.isfinite(a))
    assert np.allclose(a[finite], b[finite], rtol=5e-5, atol=1.0)


def test_pallas_tiled_matches_xla_render(rng):
    """Walker-tiled VMEM kernel parity (incl. a non-divisible batch)."""
    from psfmc_tpu.ops.pallas.sersic_pallas import (
        render_sersics_pallas_tiled,
    )

    for B in (8, 7):  # 7 exercises the tile=1 fallback
        S, H, W = 2, 32, 32
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
        got = np.asarray(
            render_sersics_pallas_tiled(
                jnp.stack(params), jnp.asarray(skies), (H, W)
            )
        )
        want = np.stack(want)
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-12)
        assert rel.max() < 5e-6, (B, rel.max())


def test_pallas_tiled_posterior_mode(rng, gaussian_psf, monkeypatch):
    """Full vmapped posterior with PSFMC_RENDER=pallas_tiled routes the
    batch through the tiled kernel (custom_vmap) and matches XLA."""
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
            xy=D.Uniform(loc=np.array([10.0, 10.0]),
                         scale=np.array([10.0, 10.0])),
            mag=D.Uniform(loc=19, scale=3),
            reff=D.Uniform(loc=2, scale=6),
            reff_b=D.Uniform(loc=2, scale=6),
            index=1.7,
            angle=30.0,
        ),
    ]
    spec = build_model_spec(comps)
    fx = build_posterior(spec)
    monkeypatch.setenv("PSFMC_RENDER", "pallas_tiled")
    ft = build_posterior(spec)
    assert ft.render_mode == "pallas_tiled"

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
    lt = np.asarray(jax.vmap(ft.log_posterior)(thetas))
    assert np.all(np.isfinite(lx))
    assert np.allclose(lt, lx, rtol=1e-4)
    # unbatched call works too (custom_vmap base function)
    l1 = float(ft.log_posterior(thetas[0]))
    assert np.isclose(l1, lx[0], rtol=1e-4)
