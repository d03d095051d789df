"""Batched multi-target fitting (the completeness-simulation workflow).

K independent ensemble fits run as ONE vmapped program
(psfmc_tpu.batchfit); the reference runs these serially, one process
per mock (its own parallelism is broken — reference fitting.py:55).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.batchfit import fit_batch, prepare_obs_stack, simulate_stack
from psfmc_tpu.models.components import Configuration, PointSource, Sky
from psfmc_tpu.models.multicomponent import MultiComponentModel


def _model(rng, noise=0.05):
    """Small Sky + PointSource model at marginal-detection S/N.

    Deliberately NOT a high-S/N source: a razor-thin posterior (std
    ~1e-3 mag) needs thousands of ensemble steps before the chain MEAN
    settles to sub-std precision, so recovery pulls would measure
    burn-in length, not correctness.  At S/N ~ tens the posterior is
    wide enough that a few hundred steps give calibrated ~N(0,1) pulls
    (measured max |pull| 1.95 over 8 targets x 4 params at 400+400).
    """
    h = w = 24
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 12) ** 2 + (yy - 12) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()
    comps = [
        Configuration(
            obs_file=0.05 + rng.randn(h, w) * noise,
            obsivm_file=np.full((h, w), 1.0 / noise**2),
            psf_files=psf,
            psfivm_files=np.full((h, w), 1e8),
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.05, scale=0.05)),
        PointSource(
            xy=D.Uniform(loc=np.array([9.0, 9.0]),
                         scale=np.array([6.0, 6.0])),
            mag=D.Uniform(loc=21.0, scale=1.0),
        ),
    ]
    return MultiComponentModel(components=comps)


def test_log_posterior_obs_matches_baked():
    """The traced-obs posterior == the baked-constant posterior on the
    template's own observation."""
    model = _model(np.random.RandomState(0))
    spec = model.spec
    fns = model.posterior_fns
    with np.errstate(divide="ignore"):
        ivm = np.where(
            np.isfinite(spec.obs_var) & (spec.obs_var > 0),
            1.0 / spec.obs_var,
            0.0,
        )
    obs = prepare_obs_stack(
        spec, np.asarray(spec.obs_data)[None], ivm[None]
    )
    one = {k: jnp.asarray(v[0]) for k, v in obs.items()}
    thetas = model.init_params_from_priors(
        8, random_state=np.random.RandomState(1)
    )
    for th in thetas:
        want = float(fns.log_posterior(jnp.asarray(th)))
        got = float(fns.log_posterior_obs(jnp.asarray(th), one))
        assert np.isclose(want, got, rtol=1e-6, atol=1e-5), (want, got)


def test_prepare_obs_stack_masks():
    model = _model(np.random.RandomState(2))
    spec = model.spec
    k, (h, w) = 2, spec.shape
    obs = np.ones((k, h, w))
    ivm = np.ones((k, h, w))
    obs[0, 3, 4] = np.nan  # bad data pixel
    ivm[1, 5, 6] = 0.0  # zero-weight pixel
    stack = prepare_obs_stack(spec, obs, ivm)
    assert not stack["good_px"][0, 3, 4]
    assert not stack["good_px"][1, 5, 6]
    assert stack["good_px"][0, 5, 6] and stack["good_px"][1, 3, 4]
    assert np.isinf(stack["obs_var"][0, 3, 4])
    assert stack["obs_data"][0, 3, 4] == 0.0  # sanitized, not NaN

    with pytest.raises(ValueError):
        prepare_obs_stack(spec, obs[:, :10], ivm[:, :10])
    with pytest.raises(ValueError):
        prepare_obs_stack(spec, obs, ivm[:1])


def test_simulate_stack_shapes_and_determinism():
    model = _model(np.random.RandomState(3))
    obs1, ivm1, th1 = simulate_stack(model, 4, seed=5)
    obs2, ivm2, th2 = simulate_stack(model, 4, seed=5)
    assert obs1.shape == ivm1.shape == (4,) + tuple(model.spec.shape)
    assert th1.shape == (4, model.spec.num_params)
    assert np.array_equal(obs1, obs2) and np.array_equal(th1, th2)
    # noiseless stack is exactly the batched convolved-model render
    clean, _, _ = simulate_stack(model, 4, seed=5, thetas=th1,
                                 add_noise=False)
    render = model.render_images_batch(th1)["convolved_model"]
    assert np.allclose(clean, render)


def test_fit_batch_recovers_injections():
    model = _model(np.random.RandomState(4))
    # inject K point sources at distinct magnitudes/positions
    dim = model.spec.num_params
    names = model.spec.param_names
    thetas = model.init_params_from_priors(
        3, random_state=np.random.RandomState(6)
    )
    obs, ivm, injected = simulate_stack(model, 3, seed=7, thetas=thetas)

    res = fit_batch(model, obs, ivm, burn=300, iterations=300, seed=8)
    assert res.num_targets == 3
    assert res.mean.shape == res.std.shape == (3, dim)
    assert np.all(np.isfinite(res.map_lnp))
    assert np.all((res.acceptance > 0.05) & (res.acceptance < 0.95)), (
        res.acceptance
    )
    pulls = res.pulls(injected)
    # calibrated recovery: pulls ~ N(0,1); 6 is a generous MCMC bound
    assert np.all(np.abs(pulls) < 6.0), (names, pulls, res.std)
    mag_cols = [i for i, n in enumerate(names) if n.endswith("_mag")]
    assert np.all(res.std[:, mag_cols] < 0.5)
    # MAP beats the posterior mean position in lnp for each target
    for k in range(3):
        lnp_mean = float(
            model.posterior_fns.log_posterior_obs(
                jnp.asarray(res.mean[k]),
                {
                    key: jnp.asarray(v[k])
                    for key, v in prepare_obs_stack(
                        model.spec, obs, ivm
                    ).items()
                },
            )
        )
        # 0.05 tolerance: map_lnp comes from the f32 in-scan path while
        # this re-evaluation runs under x64 (few-1e-3 lnpost mismatch)
        assert res.map_lnp[k] >= lnp_mean - 0.05


def test_fit_batch_record_chains(tmp_path):
    model = _model(np.random.RandomState(9))
    obs, ivm, injected = simulate_stack(model, 2, seed=10)
    res = fit_batch(
        model, obs, ivm, burn=40, iterations=60, record_every=20, seed=11
    )
    nw = 2 * model.spec.num_params + 2
    assert res.chains.shape == (2, 3, nw, model.spec.num_params)
    assert res.lnprob.shape == (2, 3, nw)
    # the recorded chain's best sample can't beat the tracked MAP
    assert np.all(
        res.lnprob.max(axis=(1, 2)) <= res.map_lnp + 1e-3
    )
    rhat = res.psrf()
    assert rhat.shape == (2, model.spec.num_params)
    # only 3 recorded samples/walker here: the PSRF offset term makes
    # sub-1 values legitimate; assert sanity, not convergence
    assert np.all(np.isfinite(rhat)) and np.all((rhat > 0.3) & (rhat < 5))
    with pytest.raises(ValueError):
        fit_batch(model, obs, ivm, burn=10, iterations=50, record_every=20)

    # FITS catalog roundtrip
    from psfmc_tpu.batchfit import load_batch_results, save_batch_results

    path = str(tmp_path / "batch_catalog.fits")
    save_batch_results(res, path, injected=injected)
    tbl = load_batch_results(path)
    assert len(tbl) == 2
    names = model.spec.param_names
    assert np.allclose(tbl[f"{names[0]}_mean"], res.mean[:, 0])
    assert np.allclose(tbl["lnp_map"], res.map_lnp)
    # xy is a 2-wide vector column
    xy_cols = [n for n in names if n.endswith("_xy")]
    assert tbl[f"{xy_cols[0]}_mean"].shape == (2, 2)
    pull_col = tbl[f"{names[0]}_pull"]
    assert np.allclose(pull_col, res.pulls(injected)[:, 0])


def test_fit_batch_chunked():
    """chunk= splits targets over repeated calls of ONE program shape."""
    model = _model(np.random.RandomState(18))
    obs, ivm, injected = simulate_stack(model, 5, seed=19)
    res = fit_batch(
        model, obs, ivm, burn=100, iterations=100, seed=20, chunk=2,
        record_every=50,
    )
    assert res.num_targets == 5
    assert np.all(np.isfinite(res.mean))
    assert res.chains.shape[0] == 5
    # only ONE program compiled for all three chunks (cache keyed on
    # the padded chunk shape)
    keys = [
        k for k in model.posterior_fns.programs if k[0] == "batchfit"
    ]
    assert len({k[1] for k in keys if k[4] == 100}) == 1
    # mechanics only: recovery calibration is asserted (at a longer,
    # converged schedule) in test_fit_batch_recovers_injections
    assert np.all(res.std > 0)

    if jax.device_count() >= 8:
        from psfmc_tpu.parallel.mesh import walker_mesh

        resm = fit_batch(
            model, obs[:3], ivm[:3], burn=30, iterations=30, seed=20,
            chunk=2, mesh=walker_mesh(),  # chunk rounds up to 8
        )
        assert resm.num_targets == 3
        assert np.all(np.isfinite(resm.mean))


def test_fit_batch_multipsf():
    """Batched fits with a discrete PSF index (2-PSF stack).

    Covers draw_batch on the PSFSelector's DiscreteUniform and the
    PSF-stack gather under the traced-obs posterior.
    """
    rng = np.random.RandomState(21)
    h = w = 24
    yy, xx = np.mgrid[0:16, 0:16].astype(float)
    narrow = np.exp(-((xx - 8) ** 2 + (yy - 8) ** 2) / (2 * 1.0**2))
    narrow /= narrow.sum()
    wide = np.exp(-((xx - 8) ** 2 + (yy - 8) ** 2) / (2 * 3.0**2))
    wide /= wide.sum()
    model = MultiComponentModel([
        Configuration(
            obs_file=0.05 + rng.randn(h, w) * 0.05,
            obsivm_file=np.full((h, w), 400.0),
            psf_files=[narrow, wide],
            psfivm_files=[np.ones_like(narrow) * 1e8] * 2,
            mag_zeropoint=25.0,
        ),
        Sky(adu=D.Normal(loc=0.05, scale=0.05)),
        PointSource(
            xy=D.Uniform(loc=np.array([9.0, 9.0]),
                         scale=np.array([6.0, 6.0])),
            mag=D.Uniform(loc=21.0, scale=1.0),
        ),
    ])
    assert model.spec.param_names[-1] == "PSF_Index"
    # batch prior draws land on the discrete support {0, 1}
    p0 = model.init_params_from_priors(
        64, random_state=np.random.RandomState(22)
    )
    idx = p0[:, -1]
    assert set(np.unique(idx)) <= {0.0, 1.0}
    assert len(np.unique(idx)) == 2  # both PSFs actually drawn

    obs, ivm, _ = simulate_stack(model, 2, seed=23)
    res = fit_batch(model, obs, ivm, burn=60, iterations=60, seed=24)
    assert np.all(np.isfinite(res.mean))
    assert np.all(np.isfinite(res.map_lnp))


def test_completeness_fraction():
    """Synthetic completeness curve: bright recovered, faint lost."""
    from psfmc_tpu.batchfit import BatchFitResult, completeness_fraction

    rng = np.random.RandomState(30)
    k = 200
    names = ["0_Sky_adu", "1_PointSource_mag", "1_PointSource_xy"]
    lens = [1, 1, 2]
    injected = np.zeros((k, 4))
    mags = rng.uniform(20.0, 24.0, k)
    injected[:, 1] = mags
    # bright (<22): tight, unbiased; faint: std blown to the prior
    # width and the mean biased off truth
    std = np.where(mags < 22.0, 0.05, 3.0)
    mean = injected.copy()
    mean[:, 1] = np.where(
        mags < 22.0, mags + 0.02 * rng.randn(k), mags + 5.0
    )
    res = BatchFitResult(
        param_names=names,
        mean=mean,
        std=np.broadcast_to(std[:, None], (k, 4)).copy(),
        map_theta=mean.copy(),
        map_lnp=np.zeros(k),
        acceptance=np.full(k, 0.3),
        param_lens=lens,
    )
    centers, frac, counts = completeness_fraction(
        res, injected, "1_PointSource_mag", bins=np.array([20, 22, 24.0])
    )
    assert counts.sum() == k
    assert frac[0] > 0.95  # bright bin fully recovered
    assert frac[1] < 0.15  # faint bin lost (blown std + 5-mag bias)
    assert np.allclose(centers, [21.0, 23.0])

    # custom predicate wins
    _c, f2, _n = completeness_fraction(
        res, injected, "1_PointSource_mag", bins=2,
        recovered=lambda r, inj: np.ones(k, bool),
    )
    assert np.all(f2[~np.isnan(f2)] == 1.0)

    with pytest.raises(ValueError):
        completeness_fraction(res, injected, "1_PointSource_xy")
    with pytest.raises(ValueError):
        completeness_fraction(res, injected, "nope")


def test_fit_batch_joint_model():
    """Multi-band completeness sims: K joint fits in one program."""
    from psfmc_tpu.models import JointModel, Sersic, Tied

    rng = np.random.RandomState(40)

    def cfg(h, w, noise, sig):
        yy, xx = np.mgrid[0:h, 0:w].astype(float)
        psf = np.exp(
            -((xx - w // 2) ** 2 + (yy - h // 2) ** 2) / (2 * sig**2)
        )
        psf /= psf.sum()
        return Configuration(
            obs_file=0.05 + rng.randn(h, w) * noise,
            obsivm_file=np.full((h, w), 1.0 / noise**2),
            psf_files=psf,
            psfivm_files=np.full((h, w), 1e8),
            mag_zeropoint=25.0,
        )

    ps_a = PointSource(
        xy=D.Uniform(loc=np.array([9.0, 9.0]), scale=np.array([6.0, 6.0])),
        mag=D.Uniform(loc=21.0, scale=1.0),
    )
    ps_b = PointSource(xy=Tied(ps_a, "xy"),
                       mag=D.Uniform(loc=21.5, scale=1.0))
    joint = JointModel([
        [cfg(24, 24, 0.05, 1.2),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_a],
        [cfg(16, 16, 0.08, 2.0),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_b],
    ])
    obs_list, ivm_list, injected = simulate_stack(joint, 3, seed=41)
    assert len(obs_list) == 2
    assert obs_list[0].shape == (3, 24, 24)
    assert obs_list[1].shape == (3, 16, 16)

    # mixed moves + generous burn: joint razor posteriors mix slowly
    # once the minimal-size ensemble contracts (CLAUDE.md joint gotcha;
    # a 300-step stretch-only burn left ~1 in 4 targets at 19 sigma)
    res = fit_batch(joint, obs_list, ivm_list, burn=600, iterations=300,
                    seed=42, moves="mixed")
    assert res.num_targets == 3
    assert res.mean.shape == (3, joint.num_params)
    assert np.all(np.isfinite(res.map_lnp))
    pulls = res.pulls(injected)
    assert np.all(np.abs(pulls) < 6.0), (joint.param_names, pulls)

    # band-count mismatch is rejected
    with pytest.raises(ValueError, match="per band"):
        fit_batch(joint, obs_list[:1], ivm_list, burn=5, iterations=5)

    # exactness anchor: the traced-obs joint lnpost at the template
    # observation equals the baked joint lnpost
    from psfmc_tpu.batchfit import _lnpost_obs_for

    lnpost_obs = _lnpost_obs_for(joint.posterior_fns)
    obs_flat = {}
    for i, bs in enumerate(joint.spec.band_specs):
        with np.errstate(divide="ignore"):
            ivm = np.where(
                np.isfinite(bs.obs_var) & (bs.obs_var > 0),
                1.0 / bs.obs_var, 0.0,
            )
        d = prepare_obs_stack(bs, np.asarray(bs.obs_data)[None],
                              ivm[None])
        for key, v in d.items():
            obs_flat[f"b{i}_{key}"] = jnp.asarray(v[0])
    th = joint.init_params_from_priors(
        4, random_state=np.random.RandomState(43)
    )
    for t in th:
        want = float(joint.posterior_fns.log_posterior(jnp.asarray(t)))
        got = float(lnpost_obs(jnp.asarray(t), obs_flat))
        assert np.isclose(want, got, rtol=1e-6, atol=1e-4), (want, got)


def test_fit_batch_psrf_requires_chains():
    model = _model(np.random.RandomState(15))
    obs, ivm, _ = simulate_stack(model, 1, seed=16)
    res = fit_batch(model, obs, ivm, burn=10, iterations=10, seed=17)
    with pytest.raises(ValueError):
        res.psrf()


def test_fit_batch_mesh_parity_and_padding():
    """Sharding the target axis changes nothing; K pads to the mesh."""
    from psfmc_tpu.parallel.mesh import walker_mesh

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    model = _model(np.random.RandomState(12))
    obs, ivm, _ = simulate_stack(model, 8, seed=13)

    plain = fit_batch(model, obs, ivm, burn=60, iterations=60, seed=14)
    mesh = walker_mesh()
    sharded = fit_batch(
        model, obs, ivm, burn=60, iterations=60, seed=14, mesh=mesh
    )
    assert np.allclose(plain.mean, sharded.mean, rtol=1e-5, atol=1e-6)
    assert np.allclose(plain.std, sharded.std, rtol=1e-4, atol=1e-6)
    assert np.array_equal(plain.acceptance, sharded.acceptance)

    # K=3 on an 8-device mesh: padded internally, trimmed on return
    res3 = fit_batch(
        model, obs[:3], ivm[:3], burn=30, iterations=30, seed=15,
        mesh=mesh,
    )
    assert res3.num_targets == 3
    assert np.all(np.isfinite(res3.mean))
