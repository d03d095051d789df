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


def _psf(sigma, n=16):
    yy, xx = np.mgrid[0:n, 0:n].astype(float)
    p = np.exp(-((xx - n / 2) ** 2 + (yy - n / 2) ** 2) / (2 * sigma**2))
    return p / p.sum()


def test_prepare_psf_stack_matches_baked():
    """Survey-mode spectra go through EXACTLY the template PSF's
    preprocessing: target-0 (the template's own PSF) reproduces the
    baked stacks bitwise; a different PSF reproduces a fresh model
    built around it (log_posterior_obs == that model's baked
    log_posterior)."""
    from psfmc_tpu.batchfit import prepare_psf_stack

    rng = np.random.RandomState(30)
    h = w = 24
    narrow, wide = _psf(1.0), _psf(2.5)
    pivm = np.ones_like(narrow) * 1e8
    obs_img = 0.05 + rng.randn(h, w) * 0.05
    ivm_img = np.full((h, w), 400.0)

    def build(psf):
        return MultiComponentModel([
            Configuration(
                obs_file=obs_img, obsivm_file=ivm_img, psf_files=psf,
                psfivm_files=pivm, mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.05, scale=0.05)),
            PointSource(
                xy=D.Uniform(loc=np.array([9.0, 9.0]),
                             scale=np.array([6.0, 6.0])),
                mag=D.Uniform(loc=21.0, scale=1.0),
            ),
        ])

    tmpl = build(narrow)
    spec = tmpl.spec
    stk = prepare_psf_stack(spec, [narrow, wide], [pivm, pivm])
    # real/imag planes (complex h2d is UNIMPLEMENTED on axon)
    assert stk["psf_f_re"].shape == (2, 1) + spec.f_psf_stack.shape[1:]
    psf_f0 = stk["psf_f_re"][0] + 1j * stk["psf_f_im"][0]
    var_f0 = stk["var_f_re"][0] + 1j * stk["var_f_im"][0]
    # target 0 == the baked template spectra
    assert np.array_equal(
        psf_f0, np.asarray(spec.f_psf_stack, psf_f0.dtype)
    )
    assert np.array_equal(
        var_f0, np.asarray(spec.f_var_stack, var_f0.dtype)
    )

    # target 1 == a fresh model baked around the wide PSF
    other = build(wide)
    obs = prepare_obs_stack(spec, obs_img[None].repeat(2, 0),
                            ivm_img[None].repeat(2, 0))
    obs.update(stk)
    thetas = tmpl.init_params_from_priors(
        6, random_state=np.random.RandomState(31)
    )
    for th in thetas:
        one = {k: jnp.asarray(v[1]) for k, v in obs.items()}
        got = float(
            tmpl.posterior_fns.log_posterior_obs(jnp.asarray(th), one)
        )
        want = float(other.posterior_fns.log_posterior(jnp.asarray(th)))
        assert np.isclose(got, want, rtol=1e-5, atol=1e-4), (got, want)
        # and the likelihood-only twin honors the override too
        got_l = float(
            tmpl.posterior_fns.log_likelihood_obs(jnp.asarray(th), one)
        )
        want_l = float(
            other.posterior_fns.log_likelihood(jnp.asarray(th))
        )
        assert np.isclose(got_l, want_l, rtol=1e-5, atol=1e-4)


def test_fit_batch_per_target_psf():
    """Survey-mode e2e: targets observed under DIFFERENT PSFs fit in
    one batched program; each target's posterior matches a serial fit
    with that PSF baked in (pull < 1 between the two posteriors)."""
    rng = np.random.RandomState(32)
    h = w = 24
    psfs = [_psf(1.0), _psf(2.0), _psf(3.0)]
    pivm = np.ones((16, 16)) * 1e8
    noise = 0.05
    ivm_img = np.full((h, w), 1.0 / noise**2)

    def build(psf, obs_img):
        return MultiComponentModel([
            Configuration(
                obs_file=obs_img, obsivm_file=ivm_img, psf_files=psf,
                psfivm_files=pivm, mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.05, scale=0.05)),
            PointSource(
                xy=D.Uniform(loc=np.array([9.0, 9.0]),
                             scale=np.array([6.0, 6.0])),
                mag=D.Uniform(loc=21.0, scale=1.0),
            ),
        ])

    # simulate each target THROUGH a model with its own PSF baked
    tmpl0 = build(psfs[0], 0.05 + rng.randn(h, w) * noise)
    thetas = tmpl0.init_params_from_priors(
        3, random_state=np.random.RandomState(33)
    )
    obs_list = []
    for k in range(3):
        m = build(psfs[k], np.zeros((h, w)))
        mock, _ = m.simulate(theta=thetas[k], random_state=100 + k)
        obs_list.append(mock)
    obs = np.stack(obs_list)
    ivm = np.broadcast_to(ivm_img, obs.shape).copy()

    res = fit_batch(
        tmpl0, obs, ivm, burn=250, iterations=250, seed=34,
        psf_stack=list(psfs), psfivm_stack=[pivm] * 3,
    )
    pulls = res.pulls(thetas)
    assert np.all(np.abs(pulls) < 6.0), pulls
    # target 2 (sigma=3 PSF) against a serial baked fit of the same data
    m2 = build(psfs[2], obs[2])
    res2 = fit_batch(m2, obs[2:3], ivm[2:3], burn=250, iterations=250,
                     seed=35)
    comb = np.sqrt(res.std[2] ** 2 + res2.std[0] ** 2)
    assert np.all(np.abs(res.mean[2] - res2.mean[0]) < 4.0 * comb), (
        res.mean[2], res2.mean[0], comb
    )
    # the WRONG shared-template-PSF fit misses the wide-PSF target's
    # magnitude: survey mode is load-bearing, not decorative
    wrong = fit_batch(tmpl0, obs, ivm, burn=250, iterations=250, seed=34)
    mag = res.param_names.index("1_PointSource_mag")
    lens = res.param_lens
    col = int(np.concatenate([[0], np.cumsum(lens)])[mag])
    assert abs(wrong.mean[2, col] - thetas[2][col]) > 3.0 * wrong.std[
        2, col
    ]


def test_per_target_psf_validation():
    from psfmc_tpu.batchfit import prepare_psf_stack

    model = _model(np.random.RandomState(36))
    obs, ivm, _ = simulate_stack(model, 2, seed=37)
    p = _psf(1.5)
    pivm = np.ones_like(p) * 1e8
    with pytest.raises(ValueError, match="together"):
        fit_batch(model, obs, ivm, burn=5, iterations=5,
                  psf_stack=[p, p])
    with pytest.raises(ValueError, match="target count"):
        fit_batch(model, obs, ivm, burn=5, iterations=5,
                  psf_stack=[p], psfivm_stack=[pivm])
    with pytest.raises(ValueError, match="disagree"):
        prepare_psf_stack(model.spec, [p, p], [pivm])
    with pytest.raises(ValueError, match="PSF"):
        # template has 1 PSF; passing 2 per target must fail
        prepare_psf_stack(model.spec, [[p, p]], [[pivm, pivm]])


def test_per_target_psf_validation_joint():
    """The joint branch validates per-band PSF stacks like the
    single-band branch: per-target count mismatch and a missing
    psfivm entry raise clear errors (not vmap shape errors)."""
    from psfmc_tpu.models import JointModel

    rng = np.random.RandomState(60)
    p = _psf(1.5)
    pivm = np.ones_like(p) * 1e8

    def band(noise):
        return [
            Configuration(
                obs_file=0.05 + rng.randn(24, 24) * noise,
                obsivm_file=np.full((24, 24), 1.0 / noise**2),
                psf_files=p,
                psfivm_files=pivm,
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.05, scale=0.05)),
            PointSource(
                xy=D.Uniform(loc=np.array([9.0, 9.0]),
                             scale=np.array([6.0, 6.0])),
                mag=D.Uniform(loc=21.0, scale=1.0),
            ),
        ]

    joint = JointModel([band(0.05), band(0.08)])
    obs_list, ivm_list, _ = simulate_stack(joint, 2, seed=61)

    # band 0: 3 PSFs for 2 targets -> explicit count error
    with pytest.raises(ValueError, match="target count"):
        fit_batch(joint, obs_list, ivm_list, burn=5, iterations=5,
                  psf_stack=[[p, p, p], None],
                  psfivm_stack=[[pivm, pivm, pivm], None])
    # band 0: PSFs given but no matching psfivm entry
    with pytest.raises(ValueError, match="psfivm_stack"):
        fit_batch(joint, obs_list, ivm_list, burn=5, iterations=5,
                  psf_stack=[[p, p], None],
                  psfivm_stack=[None, None])


def test_fit_batch_per_target_psf_joint_chunked():
    """Survey mode through the joint-band + chunked plumbing: per-band
    per-target PSF spectra ride the b{i}_ keys, and chunk padding
    repeats complex spectra rows cleanly.  Exactness anchor: the
    traced joint lnpost with target-k PSFs == a fresh joint model
    baked around them."""
    from psfmc_tpu.batchfit import _lnpost_obs_for, prepare_psf_stack
    from psfmc_tpu.models import JointModel, Tied

    rng = np.random.RandomState(50)
    obs_a = 0.05 + rng.randn(24, 24) * 0.05
    obs_b = 0.05 + rng.randn(16, 16) * 0.08

    def cfg(obs_img, noise, psf):
        return Configuration(
            obs_file=obs_img,
            obsivm_file=np.full(obs_img.shape, 1.0 / noise**2),
            psf_files=psf,
            psfivm_files=np.full(psf.shape, 1e8),
            mag_zeropoint=25.0,
        )

    def build(psf_a, psf_b):
        ps_a = PointSource(
            xy=D.Uniform(loc=np.array([9.0, 9.0]),
                         scale=np.array([6.0, 6.0])),
            mag=D.Uniform(loc=21.0, scale=1.0),
        )
        ps_b = PointSource(xy=Tied(ps_a, "xy"),
                           mag=D.Uniform(loc=21.5, scale=1.0))
        return JointModel([
            [cfg(obs_a, 0.05, psf_a),
             Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_a],
            [cfg(obs_b, 0.08, psf_b),
             Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_b],
        ])

    psfs_a = [_psf(1.2), _psf(2.2)]          # band-0 per-target PSFs
    psfs_b = [_psf(1.8, 12), _psf(2.8, 12)]  # band-1 per-target PSFs
    joint = build(psfs_a[0], psfs_b[0])

    # exactness: target-1 spectra == joint model baked around them
    obs_flat = {}
    for i, bs in enumerate(joint.spec.band_specs):
        with np.errstate(divide="ignore"):
            ivm = np.where(
                np.isfinite(bs.obs_var) & (bs.obs_var > 0),
                1.0 / bs.obs_var, 0.0,
            )
        d = prepare_obs_stack(bs, np.asarray(bs.obs_data)[None], ivm[None])
        band_psfs = [psfs_a, psfs_b][i]
        d.update(prepare_psf_stack(
            bs, [band_psfs[1]], [np.full(band_psfs[1].shape, 1e8)]
        ))
        for key, v in d.items():
            obs_flat[f"b{i}_{key}"] = jnp.asarray(v[0])
    other = build(psfs_a[1], psfs_b[1])
    lnpost_obs = _lnpost_obs_for(joint.posterior_fns)
    for t in joint.init_params_from_priors(
        4, random_state=np.random.RandomState(51)
    ):
        got = float(lnpost_obs(jnp.asarray(t), obs_flat))
        want = float(other.posterior_fns.log_posterior(jnp.asarray(t)))
        assert np.isclose(got, want, rtol=1e-5, atol=1e-4), (got, want)

    # mechanics: K=3 with chunk=2 (pads the complex rows), one PSF pair
    # per target per band
    obs_list, ivm_list, _ = simulate_stack(joint, 3, seed=52)
    res = fit_batch(
        joint, obs_list, ivm_list, burn=40, iterations=40, seed=53,
        chunk=2,
        psf_stack=[[psfs_a[0], psfs_a[1], psfs_a[0]],
                   [psfs_b[0], psfs_b[1], psfs_b[0]]],
        psfivm_stack=[[np.full(p.shape, 1e8) for p in
                       (psfs_a[0], psfs_a[1], psfs_a[0])],
                      [np.full(p.shape, 1e8) for p in
                       (psfs_b[0], psfs_b[1], psfs_b[0])]],
    )
    assert res.num_targets == 3
    assert np.all(np.isfinite(res.mean))
    with pytest.raises(ValueError, match="per band"):
        fit_batch(joint, obs_list, ivm_list, burn=5, iterations=5,
                  psf_stack=[psfs_a], psfivm_stack=[[np.ones((16, 16))]])

    # a None band entry keeps that band's template PSF
    res_mixed = fit_batch(
        joint, obs_list, ivm_list, burn=10, iterations=10, seed=54,
        psf_stack=[[psfs_a[0], psfs_a[1], psfs_a[0]], None],
        psfivm_stack=[[np.full(p.shape, 1e8) for p in
                       (psfs_a[0], psfs_a[1], psfs_a[0])], None],
    )
    assert res_mixed.num_targets == 3
    assert np.all(np.isfinite(res_mixed.mean))


def test_poisson_batch_rejects_negative_counts():
    """The traced-obs path enforces the same non-negative-counts rule
    the baked path checks at model build."""
    from psfmc_tpu.batchfit import prepare_obs_stack

    psf = _psf(1.5)
    cfg = Configuration(
        obs_file=np.abs(np.random.RandomState(0).rand(24, 24)) * 5,
        obsivm_file=np.ones((24, 24)),
        psf_files=psf,
        psfivm_files=np.ones_like(psf) * 1e8,
        mag_zeropoint=25.0,
        likelihood="poisson",
    )
    model = MultiComponentModel([
        cfg,
        Sky(adu=D.Uniform(loc=1.0, scale=4.0)),
    ])
    obs = np.abs(np.random.RandomState(1).rand(2, 24, 24)) * 5
    obs[1, 3, 4] = -0.5
    with pytest.raises(ValueError, match="non-negative"):
        prepare_obs_stack(model.spec, obs, np.ones_like(obs))
    # masking the offending pixel (ivm 0) makes it acceptable
    ivm = np.ones_like(obs)
    ivm[1, 3, 4] = 0.0
    d = prepare_obs_stack(model.spec, obs, ivm)
    assert not d["good_px"][1, 3, 4]
