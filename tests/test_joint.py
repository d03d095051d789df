"""Joint multi-band fitting: one posterior over several observations.

Beyond the reference (one band at a time): per-band observations/PSFs/
magnitudes with structural parameters shared across bands via Tied.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models import (
    Configuration,
    JointModel,
    PointSource,
    Sersic,
    Sky,
    Tied,
)
from psfmc_tpu.models.multicomponent import MultiComponentModel
from psfmc_tpu.sampler import EnsembleSampler


def _config(rng, h=24, w=24, noise=0.05, psf_sigma=1.2):
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(
        -((xx - w // 2) ** 2 + (yy - h // 2) ** 2) / (2 * psf_sigma**2)
    )
    psf /= psf.sum()
    return Configuration(
        obs_file=0.05 + rng.randn(h, w) * noise,
        obsivm_file=np.full((h, w), 1.0 / noise**2),
        psf_files=psf,
        psfivm_files=np.full((h, w), 1e8),
        mag_zeropoint=25.0,
    )


def _host(mag=20.5):
    return Sersic(
        xy=D.Uniform(loc=np.array([8.0, 8.0]), scale=np.array([8.0, 8.0])),
        mag=D.Uniform(loc=mag - 1.0, scale=2.0),
        reff=D.Uniform(loc=1.0, scale=4.0),
        reff_b=D.Uniform(loc=1.0, scale=4.0),
        index=1.0,
        angle=0.0,
    )


def _tied_host(donor, mag=21.5):
    return Sersic(
        xy=Tied(donor, "xy"),
        mag=D.Uniform(loc=mag - 1.0, scale=2.0),
        reff=Tied(donor, "reff"),
        reff_b=Tied(donor, "reff_b"),
        index=Tied(donor, "index"),
        angle=Tied(donor, "angle"),
    )


def test_single_band_joint_matches_plain_posterior():
    """JointModel with ONE band == the single-observation posterior."""
    rng = np.random.RandomState(0)
    comps = [_config(rng), Sky(adu=D.Normal(loc=0.05, scale=0.05)),
             _host()]
    joint = JointModel([comps])
    plain = MultiComponentModel(comps)
    assert joint.param_names == plain.param_names
    assert joint.param_lens == plain.param_lens
    thetas = plain.init_params_from_priors(
        6, random_state=np.random.RandomState(1)
    )
    for th in thetas:
        a = float(joint.posterior_fns.log_posterior(jnp.asarray(th)))
        b = float(plain.posterior_fns.log_posterior(jnp.asarray(th)))
        assert np.isclose(a, b, rtol=1e-6, atol=1e-5), (a, b)


def test_joint_lnpost_is_prior_plus_band_likelihoods():
    rng = np.random.RandomState(2)
    host_a = _host()
    bands = [
        [_config(rng), Sky(adu=D.Normal(loc=0.05, scale=0.05)), host_a],
        [_config(rng, noise=0.08, psf_sigma=2.0),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)),
         _tied_host(host_a)],
    ]
    joint = JointModel(bands)
    fns = joint.posterior_fns
    # per-band mags + shared structure: sky_a(1) + host_a mag+reff+
    # reff_b+xy (5 values; index+angle are constants) + sky_b(1) +
    # band-b mag(1); const psf selectors contribute none
    assert joint.num_params == 1 + 5 + 1 + 1
    th = jnp.asarray(
        joint.init_params_from_priors(
            1, random_state=np.random.RandomState(3)
        )[0]
    )
    want = float(fns.log_prior(th)) + sum(
        float(f.log_likelihood(th)) for f in fns.band_fns
    )
    got = float(fns.log_posterior(th))
    assert np.isclose(got, want, rtol=1e-6, atol=1e-4), (got, want)

    # prior violation (axis order) -> exactly -inf
    names = joint.param_names
    bad = np.asarray(th, np.float64).copy()
    i_reff = names.index("1_Sersic_reff")
    i_reffb = names.index("1_Sersic_reff_b")
    off = np.cumsum([0] + joint.param_lens)
    bad[off[i_reff]] = 1.0
    bad[off[i_reffb]] = 3.0
    assert float(fns.log_posterior(jnp.asarray(bad))) == -np.inf


def test_joint_fit_recovers_shared_structure_and_band_mags():
    """Two bands (different PSFs/noise/shapes), shared source structure,
    per-band point-source magnitudes: the joint fit recovers both."""
    rng = np.random.RandomState(4)
    # bright point source per band at a SHARED position
    ps_a = PointSource(
        xy=D.Uniform(loc=np.array([9.0, 9.0]), scale=np.array([6.0, 6.0])),
        mag=D.Uniform(loc=20.5, scale=1.5),
    )
    ps_b = PointSource(xy=Tied(ps_a, "xy"),
                       mag=D.Uniform(loc=21.0, scale=1.5))
    cfg_a = _config(rng, noise=0.05, psf_sigma=1.2)
    cfg_b = _config(rng, h=16, w=16, noise=0.08, psf_sigma=2.0)
    bands = [
        [cfg_a, Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_a],
        [cfg_b, Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_b],
    ]
    joint = JointModel(bands)
    fns = joint.posterior_fns
    names = joint.param_names
    off = dict(zip(names, np.cumsum([0] + joint.param_lens)))

    # inject a mock through each band's own renderer at one truth
    truth = joint.init_params_from_priors(
        1, random_state=np.random.RandomState(5)
    )[0]
    truth[off["1_PointSource_xy"]:off["1_PointSource_xy"] + 2] = [11.3, 9.6]
    truth[off["1_PointSource_mag"]] = 21.0
    truth[off["4_PointSource_mag"]] = 21.7
    rng2 = np.random.RandomState(6)
    for bs, f in zip(joint.spec.band_specs, fns.band_fns):
        conv = np.asarray(
            f._images_impl(jnp.asarray(truth, jnp.float32))["conv"]
        )
        sigma = np.sqrt(np.asarray(bs.obs_var))
        mock = conv + rng2.randn(*conv.shape) * np.where(
            np.isfinite(sigma), sigma, 0.0
        )
        # write the mock into the band's baked constants (numpy, host)
        f.constants["obs_data"] = mock.astype(np.float32)

    nw = 2 * joint.num_params + 2
    # mixed moves + a generous burn: the razor joint posterior mixes
    # slowly once the minimal-size ensemble contracts (measured: one
    # PRNG stream converged by step 600, another needed ~1200)
    s = EnsembleSampler(nw, joint.num_params, fns, seed=7, moves="mixed")
    s.init_state(joint.init_params_from_priors(
        nw, random_state=np.random.RandomState(8)
    ))
    s.run_burn(900)
    s.reset()
    s.run_sampling(300)
    flat = s.flatchain

    # assert on the chain's BEST sample, not the mean: the bright joint
    # source has a razor posterior (sigma ~ 0.01 px / 0.03 mag) whose
    # chain MEAN needs thousands of steps to center (the known
    # chain-length effect; the posterior itself is verified sharply
    # peaked at truth — lnpost(truth) beats any 0.3-mag offset by ~38
    # units).  The best sample reaches the mode quickly.
    ib = np.unravel_index(np.argmax(s.lnprobability),
                          s.lnprobability.shape)
    best = s.chain[ib[0], ib[1]]
    for name, want, tol in (
        ("1_PointSource_xy", truth[off["1_PointSource_xy"]], 0.2),
        ("1_PointSource_mag", 21.0, 0.1),
        ("4_PointSource_mag", 21.7, 0.1),
    ):
        got = best[off[name]]
        assert abs(got - want) < tol, (name, got, want)
    del flat

    # per-band carry images accumulated at each band's own shape
    acc = s.accumulated_images
    assert acc["b0_raw"].shape == (24, 24)
    assert acc["b1_raw"].shape == (16, 16)
    assert all(np.all(np.isfinite(v)) for v in acc.values())


def test_joint_nuts_runs():
    """Gradient NUTS over the joint posterior (transforms built from
    the JointSpec's global slots + all bands' comp_specs)."""
    from psfmc_tpu.sampler.nuts import NUTSSampler

    rng = np.random.RandomState(14)
    host_a = _host()
    bands = [
        [_config(rng), Sky(adu=D.Normal(loc=0.05, scale=0.05)), host_a],
        # mixed band shapes: NUTS accumulators must size per key
        [_config(rng, h=20, w=20, noise=0.08),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)),
         _tied_host(host_a)],
    ]
    joint = JointModel(bands)
    nuts = NUTSSampler(
        nwalkers=4,
        dim=joint.num_params,
        posterior_fns=joint.posterior_fns,
        seed=15,
        max_depth=4,
    )
    nuts.init_state(joint.init_params_from_priors(
        32, random_state=np.random.RandomState(16)
    ))
    nuts.run_burn(5)
    nuts.reset()
    nuts.run_sampling(5)
    assert nuts.chain.shape == (4, 5, joint.num_params)
    assert np.all(np.isfinite(nuts.lnprobability))
    # the axis-order constraint holds on every draw (dependent bound in
    # the transform, keyed off the GLOBAL tied slots)
    names = joint.param_names
    off = dict(zip(names, np.cumsum([0] + joint.param_lens)))
    flat = nuts.chain.reshape(-1, joint.num_params)
    assert np.all(
        flat[:, off["1_Sersic_reff_b"]] <= flat[:, off["1_Sersic_reff"]]
    )


def test_joint_parallel_tempering_and_evidence():
    """PT (and its evidence accumulators) run on the joint posterior:
    split_like_prior recovers the summed band likelihood from
    lnpost - lnprior."""
    import warnings

    from psfmc_tpu.sampler.tempered import PTEnsembleSampler

    rng = np.random.RandomState(22)
    host_a = _host()
    joint = JointModel([
        [_config(rng), Sky(adu=D.Normal(loc=0.05, scale=0.05)), host_a],
        [_config(rng, h=20, w=20, noise=0.08),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)), _tied_host(host_a)],
    ])
    nw = 2 * joint.num_params + 2
    pt = PTEnsembleSampler(
        nw, joint.num_params, joint.posterior_fns, ntemps=3, seed=23
    )
    pt.init_state(joint.init_params_from_priors(
        nw, random_state=np.random.RandomState(24)
    ))
    pt.run_burn(10)
    pt.reset()
    pt.run_sampling(20)
    assert pt.chain.shape == (nw, 20, joint.num_params)
    assert np.all(np.isfinite(pt.lnprobability))
    # mixed-shape per-band accumulators on the cold rung
    acc = pt.accumulated_images
    assert acc["b0_raw"].shape == (24, 24)
    assert acc["b1_raw"].shape == (20, 20)
    # evidence machinery runs (a 20-step ladder is under-resolved —
    # warnings allowed; the estimate must come back finite with a
    # non-negative error bar)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lnz, err = pt.log_evidence()
    assert np.isfinite(lnz) and err >= 0.0


def test_joint_map_fit():
    """Gradient MAP on the joint posterior finds the injected source."""
    from psfmc_tpu.optimize import fit_map

    rng = np.random.RandomState(25)
    ps_a = PointSource(
        xy=D.Uniform(loc=np.array([9.0, 9.0]), scale=np.array([6.0, 6.0])),
        mag=D.Uniform(loc=20.5, scale=1.5),
    )
    ps_b = PointSource(xy=Tied(ps_a, "xy"),
                       mag=D.Uniform(loc=21.0, scale=1.5))
    joint = JointModel([
        [_config(rng), Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_a],
        [_config(rng, h=16, w=16, noise=0.08),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_b],
    ])
    names = joint.param_names
    off = dict(zip(names, np.cumsum([0] + joint.param_lens)))
    truth = joint.init_params_from_priors(
        1, random_state=np.random.RandomState(26)
    )[0]
    truth[off["1_PointSource_xy"]:off["1_PointSource_xy"] + 2] = [11.2, 9.7]
    truth[off["1_PointSource_mag"]] = 21.2
    truth[off["4_PointSource_mag"]] = 21.9
    mocks, _ = joint.simulate(theta=truth, random_state=27)
    for f, mock in zip(joint.posterior_fns.band_fns, mocks):
        f.constants["obs_data"] = np.asarray(mock, np.float32)

    res = fit_map(joint.posterior_fns, n_starts=16, steps=300, seed=28)
    assert np.isfinite(res.lnpost)
    got = res.theta
    assert abs(got[off["1_PointSource_mag"]] - 21.2) < 0.1
    assert abs(got[off["4_PointSource_mag"]] - 21.9) < 0.15
    assert np.all(
        np.abs(got[off["1_PointSource_xy"]:off["1_PointSource_xy"] + 2]
               - [11.2, 9.7]) < 0.3
    )


def _wcs_header(crpix, crval, cd):
    from psfmc_tpu.io import fits

    hdr = fits.Header()
    hdr.set("CRPIX1", crpix[0])
    hdr.set("CRPIX2", crpix[1])
    hdr.set("CRVAL1", crval[0])
    hdr.set("CRVAL2", crval[1])
    hdr.set("CD1_1", cd[0][0])
    hdr.set("CD1_2", cd[0][1])
    hdr.set("CD2_1", cd[1][0])
    hdr.set("CD2_2", cd[1][1])
    return hdr


def test_sky_frame_tie(tmp_path):
    """frame='sky' ties map the shared position through each band's WCS
    (different pixel scales, rotations and reference points)."""
    from psfmc_tpu.io import fits
    from psfmc_tpu.io.wcs import MiniWCS

    rng = np.random.RandomState(35)
    s_a = 0.05 / 3600.0  # 0.05 arcsec/px
    s_b = 0.075 / 3600.0  # coarser AND rotated 90 deg
    hdr_a = _wcs_header((12.5, 12.5), (150.0, 2.0),
                        [[-s_a, 0.0], [0.0, s_a]])
    hdr_b = _wcs_header((9.5, 9.5), (150.0 + 2e-4, 2.0 - 1e-4),
                        [[0.0, -s_b], [s_b, 0.0]])

    def band(hw, hdr, noise, sig, tag):
        yy, xx = np.mgrid[0:hw, 0:hw].astype(float)
        psf = np.exp(-((xx - hw // 2) ** 2 + (yy - hw // 2) ** 2)
                     / (2 * sig**2))
        psf /= psf.sum()
        fits.writeto(str(tmp_path / f"sci{tag}.fits"),
                     (0.0 + rng.randn(hw, hw) * noise).astype(np.float32),
                     header=hdr)
        fits.writeto(str(tmp_path / f"ivm{tag}.fits"),
                     np.full((hw, hw), 1 / noise**2, np.float32))
        fits.writeto(str(tmp_path / f"psf{tag}.fits"),
                     psf.astype(np.float32))
        fits.writeto(str(tmp_path / f"pivm{tag}.fits"),
                     np.full((hw, hw), 1e8, np.float32))
        return Configuration(
            obs_file=str(tmp_path / f"sci{tag}.fits"),
            obsivm_file=str(tmp_path / f"ivm{tag}.fits"),
            psf_files=str(tmp_path / f"psf{tag}.fits"),
            psfivm_files=str(tmp_path / f"pivm{tag}.fits"),
            mag_zeropoint=25.0,
        )

    cfg_a = band(24, hdr_a, 0.05, 1.2, "a")
    cfg_b = band(18, hdr_b, 0.08, 1.8, "b")
    ps_a = PointSource(
        xy=D.Uniform(loc=np.array([9.0, 9.0]), scale=np.array([6.0, 6.0])),
        mag=D.Uniform(loc=21.0, scale=1.0),
    )
    ps_b = PointSource(xy=Tied(ps_a, "xy", frame="sky"),
                       mag=D.Uniform(loc=21.3, scale=1.0))
    joint = JointModel([
        [cfg_a, Sky(adu=D.Normal(loc=0.0, scale=0.02)), ps_a],
        [cfg_b, Sky(adu=D.Normal(loc=0.0, scale=0.02)), ps_b],
    ])

    # the band-B render rule carries the affine
    cs_b = joint.spec.band_specs[1].comp_specs
    kind, payload = next(
        c for c in cs_b if c.kind == "pointsource"
    ).params["xy"]
    assert kind == "theta_affine"
    _off, _size, a, b = payload

    # affine == the composed WCS mapping, to TAN-curvature precision
    wa, wb = MiniWCS(hdr_a), MiniWCS(hdr_b)
    for p in ([9.0, 9.0], [14.2, 11.7], [11.0, 15.5]):
        ra, dec = wa.pixel_to_sky(p[0] + 1, p[1] + 1)
        qx, qy = wb.sky_to_pixel(ra, dec)
        want = np.array([float(qx) - 1, float(qy) - 1])
        got = a @ np.asarray(p) + b
        assert np.allclose(got, want, atol=1e-6), (p, got, want)

    # end to end: injecting at xy_a puts band B's source at the mapped
    # pixel (peak of the noiseless render)
    names = joint.param_names
    off = dict(zip(names, np.cumsum([0] + joint.param_lens)))
    theta = joint.init_params_from_priors(
        1, random_state=np.random.RandomState(36)
    )[0]
    theta[off["1_PointSource_xy"]:off["1_PointSource_xy"] + 2] = [10.3, 12.6]
    imgs = joint.posterior_fns.render_images(
        jnp.asarray(theta, jnp.float32)
    )
    raw_b = np.asarray(imgs["b1_raw_model"])
    peak = np.unravel_index(np.argmax(raw_b), raw_b.shape)  # (row=y, x)
    ra, dec = wa.pixel_to_sky(10.3 + 1, 12.6 + 1)
    qx, qy = wb.sky_to_pixel(ra, dec)
    assert abs(peak[1] - (float(qx) - 1)) <= 1.0
    assert abs(peak[0] - (float(qy) - 1)) <= 1.0

    # frame='sky' without WCS headers fails loudly
    psf_nw = np.zeros((8, 8))
    psf_nw[4, 4] = 1.0
    cfg_nw = Configuration(
        obs_file=0.05 + rng.randn(16, 16) * 0.1,
        obsivm_file=np.full((16, 16), 100.0),
        psf_files=psf_nw,
        psfivm_files=np.full((8, 8), 1e8),
        mag_zeropoint=25.0,
    )
    ps_c = PointSource(xy=Tied(ps_a, "xy", frame="sky"),
                       mag=D.Uniform(loc=21.0, scale=1.0))
    with pytest.raises(ValueError, match="WCS"):
        JointModel([
            [cfg_a, ps_a],
            [cfg_nw, ps_c],
        ])

    with pytest.raises(ValueError, match="only to 'xy'"):
        Tied(ps_a, "mag", frame="sky")


def test_sky_tie_mixed_chain_uses_sky_hop_frame(tmp_path):
    """user --sky--> A --pixel--> C(slot): the affine must map from
    band A's WCS (the sky hop's target interprets the raw slot value in
    ITS grid), not from band C's."""
    from psfmc_tpu.io import fits
    from psfmc_tpu.io.wcs import MiniWCS

    rng = np.random.RandomState(44)
    s = 0.05 / 3600.0
    hdrs = [
        _wcs_header((12.5, 12.5), (150.0, 2.0), [[-s, 0.0], [0.0, s]]),
        _wcs_header((9.5, 9.5), (150.0 + 1e-4, 2.0), [[0.0, -1.5 * s],
                                                      [1.5 * s, 0.0]]),
        # band C: WILDLY different frame — if the affine wrongly used
        # it, the mapping would be off by many pixels
        _wcs_header((5.0, 5.0), (151.0, 2.5), [[-4 * s, 0.0],
                                               [0.0, 4 * s]]),
    ]
    cfgs = []
    for i, (hw, hdr) in enumerate(zip((24, 20, 16), hdrs)):
        yy, xx = np.mgrid[0:hw, 0:hw].astype(float)
        psf = np.exp(-((xx - hw // 2) ** 2 + (yy - hw // 2) ** 2) / 2.0)
        psf /= psf.sum()
        fits.writeto(str(tmp_path / f"s{i}.fits"),
                     (rng.randn(hw, hw) * 0.1).astype(np.float32),
                     header=hdr)
        fits.writeto(str(tmp_path / f"i{i}.fits"),
                     np.full((hw, hw), 100.0, np.float32))
        fits.writeto(str(tmp_path / f"p{i}.fits"), psf.astype(np.float32))
        fits.writeto(str(tmp_path / f"q{i}.fits"),
                     np.full((hw, hw), 1e8, np.float32))
        cfgs.append(Configuration(
            obs_file=str(tmp_path / f"s{i}.fits"),
            obsivm_file=str(tmp_path / f"i{i}.fits"),
            psf_files=str(tmp_path / f"p{i}.fits"),
            psfivm_files=str(tmp_path / f"q{i}.fits"),
            mag_zeropoint=25.0,
        ))

    ps_c = PointSource(
        xy=D.Uniform(loc=np.array([6.0, 6.0]), scale=np.array([4.0, 4.0])),
        mag=D.Uniform(loc=21.0, scale=1.0),
    )
    ps_a = PointSource(xy=Tied(ps_c, "xy"),  # pixel tie: raw value in A
                       mag=D.Uniform(loc=21.0, scale=1.0))
    ps_b = PointSource(xy=Tied(ps_a, "xy", frame="sky"),
                       mag=D.Uniform(loc=21.0, scale=1.0))
    joint = JointModel([
        [cfgs[0], ps_a],
        [cfgs[1], ps_b],
        [cfgs[2], ps_c],
    ])
    kind, payload = next(
        c for c in joint.spec.band_specs[1].comp_specs
        if c.kind == "pointsource"
    ).params["xy"]
    assert kind == "theta_affine"
    _o, _s, a, b = payload
    wa, wb = MiniWCS(hdrs[0]), MiniWCS(hdrs[1])
    p = np.array([7.3, 8.1])
    ra, dec = wa.pixel_to_sky(p[0] + 1, p[1] + 1)
    qx, qy = wb.sky_to_pixel(ra, dec)
    want = np.array([float(qx) - 1, float(qy) - 1])
    assert np.allclose(a @ p + b, want, atol=1e-6), (a @ p + b, want)


def test_offset_tie_registration_margin():
    """Tied(..., offset=prior): tie(base) + free per-band registration
    offset, marginalized with its own prior/slots/trace column."""
    rng = np.random.RandomState(37)
    ps_a = PointSource(
        xy=D.Uniform(loc=np.array([9.0, 9.0]), scale=np.array([6.0, 6.0])),
        mag=D.Uniform(loc=21.0, scale=1.0),
    )
    ps_b = PointSource(
        xy=Tied(ps_a, "xy",
                offset=D.Normal(loc=np.array([0.0, 0.0]), scale=0.2)),
        mag=D.Uniform(loc=21.3, scale=1.0),
    )
    joint = JointModel([
        [_config(rng), Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_a],
        [_config(rng, h=20, w=20, noise=0.08),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_b],
    ])
    names = joint.param_names
    # the offset owns band B's xy slots (trace column records the
    # OFFSET, not the absolute position)
    assert "4_PointSource_xy" in names
    cs = next(
        c for c in joint.spec.band_specs[1].comp_specs
        if c.kind == "pointsource"
    )
    kind, payload = cs.params["xy"]
    assert kind == "theta_affine_offset"
    boff, size, a, b, own = payload
    assert np.allclose(a, np.eye(2)) and np.allclose(b, 0.0)

    off = dict(zip(names, np.cumsum([0] + joint.param_lens)))
    theta = joint.init_params_from_priors(
        1, random_state=np.random.RandomState(38)
    )[0]
    theta[off["1_PointSource_xy"]:off["1_PointSource_xy"] + 2] = [10.0, 11.0]
    theta[off["4_PointSource_xy"]:off["4_PointSource_xy"] + 2] = [1.5, -2.0]
    imgs = joint.posterior_fns.render_images(
        jnp.asarray(theta, jnp.float32)
    )
    raw_b = np.asarray(imgs["b1_raw_model"])
    peak = np.unravel_index(np.argmax(raw_b), raw_b.shape)  # (y, x)
    assert abs(peak[1] - (10.0 + 1.5)) <= 1.0
    assert abs(peak[0] - (11.0 - 2.0)) <= 1.0

    # the offset prior contributes to the joint prior
    lp0 = float(joint.posterior_fns.log_prior(jnp.asarray(theta)))
    t2 = theta.copy()
    t2[off["4_PointSource_xy"]] = 0.0  # closer to the Normal(0, .2) peak
    lp1 = float(joint.posterior_fns.log_prior(jnp.asarray(t2)))
    assert lp1 > lp0

    # prior draws include the offset; lnpost finite
    th = joint.init_params_from_priors(
        6, random_state=np.random.RandomState(39)
    )
    lnp = np.asarray(
        jax.vmap(joint.posterior_fns.log_posterior)(jnp.asarray(th))
    )
    assert np.all(np.isfinite(lnp))

    # offset= rejects non-xy attrs and non-priors
    with pytest.raises(ValueError, match="only to 'xy'"):
        Tied(ps_a, "mag", offset=D.Normal(loc=0.0, scale=0.1))
    with pytest.raises(TypeError, match="prior distribution"):
        Tied(ps_a, "xy", offset=0.5)


def test_joint_model_file_two_configurations(tmp_path, monkeypatch):
    """A model FILE with two Configurations becomes a JointModel: each
    Configuration starts a band; the driver runs the joint fit."""
    from psfmc_tpu import model_galaxy_mcmc
    from psfmc_tpu.io import fits
    from psfmc_tpu.models.multicomponent import as_model

    monkeypatch.chdir(tmp_path)
    rng = np.random.RandomState(33)
    for band, (hw, noise, sig) in enumerate(((24, 0.2, 1.2),
                                             (18, 0.3, 2.0))):
        yy, xx = np.mgrid[0:hw, 0:hw].astype(float)
        psf = np.exp(-((xx - hw // 2) ** 2 + (yy - hw // 2) ** 2)
                     / (2 * sig**2))
        psf /= psf.sum()
        fits.writeto(f"sci{band}.fits",
                     (0.05 + rng.randn(hw, hw) * noise).astype(np.float32))
        fits.writeto(f"ivm{band}.fits",
                     np.full((hw, hw), 1 / noise**2, np.float32))
        fits.writeto(f"psf{band}.fits", psf.astype(np.float32))
        fits.writeto(f"pivm{band}.fits",
                     np.full((hw, hw), 1e8, np.float32))
    (tmp_path / "joint_model.py").write_text("""
from numpy import array
Configuration(obs_file='sci0.fits', obsivm_file='ivm0.fits',
              psf_files='psf0.fits', psfivm_files='pivm0.fits',
              mag_zeropoint=25.0)
Sky(adu=Normal(loc=0.05, scale=0.05))
ps = PointSource(xy=Uniform(loc=array([7., 7.]), scale=array([8., 8.])),
                 mag=Uniform(loc=21.0, scale=1.0))
ps
Configuration(obs_file='sci1.fits', obsivm_file='ivm1.fits',
              psf_files='psf1.fits', psfivm_files='pivm1.fits',
              mag_zeropoint=25.0)
Sky(adu=Normal(loc=0.05, scale=0.05))
PointSource(xy=Tied(ps, 'xy'), mag=Uniform(loc=21.3, scale=1.0))
""")
    model = as_model("joint_model.py")
    assert hasattr(model.posterior_fns, "band_fns")
    assert len(model.spec.band_specs) == 2
    assert model.spec.band_specs[0].shape == (24, 24)
    assert model.spec.band_specs[1].shape == (18, 18)

    nw = 2 * model.num_params + 2
    db = model_galaxy_mcmc(
        "joint_model.py", output_name="out_jf", burn=20, iterations=20,
        chains=nw, max_iterations=1, convergence_check=lambda s: True,
        seed=34,
    )
    assert len(db) == nw * 20
    assert fits.getdata("out_jf_b1_raw_model.fits").shape == (18, 18)

    # single-observation class warns (not silently drops) on 2 configs
    import pytest as _pytest

    from psfmc_tpu.model_parser import component_list_from_file

    comps = component_list_from_file(str(tmp_path / "joint_model.py"))
    with _pytest.warns(UserWarning, match="only the first"):
        MultiComponentModel(components=comps)


def test_joint_driver_end_to_end(tmp_path, monkeypatch):
    """model_galaxy_mcmc accepts a JointModel: full driver run with
    convergence machinery, DB + checkpoint, per-band image products,
    and checkpoint resume."""
    from psfmc_tpu import model_galaxy_mcmc
    from psfmc_tpu.io import fits

    monkeypatch.chdir(tmp_path)
    rng = np.random.RandomState(30)
    host_a = _host()
    bands = [
        [_config(rng), Sky(adu=D.Normal(loc=0.05, scale=0.05)), host_a],
        [_config(rng, h=20, w=20, noise=0.08),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)), _tied_host(host_a)],
    ]
    joint = JointModel(bands)
    nw = 2 * joint.num_params + 2

    db = model_galaxy_mcmc(
        joint, output_name="out_jd", burn=30, iterations=40, chains=nw,
        max_iterations=1, convergence_check=lambda s: True, seed=31,
    )
    assert len(db) == nw * 40
    for name in joint.param_names:
        assert name in db.colnames
    for b, shape in ((0, (24, 24)), (1, (20, 20))):
        for ftype in ("raw_model", "residual", "composite_ivm",
                      "convolved_model", "point_source_subtracted"):
            data = fits.getdata(f"out_jd_b{b}_{ftype}.fits")
            assert data.shape == shape, (b, ftype)
            assert np.all(np.isfinite(data))

    # resume: a second call asking for more retained samples extends
    # the existing chain from the checkpoint
    db2 = model_galaxy_mcmc(
        joint, output_name="out_jd", burn=30, iterations=80, chains=nw,
        max_iterations=1, convergence_check=lambda s: True, seed=31,
    )
    assert len(db2) == nw * 80


def test_joint_simulate():
    """Per-band mocks at one shared parameter vector."""
    rng = np.random.RandomState(17)
    host_a = _host()
    joint = JointModel([
        [_config(rng), Sky(adu=D.Normal(loc=0.05, scale=0.05)), host_a],
        [_config(rng, h=16, w=16, noise=0.08),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)), _tied_host(host_a)],
    ])
    mocks, theta = joint.simulate(random_state=18)
    assert len(mocks) == 2
    assert mocks[0].shape == (24, 24) and mocks[1].shape == (16, 16)
    assert theta.shape == (joint.num_params,)
    # deterministic; noiseless == the band's convolved render
    mocks2, theta2 = joint.simulate(random_state=18)
    assert np.array_equal(theta, theta2)
    assert all(np.array_equal(a, b) for a, b in zip(mocks, mocks2))
    clean, _ = joint.simulate(theta=theta, add_noise=False)
    th = jnp.asarray(theta, jnp.float32)
    for f, img in zip(joint.posterior_fns.band_fns, clean):
        conv = np.asarray(f._images_impl(th)["conv"], np.float64)
        np.testing.assert_allclose(img, conv)


def test_joint_multipsf_index_names_unique():
    """Two bands each with a stochastic PSF index: the single-band
    'PSF_Index' name would collide (and silently overwrite name-keyed
    trace columns) — joint layouts disambiguate per band."""
    rng = np.random.RandomState(20)
    h = w = 24
    yy, xx = np.mgrid[0:12, 0:12].astype(float)
    p1 = np.exp(-((xx - 6) ** 2 + (yy - 6) ** 2) / (2 * 1.0**2))
    p2 = np.exp(-((xx - 6) ** 2 + (yy - 6) ** 2) / (2 * 2.5**2))
    p1 /= p1.sum()
    p2 /= p2.sum()

    def cfg(noise):
        return Configuration(
            obs_file=0.05 + rng.randn(h, w) * noise,
            obsivm_file=np.full((h, w), 1.0 / noise**2),
            psf_files=[p1, p2],
            psfivm_files=[np.ones_like(p1) * 1e8] * 2,
            mag_zeropoint=25.0,
        )

    ps_a = PointSource(
        xy=D.Uniform(loc=np.array([9.0, 9.0]), scale=np.array([6.0, 6.0])),
        mag=D.Uniform(loc=20.5, scale=1.5),
    )
    ps_b = PointSource(xy=Tied(ps_a, "xy"),
                       mag=D.Uniform(loc=21.0, scale=1.5))
    joint = JointModel([
        [cfg(0.05), Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_a],
        [cfg(0.08), Sky(adu=D.Normal(loc=0.05, scale=0.05)), ps_b],
    ])
    names = joint.param_names
    assert "B0_PSF_Index" in names and "B1_PSF_Index" in names
    assert "PSF_Index" not in names
    assert len(set(names)) == len(names)
    th = joint.init_params_from_priors(
        4, random_state=np.random.RandomState(21)
    )
    lnp = np.asarray(
        jax.vmap(joint.posterior_fns.log_posterior)(jnp.asarray(th))
    )
    assert np.all(np.isfinite(lnp))


def test_joint_database_roundtrip(tmp_path):
    from psfmc_tpu.database import load_database, save_database

    rng = np.random.RandomState(9)
    host_a = _host()
    bands = [
        [_config(rng), Sky(adu=D.Normal(loc=0.05, scale=0.05)), host_a],
        # different band shape: exercises the mixed-shape accumulator
        # checkpoint layout and per-band image products
        [_config(rng, h=20, w=20, noise=0.06),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)),
         _tied_host(host_a)],
    ]
    joint = JointModel(bands)
    nw = 2 * joint.num_params + 2
    s = EnsembleSampler(nw, joint.num_params, joint.posterior_fns, seed=10)
    s.init_state(joint.init_params_from_priors(
        nw, random_state=np.random.RandomState(11)
    ))
    s.run_burn(10)
    s.reset()
    s.run_sampling(10)
    path = str(tmp_path / "joint_db.fits")
    save_database(s, joint, path)
    db = load_database(path)
    assert len(db) == nw * 10
    for name in joint.param_names:
        assert name in db.colnames

    # per-band posterior image products
    from psfmc_tpu.io import fits

    joint.save_posterior_images(s, str(tmp_path / "out_j"), database=db)
    for b, shape in ((0, (24, 24)), (1, (20, 20))):
        for ftype in ("raw_model", "residual", "composite_ivm"):
            p = str(tmp_path / f"out_j_b{b}_{ftype}.fits")
            data = fits.getdata(p)
            assert data.shape == shape
            assert np.all(np.isfinite(data))
    hdr = fits.getheader(str(tmp_path / "out_j_b1_raw_model.fits"))
    assert hdr["MCBAND"] == 1
    assert hdr["MCACCUM"] == nw * 10

    # mixed-shape accumulators roundtrip through the checkpoint (the
    # uniform-(H,W)-columns layout cannot hold them; they ride a
    # single-row array-cell layout with shape cards)
    from psfmc_tpu.database import load_checkpoint

    ck = load_checkpoint(path)
    for k, v in s.accumulated_images.items():
        assert ck["accum"][k].shape == v.shape, k
        np.testing.assert_allclose(ck["accum"][k], v, rtol=1e-6)
