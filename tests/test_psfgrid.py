"""Spatially-varying PSF construction (io/psfgrid.py).

Anchors: exact-hit rule, convex-mix exactness at symmetric midpoints,
first-order IVM propagation against the hand formula, per-pixel
bad-pixel renormalization (a hole in one star is filled by the others,
not averaged with zero), nearest-k ordering, validation errors, and an
e2e survey fit where interpolated local PSFs recover a magnitude the
shared wrong PSF misses.
"""
import numpy as np
import pytest

from psfmc_tpu.io import interpolate_psfs
from psfmc_tpu.io.preprocess import preprocess_psf


def _psf(sigma, n=16):
    yy, xx = np.mgrid[0:n, 0:n].astype(float)
    p = np.exp(-((xx - n / 2) ** 2 + (yy - n / 2) ** 2) / (2 * sigma**2))
    return p / p.sum()


def _stars():
    stars = [_psf(1.0), _psf(2.0), _psf(3.0)]
    ivms = [np.full((16, 16), 1e6 * (j + 1)) for j in range(3)]
    pos = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    return stars, ivms, pos


def test_exact_hit_returns_star():
    stars, ivms, pos = _stars()
    psf, ivm = interpolate_psfs(stars, ivms, pos, [pos[1]])
    want_p, want_v = preprocess_psf(stars[1], ivms[1])
    np.testing.assert_array_equal(psf[0], want_p)
    np.testing.assert_allclose(ivm[0], 1.0 / want_v)


def test_midpoint_is_mean_and_ivm_propagates():
    """Equidistant from two identical-IVM stars: psf = mean of the
    two normalized stamps; var = (var1+var2)/4 (w=1/2 each)."""
    stars, ivms, _ = _stars()
    stars, ivms = stars[:2], [np.full((16, 16), 1e6)] * 2
    pos = np.array([[0.0, 0.0], [100.0, 0.0]])
    psf, ivm = interpolate_psfs(stars, ivms, pos, [[50.0, 0.0]],
                                power=2.0)
    p0, v0 = preprocess_psf(stars[0], ivms[0])
    p1, v1 = preprocess_psf(stars[1], ivms[1])
    np.testing.assert_allclose(psf[0], 0.5 * (p0 + p1), rtol=1e-12)
    np.testing.assert_allclose(ivm[0], 1.0 / (0.25 * (v0 + v1)),
                               rtol=1e-12)
    # a convex mix of unit-sum stamps is unit-sum
    np.testing.assert_allclose(psf[0].sum(), 1.0, rtol=1e-12)


def test_idw_weights_follow_distance_power():
    """1/4 of the way between two stars with power=1: w = (3, 1)/4."""
    stars, ivms, _ = _stars()
    stars, ivms = stars[:2], ivms[:2]
    pos = np.array([[0.0, 0.0], [100.0, 0.0]])
    psf, _ = interpolate_psfs(stars, ivms, pos, [[25.0, 0.0]], power=1.0)
    p0, _ = preprocess_psf(stars[0], ivms[0])
    p1, _ = preprocess_psf(stars[1], ivms[1])
    np.testing.assert_allclose(psf[0], 0.75 * p0 + 0.25 * p1, rtol=1e-12)


def test_bad_pixel_filled_by_other_star():
    """A hole in the nearer star is filled from the good star at full
    weight (per-pixel renormalization), not mixed with zero."""
    stars, _, _ = _stars()
    s0, s1 = stars[0].copy(), stars[1].copy()
    i0 = np.full((16, 16), 1e6)
    i1 = np.full((16, 16), 1e6)
    i0[8, 8] = 0.0  # hole at the star-0 core
    pos = np.array([[0.0, 0.0], [100.0, 0.0]])
    psf, ivm = interpolate_psfs([s0, s1], [i0, i1], pos, [[50.0, 0.0]])
    p0, v0 = preprocess_psf(s0, i0)
    p1, v1 = preprocess_psf(s1, i1)
    # away from the hole: the usual midpoint mean
    np.testing.assert_allclose(psf[0][0, 0], 0.5 * (p0 + p1)[0, 0],
                               rtol=1e-12)
    # at the hole: star 1 alone, with star 1's variance alone
    np.testing.assert_allclose(psf[0][8, 8], p1[8, 8], rtol=1e-12)
    np.testing.assert_allclose(ivm[0][8, 8], 1.0 / v1[8, 8], rtol=1e-12)


def test_all_bad_pixel_stays_bad():
    stars, _, _ = _stars()
    i0 = np.full((16, 16), 1e6)
    i1 = np.full((16, 16), 1e6)
    i0[3, 5] = 0.0
    i1[3, 5] = 0.0
    pos = np.array([[0.0, 0.0], [100.0, 0.0]])
    psf, ivm = interpolate_psfs(stars[:2], [i0, i1], pos, [[50.0, 0.0]])
    assert psf[0][3, 5] == 0.0
    assert ivm[0][3, 5] == 0.0


def test_k_limits_contributing_stars():
    """k=2 idw at a point near stars 0,1: star 2 contributes nothing."""
    stars, ivms, pos = _stars()
    got2, _ = interpolate_psfs(stars, ivms, pos, [[10.0, 1.0]], k=2)
    got_pair, _ = interpolate_psfs(
        stars[:2], ivms[:2], pos[:2], [[10.0, 1.0]]
    )
    np.testing.assert_allclose(got2[0], got_pair[0], rtol=1e-12)


def test_nearest_k1_and_ordering():
    stars, ivms, pos = _stars()
    psf, ivm = interpolate_psfs(stars, ivms, pos, [[90.0, 5.0]],
                                method="nearest")
    want_p, want_v = preprocess_psf(stars[1], ivms[1])
    assert psf.shape == (1, 16, 16)
    np.testing.assert_array_equal(psf[0], want_p)
    np.testing.assert_allclose(ivm[0], 1.0 / want_v)

    psf2, ivm2 = interpolate_psfs(stars, ivms, pos, [[90.0, 5.0]],
                                  method="nearest", k=2)
    assert isinstance(psf2, list) and len(psf2[0]) == 2
    p0, _ = preprocess_psf(stars[0], ivms[0])
    np.testing.assert_array_equal(psf2[0][0], want_p)  # nearest first
    np.testing.assert_array_equal(psf2[0][1], p0)


def test_validation_errors():
    stars, ivms, pos = _stars()
    with pytest.raises(ValueError, match="disagree on star count"):
        interpolate_psfs(stars, ivms[:2], pos, [[0, 0]])
    with pytest.raises(ValueError, match="share one shape"):
        interpolate_psfs([stars[0], stars[1][:8]],
                         [ivms[0], ivms[1][:8]], pos[:2], [[0, 0]])
    with pytest.raises(ValueError, match="star_positions"):
        interpolate_psfs(stars, ivms, pos[:2], [[0, 0]])
    with pytest.raises(ValueError, match="k="):
        interpolate_psfs(stars, ivms, pos, [[0, 0]], k=4)
    with pytest.raises(ValueError, match="method"):
        interpolate_psfs(stars, ivms, pos, [[0, 0]], method="spline")
    with pytest.raises(ValueError, match="non-finite"):
        interpolate_psfs(stars, ivms, pos, [[np.nan, 0.0]])


def test_survey_e2e_interpolated_psfs():
    """Field with a PSF width gradient: local IDW PSFs feed fit_batch
    and recover each target's point-source magnitude; the shared
    template PSF misses the far target's."""
    import jax.numpy as jnp  # noqa: F401  (ensures CPU config loaded)
    from psfmc_tpu import distributions as D
    from psfmc_tpu.batchfit import fit_batch
    from psfmc_tpu.models.components import Configuration, PointSource, Sky
    from psfmc_tpu.models.multicomponent import MultiComponentModel

    rng = np.random.RandomState(7)
    h = w = 24
    noise = 0.05
    ivm_img = np.full((h, w), 1.0 / noise**2)
    pivm = np.ones((16, 16)) * 1e8

    # PSF width varies linearly with field x: sigma(x) = 1 + x/50
    star_x = np.array([0.0, 50.0, 100.0])
    stars = [_psf(1.0 + x / 50.0) for x in star_x]
    star_pos = np.column_stack([star_x, np.zeros(3)])
    targ_pos = np.array([[5.0, 0.0], [95.0, 0.0]])
    true_sigma = 1.0 + targ_pos[:, 0] / 50.0

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

    tmpl = build(stars[0], 0.05 + rng.randn(h, w) * noise)
    thetas = tmpl.init_params_from_priors(
        2, random_state=np.random.RandomState(8)
    )
    obs = np.stack([
        build(_psf(true_sigma[k]), np.zeros((h, w))).simulate(
            theta=thetas[k], random_state=10 + k
        )[0]
        for k in range(2)
    ])
    ivm = np.broadcast_to(ivm_img, obs.shape).copy()

    psf_stack, psfivm_stack = interpolate_psfs(
        stars, [pivm] * 3, star_pos, targ_pos
    )
    res = fit_batch(
        tmpl, obs, ivm, burn=250, iterations=250, seed=11,
        psf_stack=list(psf_stack), psfivm_stack=list(psfivm_stack),
    )
    # absolute recovery: at this S/N the positional posterior is
    # ~0.003 px wide, far tighter than the IDW approximation error, so
    # assert physical accuracy rather than pulls
    mag = res.param_names.index("1_PointSource_mag")
    col = int(np.concatenate([[0], np.cumsum(res.param_lens)])[mag])
    xy = res.param_names.index("1_PointSource_xy")
    xcol = int(np.concatenate([[0], np.cumsum(res.param_lens)])[xy])
    # IDW image-space mixing under a width gradient is approximate (a
    # two-Gaussian mix has the WEIGHTED second moment, not the local
    # width), so the bound is physical accuracy, not posterior pulls:
    # ~0.1 mag from a ~5% width mismatch at this S/N
    for k in range(2):
        assert abs(res.mean[k, col] - thetas[k][col]) < 0.15, (
            k, res.mean[k, col], thetas[k][col], res.std[k, col]
        )
        np.testing.assert_allclose(
            res.mean[k, xcol : xcol + 2], thetas[k][xcol : xcol + 2],
            atol=0.15,
        )

    wrong = fit_batch(tmpl, obs, ivm, burn=250, iterations=250, seed=11)
    # the far target under the template's sigma=1 PSF: mag biased, and
    # the interpolated fit beats it
    err_wrong = abs(wrong.mean[1, col] - thetas[1][col])
    err_interp = abs(res.mean[1, col] - thetas[1][col])
    assert err_wrong > 3.0 * wrong.std[1, col]
    assert err_interp < 0.5 * err_wrong, (err_interp, err_wrong)
