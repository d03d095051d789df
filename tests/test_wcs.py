"""MiniWCS: TAN projection + pixel area vs hand-computed geometry."""
import numpy as np

from psfmc_tpu.io.wcs import MiniWCS, proj_plane_pixel_area

# 0.05"/px HST-like CD matrix with a 30-degree rotation
SCALE = 0.05 / 3600.0
ANG = np.deg2rad(30.0)
HDR_CD = {
    "CRPIX1": 64.0,
    "CRPIX2": 64.0,
    "CRVAL1": 150.1,
    "CRVAL2": 2.2,
    "CD1_1": -SCALE * np.cos(ANG),
    "CD1_2": SCALE * np.sin(ANG),
    "CD2_1": SCALE * np.sin(ANG),
    "CD2_2": SCALE * np.cos(ANG),
}


def test_pixel_area_cd_matrix():
    w = MiniWCS(HDR_CD)
    # |det CD| = scale^2 regardless of rotation/flip
    assert np.isclose(proj_plane_pixel_area(w), SCALE**2, rtol=1e-12)


def test_pixel_area_cdelt_crota():
    hdr = {
        "CRPIX1": 1.0,
        "CRPIX2": 1.0,
        "CRVAL1": 10.0,
        "CRVAL2": -5.0,
        "CDELT1": -SCALE,
        "CDELT2": SCALE,
        "CROTA2": 25.0,
    }
    w = MiniWCS(hdr)
    assert np.isclose(w.pixel_area_deg2(), SCALE**2, rtol=1e-12)


def test_pixel_area_pc_matrix():
    hdr = {
        "CRPIX1": 1.0,
        "CRPIX2": 1.0,
        "CRVAL1": 0.0,
        "CRVAL2": 0.0,
        "PC1_1": np.cos(ANG),
        "PC1_2": -np.sin(ANG),
        "PC2_1": np.sin(ANG),
        "PC2_2": np.cos(ANG),
        "CDELT1": -SCALE,
        "CDELT2": SCALE,
    }
    w = MiniWCS(hdr)
    assert np.isclose(w.pixel_area_deg2(), SCALE**2, rtol=1e-12)


def test_sky_to_pixel_reference_point():
    w = MiniWCS(HDR_CD)
    x, y = w.sky_to_pixel(150.1, 2.2)
    assert np.isclose(x, 64.0, atol=1e-9)
    assert np.isclose(y, 64.0, atol=1e-9)


def test_sky_to_pixel_offset_geometry():
    """1 pixel along the CD matrix's first axis lands 1 px from CRPIX."""
    w = MiniWCS(HDR_CD)
    # world offset corresponding to pixel offset (+10, +3): TAN is
    # locally linear, so xi/eta ~ CD @ dpix for small offsets
    dpix = np.array([10.0, 3.0])
    xi, eta = w.cd @ dpix  # degrees in the tangent plane
    dec0 = np.deg2rad(2.2)
    # invert the small-angle gnomonic relations for the world coords
    dec = np.rad2deg(
        np.arctan(
            (np.sin(dec0) + np.deg2rad(eta) * np.cos(dec0))
            / np.sqrt(
                np.deg2rad(xi) ** 2
                + (np.cos(dec0) - np.deg2rad(eta) * np.sin(dec0)) ** 2
            )
        )
    )
    ra = 150.1 + np.rad2deg(
        np.arctan2(
            np.deg2rad(xi),
            np.cos(dec0) - np.deg2rad(eta) * np.sin(dec0),
        )
    )
    x, y = w.sky_to_pixel(ra, dec)
    assert np.isclose(x, 64.0 + 10.0, atol=1e-6)
    assert np.isclose(y, 64.0 + 3.0, atol=1e-6)


def test_pixel_sky_roundtrip():
    """pixel_to_sky is the exact inverse of sky_to_pixel."""
    w = MiniWCS(HDR_CD)
    xs = np.array([1.0, 17.3, 64.0, 120.9])
    ys = np.array([3.5, 64.0, 99.1, 12.0])
    ra, dec = w.pixel_to_sky(xs, ys)
    x2, y2 = w.sky_to_pixel(ra, dec)
    np.testing.assert_allclose(x2, xs, atol=1e-9)
    np.testing.assert_allclose(y2, ys, atol=1e-9)


def test_sin_and_arc_projections():
    """SIN/ARC round-trip exactly and satisfy their defining radial
    properties; all three projections agree near the reference point."""
    import numpy as np

    from psfmc_tpu.io.wcs import MiniWCS

    base = {
        "CRPIX1": 100.0, "CRPIX2": 120.0,
        "CRVAL1": 210.5, "CRVAL2": 54.25,
        "CD1_1": -3e-4, "CD1_2": 2e-5, "CD2_1": 1.5e-5, "CD2_2": 3e-4,
    }

    def wcs_for(code):
        h = dict(base, CTYPE1=f"RA---{code}", CTYPE2=f"DEC--{code}")
        return MiniWCS(h)

    for code in ("TAN", "SIN", "ARC"):
        w = wcs_for(code)
        assert w.proj == code
        xs = np.array([1.0, 50.0, 180.0, 250.0])
        ys = np.array([1.0, 60.0, 10.0, 230.0])
        ra, dec = w.pixel_to_sky(xs, ys)
        xb, yb = w.sky_to_pixel(ra, dec)
        np.testing.assert_allclose(xb, xs, atol=1e-8)
        np.testing.assert_allclose(yb, ys, atol=1e-8)

    # ARC: the intermediate radius equals the true angular distance
    w = wcs_for("ARC")
    ra, dec = base["CRVAL1"], base["CRVAL2"] + 2.0  # 2 deg north
    x, y = w.sky_to_pixel(ra, dec)
    xi, eta = w.cd @ np.stack([
        np.atleast_1d(x - w.crpix[0]), np.atleast_1d(y - w.crpix[1])
    ])
    assert abs(np.hypot(xi, eta)[0] - 2.0) < 1e-9

    # SIN: radius = sin(c) in radians
    w = wcs_for("SIN")
    x, y = w.sky_to_pixel(ra, dec)
    xi, eta = w.cd @ np.stack([
        np.atleast_1d(x - w.crpix[0]), np.atleast_1d(y - w.crpix[1])
    ])
    assert abs(
        np.hypot(xi, eta)[0] - np.degrees(np.sin(np.radians(2.0)))
    ) < 1e-9

    # all three agree to < 1e-3 px within an arcminute of the center
    pts = [(base["CRVAL1"] + 0.01, base["CRVAL2"] + 0.008)]
    ws = {c: wcs_for(c) for c in ("TAN", "SIN", "ARC")}
    for ra, dec in pts:
        ref = ws["TAN"].sky_to_pixel(ra, dec)
        for c in ("SIN", "ARC"):
            got = ws[c].sky_to_pixel(ra, dec)
            assert abs(got[0] - ref[0]) < 1e-3
            assert abs(got[1] - ref[1]) < 1e-3

    # an unsupported projection still warns and assumes TAN
    import pytest

    with pytest.warns(UserWarning, match="TAN"):
        w = MiniWCS(dict(base, CTYPE1="RA---AIT", CTYPE2="DEC--AIT"))
    assert w.proj == "TAN"


# ---------------------------------------------------------------------------
# SIP distortion (Shupe et al. 2005) — the one WCS case flt-frame HST
# imaging hits (round-4 verdict item 3).  The reference gets SIP free
# through astropy.wcs; MiniWCS applies A/B forward polynomials and
# inverts them exactly by fixed-point iteration (AP/BP as the guess).
# ---------------------------------------------------------------------------

# ACS/WFC-like quadratic+cubic distortion, scaled so the corner of a
# 256 px frame is displaced by a few tenths of a pixel (flt-frame order)
SIP_CARDS = {
    "CTYPE1": "RA---TAN-SIP", "CTYPE2": "DEC--TAN-SIP",
    "A_ORDER": 3, "B_ORDER": 3,
    "A_2_0": 8.4e-5, "A_0_2": -5.6e-5, "A_1_1": 3.2e-5,
    "A_3_0": 3.0e-9, "A_1_2": -2.0e-9,
    "B_2_0": -6.8e-5, "B_0_2": 9.6e-5, "B_1_1": -2.4e-5,
    "B_0_3": 2.5e-9, "B_2_1": 1.5e-9,
}


def _sip_header(extra=None):
    hdr = dict(HDR_CD, **SIP_CARDS)
    if extra:
        hdr.update(extra)
    return hdr


def test_sip_forward_matches_linear_wcs_at_distorted_pixel():
    """pixel_to_sky with SIP == linear pixel_to_sky evaluated at the
    polynomial-displaced pseudo-pixel (the definition of SIP)."""
    w_sip = MiniWCS(_sip_header())
    w_lin = MiniWCS(HDR_CD)
    assert w_sip.has_sip
    x, y = 150.0, 20.0
    u, v = x - 64.0, y - 64.0
    du = (8.4e-5 * u**2 - 5.6e-5 * v**2 + 3.2e-5 * u * v
          + 3.0e-9 * u**3 - 2.0e-9 * u * v**2)
    dv = (-6.8e-5 * u**2 + 9.6e-5 * v**2 - 2.4e-5 * u * v
          + 2.5e-9 * v**3 + 1.5e-9 * u**2 * v)
    # the displacement is real (does-it-do-anything) and sub-pixel here
    assert 0.01 < abs(du) < 1.0 and 0.01 < abs(dv) < 1.0
    ra_sip, dec_sip = w_sip.pixel_to_sky(x, y)
    ra_exp, dec_exp = w_lin.pixel_to_sky(x + du, y + dv)
    assert np.isclose(ra_sip, ra_exp, atol=1e-12)
    assert np.isclose(dec_sip, dec_exp, atol=1e-12)


def test_sip_roundtrip_without_inverse_coeffs():
    """Fixed-point inversion closes the round trip below 1e-6 px even
    with no AP/BP cards in the header."""
    import warnings

    w = MiniWCS(_sip_header())
    xs = np.array([1.0, 17.3, 64.0, 120.9, 250.0])
    ys = np.array([3.5, 64.0, 99.1, 12.0, 250.0])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no non-convergence warning
        ra, dec = w.pixel_to_sky(xs, ys)
        x2, y2 = w.sky_to_pixel(ra, dec)
    np.testing.assert_allclose(x2, xs, atol=1e-6)
    np.testing.assert_allclose(y2, ys, atol=1e-6)


def test_sip_roundtrip_with_crude_inverse_coeffs():
    """AP/BP are only a starting guess: even deliberately crude inverse
    polynomials must not degrade the round trip (the fixed point
    polishes them)."""
    w = MiniWCS(_sip_header({
        "AP_ORDER": 2, "BP_ORDER": 2,
        "AP_2_0": -8.0e-5, "BP_0_2": -8.0e-5,  # rough sign-only inverse
    }))
    assert w.sip_ap is not None and w.sip_bp is not None
    xs = np.array([10.0, 200.0])
    ys = np.array([220.0, 30.0])
    ra, dec = w.pixel_to_sky(xs, ys)
    x2, y2 = w.sky_to_pixel(ra, dec)
    np.testing.assert_allclose(x2, xs, atol=1e-6)
    np.testing.assert_allclose(y2, ys, atol=1e-6)


def test_sip_region_mask_shifts_by_distortion():
    """A sky-frame circular region rasterized through a SIP WCS lands on
    the SIP-corrected pixel; the linear WCS puts it elsewhere."""
    from psfmc_tpu.io.region import region_mask

    hdr_sip = _sip_header()
    w_sip = MiniWCS(hdr_sip)
    w_lin = MiniWCS(HDR_CD)
    cx, cy = 200.0, 220.0  # far from CRPIX -> ~1 px distortion
    ra, dec = w_sip.pixel_to_sky(cx, cy)
    x_lin, y_lin = w_lin.sky_to_pixel(ra, dec)
    shift = np.hypot(x_lin - cx, y_lin - cy)
    assert shift > 0.5  # the case worth testing: visibly wrong w/o SIP
    reg = f"fk5\ncircle({ra:.10f},{dec:.10f},{4 * 0.05}\")\n"
    m_sip = region_mask(reg, (256, 256), header=hdr_sip)
    m_lin = region_mask(reg, (256, 256), header=HDR_CD)
    # SIP mask centers on the true pixel (1-based coords -> [cy-1, cx-1])
    assert m_sip[int(cy) - 1, int(cx) - 1]
    ys, xs = np.nonzero(m_sip)
    c_sip = np.array([xs.mean() + 1, ys.mean() + 1])
    ys, xs = np.nonzero(m_lin)
    c_lin = np.array([xs.mean() + 1, ys.mean() + 1])
    assert np.hypot(*(c_sip - [cx, cy])) < 1.0
    assert np.hypot(*(c_sip - c_lin)) > 0.5 * shift


def test_sip_nonconvergent_inversion_warns():
    """Pathological coefficients (|dA/du| > 1 over the frame) defeat the
    fixed point; with no AP/BP cards the failure must be loud."""
    import pytest

    w = MiniWCS(_sip_header({"A_2_0": 0.1}))
    ra, dec = MiniWCS(HDR_CD).pixel_to_sky(240.0, 240.0)
    with pytest.warns(UserWarning, match="did not converge"):
        w.sky_to_pixel(ra, dec)


def test_sip_nonconvergent_with_inverse_coeffs_still_warns():
    """Review finding (round 5): the non-convergence warning must fire
    even when AP/BP cards are present — a diverged fixed point hands
    NaN centers to the region rasterizer otherwise silently."""
    import pytest

    w = MiniWCS(_sip_header({
        "A_2_0": 0.1, "AP_ORDER": 2, "AP_2_0": -0.1,
    }))
    ra, dec = MiniWCS(HDR_CD).pixel_to_sky(240.0, 240.0)
    with pytest.warns(UserWarning, match="did not converge"):
        w.sky_to_pixel(ra, dec)
