"""Mosaic -> cutout-stack extraction (survey-mode front door).

Anchors: exact slice values, clamped edge windows with consistent
in-cutout positions, WCS consistency (the shifted-CRPIX cutout header
maps any cutout pixel to the SAME sky point the mosaic header maps the
corresponding mosaic pixel to), world-coordinate target selection, and
a Configuration round-trip preserving the WCS pixel scale.
"""
import numpy as np
import pytest

from psfmc_tpu.io import MiniWCS, cutout_stack
from psfmc_tpu.io.fits import Header


def _mosaic(ny=64, nx=80, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(ny, nx)
    ivm = np.full((ny, nx), 25.0)
    ivm[25, 15] = 0.0  # one bad pixel rides into any covering cutout
    hdr = Header()
    hdr.set("CRPIX1", 40.0)
    hdr.set("CRPIX2", 32.0)
    hdr.set("CRVAL1", 150.1)
    hdr.set("CRVAL2", 2.2)
    s = 0.05 / 3600.0  # 0.05"/px
    hdr.set("CD1_1", -s)
    hdr.set("CD1_2", 0.0)
    hdr.set("CD2_1", 0.0)
    hdr.set("CD2_2", s)
    return hdr, img, ivm


def test_cutout_values_and_origins():
    hdr, img, ivm = _mosaic()
    pos = [(20.0, 30.0), (55.5, 12.2)]
    cs = cutout_stack((hdr, img), ivm, pos, 16)
    assert cs.obs.shape == (2, 16, 16)
    assert cs.num_targets == 2
    for t, (x, y) in enumerate(pos):
        x0, y0 = cs.origins[t]
        np.testing.assert_array_equal(
            cs.obs[t], img[y0 : y0 + 16, x0 : x0 + 16]
        )
        np.testing.assert_array_equal(
            cs.ivm[t], ivm[y0 : y0 + 16, x0 : x0 + 16]
        )
        # the target sits where positions says it does
        np.testing.assert_allclose(
            cs.positions[t] + cs.origins[t], (x, y)
        )
        np.testing.assert_allclose(
            cs.mosaic_xy(t, cs.positions[t]), (x, y)
        )
        # interior targets are centered
        assert np.all(np.abs(cs.positions[t] - 7.5) <= 1.0)
    # the bad mosaic pixel (15, 25) landed in cutout 0 (origin (12, 22))
    assert cs.ivm[0][3, 3] == 0.0
    assert (cs.ivm[0] == 0).sum() == 1


def test_cutout_edge_clamping():
    hdr, img, ivm = _mosaic()
    cs = cutout_stack((hdr, img), ivm, [(2.0, 3.0), (78.0, 62.0)], 20)
    # clamped to the mosaic corner, never out of bounds
    np.testing.assert_array_equal(cs.origins[0], (0, 0))
    np.testing.assert_array_equal(cs.origins[1], (60, 44))
    np.testing.assert_array_equal(cs.obs[0], img[:20, :20])
    np.testing.assert_array_equal(cs.obs[1], img[44:, 60:])
    # in-cutout positions still point at the target
    np.testing.assert_allclose(cs.positions[0], (2.0, 3.0))
    np.testing.assert_allclose(cs.positions[1], (18.0, 18.0))


def test_cutout_wcs_consistency():
    """Cutout headers map cutout pixels to the same sky the mosaic
    maps the corresponding mosaic pixels to."""
    hdr, img, ivm = _mosaic()
    cs = cutout_stack((hdr, img), ivm, [(25.0, 40.0)], 16)
    wm = MiniWCS(hdr)
    wc = MiniWCS(cs.headers[0])
    x0, y0 = cs.origins[0]
    for xp, yp in [(1.0, 1.0), (8.0, 12.0), (16.0, 3.0)]:
        ra_m, dec_m = wm.pixel_to_sky(xp + x0, yp + y0)
        ra_c, dec_c = wc.pixel_to_sky(xp, yp)
        np.testing.assert_allclose(
            (ra_c, dec_c), (ra_m, dec_m), rtol=0, atol=1e-12
        )
    # pixel scale unchanged
    assert wc.pixel_area_deg2() == pytest.approx(wm.pixel_area_deg2())
    assert cs.headers[0]["CUTORIGX"] == x0
    # the mosaic header itself is untouched
    assert hdr["CRPIX1"] == 40.0


def test_cutout_world_positions():
    hdr, img, ivm = _mosaic()
    # sky position of 0-based mosaic pixel (30, 20)
    wm = MiniWCS(hdr)
    ra, dec = wm.pixel_to_sky(31.0, 21.0)
    cs = cutout_stack((hdr, img), ivm, [(ra, dec)], 16, world=True)
    np.testing.assert_allclose(
        cs.positions[0] + cs.origins[0], (30.0, 20.0), atol=1e-6
    )


def test_cutout_validation():
    hdr, img, ivm = _mosaic()
    with pytest.raises(ValueError, match="exceeds"):
        cutout_stack((hdr, img), ivm, [(10, 10)], 100)
    with pytest.raises(ValueError, match="outside"):
        cutout_stack((hdr, img), ivm, [(500.0, 10.0)], 16)
    with pytest.raises(ValueError, match="shapes disagree"):
        cutout_stack((hdr, img), ivm[:32], [(10, 10)], 16)
    with pytest.raises(ValueError, match=r"\(K, 2\)"):
        cutout_stack((hdr, img), ivm, [(1, 2, 3)], 16)


def test_cutout_feeds_configuration():
    """(header, cutout) pairs build a Configuration whose WCS-derived
    pixel area matches the mosaic's (the sbeff derived-trace path)."""
    from psfmc_tpu.io.wcs import proj_plane_pixel_area
    from psfmc_tpu.models.components import Configuration

    hdr, img, ivm = _mosaic()
    cs = cutout_stack((hdr, img), ivm, [(40.0, 30.0)], 24)
    psf = np.zeros((8, 8))
    psf[4, 4] = 1.0
    cfg = Configuration(
        obs_file=(cs.headers[0], cs.obs[0]),
        obsivm_file=cs.ivm[0],
        psf_files=psf,
        psfivm_files=np.full_like(psf, 1e12),
        mag_zeropoint=25.0,
    )
    assert cfg.obs_data.shape == (24, 24)
    got = proj_plane_pixel_area(MiniWCS(cfg.obs_header))
    want = proj_plane_pixel_area(MiniWCS(hdr))
    assert got == pytest.approx(want)
