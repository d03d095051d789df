"""ds9 region parser + rasterizer tests."""
import os

import numpy as np

from psfmc_tpu.io.region import parse_region_file, region_mask


def test_parse_shapes():
    text = """# Region file format: DS9 version 4.1
global color=green
image
circle(10,12,5)
-circle(20,20,3)
ellipse(5,5,4,2,30)
box(8,8,6,4,0)
"""
    shapes = parse_region_file(text)
    assert [s.shape for s in shapes] == ["circle", "circle", "ellipse", "box"]
    assert [s.exclude for s in shapes] == [False, True, False, False]


def test_circle_mask_geometry():
    text = "image\ncircle(16,16,5)\n"
    mask = region_mask(text, (32, 32))
    # ds9 1-based: center (16,16) -> array index [15,15]
    assert mask[15, 15]
    assert not mask[15, 25]
    # area approximates pi r^2
    assert abs(mask.sum() - np.pi * 25) < 12


def test_include_exclude_combination():
    text = "image\ncircle(16,16,10)\n-circle(16,16,3)\n"
    mask = region_mask(text, (32, 32))
    assert not mask[15, 15]  # carved out by exclusion
    assert mask[15, 20]  # in annulus
    assert not mask[15, 28]  # outside include


def test_exclude_only_defaults_to_all_inside():
    text = "image\n-circle(16,16,5)\n"
    mask = region_mask(text, (32, 32))
    assert not mask[15, 15]
    assert mask[0, 0]


def test_reference_mask_file(reference_dir):
    """The real J0005-0006 ds9 mask: 1 include + 3 exclude circles."""
    path = os.path.join(reference_dir, "examples/mask_J0005-0006.reg")
    shapes = parse_region_file(path)
    assert len(shapes) == 4
    assert sum(s.exclude for s in shapes) == 3
    mask = region_mask(path, (128, 128))
    # center of the include circle (64.5, 64.1) is inside
    assert mask[63, 63]
    # center of the first exclude circle (111.4, 58.9) is excluded
    assert not mask[58, 110]
    # far corner outside the include circle is excluded
    assert not mask[0, 127]
    # sane fraction of the image is fit region
    frac = mask.mean()
    assert 0.4 < frac < 0.65


# -- polygon regions (reference accepts any pyregion shape, utils.py:82-103) --


def test_polygon_square_matches_box():
    """An axis-aligned square polygon equals the equivalent box region."""
    # vertices chosen so no 1-based pixel center lies exactly on an
    # edge (boundary semantics would otherwise be comparison-ambiguous)
    poly = "image\npolygon(9.7,7.7,22.3,7.7,22.3,18.3,9.7,18.3)\n"
    box = "image\nbox(16,13,12.6,10.6,0)\n"
    np.testing.assert_array_equal(
        region_mask(poly, (32, 32)), region_mask(box, (32, 32))
    )


def test_polygon_concave_matches_matplotlib_path():
    """Concave (L-shaped) polygon vs matplotlib's independent even-odd
    rasterizer over the same 1-based pixel centers."""
    from matplotlib.path import Path

    verts = [(4.3, 4.2), (24.6, 4.2), (24.6, 12.4), (14.2, 12.4),
             (14.2, 24.7), (4.3, 24.7)]
    text = "image\npolygon(" + ",".join(
        f"{x},{y}" for x, y in verts
    ) + ")\n"
    mask = region_mask(text, (30, 30))

    yg, xg = np.mgrid[1:31, 1:31].astype(float)
    pts = np.column_stack([xg.ravel(), yg.ravel()])
    expected = Path(verts).contains_points(pts).reshape(30, 30)
    np.testing.assert_array_equal(mask, expected)


def test_polygon_self_intersecting_even_odd():
    """Bow-tie polygon: the crossing region is counted even-odd, so the
    two triangles fill and their shared center does per the ds9 rule."""
    text = "image\npolygon(2.2,2.2,18.6,18.6,2.2,18.6,18.6,2.2)\n"
    mask = region_mask(text, (20, 20))
    # vertex order (a, c, b, d) draws an hourglass pinched at the
    # center: top + bottom triangles fill, the waist sides do not
    assert mask[3, 9]       # top triangle interior
    assert mask[16, 9]      # bottom triangle interior
    assert not mask[9, 3]   # left of the waist, between the triangles
    assert not mask[9, 16]  # right of the waist


def test_polygon_include_exclude_composition():
    """Include polygon minus exclude circle composes like pyregion."""
    text = (
        "image\n"
        "polygon(4.2,4.2,28.7,4.2,28.7,28.7,4.2,28.7)\n"
        "-circle(16,16,5)\n"
    )
    mask = region_mask(text, (32, 32))
    assert mask[5, 5]          # inside polygon, outside circle
    assert not mask[15, 15]    # carved out by the exclude circle
    assert not mask[0, 0]      # outside the include polygon
    assert not mask[31, 31]


def test_polygon_sky_coordinates():
    """fk5 polygon vertices map through the WCS to the same pixels."""
    SCALE = 0.05 / 3600.0
    hdr = {
        "CRPIX1": 16.0,
        "CRPIX2": 16.0,
        "CRVAL1": 150.1,
        "CRVAL2": 2.2,
        "CD1_1": -SCALE,
        "CD1_2": 0.0,
        "CD2_1": 0.0,
        "CD2_2": SCALE,
    }
    from psfmc_tpu.io.wcs import MiniWCS

    w = MiniWCS(hdr)
    # a pixel-space square (no pixel center on an edge, so roundtrip
    # rounding cannot flip boundary pixels), converted to sky vertices
    px_verts = [(8.4, 8.4), (23.6, 8.4), (23.6, 23.6), (8.4, 23.6)]
    sky = [w.pixel_to_sky(x, y) for x, y in px_verts]
    text = "fk5\npolygon(" + ",".join(
        f"{float(ra):.10f},{float(dec):.10f}" for ra, dec in sky
    ) + ")\n"
    mask = region_mask(text, (32, 32), header=hdr)
    expected = region_mask(
        "image\npolygon(8.4,8.4,23.6,8.4,23.6,23.6,8.4,23.6)\n", (32, 32)
    )
    np.testing.assert_array_equal(mask, expected)


def test_polygon_too_few_vertices_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        region_mask("image\npolygon(2,2,8,8)\n", (16, 16))


# ---------------------------------------------------------------------------
# Automatic neighbor masking (io.make_source_mask, beyond the reference)


def _mock_field(rng, h=64, w=64, noise=1.0):
    """Noise field + target blob at center + neighbor blob + hot pixel."""
    yy, xx = np.mgrid[0:h, 0:w].astype(float)

    def blob(x0, y0, peak, sig):
        return peak * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2)
                             / (2 * sig**2))

    img = rng.randn(h, w) * noise
    img += blob(31.5, 31.5, 40.0, 2.5)   # the target
    img += blob(45.0, 18.0, 30.0, 2.0)   # a contaminating neighbor
    img[50, 5] = 100.0                   # single hot pixel
    return img


def test_make_source_mask_masks_neighbor_not_target():
    import pytest

    from psfmc_tpu.io.preprocess import make_source_mask

    rng = np.random.RandomState(42)
    img = _mock_field(rng)
    mask = make_source_mask(img, nsigma=3.0, npixels=5, grow=2)

    assert mask[18, 45]          # neighbor core excluded
    assert not mask[31, 31]      # target core kept
    assert not mask[32, 32]
    assert not mask[50, 5]       # hot single pixel: IVM's job, not ours
    # background mostly untouched
    assert mask.mean() < 0.10
    # grow widens the exclusion
    m0 = make_source_mask(img, nsigma=3.0, npixels=5, grow=0)
    assert mask.sum() > m0.sum()
    # explicit target selection: center on the NEIGHBOR instead
    m2 = make_source_mask(img, target_xy=(45.0, 18.0))
    assert not m2[18, 45] and m2[31, 31]
    # shape-mismatched ndarray masks are rejected downstream
    from psfmc_tpu.io.preprocess import mask_from_file

    with pytest.raises(ValueError, match="shape"):
        mask_from_file(mask[:32], None, img.shape)


def test_source_mask_feeds_configuration():
    """An in-memory mask array flows through Configuration like a
    mask file: masked pixels become bad pixels (excluded from the
    likelihood), untouched variance elsewhere."""
    from psfmc_tpu.io.preprocess import make_source_mask
    from psfmc_tpu.models.components import Configuration

    rng = np.random.RandomState(7)
    img = _mock_field(rng)
    ivm = np.ones_like(img)
    mask = make_source_mask(img, ivm=ivm)
    psf = np.zeros((8, 8))
    psf[3:5, 3:5] = 0.25
    cfg = Configuration(
        obs_file=img,
        obsivm_file=ivm,
        psf_files=psf,
        psfivm_files=np.full_like(psf, 1e10),
        mask_file=mask,
        mag_zeropoint=25.0,
    )
    bad = np.asarray(cfg.bad_px)
    assert bad[18, 45] and not bad[31, 31]
    assert np.all(bad[mask])


def test_unsupported_frame_is_a_hard_error():
    """Silently mis-framing a galactic-coordinate mask would corrupt
    the fit; the parser must name the frame instead (round-3 verdict
    item 7; reference delegates frame conversion to pyregion)."""
    import pytest

    from psfmc_tpu.io.region import parse_region_file

    with pytest.raises(ValueError, match="galactic"):
        parse_region_file("galactic\ncircle(10,10,5)\n")
    with pytest.raises(ValueError, match="ecliptic"):
        parse_region_file("ecliptic\ncircle(10,10,5)\n")


def test_unsupported_shape_is_a_hard_error():
    import pytest

    from psfmc_tpu.io.region import parse_region_file

    for shape in ("panda", "epanda", "pie", "vector"):
        with pytest.raises(ValueError, match=shape):
            parse_region_file(f"image\n{shape}(10,10,5,6,7)\n")


def test_unparseable_shape_line_is_a_hard_error():
    import pytest

    from psfmc_tpu.io.region import parse_region_file

    with pytest.raises(ValueError, match="unparseable"):
        parse_region_file("image\ncircle(10,10\n")


def test_non_tan_wcs_warns():
    import pytest

    from psfmc_tpu.io.wcs import MiniWCS

    hdr = {
        "CTYPE1": "RA---SIN", "CTYPE2": "DEC--SIN",
        "CRPIX1": 1.0, "CRPIX2": 1.0,
        "CRVAL1": 10.0, "CRVAL2": -5.0,
        "CD1_1": -1e-5, "CD1_2": 0.0, "CD2_1": 0.0, "CD2_2": 1e-5,
    }
    with pytest.warns(UserWarning, match="TAN"):
        MiniWCS(hdr)
    # SIP suffix warns about ignored distortions
    hdr2 = dict(hdr, CTYPE1="RA---TAN-SIP", CTYPE2="DEC--TAN-SIP")
    with pytest.warns(UserWarning, match="SIP"):
        MiniWCS(hdr2)
    # plain TAN stays silent
    import warnings

    hdr3 = dict(hdr, CTYPE1="RA---TAN", CTYPE2="DEC--TAN")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        MiniWCS(hdr3)


def test_bad_region_mask_file_is_a_hard_error_in_preprocess():
    """mask_from_file must not degrade to 'no mask' when the region
    file is unsupported — which pixels constrain the fit would change
    silently (round-3 verdict item 7)."""
    import pytest

    from psfmc_tpu.io.preprocess import mask_from_file

    with pytest.raises(ValueError, match="galactic"):
        mask_from_file("galactic\ncircle(10,10,5)\n", None, (16, 16))
