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
