"""PointSource sub-pixel shift parity (the reference's hard-assert test,
reference tests/test_components.py:121-144)."""
import numpy as np
import pytest
from scipy.ndimage import shift

import jax.numpy as jnp

from psfmc_tpu.ops.pointsource import add_pointsource, render_pointsource

PSF_REF_SHIFT = np.array((2.2, 2.7))


def test_bilinear_matches_scipy_ndimage_shift():
    refarr = np.zeros((5, 5))
    refarr[1, 1] = 1.0
    # scipy shift is (row, col): reverse the xy order like the reference
    refarr = shift(refarr, PSF_REF_SHIFT[::-1] - 1, order=1)

    test = np.asarray(
        render_pointsource(
            (5, 5), jnp.asarray(PSF_REF_SHIFT), 0.0, 0.0, "bilinear",
            dtype=jnp.float64,
        )
    )
    assert np.allclose(refarr, test)


@pytest.mark.parametrize("method", ["bilinear", "lanczos3"])
def test_flux_conservation_interior(method):
    img = np.asarray(
        render_pointsource(
            (64, 64), jnp.asarray([31.3, 29.8]), 20.0, 25.0, method,
            dtype=jnp.float64,
        )
    )
    flux = 10 ** (-0.4 * (20.0 - 25.0))
    # lanczos3 truncation loses a tiny amount of flux; bilinear is exact
    tol = 1e-12 if method == "bilinear" else 2e-2
    assert np.abs(img.sum() - flux) / flux < tol


def test_integer_position_is_delta():
    img = np.asarray(
        render_pointsource((9, 9), jnp.asarray([4.0, 3.0]), 0.0, 0.0,
                           "lanczos3", dtype=jnp.float64)
    )
    assert img[3, 4] == pytest.approx(1.0, abs=1e-12)
    assert np.abs(img).sum() == pytest.approx(1.0, abs=1e-12)


@pytest.mark.parametrize("method", ["bilinear", "lanczos3"])
def test_edge_clipping_in_bounds(method):
    """Out-of-image positions never crash or scatter out of bounds.

    Far-outside sources render zero flux (the window is clipped but the
    kernel is evaluated at the true position — unlike the reference,
    whose unclamped bilinear weights go negative there); near-edge
    sources keep their in-bounds flux fraction.
    """
    for xy in ([-5.0, -7.0], [100.0, 3.0], [63.9, 63.9]):
        img = np.asarray(
            render_pointsource((64, 64), jnp.asarray(xy), 20.0, 25.0, method,
                               dtype=jnp.float64)
        )
        assert np.all(np.isfinite(img))
        assert img.sum() >= 0
    near_edge = np.asarray(
        render_pointsource((64, 64), jnp.asarray([62.7, 60.2]), 20.0, 25.0,
                           method, dtype=jnp.float64)
    )
    assert near_edge.sum() > 0


def test_add_accumulates():
    base = render_pointsource((16, 16), jnp.asarray([8.0, 8.0]), 0.0, 0.0,
                              "bilinear", dtype=jnp.float64)
    both = add_pointsource(base, jnp.asarray([4.0, 4.0]), 0.0, 0.0, "bilinear")
    assert np.asarray(both).sum() == pytest.approx(2.0, abs=1e-12)


def test_dense_matches_scatter():
    """The rank-1 dense renderer equals the windowed scatter everywhere,
    including positions near (and clipped at) the image edge."""
    from psfmc_tpu.ops.pointsource import render_pointsource_dense

    shape = (32, 24)
    for method in ("lanczos3", "bilinear"):
        for xy in [(11.3, 7.8), (0.4, 0.2), (23.1, 31.6), (12.0, 16.0),
                   (2.5, 29.5)]:
            a = np.asarray(
                render_pointsource(shape, jnp.asarray(xy), 20.0, 25.0,
                                   method)
            )
            b = np.asarray(
                render_pointsource_dense(shape, jnp.asarray(xy), 20.0,
                                         25.0, method)
            )
            assert np.allclose(a, b, atol=1e-5), (method, xy)
            assert abs(float(a.sum() - b.sum())) < 1e-4  # f32 reduce
