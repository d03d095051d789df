"""Point-source (delta function) renderer with sub-pixel shift kernels.

Parity with the reference
(``/root/reference/psfMC/ModelComponents/PointSource.py:24-97``):

* ``lanczos3`` (default): separable 7x7 Lanczos a=3 window,
* ``bilinear``: standard 2x2 linear-interpolation split,
* the window is positioned from the *clipped* position (kept in-bounds)
  but kernel weights are evaluated against the *true* sub-pixel position,
  exactly like the reference's ``minimal_slice``.

TPU-first design notes
----------------------
The reference computes a variable-size slice per sample; under ``jit``
shapes must be static, so the window is a fixed ``(W, W)`` block placed
with ``lax.dynamic_update_slice`` — a single small scatter per point
source, fully vmappable over walkers.

Documented divergences (all measure-zero or edge-of-image):
* numpy's round-half-to-even can make the reference window 1 px larger at
  exact half-integer positions (weights there are 0); the fixed window
  places identical flux.
* at the extreme clip boundary the reference's slice can overrun the array
  and is silently truncated by numpy (losing flux); we clamp the window
  start so the full kernel always lands in-bounds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import mag_to_flux

__all__ = ["sinc", "lanczos", "render_pointsource", "add_pointsource", "window_size"]

_RADII = {"bilinear": 0.5, "lanczos3": 3.0}
_WINDOW = {"bilinear": 2, "lanczos3": 7}


def window_size(method):
    return _WINDOW[method]


def sinc(x):
    """sin(pi x)/(pi x) with value 1 at 0 (reference PointSource.py:84-88)."""
    px = jnp.pi * x
    return jnp.where(x != 0, jnp.sin(px) / jnp.where(px != 0, px, 1.0), 1.0)


def lanczos(x, a):
    """1-D Lanczos kernel (reference PointSource.py:91-97)."""
    return jnp.where(jnp.abs(x) < a, sinc(x) * sinc(x / a), 0.0)


def _kernel_1d(win_coords, center, method):
    d = win_coords - center
    if method == "bilinear":
        return jnp.maximum(1.0 - jnp.abs(d), 0.0)
    elif method == "lanczos3":
        return lanczos(d, 3.0)
    raise ValueError(f"Unknown shift method: {method}")


def add_pointsource(img, xy, mag, mag_zp, method="lanczos3"):
    """Scatter a point source into ``img`` (jittable; static method/shape).

    ``xy`` is (x, y) in 0-based pixel coordinates (numpy convention, like
    the reference).  Returns the updated image.
    """
    if method not in _RADII:
        raise ValueError(f"Unknown shift method: {method}")
    r = _RADII[method]
    w = _WINDOW[method]
    h, ww = img.shape
    dtype = img.dtype

    x, y = xy[0], xy[1]
    # Clip position so the window fits (reference minimal_slice semantics),
    # yx order for array indexing.
    cy = jnp.clip(y, r - 0.5, h - (r + 0.5))
    cx = jnp.clip(x, r - 0.5, ww - (r + 0.5))
    y0 = jnp.clip(jnp.round(cy - r).astype(jnp.int32), 0, h - w)
    x0 = jnp.clip(jnp.round(cx - r).astype(jnp.int32), 0, ww - w)

    offs = jnp.arange(w, dtype=dtype)
    ky = _kernel_1d(y0.astype(dtype) + offs, y, method)
    kx = _kernel_1d(x0.astype(dtype) + offs, x, method)
    flux = mag_to_flux(mag, mag_zp)
    kern = (flux * ky[:, None] * kx[None, :]).astype(dtype)

    patch = jax.lax.dynamic_slice(img, (y0, x0), (w, w))
    return jax.lax.dynamic_update_slice(img, patch + kern, (y0, x0))


def render_pointsource(shape, xy, mag, mag_zp, method="lanczos3", dtype=jnp.float32):
    """Render a lone point source on a zero background."""
    return add_pointsource(jnp.zeros(shape, dtype), xy, mag, mag_zp, method)


def render_pointsource_dense(
    shape, xy, mag, mag_zp, method="lanczos3", dtype=jnp.float32
):
    """Point source as a separable rank-1 outer product (the TPU path).

    The shift kernels are separable, so the full image is
    ``flux * ky(j - y) ⊗ kx(i - x)`` with the 1-D kernels evaluated on
    the whole axis (zero outside their support).  Identical values to
    :func:`add_pointsource` on every in-bounds pixel — the window
    bookkeeping becomes unnecessary — but it replaces the vmapped
    ``dynamic_update_slice`` (a scatter, ~0.7 ms per 125-walker
    half-step on v5e) with two 128-point kernel evaluations and one
    broadcast multiply (~0.02 ms).
    """
    if method not in _RADII:
        raise ValueError(f"Unknown shift method: {method}")
    h, w = shape
    rows = jnp.arange(h, dtype=dtype)
    cols = jnp.arange(w, dtype=dtype)
    ky = _kernel_1d(rows, jnp.asarray(xy[1], dtype), method)
    kx = _kernel_1d(cols, jnp.asarray(xy[0], dtype), method)
    flux = mag_to_flux(mag, mag_zp)
    return (flux * ky)[:, None] * kx[None, :]
