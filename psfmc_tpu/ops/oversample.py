"""Sub-pixel oversampled rendering of profile components (beyond the
reference — GALFIT's sub-pixel integration analogue).

Both the reference renderer (/root/reference/psfMC/ModelComponents/
Sersic.py:129-138) and this package's default path point-sample the
surface-brightness profile at pixel centers with a first-order trapezoid
centroid correction.  For compact profiles (Sersic reff of a few pixels,
narrow Moffat cores) the residual pixel-integration error is ~1-2% of
total flux concentrated in the central pixels — a real bias when fitting
marginally-resolved hosts under a quasar.

``Configuration(render_oversample=S, oversample_window=W)`` fixes it the
way GALFIT does, restricted to where it matters: a ``W x W`` pixel
window centered on each profile component is re-rendered on an ``S``
times finer midpoint grid, flux-averaged back to native pixels, and the
difference to the point-sampled values is applied in place.  Outside the
window (where the profile varies slowly across a pixel) the standard
point-sampled render is already accurate.

TPU-first design notes
----------------------
* **Static shapes everywhere.**  The window size is a compile-time
  constant; only its *origin* is data-dependent.  The window rides
  ``lax.dynamic_slice`` / ``dynamic_update_slice`` (one gather + one
  scatter of a small static block per component), never boolean masks
  or dynamic shapes that would break XLA tiling.
* **Fine grid as an outer broadcast.**  Sub-pixel coordinates are built
  as ``(W*S, 1) x (1, W*S)`` column/row vectors; the profile callbacks
  broadcast them to the fine block themselves, so the only materialized
  arrays are the ``(W*S, W*S)`` fine block and its ``(W, W)`` binning
  (a reshape + mean — XLA fuses the whole chain into the render).
* **Branchless + differentiable.**  The window origin is rounded and
  clamped in-bounds with ``stop_gradient`` (the O(ulp) edge
  discontinuity when a window shifts by one pixel is far below sampler
  noise); everything inside the window keeps exact gradients for
  NUTS/MAP.
* The fine samples evaluate the profile WITHOUT the trapezoid
  correction (``correction=False``): the correction approximates pixel
  integration, which the sub-pixel average now does properly — keeping
  it would double-count curvature.  The coarse values subtracted are
  exactly (bitwise) what the full-frame render added, so the composite
  equals "full-frame point-sampled render with the window replaced by
  the integrated values".
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["window_origin", "oversampled_window_delta", "apply_window_delta"]


def window_origin(xy, window, render_shape, pad):
    """Clamped integer (row, col) origin of the window on the render grid.

    ``xy`` is the component center in observation-pixel coordinates (the
    same convention the render grids use: the padded grid spans
    ``[-pad, shape+pad)``).  Out-of-support proposals (NaN center) still
    produce an in-range origin — the prior gate rejects them upstream,
    the render must merely stay finite-shaped.
    """
    h, w = render_shape
    win = int(window)
    half = win // 2
    # cast BEFORE clip: int32(NaN) is some finite value, clip bounds it
    cx = jnp.round(xy[0]).astype(jnp.int32) + pad - half
    cy = jnp.round(xy[1]).astype(jnp.int32) + pad - half
    ox = jnp.clip(cx, 0, w - win)
    oy = jnp.clip(cy, 0, h - win)
    return jax.lax.stop_gradient(oy), jax.lax.stop_gradient(ox)


def oversampled_window_delta(
    profile_coarse,
    profile_fine,
    origin,
    window,
    oversample,
    pad,
    dtype,
):
    """``(W, W)`` correction: midpoint-integrated minus point-sampled.

    :param profile_coarse: ``f(xg, yg) -> SB`` exactly as the full-frame
        render evaluates it (trapezoid correction included) — broadcast
        over ``xg`` of shape (1, W) and ``yg`` of shape (W, 1).
    :param profile_fine: same profile WITHOUT the sub-pixel correction,
        evaluated on the fine grid.
    :param origin: (row, col) from :func:`window_origin`.
    :param pad: conv_pad of the render grid (grid coordinate of index
        ``i`` is ``i - pad``).
    """
    win = int(window)
    s = int(oversample)
    oy, ox = origin
    xs = (ox - pad) + jnp.arange(win, dtype=dtype)  # (W,) obs coords
    ys = (oy - pad) + jnp.arange(win, dtype=dtype)
    coarse = profile_coarse(xs[None, :], ys[:, None])

    # midpoint sub-samples: pixel center c covers [c-1/2, c+1/2); the
    # k-th of S samples sits at c + (k + 1/2)/S - 1/2
    sub = (jnp.arange(s, dtype=dtype) + 0.5) / s - 0.5
    xf = (xs[:, None] + sub[None, :]).reshape(-1)  # (W*S,)
    yf = (ys[:, None] + sub[None, :]).reshape(-1)
    fine = profile_fine(xf[None, :], yf[:, None])  # (W*S, W*S)
    binned = fine.reshape(win, s, win, s).mean(axis=(1, 3))
    return (binned - coarse).astype(dtype)


def apply_window_delta(raw, delta, origin):
    """Add the window correction into the full render in place."""
    oy, ox = origin
    win = jax.lax.dynamic_slice(raw, (oy, ox), delta.shape)
    return jax.lax.dynamic_update_slice(raw, win + delta, (oy, ox))
