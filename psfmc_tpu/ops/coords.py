"""Coordinate grids and photometric conversions.

TPU-first design notes
----------------------
The reference (``/root/reference/psfMC/utils.py:35-42``) represents pixel
coordinates as an ``(N, 2)`` float64 array of ``(x, y)`` pairs and every
component renderer consumes that flat list.  On TPU that layout is hostile:
the trailing dimension of 2 wastes the 128-wide lane dimension and forces
gathers.  Here the canonical representation is a pair of 2-D ``(H, W)``
grids ``(xg, yg)`` which map directly onto VPU tiles and let every renderer
stay fully vectorized.  ``array_coords`` is retained for API compatibility
and for tests that compare against the reference conventions.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["array_coords", "coord_grids", "mag_to_flux"]


def array_coords(shape):
    """(H*W, 2) array of (x, y) pixel-center coordinates, row-major.

    API-compatible with the reference ``utils.array_coords``
    (reference utils.py:35-42): index ``i`` maps to ``(i % W, i // W)``.
    Returned as float64 numpy (host-side helper).
    """
    h, w = shape
    idx = np.arange(h * w)
    return np.stack([idx % w, idx // w], axis=1).astype(np.float64)


def coord_grids(shape, dtype=jnp.float32):
    """Return (xg, yg) 2-D pixel-center coordinate grids of ``shape``.

    ``xg[j, i] == i`` and ``yg[j, i] == j`` — identical coordinate
    convention to the reference's flat coords array, but laid out as two
    dense 2-D planes for TPU-friendly elementwise math.
    """
    h, w = shape
    yg = jnp.arange(h, dtype=dtype)[:, None] * jnp.ones((1, w), dtype)
    xg = jnp.ones((h, 1), dtype) * jnp.arange(w, dtype=dtype)[None, :]
    return xg, yg


_LN10 = 2.302585092994046


def mag_to_flux(mag, mag_zp):
    """Total flux for a magnitude relative to zeropoint.

    Matches reference utils.py:160-164: ``10 ** (-0.4 * (mag - mag_zp))``.
    Works on numpy or jax inputs; under a jax trace the power runs
    through the accurate software exp (TPU's hw f32 exp is ~6e-6 rel,
    see ops.fastmath).
    """
    arg = -0.4 * (mag - mag_zp)
    if isinstance(arg, (np.ndarray, np.generic, float, int)):
        return 10.0**arg  # host-side numpy path (spec building, tests)
    from .fastmath import exp_log_fns

    exp_, _ = exp_log_fns()
    return exp_(_LN10 * arg)
