"""Moffat profile renderer (beyond the reference).

The Moffat (1969) profile

    I(r) = I0 * (1 + (r / alpha)^2)^(-beta)

is the standard analytic model for ground-based PSFs and compact
sources; GALFIT offers it and psfMC users regularly want it for
PSF-model fits, but the reference only ships Sky/PointSource/Sersic
(reference ModelComponents/__init__.py:1-4).  Parameterization follows
this package's Sersic conventions: total ``mag``, semi-major/semi-minor
axis FWHMs (``fwhm >= fwhm_b`` as a joint prior constraint), position
``angle`` with the same +90deg convention, concentration ``index`` =
beta.

Analytic relations (generalized ellipse, semi-axes ``alpha_a``,
``alpha_b``):

    fwhm   = 2 * alpha * sqrt(2^(1/beta) - 1)
    F_tot  = pi * alpha_a * alpha_b * I0 / (beta - 1)      (beta > 1)

so the renderer is exactly flux-normalized with no special functions —
``I0 = F (beta-1) / (pi alpha_a alpha_b)``.  The per-pixel path is the
same fma + accurate-exp/log shape as the Sersic kernel:
``I0 * exp(-beta * log(1 + sq_r))``.  No sub-pixel centroid correction:
the Moffat core is analytic and flat (the Sersic correction exists for
its cusp, reference Sersic.py:129-133).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .coords import mag_to_flux
from .fastmath import exp_log_fns_unsafe

__all__ = [
    "moffat_scalar_params",
    "moffat_profile_core",
    "render_moffat",
    "render_moffat_gen",
]


def moffat_scalar_params(
    xy, mag, fwhm, fwhm_b, index, angle, mag_zp, angle_degrees=False
):
    """The eight per-component scalars the per-pixel path consumes.

    ``(x, y, m00, m01, m10, m11, i0, beta)`` — the inverse
    scale+rotation matrix (in units of the alpha semi-axes) folded into
    four scalars, plus the flux-normalized central surface brightness.
    """
    # alpha from FWHM: fwhm = 2 alpha sqrt(2^(1/beta) - 1)
    s = jnp.sqrt(jnp.exp2(1.0 / index) - 1.0)
    alpha_a = 0.5 * fwhm / s
    alpha_b = 0.5 * fwhm_b / s
    flux = mag_to_flux(mag, mag_zp)
    i0 = flux * (index - 1.0) / (jnp.pi * alpha_a * alpha_b)

    ang = jnp.deg2rad(angle) if angle_degrees else angle
    ang = ang + 0.5 * jnp.pi  # Sersic position-angle convention
    sin_a, cos_a = jnp.sin(ang), jnp.cos(ang)
    return (
        xy[0],
        xy[1],
        cos_a / alpha_a,
        sin_a / alpha_a,
        -sin_a / alpha_b,
        cos_a / alpha_b,
        i0,
        index,
    )


def moffat_profile_core(dx, dy, m00, m01, m10, m11, i0, beta, exp_, log_):
    """Per-pixel Moffat: ``i0 * exp(-beta * log(1 + sq_r))``.

    ``log_`` sees arguments >= 1 (sq_r >= 0), so the accurate-fastmath
    replacement keeps the same ~1-ulp behavior as the Sersic path.
    """
    u = m00 * dx + m01 * dy
    v = m10 * dx + m11 * dy
    sq_r = u * u + v * v
    return i0 * exp_(-beta * log_(1.0 + sq_r))


def render_moffat(
    xg,
    yg,
    xy,
    mag,
    fwhm,
    fwhm_b,
    index,
    angle,
    mag_zp,
    angle_degrees=False,
):
    """Render one Moffat profile over the (H, W) grid (jittable,
    vmappable); the caller accumulates it into the composite model."""
    x, y, m00, m01, m10, m11, i0, beta = moffat_scalar_params(
        xy, mag, fwhm, fwhm_b, index, angle, mag_zp, angle_degrees
    )
    exp_, log_ = exp_log_fns_unsafe()
    return moffat_profile_core(
        xg - x, yg - y, m00, m01, m10, m11, i0, beta, exp_, log_
    )


def render_moffat_gen(
    xg,
    yg,
    xy,
    mag,
    fwhm,
    fwhm_b,
    index,
    angle,
    c0,
    mag_zp,
    angle_degrees=False,
    fourier=(),
    bending=(),
    rotation=None,
    trunc=None,
):
    """Moffat over generalized (boxy/disky/asymmetric) isophotes.

    Same GALFIT-style shape freedom as the Sersic renderer (see
    :mod:`.isophote`): boxiness ``c0``, azimuthal Fourier modes
    ``fourier = ((m, amp, phase), ...)``, bending modes
    ``bending = ((m, amp), ...)`` (flux-exact minor-axis shear) and
    radial truncation ``trunc = (outer, inner)`` with exact flux via
    the device quadrature ratio (see :mod:`.truncation`; radii in
    semi-major ``alpha_a`` pixels), and spiral ``rotation``
    (flux-exact swirl; ``rot_ang`` in ``angle`` units, radii in
    semi-major pixels).  The closed-form flux
    integral only sees the isophote AREA, so replacing ``pi`` in the
    elliptical normalization with :func:`isophote_area_factor` keeps
    ``mag`` the exact total magnitude for any shape:

        ``F = A(c, modes) * alpha_a * alpha_b * I0 / (beta - 1)``.

    Degenerates exactly to :func:`render_moffat` at ``c0 = 0`` with no
    modes.
    """
    from .isophote import generalized_log_sq_radius, isophote_area_factor

    x, y, m00, m01, m10, m11, i0, beta = moffat_scalar_params(
        xy, mag, fwhm, fwhm_b, index, angle, mag_zp, angle_degrees
    )
    c = jnp.asarray(c0) + 2.0
    i0 = i0 * (jnp.pi / isophote_area_factor(c, fourier, angle_degrees))
    exp_, log_ = exp_log_fns_unsafe()
    dx = xg - x
    dy = yg - y
    u = m00 * dx + m01 * dy
    v = m10 * dx + m11 * dy
    if rotation is not None:
        # alpha semi-axes: the scales the m-matrix divides by
        s_r = jnp.sqrt(jnp.exp2(1.0 / beta) - 1.0)
        a_px = 0.5 * fwhm / s_r
        b_px = 0.5 * fwhm_b / s_r
        rot_ang, rot_out, rot_in, rot_pow = rotation
        rot_ang = jnp.deg2rad(rot_ang) if angle_degrees else rot_ang
        rotation = (rot_ang, rot_out, rot_in, rot_pow, a_px, b_px)
    log_sq_r = generalized_log_sq_radius(
        u, v, c, fourier, angle_degrees, exp_, log_, bending, rotation
    )
    # log1p(sq_r) from log(sq_r) without materializing exp twice:
    # sq_r = exp(log_sq_r); the profile needs log(1 + sq_r)
    sq_r = exp_(log_sq_r)
    sb = i0 * exp_(-beta * log_(1.0 + sq_r))
    if trunc is not None:
        from .truncation import moffat_trunc_ratio, truncation_envelope

        outer, inner = trunc
        # alpha_a: the semi-major scale the m-matrix divides by
        s = jnp.sqrt(jnp.exp2(1.0 / beta) - 1.0)
        alpha_a = 0.5 * fwhm / s
        sb = sb * (
            moffat_trunc_ratio(beta, alpha_a, outer, inner)
            * truncation_envelope(
                exp_(0.5 * log_sq_r) * alpha_a, outer, inner
            )
        )
    return sb
