"""Sersic surface-brightness profile renderer (pure JAX, TPU hot kernel).

Behavioral parity with the reference renderer
(``/root/reference/psfMC/ModelComponents/Sersic.py:47-153``):

* exact ``kappa = gammaincinv(2n, 1/2)`` (Ciotti & Bertin 1999),
* surface brightness at ``r_e`` from total flux:
  ``flux / (pi * reff * reff_b * 2n * exp(kappa - 2n ln kappa) * Γ(2n))``,
* generalized-ellipse square radii from the inverse scale+rotation matrix,
  with the reference's "+90 degrees" position-angle convention (PA is CCW
  of up, not of +x),
* profile ``exp(-kappa * expm1(log(r^2) * 0.5/n))`` (sqrt folded into the
  power, ``exp(log(a) * b)`` form),
* first-order sub-pixel centroid correction
  ``sb * (1 + g^2 * sq_delta_r / 12)`` where ``g`` is the normalized radial
  gradient — a 1-D pixel-sized trapezoid correction.

TPU-first design notes
----------------------
The reference evaluates over an ``(N, 2)`` flat coordinate list with a
2x2 matmul; here everything is dense elementwise math over the 2-D
``(H, W)`` grids so XLA fuses the full chain (offsets → radii → exp/log →
correction → accumulate) into a single VPU loop over 8x128 tiles, with the
walker batch dimension added by ``vmap``.  No gathers, no dynamic shapes.

Numerical guard (documented divergence): exact pixel-center hits make the
reference produce ``log(0) = -inf`` and then ``0/0 = NaN`` in the centroid
correction, poisoning the whole likelihood (its acknowledged FIXME at
models.py:239).  We clamp both square radii and square offsets to a tiny
positive floor, so exact hits render finite values instead of rejecting
the sample.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
from jax.scipy.special import gammaln

from .coords import mag_to_flux
from .fastmath import exp_log_fns, exp_log_fns_unsafe, fast_recip
from .gammainc import gammaincinv_half, gammaincinv_half_table

__all__ = [
    "sersic_kappa",
    "sersic_sb_eff",
    "sersic_sq_radii",
    "sersic_scalar_params",
    "sersic_profile_core",
    "render_sersic",
    "sersic_gen_area_factor",
    "render_sersic_gen",
]

_TINY = 1e-30


def sersic_kappa(index, mode="exact"):
    """Sersic scaling constant b_n (reference Sersic.py:47-53).

    ``mode='exact'`` solves ``gammaincinv(2n, 1/2)`` by Newton iteration;
    ``mode='table'`` interpolates a precomputed exact table (<1e-7 rel
    error over the physical index range, ~1e-6 at the table edges) and
    avoids the serial ``igamma`` chain on the sampling hot path (see
    ops.gammainc).
    """
    a = 2.0 * jnp.asarray(index)
    if mode == "table":
        return gammaincinv_half_table(a)
    return gammaincinv_half(a)


def sersic_sb_eff(flux_tot, index, reff, reff_b, kappa=None):
    """Surface brightness (flux/pixel) at the effective radius.

    Matches reference Sersic.py:55-71. ``gamma(2n)`` is computed as
    ``exp(gammaln(2n))`` (jax has no gamma; 2n > 0 always here).
    """
    if kappa is None:
        kappa = sersic_kappa(index)
    exp_, log_ = exp_log_fns()
    two_n = 2.0 * index
    gamma_2n = exp_(gammaln(two_n))
    return flux_tot / (
        jnp.pi
        * reff
        * reff_b
        * two_n
        * exp_(kappa - log_(kappa) * two_n)
        * gamma_2n
    )


def sersic_sq_radii(xg, yg, x, y, reff, reff_b, angle, angle_degrees=False):
    """Generalized-ellipse square radii and normalized square offsets.

    Returns ``(sq_radii, sq_delta_r)`` over the pixel grid, where
    ``sq_delta_r = sq_radii / (dx^2 + dy^2)`` feeds the centroid
    correction.  Parity with reference Sersic.py:73-96 including the
    +90deg position-angle rotation.
    """
    ang = jnp.deg2rad(angle) if angle_degrees else angle
    ang = ang + 0.5 * jnp.pi
    sin_a, cos_a = jnp.sin(ang), jnp.cos(ang)

    dx = xg - x
    dy = yg - y
    u = (cos_a * dx + sin_a * dy) / reff
    v = (-sin_a * dx + cos_a * dy) / reff_b
    sq_r = u * u + v * v
    sq_off = dx * dx + dy * dy
    sq_dr = sq_r / jnp.maximum(sq_off, _TINY)
    return jnp.maximum(sq_r, _TINY), sq_dr


def sersic_scalar_params(
    xy,
    mag,
    reff,
    reff_b,
    index,
    angle,
    mag_zp,
    angle_degrees=False,
    kappa_mode="exact",
):
    """The nine per-component scalars the per-pixel profile consumes.

    ``(x, y, m00, m01, m10, m11, kappa, radius_pow, sbeff)`` — the
    inverse scale+rotation matrix folded into four scalars so the
    per-pixel path is pure fma (divisions are many-cycle VPU ops).
    Shared by the XLA renderer and the Pallas kernel's host-side packer.
    """
    kappa = sersic_kappa(index, mode=kappa_mode)
    flux_tot = mag_to_flux(mag, mag_zp)
    sbeff = sersic_sb_eff(flux_tot, index, reff, reff_b, kappa)
    ang = jnp.deg2rad(angle) if angle_degrees else angle
    ang = ang + 0.5 * jnp.pi
    sin_a, cos_a = jnp.sin(ang), jnp.cos(ang)
    return (
        xy[0],
        xy[1],
        cos_a / reff,
        sin_a / reff,
        -sin_a / reff_b,
        cos_a / reff_b,
        kappa,
        0.5 / index,
        sbeff,
    )


def sersic_profile_core(dx, dy, m00, m01, m10, m11, kappa, rp, sbeff,
                        exp_, log_, correction=True):
    """Per-pixel Sersic surface brightness from pixel offsets + scalars.

    The single definition of the profile math, consumed by both the XLA
    renderer (:func:`render_sersic`) and the Pallas kernel
    (:mod:`..pallas.sersic_pallas`).

    Algebraic form of the reference math (Sersic.py:111-153) minimizing
    transcendental count on the VPU.  With ``p = (r^2)^(1/2n)``::

        sb   = exp(-kappa * (p - 1))
        corr = 1 + grad^2 * (r^2 / off^2) / 12

    and ``grad = -2 kappa rp p / r``, so ``grad^2 r^2`` cancels the
    sqrt: ``corr = 1 + (kappa rp p)^2 / (3 off^2)``.

    The first-order centroid correction diverges as the pixel-center
    distance -> 0 for n > 1 (the reference NaNs at exact hits — its
    acknowledged cusp weakness, models.py:239).  Clamping the square
    offset at the half-pixel corner distance (0.5^2/2) saturates the
    correction at its largest *valid* value: the nearest pixel center of
    any legitimate sub-pixel position is >= 0.354 px away in the worst
    case (documented divergence, README "Differences from the
    reference").

    ``exp_``/``log_`` are injected so each caller picks the
    backend-appropriate implementations once at trace time (TPU hardware
    f32 log/exp are too coarse for this likelihood — see ops.fastmath).

    ``correction=False`` returns the bare point-sampled profile — the
    form the sub-pixel oversampler integrates (the trapezoid term is a
    *substitute* for integration; fine samples must not double-apply it,
    see :mod:`.oversample`).
    """
    u = m00 * dx + m01 * dy
    v = m10 * dx + m11 * dy
    sq_r = jnp.maximum(u * u + v * v, _TINY)
    p = exp_(log_(sq_r) * rp)
    sb = exp_(-kappa * (p - 1.0))
    if not correction:
        return sbeff * sb
    sq_off = jnp.maximum(dx * dx + dy * dy, 0.125)
    krp_p = kappa * rp * p
    # PSFMC_CORR_RECIP=1: Newton-reciprocal correction divide
    # (ops.fastmath.fast_recip, ~7e-6 rel on a CORRECTION term).
    # Stage-level it wins big (0.041 vs 0.110 ms/iter scan-timed
    # render, v5e 2026-08-20) but END-TO-END it is exact parity
    # (ab_corr_recip.py, 10 interleaved reps: best 0.558 vs 0.557 s,
    # median 0.593 vs 0.596) — XLA hides the divide latency across
    # the fused batch.  Default stays the exact hardware divide;
    # the knob and tools record the closed experiment (the 7th
    # measured micro-variant, same fate as the six Pallas kernels).
    if os.environ.get("PSFMC_CORR_RECIP", "0") == "1":
        # fast_recip falls through to the hardware divide for non-f32
        corr = 1.0 + (krp_p * krp_p) * (1.0 / 3.0) * fast_recip(sq_off)
    else:
        corr = 1.0 + (krp_p * krp_p) / (3.0 * sq_off)
    return sbeff * sb * corr


def sersic_gen_area_factor(c):
    """Superellipse area factor (see :mod:`.isophote`); pi at c=2."""
    from .isophote import superellipse_area_factor

    return superellipse_area_factor(c)


def render_sersic_gen(
    xg,
    yg,
    xy,
    mag,
    reff,
    reff_b,
    index,
    angle,
    c0,
    mag_zp,
    angle_degrees=False,
    kappa_mode="exact",
    fourier=(),
    bending=(),
    rotation=None,
    trunc=None,
    correction=True,
):
    """Sersic profile over generalized (boxy/disky/asymmetric) isophotes.

    GALFIT-style shape freedom beyond the reference (whose Sersic is
    purely elliptical):

    * ``c0`` — boxiness: the isophote radius is
      ``r^c = |u|^c + |v|^c``, ``c = c0 + 2`` in the scaled+rotated
      frame (``c0 > 0`` boxy, ``c0 < 0`` disky, ``c0 = 0`` the exact
      pure ellipse of :func:`render_sersic`),
    * ``fourier`` — azimuthal harmonic perturbations, a static list of
      ``(m, amplitude, phase)``: the isophote at generalized radius
      ``t`` is bent to ``t * (1 + sum_m a_m cos(m*theta - phi_m))``
      with ``theta`` the azimuth in the scaled (u, v) frame measured
      from the major axis (``m=1`` lopsidedness, ``m=3`` asymmetry,
      ``m=4`` extra diskiness/boxiness; phases in the same units as
      ``angle``),
    * ``bending`` — GALFIT-style bending modes, a static list of
      ``(m, amplitude)``: the scaled minor-axis coordinate is sheared
      by ``v -> v + sum_m b_m u^m`` (``m=2`` banana, ``m=3``
      S-shape); flux is exactly preserved for any amplitudes — the
      shear has unit Jacobian (see :mod:`psfmc_tpu.ops.isophote`),
    * ``rotation`` — spiral/swirl coordinate rotation,
      ``(rot_ang, rot_out, rot_in, rot_pow)``: the component frame is
      swirled by ``rot_ang * ramp(r)^rot_pow`` — twisted isophotes
      (``rot_ang`` in the same units as ``angle``; radii in PIXELS).
      Unit polar Jacobian — flux exactly preserved for any winding,
    * ``trunc`` — GALFIT-style radial truncation, an
      ``(outer, inner)`` pair of ``(break_px, soft_px)`` tuples (or
      None): logistic envelopes over the generalized radius in
      semi-major pixels; ``sbeff`` is rescaled by the device
      tanh-sinh flux ratio so ``mag`` stays the exact total flux
      (see :mod:`psfmc_tpu.ops.truncation`).

    Total flux stays exactly ``mag`` for any shape: the flux
    normalization uses the exact superellipse area factor, and under
    Fourier perturbation the isophote area factor by spectral azimuthal
    quadrature (:func:`psfmc_tpu.ops.isophote.isophote_area_factor`).

    Numerics: powers are computed max-factored in log space (no
    intermediate overflow for any physical ``c``); the prior layer
    rejects ``c0 <= -1.95`` and ``sum_m |a_m| > 0.9`` (the perturbation
    factor is additionally floored at 0.05 so stray proposals render
    finite rather than NaN).  The sub-pixel trapezoid correction keeps
    the elliptical-gradient closed form — an O(1/12 px^2) term whose
    shape dependence is second order (documented approximation).
    """
    from .isophote import generalized_log_sq_radius, isophote_area_factor

    x, y, m00, m01, m10, m11, kappa, rp, sbeff = sersic_scalar_params(
        xy, mag, reff, reff_b, index, angle, mag_zp, angle_degrees,
        kappa_mode,
    )
    c = jnp.asarray(c0) + 2.0
    sbeff = sbeff * (
        jnp.pi / isophote_area_factor(c, fourier, angle_degrees)
    )
    exp_, log_ = exp_log_fns_unsafe()
    dx = xg - x
    dy = yg - y
    u = m00 * dx + m01 * dy
    v = m10 * dx + m11 * dy
    if rotation is not None:
        rot_ang, rot_out, rot_in, rot_pow = rotation
        rot_ang = jnp.deg2rad(rot_ang) if angle_degrees else rot_ang
        rotation = (rot_ang, rot_out, rot_in, rot_pow, reff, reff_b)
    log_sq_r = generalized_log_sq_radius(
        u, v, c, fourier, angle_degrees, exp_, log_, bending, rotation
    )
    p = exp_(log_sq_r * rp)
    sb = exp_(-kappa * (p - 1.0))
    if trunc is not None:
        from .truncation import sersic_trunc_ratio, truncation_envelope

        outer, inner = trunc
        sbeff = sbeff * sersic_trunc_ratio(
            kappa, index, reff, outer, inner
        )
        r_px = exp_(0.5 * log_sq_r) * reff
        sb = sb * truncation_envelope(r_px, outer, inner)
    if not correction:
        return sbeff * sb
    sq_off = jnp.maximum(dx * dx + dy * dy, 0.125)
    krp_p = kappa * rp * p
    corr = 1.0 + (krp_p * krp_p) / (3.0 * sq_off)
    return sbeff * sb * corr


def render_sersic(
    xg,
    yg,
    xy,
    mag,
    reff,
    reff_b,
    index,
    angle,
    mag_zp,
    angle_degrees=False,
    kappa_mode="exact",
    correction=True,
):
    """Render one Sersic profile over the (H, W) grid (jittable, vmappable).

    ``xy`` is a length-2 array ``(x, y)``.  Returns the profile image; the
    caller accumulates it into the composite raw model.
    """
    x, y, m00, m01, m10, m11, kappa, rp, sbeff = sersic_scalar_params(
        xy, mag, reff, reff_b, index, angle, mag_zp, angle_degrees,
        kappa_mode,
    )
    # Guard-free transcendentals: sq_r is clamped positive-normal and the
    # prior's finiteness gate rejects NaN/out-of-support thetas upstream.
    exp_, log_ = exp_log_fns_unsafe()
    return sersic_profile_core(
        xg - x, yg - y, m00, m01, m10, m11, kappa, rp, sbeff, exp_, log_,
        correction=correction,
    )
