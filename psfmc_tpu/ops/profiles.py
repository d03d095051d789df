"""King / Ferrer / Nuker radial profiles (beyond the reference).

The reference component set is Sky/PointSource/Sersic (reference
ModelComponents/__init__.py:1-4).  These three GALFIT-familiar families
cover the structures psfMC users otherwise leave to GALFIT: truncated
cluster/spheroid light (generalized King), bars/lenses (modified
Ferrer), and galaxy nuclei with inner power-law cusps (Nuker).

Conventions follow this package's Sersic/Moffat components: total
``mag`` (NOT GALFIT's central surface brightness — a deliberate,
documented divergence so every luminous component here is
flux-parameterized), semi-major/semi-minor scale radii with the joint
``a >= b`` prior constraint, position ``angle`` with the +90deg
convention, optional boxiness ``c0`` + azimuthal Fourier modes through
the shared isophote machinery (:mod:`.isophote`).

Radial laws (``t`` = generalized radius in scale-radius units):

* generalized King (GALFIT ``king``; King 1962 at ``alpha = 2``)::

      g(t) = [ (1+t^2)^(-1/alpha) - (1+x^2)^(-1/alpha) ]^alpha,  t <= x
      g(t) = 0,                                                  t >  x

  with ``x = rt/rc`` the truncation in core-radius units,
* modified Ferrer (GALFIT ``ferrer``)::

      g(t) = (1 - t^(2-beta))^alpha,  t < 1  (t in r_out units)

* Nuker (Lauer et al. 1995; GALFIT ``nuker``)::

      g(t) = 2^((beta-gamma)/alpha) t^(-gamma)
             [1 + t^alpha]^((gamma-beta)/alpha)

  (``g(1) = 1`` at the break radius; outer slope ``beta > 2`` for a
  finite total flux, inner cusp ``gamma < 2`` for an integrable
  center).

Flux normalization — exactly ``mag`` for every shape: with ``F`` the
total flux, semi-axes ``a, b``, isophote area factor ``A`` (``pi`` for
the pure ellipse) and the radial flux factor ``R = Int g(t) 2t dt``::

    I0 = F / (a * b * A * R)

``R`` is closed-form for Ferrer (a Beta function via ``gammaln``) and
computed on device by tanh-sinh quadrature for King and Nuker (the
parameters are stochastic, so host precomputation is impossible).
Tanh-sinh is chosen over Gauss-Legendre deliberately: the integrands
have *algebraic endpoint singularities* with trace-dependent exponents
(the King bracket vanishes like ``(x - t)^alpha`` at truncation; the
Nuker substitutions put ``s^(alpha/(2-gamma))``-type kinks at 0), which
kill fixed GL rates but are handled spectrally by the double-exponential
weight decay.  Nodes/weights are host-side f64 constants clipped so the
smallest node's log stays f32-safe.

The Nuker infinite radial integral is split at the break and each piece
substituted to a FINITE integral with the endpoint power removed::

    Int_0^1 g 2t dt  -- t = s^(1/(2-gamma)) -->
        2^((beta-gamma)/alpha) * 2/(2-gamma) *
            Int_0^1 (1 + s^(alpha/(2-gamma)))^((gamma-beta)/alpha) ds
    Int_1^inf g 2t dt -- t = w^(-1/(beta-2)) -->
        2^((beta-gamma)/alpha) * 2/(beta-2) *
            Int_0^1 (1 + w^(alpha/(beta-2)))^((gamma-beta)/alpha) dw

(the same integrand shape with different exponents — both pieces share
:func:`_nuker_piece`).  Validated against scipy adaptive quadrature
over the supported parameter box in tests/test_profiles.py.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax.scipy.special import gammaln

from .coords import mag_to_flux
from .fastmath import exp_log_fns_unsafe

__all__ = [
    "king_radial_factor",
    "king_radial_factor_alpha2",
    "ferrer_radial_factor",
    "nuker_radial_factor",
    "render_king",
    "render_king_gen",
    "render_ferrer",
    "render_ferrer_gen",
    "render_nuker",
    "render_nuker_gen",
    "render_edgedisk",
    "xk1",
]

_TINY = 1e-30
_LN2 = float(np.log(2.0))


def _tanh_sinh_01(n=60, h=0.05):
    """Tanh-sinh nodes/weights on (0, 1), host f64 constants.

    ``j h`` capped at 3.0 keeps ``1 - |x|`` above ~1e-14 and
    ``log(s)`` above ~ -32 — safely inside f32 when traced exponents
    multiply it.
    """
    j = np.arange(-n, n + 1) * h
    u = 0.5 * np.pi * np.sinh(j)
    x = np.tanh(u)
    w = h * 0.5 * np.pi * np.cosh(j) / np.cosh(u) ** 2
    s = 0.5 * (x + 1.0)
    return s, np.log(s), 0.5 * w


_TS_S, _TS_LOG_S, _TS_W = _tanh_sinh_01()


def king_radial_factor(sq_xt, alpha):
    """``R = Int_0^x [(1+t^2)^(-1/a) - q]^a 2t dt`` (t in rc units).

    ``sq_xt = (rt/rc)^2``; ``q = (1+x^2)^(-1/a)`` is the truncation
    pedestal.  Device tanh-sinh over ``t = x s`` — the integrand
    vanishes like ``(x-t)^alpha`` at the upper end (fractional-power
    endpoint for non-integer alpha).
    """
    sq_xt = jnp.asarray(sq_xt)
    alpha = jnp.asarray(alpha)
    inv_a = 1.0 / alpha
    q = jnp.exp(-inv_a * jnp.log1p(sq_xt))
    s = jnp.asarray(_TS_S)
    w = jnp.asarray(_TS_W)
    sq_t = sq_xt * s * s
    outer = jnp.exp(-inv_a * jnp.log1p(sq_t))
    bracket = jnp.maximum(outer - q, _TINY)
    g = jnp.exp(alpha * jnp.log(bracket))
    return sq_xt * jnp.sum(w * g * 2.0 * s)


def king_radial_factor_alpha2(sq_xt):
    """Closed form at ``alpha = 2`` (King 1962):
    ``ln(1+x^2) - 4 (1 - q) + x^2/(1+x^2)``, ``q = (1+x^2)^(-1/2)`` —
    the quadrature's exactness anchor."""
    sq_xt = jnp.asarray(sq_xt)
    opx = 1.0 + sq_xt
    q = 1.0 / jnp.sqrt(opx)
    return jnp.log(opx) - 4.0 * (1.0 - q) + sq_xt / opx


def ferrer_radial_factor(alpha, beta):
    """``R = Int_0^1 (1 - t^(2-beta))^alpha 2t dt`` — closed form.

    With ``p = 2 - beta``: ``(2/p) B(2/p, alpha+1)`` (substitute
    ``s = t^p``).
    """
    alpha = jnp.asarray(alpha)
    p = 2.0 - jnp.asarray(beta)
    a = 2.0 / p
    b = alpha + 1.0
    return a * jnp.exp(gammaln(a) + gammaln(b) - gammaln(a + b))


def _nuker_piece(c, d):
    """``Int_0^1 (1 + s^c)^d ds`` by tanh-sinh (c > 0, d < 0 here).

    The ``s^c`` endpoint kink has a trace-dependent fractional
    exponent; softplus keeps ``log(1 + s^c)`` exact for tiny ``s^c``.
    """
    log_s = jnp.asarray(_TS_LOG_S)
    w = jnp.asarray(_TS_W)
    z = c * log_s  # <= 0 on (0, 1)
    log1p_sc = jnp.log1p(jnp.exp(z))
    return jnp.sum(w * jnp.exp(d * log1p_sc))


def nuker_radial_factor(alpha, beta, gamma):
    """``R = Int_0^inf g(t) 2t dt`` for the Nuker law (module docstring
    derivation).  Requires ``gamma < 2`` and ``beta > 2`` (enforced by
    the component priors)."""
    alpha = jnp.asarray(alpha)
    beta = jnp.asarray(beta)
    gamma = jnp.asarray(gamma)
    d = (gamma - beta) / alpha
    pref = jnp.exp((beta - gamma) / alpha * _LN2)
    inner = (2.0 / (2.0 - gamma)) * _nuker_piece(alpha / (2.0 - gamma), d)
    outer = (2.0 / (beta - 2.0)) * _nuker_piece(alpha / (beta - 2.0), d)
    return pref * (inner + outer)


def _scale_matrix(xy, a, b, angle, angle_degrees):
    """(x, y, m00, m01, m10, m11): inverse scale+rotation folded to four
    scalars (the Sersic convention incl. the +90deg position angle)."""
    ang = jnp.deg2rad(angle) if angle_degrees else angle
    ang = ang + 0.5 * jnp.pi
    sin_a, cos_a = jnp.sin(ang), jnp.cos(ang)
    return (
        xy[0], xy[1],
        cos_a / a, sin_a / a,
        -sin_a / b, cos_a / b,
    )


def _log_sq_radius(xg, yg, x, y, m00, m01, m10, m11, log_):
    dx = xg - x
    dy = yg - y
    u = m00 * dx + m01 * dy
    v = m10 * dx + m11 * dy
    return log_(jnp.maximum(u * u + v * v, _TINY))


def _gen_log_sq_radius(xg, yg, x, y, m00, m01, m10, m11, c, fourier,
                       angle_degrees, exp_, log_, bending=(),
                       rotation=None, rot_axes=None):
    from .isophote import generalized_log_sq_radius

    dx = xg - x
    dy = yg - y
    u = m00 * dx + m01 * dy
    v = m10 * dx + m11 * dy
    if rotation is not None:
        # rotation radii are PIXELS; the swirl acts in the unscaled
        # component frame, so pass the semi-axes the m-matrix divided
        # by (rot_axes = (a, b))
        rot_ang, rot_out, rot_in, rot_pow = rotation
        rot_ang = jnp.deg2rad(rot_ang) if angle_degrees else rot_ang
        rotation = (rot_ang, rot_out, rot_in, rot_pow) + tuple(rot_axes)
    return generalized_log_sq_radius(
        u, v, c, fourier, angle_degrees, exp_, log_, bending, rotation
    )


def _area_factor(c0, fourier, angle_degrees):
    from .isophote import isophote_area_factor

    return isophote_area_factor(
        jnp.asarray(c0) + 2.0, fourier, angle_degrees
    )


# ---------------------------------------------------------------- King

def _king_sb(log_sq_t, i0, alpha, q, sq_xt, exp_, log_):
    sq_t = exp_(log_sq_t)
    outer = exp_(-(1.0 / alpha) * log_(1.0 + sq_t))
    bracket = jnp.maximum(outer - q, _TINY)
    val = i0 * exp_(alpha * log_(bracket))
    return jnp.where(sq_t <= sq_xt, val, 0.0)


def _king_params(xy, mag, rc, rc_b, rt, alpha, angle, mag_zp,
                 angle_degrees, area):
    x, y, m00, m01, m10, m11 = _scale_matrix(
        xy, rc, rc_b, angle, angle_degrees
    )
    sq_xt = (rt / rc) ** 2
    q = jnp.exp(-(1.0 / alpha) * jnp.log1p(sq_xt))
    flux = mag_to_flux(mag, mag_zp)
    i0 = flux / (rc * rc_b * area * king_radial_factor(sq_xt, alpha))
    return x, y, m00, m01, m10, m11, i0, q, sq_xt


def render_king(xg, yg, xy, mag, rc, rc_b, rt, alpha, angle, mag_zp,
                angle_degrees=False):
    """Render one generalized-King profile (jittable, vmappable)."""
    exp_, log_ = exp_log_fns_unsafe()
    x, y, m00, m01, m10, m11, i0, q, sq_xt = _king_params(
        xy, mag, rc, rc_b, rt, alpha, angle, mag_zp, angle_degrees,
        jnp.pi,
    )
    lsr = _log_sq_radius(xg, yg, x, y, m00, m01, m10, m11, log_)
    return _king_sb(lsr, i0, alpha, q, sq_xt, exp_, log_)


def render_king_gen(xg, yg, xy, mag, rc, rc_b, rt, alpha, angle, c0,
                    mag_zp, angle_degrees=False, fourier=(),
                    bending=(), rotation=None):
    """King over generalized (boxy/disky/asymmetric/bent) isophotes."""
    exp_, log_ = exp_log_fns_unsafe()
    area = _area_factor(c0, fourier, angle_degrees)
    x, y, m00, m01, m10, m11, i0, q, sq_xt = _king_params(
        xy, mag, rc, rc_b, rt, alpha, angle, mag_zp, angle_degrees,
        area,
    )
    lsr = _gen_log_sq_radius(
        xg, yg, x, y, m00, m01, m10, m11, jnp.asarray(c0) + 2.0,
        fourier, angle_degrees, exp_, log_, bending, rotation,
        (rc, rc_b),
    )
    return _king_sb(lsr, i0, alpha, q, sq_xt, exp_, log_)


# -------------------------------------------------------------- Ferrer

def _ferrer_sb(log_sq_t, i0, alpha, p, exp_, log_):
    tp = exp_(0.5 * p * log_sq_t)
    base = jnp.maximum(1.0 - tp, _TINY)
    val = i0 * exp_(alpha * log_(base))
    return jnp.where(tp < 1.0, val, 0.0)


def _ferrer_params(xy, mag, rout, rout_b, alpha, beta, angle, mag_zp,
                   angle_degrees, area):
    x, y, m00, m01, m10, m11 = _scale_matrix(
        xy, rout, rout_b, angle, angle_degrees
    )
    flux = mag_to_flux(mag, mag_zp)
    i0 = flux / (
        rout * rout_b * area * ferrer_radial_factor(alpha, beta)
    )
    return x, y, m00, m01, m10, m11, i0, 2.0 - jnp.asarray(beta)


def render_ferrer(xg, yg, xy, mag, rout, rout_b, alpha, beta, angle,
                  mag_zp, angle_degrees=False):
    """Render one modified-Ferrer profile (jittable, vmappable)."""
    exp_, log_ = exp_log_fns_unsafe()
    x, y, m00, m01, m10, m11, i0, p = _ferrer_params(
        xy, mag, rout, rout_b, alpha, beta, angle, mag_zp,
        angle_degrees, jnp.pi,
    )
    lsr = _log_sq_radius(xg, yg, x, y, m00, m01, m10, m11, log_)
    return _ferrer_sb(lsr, i0, alpha, p, exp_, log_)


def render_ferrer_gen(xg, yg, xy, mag, rout, rout_b, alpha, beta,
                      angle, c0, mag_zp, angle_degrees=False,
                      fourier=(), bending=(), rotation=None):
    """Ferrer over generalized isophotes."""
    exp_, log_ = exp_log_fns_unsafe()
    area = _area_factor(c0, fourier, angle_degrees)
    x, y, m00, m01, m10, m11, i0, p = _ferrer_params(
        xy, mag, rout, rout_b, alpha, beta, angle, mag_zp,
        angle_degrees, area,
    )
    lsr = _gen_log_sq_radius(
        xg, yg, x, y, m00, m01, m10, m11, jnp.asarray(c0) + 2.0,
        fourier, angle_degrees, exp_, log_, bending, rotation,
        (rout, rout_b),
    )
    return _ferrer_sb(lsr, i0, alpha, p, exp_, log_)


# --------------------------------------------------------------- Nuker

def _nuker_sb(log_sq_t, i0, alpha, beta, gamma, exp_, log_):
    lt = 0.5 * log_sq_t
    z = alpha * lt
    # softplus form of log(1 + t^alpha): exact for both tails
    log1p_ta = jnp.maximum(z, 0.0) + jnp.log1p(exp_(-jnp.abs(z)))
    lg = (
        ((beta - gamma) / alpha) * _LN2
        - gamma * lt
        + ((gamma - beta) / alpha) * log1p_ta
    )
    return i0 * exp_(lg)


def _nuker_params(xy, mag, rb, rb_b, alpha, beta, gamma, angle, mag_zp,
                  angle_degrees, area):
    x, y, m00, m01, m10, m11 = _scale_matrix(
        xy, rb, rb_b, angle, angle_degrees
    )
    flux = mag_to_flux(mag, mag_zp)
    i0 = flux / (
        rb * rb_b * area * nuker_radial_factor(alpha, beta, gamma)
    )
    return x, y, m00, m01, m10, m11, i0


def _nuker_log_floor(m00, m10, min_px_sq):
    """Cusp regularization: floor the sampled square radius at the
    scaled equivalent of the half-sample corner distance.

    The nearest pixel center of any legitimate sub-pixel position is
    >= 0.354 px away (``min_px_sq = 0.5^2/2`` — the same clamp
    philosophy as the Sersic correction, ops.sersic), so a
    ``gamma > 0`` power-law center saturates at its largest *valid*
    point-sample instead of exploding when a proposal lands on an
    exact pixel center (``t^-gamma`` at the clamped ``t ~ 1e-15``
    reaches ~1e10 x the break SB and would dominate the image sum).
    ``m00^2 + m10^2 = 1/rb^2`` exactly, so the floor is measured along
    the semi-MAJOR axis — a lower bound of the true scaled distance of
    any offset past the corner distance.  The sub-pixel oversampler
    passes ``min_px_sq / S^2`` (its midpoint samples legitimately get
    ``S`` times closer), which is how cuspy-center photometry is made
    accurate: ``Configuration(render_oversample=...)``.
    """
    return jnp.log(min_px_sq * (m00 * m00 + m10 * m10))


def render_nuker(xg, yg, xy, mag, rb, rb_b, alpha, beta, gamma, angle,
                 mag_zp, angle_degrees=False, min_px_sq=0.125):
    """Render one Nuker profile (jittable, vmappable).

    The ``gamma > 0`` central cusp is point-sampled with the
    half-pixel radius floor (:func:`_nuker_log_floor`); for cuspy fits
    enable ``Configuration(render_oversample=...)``.
    """
    exp_, log_ = exp_log_fns_unsafe()
    x, y, m00, m01, m10, m11, i0 = _nuker_params(
        xy, mag, rb, rb_b, alpha, beta, gamma, angle, mag_zp,
        angle_degrees, jnp.pi,
    )
    lsr = _log_sq_radius(xg, yg, x, y, m00, m01, m10, m11, log_)
    lsr = jnp.maximum(lsr, _nuker_log_floor(m00, m10, min_px_sq))
    return _nuker_sb(lsr, i0, alpha, beta, gamma, exp_, log_)


def render_nuker_gen(xg, yg, xy, mag, rb, rb_b, alpha, beta, gamma,
                     angle, c0, mag_zp, angle_degrees=False,
                     fourier=(), bending=(), rotation=None,
                     min_px_sq=0.125):
    """Nuker over generalized isophotes."""
    exp_, log_ = exp_log_fns_unsafe()
    area = _area_factor(c0, fourier, angle_degrees)
    x, y, m00, m01, m10, m11, i0 = _nuker_params(
        xy, mag, rb, rb_b, alpha, beta, gamma, angle, mag_zp,
        angle_degrees, area,
    )
    lsr = _gen_log_sq_radius(
        xg, yg, x, y, m00, m01, m10, m11, jnp.asarray(c0) + 2.0,
        fourier, angle_degrees, exp_, log_, bending, rotation,
        (rb, rb_b),
    )
    lsr = jnp.maximum(lsr, _nuker_log_floor(m00, m10, min_px_sq))
    return _nuker_sb(lsr, i0, alpha, beta, gamma, exp_, log_)


# ----------------------------------------------------------- EdgeDisk

def xk1(x, exp_=jnp.exp, log_=jnp.log):
    """``x K1(x)`` — modified Bessel, Abramowitz & Stegun 9.8.7/9.8.8.

    The edge-on disk's radial law.  Branchless where-select of the two
    rational approximations (|rel err| < 2e-7 against scipy over
    (1e-12, 60), asserted in tests/test_profiles.py), each branch
    evaluated on a domain-clamped argument so both are finite for any
    input (the standard safe-where pattern — NaN would otherwise leak
    through the untaken branch's gradient).  Smooth polynomials +
    exp/log throughout, so autodiff gives the exact derivative of the
    approximation (``d/dx [x K1] = -x K0`` analytically); no custom
    JVP needed.  ``x -> 0`` limit is exactly 1 (the ``x^2 log x`` term
    vanishes under the clamp).
    """
    x = jnp.asarray(x)
    # small branch (0 < x <= 2): x*K1 = x^2 ln(x/2) (I1/x) + poly((x/2)^2)
    xs = jnp.clip(x, 1e-15, 2.0)
    t = (xs / 3.75) ** 2
    i1_over_x = (
        0.5
        + t * (0.87890594
               + t * (0.51498869
                      + t * (0.15084934
                             + t * (0.02658733
                                    + t * (0.00301532
                                           + t * 0.00032411)))))
    )
    u = 0.25 * xs * xs
    poly = (
        1.0
        + u * (0.15443144
               + u * (-0.67278579
                      + u * (-0.18156897
                             + u * (-0.01919402
                                    + u * (-0.00110404
                                           + u * -0.00004686)))))
    )
    small = xs * xs * (log_(xs) - _LN2) * i1_over_x + poly
    # large branch (x >= 2): x*K1 = sqrt(x) e^-x Q(2/x)
    xl = jnp.maximum(x, 2.0)
    y = 2.0 / xl
    q = (
        1.25331414
        + y * (0.23498619
               + y * (-0.03655620
                      + y * (0.01504268
                             + y * (-0.00780353
                                    + y * (0.00325614
                                           + y * -0.00068245)))))
    )
    large = jnp.sqrt(xl) * exp_(-xl) * q
    return jnp.where(x <= 2.0, small, large)


def render_edgedisk(xg, yg, xy, mag, rs, hs, angle, mag_zp,
                    angle_degrees=False):
    """Render one edge-on disk (GALFIT ``edgedisk``; van der Kruit &
    Searle 1981) — jittable, vmappable.

        ``I(R, z) = I0 (|R|/rs) K1(|R|/rs) sech^2(z/hs)``

    ``R`` runs along the disk midplane (the ``angle`` major axis, same
    +90deg convention as every other component), ``z`` perpendicular to
    it; ``rs`` is the major-axis scale length, ``hs`` the scale height.
    Parameterized by total ``mag`` (deliberate divergence from GALFIT's
    central surface brightness): the profile is separable, with
    ``Int |R|/rs K1 dR = pi rs`` and ``Int sech^2(z/hs) dz = 2 hs``, so

        ``I0 = F / (2 pi rs hs)``

    exactly.  The profile is finite at the center (``x K1 -> 1``) —
    no cusp floor needed.  Isophote shape freedoms (``c0``, Fourier
    modes) do not apply: the law is separable in (R, z), not a radial
    function of an isophote radius.
    """
    exp_, log_ = exp_log_fns_unsafe()
    x, y, m00, m01, m10, m11 = _scale_matrix(
        xy, rs, hs, angle, angle_degrees
    )
    dx = xg - x
    dy = yg - y
    r = jnp.abs(m00 * dx + m01 * dy)   # midplane coordinate, rs units
    z = jnp.abs(m10 * dx + m11 * dy)   # vertical coordinate, hs units
    flux = mag_to_flux(mag, mag_zp)
    i0 = flux / (2.0 * jnp.pi * rs * hs)
    s = exp_(-2.0 * z)
    sech2 = 4.0 * s / ((1.0 + s) * (1.0 + s))
    return i0 * xk1(r, exp_, log_) * sech2
