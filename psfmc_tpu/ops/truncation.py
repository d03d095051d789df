"""Radial truncation envelopes (GALFIT's truncation functions).

GALFIT attaches hyperbolic-tangent "truncation functions" to any
profile to model tidally truncated or ring-like structures; the
reference (psfMC) has nothing comparable.  This module supplies the
TPU-native equivalent for the Sersic and Moffat families:

* **outer truncation** ``(rtrunc, rsoft)``: the profile is multiplied
  by the logistic envelope ``T(r) = sigmoid((rtrunc - r) / rsoft)``
  with ``r`` the generalized isophote radius in PIXELS along the
  semi-major axis — the surface brightness falls to 50% of its
  untruncated value at ``rtrunc`` and ~1% at ``rtrunc + 4.6 rsoft``
  (our own documented parameterization: a break radius plus a
  softening length, not GALFIT's 99%/1% radius pair),
* **inner truncation** ``(rtrunc_in, rsoft_in)``:
  ``T(r) = sigmoid((r - rtrunc_in) / rsoft_in)`` — carves the center
  out (rings, ansae).

``mag`` stays the EXACT total magnitude: the truncated radial flux
integral has no closed form with traced break/softening parameters, so
it is computed on device by tanh-sinh quadrature (reusing the
King/Nuker machinery of :mod:`.profiles` — the integrands here are
smooth, but tanh-sinh also absorbs the ``x^(2n-1)`` algebraic endpoint
of the Sersic substitution for ``n < 1/2``) and the central surface
brightness is rescaled by ``R_closed / R_trunc``.

Design notes:

* The envelope is applied to the GENERALIZED radius, so truncation
  composes exactly with boxy/Fourier/bending isophote shapes (the
  truncation isophote shares the profile's shape, like the King tidal
  radius) — and the flux quadrature stays one-dimensional because both
  profile and envelope depend on radius only (the angular area factor
  divides out of the ratio).
* The integration variable is the Sersic-exponent substitution
  ``x = t^(1/n)`` (``t`` = radius in semi-major units), which makes
  the untruncated integral the textbook
  ``2n e^kappa kappa^(-2n) Gamma(2n)`` and keeps the quadrature
  integrand free of the ``exp(-kappa t^(1/n))`` boundary layer at 0.
* The upper quadrature limit is traced (it follows the break radius),
  which is fine under jit: the tanh-sinh nodes are a fixed host-side
  constant vector mapped linearly onto ``[0, xmax]``.
* The sub-pixel trapezoid correction keeps its untruncated closed
  form — an O(px^2/12) term whose envelope dependence is second order
  (same documented approximation as for the isophote shapes).

Reference for intent: GALFIT truncation functions (Peng et al. 2010,
section on truncated profiles); no psfMC counterpart exists.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax.scipy.special import gammaln

from .profiles import _TS_S, _TS_W

__all__ = [
    "truncation_envelope",
    "sersic_trunc_ratio",
    "moffat_trunc_ratio",
    "TRUNC_TAIL",
]

# envelope reach beyond the break radius: sigmoid(±12) ~ 6e-6 — flux
# beyond rtrunc + TRUNC_TAIL*rsoft is negligible at f32 precision
TRUNC_TAIL = 12.0


def truncation_envelope(r_px, outer, inner):
    """Multiplicative truncation envelope over radius in pixels.

    ``outer``/``inner`` are ``(break_px, soft_px)`` tuples or None;
    static structure (which truncations exist is baked at trace time).
    """
    # jax.nn.sigmoid, not a raw exp ratio: the logistic argument spans
    # +-hundreds at the grid corners for small softening lengths and
    # an overflowed exp NaNs the JVP (inf/inf) even where the primal
    # saturates cleanly
    import jax

    env = None
    if outer is not None:
        ro, so = outer
        env = jax.nn.sigmoid((ro - r_px) / so)
    if inner is not None:
        ri, si = inner
        t = jax.nn.sigmoid((r_px - ri) / si)
        env = t if env is None else env * t
    return env


def _quad_0_to(xmax, integrand):
    """Tanh-sinh integral of ``integrand`` over ``(0, xmax)``.

    ``xmax`` may be traced; nodes are fixed host constants mapped
    linearly (the double-exponential weight decay handles algebraic
    endpoint behavior regardless of the linear map).
    """
    s = jnp.asarray(_TS_S)
    w = jnp.asarray(_TS_W)
    return xmax * jnp.sum(w * integrand(xmax * s))


def _trunc_xupper(outer, inner, fallback):
    """Upper integration limit in PIXELS: where the integrand dies.

    With an outer truncation the envelope kills everything past
    ``rtrunc + TRUNC_TAIL * rsoft``; without one the (smooth-envelope)
    integrand is profile-limited and the caller supplies a fallback
    radius beyond which the profile itself is negligible.
    """
    if outer is not None:
        ro, so = outer
        return ro + TRUNC_TAIL * so
    ri, si = inner
    # inner-only: integrate the *deficit* f*(1-T_in), which dies past
    # the inner break (callers use the closed form minus this deficit)
    return ri + TRUNC_TAIL * si


def sersic_trunc_ratio(kappa, index, reff, outer, inner):
    """``R_closed / R_truncated`` for the Sersic radial flux integral.

    Multiplying ``sbeff`` by this ratio keeps the total flux exactly
    ``mag`` under the envelope.  With ``x = t^(1/n)`` (``t`` in
    ``reff`` units)::

        R_closed = Int_0^inf e^{-kappa(x-1)} 2n x^{2n-1} dx
                 = 2n e^kappa kappa^{-2n} Gamma(2n)
        R_trunc  = Int e^{-kappa(x-1)} 2n x^{2n-1} T(x^n * reff) dx

    For an inner-only truncation the quadrature computes the compactly
    supported DEFICIT ``f * (1 - T_in)`` instead (the envelope-free
    tail would otherwise need an unbounded domain).
    """
    kappa = jnp.asarray(kappa)
    n = jnp.asarray(index)
    two_n = 2.0 * n
    log_r_closed = (
        jnp.log(two_n) + kappa - two_n * jnp.log(kappa) + gammaln(two_n)
    )
    r_closed = jnp.exp(log_r_closed)

    def f_times(env_fn, r_upper_px):
        xmax = jnp.exp(jnp.log(r_upper_px / reff) / n)

        def integrand(x):
            xs = jnp.maximum(x, 1e-30)
            log_fx = (
                -kappa * (xs - 1.0)
                + (two_n - 1.0) * jnp.log(xs)
                + jnp.log(two_n)
            )
            r_px = jnp.exp(n * jnp.log(xs)) * reff
            return jnp.exp(log_fx) * env_fn(r_px)

        return _quad_0_to(xmax, integrand)

    if outer is not None:
        # one quadrature covers both (T_in is smooth inside the outer
        # support)
        r_up = _trunc_xupper(outer, inner, None)
        r_trunc = f_times(
            lambda r: truncation_envelope(r, outer, inner), r_up
        )
    else:
        # inner only: R_T = R_closed - Int f * (1 - T_in)
        r_up = _trunc_xupper(None, inner, None)
        deficit = f_times(
            lambda r: 1.0 - truncation_envelope(r, None, inner), r_up
        )
        r_trunc = r_closed - deficit
    return r_closed / jnp.maximum(r_trunc, 1e-30)


def moffat_trunc_ratio(beta, alpha_a, outer, inner):
    """``R_closed / R_truncated`` for the Moffat radial flux integral.

    With ``u = t^2`` (``t`` in ``alpha_a`` units)::

        R_closed = Int_0^inf (1+u)^{-beta} du = 1/(beta - 1)
        R_trunc  = Int (1+u)^{-beta} T(sqrt(u) * alpha_a) du
    """
    beta = jnp.asarray(beta)
    r_closed = 1.0 / (beta - 1.0)

    def f_times(env_fn, r_upper_px):
        umax = (r_upper_px / alpha_a) ** 2

        def integrand(u):
            return jnp.exp(-beta * jnp.log1p(u)) * env_fn(
                jnp.sqrt(jnp.maximum(u, 0.0)) * alpha_a
            )

        return _quad_0_to(umax, integrand)

    if outer is not None:
        r_up = _trunc_xupper(outer, inner, None)
        r_trunc = f_times(
            lambda r: truncation_envelope(r, outer, inner), r_up
        )
    else:
        r_up = _trunc_xupper(None, inner, None)
        deficit = f_times(
            lambda r: 1.0 - truncation_envelope(r, None, inner), r_up
        )
        r_trunc = r_closed - deficit
    return r_closed / jnp.maximum(r_trunc, 1e-30)
