"""Accurate float32 transcendentals for the TPU VPU.

The TPU's hardware f32 approximations are too coarse for this
likelihood: measured on v5e, ``jnp.log`` has ~1e-4 *absolute* error
(~13 bits) and ``jnp.exp`` ~6e-6 relative (~21 bits).  The Sersic
profile chain ``exp(log(r^2) * 0.5/n)`` amplifies the log error into a
~3e-5 relative error on every rendered pixel, which the
inverse-variance Gaussian likelihood turns into O(0.2) log-posterior
units of noise — enough to visibly widen and shift posteriors (the
x-position std doubled in moment-parity checks on real hardware).

These replacements use only operations the VPU performs exactly or to
~1 ulp — integer bit manipulation, adds, multiplies, one divide — via
the classic Cody & Waite argument-reduction recipes:

* ``accurate_log``: frexp via bit twiddling -> mantissa in
  [sqrt(1/2), sqrt(2)) -> atanh series (degree 9, relative truncation
  < 1e-9) -> e*ln2 re-added in hi/lo split arithmetic.
* ``accurate_exp``: k = round(a/ln2), r = a - k*ln2 in hi/lo split,
  degree-7 Taylor on r (truncation < 5e-9 for |r| <= ln2/2; the clip
  of k to the exponent-bit range stretches r up to 0.72 only in the
  last representable octave near exp(88.7), where truncation grows to
  ~1e-4 — still finite and monotone), exact 2^k scaling through the
  exponent bits.

The recipes are float32-specific (they manipulate f32 exponent bits):
float64 inputs fall through to the hardware ops, whose f64 variants are
accurate on TPU (~1e-8, good enough for any f64 run).

Measured end-to-end effect (tools/check_tpu_moments.py): restores
posterior-moment parity with the f64 reference pipeline on real TPU.

Everything here lowers both in plain XLA and inside Pallas kernels
(no ``frexp``/``ldexp`` primitives — only bitcasts and arithmetic).
On CPU the hardware ops are already correctly rounded; callers select
via :func:`needs_accurate_transcendentals`.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "accurate_log",
    "accurate_exp",
    "accurate_log_unsafe",
    "accurate_exp_unsafe",
    "exp_log_fns",
    "exp_log_fns_unsafe",
    "needs_accurate_transcendentals",
]

# ln2 split so that E * LN2_HI is exact for |E| < 2^11 (hi has its low
# 12 mantissa bits zeroed)
_LN2_HI = np.float32(0.693145751953125)
_LN2_LO = np.float32(1.428606765330187045e-06)
_INV_LN2 = np.float32(1.4426950408889634)
_SQRT_HALF = np.float32(0.7071067811865476)
_EXP_HI = np.float32(88.72)  # log(f32 max) = 88.7228
_EXP_LO = np.float32(-87.0)  # below log(f32 min normal): flush to 0


def needs_accurate_transcendentals() -> bool:
    """True on backends whose hw f32 exp/log are below ~1 ulp (TPU).

    ``PSFMC_FASTMATH=0`` forces the raw hardware ops everywhere (~14%
    faster end-to-end on v5e, at ~0.2 log-posterior units of likelihood
    noise — fine for exploratory runs, not for production posteriors).
    """
    if _fastmath_mode() == "0":
        return False
    return jax.default_backend() not in ("cpu",)


def _fastmath_mode() -> str:
    """PSFMC_FASTMATH: '1' (default, accurate exp+log), '0' (raw
    hardware ops), 'mixed' (hardware exp + accurate log).

    The error budget motivating 'mixed': the hw f32 ``log``'s ~1e-4 ABS
    error is what poisons the likelihood (measured ~0.2 lnpost units of
    noise, visibly widened posteriors), while the hw ``exp``'s ~6e-6
    REL error contributes ~5x less — and the software exp recipe is
    the pricier of the two.  'mixed' keeps the accuracy-critical log
    replacement and the cheap hw exp.
    """
    import os

    return os.environ.get("PSFMC_FASTMATH", "1")


def exp_log_fns():
    """(exp, log) to use on the current backend — called at trace time.

    CPU's hardware ops are already correctly rounded (and faster than
    the software recipes); accelerators get the accurate versions
    (hardware exp under ``PSFMC_FASTMATH=mixed``, see _fastmath_mode).
    """
    if needs_accurate_transcendentals():
        if _fastmath_mode() == "mixed":
            return jnp.exp, accurate_log
        return accurate_exp, accurate_log
    return jnp.exp, jnp.log


def exp_log_fns_unsafe():
    """Like :func:`exp_log_fns` but with the guard-free hot-path
    variants — for per-pixel code whose inputs are clamped positive and
    whose callers gate pathological thetas upstream."""
    if needs_accurate_transcendentals():
        if _fastmath_mode() == "mixed":
            return jnp.exp, accurate_log_unsafe
        return accurate_exp_unsafe, accurate_log_unsafe
    return jnp.exp, jnp.log


def _is_f32(x):
    return jnp.asarray(x).dtype == jnp.float32


# All four recipes get EXACT analytic derivative rules.  Autodiff
# through the raw implementations is silently wrong: the exponent
# contribution flows through integer bitcasts (zero cotangent), so e.g.
# d/dx accurate_log(x) would miss the e*ln2 term entirely.  This broke
# gradient-based sampling on TPU (NUTS step size collapsed to ~1e-8)
# while CPU — which uses the hardware ops — was fine.
@jax.custom_jvp
def accurate_log_unsafe(x):
    """~1-ulp f32 natural log, no edge-case selects (~6 VPU ops saved).

    Contract: ``x`` is a positive NORMAL float32 (caller clamps).  Any
    non-finite/zero/negative/subnormal input produces garbage, NOT NaN —
    only use where an upstream guard (e.g. the prior's finiteness gate)
    already rejects pathological parameter vectors.  Non-f32 dtypes fall
    through to the hardware op (the bit recipe is f32-specific).
    """
    x = jnp.asarray(x)
    if not _is_f32(x):
        return jnp.log(x)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    # exponent such that x = m * 2^e with m in [0.5, 1)
    e = ((bits >> 23) & 0xFF) - 126
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F000000, jnp.float32
    )
    # renormalize to [sqrt(1/2), sqrt(2)) for a symmetric series range
    small = m < _SQRT_HALF
    m = jnp.where(small, m + m, m)
    e = jnp.where(small, e - 1, e).astype(jnp.float32)

    # log(m) = 2 atanh(s), s = (m-1)/(m+1), |s| <= 0.1716
    s = (m - 1.0) / (m + 1.0)
    z = s * s
    # 2*atanh(s) = 2s (1 + z/3 + z^2/5 + z^3/7 + z^4/9), trunc < 1e-9 rel
    poly = np.float32(2 / 9.0)
    poly = poly * z + np.float32(2 / 7.0)
    poly = poly * z + np.float32(2 / 5.0)
    poly = poly * z + np.float32(2 / 3.0)
    poly = poly * z * s
    # assemble in an order that keeps the small terms together
    return e * _LN2_HI + ((e * _LN2_LO + poly) + (s + s))


@accurate_log_unsafe.defjvp
def _accurate_log_unsafe_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return accurate_log_unsafe(x), t / x


@jax.custom_jvp
def accurate_log(x):
    """~1-ulp float32 natural log for positive inputs.

    Matches ``jnp.log`` edge behavior: log(0) = -inf, log(neg) = nan,
    log(inf) = inf, log(nan) = nan.  Subnormal inputs flush to -inf
    (XLA backends flush subnormals to zero anyway), which is harmless
    for this package's callers (radii are clamped >= 1e-30).
    """
    x = jnp.asarray(x)
    if not _is_f32(x):
        return jnp.log(x)
    result = accurate_log_unsafe(x)
    result = jnp.where(x == 0.0, -jnp.inf, result)
    result = jnp.where(x < 0.0, jnp.nan, result)
    result = jnp.where(jnp.isinf(x) & (x > 0), jnp.inf, result)
    result = jnp.where(jnp.isnan(x), jnp.nan, result)
    return result


@accurate_log.defjvp
def _accurate_log_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return accurate_log(x), t / x


@jax.custom_jvp
def fast_recip(x):
    """~f32-accurate reciprocal of a positive normal f32, no divide.

    Magic-constant seed (~max 3.4e-2 rel) + two Newton iterations
    (error squares each round -> ~1.2e-6 then below f32 rounding).
    Measured on v5e (2026-08-20, scan-timed render stage, batch 125):
    the centroid-correction term costs 0.110 ms/iter with the hardware
    divide vs 0.041 ms with this recipe — TPU f32 divide is a
    many-cycle serial op, exactly what the scalar-params docstring
    folds out of the per-pixel path elsewhere.

    Contract mirrors :func:`accurate_log_unsafe`: positive NORMAL f32
    input (callers clamp), garbage — not NaN — otherwise.  Non-f32
    falls through to the hardware divide.
    """
    x = jnp.asarray(x)
    if not _is_f32(x):
        return 1.0 / x
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    r = jax.lax.bitcast_convert_type(
        np.int32(0x7EF311C3) - bits, jnp.float32
    )
    r = r * (2.0 - x * r)
    r = r * (2.0 - x * r)
    return r


@fast_recip.defjvp
def _fast_recip_jvp(primals, tangents):
    # exact analytic rule: the bitcast seed has a zero cotangent path,
    # so autodiff through the raw recipe would be ~1e-2 wrong
    (x,), (t,) = primals, tangents
    r = fast_recip(x)
    return r, -r * r * t


def _exp_poly(r):
    """Degree-7 Taylor for exp on the reduced argument (<5e-9 rel for
    |r| <= ln2/2; ~1e-4 at |r| ~ 0.72, the safe path's top octave)."""
    p = np.float32(1 / 5040.0)
    p = p * r + np.float32(1 / 720.0)
    p = p * r + np.float32(1 / 120.0)
    p = p * r + np.float32(1 / 24.0)
    p = p * r + np.float32(1 / 6.0)
    p = p * r + np.float32(0.5)
    p = p * r + np.float32(1.0)
    return p * r + np.float32(1.0)


def _pow2i(ki):
    """Exact 2^ki via exponent bits; ki must be in [-126, 127]."""
    return jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)


@jax.custom_jvp
def accurate_exp_unsafe(a):
    """~1-ulp f32 exp for the hot path: NaN in -> garbage finite out,
    and the result SATURATES at exp(88) for a > 88 (instead of going to
    inf at f32 max like :func:`accurate_exp`) — the [-87, 88] clamp is
    what keeps the 2^k exponent bits in range without a second integer
    clip.  Callers' arguments are bounded far below +88 (Sersic
    exponents are <= ~0.5*log(r^2) ~ 35).  Non-f32 dtypes fall through
    to the hardware op.
    """
    a = jnp.asarray(a)
    if not _is_f32(a):
        return jnp.exp(a)
    # |k| <= round(88 * 1.4427) = 127: the exponent bits stay valid
    a_clamped = jnp.clip(a, _EXP_LO, np.float32(88.0))
    k = jnp.round(a_clamped * _INV_LN2)
    r = (a_clamped - k * _LN2_HI) - k * _LN2_LO  # |r| <= ln2/2
    result = _exp_poly(r) * _pow2i(k.astype(jnp.int32))
    return jnp.where(a < _EXP_LO, 0.0, result)


@accurate_exp_unsafe.defjvp
def _accurate_exp_unsafe_jvp(primals, tangents):
    (a,), (t,) = primals, tangents
    y = accurate_exp_unsafe(a)
    return y, y * t


@jax.custom_jvp
def accurate_exp(a):
    """~1-ulp float32 exp with full edge behavior.

    Underflows to 0 below exp(-87) (f32 subnormals flush), stays finite
    through the top octave up to exp(88.72) ~ f32 max (~1e-4 accurate
    there — the 2^k clip stretches the polynomial argument), overflows
    to inf beyond, and propagates NaN.  Non-f32 dtypes fall through to
    the hardware op.
    """
    a = jnp.asarray(a)
    if not _is_f32(a):
        return jnp.exp(a)
    a_clamped = jnp.clip(a, _EXP_LO, _EXP_HI)
    k = jnp.round(a_clamped * _INV_LN2)
    # keep 2^k representable; the residual r absorbs the difference in
    # the top octave (|r| up to ~0.72 there)
    ki = jnp.clip(k.astype(jnp.int32), -126, 127)
    kf = ki.astype(jnp.float32)
    r = (a_clamped - kf * _LN2_HI) - kf * _LN2_LO
    result = _exp_poly(r) * _pow2i(ki)
    result = jnp.where(a < _EXP_LO, 0.0, result)
    result = jnp.where(a > _EXP_HI, jnp.inf, result)
    return jnp.where(jnp.isnan(a), jnp.nan, result)


@accurate_exp.defjvp
def _accurate_exp_jvp(primals, tangents):
    (a,), (t,) = primals, tangents
    y = accurate_exp(a)
    return y, y * t
