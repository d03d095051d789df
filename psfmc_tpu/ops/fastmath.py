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
  degree-7 Taylor on r in [-0.35, 0.35] (truncation < 5e-9), exact
  2^k scaling through the exponent bits.

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


def needs_accurate_transcendentals() -> bool:
    """True on backends whose hw f32 exp/log are below ~1 ulp (TPU).

    ``PSFMC_FASTMATH=0`` forces the raw hardware ops everywhere (~14%
    faster end-to-end on v5e, at ~0.2 log-posterior units of likelihood
    noise — fine for exploratory runs, not for production posteriors).
    """
    import os

    if os.environ.get("PSFMC_FASTMATH", "1") == "0":
        return False
    return jax.default_backend() not in ("cpu",)


def exp_log_fns():
    """(exp, log) to use on the current backend — called at trace time.

    CPU's hardware ops are already correctly rounded (and faster than
    the software recipes); accelerators get the accurate versions.
    """
    if needs_accurate_transcendentals():
        return accurate_exp, accurate_log
    return jnp.exp, jnp.log


def exp_log_fns_unsafe():
    """Like :func:`exp_log_fns` but with the guard-free hot-path
    variants — for per-pixel code whose inputs are clamped positive and
    whose callers gate pathological thetas upstream."""
    if needs_accurate_transcendentals():
        return accurate_exp_unsafe, accurate_log_unsafe
    return jnp.exp, jnp.log


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def accurate_log(x):
    """~1-ulp float32 natural log for positive normal inputs.

    Matches ``jnp.log`` edge behavior: log(0) = -inf, log(neg) = nan,
    log(inf) = inf.  Subnormal inputs are flushed through the normal
    path (treated as the smallest normal), which is harmless for this
    package's callers (radii are clamped >= 1e-30).
    """
    x = _f32(x)
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
    result = e * _LN2_HI + ((e * _LN2_LO + poly) + (s + s))

    result = jnp.where(x == 0.0, -jnp.inf, result)
    result = jnp.where(x < 0.0, jnp.nan, result)
    result = jnp.where(jnp.isinf(x) & (x > 0), jnp.inf, result)
    result = jnp.where(jnp.isnan(x), jnp.nan, result)
    return result


def accurate_log_unsafe(x):
    """:func:`accurate_log` minus the edge-case selects (~6 VPU ops/px).

    Contract: ``x`` is a positive NORMAL float (caller clamps).  Any
    non-finite/zero/negative/subnormal input produces garbage, NOT NaN —
    only use where an upstream guard (e.g. the prior's finiteness gate)
    already rejects pathological parameter vectors.
    """
    x = _f32(x)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 126
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F000000, jnp.float32
    )
    small = m < _SQRT_HALF
    m = jnp.where(small, m + m, m)
    e = jnp.where(small, e - 1, e).astype(jnp.float32)
    s = (m - 1.0) / (m + 1.0)
    z = s * s
    poly = np.float32(2 / 9.0)
    poly = poly * z + np.float32(2 / 7.0)
    poly = poly * z + np.float32(2 / 5.0)
    poly = poly * z + np.float32(2 / 3.0)
    poly = poly * z * s
    return e * _LN2_HI + ((e * _LN2_LO + poly) + (s + s))


def accurate_exp_unsafe(a):
    """:func:`accurate_exp` minus NaN propagation (keeps the under/
    overflow clamps — those double as the 2^k bit-range guard)."""
    a = _f32(a)
    a_clamped = jnp.clip(a, -87.0, 88.0)
    k = jnp.round(a_clamped * _INV_LN2)
    r = (a_clamped - k * _LN2_HI) - k * _LN2_LO
    p = np.float32(1 / 5040.0)
    p = p * r + np.float32(1 / 720.0)
    p = p * r + np.float32(1 / 120.0)
    p = p * r + np.float32(1 / 24.0)
    p = p * r + np.float32(1 / 6.0)
    p = p * r + np.float32(0.5)
    p = p * r + np.float32(1.0)
    p = p * r + np.float32(1.0)
    ki = k.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)
    return jnp.where(a < -87.0, 0.0, p * scale)


def accurate_exp(a):
    """~1-ulp float32 exp.

    Underflows to 0 below exp(-87.3) (the f32 subnormal range is
    flushed — invisible to any likelihood term) and overflows to inf
    above exp(88.7), matching hardware behavior at the extremes.
    """
    a = _f32(a)
    # clamp so the 2^k bit construction below stays in the normal range
    a_clamped = jnp.clip(a, -87.0, 88.0)
    k = jnp.round(a_clamped * _INV_LN2)
    r = (a_clamped - k * _LN2_HI) - k * _LN2_LO  # |r| <= ln2/2 = 0.347

    # degree-7 Taylor, truncation < 5e-9 relative on [-0.35, 0.35]
    p = np.float32(1 / 5040.0)
    p = p * r + np.float32(1 / 720.0)
    p = p * r + np.float32(1 / 120.0)
    p = p * r + np.float32(1 / 24.0)
    p = p * r + np.float32(1 / 6.0)
    p = p * r + np.float32(0.5)
    p = p * r + np.float32(1.0)
    p = p * r + np.float32(1.0)

    # exact 2^k via exponent bits (k in [-126, 127] after the clamp)
    ki = k.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)
    result = p * scale

    result = jnp.where(a < -87.0, 0.0, result)
    result = jnp.where(a > 88.0, jnp.inf, result)
    result = jnp.where(jnp.isnan(a), jnp.nan, result)
    return result
