"""Unconstraining reparameterization of the model parameter vector.

Gradient-based samplers (HMC/NUTS, :mod:`psfmc_tpu.sampler.nuts`) need
an unconstrained space: the priors have hard supports (Uniform
intervals, Weibull lower bounds, ...) and the Sersic components carry
the joint constraint ``reff >= reff_b`` (reference Sersic.py:41-45).
This module compiles a :class:`~psfmc_tpu.models.spec.ModelSpec` into a
smooth bijection ``z in R^m  <->  theta_continuous`` with a tractable
log-Jacobian:

* interval support ``(a, b)``     -> ``x = a + (b-a) * sigmoid(z)``
* lower-bounded support ``(a, inf)`` -> ``x = a + softplus(z)``
* upper-bounded support ``(-inf, b)`` -> ``x = b - softplus(z)``
* unbounded                        -> identity
* Sersic ``reff_b`` gets the DEPENDENT upper bound ``min(b, reff)``:
  the interval transform's upper edge follows the (already transformed)
  ``reff`` value, so the joint constraint holds by construction and the
  posterior keeps the reference's exact unnormalized density (the
  constraint indicator is always 1; only the Jacobian changes, which is
  accounted for).  Without this, the constraint would be a hard wall
  mid-space that HMC trajectories crash into.
* discrete slots (the PSF index, reference PSFSelector.py:27-30) are
  EXCLUDED from z — the sampler marginalizes or Gibbs-samples them.

The target density in z-space is
``lnpost_u(z) = lnpost(theta(z)) + log|d theta / d z|``.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .spec import ModelSpec

__all__ = ["UnconstrainingTransform", "build_transform", "transform_token"]

_IDENTITY, _INTERVAL, _LOWER, _UPPER = 0, 1, 2, 3


def _accurate_nn_fns():
    """(sigmoid, softplus, log_sigmoid) at trace time.

    On TPU the hardware f32 exp inside ``jax.nn.sigmoid`` carries ~6e-6
    relative error; through a 16-px prior width and a sharp imaging
    likelihood (|dlnL/dtheta| ~ 1e5) that surfaces as O(1)
    log-posterior noise — enough to destabilize leapfrog integration.
    Build the transforms from the ~1-ulp fastmath recipes instead
    (CPU keeps the correctly-rounded hardware ops).
    """
    from ..ops.fastmath import exp_log_fns, needs_accurate_transcendentals

    if not needs_accurate_transcendentals():
        return (
            jax.nn.sigmoid,
            lambda z: jnp.logaddexp(0.0, z),
            lambda z: -jnp.logaddexp(0.0, -z),
        )
    exp_, log_ = exp_log_fns()

    def sigmoid(z):
        return 1.0 / (1.0 + exp_(-z))

    def softplus(z):
        # stable both tails: z>0 -> z + log1p(exp(-z)), else log1p(exp(z))
        a = jnp.where(z > 0, -z, z)
        l1p = log_(1.0 + exp_(a))
        return jnp.where(z > 0, z + l1p, l1p)

    def log_sigmoid(z):
        return -softplus(-z)

    return sigmoid, softplus, log_sigmoid


def _softplus_inv(x):
    # log(expm1(x)), stable for large x
    x = np.asarray(x, np.float64)
    return x + np.log(-np.expm1(-x))


class UnconstrainingTransform:
    """Bijection between unconstrained z and the continuous part of theta.

    ``theta`` is the sampler's full flat vector (``spec.num_params``);
    ``z`` has one element per CONTINUOUS scalar slot element
    (``self.num_unconstrained``).  Discrete slot offsets are listed in
    ``self.discrete_offsets`` and are left at a placeholder value by
    :meth:`to_constrained` — callers substitute / marginalize them.
    """

    def __init__(self, spec: ModelSpec, dtype=jnp.float32):
        self.spec = spec
        self.dtype = dtype

        kinds: List[int] = []
        lo: List[float] = []
        hi: List[float] = []
        offsets: List[int] = []  # theta offset per z element
        discrete: List[int] = []
        # z index of each theta offset (for the dependent reff_b bound)
        z_index_of_offset: Dict[int, int] = {}

        for slot in spec.slots:
            if slot.is_discrete:
                for j in range(slot.size):
                    discrete.append(slot.offset + j)
                continue
            a, b = slot.dist.rv_frozen.support()
            a = np.broadcast_to(np.asarray(a, np.float64), (slot.size,))
            b = np.broadcast_to(np.asarray(b, np.float64), (slot.size,))
            for j in range(slot.size):
                aj, bj = float(a[j]), float(b[j])
                if np.isfinite(aj) and np.isfinite(bj):
                    kinds.append(_INTERVAL)
                elif np.isfinite(aj):
                    kinds.append(_LOWER)
                elif np.isfinite(bj):
                    kinds.append(_UPPER)
                else:
                    kinds.append(_IDENTITY)
                lo.append(aj if np.isfinite(aj) else 0.0)
                hi.append(bj if np.isfinite(bj) else 0.0)
                z_index_of_offset[slot.offset + j] = len(offsets)
                offsets.append(slot.offset + j)

        self.kinds = np.asarray(kinds, np.int32)
        self.lo = np.asarray(lo, np.float64)
        self.hi = np.asarray(hi, np.float64)
        self.offsets = np.asarray(offsets, np.int32)
        self.discrete_offsets = np.asarray(discrete, np.int32)
        self.num_unconstrained = len(offsets)

        # Axis-ordered (major, minor) pairs as z indices — Sersic
        # (reff, reff_b) and Moffat (fwhm, fwhm_b) — where BOTH the
        # constrained pair members exist.  The minor-axis slot's OWN
        # prior support decides the transform family the dependent
        # upper bound composes with (an interval prior keeps the
        # two-sided sigmoid; a lower-bounded prior becomes a dynamic
        # interval [lo, major]; upper-bounded/unbounded priors become a
        # dynamic upper bound) — assuming interval-only here would
        # leave the hi=0 placeholder in the bound and collapse the
        # transform for e.g. a Weibull reff_b prior.
        self.reffb_pairs: List[Tuple[int, int, int]] = []  # (zb, za, kind)
        axis_pairs = {"sersic": ("reff", "reff_b"),
                      "moffat": ("fwhm", "fwhm_b"),
                      "king": ("rc", "rc_b"),
                      "ferrer": ("rout", "rout_b"),
                      "nuker": ("rb", "rb_b")}
        for cs in spec.comp_specs:
            if cs.kind not in axis_pairs:
                continue
            a_name, b_name = axis_pairs[cs.kind]
            kind_b, payload_b = cs.params[b_name]
            if kind_b != "theta":
                continue
            zb = z_index_of_offset[payload_b[0]]
            kb = int(self.kinds[zb])
            kind_a, payload_a = cs.params[a_name]
            if kind_a == "theta":
                self.reffb_pairs.append(
                    (zb, z_index_of_offset[payload_a[0]], kb)
                )
            else:
                # constant major axis: fold the bound in statically,
                # upgrading the transform family where needed
                a_val = float(payload_a)
                if kb == _INTERVAL:
                    self.hi[zb] = min(self.hi[zb], a_val)
                elif kb == _LOWER:
                    self.kinds[zb] = _INTERVAL
                    self.hi[zb] = a_val
                elif kb == _UPPER:
                    self.hi[zb] = min(self.hi[zb], a_val)
                else:  # unbounded prior: now upper-bounded
                    self.kinds[zb] = _UPPER
                    self.hi[zb] = a_val
        self._reffb_z = frozenset(zb for zb, _za, _kb in self.reffb_pairs)
        self._pair_by_zb = {
            zb: (za, kb) for zb, za, kb in self.reffb_pairs
        }

    def cache_token(self):
        """Hashable signature of the bijection, for program caches.

        Two transforms with equal tokens define the same map; compiled
        programs that bake transform structure in must key on this (a
        cache shared across different transforms would decode z with
        the wrong bijection).
        """
        return (
            tuple(int(k) for k in self.kinds),
            tuple(int(o) for o in self.offsets),
            self.lo.tobytes(),
            self.hi.tobytes(),
            tuple(self.reffb_pairs),
            tuple(int(o) for o in self.discrete_offsets),
        )

    # -- z -> theta ---------------------------------------------------------
    def to_constrained(self, z):
        """(theta, log|J|): full theta vector + transform log-Jacobian.

        Discrete slots are filled with 0; substitute before use.
        """
        z = jnp.asarray(z, self.dtype)
        kinds = self.kinds
        lo = jnp.asarray(self.lo, self.dtype)
        hi = jnp.asarray(self.hi, self.dtype)
        sigmoid_, softplus_, log_sigmoid_ = _accurate_nn_fns()

        # safe width: jnp.select evaluates every branch, and a log(0) or
        # 0*inf in an unselected branch still poisons gradients (NaN
        # backprop through select) — mask before, not after
        width = jnp.where(kinds == _INTERVAL, hi - lo, 1.0)
        x_interval = lo + width * sigmoid_(z)
        ld_interval = jnp.log(width) + log_sigmoid_(z) + log_sigmoid_(-z)
        x_lower = lo + softplus_(z)
        ld_lower = log_sigmoid_(z)
        x_upper = hi - softplus_(z)
        ld_upper = log_sigmoid_(z)

        x = jnp.select(
            [kinds == _INTERVAL, kinds == _LOWER, kinds == _UPPER],
            [x_interval, x_lower, x_upper],
            z,
        )
        ld = jnp.select(
            [kinds == _INTERVAL, kinds == _LOWER, kinds == _UPPER],
            [ld_interval, ld_lower, ld_upper],
            jnp.zeros_like(z),
        )

        # dependent minor-axis upper bound, composed with the slot's
        # own prior support (kb is static, so this branches at trace
        # time)
        for zb, za, kb in self.reffb_pairs:
            major = x[za]
            if kb in (_INTERVAL, _LOWER):
                b_eff = (
                    jnp.minimum(hi[zb], major) if kb == _INTERVAL else major
                )
                w = b_eff - lo[zb]
                ok = w > 0
                w_safe = jnp.where(ok, w, 1.0)
                xb = lo[zb] + w_safe * sigmoid_(z[zb])
                ldb = jnp.where(
                    ok,
                    jnp.log(w_safe)
                    + log_sigmoid_(z[zb])
                    + log_sigmoid_(-z[zb]),
                    -jnp.inf,
                )
            else:
                # upper-bounded (possibly by both hi and the major
                # axis) with no lower edge: x = b_eff - softplus(z)
                b_eff = (
                    jnp.minimum(hi[zb], major) if kb == _UPPER else major
                )
                xb = b_eff - softplus_(z[zb])
                ldb = log_sigmoid_(z[zb])
            x = x.at[zb].set(xb)
            ld = ld.at[zb].set(ldb)

        theta = jnp.zeros(self.spec.num_params, self.dtype)
        theta = theta.at[jnp.asarray(self.offsets)].set(x)
        return theta, jnp.sum(ld)

    # -- theta -> z (host-side; initialization only) --------------------------
    def to_unconstrained(self, theta):
        """Inverse map (numpy, f64).  theta may be (dim,) or (n, dim)."""
        theta = np.asarray(theta, np.float64)
        squeeze = theta.ndim == 1
        theta = np.atleast_2d(theta)
        x = theta[:, self.offsets]
        z = np.array(x)  # identity default
        eps = 1e-9
        for i in range(self.num_unconstrained):
            pair = self._pair_by_zb.get(i)
            if pair is not None:
                # dependent minor-axis slot: invert against its ORIGINAL
                # prior kind with the dynamic upper bound folded in
                za, kb = pair
                if kb in (_INTERVAL, _LOWER):
                    b = (
                        np.minimum(self.hi[i], x[:, za])
                        if kb == _INTERVAL
                        else x[:, za]
                    )
                    w = b - self.lo[i]
                    p = np.clip((x[:, i] - self.lo[i]) / w, eps, 1 - eps)
                    z[:, i] = np.log(p) - np.log1p(-p)
                else:
                    b = (
                        np.minimum(self.hi[i], x[:, za])
                        if kb == _UPPER
                        else x[:, za]
                    )
                    z[:, i] = _softplus_inv(np.maximum(b - x[:, i], eps))
                continue
            k = self.kinds[i]
            if k == _INTERVAL:
                w = self.hi[i] - self.lo[i]
                p = np.clip((x[:, i] - self.lo[i]) / w, eps, 1 - eps)
                z[:, i] = np.log(p) - np.log1p(-p)
            elif k == _LOWER:
                z[:, i] = _softplus_inv(np.maximum(x[:, i] - self.lo[i], eps))
            elif k == _UPPER:
                z[:, i] = _softplus_inv(np.maximum(self.hi[i] - x[:, i], eps))
        return z[0] if squeeze else z


def build_transform(spec: ModelSpec, dtype=jnp.float32) -> UnconstrainingTransform:
    return UnconstrainingTransform(spec, dtype=dtype)


def transform_token(transform):
    """Cache token for any transform-like object.

    Uses the object's own :meth:`UnconstrainingTransform.cache_token`
    when present; custom duck-typed transforms fall back to object
    identity (correct — never shared — though not persistent).
    """
    fn = getattr(transform, "cache_token", None)
    return fn() if fn is not None else ("transform-id", id(transform))
