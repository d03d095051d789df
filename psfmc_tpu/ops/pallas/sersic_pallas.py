"""Fused Sersic+sky raw-model render as a Pallas TPU kernel.

One kernel invocation renders a whole walker's raw model image —
sky offset plus every Sersic component — in a single VMEM pass: the
coordinate grids are generated in-register (``broadcasted_iota``), the
per-component math (identical to :func:`psfmc_tpu.ops.sersic.render_sersic`'s
algebraic form) accumulates into one (H, W) block, and the image is
written to HBM exactly once.  Grid = (nwalkers,); the per-walker scalar
parameters ride in as a small VMEM block.

Point sources stay outside the kernel: their 7x7 scatter is a trivial
XLA dynamic-update-slice, while a dense in-kernel evaluation would add
four ``sin`` evaluations per pixel per source — more transcendental work
than the Sersic profiles themselves.

The pure-XLA path remains the default (XLA already fuses this chain
well); the kernel is selected with ``PSFMC_RENDER=pallas`` or
``render_mode='pallas'`` and is validated against the XLA renderer in
tests (exact same arithmetic, same tolerances).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..fastmath import accurate_exp, accurate_log

__all__ = ["render_sersics_pallas", "pack_sersic_params", "pallas_available"]

_TINY = 1e-30
# packed parameter layout per Sersic:
# [x, y, m00, m01, m10, m11, kappa, radius_pow, sbeff]
PARAMS_PER_SERSIC = 9


def pallas_available():
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:  # pragma: no cover
        return False
    return jax.default_backend() != "cpu" or _interpret_ok()


def _interpret_ok():
    # CPU runs use interpret mode (tests); always available.
    return True


def pack_sersic_params(xy, mag, reff, reff_b, index, angle, mag_zp,
                       angle_degrees, kappa_mode="table"):
    """Precompute the 9 per-component scalars the kernel consumes.

    All the scalar-heavy work (kappa inversion, flux normalization,
    inverse scale+rotation matrix) happens here in plain XLA, once per
    walker per component — the kernel sees only cheap per-pixel math.
    """
    from ..coords import mag_to_flux
    from ..sersic import sersic_kappa, sersic_sb_eff

    kappa = sersic_kappa(index, mode=kappa_mode)
    flux = mag_to_flux(mag, mag_zp)
    sbeff = sersic_sb_eff(flux, index, reff, reff_b, kappa)
    ang = jnp.deg2rad(angle) if angle_degrees else angle
    ang = ang + 0.5 * jnp.pi
    sin_a, cos_a = jnp.sin(ang), jnp.cos(ang)
    return jnp.stack(
        [
            xy[0],
            xy[1],
            cos_a / reff,
            sin_a / reff,
            -sin_a / reff_b,
            cos_a / reff_b,
            kappa,
            0.5 / index,
            sbeff,
        ]
    )


def _make_kernel(num_sersics, h, w, dtype):
    def kernel(params_ref, sky_ref, out_ref):
        # Mosaic's tpu.iota is integer-only; generate int32 and convert.
        xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(dtype)
        yg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(dtype)
        acc = jnp.full((h, w), sky_ref[0, 0], dtype)
        for s in range(num_sersics):
            x = params_ref[s, 0]
            y = params_ref[s, 1]
            m00 = params_ref[s, 2]
            m01 = params_ref[s, 3]
            m10 = params_ref[s, 4]
            m11 = params_ref[s, 5]
            kappa = params_ref[s, 6]
            rp = params_ref[s, 7]
            sbeff = params_ref[s, 8]

            dx = xg - x
            dy = yg - y
            u = m00 * dx + m01 * dy
            v = m10 * dx + m11 * dy
            sq_r = jnp.maximum(u * u + v * v, _TINY)
            # half-pixel-corner clamp: see ops.sersic.render_sersic
            sq_off = jnp.maximum(dx * dx + dy * dy, 0.125)
            # accurate software exp/log (TPU hw f32 versions are too
            # coarse for the likelihood — see ops.fastmath); these are
            # bitcast+polynomial recipes that lower in Mosaic directly
            p = accurate_exp(accurate_log(sq_r) * rp)
            sb = accurate_exp(-kappa * (p - 1.0))
            krp_p = kappa * rp * p
            corr = 1.0 + (krp_p * krp_p) / (3.0 * sq_off)
            acc = acc + sbeff * sb * corr
        out_ref[...] = acc

    return kernel


def render_sersics_pallas_one(params, sky, shape, interpret=None):
    """Render one walker's (H, W) raw model from packed params.

    ``params`` is (S, 9) (:func:`pack_sersic_params` rows), ``sky`` a
    scalar.  vmap adds the walker batch dimension — Pallas's batching
    rule turns it into a leading kernel grid axis, so the vmapped call
    is one kernel launch over the whole half-ensemble.
    """
    from jax.experimental import pallas as pl

    num_sersics, _ = params.shape
    h, w = shape
    dtype = params.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    kernel = _make_kernel(num_sersics, h, w, dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), dtype),
        interpret=interpret,
    )(params, jnp.reshape(sky, (1, 1)).astype(dtype))


def render_sersics_pallas(params, sky, shape, interpret=None):
    """Batched convenience wrapper: (B, S, 9) params -> (B, H, W)."""
    return jax.vmap(
        lambda p, s: render_sersics_pallas_one(p, s, shape, interpret)
    )(params, sky)
