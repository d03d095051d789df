"""Inverse-variance-weighted Gaussian per-pixel log-likelihood.

Parity with the reference inner loop (``/root/reference/psfMC/models.py:
228-241``): over good pixels only,

    lnL = -1/2 * sum( resid^2 * ivm - log(ivm / (2 pi)) )

TPU-first design notes
----------------------
The reference uses boolean-mask fancy indexing (dynamic output shape);
under XLA we use a ``where``-masked dense reduction over the full static
image, which fuses with the residual/IVM math into one VPU pass.  The NaN
guard (reference models.py:240-241) is a ``jnp.where`` — no host branch.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["gaussian_lnlike"]


def gaussian_lnlike(resid, ivm, good_px):
    """Masked Gaussian log-likelihood; NaN -> -inf (jittable).

    ``good_px`` is a boolean map (True = use the pixel); bad pixels carry
    ``ivm == 0`` (infinite variance), so the ``where`` both excludes them
    from the sum and keeps ``log(0)`` out of the reduction.
    """
    from .fastmath import exp_log_fns

    _, log_ = exp_log_fns()  # TPU hw f32 log: ~1e-4 abs err (fastmath)
    term = resid * resid * ivm - log_(0.5 / jnp.pi * jnp.where(good_px, ivm, 1.0))
    lnl = -0.5 * jnp.sum(jnp.where(good_px, term, 0.0))
    return jnp.where(jnp.isfinite(lnl), lnl, -jnp.inf)
