"""Fused Sersic+sky raw-model render as a Pallas TPU kernel.

One kernel invocation renders a whole walker's raw model image —
sky offset plus every Sersic component — in a single VMEM pass: the
coordinate grids are generated in-register (``broadcasted_iota``), the
per-component math (:func:`psfmc_tpu.ops.sersic.sersic_profile_core`,
the same single definition the XLA renderer uses) accumulates into one
(H, W) block, and the image is written to HBM exactly once.
Grid = (nwalkers,); the per-walker scalar parameters ride in as a small
VMEM block.

Point sources stay outside the kernel: they render as separable rank-1
outer products (ops.pointsource.render_pointsource_dense), which XLA
already fuses well.

The pure-XLA path remains the default — measured end-to-end it wins
because the pallas_call boundary blocks XLA from fusing the render into
the downstream convolution stages (bench: 1.13 s pallas vs 1.10 s XLA
at the time of measurement).  The kernel is selected with
``PSFMC_RENDER=pallas`` or ``render_mode='pallas'`` and is validated
against the XLA renderer in tests and on hardware (1.7e-8 relative
parity on v5e).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..fastmath import exp_log_fns_unsafe
from ..sersic import sersic_profile_core, sersic_scalar_params

__all__ = ["render_sersics_pallas", "pack_sersic_params", "pallas_available"]

# packed parameter layout per Sersic:
# [x, y, m00, m01, m10, m11, kappa, radius_pow, sbeff]
PARAMS_PER_SERSIC = 9


def pallas_available():
    """True where the kernel can actually run: TPU (compiled) or CPU
    (interpret mode).  Other backends (GPU) cannot lower Mosaic kernels
    and get False."""
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:  # pragma: no cover
        return False
    return jax.default_backend() in ("tpu", "cpu")


def pack_sersic_params(xy, mag, reff, reff_b, index, angle, mag_zp,
                       angle_degrees, kappa_mode="table"):
    """Precompute the 9 per-component scalars the kernel consumes.

    All the scalar-heavy work (kappa inversion, flux normalization,
    inverse scale+rotation matrix) happens here in plain XLA, once per
    walker per component — the kernel sees only cheap per-pixel math.
    Same scalar definitions as the XLA renderer
    (:func:`..sersic.sersic_scalar_params`).
    """
    return jnp.stack(
        sersic_scalar_params(
            xy, mag, reff, reff_b, index, angle, mag_zp, angle_degrees,
            kappa_mode,
        )
    )


def _make_kernel(num_sersics, h, w, dtype):
    # trace-time selection, identical to the XLA renderer's choice:
    # accurate software exp/log on TPU, hardware ops on CPU/interpret
    exp_, log_ = exp_log_fns_unsafe()

    def kernel(params_ref, sky_ref, out_ref):
        # Mosaic's tpu.iota is integer-only; generate int32 and convert.
        xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(dtype)
        yg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(dtype)
        acc = jnp.full((h, w), sky_ref[0, 0], dtype)
        for s in range(num_sersics):
            x = params_ref[s, 0]
            y = params_ref[s, 1]
            acc = acc + sersic_profile_core(
                xg - x,
                yg - y,
                params_ref[s, 2],
                params_ref[s, 3],
                params_ref[s, 4],
                params_ref[s, 5],
                params_ref[s, 6],
                params_ref[s, 7],
                params_ref[s, 8],
                exp_,
                log_,
            )
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


# -- walker-tiled variant (round-3 VMEM experiment) -----------------------

def _make_tiled_kernel(tile, num_sersics, h, w, dtype):
    exp_, log_ = exp_log_fns_unsafe()

    def kernel(params_ref, sky_ref, out_ref):
        xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(dtype)
        yg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(dtype)
        for t in range(tile):
            acc = jnp.full((h, w), sky_ref[t, 0, 0], dtype)
            for s in range(num_sersics):
                acc = acc + sersic_profile_core(
                    xg - params_ref[t, s, 0],
                    yg - params_ref[t, s, 1],
                    params_ref[t, s, 2],
                    params_ref[t, s, 3],
                    params_ref[t, s, 4],
                    params_ref[t, s, 5],
                    params_ref[t, s, 6],
                    params_ref[t, s, 7],
                    params_ref[t, s, 8],
                    exp_,
                    log_,
                )
            out_ref[t, :, :] = acc

    return kernel


def _pick_tile(batch):
    """Largest divisor of ``batch`` <= 25 (VMEM: tile x 64 KB images)."""
    for t in (25, 16, 10, 8, 5, 4, 2):
        if batch % t == 0:
            return t
    return 1


def render_sersics_pallas_tiled(params, sky, shape, tile=None,
                                interpret=None):
    """Walker-TILED batched render: (B, S, 9) -> (B, H, W).

    The round-2 per-walker kernel runs one grid step per walker (vmap's
    Pallas batching rule); this variant gives each kernel invocation a
    TILE of walkers so per-launch overhead amortizes and Mosaic can
    pipeline the output DMA of walker t against the compute of t+1.
    The verdict-requested VMEM experiment (SURVEY.md section 2 item 16);
    selected with ``PSFMC_RENDER=pallas_tiled``.  Measured result is
    recorded in CLAUDE.md next to the other Pallas verdicts.
    """
    from jax.experimental import pallas as pl

    b, num_sersics, _ = params.shape
    h, w = shape
    dtype = params.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile is None:
        tile = _pick_tile(b)
    elif b % tile:
        # grid=(b//tile,) would silently leave the trailing b%tile
        # walkers' output rows unwritten (garbage, no error)
        raise ValueError(f"tile={tile} does not divide the batch {b}")

    kernel = _make_tiled_kernel(tile, num_sersics, h, w, dtype)
    # sky rides as a rank-3 (B, 1, 1) operand: Mosaic requires the last
    # two block dims be 8/128-divisible OR equal to the full array dims
    # (a (tile, 1) block of a (B, 1) array is REJECTED on hardware —
    # the exact failure class the round-2 lnpost kernel hit; interpret
    # mode never catches it)
    return pl.pallas_call(
        kernel,
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, num_sersics, PARAMS_PER_SERSIC),
                         lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, 1, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), dtype),
        interpret=interpret,
    )(params, jnp.reshape(sky, (b, 1, 1)).astype(dtype))


def render_sersics_tiled_vmappable(shape, interpret=None):
    """A per-walker render fn whose ``vmap`` lowers to the TILED kernel.

    The posterior traces per-walker (the sampler vmaps it); a plain
    pallas_call would batch to grid=(B,).  ``custom_vmap`` reroutes the
    batched call to :func:`render_sersics_pallas_tiled` instead.
    """
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def render(params, sky):
        return render_sersics_pallas_one(params, sky, shape, interpret)

    @render.def_vmap
    def _rule(axis_size, in_batched, params, sky):  # noqa: ANN001
        p_b, s_b = in_batched
        if not p_b:
            params = jnp.broadcast_to(params, (axis_size,) + params.shape)
        if not s_b:
            sky = jnp.broadcast_to(jnp.asarray(sky), (axis_size,))
        out = render_sersics_pallas_tiled(params, sky, shape,
                                          interpret=interpret)
        return out, True

    return render
