"""Walker-BATCHED fused conv+likelihood Pallas kernel.

The round-2/3 fused kernels (``lnpost_pallas``) run one grid program per
walker, so every DFT stage is a small (H, ~W2) GEMM: the MXU spends as
long filling/draining the systolic array as streaming it, which is the
measured 21% end-to-end gap vs XLA's walker-batched einsums (CLAUDE.md,
2026-08-17 A/B).  This kernel closes that structurally by giving each
program a TILE of T walkers and batching every dot over the tile:

* w-direction stages (right-multiplications) batch walkers into the GEMM
  **M** dimension — the tile rides as ``(T*H, W)`` rows;
* h-direction stages (left-multiplications) batch walkers into the GEMM
  **N** dimension — ``(H, T*W)`` columns;
* the two layout switches per convolution are lane-/sublane-aligned
  ``concatenate`` s of per-walker slabs (W is the lane width, so slab
  boundaries fall on hardware tile boundaries for the 128-wide flagship
  — no true transposes anywhere).

The half-spectrum width W2 = W//2+1 is zero-padded to W at build time
(zero *columns* of the forward mats, zero *rows* of the inverse mats),
which costs nothing on the MXU — a single walker's N=W2 already pads to
a full lane tile — and keeps every buffer a uniform (.., W) shape so the
relayout concatenations stay aligned.

Unlike ``lnpost_pallas`` the RENDER STAYS IN XLA (vmapped, fused with
the per-walker scalar prep): the kernel consumes the (B, H, W) raw
model images, so it is component-agnostic — any mix of Sersic, Moffat,
point sources and sky works, not just the whitelisted flagship set.
One image-sized HBM round-trip per walker is reintroduced (~64 KB,
~0.1 us at HBM rate) in exchange for full generality and XLA keeping
the render fused with the scalar math.

Scope: single-PSF models (any convolution mode — the kernel carries its
own DFT operator set).  Selected with ``PSFMC_LNPOST=pallas_batched``;
tile via ``PSFMC_LNPOST_TILE`` (default 8: ~8 MB VMEM at 128x128).
The XLA path remains the default unless this measures faster end-to-end
(tools/ab_headline.py) — record the verdict in CLAUDE.md either way.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..fastmath import exp_log_fns
from ..fourier import rdft_matrices
from .sersic_pallas import pallas_available

__all__ = ["batched_lnl_supported", "make_batched_conv_lnl"]


def batched_lnl_supported(spec):
    """Single PSF + Gaussian likelihood + no gradient sky: per-walker
    kernel selection would need every PSF's half-spectrum resident per
    program plus per-walker gathers; the kernel reduction hard-codes
    the Gaussian family; and the post-convolution background plane
    (posterior._sky_plane) has no insertion point inside the fused
    conv+likelihood kernel."""
    flat_sky = all(
        not ({"dx", "dy"} & set(cs.params))
        for cs in getattr(spec, "comp_specs", ())
        if cs.kind == "sky"
    )
    # a sampled NoiseScale rescales the variance inside the likelihood;
    # the kernel's reduction hard-codes the unscaled budget
    no_noise_scale = all(
        cs.kind != "noisescale"
        for cs in getattr(spec, "comp_specs", ())
    )
    return (
        pallas_available()
        and getattr(spec, "num_psfs", 1) == 1
        and getattr(spec, "likelihood", "gaussian") == "gaussian"
        and flat_sky
        and no_noise_scale
        and getattr(spec, "conv_pad", 0) == 0
    )


def _dot_fns(dtype, dot_mode):
    def dot_highest(a, b):
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype,
        )

    def dot_bf16x3(a, b):
        # same emulated 3-pass bf16 scheme as lnpost_pallas._make_kernel
        # (Mosaic has no native HIGH precision): hi/lo bf16 splits are
        # exact in f32, three significant cross products, f32 accum
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(dtype)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(dtype)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(
                x, y,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )

        return d(ah, bh) + d(ah, bl) + d(al, bh)

    return dot_bf16x3 if dot_mode == "bf16x3" else dot_highest


def _make_kernel(tile, h, w, dtype, dot_mode):
    _, log_safe = exp_log_fns()
    inv_2pi = float(0.5 / np.pi)
    dot = _dot_fns(dtype, dot_mode)

    def lane_cat(m):
        # (T*H, W) M-batched -> (H, T*W) N-batched: stack the per-walker
        # row slabs along lanes (slab edges are multiples of H rows / W
        # lanes — wholesale tile moves, no intra-tile shuffles at 128)
        return jnp.concatenate(
            [m[t * h:(t + 1) * h, :] for t in range(tile)], axis=1
        )

    def row_cat(m):
        # (H, T*W) -> (T*H, W): inverse relayout
        return jnp.concatenate(
            [m[:, t * w:(t + 1) * w] for t in range(tile)], axis=0
        )

    def kernel(
        raw_ref,  # (T, H, W) rendered raw models
        cw_ref, sw_ref,  # (W, W)  forward-w, W2 cols zero-padded
        ch_ref, sh_ref,  # (H, H)  forward-h
        ich_ref, ish_ref,  # (H, H) inverse-h (ifftshift folded)
        ica_ref, isa_ref,  # (W, W) inverse-w, rows W2.. zero-padded
        psf_r_ref, psf_i_ref,  # (H, W) kernel half-spectra, padded
        var_r_ref, var_i_ref,  # (H, W)
        obs_ref, obs_var_ref, good_ref,  # (H, W); good as {0,1} dtype
        out_ref,  # (T, 1, 1)
    ):
        x = jnp.reshape(raw_ref[...], (tile * h, w))

        def convolve(img, kr, ki):
            # forward along w: S1 = img @ (cw - i sw), M-batched
            s1r = dot(img, cw_ref[...])
            s1i = -dot(img, sw_ref[...])
            fr = lane_cat(s1r)
            fi = lane_cat(s1i)
            # forward along h: S2 = (ch - i sh) @ S1, N-batched
            s2r = dot(ch_ref[...], fr) + dot(sh_ref[...], fi)
            s2i = dot(ch_ref[...], fi) - dot(sh_ref[...], fr)
            # kernel multiply (kernels lane-tiled across the walker tile;
            # their zero pad columns keep the dead half-spectrum zero)
            krt = jnp.concatenate([kr] * tile, axis=1)
            kit = jnp.concatenate([ki] * tile, axis=1)
            s3r = s2r * krt - s2i * kit
            s3i = s2r * kit + s2i * krt
            # inverse along h: S4 = (ich + i ish) @ S3, N-batched
            s4r = dot(ich_ref[...], s3r) - dot(ish_ref[...], s3i)
            s4i = dot(ich_ref[...], s3i) + dot(ish_ref[...], s3r)
            gr = row_cat(s4r)
            gi = row_cat(s4i)
            # inverse along w (hermitian weights in ica/isa), M-batched
            return dot(gr, ica_ref[...]) - dot(gi, isa_ref[...])

        conv = convolve(x, psf_r_ref[...], psf_i_ref[...])
        mvar = convolve(x * x, var_r_ref[...], var_i_ref[...])

        conv3 = jnp.reshape(conv, (tile, h, w))
        mvar3 = jnp.reshape(mvar, (tile, h, w))
        good = good_ref[...][None]  # broadcast over the walker tile
        ivm = 1.0 / (mvar3 + obs_var_ref[...][None])
        resid = obs_ref[...][None] - conv3
        # gaussian_lnlike semantics: bad px excluded, log fed 1 there
        safe_ivm = jnp.where(good > 0, ivm, 1.0)
        term = resid * resid * ivm - log_safe(inv_2pi * safe_ivm)
        # scale BEFORE reducing and reduce one axis at a time with
        # keepdims: a (T,) vector intermediate crashes Mosaic's vector
        # layout inference on hardware (layout.h Check arr.size() >=
        # layout_rank; interpret mode accepts it — measured 2026-08-17)
        term = jnp.where(good > 0, -0.5 * term, 0.0)
        out_ref[...] = jnp.sum(
            jnp.sum(term, axis=2, keepdims=True), axis=1, keepdims=True
        )

    return kernel


def make_batched_conv_lnl(constants, spec, dtype, tile=None,
                          interpret=None):
    """Build ``lnl_batch(raws) -> (B,)`` over rendered raw images.

    ``constants`` is the PosteriorFns constants dict (host numpy — it
    carries obs/var/mask; the DFT operator set and padded kernel
    half-spectra are built here so the kernel works under any
    ``PSFMC_CONV`` mode).
    """
    from jax.experimental import pallas as pl

    h, w = spec.shape
    w2 = w // 2 + 1
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile is None:
        tile = int(os.environ.get("PSFMC_LNPOST_TILE", "8"))

    rdtype = np.float32 if dtype == jnp.float32 else np.float64
    cw, sw, ch, sh, ich, ish, ica, isa = rdft_matrices((h, w), rdtype)

    def pad_cols(m):  # (X, W2) -> (X, W) zero columns
        return np.pad(m, ((0, 0), (0, w - w2)))

    def pad_rows(m):  # (W2, W) -> (W, W) zero rows
        return np.pad(m, ((0, w - w2), (0, 0)))

    shared = [
        pad_cols(cw), pad_cols(sw), ch, sh, ich, ish,
        pad_rows(ica), pad_rows(isa),
        pad_cols(np.asarray(spec.f_psf_stack.real[0], rdtype)),
        pad_cols(np.asarray(spec.f_psf_stack.imag[0], rdtype)),
        pad_cols(np.asarray(spec.f_var_stack.real[0], rdtype)),
        pad_cols(np.asarray(spec.f_var_stack.imag[0], rdtype)),
        np.asarray(constants["obs_data"], rdtype),
        np.asarray(constants["obs_var"], rdtype),
        np.asarray(constants["good_px"]).astype(rdtype),
    ]

    dot_mode = os.environ.get(
        "PSFMC_LNPOST_DOT", "bf16x3" if dtype == jnp.float32 else "highest"
    )
    kernel = _make_kernel(tile, h, w, dtype, dot_mode)

    def shared_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * nd)

    in_specs = [pl.BlockSpec((tile, h, w), lambda i: (i, 0, 0))] + [
        shared_spec(a.shape) for a in shared
    ]
    out_spec = pl.BlockSpec((tile, 1, 1), lambda i: (i, 0, 0))

    def lnl_batch(raws):
        raws = jnp.asarray(raws, dtype)
        b = raws.shape[0]
        bp = -(-b // tile) * tile  # pad to a whole number of tiles
        if bp != b:
            raws = jnp.pad(raws, ((0, bp - b), (0, 0), (0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(bp // tile,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((bp, 1, 1), dtype),
            interpret=interpret,
        )(raws, *shared)
        lnl = out[:b, 0, 0]
        return jnp.where(jnp.isfinite(lnl), lnl, -jnp.inf)

    return lnl_batch
