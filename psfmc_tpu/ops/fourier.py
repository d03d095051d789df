"""FFT-based PSF convolution.

Semantics match the reference (``/root/reference/psfMC/utils.py:9-32``):

* ``pad_and_rfft_image`` — center-pad the PSF up to the observation shape
  (offset ``pad // 2``) and take its 2-D real FFT once, at model-build time.
* ``convolve`` — ``ifftshift(irfft2(rfft2(img) * f_kernel))`` with wrap
  (circular) boundary.

TPU-first design notes
----------------------
The per-sample convolutions are *batched over walkers*: callers vmap
``convolve`` so XLA emits one batched 2-D FFT per ensemble half-step,
which is the efficient shape for the TPU FFT implementation (the walker
axis also becomes the sharded mesh axis).  Everything is static-shape.

Divergence from reference (bug fix, documented): the reference's
``np.fft.irfft2`` call omits the output shape, which silently corrupts
odd-sized images (acknowledged FIXME at reference models.py:276).  We
always pass ``s=img.shape`` so odd sizes round-trip correctly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "pad_and_rfft_image",
    "convolve",
    "fft_convolve_direct",
    "rdft_matrices",
    "convolve_rdft",
]


def pad_and_rfft_image(img, newshape):
    """Center-pad ``img`` to ``newshape`` then rfft2 (host-side, numpy).

    One-time preprocessing of PSF kernels (reference utils.py:9-22).
    Raises if the PSF is larger than the observation, like the reference.
    """
    img = np.asarray(img)
    pad = np.asarray(newshape) - np.asarray(img.shape)
    if np.any(pad < 0):
        raise NotImplementedError(
            "PSF images larger than observation images are not supported"
        )
    # Place the kernel center (m//2) on the ifftshift origin (N//2).
    # Identical to the reference's pad//2 offset when both sizes are even
    # (the supported HST case); fixes the one-pixel shift the reference
    # exhibits for odd sizes (its acknowledged FIXME at models.py:276).
    off = [n // 2 - m // 2 for n, m in zip(newshape, img.shape)]
    img_pad = np.zeros(tuple(newshape), dtype=img.dtype)
    img_pad[
        off[0] : off[0] + img.shape[0],
        off[1] : off[1] + img.shape[1],
    ] = img
    return np.fft.rfft2(img_pad)


def convolve(img, fourier_kernel):
    """Circular FFT convolution with a pre-FFT'd kernel (jittable).

    ``img`` is ``(..., H, W)`` real; ``fourier_kernel`` is the broadcast-
    compatible pre-computed ``rfft2`` of the (padded) kernel.  Matches
    reference utils.py:25-32 including the trailing ``ifftshift``, which
    recenters the kernel that was center-padded by ``pad_and_rfft_image``.
    """
    h, w = img.shape[-2], img.shape[-1]
    spec = jnp.fft.rfft2(img) * fourier_kernel
    out = jnp.fft.irfft2(spec, s=(h, w))
    return jnp.fft.ifftshift(out, axes=(-2, -1))


def fft_convolve_direct(img, kernel_padded):
    """Convenience: convolve with an unpadded-FFT spatial kernel (testing)."""
    return convolve(img, jnp.fft.rfft2(kernel_padded))


# ---------------------------------------------------------------------------
# Half-spectrum real-matmul convolution (the MXU path)
# ---------------------------------------------------------------------------
#
# For the 128x128 images of this workload, a dense DFT expressed as
# matmuls maps onto the TPU MXU (systolic array) instead of XLA's
# generic FFT lowering: more raw FLOPs than an FFT, but they are
# *matmul* FLOPs — the one thing the hardware does at full rate — and
# the batched einsum over the walker ensemble feeds the MXU perfectly.
# It also compiles ~3x faster than the FFT lowering over the tunnel.
#
# A naive complex-spectrum matmul DFT casts the real input to complex, so each of its
# four einsums lowers to four full-size real matmuls (~16 units total).
# Exploiting that the input AND output are real and the spectrum is
# hermitian (rfft2's W//2+1 half spectrum) cuts this to twelve half-width
# real matmuls (~6 units):
#
#   S1 = x @ Fw_half                    2 real (H,W)@(W,W2) matmuls
#   S2 = Fh @ S1          (complex)     4 real (H,H)@(H,W2) matmuls
#   S3 = S2 * K_half      (elementwise)
#   S4 = iFh @ S3         (complex)     4 real (H,H)@(H,W2) matmuls
#   out = Re(S4 @ E^T)                  2 real (H,W2)@(W2,W) matmuls
#
# where E carries the hermitian completion weights (2 for interior
# frequencies, 1 for DC/Nyquist) and the 1/(H*W) inverse normalization,
# and the trailing ``ifftshift`` is folded into the inverse matrices'
# row indexing — the output lands already shifted, with no separate
# (bandwidth-bound) roll of the (batch, H, W) result.


def rdft_matrices(shape, dtype=np.float32):
    """Real matmul-DFT operator set for :func:`convolve_rdft`.

    Returns ``(cw, sw, ch, sh, ich, ish, ica, isa)`` — all real numpy:

    * ``cw/sw``  (W, W2): forward cos/sin along the last axis,
    * ``ch/sh``  (H, H):  forward cos/sin along the first axis,
    * ``ich/ish`` (H, H): inverse along h, rows pre-ifftshifted, 1/H folded,
    * ``ica/isa`` (W2, W): inverse along w, hermitian weights + 1/W folded,
      columns pre-ifftshifted.
    """
    h, w = shape
    w2 = w // 2 + 1
    jw = np.arange(w)[:, None] * np.arange(w2)[None, :]  # (W, W2)
    ang_w = 2.0 * np.pi * jw / w
    cw = np.cos(ang_w)
    sw = np.sin(ang_w)

    kh = np.arange(h)[:, None] * np.arange(h)[None, :]
    ang_h = 2.0 * np.pi * kh / h
    ch = np.cos(ang_h)
    sh = np.sin(ang_h)

    # inverse along h with ifftshift fold: output row p reads unshifted
    # row (p + H//2) (cos/sin are H-periodic in the row index)
    rows = (np.arange(h)[:, None] + h // 2) * np.arange(h)[None, :]
    ang_ih = 2.0 * np.pi * rows / h
    ich = np.cos(ang_ih) / h
    ish = np.sin(ang_ih) / h

    # inverse along w: hermitian completion weights c_k, 1/W, shift fold
    c = np.full(w2, 2.0)
    c[0] = 1.0
    if w % 2 == 0:
        c[-1] = 1.0
    cols = np.arange(w2)[:, None] * (np.arange(w)[None, :] + w // 2)
    ang_iw = 2.0 * np.pi * cols / w
    ica = (c[:, None] / w) * np.cos(ang_iw)  # (W2, W)
    isa = (c[:, None] / w) * np.sin(ang_iw)

    return tuple(m.astype(dtype) for m in (cw, sw, ch, sh, ich, ish, ica, isa))


def convolve_rdft(img, kernel_r, kernel_i, mats):
    """Half-spectrum matmul convolution (jittable; (..., H, W) real input).

    ``kernel_r/kernel_i`` are the real/imag parts of the kernel's
    ``rfft2`` half spectrum (shape (H, W2)); ``mats`` from
    :func:`rdft_matrices`.  Matches :func:`convolve` exactly (circular
    boundary + trailing ifftshift), at ~2.6x fewer MXU FLOPs than
    a complex-spectrum formulation.
    """
    import os

    import jax

    cw, sw, ch, sh, ich, ish, ica, isa = mats
    # Matmul precision floor: single-pass bf16 (DEFAULT) injects ~1e-3
    # relative error that the inverse-variance likelihood amplifies until
    # acceptance collapses (measured 0.28 -> 0.08), so the minimum viable
    # setting is HIGH (3-pass bf16, ~f32 accuracy at half the MXU cost of
    # HIGHEST's 6 passes).  PSFMC_CONV_PRECISION=highest restores full
    # 6-pass f32 for paranoid numerics.
    choice = os.environ.get("PSFMC_CONV_PRECISION", "high")
    precisions = {
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }
    if choice not in precisions:
        raise ValueError(
            f"PSFMC_CONV_PRECISION={choice!r}: expected one of "
            f"{sorted(precisions)}"
        )
    hi = precisions[choice]

    def lmat(m, x):  # (H,H) @ (..., H, W2)
        return jnp.einsum("kh,...hw->...kw", m, x, precision=hi)

    def rmat(x, m):  # (..., H, W) @ (W, W2)  /  (..., H, W2) @ (W2, W)
        return jnp.einsum("...hw,wk->...hk", x, m, precision=hi)

    # forward along w (x real): S1 = x @ (cw - i sw)
    s1r = rmat(img, cw)
    s1i = -rmat(img, sw)
    # forward along h: S2 = (ch - i sh) @ S1
    s2r = lmat(ch, s1r) + lmat(sh, s1i)
    s2i = lmat(ch, s1i) - lmat(sh, s1r)
    # kernel multiply
    s3r = s2r * kernel_r - s2i * kernel_i
    s3i = s2r * kernel_i + s2i * kernel_r
    # inverse along h (shift folded): S4 = (ich + i ish) @ S3
    s4r = lmat(ich, s3r) - lmat(ish, s3i)
    s4i = lmat(ich, s3i) + lmat(ish, s3r)
    # inverse along w, real part only: out = S4r @ ica - S4i @ isa
    return rmat(s4r, ica) - rmat(s4i, isa)


