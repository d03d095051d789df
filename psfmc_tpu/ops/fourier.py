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

__all__ = ["pad_and_rfft_image", "convolve", "fft_convolve_direct"]


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
# Matmul-DFT convolution (MXU path)
# ---------------------------------------------------------------------------
#
# For the 128x128 images of this workload, a dense DFT expressed as two
# complex matmuls per transform maps onto the TPU MXU (systolic array)
# instead of XLA's generic FFT lowering.  More raw FLOPs than an FFT,
# but they are *matmul* FLOPs — the one thing the hardware does at full
# rate — and the batched einsum over the walker ensemble feeds the MXU
# perfectly.  Numerics: f32 DFT of a 128-point signal has ~1e-6 relative
# error — far below the likelihood's noise floor.


def dft_matrices(shape, dtype=np.complex64):
    """(F_h, F_w, iF_h, iF_w) dense DFT/IDFT matrices for a 2-D shape."""
    h, w = shape
    f_h = np.fft.fft(np.eye(h)).astype(dtype)
    f_w = np.fft.fft(np.eye(w)).astype(dtype)
    if_h = np.fft.ifft(np.eye(h)).astype(dtype)
    if_w = np.fft.ifft(np.eye(w)).astype(dtype)
    return f_h, f_w, if_h, if_w


def convolve_dft(img, full_kernel_spec, mats):
    """Matmul-DFT circular convolution (jittable; (..., H, W) input).

    ``full_kernel_spec`` is the FULL complex spectrum of the padded
    kernel (``np.fft.fft2``, not rfft2); ``mats`` from
    :func:`dft_matrices`.  Matches :func:`convolve`'s semantics
    (wrap boundary + trailing ifftshift).
    """
    import jax

    f_h, f_w, if_h, if_w = mats
    cdtype = f_h.dtype if hasattr(f_h, "dtype") else jnp.complex64
    x = img.astype(cdtype)
    # Full f32 matmul precision is mandatory: the TPU MXU's default
    # (bfloat16 multiplies) injects ~1e-3 relative error into the
    # convolution, which the inverse-variance likelihood amplifies into
    # hundreds of log-posterior units and the sampler's acceptance
    # collapses (measured: 0.28 -> 0.08).
    hi = jax.lax.Precision.HIGHEST
    # spec = F_h @ x @ F_w^T  (DFT along both axes), batched over leading dims
    spec = jnp.einsum("hj,...jw->...hw", f_h, x, precision=hi)
    spec = jnp.einsum("...hw,kw->...hk", spec, f_w, precision=hi)
    spec = spec * full_kernel_spec
    out = jnp.einsum("hj,...jw->...hw", if_h, spec, precision=hi)
    out = jnp.einsum("...hw,kw->...hk", out, if_w, precision=hi)
    return jnp.fft.ifftshift(out.real.astype(img.dtype), axes=(-2, -1))


def pad_and_fft_image_full(img, newshape):
    """Center-pad like :func:`pad_and_rfft_image` but return the full
    fft2 spectrum (for the matmul-DFT path)."""
    img = np.asarray(img)
    pad = np.asarray(newshape) - np.asarray(img.shape)
    if np.any(pad < 0):
        raise NotImplementedError(
            "PSF images larger than observation images are not supported"
        )
    off = [n // 2 - m // 2 for n, m in zip(newshape, img.shape)]
    img_pad = np.zeros(tuple(newshape), dtype=np.float64)
    img_pad[
        off[0] : off[0] + img.shape[0],
        off[1] : off[1] + img.shape[1],
    ] = img
    return np.fft.fft2(img_pad)
