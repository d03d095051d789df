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
