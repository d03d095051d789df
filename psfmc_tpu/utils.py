"""Utility re-exports + progress printing (reference utils.py surface).

The numeric kernels live in :mod:`psfmc_tpu.ops` and IO preprocessing in
:mod:`psfmc_tpu.io.preprocess`; this module re-exports them under the
reference's flat ``utils`` namespace for API familiarity.
"""
from __future__ import annotations

from .io.preprocess import (  # noqa: F401
    calculate_psf_variability,
    mask_from_file,
    norm_psf,
    pre_fft_psf,
    preprocess_obs,
    preprocess_psf,
)
from .ops.coords import array_coords, mag_to_flux  # noqa: F401
from .ops.fourier import convolve, pad_and_rfft_image  # noqa: F401

__all__ = [
    "apply_platform_env",
    "calculate_psf_variability",
    "mask_from_file",
    "norm_psf",
    "pre_fft_psf",
    "preprocess_obs",
    "preprocess_psf",
    "array_coords",
    "mag_to_flux",
    "convolve",
    "pad_and_rfft_image",
    "print_progress",
]


def print_progress(sample, max_samples, stage="Burning"):
    """Percent progress printer (reference utils.py:167-171).

    Multi-process runs print from the primary host only.
    """
    from .parallel.multihost import is_primary

    if not is_primary():
        return
    next_pct = 100 * (sample + 1) // max_samples
    curr_pct = 100 * sample // max_samples
    if next_pct - curr_pct > 0:
        print(f"{stage}: {next_pct:d}%")


def apply_platform_env(env_var="PSFMC_PLATFORM"):
    """Honor a platform override env var before first jax use.

    This image pins the axon TPU plugin via sitecustomize, so
    shell-level ``JAX_PLATFORMS`` is ignored; during a TPU outage the
    backend init hangs instead of failing fast.  ``PSFMC_PLATFORM=cpu``
    forces the CPU backend for smokes.  Call BEFORE any jax
    computation (config updates after backend init are ignored).
    """
    import os

    plat = os.environ.get(env_var)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
