"""TPU-native numeric kernels for psfMC-style surface-brightness modeling.

The four performance-critical kernels of the reference (Sersic profile
evaluation, point-source sub-pixel scatter, FFT convolution, masked
Gaussian likelihood — see SURVEY.md section 2) live here as pure,
jittable, vmappable JAX functions.
"""
from .coords import array_coords, coord_grids, mag_to_flux
from .fourier import convolve, pad_and_rfft_image
from .gammainc import gammaincinv_half
from .likelihood import gaussian_lnlike
from .pointsource import add_pointsource, lanczos, render_pointsource, sinc
from .sersic import render_sersic, sersic_kappa, sersic_sb_eff, sersic_sq_radii

__all__ = [
    "array_coords",
    "coord_grids",
    "mag_to_flux",
    "convolve",
    "pad_and_rfft_image",
    "gammaincinv_half",
    "gaussian_lnlike",
    "add_pointsource",
    "lanczos",
    "render_pointsource",
    "sinc",
    "render_sersic",
    "sersic_kappa",
    "sersic_sb_eff",
    "sersic_sq_radii",
]
