"""IO subsystem: native FITS codec, tables, WCS, ds9 regions, preprocessing."""
from . import fits
from .galfit import (
    components_from_feedme,
    feedme_to_model_source,
    parse_feedme,
    results_to_feedme,
)
from .preprocess import (
    calculate_psf_variability,
    make_source_mask,
    mask_from_file,
    norm_psf,
    pre_fft_psf,
    preprocess_obs,
    preprocess_psf,
)
from .cutout import CutoutStack, cutout_stack
from .psfgrid import interpolate_psfs
from .region import parse_region_file, region_mask
from .table import Table
from .wcs import MiniWCS, proj_plane_pixel_area

__all__ = [
    "fits",
    "Table",
    "CutoutStack",
    "cutout_stack",
    "interpolate_psfs",
    "MiniWCS",
    "proj_plane_pixel_area",
    "parse_region_file",
    "region_mask",
    "norm_psf",
    "preprocess_obs",
    "preprocess_psf",
    "pre_fft_psf",
    "calculate_psf_variability",
    "mask_from_file",
    "make_source_mask",
    "components_from_feedme",
    "feedme_to_model_source",
    "parse_feedme",
    "results_to_feedme",
]
