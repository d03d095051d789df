"""Pallas TPU kernels for the render hot path."""
from .sersic_pallas import (
    pack_sersic_params,
    pallas_available,
    render_sersics_pallas,
    render_sersics_pallas_one,
)

__all__ = [
    "pack_sersic_params",
    "pallas_available",
    "render_sersics_pallas",
    "render_sersics_pallas_one",
]
