"""Alias of the composite-model layer (reference psfMC/models.py)."""
from psfmc_tpu.models.multicomponent import MultiComponentModel  # noqa: F401
