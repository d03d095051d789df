"""Alias of :mod:`psfmc_tpu.utils` (reference psfMC/utils.py — the
flat numeric/IO helper namespace)."""
from psfmc_tpu.utils import *  # noqa: F401,F403
