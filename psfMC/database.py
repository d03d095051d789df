"""Alias of :mod:`psfmc_tpu.database` (reference psfMC/database.py)."""
from psfmc_tpu.database import *  # noqa: F401,F403
