"""Alias of :mod:`psfmc_tpu.analysis` (reference psfMC/analysis —
convergence checks, posterior image writer, plotting)."""
from psfmc_tpu.analysis import *  # noqa: F401,F403
