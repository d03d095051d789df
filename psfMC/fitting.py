"""Alias of :mod:`psfmc_tpu.fitting` (reference psfMC/fitting.py)."""
from psfmc_tpu.fitting import *  # noqa: F401,F403
from psfmc_tpu.fitting import model_galaxy_mcmc  # noqa: F401
