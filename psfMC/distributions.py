"""Alias of :mod:`psfmc_tpu.distributions` (reference
psfMC/distributions.py — the ~110 scipy-named prior classes)."""
from psfmc_tpu.distributions import *  # noqa: F401,F403
