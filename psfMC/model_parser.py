"""Alias of :mod:`psfmc_tpu.model_parser` (reference
psfMC/model_parser.py — component_list_from_file)."""
from psfmc_tpu.model_parser import *  # noqa: F401,F403
from psfmc_tpu.model_parser import component_list_from_file  # noqa: F401
