"""Alias of :mod:`psfmc_tpu.models.components` under the reference
name (reference psfMC/ModelComponents/__init__.py:1-4 exports the
four public components; the rest of this module's surface is the
internal plumbing model files may touch)."""
from psfmc_tpu.models.components import *  # noqa: F401,F403
from psfmc_tpu.models.components import ComponentBase, PSFSelector  # noqa: F401
