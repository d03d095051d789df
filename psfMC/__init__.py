"""Drop-in alias of the reference package namespace.

A user of the original psfMC (reference psfMC/__init__.py:1-5) can
``import psfMC`` / ``from psfMC import model_galaxy_mcmc`` against
this framework without touching their scripts: every public module of
the reference (``ModelComponents``, ``distributions``, ``analysis``,
``database``, ``fitting``, ``model_parser``, ``models``, ``utils``)
resolves to its psfmc_tpu implementation via thin alias submodules.
Model files exec'd by the DSL parser get the same objects through
psfmc_tpu.compat's sys.modules shims — both routes are idempotent.
"""
from psfmc_tpu import (
    MultiComponentModel,
    load_database,
    model_galaxy_mcmc,
)

__version__ = "2.0b1+tpu"

__all__ = [
    "model_galaxy_mcmc",
    "MultiComponentModel",
    "load_database",
    "__version__",
]
