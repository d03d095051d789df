"""psfmc_tpu — TPU-native MCMC 2D surface-brightness modeling.

A from-scratch JAX/XLA reimplementation of the capabilities of psfMC
(point-source + Sersic quasar/host decomposition with PSF convolution
and affine-invariant ensemble MCMC), designed TPU-first: the full
render → convolve → likelihood → prior chain is one jitted XLA program,
vmapped over the walker ensemble and shardable over a device mesh.

Public API mirrors the reference package (reference __init__.py:1-5):
``model_galaxy_mcmc``, ``MultiComponentModel``, ``load_database``.
"""
from . import distributions, io, models, ops, sampler

__version__ = "0.1.0"

__all__ = [
    "distributions",
    "io",
    "models",
    "ops",
    "sampler",
    "__version__",
]

# Driver-level API is appended as layers land:
try:  # pragma: no cover - import-time wiring
    from .models.multicomponent import MultiComponentModel  # noqa: F401

    __all__.append("MultiComponentModel")
except ImportError:
    pass
try:  # pragma: no cover
    from .database import load_database  # noqa: F401

    __all__.append("load_database")
except ImportError:
    pass
try:  # pragma: no cover
    from .fitting import model_galaxy_mcmc  # noqa: F401

    __all__.append("model_galaxy_mcmc")
except ImportError:
    pass
try:  # pragma: no cover
    from .optimize import fit_map  # noqa: F401

    __all__.append("fit_map")
except ImportError:
    pass
try:  # pragma: no cover
    from .fitting import model_galaxy_evidence  # noqa: F401

    __all__.append("model_galaxy_evidence")
except ImportError:
    pass
try:  # pragma: no cover
    from .fitting import model_galaxy_map  # noqa: F401

    __all__.append("model_galaxy_map")
except ImportError:
    pass
try:  # pragma: no cover
    from .batchfit import fit_batch, simulate_stack  # noqa: F401

    __all__ += ["fit_batch", "simulate_stack"]
except ImportError:
    pass
