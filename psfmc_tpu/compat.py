"""Reference-API import shims.

Model files written for the original psfMC import
``psfMC.ModelComponents`` and ``psfMC.distributions``.  To let those
files run unmodified against this framework, we register lightweight
alias modules in ``sys.modules`` pointing at our implementations.

Also exposes ``psfmc_tpu.ModelComponents`` as an alias of
:mod:`psfmc_tpu.models.components` for new-style imports.
"""
from __future__ import annotations

import sys
import types

__all__ = ["install_reference_shims"]


def install_reference_shims():
    """Idempotently register psfMC.* alias modules.

    When the real drop-in ``psfMC`` alias PACKAGE is importable (it
    ships with this distribution), prefer it: it provides the FULL
    reference module surface (analysis/database/fitting/...), while
    the ModuleType fallback below only covers what exec'd model files
    need.  Registering the fallback first would occupy
    ``sys.modules['psfMC']`` and block the package's submodules.
    """
    if "psfMC" in sys.modules and not getattr(
        sys.modules["psfMC"], "__psfmc_tpu_shim__", False
    ):
        return  # the real drop-in package is already loaded
    if "psfMC" not in sys.modules:
        try:
            import psfMC  # noqa: F401 — registers the full namespace

            return
        except ImportError:
            pass
    if "psfMC" in sys.modules and getattr(
        sys.modules["psfMC"], "__psfmc_tpu_shim__", False
    ):
        return

    from . import distributions as _distributions
    from .models import components as _components

    comp_mod = types.ModuleType("psfMC.ModelComponents")
    for name in ("Configuration", "PointSource", "Sersic", "Sky",
                 "ComponentBase", "PSFSelector"):
        setattr(comp_mod, name, getattr(_components, name))
    comp_mod.__all__ = ["Configuration", "PointSource", "Sersic", "Sky"]

    root = types.ModuleType("psfMC")
    root.__psfmc_tpu_shim__ = True
    root.ModelComponents = comp_mod
    root.distributions = _distributions

    sys.modules.setdefault("psfMC", root)
    sys.modules.setdefault("psfMC.ModelComponents", comp_mod)
    sys.modules.setdefault("psfMC.distributions", _distributions)

    # New-style alias: psfmc_tpu.ModelComponents
    import psfmc_tpu

    if not hasattr(psfmc_tpu, "ModelComponents"):
        alias = types.ModuleType("psfmc_tpu.ModelComponents")
        for name in comp_mod.__all__ + ["ComponentBase", "PSFSelector"]:
            setattr(alias, name, getattr(_components, name))
        alias.__all__ = list(comp_mod.__all__)
        psfmc_tpu.ModelComponents = alias
        sys.modules.setdefault("psfmc_tpu.ModelComponents", alias)
