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
    have_real = "psfMC" in sys.modules and not getattr(
        sys.modules["psfMC"], "__psfmc_tpu_shim__", False
    )
    if not have_real and "psfMC" not in sys.modules:
        try:
            import psfMC  # noqa: F401 — registers the full namespace

            have_real = True
        except ImportError:
            pass
    if have_real or (
        "psfMC" in sys.modules and getattr(
            sys.modules["psfMC"], "__psfmc_tpu_shim__", False
        )
    ):
        # reference namespace covered — but the documented NEW-style
        # alias (psfmc_tpu.ModelComponents) must still register
        # (review finding: the early return silently dropped it)
        _install_new_style_alias()
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

    _install_new_style_alias()


def _install_new_style_alias():
    """Register psfmc_tpu.ModelComponents (new-style import alias)."""
    import psfmc_tpu
    from .models import components as _components

    if not hasattr(psfmc_tpu, "ModelComponents"):
        alias = types.ModuleType("psfmc_tpu.ModelComponents")
        names = ["Configuration", "PointSource", "Sersic", "Sky",
                 "ComponentBase", "PSFSelector"]
        for name in names:
            setattr(alias, name, getattr(_components, name))
        alias.__all__ = names[:4]
        psfmc_tpu.ModelComponents = alias
        sys.modules.setdefault("psfmc_tpu.ModelComponents", alias)
