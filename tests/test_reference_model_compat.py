"""Drop-in compatibility: parse the REFERENCE's real model file.

The original psfMC example model file (read-only at
/root/reference/examples/model_J0005-0006.py) imports
``psfMC.ModelComponents`` / ``psfMC.distributions``, reads the real HST
FITS files with relative paths, and applies a ds9 region mask.  A user
switching frameworks must be able to run it unmodified — this test
parses it in place through our DSL parser + import shims and builds the
full jitted posterior from it.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

REF_MODEL = "/root/reference/examples/model_J0005-0006.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MODEL), reason="reference checkout not present"
)


def test_reference_model_file_parses_and_builds():
    from psfmc_tpu.model_parser import component_list_from_file
    from psfmc_tpu.models import build_model_spec
    from psfmc_tpu.models.posterior import build_posterior

    comps = component_list_from_file(REF_MODEL)
    spec = build_model_spec(comps)

    # 4 components: Sky + PointSource + 2 Sersic; single PSF, 18 params
    assert spec.param_names == [
        "0_Sky_adu",
        "1_PointSource_mag",
        "1_PointSource_xy",
        "2_Sersic_angle",
        "2_Sersic_index",
        "2_Sersic_mag",
        "2_Sersic_reff",
        "2_Sersic_reff_b",
        "2_Sersic_xy",
        "3_Sersic_angle",
        "3_Sersic_index",
        "3_Sersic_mag",
        "3_Sersic_reff",
        "3_Sersic_reff_b",
        "3_Sersic_xy",
    ]
    assert spec.num_params == 18
    assert spec.shape == (128, 128)
    assert spec.num_psfs == 1
    # the ds9 region mask (1 include + 3 exclude circles) must bite:
    # some pixels masked, but not all
    nbad = int(np.sum(spec.bad_px))
    assert 0 < nbad < 128 * 128

    fns = build_posterior(spec, dtype=jnp.float64)
    # a reasonable theta evaluates finite; out-of-prior is -inf
    theta = np.concatenate(
        [np.ravel(np.asarray(s.dist.median(), np.float64)) for s in spec.slots]
    )
    # enforce reff >= reff_b
    by = {s.name: s for s in spec.slots}
    for n in ("2_Sersic", "3_Sersic"):
        a, b = by[f"{n}_reff"].offset, by[f"{n}_reff_b"].offset
        theta[a], theta[b] = (
            max(theta[a], theta[b]) + 0.1,
            min(theta[a], theta[b]),
        )
    lp = float(fns.log_posterior(jnp.asarray(theta)))
    assert np.isfinite(lp)
    bad = theta.copy()
    bad[0] = 1e9  # adu far outside its Normal's support is still finite,
    bad[1] = -100.0  # but a mag far below the Uniform prior is not
    assert float(fns.log_posterior(jnp.asarray(bad))) == -np.inf


def test_dropin_psfmc_namespace():
    """`import psfMC` works without any shim call: every public module
    of the reference package (reference psfMC/__init__.py:1-5 and its
    submodules) resolves to this framework's implementation."""
    import psfMC
    from psfMC import (  # noqa: F401
        MultiComponentModel,
        load_database,
        model_galaxy_mcmc,
    )
    from psfMC.ModelComponents import (  # noqa: F401
        Configuration,
        PointSource,
        Sersic,
        Sky,
    )
    from psfMC.analysis import (  # noqa: F401
        check_convergence_autocorr,
        corner_plot,
        plot_hist,
        save_posterior_images,
    )
    from psfMC.database import save_database  # noqa: F401
    from psfMC.distributions import Normal, Uniform  # noqa: F401
    from psfMC.model_parser import component_list_from_file  # noqa: F401
    from psfMC.models import MultiComponentModel as M2
    from psfMC.utils import convolve, preprocess_obs  # noqa: F401

    assert M2 is MultiComponentModel
    assert psfMC.__version__.startswith("2.0b1")
    # the alias objects ARE the framework's (no copies to drift)
    import psfmc_tpu

    assert model_galaxy_mcmc is psfmc_tpu.model_galaxy_mcmc
