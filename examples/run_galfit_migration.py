#!/usr/bin/env python
"""GALFIT -> psfMC migration demo: feedme in, posterior out, feedme back.

Workflow demonstrated end to end:

1. start from a GALFIT input file (``demo.feedme``) + parameter
   constraint file (``demo.constraints``) — written below exactly as a
   GALFIT user would have them;
2. ``psfmc-import-galfit`` (here the library call) converts them into
   a psfMC model file: free parameters become Uniform priors, the
   constraint ranges become the prior bounds, and the position couple
   becomes an exact ``Tied`` link;
3. fit with ``model_galaxy_mcmc`` — full posterior, not a chi^2 point;
4. export the posterior means BACK to GALFIT format with
   ``results_to_feedme`` for any legacy tooling downstream.

The mock observation is rendered through the framework's own simulate
API at the feedme's stated values, so the fit's recovery of those
values is a real closed loop.
"""
import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import numpy as np

MC_ARGS = {
    "burn": int(os.environ.get("BURN", "600")),
    "iterations": int(os.environ.get("ITERATIONS", "400")),
    "chains": int(os.environ.get("CHAINS", "80")),
}

FEEDME = """\
# GALFIT input as a user would have it (psf star + host + sky)
J) 25.0                 # zeropoint
K) 0.05 0.05            # plate scale [arcsec/px]
G) demo.constraints     # parameter constraints

 0) sky
 1) 2.0   1             # sky background

 0) sersic
 1) 17.0 16.0 1 1       # position (GALFIT 1-based)
 3) 18.8  1             # total magnitude
 4) 4.0   1             # R_e [px]
 5) 1.5   0             # sersic index (held)
 9) 0.8   0             # axis ratio
10) 20.0  0             # position angle

 0) psf
 1) 17.0 16.0 1 1
 3) 19.5  1
"""

CONSTRAINTS = """\
 2      mag  -1.5 1.5   # host magnitude within +-1.5 of the guess
 2      re    1 to 10   # host size range [px]
 3_2    x    offset     # quasar rides the host centroid
 3_2    y    offset
"""


def main():
    from psfmc_tpu.utils import apply_platform_env

    apply_platform_env()  # PSFMC_PLATFORM=cpu for smokes (see utils)
    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, "galfit_migration")
    os.makedirs(out, exist_ok=True)
    os.chdir(out)
    with open("demo.feedme", "w") as fh:
        fh.write(FEEDME)
    with open("demo.constraints", "w") as fh:
        fh.write(CONSTRAINTS)

    from psfmc_tpu.io.galfit import (
        components_from_feedme,
        feedme_to_model_source,
        results_to_feedme,
    )

    src = feedme_to_model_source("demo.feedme")
    print("--- generated model file " + "-" * 40)
    print(src)

    # mock data rendered AT the feedme's values through the framework
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w]
    psf = np.exp(-0.5 * ((xx - w / 2) ** 2 + (yy - h / 2) ** 2) / 1.2**2)
    psf /= psf.sum()
    np.save("psf.npy", psf)

    from psfmc_tpu.models.components import Configuration
    from psfmc_tpu.models.multicomponent import MultiComponentModel

    truth = components_from_feedme("demo.feedme", priors="fixed")
    cfg = Configuration(
        obs_file=np.zeros((h, w)), obsivm_file=np.ones((h, w)) * 100.0,
        psf_files=[psf], psfivm_files=[np.ones_like(psf) * 1e9],
        mag_zeropoint=25.0,
    )
    mock, _ = MultiComponentModel([cfg] + truth).simulate(random_state=5)
    np.save("obs.npy", mock)

    with open("model_migrated.py", "w") as fh:
        fh.write("import numpy as np\n")
        fh.write("OBS = np.load('obs.npy')\n")
        fh.write(f"IVM = np.ones(({h}, {w})) * 100.0\n")
        fh.write("PSF = np.load('psf.npy')\n")
        fh.write("PSFIVM = np.ones_like(PSF) * 1e9\n")
        fh.write(
            "Configuration(obs_file=OBS, obsivm_file=IVM, "
            "psf_files=[PSF], psfivm_files=[PSFIVM], "
            "mag_zeropoint=25.0)\n"
        )
        fh.write(src)

    from psfmc_tpu import load_database, model_galaxy_mcmc
    from psfmc_tpu.analysis import summary

    model_galaxy_mcmc("model_migrated.py", output_name="migrated",
                      seed=7, **MC_ARGS)
    db = load_database("migrated_db.fits")
    s = summary(db)
    print("--- posterior vs feedme truth " + "-" * 35)
    for col, truth_v in [
        ("0_Sky_adu", 2.0), ("1_Sersic_mag", 18.8),
        ("1_Sersic_xy_0", 16.0), ("1_Sersic_xy_1", 15.0),
        ("2_PointSource_mag", 19.5),
    ]:
        v = s[col]
        z = abs(v["mean"] - truth_v) / max(v["std"], 1e-9)
        print(f"{col:22s} {v['mean']:8.3f} +/- {v['std']:6.3f}  "
              f"(truth {truth_v:g}, {z:.1f} sigma)")
    # PSF position is tied: no 2_PointSource_xy column
    assert not any("PointSource_xy" in c for c in db.colnames)

    # round trip: posterior means back to GALFIT format
    back = results_to_feedme(
        MultiComponentModel("model_migrated.py"), database=db,
        plate_scale=(0.05, 0.05),
    )
    with open("fitted.feedme", "w") as fh:
        fh.write(back)
    print("--- fitted.feedme (for legacy GALFIT tooling) " + "-" * 20)
    print(back)


if __name__ == "__main__":
    main()
