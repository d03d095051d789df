#!/usr/bin/env python
"""Generate a synthetic quasar+host example dataset (FITS files).

Creates sci/ivm/psf/psf_ivm FITS images plus a ds9 mask in the current
directory — shaped like the reference's J0005-0006 HST workload
(128x128 observation, 64x64 PSF) with known ground-truth parameters, so
the example fit's posterior can be checked against the injected source.
"""
import os
import sys

# runnable from a repo checkout without installing the package
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import numpy as np

from psfmc_tpu.io import fits

SHAPE = (128, 128)
PSF_SHAPE = (64, 64)
MAG_ZP = 25.9463
NOISE_SIGMA = 0.004

TRUTH = {
    "sky": 0.002,
    "ps_xy": (64.3, 64.7),
    "ps_mag": 20.7,
    "ser_xy": (64.0, 64.4),
    "ser_mag": 21.3,
    "ser_reff": 5.5,
    "ser_reff_b": 4.1,
    "ser_index": 2.2,
    "ser_angle": 38.0,
}


def main(outdir="."):
    rng = np.random.RandomState(20260816)
    h, w = SHAPE
    ph, pw = PSF_SHAPE

    # PSF: Moffat-like core + faint halo, normalized
    pyy, pxx = np.mgrid[0:ph, 0:pw].astype(float)
    pr2 = (pxx - pw / 2) ** 2 + (pyy - ph / 2) ** 2
    psf = (1 + pr2 / 4.0) ** -2.5 + 0.02 * np.exp(-pr2 / (2 * 6.0**2))
    psf /= psf.sum()
    psf_ivm = np.ones_like(psf) * 1e9

    # Render the scene through the FRAMEWORK ITSELF (the simulate API):
    # a hand-rolled numpy generator inevitably drifts from the fitted
    # model's conventions (sub-pixel PS kernel, convolution centering,
    # Sersic centroid correction) — at source flux / noise ~ 3e4 even
    # percent-level render mismatches dominate the likelihood, and the
    # "truth" labels stop corresponding to the posterior's parameters.
    from psfmc_tpu.models.components import (
        Configuration, PointSource, Sersic, Sky,
    )
    from psfmc_tpu.models.multicomponent import MultiComponentModel

    t = TRUTH
    truth_comps = [
        Configuration(
            obs_file=np.zeros(SHAPE),
            obsivm_file=np.full(SHAPE, 1.0 / NOISE_SIGMA**2),
            psf_files=psf,
            psfivm_files=psf_ivm,
            mag_zeropoint=MAG_ZP,
        ),
        Sky(adu=t["sky"]),
        PointSource(xy=np.array(t["ps_xy"]), mag=t["ps_mag"]),
        Sersic(
            xy=np.array(t["ser_xy"]),
            mag=t["ser_mag"],
            reff=t["ser_reff"],
            reff_b=t["ser_reff_b"],
            index=t["ser_index"],
            angle=t["ser_angle"],
            angle_degrees=True,
        ),
    ]
    mcm_truth = MultiComponentModel(components=truth_comps)
    obs, _theta = mcm_truth.simulate(
        theta=np.zeros(0), random_state=rng, add_noise=True
    )
    ivm = np.full(SHAPE, 1.0 / NOISE_SIGMA**2)

    # The stamp handed to the FIT carries exactly the noise its IVM
    # claims (sigma ~3.2e-5/px), while the mock observation above was
    # rendered with the TRUE noiseless PSF — so the composite noise
    # budget's PSF-variance channel (convolve(raw^2, var_psf)) covers a
    # REAL error source.  With a noiseless stamp the example's own
    # criticism diagnostics flag the inconsistency (PPC p ~ 1, LOO-PIT
    # overdispersed: ~19% excess variance at this depth from a budget
    # term with nothing to cover) — measured 2026-08-18.
    psf_obs = psf + rng.randn(*psf.shape) / np.sqrt(psf_ivm)

    hdr = fits.Header()
    hdr.set("MAGZPT", MAG_ZP, "magnitude zeropoint")
    for key, value in TRUTH.items():
        hdr.set(
            f"TRU_{key[:5].upper()}", str(value), "ground-truth parameter"
        )
    fits.writeto(os.path.join(outdir, "sci_example.fits"),
                 obs.astype(np.float32), header=hdr)
    fits.writeto(os.path.join(outdir, "ivm_example.fits"),
                 ivm.astype(np.float32))
    fits.writeto(os.path.join(outdir, "psf_example.fits"),
                 psf_obs.astype(np.float32))
    fits.writeto(os.path.join(outdir, "ivm_psf_example.fits"),
                 psf_ivm.astype(np.float32))
    with open(os.path.join(outdir, "mask_example.reg"), "w") as f:
        f.write(
            "# Region file format: DS9 version 4.1\n"
            "image\n"
            "circle(65,65,55)\n"
            "-circle(20,110,8)\n"
        )
    print("wrote example data to", os.path.abspath(outdir))


if __name__ == "__main__":
    main()
