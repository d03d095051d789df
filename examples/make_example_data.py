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
import scipy.special as sp

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


def sersic_image(shape, x, y, mag, reff, reff_b, index, angle_deg, zp):
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    kappa = sp.gammaincinv(2 * index, 0.5)
    flux = 10 ** (-0.4 * (mag - zp))
    sbeff = flux / (
        np.pi * reff * reff_b * 2 * index
        * np.exp(kappa - 2 * index * np.log(kappa)) * sp.gamma(2 * index)
    )
    ang = np.deg2rad(angle_deg) + np.pi / 2
    dx, dy = xx - x, yy - y
    u = (np.cos(ang) * dx + np.sin(ang) * dy) / reff
    v = (-np.sin(ang) * dx + np.cos(ang) * dy) / reff_b
    sq = np.maximum(u * u + v * v, 1e-30)
    return sbeff * np.exp(-kappa * np.expm1(np.log(sq) * 0.5 / index))


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

    t = TRUTH
    truth = np.full(SHAPE, t["sky"])
    truth += sersic_image(
        SHAPE, t["ser_xy"][0], t["ser_xy"][1], t["ser_mag"], t["ser_reff"],
        t["ser_reff_b"], t["ser_index"], t["ser_angle"], MAG_ZP,
    )
    # point source at sub-pixel position via explicit bilinear split
    px, py = t["ps_xy"]
    flux = 10 ** (-0.4 * (t["ps_mag"] - MAG_ZP))
    x0, y0 = int(np.floor(px)), int(np.floor(py))
    fx, fy = px - x0, py - y0
    for ddy, wy in ((0, 1 - fy), (1, fy)):
        for ddx, wx in ((0, 1 - fx), (1, fx)):
            truth[y0 + ddy, x0 + ddx] += flux * wy * wx

    # convolve with the PSF (wrap boundary, centered kernel)
    pad = np.zeros(SHAPE)
    pad[h // 2 - ph // 2 : h // 2 + ph // 2,
        w // 2 - pw // 2 : w // 2 + pw // 2] = psf
    conv = np.fft.ifftshift(
        np.fft.irfft2(np.fft.rfft2(truth) * np.fft.rfft2(pad), s=SHAPE)
    )
    obs = conv + rng.randn(h, w) * NOISE_SIGMA
    ivm = np.full(SHAPE, 1.0 / NOISE_SIGMA**2)

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
                 psf.astype(np.float32))
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
