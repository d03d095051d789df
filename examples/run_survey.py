#!/usr/bin/env python
"""Survey mode end to end: mosaic -> cutouts -> batched fits -> population.

The production workflow psfMC's users run by hand across external
tools, as one framework pipeline:

1. build a synthetic sky mosaic holding K quasars, each observed with
   its OWN PSF star (per-pointing PSFs — the HST/JWST survey reality);
   every source is rendered THROUGH the framework (``simulate``), never
   by a parallel implementation,
2. carve K same-shape cutouts at the catalog positions
   (``io.cutout_stack``; the shifted-CRPIX headers keep the WCS honest),
3. fit every cutout in ONE compiled program (``fit_batch`` with
   ``psf_stack=`` — per-target PSFs run through the full template
   preprocessing) and write a FITS catalog,
4. pool the catalog into a population measurement
   (``fit_hierarchical`` on the quasar magnitude with the same
   per-target PSFs): the hierarchical posterior shrinks the faint
   targets and measures (mu, sigma) honestly, where histogramming the
   step-3 point estimates inflates the width by the measurement errors.

Sized to finish in a few minutes on CPU; on TPU raise K/STEPS and pass
``mesh=walker_mesh()`` to ``fit_batch``/``fit_hierarchical``.
"""
import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import numpy as np

K = int(os.environ.get("K", "6"))
STEPS = int(os.environ.get("STEPS", "250"))
HW = 24          # cutout size
NOISE = 0.02     # mosaic pixel noise (ADU)
MU_TRUE, SIG_TRUE = 20.6, 0.22


def _psf(sigma, hw=12):
    yy, xx = np.mgrid[:hw, :hw] - (hw - 1) / 2.0
    p = np.exp(-(xx**2 + yy**2) / (2.0 * sigma**2))
    return p / p.sum()


def _target_model(psf, obs=None, ivm=None, header=None):
    from psfmc_tpu import distributions as D
    from psfmc_tpu.models.components import Configuration, PointSource, Sky
    from psfmc_tpu.models.multicomponent import MultiComponentModel

    obs = np.zeros((HW, HW)) if obs is None else obs
    ivm = np.full((HW, HW), 1.0 / NOISE**2) if ivm is None else ivm
    return MultiComponentModel(
        [
            Configuration(
                obs_file=obs if header is None else (header, obs),
                obsivm_file=ivm,
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Normal(loc=0.0, scale=0.01)),
            PointSource(
                xy=D.Uniform(loc=(HW / 2 - 4.0, HW / 2 - 4.0),
                             scale=(8.0, 8.0)),
                mag=D.Uniform(loc=19.0, scale=3.5),
            ),
        ]
    )


def main():
    os.chdir(os.path.dirname(os.path.abspath(__file__)) or ".")
    import jax

    from psfmc_tpu.utils import apply_platform_env

    apply_platform_env()
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from psfmc_tpu import distributions as D
    from psfmc_tpu.batchfit import fit_batch, save_batch_results
    from psfmc_tpu.hierarchy import NormalPopulation, fit_hierarchical
    from psfmc_tpu.io import cutout_stack
    from psfmc_tpu.io.fits import Header

    rng = np.random.RandomState(42)

    # --- 1. the mosaic: K pointings pasted into one noise field -------
    ny, nx = 128, 192
    mosaic = rng.randn(ny, nx) * NOISE
    mosaic_ivm = np.full((ny, nx), 1.0 / NOISE**2)
    hdr = Header()
    hdr.set("CRPIX1", nx / 2.0)
    hdr.set("CRPIX2", ny / 2.0)
    hdr.set("CRVAL1", 150.1)
    hdr.set("CRVAL2", 2.2)
    s = 0.05 / 3600.0
    for key, v in (("CD1_1", -s), ("CD1_2", 0.0), ("CD2_1", 0.0),
                   ("CD2_2", s)):
        hdr.set(key, v)

    # catalog positions on a jittered grid, one PSF width per pointing
    gx, gy = np.meshgrid(
        np.linspace(20, nx - 20, 3), np.linspace(24, ny - 24, 2)
    )
    cat_xy = np.column_stack([gx.ravel(), gy.ravel()])[:K]
    cat_xy += rng.uniform(-2, 2, cat_xy.shape)
    sigmas = np.linspace(1.3, 2.3, K)
    mags_true = MU_TRUE + SIG_TRUE * rng.randn(K)
    psfs = [_psf(sg) for sg in sigmas]
    psfivms = [np.full_like(p, 1e12) for p in psfs]

    for t in range(K):
        gen = _target_model(psfs[t])
        theta = np.array([0.0, mags_true[t], HW / 2.0, HW / 2.0])
        stamp, _ = gen.simulate(theta=theta, random_state=1000 + t,
                                add_noise=False)
        x0 = int(round(cat_xy[t, 0])) - HW // 2
        y0 = int(round(cat_xy[t, 1])) - HW // 2
        mosaic[y0 : y0 + HW, x0 : x0 + HW] += stamp
        # the source center actually sits at the stamp center
        cat_xy[t] = (x0 + HW / 2.0, y0 + HW / 2.0)

    # --- 2. cutouts at the catalog positions --------------------------
    cs = cutout_stack((hdr, mosaic), mosaic_ivm, cat_xy, HW)
    print(f"cut {cs.num_targets} cutouts of {cs.obs.shape[1:]} "
          f"(origins {cs.origins.tolist()})")

    # --- 3. one batched fit over the whole catalog --------------------
    template = _target_model(psfs[0], obs=cs.obs[0], ivm=cs.ivm[0],
                             header=cs.headers[0])
    res = fit_batch(
        template, cs.obs, cs.ivm,
        nwalkers=16, burn=STEPS, iterations=STEPS, seed=5,
        psf_stack=psfs, psfivm_stack=psfivms,
    )
    from psfmc_tpu.models.multicomponent import slot_param_names

    # flatchain/mean columns are SLOTS (xy takes 2) — always map names
    # through slot_param_names, never param_names.index()
    mcol = slot_param_names(res.param_names, res.param_lens).index(
        "1_PointSource_mag"
    )
    dmag = res.mean[:, mcol] - mags_true
    print("per-target mag errors:",
          np.array2string(dmag, precision=3))
    out = "out_survey_catalog.fits"
    save_batch_results(res, out)
    print(f"wrote {out}")

    # --- 4. population measurement ------------------------------------
    hres = fit_hierarchical(
        template, cs.obs, cs.ivm,
        population={"1_PointSource_mag": NormalPopulation(
            mu=D.Uniform(loc=19.0, scale=3.5),
            sigma=D.Uniform(loc=0.01, scale=1.5),
        )},
        sampler="nuts", chains=4, burn=2 * STEPS, iterations=2 * STEPS,
        seed=6, psf_stack=psfs, psfivm_stack=psfivms,
    )
    print(hres.summary())
    mu_hat, sig_hat = hres.hyper_mean[:2]
    naive_sig = res.mean[:, mcol].std(ddof=1)
    print(
        f"truth: mu {MU_TRUE:.3f} (sample mean "
        f"{mags_true.mean():.3f}), sigma {SIG_TRUE:.3f} (sample std "
        f"{mags_true.std(ddof=1):.3f})"
    )
    meas = float(np.median(res.std[:, mcol]))
    print(
        f"hierarchical: mu {mu_hat:.3f} +/- {hres.hyper_std[0]:.3f}, "
        f"sigma {sig_hat:.3f} +/- {hres.hyper_std[1]:.3f}; "
        f"naive catalog std {naive_sig:.3f} (carries the per-target "
        f"measurement error ~{meas:.3f} in quadrature — negligible at "
        f"this SNR; see run_hierarchy.py / run_scaling_relation.py "
        f"for the low-SNR regime where pooling matters)"
    )
    assert abs(mu_hat - mags_true.mean()) < max(
        0.15, 4 * hres.hyper_std[0]
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
