"""Fully-fused log-posterior evaluation as one Pallas TPU kernel.

One kernel program per walker computes the ENTIRE hot path in VMEM —
render (Sersic profiles + sky + separable point sources), both
half-spectrum matmul-DFT convolutions (model * PSF and model^2 *
PSF-variance, the MXU path of :func:`psfmc_tpu.ops.fourier.
convolve_rdft`), and the masked Gaussian likelihood reduction — writing
a single scalar per walker back to HBM.  The XLA path materializes each
stage to HBM between fusions (~6 image-sized round trips per walker per
half-step); here the (H, W) working set never leaves VMEM.

Scalar-heavy per-walker work (kappa inversion, flux normalization,
priors, point-source 1-D kernels) stays in plain XLA outside the kernel
— it is tiny, and keeping it outside lets the kernel body be pure
per-pixel FMA + MXU dots.

Scope: single-PSF models with the 'dft' convolution mode (the flagship
configuration).  Multi-PSF or FFT-mode posteriors keep the XLA path.
Selected with ``PSFMC_LNPOST=pallas``; the XLA path remains the default
unless the fused kernel measures faster end-to-end on the target.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..fastmath import exp_log_fns, exp_log_fns_unsafe
from ..sersic import sersic_profile_core
from .sersic_pallas import PARAMS_PER_SERSIC, pallas_available  # noqa: F401

__all__ = ["make_fused_lnl_batch", "fused_lnl_supported"]


def fused_lnl_supported(spec, conv_mode):
    """The fused kernel covers the flagship configuration only.

    Component kinds are whitelisted: a model with components the kernel
    does not render (e.g. Moffat) must fall back to XLA rather than
    silently dropping them from the likelihood.
    """
    known = {"sky", "pointsource", "sersic", "psfselector"}
    specs = getattr(spec, "comp_specs", ())
    kinds_ok = all(cs.kind in known for cs in specs)
    # the kernel renders sky as one scalar and sersics in the 9-scalar
    # elliptical form; a gradient (tilted-plane) sky or a boxy (c0)
    # sersic would be silently mis-rendered — fall back to XLA instead
    flat_sky = all(
        not ({"dx", "dy"} & set(cs.params))
        for cs in specs
        if cs.kind == "sky"
    )
    elliptical = all(
        not ({"c0", "f1", "f2", "f3", "f4", "b1", "b2", "b3",
              "rtrunc", "rtrunc_in", "rot_ang"}
             & set(cs.params))
        for cs in specs
        if cs.kind == "sersic"
    )
    return (
        pallas_available()
        and conv_mode == "dft"
        and getattr(spec, "num_psfs", 1) == 1
        and kinds_ok
        and flat_sky
        and elliptical
        # the kernel reduction hard-codes the Gaussian family
        and getattr(spec, "likelihood", "gaussian") == "gaussian"
        # and renders the unpadded grid only
        and getattr(spec, "conv_pad", 0) == 0
        # and point-samples profiles (no sub-pixel window)
        and getattr(spec, "render_oversample", 1) == 1
    )


def _make_kernel(num_sersics, num_ps, h, w, dtype, dot_mode="bf16x3"):
    exp_u, log_u = exp_log_fns_unsafe()
    _, log_safe = exp_log_fns()
    inv_2pi = float(0.5 / np.pi)

    def dot_highest(a, b):
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype,
        )

    def dot_bf16x3(a, b):
        # Mosaic exposes only DEFAULT/HIGHEST dot precision — bf16
        # (DEFAULT) is likelihood-corrupting and f32 (HIGHEST) costs
        # ~6 MXU passes (measured: the HIGHEST kernel ran 0.911 s vs
        # 0.615 s XLA, the delta matching CONV_PRECISION=highest's
        # cost).  So emulate XLA's bf16x3 (= the validated default
        # accuracy of the XLA conv path) by hand: split each operand
        # into leading/trailing bf16 halves (the split subtractions are
        # exact in f32) and take the three significant cross products
        # on the MXU with f32 accumulation.
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(dtype)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(dtype)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(
                x,
                y,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )

        return d(ah, bh) + d(ah, bl) + d(al, bh)

    dot = dot_bf16x3 if dot_mode == "bf16x3" else dot_highest

    def kernel(
        sersic_ref,  # (1, S, 9)
        sky_ref,  # (1, 1, 1)
        fky_ref,  # (1, P, H) flux-scaled row kernels
        kx_ref,  # (1, P, W) column kernels
        cw_ref, sw_ref, ch_ref, sh_ref, ich_ref, ish_ref, ica_ref, isa_ref,
        psf_r_ref, psf_i_ref, var_r_ref, var_i_ref,  # (H, W2) each
        obs_ref, obs_var_ref, good_ref,  # (H, W); good as {0,1} dtype
        out_ref,  # (1, 1, 1)
    ):
        xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(dtype)
        yg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(dtype)

        raw = jnp.full((h, w), sky_ref[0, 0, 0], dtype)
        for s in range(num_sersics):
            raw = raw + sersic_profile_core(
                xg - sersic_ref[0, s, 0],
                yg - sersic_ref[0, s, 1],
                sersic_ref[0, s, 2],
                sersic_ref[0, s, 3],
                sersic_ref[0, s, 4],
                sersic_ref[0, s, 5],
                sersic_ref[0, s, 6],
                sersic_ref[0, s, 7],
                sersic_ref[0, s, 8],
                exp_u,
                log_u,
            )
        for p in range(num_ps):
            raw = raw + fky_ref[0, p, :][:, None] * kx_ref[0, p, :][None, :]

        def convolve(x, kr, ki):
            # forward along w (x real): S1 = x @ (cw - i sw)
            s1r = dot(x, cw_ref[...])
            s1i = -dot(x, sw_ref[...])
            # forward along h: S2 = (ch - i sh) @ S1
            s2r = dot(ch_ref[...], s1r) + dot(sh_ref[...], s1i)
            s2i = dot(ch_ref[...], s1i) - dot(sh_ref[...], s1r)
            # kernel multiply
            s3r = s2r * kr - s2i * ki
            s3i = s2r * ki + s2i * kr
            # inverse along h (ifftshift folded into ich/ish rows)
            s4r = dot(ich_ref[...], s3r) - dot(ish_ref[...], s3i)
            s4i = dot(ich_ref[...], s3i) + dot(ish_ref[...], s3r)
            # inverse along w, real part (hermitian weights in ica/isa)
            return dot(s4r, ica_ref[...]) - dot(s4i, isa_ref[...])

        conv = convolve(raw, psf_r_ref[...], psf_i_ref[...])
        model_var = convolve(raw * raw, var_r_ref[...], var_i_ref[...])

        good = good_ref[...]
        ivm = 1.0 / (model_var + obs_var_ref[...])
        resid = obs_ref[...] - conv
        # gaussian_lnlike semantics: bad px excluded, log fed 1 there
        safe_ivm = jnp.where(good > 0, ivm, 1.0)
        term = resid * resid * ivm - log_safe(inv_2pi * safe_ivm)
        total = -0.5 * jnp.sum(jnp.where(good > 0, term, 0.0))
        # scalar stores to VMEM are rejected; write the full (1,1,1) block
        out_ref[...] = jnp.reshape(total, (1, 1, 1))

    return kernel


def make_fused_lnl_batch(constants, spec, comp_specs, mag_zp, dtype,
                         kappa_mode="table", interpret=None):
    """Build ``lnl_batch(thetas) -> (B,)`` — batched fused likelihood.

    ``constants`` is the PosteriorFns constants dict (host numpy).  The
    returned function handles the per-walker scalar prep in XLA (vmap),
    then launches one Pallas grid over the batch.
    """
    from jax.experimental import pallas as pl

    from ..coords import mag_to_flux
    from ..pointsource import _kernel_1d
    from ..sersic import sersic_scalar_params
    from ...models.posterior import _getter

    h, w = spec.shape
    w2 = w // 2 + 1
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    sersic_specs = [c for c in comp_specs if c.kind == "sersic"]
    ps_specs = [c for c in comp_specs if c.kind == "pointsource"]
    sky_specs = [c for c in comp_specs if c.kind == "sky"]
    num_sersics = len(sersic_specs)
    num_ps = max(len(ps_specs), 1)  # kernel needs static >=1 rows

    cw, sw, ch, sh, ich, ish, ica, isa = constants["rdft_mats"]
    shared = [
        np.asarray(m, np.float32 if dtype == jnp.float32 else np.float64)
        for m in (cw, sw, ch, sh, ich, ish, ica, isa)
    ]
    shared += [
        np.asarray(constants["psf_r"][0]),
        np.asarray(constants["psf_i"][0]),
        np.asarray(constants["var_r"][0]),
        np.asarray(constants["var_i"][0]),
        np.asarray(constants["obs_data"]),
        np.asarray(constants["obs_var"]),
        np.asarray(constants["good_px"]).astype(
            np.float32 if dtype == jnp.float32 else np.float64
        ),
    ]

    def per_walker_inputs(theta):
        theta = jnp.asarray(theta, dtype)
        packed = (
            jnp.stack(
                [
                    jnp.stack(
                        sersic_scalar_params(
                            jnp.asarray(
                                _getter(cs.params, theta, "xy"), dtype
                            ),
                            _getter(cs.params, theta, "mag"),
                            _getter(cs.params, theta, "reff"),
                            _getter(cs.params, theta, "reff_b"),
                            _getter(cs.params, theta, "index"),
                            _getter(cs.params, theta, "angle"),
                            mag_zp,
                            cs.static["angle_degrees"],
                            kappa_mode,
                        )
                    )
                    for cs in sersic_specs
                ]
            )
            if num_sersics
            else jnp.zeros((0, PARAMS_PER_SERSIC), dtype)
        )
        sky = jnp.zeros((), dtype)
        for cs in sky_specs:
            sky = sky + jnp.asarray(
                _getter(cs.params, theta, "adu"), dtype
            )
        fkys, kxs = [], []
        rows = jnp.arange(h, dtype=dtype)
        cols = jnp.arange(w, dtype=dtype)
        for cs in ps_specs:
            xy = jnp.asarray(_getter(cs.params, theta, "xy"), dtype)
            mag = _getter(cs.params, theta, "mag")
            method = cs.static["shift_method"]
            flux = mag_to_flux(mag, mag_zp).astype(dtype)
            fkys.append(flux * _kernel_1d(rows, xy[1], method))
            kxs.append(_kernel_1d(cols, xy[0], method))
        if not ps_specs:  # placeholder zero source
            fkys.append(jnp.zeros(h, dtype))
            kxs.append(jnp.zeros(w, dtype))
        return packed, sky.reshape(1, 1), jnp.stack(fkys), jnp.stack(kxs)

    import os

    # bf16x3 emulated dots by default for f32 (matches the XLA conv
    # path's validated accuracy at ~half the HIGHEST MXU cost); f64
    # keeps true-precision dots.  PSFMC_LNPOST_DOT=highest reverts.
    dot_mode = os.environ.get(
        "PSFMC_LNPOST_DOT", "bf16x3" if dtype == jnp.float32 else "highest"
    )
    kernel = _make_kernel(num_sersics, num_ps, h, w, dtype, dot_mode)

    def shared_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * nd)

    in_specs = [
        pl.BlockSpec(
            (1, max(num_sersics, 1), PARAMS_PER_SERSIC),
            lambda i: (i, 0, 0),
        ),
        # rank-3 scalar operands: Mosaic's (8, 128) tiling rule rejects
        # a (1, 1) block of a (B, 1) array (even in SMEM on this jax),
        # but accepts blocks whose LAST TWO dims equal the array's —
        # so the per-walker scalars ride as (B, 1, 1) with (1, 1, 1)
        # blocks
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, num_ps, h), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, num_ps, w), lambda i: (i, 0, 0)),
    ] + [shared_spec(a.shape) for a in shared]
    out_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0))

    def lnl_batch(thetas):
        thetas = jnp.asarray(thetas, dtype)
        b = thetas.shape[0]
        packed, sky, fky, kx = jax.vmap(per_walker_inputs)(thetas)
        if num_sersics == 0:
            packed = jnp.zeros((b, 1, PARAMS_PER_SERSIC), dtype)
        out = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, 1, 1), dtype),
            interpret=interpret,
        )(packed, sky, fky, kx, *shared)
        lnl = out[:, 0, 0]
        return jnp.where(jnp.isfinite(lnl), lnl, -jnp.inf)

    return lnl_batch
