"""Pure jittable posterior built from a :class:`ModelSpec`.

The whole render → convolve → likelihood → prior chain is one XLA
computation ``lnpost(theta) -> scalar`` (+ an image-returning variant),
vmapped over walkers by the sampler — the TPU-native equivalent of the
reference's hot loop ``MultiComponentModel.log_posterior``
(reference models.py:193-243).

Image-type semantics match the reference blobs (models.py:213-226):
``raw_model``, ``convolved_model``, ``residual``, ``composite_ivm``,
``point_source_subtracted``.  Internally we carry the four *independent*
images (raw, conv, total variance, convolved point sources): residual
and point_source_subtracted are affine in those, so posterior means are
reconstructed exactly at finalize time — saving one image's worth of HBM
traffic per walker per step.

-inf handling is branchless (``jnp.where``) rather than the reference's
early-return; XLA computes the full batch regardless, which is free on
the ensemble-batched TPU layout.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.fourier import convolve
from ..ops.likelihood import gaussian_lnlike, make_lnlike
from ..ops.pointsource import render_pointsource_dense
from ..ops.sersic import render_sersic
from .spec import ModelSpec

__all__ = ["PosteriorFns", "build_posterior", "IMAGE_TYPES"]

IMAGE_TYPES = (
    "raw_model",
    "convolved_model",
    "residual",
    "composite_ivm",
    "point_source_subtracted",
)

# The independent accumulation basis (see module docstring).
CARRY_IMAGE_TYPES = ("raw", "conv", "var", "ps_conv")


def _getter(params, theta, name):
    kind, payload = params[name]
    if kind == "const":
        return payload
    if kind == "theta_affine":
        # frame='sky' tie: owner-band pixel slot mapped into this
        # band's pixel frame (A, b are host-numpy constants baked into
        # the trace; see spec._pixel_affine).  HIGHEST precision: the
        # TPU default matmul is bf16 and this coordinate feeds the
        # render -> likelihood (CLAUDE.md precision rule).
        offset, size, a, b = payload
        x = jax.lax.dynamic_slice(theta, (offset,), (size,))
        return (
            jnp.dot(jnp.asarray(a, x.dtype), x,
                    precision=jax.lax.Precision.HIGHEST)
            + jnp.asarray(b, x.dtype)
        )
    if kind == "theta_affine_offset":
        # offset-tie: tie(base) + this component's own free offset
        # slots (registration-error marginalization)
        offset, size, a, b, own = payload
        x = jax.lax.dynamic_slice(theta, (offset,), (size,))
        o = jax.lax.dynamic_slice(theta, (own,), (size,))
        return (
            jnp.dot(jnp.asarray(a, x.dtype), x,
                    precision=jax.lax.Precision.HIGHEST)
            + jnp.asarray(b, x.dtype)
            + o
        )
    offset, size = payload
    if size == 1:
        return theta[offset]
    return jax.lax.dynamic_slice(theta, (offset,), (size,))


def _shape_args(cs, theta):
    """(shaped, c0, fourier, bending, rotation) args for a profile."""
    fourier = tuple(
        (
            m,
            _getter(cs.params, theta, f"f{m}"),
            _getter(cs.params, theta, f"f{m}_phi"),
        )
        for m in (1, 2, 3, 4)
        if f"f{m}" in cs.params
    )
    bending = tuple(
        (m, _getter(cs.params, theta, f"b{m}"))
        for m in (1, 2, 3)
        if f"b{m}" in cs.params
    )
    rotation = None
    if "rot_ang" in cs.params:
        rotation = (
            _getter(cs.params, theta, "rot_ang"),
            _getter(cs.params, theta, "rot_out"),
            (_getter(cs.params, theta, "rot_in")
             if "rot_in" in cs.params else 0.0),
            (_getter(cs.params, theta, "rot_pow")
             if "rot_pow" in cs.params else 1.0),
        )
    c0 = _getter(cs.params, theta, "c0") if "c0" in cs.params else 0.0
    shaped = (
        bool(fourier) or bool(bending) or rotation is not None
        or "c0" in cs.params
    )
    return shaped, c0, fourier, bending, rotation


def _trunc_args(cs, theta):
    """(outer, inner) truncation render arg, or None when untruncated.

    Each of outer/inner is a ``(break_px, soft_px)`` tuple; presence is
    static structure (baked at trace time), values may be traced.
    """
    outer = inner = None
    if "rtrunc" in cs.params:
        outer = (
            _getter(cs.params, theta, "rtrunc"),
            _getter(cs.params, theta, "rsoft"),
        )
    if "rtrunc_in" in cs.params:
        inner = (
            _getter(cs.params, theta, "rtrunc_in"),
            _getter(cs.params, theta, "rsoft_in"),
        )
    if outer is None and inner is None:
        return None
    return (outer, inner)


def make_log_prior(slots, comp_specs, dtype):
    """Pure log-prior over parameter slots + per-component constraints.

    Shared by the single-observation :class:`PosteriorFns` and the
    joint multi-band posterior (which evaluates the prior ONCE over the
    global slot layout while summing per-band likelihoods).
    """

    def log_prior(theta):
        lp = jnp.asarray(0.0, dtype)
        for slot in slots:
            if slot.size == 1:
                x = theta[slot.offset]
            else:
                x = jax.lax.dynamic_slice(
                    theta, (slot.offset,), (slot.size,)
                )
            lp = lp + jnp.sum(slot.dist.jax_logp(x))
        # axis-order constraints: Sersic reff >= reff_b (reference
        # Sersic.py:41-45) and the analogues for every other radial
        # profile family; per-family support constraints keep the flux
        # normalizations finite and positive (Moffat beta > 1; King
        # rt, alpha > 0; Ferrer alpha > 0, 0 <= beta < 2; Nuker
        # alpha > 0, beta > 2, gamma < 2, gamma < beta — see
        # ops.profiles for the integrals these protect)
        _AXES = {
            "sersic": ("reff", "reff_b"),
            "moffat": ("fwhm", "fwhm_b"),
            "king": ("rc", "rc_b"),
            "ferrer": ("rout", "rout_b"),
            "nuker": ("rb", "rb_b"),
        }
        for cs in comp_specs:
            if cs.kind == "noisescale":
                # variance factor must stay positive (kept in sync
                # with components.NoiseScale.log_priors and its
                # _batch_constraints)
                s = jnp.asarray(_getter(cs.params, theta, "scale"))
                lp = jnp.where(s <= 0.0, -jnp.inf, lp)
                continue
            if cs.kind == "edgedisk":
                # separable profile: both scales positive, no
                # major/minor ordering (rs and hs multiply different
                # laws — swapping them is not a relabeling degeneracy)
                rs = jnp.asarray(_getter(cs.params, theta, "rs"))
                hs = jnp.asarray(_getter(cs.params, theta, "hs"))
                lp = jnp.where(rs <= 0.0, -jnp.inf, lp)
                lp = jnp.where(hs <= 0.0, -jnp.inf, lp)
                continue
            if cs.kind not in _AXES:
                continue
            a_name, b_name = _AXES[cs.kind]
            a = _getter(cs.params, theta, a_name)
            b = _getter(cs.params, theta, b_name)
            if cs.kind == "moffat":
                beta = _getter(cs.params, theta, "index")
                lp = jnp.where(
                    jnp.asarray(beta) <= 1.0, -jnp.inf, lp
                )
            elif cs.kind == "king":
                rt = jnp.asarray(_getter(cs.params, theta, "rt"))
                al = jnp.asarray(_getter(cs.params, theta, "alpha"))
                lp = jnp.where(rt <= 0.0, -jnp.inf, lp)
                lp = jnp.where(al <= 0.0, -jnp.inf, lp)
            elif cs.kind == "ferrer":
                al = jnp.asarray(_getter(cs.params, theta, "alpha"))
                be = jnp.asarray(_getter(cs.params, theta, "beta"))
                lp = jnp.where(al <= 0.0, -jnp.inf, lp)
                lp = jnp.where(
                    (be < 0.0) | (be >= 2.0), -jnp.inf, lp
                )
            elif cs.kind == "nuker":
                al = jnp.asarray(_getter(cs.params, theta, "alpha"))
                be = jnp.asarray(_getter(cs.params, theta, "beta"))
                ga = jnp.asarray(_getter(cs.params, theta, "gamma"))
                lp = jnp.where(al <= 0.0, -jnp.inf, lp)
                lp = jnp.where(be <= 2.0, -jnp.inf, lp)
                lp = jnp.where(
                    (ga >= 2.0) | (ga >= be), -jnp.inf, lp
                )
            lp = jnp.where(b > a, -jnp.inf, lp)
            # isophote-shape support (both radial profiles):
            if "c0" in cs.params:
                # boxiness: c = c0 + 2 must stay usefully positive
                # (render exponents are 2/c)
                c0 = _getter(cs.params, theta, "c0")
                lp = jnp.where(jnp.asarray(c0) <= -1.95, -jnp.inf, lp)
            amp_sum = None
            for m in (1, 2, 3, 4):
                if f"f{m}" in cs.params:
                    amp = jnp.abs(
                        jnp.asarray(_getter(cs.params, theta, f"f{m}"))
                    )
                    amp_sum = amp if amp_sum is None else amp_sum + amp
            if amp_sum is not None:
                # perturbation factor 1 + f must stay positive
                # everywhere (render floors it at 0.05 as a guard)
                lp = jnp.where(amp_sum > 0.9, -jnp.inf, lp)
            # radial truncation: break radii and softening lengths
            # must stay positive (the flux-ratio quadrature and the
            # logistic envelope both divide by them)
            for tname in ("rtrunc", "rsoft", "rtrunc_in", "rsoft_in"):
                if tname in cs.params:
                    tv = jnp.asarray(_getter(cs.params, theta, tname))
                    lp = jnp.where(tv <= 0.0, -jnp.inf, lp)
            # spiral rotation: the ramp divides by rot_out - rot_in
            if "rot_ang" in cs.params:
                ro = jnp.asarray(_getter(cs.params, theta, "rot_out"))
                ri = (
                    jnp.asarray(_getter(cs.params, theta, "rot_in"))
                    if "rot_in" in cs.params else jnp.asarray(0.0)
                )
                lp = jnp.where(ro <= ri, -jnp.inf, lp)
                lp = jnp.where(ri < 0.0, -jnp.inf, lp)
                if "rot_pow" in cs.params:
                    rp_ = jnp.asarray(
                        _getter(cs.params, theta, "rot_pow")
                    )
                    lp = jnp.where(rp_ <= 0.0, -jnp.inf, lp)
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

    return log_prior



def _obs_psf_spectra(obs):
    """(psf_f, var_f) from a traced-obs dict, or (None, None).

    Spectra arrive either as complex arrays ("psf_f"/"var_f") or as
    separate real/imag planes ("psf_f_re"/"psf_f_im"/...): complex
    host->device transfer is UNIMPLEMENTED on the axon TPU backend
    (and asynchronous — the failure only surfaces at the next blocking
    fetch), so the batched survey paths ship real planes and the
    complex view is rebuilt here INSIDE jit for free.
    """
    fp = obs.get("psf_f")
    if fp is None and "psf_f_re" in obs:
        fp = jax.lax.complex(obs["psf_f_re"], obs["psf_f_im"])
    fv = obs.get("var_f")
    if fv is None and "var_f_re" in obs:
        fv = jax.lax.complex(obs["var_f_re"], obs["var_f_im"])
    return fp, fv


class PosteriorFns:
    """Bundle of pure functions over a fixed ModelSpec.

    Attributes (all jittable, theta is a flat (num_params,) vector):

    * ``log_prior(theta)`` — joint log-prior (includes Sersic axis-ratio
      constraint and NaN guard).
    * ``log_posterior(theta)`` — scalar lnP.
    * ``log_posterior_and_images(theta)`` — (lnP, dict of carry images).
    * ``render_images(theta)`` — dict of the five reference image types.
    * ``constants`` — dict of device constants (obs, var, mask, psf ffts).
    """

    def __init__(self, spec: ModelSpec, dtype=jnp.float32, conv_mode=None):
        import os

        import numpy as np

        self.spec = spec
        self.dtype = dtype
        # any sky component with a tilted-plane gradient? (the plane
        # is added post-convolution — see _sky_plane)
        self._grad_sky = any(
            cs.kind == "sky" and ({"dx", "dy"} & set(cs.params))
            for cs in spec.comp_specs
        )
        # sampled variance-inflation factor (components.NoiseScale):
        # scales the TOTAL per-pixel variance budget inside the
        # likelihood (and therefore the composite-IVM products, the
        # PPC noise budget and the criticism CDFs — everything reads
        # the one scaled var image)
        self._noise_scale_cs = next(
            (cs for cs in spec.comp_specs if cs.kind == "noisescale"),
            None,
        )
        # convolution padding (GALFIT convolution-box analogue): render
        # + convolve on a grid extended by `pad` px per side, crop back
        self.pad = int(getattr(spec, "conv_pad", 0))
        self.render_shape = tuple(n + 2 * self.pad for n in spec.shape)
        # sub-pixel integration of profile components (ops.oversample);
        # window clamped so the dynamic-slice block always fits the grid
        self.oversample = int(getattr(spec, "render_oversample", 1))
        self.os_window = min(
            int(getattr(spec, "oversample_window", 16)),
            min(self.render_shape),
        )
        # 'fft' = jnp.fft.rfft2/irfft2; 'dft' = dense-DFT matmuls on the
        # MXU (see ops.fourier.convolve_rdft) — measured faster on TPU for
        # this workload's 128x128 images.
        if conv_mode is None:
            conv_mode = os.environ.get("PSFMC_CONV", "")
        if not conv_mode:
            # dense-DFT matmuls beat XLA's FFT lowering on TPU-class
            # accelerators (MXU) and also compile far faster; plain FFT
            # wins on CPU where there is no systolic array.
            conv_mode = "fft" if jax.default_backend() == "cpu" else "dft"
        self.conv_mode = conv_mode
        # PSFMC_CONV_STACK=1: stack the three convolution inputs (raw,
        # raw^2, ps) along a leading channel axis so each shared-matrix
        # DFT stage runs one 3x-taller GEMM instead of three dispatches
        # (the last "bigger matmuls" lever at fixed walker count —
        # round-4 verdict item 2).  dft path only; measured A/B in
        # CLAUDE.md decides the default.
        self.conv_stack = (
            os.environ.get("PSFMC_CONV_STACK", "0") not in ("0", "", "off")
            and conv_mode == "dft"
        )
        # kappa via exact Newton or table interpolation (<3e-7 rel error;
        # avoids serial igamma chains on the hot path — ops.gammainc)
        self.kappa_mode = os.environ.get("PSFMC_KAPPA", "table")
        # raw-model renderer: 'xla' (fused by the compiler), 'pallas'
        # (hand-fused kernel, one grid step per walker) or
        # 'pallas_tiled' (walker tiles in VMEM, ops.pallas.sersic_pallas)
        self.render_mode = os.environ.get("PSFMC_RENDER", "xla")
        if self.pad and self.render_mode != "xla":
            import warnings

            warnings.warn(
                "PSFMC_RENDER=pallas* renders the unpadded grid only; "
                "conv_pad>0 falls back to the XLA renderer"
            )
            self.render_mode = "xla"
        if self.oversample > 1 and self.render_mode != "xla":
            import warnings

            warnings.warn(
                "PSFMC_RENDER=pallas* renders point-sampled profiles "
                "only; render_oversample>1 falls back to the XLA "
                "renderer"
            )
            self.render_mode = "xla"
        self._tiled_render = None
        if self.render_mode == "pallas_tiled":
            from ..ops.pallas.sersic_pallas import (
                render_sersics_tiled_vmappable,
            )

            self._tiled_render = render_sersics_tiled_vmappable(spec.shape)

        h, w = spec.shape
        cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
        # Constants stay host-side numpy: they embed into the traced
        # program directly (committed device arrays as closure constants
        # require a device->host pull at trace time, which some PJRT
        # backends — e.g. the tunneled axon TPU — don't support).
        # Render grids span the conv_pad-extended frame in OBS pixel
        # coordinates (negative at the left/top pad); the obs-shape
        # twins serve post-convolution consumers (_sky_plane).
        yg, xg = np.mgrid[0 : self.render_shape[0], 0 : self.render_shape[1]]
        self.constants = {
            "xg": (xg - self.pad).astype(dtype),
            "yg": (yg - self.pad).astype(dtype),
            "xg_o": (xg[: h, : w]).astype(dtype),
            "yg_o": (yg[: h, : w]).astype(dtype),
            "obs_data": np.asarray(spec.obs_data, dtype),
            "obs_var": np.asarray(spec.obs_var, dtype),
            "good_px": np.asarray(~spec.bad_px),
            "f_psf": np.asarray(spec.f_psf_stack, cdtype),
            "f_var": np.asarray(spec.f_var_stack, cdtype),
        }
        if self.conv_mode == "dft":
            from ..ops.fourier import rdft_matrices

            # real/imag kernel half-spectrum stacks + real DFT operator
            # matrices for the half-spectrum matmul path (convolve_rdft)
            rdtype = np.float32 if dtype == jnp.float32 else np.float64
            self.constants["psf_r"] = np.asarray(
                spec.f_psf_stack.real, rdtype
            )
            self.constants["psf_i"] = np.asarray(
                spec.f_psf_stack.imag, rdtype
            )
            self.constants["var_r"] = np.asarray(
                spec.f_var_stack.real, rdtype
            )
            self.constants["var_i"] = np.asarray(
                spec.f_var_stack.imag, rdtype
            )
            self.constants["rdft_mats"] = rdft_matrices(
                self.render_shape, rdtype
            )
        self.mag_zp = float(spec.mag_zeropoint)

        # per-pixel likelihood family (spec.likelihood): 'gaussian'
        # (reference parity), 'student' (robust, static df) or
        # 'poisson' (low-count; static gain, model passed per call)
        self._lnlike = make_lnlike(
            getattr(spec, "likelihood", "gaussian"),
            getattr(spec, "likelihood_df", 4.0),
            getattr(spec, "likelihood_gain", 1.0),
        )
        # pointwise twin feeding WAIC/PSIS-LOO (analysis path only)
        from ..ops.likelihood import make_lnlike_pointwise

        self._lnlike_pointwise = make_lnlike_pointwise(
            getattr(spec, "likelihood", "gaussian"),
            getattr(spec, "likelihood_df", 4.0),
            getattr(spec, "likelihood_gain", 1.0),
        )
        self.log_prior = self._make_log_prior()
        self.log_posterior = partial(self._lnpost_impl, with_images=False)
        # Optional fully-fused Pallas likelihood (render + DFT convs +
        # reduction in one VMEM pass per walker).  Samplers that see a
        # ``log_posterior_batch`` attribute use it for the half-ensemble
        # evaluation instead of vmapping log_posterior.
        self.lnpost_mode = os.environ.get("PSFMC_LNPOST", "xla")
        if self.lnpost_mode == "pallas":
            from ..ops.pallas.lnpost_pallas import (
                fused_lnl_supported,
                make_fused_lnl_batch,
            )

            if fused_lnl_supported(spec, self.conv_mode):
                lnl_batch = make_fused_lnl_batch(
                    self.constants,
                    spec,
                    spec.comp_specs,
                    self.mag_zp,
                    dtype,
                    kappa_mode=self.kappa_mode,
                )
                log_prior = self.log_prior

                def log_posterior_batch(thetas):
                    lp = jax.vmap(log_prior)(thetas).astype(dtype)
                    lnl = lnl_batch(thetas)
                    return jnp.where(jnp.isfinite(lp), lnl + lp, -jnp.inf)

                self.log_posterior_batch = log_posterior_batch
                # the kernel's scalar IS the Gaussian log-likelihood —
                # the tempered sampler consumes it directly
                self.log_likelihood_batch = lnl_batch
            else:
                import warnings

                warnings.warn(
                    "PSFMC_LNPOST=pallas requires the dft convolution "
                    "mode, a single PSF, whitelisted elliptical "
                    "components, a flat sky, a Gaussian likelihood and "
                    "conv_pad=0; falling back to the XLA path"
                )
        elif self.lnpost_mode == "pallas_batched":
            # Walker-batched fused conv+likelihood kernel: render stays
            # in XLA (component-agnostic), the DFT+reduction runs tiled
            # over walkers so every dot is a big GEMM
            # (ops.pallas.lnpost_batched).
            from ..ops.pallas.lnpost_batched import (
                batched_lnl_supported,
                make_batched_conv_lnl,
            )

            if batched_lnl_supported(spec):
                lnl_kernel = make_batched_conv_lnl(
                    self.constants, spec, dtype
                )
                raw_batch = jax.vmap(lambda th: self._raw_and_ps(th)[0])

                def lnl_batch(thetas):
                    return lnl_kernel(
                        raw_batch(jnp.asarray(thetas, dtype))
                    )

                log_prior = self.log_prior

                def log_posterior_batch(thetas):
                    lp = jax.vmap(log_prior)(thetas).astype(dtype)
                    lnl = lnl_batch(thetas)
                    return jnp.where(
                        jnp.isfinite(lp), lnl + lp, -jnp.inf
                    )

                self.log_posterior_batch = log_posterior_batch
                self.log_likelihood_batch = lnl_batch
            else:
                import warnings

                warnings.warn(
                    "PSFMC_LNPOST=pallas_batched requires a single "
                    "PSF, a flat sky, a Gaussian likelihood and "
                    "conv_pad=0; falling back to the XLA path"
                )
        self.log_posterior_and_images = partial(
            self._lnpost_impl, with_images=True
        )
        # images-only path: the sampler's retained-phase accumulation
        # renders the current ensemble without re-evaluating the prior
        # or likelihood
        self.carry_images = self._images_impl
        self.render_images = self._render_images

        # Jitted-program cache shared by every consumer of this posterior.
        # jax.jit caches by callable identity, so ad-hoc jit wrappers (or
        # per-sampler partials) would silently recompile these expensive
        # programs; all compiled artifacts live here instead.
        self.programs: Dict[Any, Any] = {}
        self.batched_lnpost_and_images = jax.jit(
            jax.vmap(self.log_posterior_and_images)
        )
        self.batched_lnpost = jax.jit(jax.vmap(self.log_posterior))
        self.batched_render = jax.jit(jax.vmap(self._render_images))

    # -- prior ------------------------------------------------------------
    def _make_log_prior(self):
        return make_log_prior(self.spec.slots, self.spec.comp_specs,
                              self.dtype)

    # -- renders ------------------------------------------------------------
    def _psf_index(self, theta):
        cs = next(
            c for c in self.spec.comp_specs if c.kind == "psfselector"
        )
        kind, payload = cs.params["psf_index"]
        if kind == "const":
            return jnp.asarray(int(payload), jnp.int32)
        offset, _size = payload
        idx = jnp.round(theta[offset]).astype(jnp.int32)
        return jnp.clip(idx, 0, self.spec.num_psfs - 1)

    def _sky_plane(self, theta):
        """Post-convolution tilted-plane background (components.Sky).

        The gradient plane is additive background that never rode the
        PSF: it is added AFTER the convolution.  A constant sky is
        convolution-invariant, so the reference's convolved flat sky
        is unaffected — but a ramp is not: circular convolution would
        wrap it at the frame edges, flattening exactly the edge
        columns a background slope exists to model.  The plane also
        contributes no PSF-mismatch model variance
        (``convolve(raw^2, f_var)`` sees the plane-free raw).
        """
        c = self.constants
        h, w = self.spec.shape
        plane = jnp.zeros(self.spec.shape, self.dtype)
        for cs in self.spec.comp_specs:
            if cs.kind != "sky":
                continue
            if "dx" in cs.params:
                dx = jnp.asarray(
                    _getter(cs.params, theta, "dx"), self.dtype
                )
                plane = plane + dx * (c["xg_o"] - (w - 1) / 2.0)
            if "dy" in cs.params:
                dy = jnp.asarray(
                    _getter(cs.params, theta, "dy"), self.dtype
                )
                plane = plane + dy * (c["yg_o"] - (h - 1) / 2.0)
        return plane

    def _crop(self, img):
        """Crop a render-grid image back to the observation frame."""
        if not self.pad:
            return img
        p = self.pad
        return img[..., p:-p, p:-p]

    def _apply_oversample(self, raw, xy, fn_coarse, fn_fine):
        """Apply the sub-pixel integration window for one profile
        component (``render_oversample > 1`` only; see ops.oversample).

        ``fn_coarse(xg, yg)`` must evaluate EXACTLY what the full-frame
        render added (correction included) so the subtraction inside the
        window is bitwise-consistent; ``fn_fine`` is the bare profile
        the midpoint sub-samples integrate.
        """
        from ..ops.oversample import (
            apply_window_delta,
            oversampled_window_delta,
            window_origin,
        )

        origin = window_origin(xy, self.os_window, self.render_shape,
                               self.pad)
        delta = oversampled_window_delta(
            fn_coarse, fn_fine, origin, self.os_window, self.oversample,
            self.pad, self.dtype,
        )
        return apply_window_delta(raw, delta, origin)

    def _raw_and_ps(self, theta):
        """Raw composite model and the point-source-only image."""
        c = self.constants
        raw = jnp.zeros(self.render_shape, self.dtype)
        ps = jnp.zeros(self.render_shape, self.dtype)
        sky = jnp.zeros((), self.dtype)
        packed_sersics = []
        for cs in self.spec.comp_specs:
            if cs.kind == "sky":
                adu = _getter(cs.params, theta, "adu")
                sky = sky + jnp.asarray(adu, self.dtype)
                # the gradient plane is NOT part of ``raw``: a sky
                # background is not PSF-convolved, and folding the
                # non-periodic ramp into the circular convolution would
                # wrap it at the frame edges (see _sky_plane)
            elif cs.kind == "pointsource":
                xy = _getter(cs.params, theta, "xy")
                xy = jnp.asarray(xy, self.dtype)
                mag = _getter(cs.params, theta, "mag")
                ps = ps + render_pointsource_dense(
                    self.render_shape,
                    xy + self.pad,
                    mag,
                    self.mag_zp,
                    cs.static["shift_method"],
                    self.dtype,
                )
            elif cs.kind == "moffat":
                xy = jnp.asarray(_getter(cs.params, theta, "xy"), self.dtype)
                args = (
                    xy,
                    _getter(cs.params, theta, "mag"),
                    _getter(cs.params, theta, "fwhm"),
                    _getter(cs.params, theta, "fwhm_b"),
                    _getter(cs.params, theta, "index"),
                    _getter(cs.params, theta, "angle"),
                )
                shaped, c0, fourier, bending, rot = _shape_args(
                    cs, theta
                )
                trunc = _trunc_args(cs, theta)
                if shaped or trunc is not None:
                    from ..ops.moffat import render_moffat_gen

                    def _moffat_fn(xg, yg, _a=args, _c0=c0, _f=fourier,
                                   _b=bending, _r=rot, _t=trunc,
                                   _deg=cs.static["angle_degrees"]):
                        return render_moffat_gen(
                            xg, yg, *_a, _c0, self.mag_zp, _deg,
                            fourier=_f, bending=_b, rotation=_r,
                            trunc=_t,
                        )
                else:
                    from ..ops.moffat import render_moffat

                    def _moffat_fn(xg, yg, _a=args,
                                   _deg=cs.static["angle_degrees"]):
                        return render_moffat(
                            xg, yg, *_a, self.mag_zp, _deg
                        )

                raw = raw + _moffat_fn(c["xg"], c["yg"])
                if self.oversample > 1:
                    # the analytic Moffat core has no sub-pixel
                    # correction term: coarse == fine form
                    raw = self._apply_oversample(
                        raw, xy, _moffat_fn, _moffat_fn
                    )
            elif cs.kind == "edgedisk":
                from ..ops.profiles import render_edgedisk

                xy = jnp.asarray(
                    _getter(cs.params, theta, "xy"), self.dtype
                )
                args = (
                    xy,
                    _getter(cs.params, theta, "mag"),
                    _getter(cs.params, theta, "rs"),
                    _getter(cs.params, theta, "hs"),
                    _getter(cs.params, theta, "angle"),
                )

                def _edge_fn(xg, yg, _a=args,
                             _deg=cs.static["angle_degrees"]):
                    return render_edgedisk(
                        xg, yg, *_a, self.mag_zp, _deg
                    )

                raw = raw + _edge_fn(c["xg"], c["yg"])
                if self.oversample > 1:
                    # finite analytic center (x K1 -> 1): the
                    # point-sampled form IS the fine form
                    raw = self._apply_oversample(
                        raw, xy, _edge_fn, _edge_fn
                    )
            elif cs.kind in ("king", "ferrer", "nuker"):
                from ..ops import profiles as _prof

                # (family-specific radial params in layout order; the
                # renderers share the (xy, mag, *radial, angle) calling
                # convention so one closure shape covers all three)
                radial_attrs = {
                    "king": ("rc", "rc_b", "rt", "alpha"),
                    "ferrer": ("rout", "rout_b", "alpha", "beta"),
                    "nuker": ("rb", "rb_b", "alpha", "beta", "gamma"),
                }[cs.kind]
                plain_fn, gen_fn = {
                    "king": (_prof.render_king, _prof.render_king_gen),
                    "ferrer": (
                        _prof.render_ferrer, _prof.render_ferrer_gen
                    ),
                    "nuker": (
                        _prof.render_nuker, _prof.render_nuker_gen
                    ),
                }[cs.kind]
                xy = jnp.asarray(_getter(cs.params, theta, "xy"), self.dtype)
                args = (
                    (xy, _getter(cs.params, theta, "mag"))
                    + tuple(
                        _getter(cs.params, theta, n)
                        for n in radial_attrs
                    )
                    + (_getter(cs.params, theta, "angle"),)
                )
                shaped, c0, fourier, bending, rot = _shape_args(
                    cs, theta
                )
                if shaped:
                    def _prof_fn(xg, yg, _a=args, _c0=c0, _f=fourier,
                                 _b=bending, _r=rot, _fn=gen_fn,
                                 _deg=cs.static["angle_degrees"],
                                 **kw):
                        return _fn(
                            xg, yg, *_a, _c0, self.mag_zp, _deg,
                            fourier=_f, bending=_b, rotation=_r, **kw,
                        )
                else:
                    def _prof_fn(xg, yg, _a=args, _fn=plain_fn,
                                 _deg=cs.static["angle_degrees"],
                                 **kw):
                        return _fn(xg, yg, *_a, self.mag_zp, _deg,
                                   **kw)

                raw = raw + _prof_fn(c["xg"], c["yg"])
                if self.oversample > 1:
                    # no trapezoid term in these families: the
                    # point-sampled form IS the fine form — except the
                    # Nuker cusp floor, which relaxes by 1/S^2 for the
                    # legitimately closer midpoint sub-samples
                    fine_fn = _prof_fn
                    if cs.kind == "nuker":
                        def fine_fn(xg, yg, _fn=_prof_fn):
                            return _fn(
                                xg, yg,
                                min_px_sq=0.125 / self.oversample**2,
                            )

                    raw = self._apply_oversample(
                        raw, xy, _prof_fn, fine_fn
                    )
            elif cs.kind == "sersic":
                xy = jnp.asarray(_getter(cs.params, theta, "xy"), self.dtype)
                shaped, c0, fourier, bending, rot = _shape_args(
                    cs, theta
                )
                trunc = _trunc_args(cs, theta)
                if shaped or trunc is not None:
                    # boxy/disky/Fourier/bent/truncated isophotes
                    # render on the XLA path in every mode (the Pallas
                    # kernels pack the 9-scalar elliptical form only);
                    # composition is additive so mixing with packed
                    # elliptical components is exact
                    from ..ops.sersic import render_sersic_gen

                    gen_args = (
                        xy,
                        _getter(cs.params, theta, "mag"),
                        _getter(cs.params, theta, "reff"),
                        _getter(cs.params, theta, "reff_b"),
                        _getter(cs.params, theta, "index"),
                        _getter(cs.params, theta, "angle"),
                        c0,
                        self.mag_zp,
                        cs.static["angle_degrees"],
                    )

                    def _sersic_gen_fn(xg, yg, correction=True,
                                       _a=gen_args, _f=fourier,
                                       _b=bending, _r=rot, _t=trunc):
                        return render_sersic_gen(
                            xg, yg, *_a, kappa_mode=self.kappa_mode,
                            fourier=_f, bending=_b, rotation=_r,
                            trunc=_t, correction=correction,
                        )

                    raw = raw + _sersic_gen_fn(c["xg"], c["yg"])
                    if self.oversample > 1:
                        raw = self._apply_oversample(
                            raw, xy, _sersic_gen_fn,
                            lambda xg, yg, _fn=_sersic_gen_fn: _fn(
                                xg, yg, correction=False
                            ),
                        )
                    continue
                args = (
                    xy,
                    _getter(cs.params, theta, "mag"),
                    _getter(cs.params, theta, "reff"),
                    _getter(cs.params, theta, "reff_b"),
                    _getter(cs.params, theta, "index"),
                    _getter(cs.params, theta, "angle"),
                    self.mag_zp,
                    cs.static["angle_degrees"],
                )
                if self.render_mode in ("pallas", "pallas_tiled"):
                    from ..ops.pallas import pack_sersic_params

                    packed_sersics.append(
                        pack_sersic_params(*args, kappa_mode=self.kappa_mode)
                    )
                else:
                    raw = raw + render_sersic(
                        c["xg"], c["yg"], *args, kappa_mode=self.kappa_mode
                    )
                    if self.oversample > 1:
                        def _sersic_fn(xg, yg, correction=True, _a=args):
                            return render_sersic(
                                xg, yg, *_a,
                                kappa_mode=self.kappa_mode,
                                correction=correction,
                            )

                        raw = self._apply_oversample(
                            raw, xy, _sersic_fn,
                            lambda xg, yg: _sersic_fn(
                                xg, yg, correction=False
                            ),
                        )
        if self.render_mode == "pallas_tiled" and packed_sersics:
            raw = raw + self._tiled_render(
                jnp.stack(packed_sersics).astype(self.dtype),
                jnp.asarray(sky, self.dtype),
            )
        elif self.render_mode == "pallas" and packed_sersics:
            from ..ops.pallas import render_sersics_pallas_one

            raw = raw + render_sersics_pallas_one(
                jnp.stack(packed_sersics).astype(self.dtype),
                sky,
                self.spec.shape,
            )
        else:
            raw = raw + sky
        raw = raw + ps
        return raw, ps

    def _images_impl(self, theta, obs_var=None, psf_f=None, var_f=None):
        """The four independent carry images (see module docstring).

        ``obs_var`` overrides the baked-in observation variance map with
        a traced array — the batched multi-target fit path
        (:mod:`psfmc_tpu.batchfit`) evaluates one compiled posterior
        against a whole stack of observations.  ``psf_f``/``var_f``
        override the baked PSF + variance-kernel half-spectra with
        traced ``(num_psfs, Hf, Wf)`` complex stacks (same layout as
        ``spec.f_psf_stack``) — the survey-mode per-target-PSF path;
        the stochastic index gathers into the override exactly as it
        would into the constants.
        """
        c = self.constants
        idx = self._psf_index(theta)
        raw, ps = self._raw_and_ps(theta)

        if self.conv_mode == "dft":
            from ..ops.fourier import convolve_rdft

            if psf_f is None:
                psf_r = jnp.asarray(c["psf_r"])[idx]
                psf_i = jnp.asarray(c["psf_i"])[idx]
                var_r = jnp.asarray(c["var_r"])[idx]
                var_i = jnp.asarray(c["var_i"])[idx]
            else:
                fp, fv = psf_f[idx], var_f[idx]
                psf_r, psf_i = jnp.real(fp), jnp.imag(fp)
                var_r, var_i = jnp.real(fv), jnp.imag(fv)
            mats = c["rdft_mats"]
            if self.conv_stack:
                # one channel-stacked call: every DFT stage contracts a
                # (3H, *) operand instead of three (H, *) dispatches
                out = convolve_rdft(
                    jnp.stack([raw, raw * raw, ps]),
                    jnp.stack([psf_r, var_r, psf_r]),
                    jnp.stack([psf_i, var_i, psf_i]),
                    mats,
                )
                conv, model_var, ps_conv = out[0], out[1], out[2]
            else:
                conv = convolve_rdft(raw, psf_r, psf_i, mats)
                model_var = convolve_rdft(raw * raw, var_r, var_i, mats)
                ps_conv = convolve_rdft(ps, psf_r, psf_i, mats)
        else:
            # jnp wrap: the stacks are host numpy (see __init__) and the
            # index may be a tracer
            if psf_f is None:
                f_psf = jnp.asarray(c["f_psf"])[idx]
                f_var = jnp.asarray(c["f_var"])[idx]
            else:
                f_psf, f_var = psf_f[idx], var_f[idx]
            conv = convolve(raw, f_psf)
            model_var = convolve(raw * raw, f_var)
            ps_conv = convolve(ps, f_psf)

        raw = self._crop(raw)
        conv = self._crop(conv)
        model_var = self._crop(model_var)
        ps_conv = self._crop(ps_conv)
        base_var = c["obs_var"] if obs_var is None else obs_var
        var_total = model_var + base_var
        if self._noise_scale_cs is not None:
            s = jnp.asarray(
                _getter(self._noise_scale_cs.params, theta, "scale"),
                self.dtype,
            )
            var_total = var_total * s
        if self._grad_sky:
            plane = self._sky_plane(theta)
            raw = raw + plane
            conv = conv + plane
        return {"raw": raw, "conv": conv, "var": var_total, "ps_conv": ps_conv}

    def _convolve_pair(self, raw_like, ps_like, sq_like, idx):
        """(conv, model_var, ps_conv) for one image triple + PSF index."""
        c = self.constants
        if self.conv_mode == "dft":
            from ..ops.fourier import convolve_rdft

            psf_r = jnp.asarray(c["psf_r"])[idx]
            psf_i = jnp.asarray(c["psf_i"])[idx]
            var_r = jnp.asarray(c["var_r"])[idx]
            var_i = jnp.asarray(c["var_i"])[idx]
            mats = c["rdft_mats"]
            if self.conv_stack:
                out = convolve_rdft(
                    jnp.stack([raw_like, sq_like, ps_like]),
                    jnp.stack([psf_r, var_r, psf_r]),
                    jnp.stack([psf_i, var_i, psf_i]),
                    mats,
                )
                return (
                    self._crop(out[0]),
                    self._crop(out[1]),
                    self._crop(out[2]),
                )
            return (
                self._crop(convolve_rdft(raw_like, psf_r, psf_i, mats)),
                self._crop(convolve_rdft(sq_like, var_r, var_i, mats)),
                self._crop(convolve_rdft(ps_like, psf_r, psf_i, mats)),
            )
        f_psf = jnp.asarray(c["f_psf"])[idx]
        f_var = jnp.asarray(c["f_var"])[idx]
        return (
            self._crop(convolve(raw_like, f_psf)),
            self._crop(convolve(sq_like, f_var)),
            self._crop(convolve(ps_like, f_psf)),
        )

    def ensemble_carry_means(self, thetas):
        """Walker-mean carry images, computed with per-PSF-group sums.

        Exploits that convolution is LINEAR: the ensemble mean of
        ``conv(raw_w)``, ``conv(raw_w^2)`` and ``conv(ps_w)`` equals the
        convolution of the ensemble means (grouped by each walker's
        discrete PSF index), so the sampler's per-step accumulation
        costs ``num_psfs`` convolution triples instead of ``nwalkers``
        (3 convs vs 750 at 250 walkers).  Renders still run per walker.
        Exactly equal (up to f32 summation order) to averaging
        ``carry_images`` over walkers — asserted in tests.
        """
        thetas = jnp.asarray(thetas, self.dtype)
        nwalkers = thetas.shape[0]
        raws, pss = jax.vmap(self._raw_and_ps)(thetas)
        inv_n = 1.0 / nwalkers

        # Per-walker variance weights (NoiseScale): the walker-mean of
        # s_w * conv(raw_w^2) is conv(mean of s_w * raw_w^2) — the
        # linearity shortcut survives because the scale is a per-walker
        # SCALAR weight; the observation term averages as mean(s_w).
        mean_s = 1.0
        sq_w = raws * raws
        if self._noise_scale_cs is not None:
            cs = self._noise_scale_cs
            s_w = jax.vmap(
                lambda th: jnp.asarray(
                    _getter(cs.params, th, "scale"), self.dtype
                )
            )(thetas)
            mean_s = jnp.mean(s_w)
            sq_w = sq_w * s_w[:, None, None]

        if self.spec.num_psfs == 1:
            group_raw = jnp.sum(raws, axis=0)[None] * inv_n
            group_sq = jnp.sum(sq_w, axis=0)[None] * inv_n
            group_ps = jnp.sum(pss, axis=0)[None] * inv_n
        else:
            idxs = jax.vmap(self._psf_index)(thetas)
            onehot = jax.nn.one_hot(
                idxs, self.spec.num_psfs, dtype=self.dtype
            )  # (nwalkers, num_psfs)
            # Per-PSF-group sums via one einsum each.  These feed the
            # posterior-mean science images, so force full f32 matmul
            # precision — the TPU default is bf16 and would cost ~2-3
            # significant digits (cost here is negligible: the contracted
            # axis is only nwalkers x num_psfs).
            hi = jax.lax.Precision.HIGHEST
            group_raw = (
                jnp.einsum("wk,whx->khx", onehot, raws, precision=hi) * inv_n
            )
            group_sq = (
                jnp.einsum("wk,whx->khx", onehot, sq_w, precision=hi)
                * inv_n
            )
            group_ps = (
                jnp.einsum("wk,whx->khx", onehot, pss, precision=hi) * inv_n
            )

        all_idx = jnp.arange(group_raw.shape[0], dtype=jnp.int32)
        conv_g, var_g, psc_g = jax.vmap(
            self._convolve_pair, in_axes=(0, 0, 0, 0)
        )(group_raw, group_ps, group_sq, all_idx)

        mean_raw = self._crop(jnp.sum(group_raw, axis=0))
        mean_conv = jnp.sum(conv_g, axis=0)
        mean_var = (
            jnp.sum(var_g, axis=0) + mean_s * self.constants["obs_var"]
        )
        mean_psc = jnp.sum(psc_g, axis=0)
        raws = self._crop(raws)
        if self._grad_sky:
            # post-convolution background plane (see _sky_plane): the
            # walker-mean plane rides both the raw and convolved means
            planes = jax.vmap(self._sky_plane)(thetas)
            mean_plane = jnp.sum(planes, axis=0) * inv_n
            mean_raw = mean_raw + mean_plane
            mean_conv = mean_conv + mean_plane
            raws = raws + planes
        # Batch M2 (sum of squared deviations about THIS batch's mean)
        # for the per-pixel posterior-std product.  Deviation form, not
        # E[raw^2]-E[raw]^2: the deviations are O(posterior std) so f32
        # carries them exactly, whereas the raw second moment is
        # O(mean^2) and its cancellation noise (~1e-4 relative after
        # 5e4 accumulation steps) would exceed the true variance for
        # any pixel with std below ~1% of its mean (bright, well-
        # constrained point sources — precisely the interesting ones).
        raw_m2 = jnp.sum((raws - mean_raw[None]) ** 2, axis=0)
        return {
            "raw": mean_raw,
            "conv": mean_conv,
            "var": mean_var,
            "ps_conv": mean_psc,
            "raw_m2": raw_m2,
        }

    def _lnpost_impl(self, theta, with_images=False):
        theta = jnp.asarray(theta, self.dtype)
        c = self.constants
        lp = self.log_prior(theta)
        imgs = self._images_impl(theta)
        resid = c["obs_data"] - imgs["conv"]
        ivm = 1.0 / imgs["var"]
        lnl = self._lnlike(resid, ivm, c["good_px"], imgs["conv"])
        lnpost = jnp.where(jnp.isfinite(lp), lnl + lp, -jnp.inf)
        if with_images:
            return lnpost, imgs
        return lnpost

    def log_likelihood(self, theta):
        """Data term alone (no prior): the masked Gaussian lnL.

        The joint multi-band posterior (:mod:`psfmc_tpu.models.joint`)
        sums one band-likelihood per observation and adds the global
        prior exactly once — band PosteriorFns contribute only this.
        """
        theta = jnp.asarray(theta, self.dtype)
        c = self.constants
        imgs = self._images_impl(theta)
        resid = c["obs_data"] - imgs["conv"]
        ivm = 1.0 / imgs["var"]
        return self._lnlike(resid, ivm, c["good_px"], imgs["conv"])

    def pointwise_log_likelihood(self, theta):
        """Per-pixel log-density map (H, W); 0 at masked pixels.

        The pointwise decomposition of :meth:`log_likelihood` (same
        masked term, same transcendentals — their sum matches the
        scalar exactly).  Feeds the WAIC/PSIS-LOO model-comparison
        layer (:mod:`psfmc_tpu.analysis.model_comparison`), which the
        reference has no analogue of — its only model-comparison
        product is eyeballing residual images.
        """
        theta = jnp.asarray(theta, self.dtype)
        c = self.constants
        imgs = self._images_impl(theta)
        resid = c["obs_data"] - imgs["conv"]
        ivm = 1.0 / imgs["var"]
        return self._lnlike_pointwise(
            resid, ivm, c["good_px"], imgs["conv"]
        )

    def pointwise_predictive_cdf(self, theta):
        """Per-pixel P(y_rep <= y_obs | theta) map; 0.5 at masked px.

        The predictive CDF of each pixel's own noise model evaluated at
        the observation — the per-draw ingredient of LOO-PIT
        (:func:`psfmc_tpu.analysis.model_comparison.loo_pit`).
        """
        from ..ops.likelihood import make_cdf_pointwise

        theta = jnp.asarray(theta, self.dtype)
        c = self.constants
        imgs = self._images_impl(theta)
        resid = c["obs_data"] - imgs["conv"]
        ivm = 1.0 / imgs["var"]
        cdf_fn = make_cdf_pointwise(
            getattr(self.spec, "likelihood", "gaussian"),
            getattr(self.spec, "likelihood_df", 4.0),
            getattr(self.spec, "likelihood_gain", 1.0),
        )
        return cdf_fn(resid, ivm, c["good_px"], imgs["conv"])

    def pointwise_lnl_and_cdf(self, theta):
        """(log-density map, predictive-CDF map) from ONE render.

        The two maps share the render + convolutions (the expensive
        part); LOO-PIT needs both, so computing them in one program
        halves its device work vs calling the two single-map methods.
        """
        from ..ops.likelihood import make_cdf_pointwise

        theta = jnp.asarray(theta, self.dtype)
        c = self.constants
        imgs = self._images_impl(theta)
        resid = c["obs_data"] - imgs["conv"]
        ivm = 1.0 / imgs["var"]
        cdf_fn = make_cdf_pointwise(
            getattr(self.spec, "likelihood", "gaussian"),
            getattr(self.spec, "likelihood_df", 4.0),
            getattr(self.spec, "likelihood_gain", 1.0),
        )
        return (
            self._lnlike_pointwise(resid, ivm, c["good_px"], imgs["conv"]),
            cdf_fn(resid, ivm, c["good_px"], imgs["conv"]),
        )

    def log_posterior_obs(self, theta, obs):
        """lnpost against a *traced* observation instead of the baked one.

        ``obs`` is a dict with ``obs_data`` (H, W), ``obs_var`` (H, W;
        inf at bad pixels) and ``good_px`` (H, W bool) arrays.  Renders,
        convolutions and the prior are identical to
        :meth:`log_posterior`; only the data plane differs — this is
        what lets :func:`psfmc_tpu.batchfit.fit_batch` evaluate one
        compiled program against a whole stack of mock observations
        (the completeness-simulation workflow the reference leaves to a
        serial per-target loop).  Optional ``psf_f``/``var_f`` entries
        (``(num_psfs, Hf, Wf)`` complex half-spectra, layout of
        ``spec.f_psf_stack`` — see
        :func:`psfmc_tpu.batchfit.prepare_psf_stack`) replace the baked
        PSF per observation: the survey mode where every target has its
        own PSF star.
        """
        theta = jnp.asarray(theta, self.dtype)
        lp = self.log_prior(theta)
        fp, fv = _obs_psf_spectra(obs)
        imgs = self._images_impl(
            theta, obs_var=obs["obs_var"], psf_f=fp, var_f=fv,
        )
        resid = obs["obs_data"] - imgs["conv"]
        ivm = 1.0 / imgs["var"]
        lnl = self._lnlike(resid, ivm, obs["good_px"], imgs["conv"])
        return jnp.where(jnp.isfinite(lp), lnl + lp, -jnp.inf)

    def log_likelihood_obs(self, theta, obs):
        """Data term against a *traced* observation (no prior).

        The likelihood-only twin of :meth:`log_posterior_obs` — the
        hierarchical population fit (:mod:`psfmc_tpu.hierarchy`) sums
        one of these per target and evaluates its own joint prior over
        the stacked parameter vector.  Honors the same optional
        ``psf_f``/``var_f`` per-observation PSF override.
        """
        theta = jnp.asarray(theta, self.dtype)
        fp, fv = _obs_psf_spectra(obs)
        imgs = self._images_impl(
            theta, obs_var=obs["obs_var"], psf_f=fp, var_f=fv,
        )
        resid = obs["obs_data"] - imgs["conv"]
        ivm = 1.0 / imgs["var"]
        return self._lnlike(resid, ivm, obs["good_px"], imgs["conv"])

    def _render_images(self, theta):
        """All five reference image types (models.py:213-226 blobs)."""
        theta = jnp.asarray(theta, self.dtype)
        c = self.constants
        imgs = self._images_impl(theta)
        return carry_to_reference_images(
            imgs, c["obs_data"]
        )


def carry_to_reference_images(imgs: Dict[str, Any], obs_data):
    """Map the independent carry basis to the five reference image types."""
    return {
        "raw_model": imgs["raw"],
        "convolved_model": imgs["conv"],
        "residual": obs_data - imgs["conv"],
        "composite_ivm": 1.0 / imgs["var"],
        "point_source_subtracted": obs_data - imgs["ps_conv"],
    }


def build_posterior(spec: ModelSpec, dtype=jnp.float32, conv_mode=None) -> PosteriorFns:
    return PosteriorFns(spec, dtype=dtype, conv_mode=conv_mode)
