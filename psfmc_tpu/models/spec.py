"""Static model specification: components compiled to a flat-vector program.

This is the TPU-first replacement for the reference's mutable-object
parameter plumbing (reference models.py:174-185 + ComponentBase.py:45-74).
A :class:`ModelSpec` captures, once at model-build time:

* the canonical parameter-vector layout — components in file order with
  the PSF selector appended last, alphabetical attribute order within a
  component, ``xy`` spanning two slots (reference models.py:38-42,
  ComponentBase.py:57) — as static offsets,
* per-component static config (shift method, angle units, ...),
* the device constants: observation image/variance/good-pixel mask and
  the pre-FFT'd PSF + variance stacks.

Everything downstream (the jitted posterior in
:mod:`psfmc_tpu.models.posterior`) is a pure function of
``(theta, ModelSpec)`` with no Python-object state.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .components import (
    EdgeDisk,
    Ferrer,
    King,
    Moffat,
    NoiseScale,
    Nuker,
    ComponentBase,
    Configuration,
    PointSource,
    PSFSelector,
    Sersic,
    Sky,
)

__all__ = ["ParamSlot", "CompSpec", "ModelSpec", "build_model_spec"]


@dataclass(frozen=True)
class ParamSlot:
    """One stochastic attribute's slice of the flat parameter vector."""

    comp_index: int
    attr: str
    offset: int
    size: int
    name: str
    fitsname: str
    dist: Any  # Distribution (host object; jax_logp is pure)
    is_discrete: bool


@dataclass(frozen=True)
class CompSpec:
    """Static render rule for one component.

    ``params`` maps attribute name -> ('const', value) or
    ('theta', (offset, size)).
    """

    kind: str  # 'sky' | 'pointsource' | 'sersic' | 'psfselector'
    params: Dict[str, Tuple[str, Any]]
    static: Dict[str, Any] = field(default_factory=dict)


@dataclass
class ModelSpec:
    comp_specs: List[CompSpec]
    slots: List[ParamSlot]
    num_params: int
    shape: Tuple[int, int]
    mag_zeropoint: float
    obs_data: np.ndarray
    obs_var: np.ndarray
    bad_px: np.ndarray
    f_psf_stack: np.ndarray  # (npsf, H, W//2+1) complex
    f_var_stack: np.ndarray
    num_psfs: int
    # per-pixel likelihood family ('gaussian' reference parity,
    # 'student' robust, 'poisson' low-count) + its static degrees of
    # freedom (student) / counts-per-observation-unit gain (poisson)
    likelihood: str = "gaussian"
    likelihood_df: float = 4.0
    likelihood_gain: float = 1.0
    # convolution padding in pixels (0 = reference wrap behavior);
    # when > 0 the f_*_stack spectra are sized to the PADDED grid
    conv_pad: int = 0
    # sub-pixel integration of profile components (1 = reference
    # point-sampling parity): an oversample_window-sized box around each
    # Sersic/Moffat center is re-rendered render_oversample times finer
    # and flux-binned (ops.oversample)
    render_oversample: int = 1
    oversample_window: int = 16

    @property
    def param_names(self) -> List[str]:
        return [s.name for s in self.slots]

    @property
    def param_fits_abbrs(self) -> List[str]:
        return [s.fitsname for s in self.slots]

    @property
    def param_lens(self) -> List[int]:
        return [s.size for s in self.slots]


def _pixel_affine(frame_from, frame_to):
    """Local affine (A, b) mapping 0-based pixels from one band's frame
    to another's through the sky (pixel_a -> world -> pixel_b).

    Exact up to TAN curvature across the field (negligible over
    HST-scale cutouts); linearized by finite differences at the source
    band's image center.  ``frame_*`` are (MiniWCS, ref_xy) pairs.
    """
    wcs_from, ref = frame_from
    wcs_to, _ = frame_to

    def fwd(p):
        ra, dec = wcs_from.pixel_to_sky(p[0] + 1.0, p[1] + 1.0)
        x, y = wcs_to.sky_to_pixel(ra, dec)
        return np.array([float(x) - 1.0, float(y) - 1.0])

    p0 = np.asarray(ref, float)
    f0 = fwd(p0)
    a = np.stack(
        [
            (fwd(p0 + np.array([1.0, 0.0])) - f0),
            (fwd(p0 + np.array([0.0, 1.0])) - f0),
        ],
        axis=1,
    )
    return a, f0 - a @ p0


def _resolve(component, attr, slot_map, wcs_map=None):
    """('theta', (offset, size)) if stochastic else ('const', value).

    ``Tied(other, attr)`` values resolve transitively to the referenced
    component's slot (both render rules then read the SAME parameter-
    vector slice) or to its constant; cycles are rejected.  A
    ``frame='sky'`` tie anywhere in the chain resolves to
    ``('theta_affine', (offset, size, A, b))``: the owner's pixel
    position maps through the owner band's WCS into the user band's
    frame (same SKY position, different pixel grids).  An offset-tie
    (``Tied(..., offset=prior)``) composes the tie with this
    component's own offset slots:
    ``('theta_affine_offset', (base_offset, size, A, b, own_offset))``
    renders ``A @ theta[base] + b + theta[own]``.
    """
    tied_off = component.__dict__.get("_tied_offsets", {}).get(attr)
    if tied_off is None:
        return _resolve_tie(component, attr, None, slot_map, wcs_map)

    # offset-tie: this component's slots hold the OFFSET; the base
    # position resolves through the tie chain like a pure tie would
    own = slot_map[(id(component), attr)]
    kind, payload = _resolve_tie(
        component, attr, tied_off, slot_map, wcs_map
    )
    if kind == "theta":
        boff, size = payload
        return ("theta_affine_offset",
                (boff, size, np.eye(own.size), np.zeros(own.size),
                 own.offset))
    if kind == "theta_affine":
        boff, size, a, b = payload
        return ("theta_affine_offset", (boff, size, a, b, own.offset))
    # constant base -> const + theta[own]: exactly the existing
    # theta_affine kind with an identity map of the offset slots
    return (
        "theta_affine",
        (
            own.offset,
            own.size,
            np.eye(own.size),
            np.asarray(payload, float).reshape(own.size),
        ),
    )


def _resolve_tie(user_component, user_attr, first_tie, slot_map, wcs_map):
    """Resolve a (possibly tied) attribute to its render-rule payload.

    ``first_tie`` short-circuits the first hop (used by offset-ties,
    whose tie object lives in ``_tied_offsets``, not ``_constants``).
    """
    from .components import Tied

    user = component = user_component
    attr = user_attr
    sky = False
    # the component whose band's WCS interprets the terminal slot as
    # pixels for the USER's sky position.  A sky hop user->X means
    # "user shares X's SKY position", and X's sky position is
    # WCS(X's band) applied to whatever theta X renders — so each SKY
    # hop moves the frame to its target, while pixel hops only change
    # which slot the raw value comes from (they share numbers, not sky
    # positions).
    frame_comp = component
    seen = set()
    if first_tie is not None:
        seen.add((id(component), attr))
        if first_tie.frame == "sky":
            sky = True
            frame_comp = first_tie.component
        component, attr = first_tie.component, first_tie.attr
    while True:
        key = (id(component), attr)
        if key in slot_map:
            if component is user and first_tie is not None:
                # an offset-tie chain that loops back to the user's own
                # (offset) slot has no base position at all
                raise ValueError(
                    f"Tied cycle through "
                    f"{type(component).__name__}.{attr}"
                )
            if (
                component.__dict__.get("_tied_offsets", {}).get(attr)
                is not None
                and component is not user
            ):
                raise ValueError(
                    "tying onto an offset-tied attribute is not "
                    "supported (chain the tie to its base instead)"
                )
            slot = slot_map[key]
            if not sky:
                return ("theta", (slot.offset, slot.size))
            if slot.size != 2:
                raise ValueError("frame='sky' ties need a 2-vector xy")
            if wcs_map is None:
                raise ValueError(
                    "frame='sky' tie in a context without WCS frames"
                )
            f_owner = wcs_map.get(id(frame_comp))
            f_user = wcs_map.get(id(user))
            if f_owner is None or f_user is None:
                raise ValueError(
                    "frame='sky' tie requires WCS headers (CRVAL + "
                    "CD/CDELT/PC) on every involved band's observation"
                )
            if isinstance(f_owner, str) or isinstance(f_user, str):
                raise ValueError(
                    "frame='sky' tie involves a component shared "
                    "between bands with different WCS — its frame is "
                    "ambiguous; give each band its own component"
                )
            a, b = _pixel_affine(f_owner, f_user)
            return ("theta_affine", (slot.offset, slot.size, a, b))
        if key in seen:
            raise ValueError(
                f"Tied cycle through {type(component).__name__}.{attr}"
            )
        seen.add(key)
        try:
            val = component._constants[attr]
        except KeyError:
            raise ValueError(
                f"Tied target {type(component).__name__}.{attr} has no "
                "value — is the referenced component part of the model?"
            ) from None
        if isinstance(val, Tied):
            if val.frame == "sky":
                sky = True
                frame_comp = val.component
            component, attr = val.component, val.attr
            continue
        if sky:
            raise ValueError(
                "frame='sky' tie resolves to a constant — give the "
                "owner component a stochastic xy or tie in pixel frame"
            )
        return ("const", val)


def config_wcs_frame(config):
    """(MiniWCS, ref_xy) for a Configuration with real WCS, else None.

    Used by frame='sky' ties; requires CRVAL + a CD/CDELT/PC scale in
    the observation header (defaults would silently produce garbage
    affines)."""
    hdr = getattr(config, "obs_header", None)
    if hdr is None:
        return None
    try:
        keys = set(hdr.keys())
    except Exception:
        return None
    if "CRVAL1" not in keys or not ({"CD1_1", "CDELT1", "PC1_1"} & keys):
        return None
    from ..io.wcs import MiniWCS

    h, w = config.obs_data.shape
    return (MiniWCS(hdr), (w / 2.0, h / 2.0))


def _add_shape_rules(comp, params, slot_map, wcs_map):
    """Optional isophote-shape rules (c0, Fourier + bending modes).

    Included only when the component has them (elliptical specs stay
    byte-identical); an amplitude with no declared phase gets a
    constant-zero phase rule.
    """
    if "c0" in comp._priors or "c0" in comp._constants:
        params["c0"] = _resolve(comp, "c0", slot_map, wcs_map)
    for m in comp._fourier_modes:
        amp = f"f{m}"
        if amp in comp._priors or amp in comp._constants:
            params[amp] = _resolve(comp, amp, slot_map, wcs_map)
            phi = f"{amp}_phi"
            if phi in comp._priors or phi in comp._constants:
                params[phi] = _resolve(comp, phi, slot_map, wcs_map)
            else:
                params[phi] = ("const", 0.0)
    for m in (1, 2, 3):
        b = f"b{m}"
        if b in comp._priors or b in comp._constants:
            params[b] = _resolve(comp, b, slot_map, wcs_map)
    for t in ("rtrunc", "rsoft", "rtrunc_in", "rsoft_in",
              "rot_ang", "rot_out", "rot_in", "rot_pow"):
        if t in comp._priors or t in comp._constants:
            params[t] = _resolve(comp, t, slot_map, wcs_map)


def comp_spec_for(comp, slot_map, wcs_map=None) -> CompSpec:
    """Static render rule for one component against a slot map."""
    if isinstance(comp, Sky):
        params = {"adu": _resolve(comp, "adu", slot_map, wcs_map)}
        # gradient attrs are optional; include a rule only when the
        # component actually has one (flat-sky specs stay byte-identical)
        for g in ("dx", "dy"):
            if g in comp._priors or g in comp._constants:
                params[g] = _resolve(comp, g, slot_map, wcs_map)
        return CompSpec("sky", params)
    if isinstance(comp, PointSource):
        return CompSpec(
            "pointsource",
            {
                "xy": _resolve(comp, "xy", slot_map, wcs_map),
                "mag": _resolve(comp, "mag", slot_map, wcs_map),
            },
            static={"shift_method": comp.shift_method},
        )
    if isinstance(comp, Sersic):
        params = {
            attr: _resolve(comp, attr, slot_map, wcs_map)
            for attr in (
                "xy", "mag", "reff", "reff_b", "index", "angle",
            )
        }
        _add_shape_rules(comp, params, slot_map, wcs_map)
        return CompSpec(
            "sersic",
            params,
            static={"angle_degrees": comp.angle_degrees},
        )
    if isinstance(comp, Moffat):
        params = {
            attr: _resolve(comp, attr, slot_map, wcs_map)
            for attr in (
                "xy", "mag", "fwhm", "fwhm_b", "index", "angle",
            )
        }
        _add_shape_rules(comp, params, slot_map, wcs_map)
        return CompSpec(
            "moffat",
            params,
            static={"angle_degrees": comp.angle_degrees},
        )
    if isinstance(comp, King):
        params = {
            attr: _resolve(comp, attr, slot_map, wcs_map)
            for attr in (
                "xy", "mag", "rc", "rc_b", "rt", "alpha", "angle",
            )
        }
        _add_shape_rules(comp, params, slot_map, wcs_map)
        return CompSpec(
            "king",
            params,
            static={"angle_degrees": comp.angle_degrees},
        )
    if isinstance(comp, Ferrer):
        params = {
            attr: _resolve(comp, attr, slot_map, wcs_map)
            for attr in (
                "xy", "mag", "rout", "rout_b", "alpha", "beta",
                "angle",
            )
        }
        _add_shape_rules(comp, params, slot_map, wcs_map)
        return CompSpec(
            "ferrer",
            params,
            static={"angle_degrees": comp.angle_degrees},
        )
    if isinstance(comp, Nuker):
        params = {
            attr: _resolve(comp, attr, slot_map, wcs_map)
            for attr in (
                "xy", "mag", "rb", "rb_b", "alpha", "beta", "gamma",
                "angle",
            )
        }
        _add_shape_rules(comp, params, slot_map, wcs_map)
        return CompSpec(
            "nuker",
            params,
            static={"angle_degrees": comp.angle_degrees},
        )
    if isinstance(comp, EdgeDisk):
        params = {
            attr: _resolve(comp, attr, slot_map, wcs_map)
            for attr in ("xy", "mag", "rs", "hs", "angle")
        }
        return CompSpec(
            "edgedisk",
            params,
            static={"angle_degrees": comp.angle_degrees},
        )
    if isinstance(comp, NoiseScale):
        return CompSpec(
            "noisescale",
            {"scale": _resolve(comp, "scale", slot_map, wcs_map)},
        )
    if isinstance(comp, PSFSelector):
        return CompSpec(
            "psfselector",
            {"psf_index": _resolve(comp, "psf_index", slot_map, wcs_map)},
        )
    raise TypeError(f"Unknown component type: {type(comp).__name__}")


def build_param_slots(components) -> tuple:
    """Global flat layout over a component list -> (slots, slot_map, dim).

    File order, alphabetical within component; a component instance
    appearing more than once contributes slots ONCE (shared between its
    occurrences).
    """
    slots: List[ParamSlot] = []
    slot_map = {}
    offset = 0
    seen = set()
    for ci, comp in enumerate(components):
        if id(comp) in seen:
            continue
        seen.add(id(comp))
        for attr, prior in comp.sorted_prior_items():
            size = int(np.asarray(prior.value).size)
            slot = ParamSlot(
                comp_index=ci,
                attr=attr,
                offset=offset,
                size=size,
                name=prior.name,
                fitsname=prior.fitsname,
                dist=prior,
                is_discrete=getattr(prior, "is_discrete", False),
            )
            slots.append(slot)
            slot_map[(id(comp), attr)] = slot
            offset += size
    return slots, slot_map, offset


def psf_spectra_for(config):
    """(f_psf_stack, f_var_stack) for a Configuration.

    The single place that honors ``conv_pad``: with padding, the PSF +
    variance kernels are re-padded and FFT'd at the render-grid size
    (obs + 2*pad per side).  Shared by :func:`build_model_spec` and the
    joint multi-band spec builder — a consumer stacking
    ``psf_selector.psf_list`` directly would silently ignore padding.
    """
    return psf_spectra_for_selector(
        config.psf_selector,
        config.obs_data.shape,
        int(getattr(config, "conv_pad", 0)),
    )


def psf_spectra_for_selector(sel, obs_shape, conv_pad=0):
    """(f_psf_stack, f_var_stack) for a PSFSelector at an obs shape.

    The selector-level twin of :func:`psf_spectra_for` — the per-target
    PSF path (:func:`psfmc_tpu.batchfit.prepare_psf_stack`) builds a
    throwaway selector per target and FFTs it HERE so survey-mode PSFs
    go through exactly the preprocessing the baked template PSF does
    (normalization, variance propagation, oversample binning, padding).
    For the no-pad branch the selector must have been constructed with
    ``data_shape == obs_shape`` (its lazy FFT stacks are sized to it).
    """
    conv_pad = int(conv_pad)
    if conv_pad > 0:
        from ..ops.fourier import pad_and_rfft_image

        padded = tuple(int(n) + 2 * conv_pad for n in obs_shape)
        return (
            np.stack([pad_and_rfft_image(p, padded) for p in sel.spatial_psfs]),
            np.stack([pad_and_rfft_image(v, padded) for v in sel.spatial_vars]),
        )
    return np.stack(sel.psf_list), np.stack(sel.var_list)


def _check_poisson_inputs(config, comp_specs):
    """Eager validation for ``likelihood='poisson'`` models.

    Counts cannot be negative: background-subtracted imaging (good
    pixels below zero) has no Poisson density — the continuous
    extension would silently evaluate nonsense, so reject it at model
    build.  A sampled :class:`~psfmc_tpu.models.components.NoiseScale`
    is rejected too: the Poisson likelihood never reads the variance
    plane, so the scale would be an inert parameter the user believes
    is doing something.
    """
    good = ~np.asarray(config.bad_px, bool)
    obs = np.asarray(config.obs_data, np.float64)
    if np.any(obs[good] < 0):
        raise ValueError(
            "likelihood='poisson' needs non-negative data at every "
            f"good pixel (found min {obs[good].min():.4g}): Poisson "
            "counts cannot be background-subtracted below zero — mask "
            "the offending pixels or use the gaussian/student "
            "likelihood"
        )
    if any(cs.kind == "noisescale" for cs in comp_specs):
        raise ValueError(
            "NoiseScale cannot be combined with likelihood='poisson': "
            "the Poisson likelihood has no variance plane to scale "
            "(the parameter would be sampled but inert)"
        )


def build_model_spec(
    components: List[ComponentBase],
    config: Optional[Configuration] = None,
) -> ModelSpec:
    """Compile a component list (+Configuration) into a static ModelSpec.

    ``components`` may include the Configuration (it is extracted, like
    reference models.py:29-38) or it can be passed separately.
    """
    components = list(components)
    if config is None:
        configs = [c for c in components if isinstance(c, Configuration)]
        if not configs:
            raise ValueError(
                "Unable to find the Configuration component, required "
                "for setting up input images."
            )
        config = configs[0]
    components = [c for c in components if not isinstance(c, Configuration)]
    components.append(config.psf_selector)

    # Assign canonical trace names (reference models.py:41-42)
    for count, component in enumerate(components):
        component.update_stochastic_names(count=count)

    # Build the flat layout: file order, alphabetical within component.
    slots, slot_map, offset = build_param_slots(components)

    frame = config_wcs_frame(config)
    wcs_map = {id(c): frame for c in components} if frame else {}
    comp_specs = [
        comp_spec_for(comp, slot_map, wcs_map) for comp in components
    ]

    conv_pad = int(getattr(config, "conv_pad", 0))
    f_psf_stack, f_var_stack = psf_spectra_for(config)

    likelihood = getattr(config, "likelihood", "gaussian")
    if likelihood == "poisson":
        _check_poisson_inputs(config, comp_specs)

    return ModelSpec(
        comp_specs=comp_specs,
        slots=slots,
        num_params=offset,
        shape=tuple(config.obs_data.shape),
        mag_zeropoint=float(config.mag_zeropoint),
        obs_data=np.asarray(config.obs_data, dtype=np.float64),
        obs_var=np.asarray(config.obs_var, dtype=np.float64),
        bad_px=np.asarray(config.bad_px, dtype=bool),
        f_psf_stack=f_psf_stack,
        f_var_stack=f_var_stack,
        num_psfs=len(config.psf_selector.spatial_psfs),
        likelihood=likelihood,
        likelihood_df=getattr(config, "likelihood_df", 4.0),
        likelihood_gain=float(getattr(config, "likelihood_gain", 1.0)),
        conv_pad=conv_pad,
        render_oversample=int(getattr(config, "render_oversample", 1)),
        oversample_window=int(getattr(config, "oversample_window", 16)),
    )
