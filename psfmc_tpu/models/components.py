"""Model components: declaration-time objects for the model-definition DSL.

API parity with the reference ``psfMC/ModelComponents`` package:

* attributes may be constants or prior :class:`Distribution` objects,
* canonical intra-component parameter order is **alphabetical** by
  attribute name (reference ComponentBase.py:57,88-97),
* trace names are ``{count}_{CompType}_{attr}`` with FITS-header
  abbreviations (reference ComponentBase.py:99-119),
* ``xy`` stochastics occupy two slots in the parameter vector.

TPU-first redesign: these objects exist only at model-build time.  They
are *compiled* by :mod:`psfmc_tpu.models.spec` into a static
:class:`ModelSpec` — offsets into a flat parameter vector plus pure
render rules — so the sampling hot path never touches Python attribute
plumbing (the reference's ``StochasticProperty``/``add_to_array`` mutable
dispatch, ComponentBase.py:132-153, has no place under ``jit``).
The mutable ``.value`` semantics are still honored host-side for
API-compatible analysis/replay flows.
"""
from __future__ import annotations

import numpy as np

from ..distributions import DiscreteUniform, Distribution
from ..io.preprocess import (
    calculate_psf_variability,
    pre_fft_psf,
    preprocess_obs,
    preprocess_psf,
)
from ..ops.coords import array_coords

__all__ = [
    "ComponentBase",
    "Sky",
    "PointSource",
    "Sersic",
    "ExpDisk",
    "DeVaucouleurs",
    "Gaussian",
    "Moffat",
    "EdgeDisk",
    "King",
    "Ferrer",
    "Nuker",
    "NoiseScale",
    "Configuration",
    "PSFSelector",
    "Tied",
]


def _is_stochastic(value):
    return isinstance(value, Distribution) or hasattr(value, "logp")


class Tied:
    """Share another component's stochastic attribute (beyond the
    reference: GALFIT-style parameter coupling psfMC lacks).

    ``PointSource(xy=Tied(host, 'xy'), mag=...)`` pins the quasar to
    its host's centroid: both components render from the SAME slot of
    the parameter vector, so the tie is exact by construction, costs
    zero extra parameters, and the tied attribute contributes no trace
    column (the shared slot keeps the *owner's* name).  If the
    referenced attribute is a constant, the tie resolves to that
    constant.  Chains (a tie to a tie) resolve transitively; cycles are
    rejected at spec build.

    Host-side attribute reads dereference the tie (``ps.xy`` returns
    the host's current xy) — EXCEPT offset-ties (``offset=`` given),
    where the attribute reads the OFFSET prior's value, matching its
    trace column, not a dereferenced absolute position.  Note: a
    cross-component joint constraint
    whose operand is tied (e.g. a Sersic whose ``reff`` is tied to
    another component) cannot be enforced during vectorized prior-draw
    init — it is skipped there and enforced exactly by the device-side
    log-prior during sampling.
    """

    def __init__(self, component, attr, frame="pixel", offset=None):
        if not isinstance(component, ComponentBase):
            raise TypeError(
                "Tied(component, attr): component must be a model "
                f"component, got {type(component).__name__}"
            )
        if not isinstance(attr, str):
            raise TypeError("Tied(component, attr): attr must be a string")
        if frame not in ("pixel", "sky"):
            raise ValueError(
                f"Tied frame {frame!r}: expected 'pixel' or 'sky'"
            )
        if frame == "sky" and attr != "xy":
            raise ValueError("frame='sky' ties apply only to 'xy'")
        if offset is not None and not _is_stochastic(offset):
            raise TypeError(
                "Tied offset= must be a prior distribution (e.g. "
                "Normal(loc=[0, 0], scale=0.1) for a sub-pixel "
                "registration uncertainty)"
            )
        if offset is not None and attr != "xy":
            raise ValueError("Tied offset= applies only to 'xy'")
        self.component = component
        self.attr = attr
        # 'pixel' (default): share the raw slot value.  'sky': the two
        # components mark the SAME SKY POSITION — in a joint multi-band
        # model whose bands have different WCS, the tied xy is mapped
        # through the owner band's WCS into the user band's pixel frame
        # (a local affine, exact to TAN curvature over the field).
        # Host-side attribute reads still return the owner's raw value.
        self.frame = frame
        # optional FREE registration offset: the user component renders
        # at tie(owner xy) + offset, where offset gets its own slots
        # under the user component's attr name (the trace column then
        # records the OFFSET, not the absolute position) — marginalizes
        # cross-band astrometric registration errors
        self.offset = offset


class ComponentBase:
    """Base component: tracks priors vs constants per attribute.

    Stochastic attributes are declared per-subclass in ``_stochastic_attrs``
    and routed through ``__getattr__``/``__setattr__`` — a prior
    distribution lands in ``_priors``, any other value in ``_constants``
    (reference ComponentBase.py:26-34).
    """

    _fits_abbrs = ()
    _stochastic_attrs = ()

    def __init__(self):
        object.__setattr__(self, "_priors", {})
        object.__setattr__(self, "_constants", {})
        object.__setattr__(self, "_tied_offsets", {})

    # -- attribute routing ----------------------------------------------
    def __setattr__(self, name, value):
        if name in type(self)._stochastic_attrs:
            self._tied_offsets.pop(name, None)
            if isinstance(value, Tied) and value.offset is not None:
                # offset-tie: the OFFSET prior owns this attr's slots
                # (and its trace column); the tie itself rides
                # _tied_offsets and is composed at spec build
                self._priors[name] = value.offset
                self._constants.pop(name, None)
                self._tied_offsets[name] = value
            elif _is_stochastic(value):
                self._priors[name] = value
                self._constants.pop(name, None)
            else:
                self._constants[name] = value
                self._priors.pop(name, None)
        else:
            object.__setattr__(self, name, value)

    def __getattr__(self, name):
        # Only called when normal lookup fails.
        if name.startswith("_"):
            raise AttributeError(name)
        priors = self.__dict__.get("_priors", {})
        constants = self.__dict__.get("_constants", {})
        if name in priors:
            return priors[name].value
        if name in constants:
            val = constants[name]
            if isinstance(val, Tied):
                # dereference: read the referenced component's current
                # value (host-side convenience; the device posterior
                # resolves ties to shared slots at spec build).
                # Iterative with a cycle guard — a recursive getattr
                # would hit RecursionError on a tie cycle instead of a
                # clean error
                seen = {(id(self), name)}
                comp, attr = val.component, val.attr
                while True:
                    key = (id(comp), attr)
                    if key in seen:
                        raise ValueError(
                            f"Tied cycle through "
                            f"{type(comp).__name__}.{attr}"
                        )
                    seen.add(key)
                    nxt = comp.__dict__.get("_constants", {}).get(attr)
                    if isinstance(nxt, Tied):
                        comp, attr = nxt.component, nxt.attr
                        continue
                    return getattr(comp, attr)
            return val
        raise AttributeError(name)

    def _has(self, attr):
        return attr in self._priors or attr in self._constants

    def _shape_value(self, attr):
        """Current value of an optional attribute, or None if absent."""
        try:
            return getattr(self, attr)
        except AttributeError:
            return None

    # -- introspection (canonical alphabetical order) ---------------------
    def sorted_prior_items(self):
        return sorted(self._priors.items())

    def get_distribution(self, stoch_name):
        matching = [d for d in self._priors.values() if d.name == stoch_name]
        if len(matching) != 1:
            raise KeyError(f"Could not find unique prior with name: {stoch_name}")
        return matching[0]

    def stochastic_lens(self):
        return [np.asarray(prior.value).size for _k, prior in self.sorted_prior_items()]

    def num_stochastics(self):
        return int(np.sum(self.stochastic_lens(), dtype=int)) if self._priors else 0

    def stochastic_names(self, name_attr="name"):
        return [getattr(prior, name_attr) for _k, prior in self.sorted_prior_items()]

    def update_stochastic_names(self, count=None):
        comptype = type(self).__name__
        for attr, prior in self._priors.items():
            newname = f"{comptype}_{attr}"
            fitsname = newname
            for longname, abbr in type(self)._fits_abbrs:
                fitsname = fitsname.replace(longname, abbr)
            if count is not None:
                newname = f"{count:d}_{newname}"
                fitsname = f"{count:d}{fitsname}"
            prior.name = newname
            prior.fitsname = fitsname

    # -- value plumbing (host-side) ---------------------------------------
    def set_stochastic_values(self, param_values="random", random_state=None):
        """Set stochastic values from a vector, or draw 'random'/'median'.

        Returns the vector of values set (reference ComponentBase.py:45-74).
        """
        items = self.sorted_prior_items()
        if isinstance(param_values, str):
            vals = []
            for _name, prior in items:
                if param_values == "random":
                    drawn = prior.random(random_state=random_state)
                elif param_values == "median":
                    drawn = prior.median()
                else:
                    raise ValueError(f"Unknown draw mode: {param_values}")
                vals.append(np.ravel(drawn))
            param_values = (
                np.concatenate(vals) if vals else np.array([], dtype=float)
            )

        start = 0
        for (_name, prior), size in zip(items, self.stochastic_lens()):
            prior.value = np.array(param_values[start : start + size])
            start += size
        return param_values

    def log_priors(self):
        """Joint host-side log-prior at current values (scipy path)."""
        logp = 0.0
        for prior in self._priors.values():
            logp += float(np.sum(prior.logp(prior.value)))
        return logp

    # -- vectorized prior draws (init path) --------------------------------
    def _batch_constraints(self, vals):
        """Vectorized joint-constraint check over candidate draws.

        ``vals`` maps attr name -> (m, size) candidate arrays (only the
        stochastic attrs).  Returns an (m,) bool validity mask.
        Subclasses with cross-attribute constraints (the ``-inf`` terms
        in their ``log_priors``) must override to match.
        """
        m = len(next(iter(vals.values()))) if vals else 0
        return np.ones(m, dtype=bool)

    def draw_batch(self, n, random_state=None, max_tries=1000):
        """(n, num_stochastics) prior draws, joint constraint enforced.

        Vectorized rejection: all still-invalid rows are redrawn
        together, so the cost is O(retry rounds) scipy calls instead of
        O(walkers x tries) — the per-walker Python loop made
        ``init_params_from_priors(608)`` cost 7 s of host time, longer
        than the entire 16-target batched TPU fit it was seeding.
        Draw distribution is identical to the scalar path: independent
        prior draws conditioned on a finite joint component prior.
        Does not mutate the priors' current values.
        """
        items = self.sorted_prior_items()
        if not items:
            return np.zeros((n, 0))
        sizes = self.stochastic_lens()
        out = np.empty((n, int(np.sum(sizes))))
        need = np.arange(n)
        for _try in range(max_tries):
            m = len(need)
            vals = {}
            cols = []
            valid = np.ones(m, dtype=bool)
            for (name, prior), size in zip(items, sizes):
                ev = np.shape(np.asarray(prior.value))
                try:
                    d = np.asarray(
                        prior.random(
                            random_state=random_state, size=(m,) + ev
                        ),
                        dtype=float,
                    ).reshape(m, size)
                except TypeError:
                    # duck-typed prior without a size= kwarg (anything
                    # _is_stochastic accepts): per-row scalar draws
                    d = np.stack(
                        [
                            np.ravel(
                                np.asarray(
                                    prior.random(
                                        random_state=random_state
                                    ),
                                    dtype=float,
                                )
                            )
                            for _ in range(m)
                        ]
                    )
                if getattr(prior, "is_discrete", False):
                    d = np.rint(d)
                vals[name] = d
                cols.append(d)
                # per-attr density can still be -inf at extreme draws
                # (tabulated heavy tails underflow to the logpdf floor)
                with np.errstate(all="ignore"):
                    lp = np.asarray(prior.logp(d.reshape((m,) + ev)))
                valid &= np.isfinite(lp.reshape(m, -1)).all(axis=1)
            valid &= self._batch_constraints(vals)
            out[need] = np.concatenate(cols, axis=1)
            need = need[~valid]
            if need.size == 0:
                return out
        raise RuntimeError(
            f"Could not draw valid prior sample for "
            f"{type(self).__name__} after {max_tries} tries"
        )


class Sky(ComponentBase):
    """Sky background component (reference Sky.py).

    Beyond the reference's flat offset (Sky.py:14-16), the optional
    ``dx``/``dy`` attributes add a GALFIT-style tilted-plane gradient
    (ADU per pixel along the x/y axes, zero at the image center):

    ``sky(x, y) = adu + dx*(x - (W-1)/2) + dy*(y - (H-1)/2)``

    Real mosaicked/drizzled cutouts often carry residual background
    slopes that a flat sky absorbs into the faint-galaxy wings; a free
    gradient marginalizes them instead.  When ``dx``/``dy`` are omitted
    the component is the reference's flat sky with an identical
    parameter-vector layout (they contribute no slots at all).

    Semantics: the gradient plane is a BACKGROUND — it is added after
    the PSF convolution (a background never rode the optics; folding a
    non-periodic ramp into the circular convolution would wrap it at
    the frame edges) and contributes no PSF-mismatch model variance.
    The flat ``adu`` stays inside the convolution for reference parity
    (a constant is convolution-invariant, so the two choices agree
    exactly there).
    """

    _stochastic_attrs = ("adu", "dx", "dy")

    def __init__(self, adu=None, dx=None, dy=None):
        super().__init__()
        self.adu = adu
        # only register when given: absent gradients must not disturb
        # the canonical slot layout of existing flat-sky models
        if dx is not None:
            self.dx = dx
        if dy is not None:
            self.dy = dy


class NoiseScale(ComponentBase):
    """Sampled multiplicative variance-inflation factor (beyond the
    reference and GALFIT).

    Scales the ENTIRE per-pixel variance budget (observation variance +
    PSF-mismatch model variance) by a free factor ``scale`` inside the
    likelihood: ``var_eff = scale * var``.  The standard remedy for
    drizzle-correlated or mis-estimated inverse-variance maps — instead
    of hand-inflating the IVM, sample the inflation and marginalize
    over it.  ``analysis.loo_pit`` detects the need (PIT mass piling in
    the tails = claimed noise too small; mid-heavy = too large);
    ``NoiseScale`` is the fix.  ``scale = 1`` is exact reference
    behavior, and a model without the component has a byte-identical
    parameter layout.

    Works with both the Gaussian and Student-t pixel likelihoods, all
    samplers (the Pallas fused-likelihood kernels gate off), evidence,
    MAP, and the criticism layer (the composite IVM products and PPC
    noise budget see the scaled variance automatically).
    """

    _fits_abbrs = (("NoiseScale", "NSC"), ("scale", "SCL"))
    _stochastic_attrs = ("scale",)

    def __init__(self, scale=None):
        super().__init__()
        self.scale = scale

    def log_priors(self):
        logp = super().log_priors()
        # variance factor must stay positive (kept in sync with the
        # device prior branch in posterior.make_log_prior and the
        # batch-draw constraint below)
        logp += -np.inf if np.any(np.asarray(self.scale) <= 0) else 0.0
        return logp

    def _batch_constraints(self, vals):
        ok = super()._batch_constraints(vals)
        scale = vals.get("scale", self._constants.get("scale"))
        return ok & (np.ravel(np.asarray(scale)) > 0)


class PointSource(ComponentBase):
    """Point source with sub-pixel shift kernel (reference PointSource.py).

    ``xy`` is 0-based (numpy-style) pixel position.
    ``shift_method`` is ``lanczos3`` (default) or ``bilinear``.
    """

    _fits_abbrs = (("PointSource", "PS"),)
    _stochastic_attrs = ("xy", "mag")

    def __init__(self, xy=None, mag=None, shift_method="lanczos3"):
        super().__init__()
        self.xy = xy
        self.mag = mag
        self.shift_method = shift_method


_FOURIER_MODES = (1, 2, 3, 4)
_BENDING_MODES = (1, 2, 3)
_ROT_ATTRS = ("rot_ang", "rot_in", "rot_out", "rot_pow")
_SHAPE_ATTRS = ("c0",) + tuple(
    n for m in _FOURIER_MODES for n in (f"f{m}", f"f{m}_phi")
) + tuple(f"b{m}" for m in _BENDING_MODES) + _ROT_ATTRS


_TRUNC_ATTRS = ("rsoft", "rsoft_in", "rtrunc", "rtrunc_in")


def _register_shape_attrs(comp, c0, shape_kw, allow_trunc=False):
    """Register the optional isophote-shape attrs (c0, f1..f4, phases,
    b1..b3 bending modes; plus rtrunc/rsoft/rtrunc_in/rsoft_in radial
    truncation for the families whose renderers support it).

    Only attrs actually given land in the component (absent shape
    params must not disturb the canonical slot layout of existing
    models); a phase without its amplitude, or a truncation radius
    without its softening length (and vice versa), is rejected.
    """
    if c0 is not None:
        comp.c0 = c0
        # Extreme-disky honesty warning: for c = c0 + 2 -> 0 the light
        # concentrates into axis ridges of width ~(2^c - 1)^(1/c) px
        # (1e-4 px by c0=-1.8) that NO point sampling or local
        # correction integrates — measured total-flux errors reach
        # ~4x at c0=-1.8 and the render collapses to ~zero flux by
        # c0=-1.9 (see test_properties calibration sweep, 2026-08-21).
        # Warn at model build, where the user can still bound the prior.
        low = None
        if hasattr(c0, "interval"):
            try:
                # MASS-based bound, not the hard support: a Normal c0
                # prior has support (-inf, inf) but essentially zero
                # probability below -1.5 — interval(0.998) (0.1% tail)
                # only warns when the fit can actually visit the
                # unreliable regime
                low = float(np.ravel(np.asarray(c0.interval(0.998)))[0])
            except Exception:
                low = None
        elif isinstance(c0, (int, float, np.floating)):
            low = float(c0)
        if low is not None and low < -1.5:
            import warnings

            warnings.warn(
                f"c0 support reaches {low:.3g} < -1.5: extreme-disky "
                "isophotes concentrate flux into axis ridges that "
                "point sampling cannot integrate; total-flux "
                "normalization errors grow to ~4x by c0=-1.8. Bound "
                "the c0 prior at >= -1.2 for quantitative photometry."
            )
    fnames = {
        n for m in _FOURIER_MODES for n in (f"f{m}", f"f{m}_phi")
    } | {f"b{m}" for m in _BENDING_MODES} | set(_ROT_ATTRS)
    if allow_trunc:
        fnames |= set(_TRUNC_ATTRS)
    for name, val in shape_kw.items():
        if name not in fnames:
            raise TypeError(
                f"{type(comp).__name__}() got an unexpected keyword "
                f"argument {name!r}"
            )
        if val is not None:
            setattr(comp, name, val)
    for m in _FOURIER_MODES:
        if comp._has(f"f{m}_phi") and not comp._has(f"f{m}"):
            raise ValueError(
                f"f{m}_phi given without its amplitude f{m}"
            )
    for r, s in (("rtrunc", "rsoft"), ("rtrunc_in", "rsoft_in")):
        if comp._has(r) != comp._has(s):
            raise ValueError(
                f"truncation needs BOTH {r} (break radius, px) and "
                f"{s} (softening length, px)"
            )
    if comp._has("rot_ang") != comp._has("rot_out"):
        raise ValueError(
            "spiral rotation needs BOTH rot_ang (winding angle) and "
            "rot_out (radius where it is reached, px)"
        )
    for opt in ("rot_in", "rot_pow"):
        if comp._has(opt) and not comp._has("rot_ang"):
            raise ValueError(f"{opt} given without rot_ang/rot_out")


def _shape_log_prior_terms(comp):
    """-inf contribution of the isophote-shape support, else 0.

    Support: ``c0 > -1.95`` (the render exponents are 2/(c0+2)) and
    ``sum_m |f_m| <= 0.9`` (the perturbation factor 1 + f must stay
    positive everywhere).
    """
    c0 = comp._shape_value("c0")
    if c0 is not None and np.any(np.asarray(c0) <= -1.95):
        return -np.inf
    amp_sum = 0.0
    for m in _FOURIER_MODES:
        a = comp._shape_value(f"f{m}")
        if a is not None:
            amp_sum = amp_sum + np.abs(np.asarray(a, float))
    if np.any(np.asarray(amp_sum) > 0.9):
        return -np.inf
    for name in _TRUNC_ATTRS:
        v = comp._shape_value(name)
        if v is not None and np.any(np.asarray(v, float) <= 0.0):
            return -np.inf
    if comp._has("rot_ang"):
        rot_out = np.asarray(comp._shape_value("rot_out"), float)
        rot_in = comp._shape_value("rot_in")
        rot_in = 0.0 if rot_in is None else np.asarray(rot_in, float)
        rot_pow = comp._shape_value("rot_pow")
        if np.any(rot_out <= rot_in) or np.any(np.asarray(rot_in) < 0.0):
            return -np.inf
        if rot_pow is not None and np.any(
            np.asarray(rot_pow, float) <= 0.0
        ):
            return -np.inf
    return 0.0


def _shape_batch_ok(comp, vals, ok):
    """Vectorized isophote-shape constraints for prior-draw batches."""
    c0 = vals.get("c0", comp._constants.get("c0"))
    if c0 is not None and not isinstance(c0, Tied):
        ok = ok & np.ravel(np.asarray(c0) > -1.95)
    amp_sum = None
    for m in _FOURIER_MODES:
        a = vals.get(f"f{m}", comp._constants.get(f"f{m}"))
        if a is None or isinstance(a, Tied):
            continue
        a = np.abs(np.ravel(np.asarray(a, float)))
        amp_sum = a if amp_sum is None else amp_sum + a
    if amp_sum is not None:
        ok = ok & (amp_sum <= 0.9)
    for name in _TRUNC_ATTRS:
        v = vals.get(name, comp._constants.get(name))
        if v is not None and not isinstance(v, Tied):
            ok = ok & np.ravel(np.asarray(v, float) > 0.0)
    rot_out = vals.get("rot_out", comp._constants.get("rot_out"))
    if rot_out is not None and not isinstance(rot_out, Tied):
        rot_out = np.ravel(np.asarray(rot_out, float))
        rot_in = vals.get("rot_in", comp._constants.get("rot_in"))
        if rot_in is None:
            rot_in = 0.0
        if not isinstance(rot_in, Tied):
            rot_in = np.ravel(np.asarray(rot_in, float))
            ok = ok & (rot_out > rot_in) & (rot_in >= 0.0)
        rot_pow = vals.get("rot_pow", comp._constants.get("rot_pow"))
        if rot_pow is not None and not isinstance(rot_pow, Tied):
            ok = ok & np.ravel(np.asarray(rot_pow, float) > 0.0)
    return ok


class Sersic(ComponentBase):
    """Sersic profile component (reference Sersic.py).

    Beyond the reference, three optional GALFIT-style shape freedoms
    (each contributes no slot when omitted — elliptical models keep an
    identical parameter layout):

    * ``c0`` — boxiness: the generalized radius is
      ``r^c = |u|^c + |v|^c`` with ``c = c0 + 2`` (``c0 > 0`` boxy,
      ``c0 < 0`` disky).  Support: ``c0 > -1.95``.
    * ``f1..f4`` (+ ``f1_phi..f4_phi``) — azimuthal Fourier modes: the
      isophote is bent by ``1 + sum_m f_m cos(m*theta - f_m_phi)``
      with ``theta`` measured from the major axis in the scaled frame
      (``m=1`` lopsidedness, ``m=3`` asymmetry, ``m=4`` extra
      boxiness/diskiness; phases in the same units as ``angle``).
      Support: ``sum |f_m| <= 0.9``.  An omitted phase is constant 0.
    * ``b1..b3`` — bending modes (GALFIT's B1/B2/B3): the scaled
      minor-axis coordinate is sheared by ``v -> v + sum_m b_m u^m``
      (``m=1`` pure shear — partially degenerate with ``angle``;
      ``m=2`` banana/arc; ``m=3`` S-shape).  ``u``/``v`` are in
      semi-major/semi-minor units, so ``b_m`` is dimensionless: one
      semi-major radius out along the major axis the isophote deflects
      by ``b_m`` semi-minor radii.  No support constraint — the shear
      is area-preserving, so flux stays exact for ANY amplitudes.
    * ``rot_ang``/``rot_out`` (+ optional ``rot_in``, ``rot_pow``) —
      spiral/swirl coordinate rotation (GALFIT's power rotation,
      simplified to the scaled frame): isophotes wind by
      ``rot_ang * clip((r - rot_in)/(rot_out - rot_in), 0)^rot_pow``
      (``rot_ang`` in ``angle`` units; radii in semi-major pixels;
      defaults ``rot_in = 0``, ``rot_pow = 1``).  Straight inside
      ``rot_in`` (bar), ``rot_ang`` of winding at ``rot_out``.  Unit
      polar Jacobian — flux exact for any winding.  Support:
      ``rot_out > rot_in >= 0``, ``rot_pow > 0``.
    * ``rtrunc``/``rsoft`` (+ ``rtrunc_in``/``rsoft_in``) — GALFIT-style
      radial truncation: the profile is multiplied by the logistic
      envelope ``sigmoid((rtrunc - r)/rsoft)`` over the generalized
      radius in semi-major PIXELS (50% of the untruncated brightness
      at the break, ~1% at ``rtrunc + 4.6 rsoft``); the ``_in`` pair
      carves out the center instead (rings).  ``sbeff`` is rescaled by
      an on-device tanh-sinh flux ratio so ``mag`` stays the exact
      total flux.  Support: all four > 0; a radius requires its
      softening length and vice versa.

    Total flux stays exactly ``mag`` for any shape (isophote-area
    renormalization + unit-Jacobian bending, see
    :func:`psfmc_tpu.ops.sersic.render_sersic_gen` and
    :mod:`psfmc_tpu.ops.isophote`).
    """

    _fits_abbrs = (
        ("Sersic", "SER"),
        ("reff_b", "REB"),
        ("reff", "RE"),
        ("index", "N"),
        ("angle", "ANG"),
    )
    _fourier_modes = _FOURIER_MODES
    _stochastic_attrs = (
        "xy", "mag", "reff", "reff_b", "index", "angle",
    ) + _SHAPE_ATTRS + _TRUNC_ATTRS

    def __init__(
        self,
        xy=None,
        mag=None,
        reff=None,
        reff_b=None,
        index=None,
        angle=None,
        angle_degrees=False,
        c0=None,
        **shape_kw,
    ):
        super().__init__()
        self.xy = xy
        self.mag = mag
        self.reff = reff
        self.reff_b = reff_b
        self.index = index
        self.angle = angle
        self.angle_degrees = angle_degrees
        _register_shape_attrs(self, c0, shape_kw, allow_trunc=True)

    def log_priors(self):
        logp = super().log_priors()
        # Semi-major axis must exceed semi-minor (reference Sersic.py:41-45)
        logp += -np.inf if self.reff_b > self.reff else 0.0
        logp += _shape_log_prior_terms(self)
        return logp

    def _batch_constraints(self, vals):
        ok = super()._batch_constraints(vals)
        reff = vals.get("reff", self._constants.get("reff"))
        reff_b = vals.get("reff_b", self._constants.get("reff_b"))
        if not (isinstance(reff, Tied) or isinstance(reff_b, Tied)):
            # tied operand is drawn by ANOTHER component's batch; the
            # device log-prior enforces the constraint during sampling
            ok = ok & np.ravel(np.asarray(reff_b) <= np.asarray(reff))
        return _shape_batch_ok(self, vals, ok)


class ExpDisk(Sersic):
    """Exponential disk — a Sersic profile with ``index`` fixed at 1
    (GALFIT's ``expdisk`` by its familiar name).  Takes every Sersic
    parameter except ``index``; shape freedoms (``c0``, Fourier modes)
    included."""

    _fits_abbrs = (
        ("ExpDisk", "EXP"),
        ("reff_b", "REB"),
        ("reff", "RE"),
        ("angle", "ANG"),
    )

    def __init__(self, **kw):
        if "index" in kw:
            raise TypeError(
                "ExpDisk fixes index=1; use Sersic for a free index"
            )
        super().__init__(index=1.0, **kw)


class DeVaucouleurs(Sersic):
    """de Vaucouleurs r^(1/4) spheroid — a Sersic profile with
    ``index`` fixed at 4 (GALFIT's ``devauc`` by its familiar name)."""

    _fits_abbrs = (
        ("DeVaucouleurs", "DEV"),
        ("reff_b", "REB"),
        ("reff", "RE"),
        ("angle", "ANG"),
    )

    def __init__(self, **kw):
        if "index" in kw:
            raise TypeError(
                "DeVaucouleurs fixes index=4; use Sersic for a free "
                "index"
            )
        super().__init__(index=4.0, **kw)


class Gaussian(Sersic):
    """Elliptical Gaussian — a Sersic profile with ``index`` fixed at
    0.5 (GALFIT's ``gaussian`` by its familiar name).

    At ``n = 0.5`` the Sersic constant is ``kappa = ln 2`` exactly, so
    the profile is ``I_e exp(-ln2 ((r/reff)^2 - 1))``: a Gaussian whose
    half-maximum falls exactly at ``reff`` — i.e. ``FWHM = 2 reff``
    (use ``reff = fwhm / 2`` when translating a GALFIT ``gaussian``,
    which is FWHM-parameterized).  Takes every Sersic parameter except
    ``index``; shape freedoms included.
    """

    _fits_abbrs = (
        ("Gaussian", "GAU"),
        ("reff_b", "REB"),
        ("reff", "RE"),
        ("angle", "ANG"),
    )

    def __init__(self, **kw):
        if "index" in kw:
            raise TypeError(
                "Gaussian fixes index=0.5; use Sersic for a free index"
            )
        super().__init__(index=0.5, **kw)


class King(ComponentBase):
    """Generalized King profile component (beyond the reference —
    GALFIT's ``king``; the classic King 1962 cluster law at
    ``alpha = 2``).

        ``I(t) = I0 [ (1+t^2)^(-1/alpha) - (1+(rt/rc)^2)^(-1/alpha)
        ]^alpha``

    truncated to zero beyond the tidal radius ``rt`` (``t`` = radius in
    core-radius units).  Conventions follow :class:`Sersic`: total
    ``mag`` (deliberate divergence from GALFIT's central surface
    brightness — every luminous component here is flux-parameterized;
    the renderer is exactly flux-normalized via a device tanh-sinh
    radial integral, :func:`psfmc_tpu.ops.profiles.king_radial_factor`),
    semi-major/minor core radii ``rc >= rc_b``, position ``angle``
    (+90deg convention).  ``rt`` is measured along the semi-major axis;
    the truncation isophote shares the core's axis ratio.  Optional
    isophote shapes (``c0``, ``f1..f4``, ``b1..b3``) as in
    :class:`Sersic`.
    Support: ``rt > 0``, ``alpha > 0``.
    """

    _fits_abbrs = (
        ("King", "KNG"),
        ("rc_b", "RCB"),
        ("rc", "RC"),
        ("rt", "RT"),
        ("alpha", "AL"),
        ("angle", "ANG"),
    )
    _fourier_modes = _FOURIER_MODES
    _stochastic_attrs = (
        "xy", "mag", "rc", "rc_b", "rt", "alpha", "angle",
    ) + _SHAPE_ATTRS

    def __init__(
        self,
        xy=None,
        mag=None,
        rc=None,
        rc_b=None,
        rt=None,
        alpha=2.0,
        angle=None,
        angle_degrees=False,
        c0=None,
        **shape_kw,
    ):
        super().__init__()
        self.xy = xy
        self.mag = mag
        self.rc = rc
        self.rc_b = rc_b
        self.rt = rt
        self.alpha = alpha
        self.angle = angle
        self.angle_degrees = angle_degrees
        _register_shape_attrs(self, c0, shape_kw)

    def log_priors(self):
        logp = super().log_priors()
        logp += -np.inf if self.rc_b > self.rc else 0.0
        logp += -np.inf if self.rt <= 0.0 else 0.0
        logp += -np.inf if self.alpha <= 0.0 else 0.0
        logp += _shape_log_prior_terms(self)
        return logp

    def _batch_constraints(self, vals):
        ok = super()._batch_constraints(vals)
        rc = vals.get("rc", self._constants.get("rc"))
        rc_b = vals.get("rc_b", self._constants.get("rc_b"))
        rt = vals.get("rt", self._constants.get("rt"))
        alpha = vals.get("alpha", self._constants.get("alpha"))
        if not (isinstance(rc, Tied) or isinstance(rc_b, Tied)):
            ok = ok & np.ravel(np.asarray(rc_b) <= np.asarray(rc))
        if not isinstance(rt, Tied):
            ok = ok & np.ravel(np.asarray(rt) > 0.0)
        if not isinstance(alpha, Tied):
            ok = ok & np.ravel(np.asarray(alpha) > 0.0)
        return _shape_batch_ok(self, vals, ok)


class Ferrer(ComponentBase):
    """Modified Ferrer profile component (beyond the reference —
    GALFIT's ``ferrer``: bars, lenses, and other sharply-truncated
    structures).

        ``I(t) = I0 (1 - t^(2-beta))^alpha``  for ``t < 1``, 0 outside

    (``t`` = radius in outer-truncation-radius units; ``alpha`` sets
    the outer-edge sharpness, ``beta`` the central slope).  Total
    ``mag`` convention (the flux normalization is the exact Beta
    function, :func:`psfmc_tpu.ops.profiles.ferrer_radial_factor`);
    semi-major/minor truncation radii ``rout >= rout_b``; optional
    isophote shapes as in :class:`Sersic`.  Support: ``alpha > 0``,
    ``0 <= beta < 2``.
    """

    _fits_abbrs = (
        ("Ferrer", "FER"),
        ("rout_b", "ROB"),
        ("rout", "RO"),
        ("alpha", "AL"),
        ("beta", "BE"),
        ("angle", "ANG"),
    )
    _fourier_modes = _FOURIER_MODES
    _stochastic_attrs = (
        "xy", "mag", "rout", "rout_b", "alpha", "beta", "angle",
    ) + _SHAPE_ATTRS

    def __init__(
        self,
        xy=None,
        mag=None,
        rout=None,
        rout_b=None,
        alpha=None,
        beta=None,
        angle=None,
        angle_degrees=False,
        c0=None,
        **shape_kw,
    ):
        super().__init__()
        self.xy = xy
        self.mag = mag
        self.rout = rout
        self.rout_b = rout_b
        self.alpha = alpha
        self.beta = beta
        self.angle = angle
        self.angle_degrees = angle_degrees
        _register_shape_attrs(self, c0, shape_kw)

    def log_priors(self):
        logp = super().log_priors()
        logp += -np.inf if self.rout_b > self.rout else 0.0
        logp += -np.inf if self.alpha <= 0.0 else 0.0
        logp += -np.inf if not (0.0 <= self.beta < 2.0) else 0.0
        logp += _shape_log_prior_terms(self)
        return logp

    def _batch_constraints(self, vals):
        ok = super()._batch_constraints(vals)
        rout = vals.get("rout", self._constants.get("rout"))
        rout_b = vals.get("rout_b", self._constants.get("rout_b"))
        alpha = vals.get("alpha", self._constants.get("alpha"))
        beta = vals.get("beta", self._constants.get("beta"))
        if not (isinstance(rout, Tied) or isinstance(rout_b, Tied)):
            ok = ok & np.ravel(np.asarray(rout_b) <= np.asarray(rout))
        if not isinstance(alpha, Tied):
            ok = ok & np.ravel(np.asarray(alpha) > 0.0)
        if not isinstance(beta, Tied):
            b = np.ravel(np.asarray(beta))
            ok = ok & (b >= 0.0) & (b < 2.0)
        return _shape_batch_ok(self, vals, ok)


class Nuker(ComponentBase):
    """Nuker-law profile component (beyond the reference — GALFIT's
    ``nuker``; Lauer et al. 1995 galaxy-nucleus law).

        ``I(t) = I_b 2^((beta-gamma)/alpha) t^(-gamma)
        [1 + t^alpha]^((gamma-beta)/alpha)``

    (``t`` = radius in break-radius units: inner cusp slope ``gamma``,
    outer slope ``beta``, break sharpness ``alpha``).  Total ``mag``
    convention — a deliberate divergence from GALFIT's
    surface-brightness-at-break parameterization; the flux
    normalization integrates the law to infinity on device
    (:func:`psfmc_tpu.ops.profiles.nuker_radial_factor`), which
    requires ``beta > 2`` and ``gamma < 2`` (enforced as prior
    support along with ``alpha > 0`` and ``gamma < beta``).

    The ``gamma > 0`` central cusp is point-sampled (no trapezoid
    correction exists for a power-law center — the same cusp weakness
    the reference acknowledges for Sersic, models.py:239); for cuspy
    fits enable ``Configuration(render_oversample=...)``.
    """

    _fits_abbrs = (
        ("Nuker", "NUK"),
        ("rb_b", "RBB"),
        ("rb", "RB"),
        ("alpha", "AL"),
        ("beta", "BE"),
        ("gamma", "GA"),
        ("angle", "ANG"),
    )
    _fourier_modes = _FOURIER_MODES
    _stochastic_attrs = (
        "xy", "mag", "rb", "rb_b", "alpha", "beta", "gamma", "angle",
    ) + _SHAPE_ATTRS

    def __init__(
        self,
        xy=None,
        mag=None,
        rb=None,
        rb_b=None,
        alpha=None,
        beta=None,
        gamma=None,
        angle=None,
        angle_degrees=False,
        c0=None,
        **shape_kw,
    ):
        super().__init__()
        self.xy = xy
        self.mag = mag
        self.rb = rb
        self.rb_b = rb_b
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma
        self.angle = angle
        self.angle_degrees = angle_degrees
        _register_shape_attrs(self, c0, shape_kw)

    def log_priors(self):
        logp = super().log_priors()
        logp += -np.inf if self.rb_b > self.rb else 0.0
        logp += -np.inf if self.alpha <= 0.0 else 0.0
        logp += -np.inf if self.beta <= 2.0 else 0.0
        logp += -np.inf if self.gamma >= 2.0 else 0.0
        logp += -np.inf if self.gamma >= self.beta else 0.0
        logp += _shape_log_prior_terms(self)
        return logp

    def _batch_constraints(self, vals):
        ok = super()._batch_constraints(vals)
        rb = vals.get("rb", self._constants.get("rb"))
        rb_b = vals.get("rb_b", self._constants.get("rb_b"))
        alpha = vals.get("alpha", self._constants.get("alpha"))
        beta = vals.get("beta", self._constants.get("beta"))
        gamma = vals.get("gamma", self._constants.get("gamma"))
        if not (isinstance(rb, Tied) or isinstance(rb_b, Tied)):
            ok = ok & np.ravel(np.asarray(rb_b) <= np.asarray(rb))
        if not isinstance(alpha, Tied):
            ok = ok & np.ravel(np.asarray(alpha) > 0.0)
        if not isinstance(beta, Tied):
            ok = ok & np.ravel(np.asarray(beta) > 2.0)
        if not isinstance(gamma, Tied):
            ok = ok & np.ravel(np.asarray(gamma) < 2.0)
        if not (isinstance(beta, Tied) or isinstance(gamma, Tied)):
            ok = ok & np.ravel(
                np.asarray(gamma) < np.asarray(beta)
            )
        return _shape_batch_ok(self, vals, ok)


class EdgeDisk(ComponentBase):
    """Edge-on disk component (beyond the reference — GALFIT's
    ``edgedisk``; van der Kruit & Searle 1981).

        ``I(R, z) = I0 (|R|/rs) K1(|R|/rs) sech^2(z/hs)``

    ``R`` along the disk midplane (the ``angle`` major axis, same
    +90deg convention as every profile here), ``z`` perpendicular;
    ``rs`` is the radial scale length, ``hs`` the vertical scale
    height.  Total ``mag`` convention — a deliberate divergence from
    GALFIT's central-surface-brightness parameterization; the
    separable law normalizes in closed form
    (:func:`psfmc_tpu.ops.profiles.render_edgedisk`).  Support:
    ``rs > 0``, ``hs > 0`` (no ``rs >= hs`` constraint — the two
    scales multiply different laws, so swapping them is not a
    relabeling degeneracy).  Isophote shapes (``c0``, Fourier modes)
    do not apply to this separable profile and are not accepted.
    Not to be confused with :class:`ExpDisk` (the face-on exponential,
    a Sersic at ``index = 1``).
    """

    _fits_abbrs = (
        ("EdgeDisk", "EDG"),
        ("rs", "RS"),
        ("hs", "HS"),
        ("angle", "ANG"),
    )
    _stochastic_attrs = ("xy", "mag", "rs", "hs", "angle")

    def __init__(
        self,
        xy=None,
        mag=None,
        rs=None,
        hs=None,
        angle=None,
        angle_degrees=False,
    ):
        super().__init__()
        self.xy = xy
        self.mag = mag
        self.rs = rs
        self.hs = hs
        self.angle = angle
        self.angle_degrees = angle_degrees

    def log_priors(self):
        logp = super().log_priors()
        logp += -np.inf if self.rs <= 0.0 else 0.0
        logp += -np.inf if self.hs <= 0.0 else 0.0
        return logp

    def _batch_constraints(self, vals):
        ok = super()._batch_constraints(vals)
        rs = vals.get("rs", self._constants.get("rs"))
        hs = vals.get("hs", self._constants.get("hs"))
        if not isinstance(rs, Tied):
            ok = ok & np.ravel(np.asarray(rs) > 0.0)
        if not isinstance(hs, Tied):
            ok = ok & np.ravel(np.asarray(hs) > 0.0)
        return ok


class Moffat(ComponentBase):
    """Moffat profile component (beyond the reference).

    The standard analytic ground-based-PSF / compact-source model the
    reference lacks (its component set is Sky/PointSource/Sersic,
    reference ModelComponents/__init__.py:1-4).  Conventions follow
    :class:`Sersic`: total ``mag``, semi-major/minor FWHMs with the
    joint constraint ``fwhm >= fwhm_b``, position ``angle`` (+90deg
    convention), concentration ``index`` = the Moffat beta (> 1 for a
    finite total flux; the renderer is exactly flux-normalized).
    Takes the same optional isophote-shape parameters as
    :class:`Sersic` (``c0`` boxiness, ``f1..f4`` Fourier modes,
    ``b1..b3`` bending modes) with
    identical support constraints and exact flux renormalization.
    """

    _fits_abbrs = (
        ("Moffat", "MOF"),
        ("fwhm_b", "FWB"),
        ("fwhm", "FW"),
        ("index", "B"),
        ("angle", "ANG"),
    )
    _fourier_modes = _FOURIER_MODES
    _stochastic_attrs = (
        "xy", "mag", "fwhm", "fwhm_b", "index", "angle",
    ) + _SHAPE_ATTRS + _TRUNC_ATTRS

    def __init__(
        self,
        xy=None,
        mag=None,
        fwhm=None,
        fwhm_b=None,
        index=None,
        angle=None,
        angle_degrees=False,
        c0=None,
        **shape_kw,
    ):
        super().__init__()
        self.xy = xy
        self.mag = mag
        self.fwhm = fwhm
        self.fwhm_b = fwhm_b
        self.index = index
        self.angle = angle
        self.angle_degrees = angle_degrees
        _register_shape_attrs(self, c0, shape_kw, allow_trunc=True)

    def log_priors(self):
        logp = super().log_priors()
        # semi-major FWHM must exceed semi-minor (Sersic convention);
        # beta <= 1 has no finite total flux (negative normalization)
        logp += -np.inf if self.fwhm_b > self.fwhm else 0.0
        logp += -np.inf if self.index <= 1.0 else 0.0
        logp += _shape_log_prior_terms(self)
        return logp

    def _batch_constraints(self, vals):
        ok = super()._batch_constraints(vals)
        fwhm = vals.get("fwhm", self._constants.get("fwhm"))
        fwhm_b = vals.get("fwhm_b", self._constants.get("fwhm_b"))
        index = vals.get("index", self._constants.get("index"))
        if not (isinstance(fwhm, Tied) or isinstance(fwhm_b, Tied)):
            ok = ok & np.ravel(np.asarray(fwhm_b) <= np.asarray(fwhm))
        if not isinstance(index, Tied):
            ok = ok & np.ravel(np.asarray(index) > 1.0)
        return _shape_batch_ok(self, vals, ok)


class PSFSelector(ComponentBase):
    """Discrete choice over a pre-FFT'd PSF stack (reference PSFSelector.py).

    With multiple PSFs the index is a free ``DiscreteUniform`` parameter;
    preprocessing normalizes each PSF, propagates inter-PSF mismatch
    variance, and pre-computes ``rfft2`` of every PSF and variance map
    padded to the observation shape.  On device this becomes a gather
    over the stacked Fourier arrays — fully batched and branchless.
    """

    _stochastic_attrs = ("psf_index",)

    def __init__(self, psf_list, ivm_list, data_shape, oversample=1):
        super().__init__()
        if isinstance(psf_list, (str, np.ndarray)):
            psf_list = [psf_list]
        if isinstance(ivm_list, (str, np.ndarray)):
            ivm_list = [ivm_list]
        if len(psf_list) != len(ivm_list):
            raise ValueError("PSF and IVM lists must be the same length")

        if len(psf_list) > 1:
            self.psf_index = DiscreteUniform(low=0, high=len(psf_list))
        else:
            self.psf_index = 0

        pairs = [preprocess_psf(p, i) for p, i in zip(psf_list, ivm_list)]
        if oversample != int(oversample) or int(oversample) < 1:
            raise ValueError(
                f"psf_oversample must be a positive integer, got "
                f"{oversample!r}"
            )
        if int(oversample) != 1:
            from ..io.preprocess import bin_psf

            # normalized-then-binned: block summation preserves the
            # total, so the binned PSF stays unit-sum
            pairs = [bin_psf(d, v, oversample) for d, v in pairs]
        data_list, var_list = calculate_psf_variability(
            [d for d, _ in pairs], [v for _, v in pairs]
        )
        self.filenames = [
            p if isinstance(p, str) else f"<array {i}>"
            for i, p in enumerate(psf_list)
        ]
        # spatial (pre-FFT) kernels; the obs-shape FFT stacks are
        # computed LAZILY (psf_list/var_list properties) — a conv_pad>0
        # model FFTs at the padded size instead and never needs them
        self.spatial_psfs = data_list
        self.spatial_vars = var_list
        self._data_shape = tuple(data_shape)
        self._fft_psfs = None
        self._fft_vars = None

    def _ensure_ffts(self):
        if self._fft_psfs is None:
            ffts = [
                pre_fft_psf(psf, var, self._data_shape)
                for psf, var in zip(self.spatial_psfs, self.spatial_vars)
            ]
            self._fft_psfs = [f for f, _ in ffts]
            self._fft_vars = [v for _, v in ffts]

    @property
    def psf_list(self):
        self._ensure_ffts()
        return self._fft_psfs

    @property
    def var_list(self):
        self._ensure_ffts()
        return self._fft_vars

    def update_stochastic_names(self, count=None):
        # Single selector per model: no count prefix (PSFSelector.py:45-52)
        if "psf_index" in self._priors:
            self._priors["psf_index"].name = "PSF_Index"
            self._priors["psf_index"].fitsname = "PSF_IDX"

    def current_index(self):
        return int(np.rint(np.asarray(self.psf_index)))

    @property
    def psf(self):
        return self.psf_list[self.current_index()]

    @property
    def variance(self):
        return self.var_list[self.current_index()]

    @property
    def filename(self):
        return self.filenames[self.current_index()]


class Configuration(ComponentBase):
    """Input images + control parameters (reference Configuration.py).

    :param obs_file: observed image — FITS filename, (header, array) pair,
        or bare array.
    :param obsivm_file: inverse-variance map of the observation.
    :param psf_files: one or more PSF images (multiple => PSF index
        becomes a free discrete parameter).
    :param psfivm_files: matching PSF inverse-variance maps.
    :param mask_file: optional FITS mask (nonzero = exclude) or ds9
        region file defining the fit region.
    :param mag_zeropoint: magnitude of 1 count/second.
    :param likelihood: per-pixel likelihood family — ``'gaussian'``
        (reference parity, default), ``'student'`` (robust Student-t,
        beyond the reference: unmasked cosmic rays / artifacts get
        heavy-tailed wings instead of quadratically dominating the
        fit) or ``'poisson'`` (beyond the reference: exact low-count
        likelihood — Cash statistic — for X-ray/UV/narrow-band imaging
        where the Gaussian IVM approximation biases fluxes; the data
        must be non-negative counts / count rates, and the IVM input
        defines only the bad-pixel mask.  A model whose expected counts
        go non-positive at any good pixel is rejected with ``-inf`` —
        note a bright ``PointSource``'s lanczos3 interpolation kernel
        has negative side lobes reaching ~14% of the flux at the worst
        sub-pixel phase (less once smoothed by a realistic PSF), so
        the sky level must cover them or such proposals are correctly
        rejected).
    :param likelihood_df: Student-t degrees of freedom (static; 3-8
        are typical robust choices).  Ignored otherwise.
    :param likelihood_gain: Poisson counts per observation unit
        (static): detected counts per pixel are ``gain * image``, so
        pass GAIN for data in ADU, EXPTIME for count rates, 1.0 for
        raw counts.  Ignored otherwise.
    :param psf_oversample: PSF fine-sampling factor (beyond the
        reference): PSF models sampled N-times finer than the data
        (e.g. subsampled TinyTim output) are block-binned to the native
        pixel scale, flux-preserving, with variances summed per block.
        The PSF shape must be divisible by N and aligned so binning
        leaves it centered.
    :param conv_pad: convolution padding in pixels (beyond the
        reference — GALFIT's "convolution box" analogue).  The model is
        rendered on a grid extended by ``conv_pad`` pixels on every
        side, convolved there, and cropped back: wrap-around artifacts
        move ``conv_pad`` pixels off-frame and flux from sources just
        outside the cutout scatters in correctly.  ``0`` (default) is
        the reference's wrap-boundary behavior; ``>= half the PSF
        extent`` makes edge effects negligible.  Cost scales as
        ``((H + 2 pad)(W + 2 pad)) / (H W)`` in render+convolve.
    :param render_oversample: sub-pixel integration factor for profile
        components (beyond the reference — GALFIT's sub-pixel
        integration analogue).  ``S > 1`` re-renders an
        ``oversample_window``-sized pixel box around each Sersic/Moffat
        center on an ``S``-times finer midpoint grid and flux-averages
        it back, removing the ~1-2%-of-flux pixel-integration bias of
        point sampling for compact profiles (Sersic ``reff`` of a few
        px).  ``1`` (default) is reference point-sampling parity.
        ``S = 4`` captures most of the bias; ``8`` is essentially
        exact (see tests/test_oversample.py).
    :param oversample_window: side length in pixels of the oversampled
        box (default 16; clamped to the render grid).  Outside the box
        the profile varies slowly across a pixel and point sampling is
        already accurate.
    """

    def __init__(
        self,
        obs_file,
        obsivm_file,
        psf_files,
        psfivm_files,
        mask_file=None,
        mag_zeropoint=0,
        likelihood="gaussian",
        likelihood_df=4.0,
        likelihood_gain=1.0,
        psf_oversample=1,
        conv_pad=0,
        render_oversample=1,
        oversample_window=16,
    ):
        super().__init__()
        self.mag_zeropoint = mag_zeropoint
        # validate eagerly: a typo'd likelihood should fail at model
        # build, not at the first posterior evaluation
        from ..ops.likelihood import make_lnlike

        make_lnlike(likelihood, likelihood_df, likelihood_gain)
        self.likelihood = likelihood
        self.likelihood_df = float(likelihood_df)
        self.likelihood_gain = float(likelihood_gain)
        conv_pad = int(conv_pad)
        if conv_pad < 0:
            raise ValueError(f"conv_pad must be >= 0, got {conv_pad}")
        self.conv_pad = conv_pad
        if (render_oversample != int(render_oversample)
                or int(render_oversample) < 1):
            raise ValueError(
                f"render_oversample must be a positive integer, got "
                f"{render_oversample!r}"
            )
        self.render_oversample = int(render_oversample)
        if (oversample_window != int(oversample_window)
                or int(oversample_window) < 1):
            raise ValueError(
                f"oversample_window must be a positive integer, got "
                f"{oversample_window!r}"
            )
        self.oversample_window = int(oversample_window)

        obs_hdr, obs_data, obs_var, bad_px = preprocess_obs(
            obs_file, obsivm_file, mask_file
        )
        self.obs_header = obs_hdr
        self.obs_data = obs_data
        self.obs_var = obs_var
        self.bad_px = bad_px

        self.psf_selector = PSFSelector(
            psf_files, psfivm_files, obs_data.shape,
            oversample=psf_oversample,
        )
        self.coords = array_coords(obs_data.shape)
