"""Joint multi-band fitting: one posterior over several observations.

Simultaneous multi-band quasar/host decomposition — the standard
next step beyond the reference's one-band-at-a-time workflow: each
band has its own observation, PSF stack and per-band components
(typically its own magnitudes), while structural parameters (centroid,
effective radius, axis ratio, angle, Sersic index) are shared across
bands with :class:`~psfmc_tpu.models.components.Tied`.

TPU-first design: the whole joint posterior is ONE jitted scalar
function over a single global parameter vector,

    lnpost(theta) = log_prior(theta) + sum_b lnL_b(theta),

where the global prior is evaluated once over the union slot layout
(ties contribute no slots, so nothing double counts) and each band's
likelihood is the same render -> convolve -> masked-Gaussian chain the
single-band posterior uses, against that band's data plane.  The bands
sum INSIDE one program, so a vmapped walker batch still fuses across
bands.

Usage::

    host_r = Sersic(xy=Uniform(...), mag=Uniform(...), reff=..., ...)
    host_g = Sersic(xy=Tied(host_r, 'xy'), reff=Tied(host_r, 'reff'),
                    reff_b=Tied(host_r, 'reff_b'),
                    index=Tied(host_r, 'index'),
                    angle=Tied(host_r, 'angle'),
                    mag=Uniform(...))                  # per-band mag
    model = JointModel([[config_r, Sky(...), host_r],
                        [config_g, Sky(...), host_g]])
    sampler = EnsembleSampler(nw, model.num_params, model.posterior_fns)

``JointModel`` exposes the ``MultiComponentModel`` surface the sampler
and trace database need (``num_params``, ``param_names``,
``param_lens``, ``init_params_from_priors``), so chains save/load with
``save_database(sampler, model, ...)`` unchanged.
"""
from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from .components import ComponentBase, Configuration
from .posterior import PosteriorFns, make_log_prior
from .spec import (
    ModelSpec,
    build_param_slots,
    comp_spec_for,
    psf_spectra_for,
)

__all__ = ["JointModel", "JointPosteriorFns", "build_joint_specs"]


def build_joint_specs(bands):
    """Compile per-band component lists into band ModelSpecs + layout.

    :param bands: list of component lists; each must contain its own
        :class:`Configuration`.  Components may reference other bands'
        components via ``Tied`` (resolved against the global layout).
    :returns: ``(band_specs, slots, num_params, all_comp_specs)`` —
        band specs carry GLOBAL offsets in their render rules and an
        EMPTY slot list (band posteriors contribute likelihood only;
        the prior is evaluated once over ``slots``).
    """
    band_lists, configs = [], []
    all_components: List[ComponentBase] = []
    for comps in bands:
        comps = list(comps)
        cfgs = [c for c in comps if isinstance(c, Configuration)]
        if not cfgs:
            raise ValueError(
                "every band needs its own Configuration component"
            )
        config = cfgs[0]
        comps = [c for c in comps if not isinstance(c, Configuration)]
        comps.append(config.psf_selector)
        configs.append(config)
        band_lists.append(comps)
        all_components.extend(comps)

    # canonical global naming: band order, file order within band
    for count, comp in enumerate(all_components):
        comp.update_stochastic_names(count=count)

    # single-band convention names a stochastic PSF index the bare
    # 'PSF_Index' (DB-column parity); with more than one stochastic
    # selector in the joint layout that would collide and the name-keyed
    # trace columns would silently overwrite each other — disambiguate
    # per band
    stoch_selectors = [
        (bi, comps[-1])
        for bi, comps in enumerate(band_lists)
        if "psf_index" in comps[-1]._priors
    ]
    if len(stoch_selectors) > 1:
        for bi, sel in stoch_selectors:
            prior = sel._priors["psf_index"]
            prior.name = f"B{bi}_PSF_Index"
            prior.fitsname = f"B{bi}PSFIX"

    slots, slot_map, num_params = build_param_slots(all_components)
    names = [s.name for s in slots]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"duplicate parameter names in the joint layout: {dupes}"
        )

    # WCS frames for frame='sky' ties: every component maps to ITS
    # band's frame (None entries mean "no usable WCS on that band").
    # A component instance shared between bands with different frames
    # has no well-defined frame — mark it ambiguous so a sky tie
    # touching it fails loudly instead of silently using one band.
    from .spec import config_wcs_frame

    wcs_map = {}
    for comps, config in zip(band_lists, configs):
        frame = config_wcs_frame(config)
        if frame is None:
            continue
        for c in comps:
            prev = wcs_map.get(id(c))
            if prev is not None and prev is not frame:
                wcs_map[id(c)] = "ambiguous"
            else:
                wcs_map[id(c)] = frame

    band_specs = []
    all_comp_specs = []
    for comps, config in zip(band_lists, configs):
        comp_specs = [comp_spec_for(c, slot_map, wcs_map) for c in comps]
        all_comp_specs.extend(comp_specs)
        f_psf_stack, f_var_stack = psf_spectra_for(config)
        if getattr(config, "likelihood", "gaussian") == "poisson":
            from .spec import _check_poisson_inputs

            _check_poisson_inputs(config, comp_specs)
        band_specs.append(
            ModelSpec(
                comp_specs=comp_specs,
                # empty: the band posterior contributes ONLY its
                # likelihood; slot priors + constraints live in the
                # joint prior so nothing double counts
                slots=[],
                num_params=num_params,
                shape=tuple(config.obs_data.shape),
                mag_zeropoint=float(config.mag_zeropoint),
                obs_data=np.asarray(config.obs_data, np.float64),
                obs_var=np.asarray(config.obs_var, np.float64),
                bad_px=np.asarray(config.bad_px, bool),
                f_psf_stack=f_psf_stack,
                f_var_stack=f_var_stack,
                num_psfs=len(config.psf_selector.spatial_psfs),
                # per-band semantic fields — each band keeps its own
                # Configuration's choices (a dropped field here would
                # silently revert to the ModelSpec default)
                likelihood=getattr(config, "likelihood", "gaussian"),
                likelihood_df=getattr(config, "likelihood_df", 4.0),
                likelihood_gain=float(
                    getattr(config, "likelihood_gain", 1.0)
                ),
                conv_pad=int(getattr(config, "conv_pad", 0)),
                render_oversample=int(
                    getattr(config, "render_oversample", 1)
                ),
                oversample_window=int(
                    getattr(config, "oversample_window", 16)
                ),
            )
        )
    # unique components in global order (shared instances once) — the
    # SAME list the slot layout was built from, so prior-draw columns
    # cannot misalign with it
    unique_components = []
    seen = set()
    for comp in all_components:
        if id(comp) not in seen:
            seen.add(id(comp))
            unique_components.append(comp)
    return (band_specs, slots, num_params, all_comp_specs,
            unique_components)


class JointSpec:
    """Global layout + per-band specs (PosteriorFns-compatible shell)."""

    def __init__(self, band_specs, slots, num_params, comp_specs):
        self.band_specs = band_specs
        self.slots = slots
        self.num_params = num_params
        self.comp_specs = comp_specs  # all bands (transforms, MAP)
        self.shape = band_specs[0].shape
        self.mag_zeropoint = band_specs[0].mag_zeropoint

    @property
    def param_names(self):
        return [s.name for s in self.slots]

    @property
    def param_fits_abbrs(self):
        return [s.fitsname for s in self.slots]

    @property
    def param_lens(self):
        return [s.size for s in self.slots]


class JointPosteriorFns:
    """Pure joint posterior: global prior + one likelihood per band.

    Duck-types the :class:`PosteriorFns` surface the samplers consume
    (``dtype``, ``spec``, ``log_posterior``, ``log_prior``,
    ``carry_images``, ``log_posterior_and_images``, ``programs``).
    Carry images are per band under ``b{i}_*`` keys (arbitrary band
    shapes supported — the sampler sizes accumulators by shape
    inference).
    """

    def __init__(self, jspec: JointSpec, dtype=jnp.float32):
        self.spec = jspec
        self.dtype = dtype
        self.band_fns = [
            PosteriorFns(bs, dtype=dtype) for bs in jspec.band_specs
        ]
        self.log_prior = make_log_prior(
            jspec.slots, jspec.comp_specs, dtype
        )
        self.programs = {}

        def log_posterior(theta):
            theta = jnp.asarray(theta, dtype)
            lp = self.log_prior(theta)
            lnl = jnp.asarray(0.0, dtype)
            for f in self.band_fns:
                lnl = lnl + f.log_likelihood(theta)
            out = jnp.where(jnp.isfinite(lp), lp + lnl, -jnp.inf)
            return jnp.where(jnp.isnan(out), -jnp.inf, out)

        def carry_images(theta):
            theta = jnp.asarray(theta, dtype)
            out = {}
            for i, f in enumerate(self.band_fns):
                for k, v in f._images_impl(theta).items():
                    out[f"b{i}_{k}"] = v
            return out

        self.log_posterior = log_posterior
        self.carry_images = carry_images
        self.log_posterior_and_images = lambda theta: (
            log_posterior(theta), carry_images(theta)
        )
        self.batched_lnpost = jax.jit(jax.vmap(log_posterior))

    def ensemble_carry_means(self, thetas):
        """Walker-mean carry images per band, linearity-exploited.

        Delegates to each band's ``ensemble_carry_means`` (convolve the
        walker-mean renders once per PSF instead of per walker — the
        accumulation shortcut the single-band headline depends on) and
        prefixes the keys ``b{i}_``.
        """
        out = {}
        for i, f in enumerate(self.band_fns):
            for k, v in f.ensemble_carry_means(thetas).items():
                out[f"b{i}_{k}"] = v
        return out

    def render_images(self, theta):
        """Per-band reference image dicts, keyed ``b{i}_<type>``."""
        from .posterior import carry_to_reference_images

        theta = jnp.asarray(theta, self.dtype)
        out = {}
        for i, f in enumerate(self.band_fns):
            imgs = carry_to_reference_images(
                f._images_impl(theta), f.constants["obs_data"]
            )
            for k, v in imgs.items():
                out[f"b{i}_{k}"] = v
        return out


class JointModel:
    """Host facade over a joint multi-band model.

    Provides the ``MultiComponentModel`` subset the samplers and trace
    database consume; build one from a list of per-band component
    lists (each with its own Configuration).
    """

    def __init__(self, bands, dtype=jnp.float32):
        (band_specs, slots, num_params, all_cs,
         components) = build_joint_specs(bands)
        self.spec = JointSpec(band_specs, slots, num_params, all_cs)
        self.posterior_fns = JointPosteriorFns(self.spec, dtype=dtype)
        self._components = components

    @property
    def num_params(self):
        return self.spec.num_params

    @property
    def param_names(self):
        return self.spec.param_names

    @property
    def param_fits_abbrs(self):
        return self.spec.param_fits_abbrs

    @property
    def param_lens(self):
        return self.spec.param_lens

    def set_accumulated_from_sampler(self, sampler):
        """Driver hook: the joint image writer reads the sampler's
        per-band accumulators directly, so only the count is kept."""
        self.accumulated_samples = sampler.accumulated_samples

    def thetas_from_database(self, database, rows=None):
        """(N, num_params) parameter matrix from a trace database.

        Same column->slot converter as the single-band model — joint
        trace DBs use the global slot layout, so the chain-replay
        consumers (WAIC/LOO, sensitivity, PPC) work unchanged.
        """
        from .multicomponent import trace_param_matrix

        thetas = trace_param_matrix(database, self.param_names)
        return thetas if rows is None else thetas[rows]

    def simulate(self, theta=None, random_state=None, add_noise=True):
        """Mock observation per band: convolved model + Gaussian noise.

        The joint-fit injection step (multi-band completeness sims) —
        same semantics as ``MultiComponentModel.simulate`` per band,
        all bands at ONE shared parameter vector.

        :returns: ``(mocks, theta)`` — a list of (H_b, W_b) float64
            images (one per band) and the (num_params,) vector that
            generated them.
        """
        rng = (
            random_state
            if isinstance(random_state, np.random.RandomState)
            else np.random.RandomState(random_state)
        )
        if theta is None:
            theta = self.init_params_from_priors(1, random_state=rng)[0]
        theta = np.asarray(theta, np.float64)
        th = jnp.asarray(theta, self.posterior_fns.dtype)
        mocks = []
        from .multicomponent import replicate_noise

        for bs, f in zip(self.spec.band_specs,
                         self.posterior_fns.band_fns):
            conv = np.asarray(f._images_impl(th)["conv"], np.float64)
            if add_noise:
                var = np.asarray(bs.obs_var, np.float64)
                sigma = np.where(np.isfinite(var), np.sqrt(var), 0.0)
                conv = replicate_noise(rng, conv, bs, sigma)
            mocks.append(conv)
        return mocks, theta

    def save_posterior_images(self, sampler, output_name,
                              database=None, filetypes=None,
                              criticism_draws=0):
        """Write each band's five posterior-mean image products.

        ``sampler`` is any object exposing ``accumulated_images`` /
        ``accumulated_samples`` (a live sampler, or a shim over a
        loaded checkpoint's accumulators).

        Maps the sampler's per-band carry accumulators (``b{i}_raw`` …)
        to the reference image types exactly like the single-band
        writer (IVM averaged as variance, via the shared
        ``carry_to_reference_images`` rule) and writes
        ``<output_name>_b{i}_<type>.fits`` per band.  With a trace
        ``database``, per-parameter posterior mean/std cards are added
        under the FITS abbreviations.  Multi-process safe (primary-host
        writes, like all product IO).

        Caveat vs the single-band writer: the accumulators average
        EVERY walker's retained states — the stuck-walker filter +
        replay path (analysis.images) is single-band only, so inspect
        ``sampler.acceptance_fraction`` / per-walker lnp before
        trusting products from a run with stranded walkers.
        """
        from ..analysis.images import (
            default_filetypes,
            write_image_products,
        )
        from ..database import annotate_metadata
        from ..io import fits
        from .posterior import carry_to_reference_images

        accum = sampler.accumulated_images
        n = sampler.accumulated_samples
        if accum is None or n == 0:
            raise ValueError(
                "sampler has no accumulated images: run retained "
                "sampling first"
            )
        # None -> defaults; an explicitly EMPTY list writes nothing
        # (same contract as the single-band writer)
        filetypes = default_filetypes if filetypes is None else filetypes
        # global criticism block (all bands' pixels), once, shared by
        # every band header (same contract as the single-band writer)
        criticism_cards = {}
        if criticism_draws and database is not None:
            import warnings as _warnings

            from warnings import warn

            from ..analysis.model_comparison import (
                criticism_header_stats,
            )

            try:
                with _warnings.catch_warnings():
                    _warnings.simplefilter("ignore")
                    criticism_cards = criticism_header_stats(
                        self, database, draws=criticism_draws
                    )
            except Exception as err:  # noqa: BLE001
                warn(f"could not compute criticism header stats: {err}")
        for i, bs in enumerate(self.spec.band_specs):
            obs = np.asarray(bs.obs_data)
            carries = {
                k: accum[f"b{i}_{k}"].astype(np.float64)
                for k in ("raw", "conv", "var", "ps_conv")
            }
            images = carry_to_reference_images(carries, obs)
            header = fits.Header()
            header.set("MCBAND", i, "joint-fit band index")
            header.set("MCACCUM", int(n), "posterior samples averaged")
            if database is not None:
                stats = {}
                for name, abbr in zip(self.param_names,
                                      self.param_fits_abbrs):
                    col = np.asarray(database[name], np.float64)
                    m, sd = np.mean(col, axis=0), np.std(col, axis=0)
                    if np.ndim(m) == 0:
                        stats[abbr] = f"{m:0.4g} +/- {sd:0.4g}"
                    else:
                        stats[abbr] = (
                            "(" + ",".join(f"{v:0.4g}" for v in m)
                            + ") +/- ("
                            + ",".join(f"{v:0.4g}" for v in sd) + ")"
                        )
                for key, value in annotate_metadata(stats).items():
                    header.set(key, value[0], value[1])
            for key, (value, comment) in criticism_cards.items():
                header.set(key, value, comment)
            write_image_products(
                f"{output_name}_b{i}", images, header, filetypes
            )

    def init_params_from_priors(self, nwalkers, random_state=None,
                                max_tries=1000):
        """Vectorized prior draws over the global layout (see
        MultiComponentModel.init_params_from_priors)."""
        if random_state is None:
            random_state = np.random.RandomState()
        cols = [
            comp.draw_batch(
                nwalkers, random_state=random_state, max_tries=max_tries
            )
            for comp in self._components
        ]
        if not cols:
            return np.zeros((nwalkers, 0))
        return np.concatenate(cols, axis=1)
