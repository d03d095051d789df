"""MultiComponentModel: the user-facing composite model.

API parity with the reference class (reference models.py:16-306):
construction from a component list or model file, parameter-vector
get/set, joint priors, posterior evaluation, the five image synthesis
methods, prior-based walker initialization, and posterior-image
running-mean accumulation.

TPU-first split: the class is a thin host facade over

* a static :class:`ModelSpec` (parameter layout + device constants),
* :class:`PosteriorFns` — the pure jitted posterior / render programs
  that the ensemble sampler vmaps over walkers.

Host-side image methods evaluate the jitted renderer at the current
parameter vector (used by analysis replay); the sampling hot path never
touches this object.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .components import ComponentBase, Configuration
from .posterior import (
    IMAGE_TYPES,
    build_posterior,
    carry_to_reference_images,
)
from .spec import build_model_spec

__all__ = ["MultiComponentModel", "replicate_noise"]


def replicate_noise(rng, conv, spec, sigma):
    """ONE observation-noise replication rule for every mock producer.

    ``simulate`` (single-band, joint, batched) and the PPC replicator
    all draw replicated data through this function so the noise model
    can never drift between the mocks a user inspects and the p-value
    that flags them.  Per ``spec.likelihood``:

    * ``gaussian`` — additive N(0, sigma) at the given sigma map;
    * ``student`` — additive scaled Student-t (static df);
    * ``poisson`` — counts at ``gain * model`` scaled back to
      observation units (``sigma`` ignored; expectations clipped at 0
      — a slightly negative convolved wing has Poisson mean 0).
    """
    kind = getattr(spec, "likelihood", "gaussian")
    if kind == "poisson":
        g = float(getattr(spec, "likelihood_gain", 1.0))
        return rng.poisson(np.maximum(conv, 0.0) * g) / g
    if kind == "student":
        df = float(getattr(spec, "likelihood_df", 4.0))
        noise = rng.standard_t(df, size=conv.shape)
    else:
        noise = rng.randn(*conv.shape)
    return conv + noise * sigma


def as_model(model):
    """Normalize a model argument: prepared instances pass through.

    Accepts a :class:`MultiComponentModel` or
    :class:`~psfmc_tpu.models.joint.JointModel` (anything exposing
    ``posterior_fns`` + ``init_params_from_priors``) unchanged.
    Component lists and model-file paths build a fresh model — and a
    file/list with MULTIPLE ``Configuration`` components builds a
    JointModel, each Configuration starting a new band (the components
    that follow it belong to that band), so joint multi-band fits are
    declarable as ordinary model files::

        Configuration(obs_file='sci_r.fits', ...)   # band 0
        host = Sersic(...)
        host
        Configuration(obs_file='sci_g.fits', ...)   # band 1
        Sersic(xy=Tied(host, 'xy'), ..., mag=Uniform(...))

    The single dispatch rule shared by every driver entry point
    (model_galaxy_mcmc / _evidence / fit_batch).
    """
    if hasattr(model, "posterior_fns") and hasattr(
        model, "init_params_from_priors"
    ):
        return model
    if isinstance(model, str):
        from ..model_parser import component_list_from_file

        try:
            components = component_list_from_file(model)
        except IOError as err:
            raise IOError(
                f"Unable to open model file {model}. Does it exist?"
            ) from err
    else:
        components = list(model)

    n_cfg = sum(isinstance(c, Configuration) for c in components)
    if n_cfg <= 1:
        return MultiComponentModel(components=components)

    # multi-band model file: split into bands at each Configuration
    from .joint import JointModel

    if not isinstance(components[0], Configuration):
        raise ValueError(
            "a multi-band model must start with its first band's "
            "Configuration (components before the first Configuration "
            "have no band to belong to)"
        )
    bands = []
    for comp in components:
        if isinstance(comp, Configuration):
            bands.append([comp])
        else:
            bands[-1].append(comp)
    return JointModel(bands)


def trace_param_matrix(database, param_names):
    """(N, num_params) matrix from a trace database.

    Columns concatenate in the canonical slot order (components in
    model-file order, attributes alphabetical, ``xy`` = 2 slots) — the
    ONE converter every chain-replay consumer (posterior images, PPC,
    WAIC/LOO, sensitivity) shares.
    """
    cols = []
    for name in param_names:
        col = np.asarray(database[name], np.float64)
        if col.ndim == 1:
            col = col[:, None]
        cols.append(col)
    return np.concatenate(cols, axis=1)


def slot_param_names(param_names, param_lens):
    """One display name per SLOT: ``xy`` -> ``xy_x``/``xy_y``.

    Shared by every per-slot results table (SBC ranks, sensitivity
    indices) so they stay in sync with the slot-layout convention.
    """
    lens = param_lens or [1] * len(param_names)
    out = []
    for name, ln in zip(param_names, lens):
        if ln == 1:
            out.append(name)
        elif ln == 2:
            out.extend([f"{name}_x", f"{name}_y"])
        else:
            out.extend(f"{name}_{j}" for j in range(ln))
    return out


class MultiComponentModel:
    """Composite 2D surface-brightness model over a component list.

    :param components: list of Component objects (including a
        Configuration), or the filename of a model-definition file.
    :param dtype: device compute dtype (float32 on TPU).
    """

    def __init__(self, components, dtype=jnp.float32):
        if isinstance(components, str):
            from ..model_parser import component_list_from_file

            try:
                components = component_list_from_file(components)
            except IOError as err:
                raise IOError(
                    f"Unable to open model file {components}. Does it exist?"
                ) from err

        configs = [c for c in components if isinstance(c, Configuration)]
        if not configs:
            raise ValueError(
                "Unable to find the Configuration component, required "
                "for setting up input images."
            )
        if len(configs) > 1:
            import warnings

            warnings.warn(
                f"{len(configs)} Configuration components given to the "
                "single-observation MultiComponentModel — only the "
                "first is used.  For a joint multi-band fit pass the "
                "components through as_model()/model_galaxy_mcmc (each "
                "Configuration starts a band) or build a JointModel."
            )
        self.config = configs[0]

        self.spec = build_model_spec(list(components), config=self.config)
        self.posterior_fns = build_posterior(self.spec, dtype=dtype)

        # Component list in canonical order (file order + PSFSelector last)
        comp_order: List[ComponentBase] = [
            c for c in components if not isinstance(c, Configuration)
        ]
        comp_order.append(self.config.psf_selector)
        self.components = comp_order
        self.obs_header = self.config.obs_header

        from .components import PointSource as _PS

        self.psf_comps = [c for c in comp_order if isinstance(c, _PS)]

        self._param_vector = np.zeros(self.num_params)
        self.posterior_images: Dict[str, np.ndarray] = {}
        self.accumulated_samples = 0
        self.reset_images()

        # Compiled singles live in the posterior's shared program cache —
        # jax.jit caches by callable identity, so per-instance wrappers
        # would silently recompile for every MultiComponentModel over an
        # equivalent posterior.
        progs = self.posterior_fns.programs
        if "render_one" not in progs:
            progs["render_one"] = jax.jit(self.posterior_fns.render_images)
        if "lnpost_imgs_one" not in progs:
            progs["lnpost_imgs_one"] = jax.jit(
                self.posterior_fns.log_posterior_and_images
            )
        self._render_jit = progs["render_one"]
        self._render_batch_jit = self.posterior_fns.batched_render
        self._lnpost_imgs_jit = progs["lnpost_imgs_one"]

    # ------------------------------------------------------------------
    # Parameter-vector plumbing (reference models.py:132-185)
    # ------------------------------------------------------------------
    @property
    def num_params(self) -> int:
        return self.spec.num_params

    @property
    def param_names(self) -> List[str]:
        return list(self.spec.param_names)

    @property
    def param_fits_abbrs(self) -> List[str]:
        return list(self.spec.param_fits_abbrs)

    @property
    def param_lens(self) -> List[int]:
        return list(self.spec.param_lens)

    @property
    def param_values(self):
        """Current values of all parameters, as a dict (debug aid)."""
        split_indexes = np.cumsum(self.param_lens)[:-1]
        split_values = np.split(self._param_vector, split_indexes)
        return dict(zip(self.param_names, split_values))

    @param_values.setter
    def param_values(self, value_vector):
        value_vector = np.asarray(value_vector, dtype=np.float64).ravel()
        if value_vector.size != self.num_params:
            raise ValueError(
                f"Expected {self.num_params} parameters, got {value_vector.size}"
            )
        self._param_vector = value_vector
        start = 0
        for comp in self.components:
            n = comp.num_stochastics()
            comp.set_stochastic_values(value_vector[start : start + n])
            start += n

    def get_distribution(self, param_name):
        for comp in self.components:
            try:
                return comp.get_distribution(param_name)
            except KeyError:
                pass
        return None

    # ------------------------------------------------------------------
    # Priors and posterior
    # ------------------------------------------------------------------
    def log_priors(self) -> float:
        """Joint log-prior at the current (host) parameter values."""
        return float(np.sum([comp.log_priors() for comp in self.components]))

    def log_posterior(self, param_values, **kwargs):
        """Posterior at a parameter vector; returns (lnp, image dict).

        Signature-compatible with the reference static method
        (models.py:193-243) — a ``model=`` kwarg is accepted and ignored
        (the model is ``self``).  For the device-side batched path use
        ``self.posterior_fns.log_posterior`` directly.
        """
        kwargs.pop("model", None)
        theta = jnp.asarray(np.asarray(param_values, dtype=np.float64))
        lnp, imgs = self._lnpost_imgs_jit(theta)
        self.param_values = np.asarray(param_values, dtype=np.float64)
        obs = self.posterior_fns.constants["obs_data"]
        ref_imgs = carry_to_reference_images(imgs, obs)
        return float(lnp), {k: np.asarray(v) for k, v in ref_imgs.items()}

    # ------------------------------------------------------------------
    # Walker initialization (reference models.py:108-130)
    # ------------------------------------------------------------------
    def init_params_from_priors(self, nwalkers, random_state=None,
                                max_tries=1000):
        """Draw walker starting positions from the priors.

        Per component, draws are rejected until the joint component
        prior is finite (e.g. the Sersic ``reff >= reff_b`` constraint),
        with a bounded retry count instead of the reference's possible
        infinite loop.
        """
        if random_state is None:
            random_state = np.random.RandomState()
        # Vectorized per component (ComponentBase.draw_batch): all
        # still-invalid walkers are redrawn together, so init cost is
        # O(retry rounds), not O(walkers).  The per-walker Python loop
        # took 7 s of host time at 608 walkers — longer than the whole
        # 16-target batched TPU fit it was seeding.
        cols = [
            comp.draw_batch(
                nwalkers, random_state=random_state, max_tries=max_tries
            )
            for comp in self.components
        ]
        if not cols:
            return np.zeros((nwalkers, 0))
        return np.concatenate(cols, axis=1)

    # ------------------------------------------------------------------
    # Image synthesis at the current parameter vector
    # (reference models.py:245-306)
    # ------------------------------------------------------------------
    def _current_images(self):
        theta = jnp.asarray(self._param_vector)
        return {
            k: np.asarray(v) for k, v in self._render_jit(theta).items()
        }

    def raw_model_std(self):
        """Per-pixel posterior STD of the raw model over retained
        samples (beyond-reference uncertainty product; available after
        sampling/replay, None otherwise).  Request it with
        ``write_fits=(..., 'raw_model_std')``."""
        return self.posterior_images.get("raw_model_std")

    def raw_model(self):
        """Raw model image (before PSF convolution)."""
        return self._current_images()["raw_model"]

    def convolved_model(self, raw_px=None):
        """PSF-convolved model image."""
        return self._current_images()["convolved_model"]

    def composite_ivm(self, raw_px=None):
        """Composite inverse-variance map (data + convolved model^2)."""
        return self._current_images()["composite_ivm"]

    def residual(self, convolved_px=None, raw_px=None):
        """Residual image: data - convolved model."""
        return self._current_images()["residual"]

    def point_source_subtracted(self):
        """Data minus the convolved point-source components only."""
        return self._current_images()["point_source_subtracted"]

    def simulate(self, theta=None, random_state=None, add_noise=True):
        """Mock observation: PSF-convolved model + observation noise.

        The core of detection/completeness simulations (a standard
        psfMC-family workflow the reference leaves to the user): inject
        a model realization into the observation's noise field and feed
        the result back through a fit.  ``theta=None`` draws the
        parameters from the priors; noise is per-pixel Gaussian at the
        observation's variance map (bad pixels — infinite variance —
        get zero noise, matching how the likelihood masks them).

        :returns: ``(mock_image, theta)`` — (H, W) float64 and the
            (num_params,) parameter vector that generated it.
        """
        rng = (
            random_state
            if isinstance(random_state, np.random.RandomState)
            else np.random.RandomState(random_state)
        )
        if theta is None:
            theta = self.init_params_from_priors(1, random_state=rng)[0]
        theta = np.asarray(theta, np.float64)
        conv = self.render_images_batch(theta[None])["convolved_model"][0]
        mock = np.asarray(conv, np.float64)
        if add_noise:
            sigma = np.sqrt(np.asarray(self.spec.obs_var, np.float64))
            sigma = np.where(np.isfinite(sigma), sigma, 0.0)
            mock = replicate_noise(rng, mock, self.spec, sigma)
        return mock, theta

    def thetas_from_database(self, database, rows=None):
        """(N, num_params) parameter matrix from a trace database."""
        thetas = trace_param_matrix(database, self.param_names)
        return thetas if rows is None else thetas[rows]

    def _replicate(self, database, n, rng):
        """Shared PPC core: n posterior draws, their rendered images
        and replicated datasets from the per-draw noise budget.

        The noise scale is ``1/composite_ivm`` (observation variance
        plus PSF-mismatch variance; exactly 0 at masked pixels, where
        the ivm is 0); Student-t noise when the Configuration uses the
        robust likelihood.  The ONE definition both the user-facing
        mocks and the p-value use — a drift between them would let the
        flag disagree with the pictures it flags.

        Stuck walkers are dropped first (same filter the posterior
        image writer applies): a walker stranded at lnp ~ -1e6 renders
        absurd mocks whose discrepancy statistic swamps the PPC.
        """
        from ..database import filter_lowp_walkers

        database = filter_lowp_walkers(database, percentile=10)
        all_th = self.thetas_from_database(database)
        rows = rng.randint(0, len(all_th), size=n)
        thetas = all_th[rows]
        imgs = self.render_images_batch(thetas)
        conv = np.asarray(imgs["convolved_model"], np.float64)
        ivm = np.asarray(imgs["composite_ivm"], np.float64)
        sigma = np.sqrt(
            np.where(ivm > 0, 1.0 / np.where(ivm > 0, ivm, 1.0), 0.0)
        )
        return thetas, conv, ivm, replicate_noise(
            rng, conv, self.spec, sigma
        )

    def posterior_predictive(self, database, n=100, random_state=None):
        """Posterior-predictive mock observations (beyond the reference).

        Draws ``n`` parameter vectors from the trace, renders each
        convolved model and adds noise from the model's own per-draw
        noise budget (``1/composite_ivm`` — observation variance plus
        PSF-mismatch variance; Student-t noise when the Configuration
        uses the robust likelihood).  These are replicated datasets
        "the fitted model thinks it could have observed" — the raw
        material of Bayesian model criticism.

        :returns: ``(mocks (n, H, W), thetas (n, num_params))``.
        """
        rng = (
            random_state
            if isinstance(random_state, np.random.RandomState)
            else np.random.RandomState(random_state)
        )
        thetas, _conv, _ivm, y_rep = self._replicate(database, n, rng)
        return y_rep, thetas

    def posterior_predictive_pvalue(
        self, database, n=200, random_state=None
    ):
        """Posterior-predictive p-value of the deviance statistic.

        Standard PPC (Gelman et al.): for each posterior draw
        ``theta_i``, compare the observed discrepancy
        ``T(y_obs, theta_i) = sum_good (y - conv_i)^2 * ivm_i`` against
        the same statistic on a replicated dataset drawn from the
        model at ``theta_i``; ``p = P(T_rep >= T_obs)``.  Values near
        0 mean the model cannot produce data as discrepant as the
        observation (misfit); values near 1 mean the model over-covers
        (e.g. inflated variances).  ~0.5 is healthy.
        """
        rng = (
            random_state
            if isinstance(random_state, np.random.RandomState)
            else np.random.RandomState(random_state)
        )
        _thetas, conv, ivm, y_rep = self._replicate(database, n, rng)
        good = (~np.asarray(self.spec.bad_px))[None]
        obs = np.asarray(self.spec.obs_data, np.float64)[None]
        if getattr(self.spec, "likelihood", "gaussian") == "poisson":
            # Poisson deviance: 2 sum(mu - k + k ln(k/mu)); the k=0
            # term is 2 mu (k ln k -> 0)
            g = float(getattr(self.spec, "likelihood_gain", 1.0))
            mu = np.maximum(conv, 0.0) * g

            def _dev(y):
                k = np.maximum(y, 0.0) * g
                ok = good & (mu > 0)
                with np.errstate(divide="ignore", invalid="ignore"):
                    r = np.where(
                        k > 0, k * np.log(np.where(k > 0, k, 1.0)
                                          / np.where(mu > 0, mu, 1.0)),
                        0.0,
                    )
                return 2.0 * np.sum(
                    np.where(ok, mu - k + r, 0.0), axis=(1, 2)
                )

            t_obs = _dev(obs)
            t_rep = _dev(y_rep)
        else:
            t_obs = np.sum(
                np.where(good, (obs - conv) ** 2 * ivm, 0.0), axis=(1, 2)
            )
            t_rep = np.sum(
                np.where(good, (y_rep - conv) ** 2 * ivm, 0.0), axis=(1, 2)
            )
        # (1+k)/(n+2): both ends smoothed, so the estimate can reach
        # neither exact 0 nor exact 1 at finite n
        return float((1 + np.sum(t_rep >= t_obs)) / (n + 2))

    def render_images_batch(self, thetas):
        """Batched renderer: (n, num_params) -> dict of (n, H, W) images.

        TPU-first replacement for the reference's per-row posterior
        replay loop (reference images.py:74-83).
        """
        thetas = jnp.asarray(np.asarray(thetas, dtype=np.float64))
        return {
            k: np.asarray(v)
            for k, v in self._render_batch_jit(thetas).items()
        }

    # ------------------------------------------------------------------
    # Posterior-image accumulation (reference models.py:61-97)
    # ------------------------------------------------------------------
    def reset_images(self):
        shape = self.spec.shape
        self.accumulated_samples = 0
        self.posterior_images = {
            img_type: np.ones(shape, dtype=np.float64)
            for img_type in IMAGE_TYPES
        }

    def accumulate_images(self, sample_images):
        """Accumulate running per-pixel means from a list of image dicts.

        ``composite_ivm`` entries are averaged in variance space then
        re-inverted (reference models.py:74-97).
        """
        post = self.posterior_images
        post["composite_ivm"] = 1.0 / post["composite_ivm"]
        for img_dict in sample_images:
            self.accumulated_samples += 1
            n = self.accumulated_samples
            for img_type, img in img_dict.items():
                img = np.asarray(img, dtype=np.float64)
                if img_type == "composite_ivm":
                    img = 1.0 / img
                post[img_type] = post[img_type] * (n - 1) / n + img / n
        post["composite_ivm"] = 1.0 / post["composite_ivm"]

    def replay_posterior_means(self, thetas, chunk=2048):
        """Posterior-mean images from retained samples, averaged ON
        DEVICE.

        The naive replay fetches every per-sample (chunk, H, W) image
        stack to the host — ~1.3 GB per 2048-row chunk for a 128x128
        model, hundreds of GB for a production chain (it stalled the
        example for 20+ minutes over this box's tunnel).  Here each
        chunk reduces to its carry-image means on device via the
        convolution-linearity shortcut (``ensemble_carry_means``: one
        convolution triple per PSF group per chunk), so the host only
        receives 4 small images per chunk.  Averaging semantics match
        the sampler's on-device accumulation exactly (IVM averaged as
        variance).
        """
        import jax

        fns = self.posterior_fns
        thetas = np.asarray(thetas, np.float64)
        cache = getattr(fns, "programs", None)

        key = ("carry_means_batch",)
        if cache is not None and key in cache:
            means_prog = cache[key]
        else:
            # one shape-polymorphic jit wrapper; jax caches per shape
            means_prog = jax.jit(fns.ensemble_carry_means)
            if cache is not None:
                cache[key] = means_prog

        sums, total = None, 0
        m2_run, mean_run = None, None  # host f64 Chan merge for raw_m2
        for start in range(0, len(thetas), chunk):
            part = thetas[start : start + chunk]
            m = {
                k: np.asarray(v, np.float64)
                for k, v in means_prog(jnp.asarray(part, fns.dtype)).items()
            }
            w = len(part)
            m2_part = m.pop("raw_m2", None)
            if m2_part is not None:
                # Chan parallel merge of the chunk's (mean, M2) into the
                # running pair — same cancellation-free form the device
                # accumulation uses, in f64 on host
                if m2_run is None:
                    m2_run, mean_run = m2_part, m["raw"]
                else:
                    delta = m["raw"] - mean_run
                    m2_run = m2_run + m2_part + delta * delta * (
                        total * w / (total + w)
                    )
                    mean_run = mean_run + delta * (w / (total + w))
            part_sums = {k: v * w for k, v in m.items()}
            sums = (
                part_sums
                if sums is None
                else {k: sums[k] + part_sums[k] for k in sums}
            )
            total += w
        carry = {k: v / total for k, v in sums.items()}
        if m2_run is not None:
            carry["raw_m2"] = m2_run
        obs = np.asarray(self.spec.obs_data)
        self.posterior_images = {
            "raw_model": carry["raw"],
            "convolved_model": carry["conv"],
            "residual": obs - carry["conv"],
            "composite_ivm": 1.0 / carry["var"],
            "point_source_subtracted": obs - carry["ps_conv"],
        }
        self._add_raw_std(carry, total)
        self.accumulated_samples = total
        return self.posterior_images

    def set_accumulated_from_sampler(self, sampler):
        """Adopt the on-device running means from an EnsembleSampler.

        Maps the sampler's independent carry basis (raw, conv, var,
        ps_conv) to the five reference image types, exactly preserving
        the reference's averaging semantics (IVM averaged as variance).
        """
        accum = sampler.accumulated_images
        if accum is None or sampler.accumulated_samples == 0:
            return
        obs = np.asarray(self.spec.obs_data)
        self.posterior_images = {
            "raw_model": accum["raw"].astype(np.float64),
            "convolved_model": accum["conv"].astype(np.float64),
            "residual": obs - accum["conv"],
            "composite_ivm": 1.0 / accum["var"].astype(np.float64),
            "point_source_subtracted": obs - accum["ps_conv"],
        }
        self._add_raw_std(accum, sampler.accumulated_samples)
        self.accumulated_samples = sampler.accumulated_samples

    def _add_raw_std(self, carry, count):
        """Derive the raw-model per-pixel posterior STD product.

        ``raw_m2`` is the Welford sum of squared deviations of the raw
        image over retained samples (Chan-merged on device — every term
        O(std^2), so f32 carries it exactly even where the posterior
        std is 1e-4 of the pixel mean; the naive E[raw^2]-E[raw]^2 form
        is catastrophically cancelled there).  ``sqrt(M2 / n)`` is the
        per-pixel posterior standard deviation of the unconvolved model
        — an uncertainty map the reference cannot produce.  Written
        only when requested (``write_fits=(..., 'raw_model_std')``);
        NaN-poisoned (pre-raw_m2 checkpoint restore) or missing
        accumulators simply withhold the product.
        """
        m2 = carry.get("raw_m2")
        if m2 is None or count < 2:
            return
        m2 = np.asarray(m2, np.float64)
        if not np.all(np.isfinite(m2)):
            return
        self.posterior_images["raw_model_std"] = np.sqrt(
            np.maximum(m2 / count, 0.0)
        )
