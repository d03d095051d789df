"""Batched multi-target fitting: K independent MCMC fits in ONE program.

The reference's flagship production workflow — quasar/host detection and
completeness simulations — fits the *same model* to many mock
observations (inject a source realization into the field's noise, refit,
ask whether it is recovered).  The reference runs those fits serially,
one Python process each (its own parallelism is broken — reference
fitting.py:55).  On TPU the target axis is perfectly data-parallel:
every fit shares the compiled render/convolve/likelihood program and
differs only in its observation plane, so we vmap the *entire*
burn+sample scan over a stacked observation axis and shard that axis
over the device mesh.  One compile, K fits, zero cross-target
communication.

Key design points:

* :meth:`PosteriorFns.log_posterior_obs` evaluates the posterior
  against a *traced* observation (data, variance, good-pixel mask)
  instead of the spec's baked-in one — same renders, same priors.
* Each target runs a full affine-invariant ensemble (the same
  ``_stretch_half`` kernel the production sampler uses), with on-device
  Welford posterior moments and MAP tracking in the scan carry, so the
  device->host transfer per fit is O(num_params), not O(chain).
* ``record_every`` optionally keeps a thinned chain per target for
  convergence diagnostics; by default nothing but the summary leaves
  the device.
* ``mesh=`` shards the target axis (reusing the 1-D walker mesh — each
  device gets whole fits, so the only collective is the final gather of
  the tiny result pytree).

Typical completeness loop::

    model = MultiComponentModel('model_field.py')
    obs, ivm, injected = simulate_stack(model, n_mocks=64, seed=1)
    res = fit_batch(model, obs, ivm, burn=300, iterations=300,
                    mesh=walker_mesh())
    pulls = res.pulls(injected)        # (K, dim) recovery z-scores
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .parallel.multihost import fetch as _fetch
from .parallel.multihost import put_sharded as _put_sharded
from .sampler.ensemble import _stretch_half, welford_batch_update

__all__ = ["BatchFitResult", "fit_batch", "simulate_stack"]


@dataclass
class BatchFitResult:
    """Per-target posterior summaries from :func:`fit_batch`.

    All arrays are host numpy with leading axis K (targets).
    """

    param_names: List[str]
    mean: np.ndarray  # (K, dim) posterior means (all retained steps)
    std: np.ndarray  # (K, dim) posterior stds
    map_theta: np.ndarray  # (K, dim) best retained sample per target
    map_lnp: np.ndarray  # (K,) its log-posterior
    acceptance: np.ndarray  # (K,) mean acceptance fraction (retained)
    param_lens: Optional[List[int]] = None  # slots per name (xy=2)
    chains: Optional[np.ndarray] = None  # (K, nrec, nwalkers, dim)
    lnprob: Optional[np.ndarray] = None  # (K, nrec, nwalkers)

    @property
    def num_targets(self) -> int:
        return self.mean.shape[0]

    def pulls(self, injected) -> np.ndarray:
        """(recovered mean - injected) / posterior std, per target/param.

        The completeness-simulation bottom line: well-calibrated
        recoveries have pulls ~ N(0, 1) per parameter.
        """
        injected = np.asarray(injected, np.float64)
        if injected.shape != self.mean.shape:
            raise ValueError(
                f"injected shape {injected.shape} != {self.mean.shape}"
            )
        return (self.mean - injected) / np.maximum(self.std, 1e-300)

    def psrf(self) -> np.ndarray:
        """Gelman-Rubin R-hat per target/param from the recorded chains.

        Each walker is one chain (the standard ensemble-sampler R-hat
        convention).  Requires ``record_every`` to have been set;
        values near 1 indicate converged retained sampling.
        """
        if self.chains is None:
            raise ValueError(
                "psrf() needs recorded chains: call fit_batch with "
                "record_every > 0"
            )
        from .analysis.statistics import potential_scale_reduction

        k, _nrec, nwalkers, dim = self.chains.shape
        out = np.empty((k, dim))
        for t in range(k):
            for p in range(dim):
                out[t, p] = potential_scale_reduction(
                    [self.chains[t, :, w, p] for w in range(nwalkers)]
                )
        return out


def _as_model(model):
    from .models.multicomponent import as_model

    return as_model(model)


def prepare_obs_stack(spec, obs_stack, ivm_stack, dtype=np.float32):
    """Stacked observations -> the traced-obs dict fit_batch consumes.

    Per-target bad pixels (non-finite data/ivm, ivm <= 0 — reference
    utils.py:54-79 semantics) are unioned with the template spec's
    static bad-pixel mask (which carries any region-file exclusions),
    so mocks of the same field inherit its masking.
    """
    obs_stack = np.asarray(obs_stack, np.float64)
    ivm_stack = np.asarray(ivm_stack, np.float64)
    if obs_stack.ndim != 3 or obs_stack.shape != ivm_stack.shape:
        raise ValueError(
            "obs_stack and ivm_stack must both be (K, H, W); got "
            f"{obs_stack.shape} and {ivm_stack.shape}"
        )
    if obs_stack.shape[1:] != tuple(spec.shape):
        raise ValueError(
            f"target shape {obs_stack.shape[1:]} != model shape "
            f"{tuple(spec.shape)}"
        )
    bad = (
        ~np.isfinite(obs_stack)
        | ~np.isfinite(ivm_stack)
        | (ivm_stack <= 0)
        | np.asarray(spec.bad_px)[None]
    )
    if getattr(spec, "likelihood", "gaussian") == "poisson":
        # same eager check build_model_spec runs for the baked obs:
        # negative good-pixel counts have no Poisson density, and the
        # device math would silently evaluate nonsense
        neg = (~bad) & (obs_stack < 0)
        if neg.any():
            k_bad = int(np.flatnonzero(neg.any(axis=(1, 2)))[0])
            raise ValueError(
                "likelihood='poisson' needs non-negative data at every "
                f"good pixel, but target {k_bad} has min "
                f"{obs_stack[k_bad][neg[k_bad]].min():.4g} — mask the "
                "offending pixels (ivm 0) or use gaussian/student"
            )
    with np.errstate(divide="ignore"):
        var = np.where(bad, np.inf, 1.0 / np.where(bad, 1.0, ivm_stack))
    return {
        "obs_data": np.where(bad, 0.0, obs_stack).astype(dtype),
        "obs_var": var.astype(dtype),
        "good_px": ~bad,
    }


def prepare_psf_stack(spec, psf_stack, psfivm_stack, oversample=1,
                      dtype=np.float32):
    """Per-target PSF stacks -> traced obs-dict spectra entries.

    Survey mode: every target brings its own PSF star (the common HST/
    JWST quasar-host workflow — one PSF per pointing), while the model
    structure stays shared so the whole batch runs as ONE compiled
    program.  Each target's PSFs go through exactly the preprocessing
    the baked template PSF does (normalization, IVM->variance
    propagation, inter-PSF mismatch variance, oversample binning,
    conv_pad-aware FFT) by building a throwaway
    :class:`~psfmc_tpu.models.components.PSFSelector` per target and
    FFT'ing it with the spec-shared helper
    (:func:`psfmc_tpu.models.spec.psf_spectra_for_selector`).

    :param spec: the template ModelSpec (band spec for joint models).
    :param psf_stack: length-K sequence; each entry one PSF (``(h, w)``
        array or FITS filename) or a LIST of ``spec.num_psfs`` PSFs
        when the template samples a stochastic PSF index.  A ``(K, h,
        w)`` array works too.
    :param psfivm_stack: inverse-variance maps, same structure.
    :param oversample: PSF oversampling factor (block-binned down,
        flux-preserving — Configuration ``psf_oversample`` semantics).
    :returns: ``{"psf_f_re"/"psf_f_im": (K, num_psfs, Hf, Wf) float,
        "var_f_re"/"var_f_im": ...}`` ready to merge into the fit's obs
        dict.  Spectra ride as SEPARATE real/imag planes because
        complex host->device transfer is UNIMPLEMENTED on the axon TPU
        backend (h2d is async — the failure only surfaced at the next
        blocking fetch, measured 2026-08-20); the posterior reassembles
        ``lax.complex`` inside jit, which costs nothing.
    """
    from .models.components import PSFSelector
    from .models.spec import psf_spectra_for_selector

    cdtype = (
        np.complex64 if np.dtype(dtype) == np.float32 else np.complex128
    )
    npsf = int(getattr(spec, "num_psfs", 1))
    if len(psf_stack) != len(psfivm_stack):
        raise ValueError(
            f"psf_stack and psfivm_stack disagree on target count: "
            f"{len(psf_stack)} vs {len(psfivm_stack)}"
        )
    conv_pad = int(getattr(spec, "conv_pad", 0))
    fs, vs = [], []
    for p, i in zip(psf_stack, psfivm_stack):
        if not isinstance(p, (list, tuple)):
            p, i = [p], [i]
        if len(p) != npsf:
            raise ValueError(
                f"each target needs {npsf} PSF(s) to match the "
                f"template's stochastic index; got {len(p)}"
            )
        sel = PSFSelector(list(p), list(i), spec.shape,
                          oversample=oversample)
        f, v = psf_spectra_for_selector(sel, spec.shape, conv_pad)
        fs.append(f)
        vs.append(v)
    f_all = np.asarray(np.stack(fs), cdtype)
    v_all = np.asarray(np.stack(vs), cdtype)
    rdtype = np.dtype(dtype)
    return {
        "psf_f_re": np.ascontiguousarray(f_all.real, rdtype),
        "psf_f_im": np.ascontiguousarray(f_all.imag, rdtype),
        "var_f_re": np.ascontiguousarray(v_all.real, rdtype),
        "var_f_im": np.ascontiguousarray(v_all.imag, rdtype),
    }


def _lnpost_obs_for(fns):
    """theta, traced-obs-dict -> lnpost; single-band or joint.

    Joint posteriors (``band_fns`` attribute) take a FLAT obs dict with
    ``b{i}_``-prefixed keys (one data plane per band): the global slot
    prior evaluates once, each band adds its own constraints +
    likelihood — the same decomposition the baked-constant joint
    posterior uses.
    """
    band_fns = getattr(fns, "band_fns", None)
    if band_fns is None:
        return fns.log_posterior_obs

    from .models.posterior import make_log_prior

    slot_prior = make_log_prior(fns.spec.slots, [], fns.dtype)

    def lnpost_obs(theta, obs):
        theta = jnp.asarray(theta, fns.dtype)
        lp = slot_prior(theta)
        tot = lp
        for i, f in enumerate(band_fns):
            ob = {
                key: obs[f"b{i}_{key}"]
                for key in ("obs_data", "obs_var", "good_px")
            }
            # optional per-target PSF spectra (survey mode); dict
            # membership is static per trace, so this is free
            for key in ("psf_f", "var_f", "psf_f_re", "psf_f_im",
                        "var_f_re", "var_f_im"):
                if f"b{i}_{key}" in obs:
                    ob[key] = obs[f"b{i}_{key}"]
            tot = tot + f.log_posterior_obs(theta, ob)
        out = jnp.where(jnp.isfinite(lp), tot, -jnp.inf)
        return jnp.where(jnp.isnan(out), -jnp.inf, out)

    return lnpost_obs


def _make_single_fit(
    fns, nwalkers, dim, burn, iterations, a, moves, de_gamma0, record_every
):
    """Pure (key, p0, obs) -> result pytree for ONE target's full fit."""
    half = nwalkers // 2
    lnpost_obs = _lnpost_obs_for(fns)

    def lnpost_batch(thetas, obs):
        out = jax.vmap(lambda th: lnpost_obs(th, obs))(thetas)
        # pin the compute dtype: under x64 (tests) the prior term can
        # promote to f64, which would mismatch the f32 scan carry
        return out.astype(fns.dtype)

    def make_step(obs, track):
        def step(carry, _):
            pos, lnp, naccept, key, mom, best_lnp, best_theta = carry
            key, k0, k1, km = jax.random.split(key, 4)
            if moves == "stretch":
                use_de = None
            elif moves == "de":
                use_de = jnp.asarray(True)
            else:  # mixed: both halves of a step use the same move
                use_de = jax.random.bernoulli(km)
            batch = lambda th: lnpost_batch(th, obs)  # noqa: E731
            p0h, l0, acc0 = _stretch_half(
                k0, pos[:half], lnp[:half], pos[half:], batch, a, dim,
                use_de=use_de, gamma0=de_gamma0,
            )
            p1h, l1, acc1 = _stretch_half(
                k1, pos[half:], lnp[half:], p0h, batch, a, dim,
                use_de=use_de, gamma0=de_gamma0,
            )
            pos = jnp.concatenate([p0h, p1h], axis=0)
            lnp = jnp.concatenate([l0, l1], axis=0)
            naccept = naccept + (jnp.sum(acc0) + jnp.sum(acc1)).astype(
                jnp.int32
            )
            if track:
                mom = welford_batch_update(mom, pos)
                m = jnp.argmax(lnp)
                better = lnp[m] > best_lnp
                best_lnp = jnp.where(better, lnp[m], best_lnp)
                best_theta = jnp.where(better, pos[m], best_theta)
            out = (pos, lnp) if (track and record_every) else None
            return (pos, lnp, naccept, key, mom, best_lnp, best_theta), out

        return step

    def run(key, p0, obs):
        p0 = jnp.asarray(p0, fns.dtype)
        lnp0 = lnpost_batch(p0, obs)
        mom = {
            "mean": jnp.zeros(dim, fns.dtype),
            "m2": jnp.zeros(dim, fns.dtype),
            "n": jnp.zeros((), jnp.int32),
        }
        carry = (
            p0,
            lnp0,
            jnp.zeros((), jnp.int32),
            key,
            mom,
            jnp.asarray(-jnp.inf, fns.dtype),
            jnp.zeros(dim, fns.dtype),
        )
        carry, _ = jax.lax.scan(
            make_step(obs, track=False), carry, None, length=burn
        )
        # retained phase: reset acceptance so the reported fraction
        # covers retained steps only (matches sampler.reset() semantics)
        carry = carry[:2] + (jnp.zeros((), jnp.int32),) + carry[3:]
        step = make_step(obs, track=True)
        if record_every:
            def outer(c, _):
                c, _ = jax.lax.scan(step, c, None, length=record_every)
                return c, (c[0], c[1])

            carry, (chain, lnprob) = jax.lax.scan(
                outer, carry, None, length=iterations // record_every
            )
        else:
            carry, _ = jax.lax.scan(step, carry, None, length=iterations)
            chain = lnprob = None
        _pos, _lnp, naccept, _key, mom, best_lnp, best_theta = carry
        n = jnp.maximum(mom["n"], 1)
        mean = mom["mean"]
        var = mom["m2"] / jnp.maximum(n - 1, 1).astype(fns.dtype)
        out = {
            "mean": mean,
            "std": jnp.sqrt(var),
            "map_theta": best_theta,
            "map_lnp": best_lnp,
            "acceptance": naccept.astype(jnp.float32)
            / np.float32(iterations * nwalkers),
        }
        if record_every:
            out["chain"] = chain
            out["lnprob"] = lnprob
        return out

    return run


def fit_batch(
    model,
    obs_stack,
    ivm_stack,
    nwalkers=None,
    burn=500,
    iterations=500,
    seed=0,
    a=2.0,
    moves="stretch",
    de_gamma0=None,
    record_every=0,
    mesh=None,
    chunk=None,
    psf_stack=None,
    psfivm_stack=None,
    psf_oversample=1,
):
    """Fit the model independently to K stacked observations at once.

    :param model: a MultiComponentModel, a component list, a
        model-file path, or a :class:`psfmc_tpu.models.JointModel`.
        The model's Configuration(s) supply the PSF, mask, zeropoint
        and image geometry shared by every target; their own
        observations are only templates.
    :param obs_stack: (K, H, W) observed images — or, for a joint
        model, a LIST of one (K, H_b, W_b) stack per band
        (``simulate_stack`` returns the right structure either way).
    :param ivm_stack: inverse-variance maps, same structure as
        ``obs_stack`` (reference obsivm_file semantics,
        utils.py:54-79).
    :param nwalkers: walkers per target (default ``2*dim + 2`` rounded
        even, the reference default — reference fitting.py:52-53).
    :param burn / iterations: steps per phase, every target alike.
    :param moves: ``'stretch'`` | ``'de'`` | ``'mixed'`` — same proposal
        families as :class:`EnsembleSampler`.
    :param record_every: if > 0, also return chains thinned by this
        factor (must divide ``iterations``); default records nothing
        and ships only O(dim) summaries per target.
    :param mesh: optional :func:`psfmc_tpu.parallel.walker_mesh` — the
        TARGET axis is sharded over it (each device runs whole fits).
        K is padded up to a mesh multiple internally; results are
        trimmed back.
    :param chunk: targets per compiled program call.  The measured
        per-chip sweet spot is ~16-32 flagship targets (larger batches
        go HBM-bound); very large K should set ``chunk`` so every
        chunk reuses one compiled program shape and device memory stays
        bounded.  Rounded up to a mesh multiple.  Default: all K in
        one call.
    :param psf_stack: optional per-target PSFs (survey mode — each
        target observed with its own PSF star): length-K sequence of
        ``(h, w)`` arrays/filenames (or per-target LISTS of
        ``num_psfs`` PSFs under a stochastic index), or a per-band
        LIST of such for joint models (a ``None`` entry keeps that
        band's template PSF).  See :func:`prepare_psf_stack`.  Without
        it every target shares the template Configuration's PSF.
    :param psfivm_stack: PSF inverse-variance maps, same structure;
        required with ``psf_stack``.
    :param psf_oversample: per-target PSF oversampling factor.
    :returns: :class:`BatchFitResult`.
    """
    model = _as_model(model)
    fns = model.posterior_fns
    spec = model.spec
    dim = spec.num_params
    if nwalkers is None:
        nwalkers = 2 * dim + 2  # reference default; always even
    if nwalkers % 2:
        raise ValueError("nwalkers must be even for half-ensemble moves")
    if moves not in ("stretch", "de", "mixed"):
        raise ValueError(
            f"unknown moves {moves!r}: expected 'stretch', 'de' or 'mixed'"
        )
    if record_every and iterations % record_every:
        raise ValueError(
            f"iterations={iterations} not divisible by "
            f"record_every={record_every}"
        )

    if (psf_stack is None) != (psfivm_stack is None):
        raise ValueError(
            "psf_stack and psfivm_stack must be given together"
        )

    band_specs = getattr(spec, "band_specs", None)
    if band_specs is None:
        obs = prepare_obs_stack(
            spec, obs_stack, ivm_stack, np.dtype(fns.dtype)
        )
        k_real = obs["obs_data"].shape[0]
        if psf_stack is not None:
            psf = prepare_psf_stack(
                spec, psf_stack, psfivm_stack, psf_oversample,
                np.dtype(fns.dtype),
            )
            if psf["psf_f_re"].shape[0] != k_real:
                raise ValueError(
                    f"psf_stack target count {psf['psf_f_re'].shape[0]} "
                    f"!= obs target count {k_real}"
                )
            obs.update(psf)
    else:
        # joint model: one (K, H_b, W_b) stack per band, flattened into
        # b{i}_-prefixed keys so the chunk/shard plumbing is unchanged
        if len(obs_stack) != len(band_specs) or len(ivm_stack) != len(
            band_specs
        ):
            raise ValueError(
                f"joint fit_batch needs one obs/ivm stack per band "
                f"({len(band_specs)}), got {len(obs_stack)}/"
                f"{len(ivm_stack)}"
            )
        if psf_stack is not None and len(psf_stack) != len(band_specs):
            raise ValueError(
                f"joint fit_batch needs one psf_stack per band "
                f"({len(band_specs)}; None keeps that band's template "
                f"PSF), got {len(psf_stack)}"
            )
        obs = {}
        k_real = None
        for i, (bs, ob, iv) in enumerate(
            zip(band_specs, obs_stack, ivm_stack)
        ):
            d = prepare_obs_stack(bs, ob, iv, np.dtype(fns.dtype))
            if psf_stack is not None and psf_stack[i] is not None:
                if psfivm_stack[i] is None:
                    raise ValueError(
                        f"band {i}: psf_stack entry needs a matching "
                        "psfivm_stack entry"
                    )
                p = prepare_psf_stack(
                    bs, psf_stack[i], psfivm_stack[i], psf_oversample,
                    np.dtype(fns.dtype),
                )
                if p["psf_f_re"].shape[0] != d["obs_data"].shape[0]:
                    raise ValueError(
                        f"band {i}: psf_stack target count "
                        f"{p['psf_f_re'].shape[0]} != obs target count "
                        f"{d['obs_data'].shape[0]}"
                    )
                d.update(p)
            k = d["obs_data"].shape[0]
            if k_real is None:
                k_real = k
            elif k != k_real:
                raise ValueError(
                    f"bands disagree on target count: {k_real} vs {k}"
                )
            for key, v in d.items():
                obs[f"b{i}_{key}"] = v

    # chunking: every chunk runs the SAME compiled program shape.  The
    # per-chunk target count is padded to a mesh multiple (each device
    # gets whole fits); the final short chunk pads by repeating its
    # last target, trimmed off the concatenated results below.
    quantum = int(mesh.devices.size) if mesh is not None else 1
    per_chunk = k_real if chunk is None else min(int(chunk), k_real)
    per_chunk = max(quantum, int(np.ceil(per_chunk / quantum) * quantum))

    run = _make_single_fit(
        fns, nwalkers, dim, int(burn), int(iterations), a, moves,
        de_gamma0, int(record_every),
    )

    cache = getattr(fns, "programs", None)
    cache_key = (
        "batchfit", per_chunk, nwalkers, dim, int(burn), int(iterations),
        a, moves, de_gamma0, int(record_every),
    )
    if cache is not None and cache_key in cache:
        prog = cache[cache_key]
    else:
        prog = jax.jit(jax.vmap(run))
        if cache is not None:
            cache[cache_key] = prog

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from .parallel.mesh import WALKER_AXIS

        def place(arr, extra_dims):
            sh = NamedSharding(
                mesh, PartitionSpec(WALKER_AXIS, *([None] * extra_dims))
            )
            return _put_sharded(np.asarray(arr), sh)
    else:
        def place(arr, _extra_dims):
            return arr

    rng = np.random.RandomState(seed)
    base_key = jax.random.PRNGKey(seed)
    outs = []
    for start in range(0, k_real, per_chunk):
        sl = slice(start, min(start + per_chunk, k_real))
        chunk_obs = {key: v[sl] for key, v in obs.items()}
        pad = per_chunk - (sl.stop - sl.start)
        if pad:
            chunk_obs = {
                key: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                for key, v in chunk_obs.items()
            }
        p0 = model.init_params_from_priors(
            per_chunk * nwalkers, random_state=rng
        ).reshape(per_chunk, nwalkers, dim)
        keys = jax.random.split(
            jax.random.fold_in(base_key, start), per_chunk
        )
        out = prog(
            place(np.asarray(keys), 1),
            place(p0, 2),
            {key: place(v, 2) for key, v in chunk_obs.items()},
        )
        outs.append(
            jax.tree_util.tree_map(
                lambda x: _fetch(x)[: per_chunk - pad], out
            )
        )

    merged = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *outs
    )
    res = BatchFitResult(
        param_names=list(spec.param_names),
        mean=np.asarray(merged["mean"], np.float64),
        std=np.asarray(merged["std"], np.float64),
        map_theta=np.asarray(merged["map_theta"], np.float64),
        map_lnp=np.asarray(merged["map_lnp"], np.float64),
        acceptance=np.asarray(merged["acceptance"], np.float64),
        param_lens=list(spec.param_lens),
    )
    if record_every:
        res.chains = merged["chain"]
        res.lnprob = merged["lnprob"]
    return res


def completeness_fraction(
    res: BatchFitResult,
    injected,
    param,
    bins=8,
    recovered=None,
):
    """Recovered fraction binned by an injected parameter value.

    The completeness-curve bottom line of an injection study: what
    fraction of sources injected at a given magnitude (or size, ...)
    does the fit recover?

    :param param: parameter name (e.g. ``'1_PointSource_mag'``) whose
        INJECTED value defines the binning axis; must be a scalar slot.
    :param bins: bin count, or an explicit bin-edge array.
    :param recovered: predicate ``(res, injected) -> (K,) bool``.
        The default calls a target recovered when the named parameter's
        posterior pull is within 3 and its std is smaller than the
        prior draw spread (i.e. the data, not the prior, constrained
        it).  Real studies should pass their own detection criterion —
        this default is a sensible starting point, not a standard.
    :returns: ``(bin_centers, fraction, counts)`` — fraction is NaN for
        empty bins.
    """
    injected = np.asarray(injected, np.float64)
    lens = res.param_lens or [1] * len(res.param_names)
    offs = np.concatenate([[0], np.cumsum(lens)])
    try:
        i = res.param_names.index(param)
    except ValueError:
        raise ValueError(
            f"unknown parameter {param!r}: expected one of "
            f"{res.param_names}"
        ) from None
    if lens[i] != 1:
        raise ValueError(f"{param!r} is a vector slot; bin on a scalar")
    col = offs[i]
    x = injected[:, col]

    if recovered is None:
        pull = (res.mean[:, col] - x) / np.maximum(res.std[:, col], 1e-300)
        spread = np.std(x) if len(x) > 1 else np.inf
        ok = (np.abs(pull) < 3.0) & (res.std[:, col] < max(spread, 1e-12))
    else:
        ok = np.asarray(recovered(res, injected), bool)

    edges = (
        np.histogram_bin_edges(x, bins=bins)
        if np.isscalar(bins)
        else np.asarray(bins, np.float64)
    )
    idx = np.clip(np.digitize(x, edges) - 1, 0, len(edges) - 2)
    counts = np.bincount(idx, minlength=len(edges) - 1)
    hits = np.bincount(idx, weights=ok.astype(float),
                       minlength=len(edges) - 1)
    with np.errstate(invalid="ignore"):
        frac = np.where(counts > 0, hits / np.maximum(counts, 1), np.nan)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return centers, frac, counts


def save_batch_results(res: BatchFitResult, path, injected=None):
    """Write a batch-fit catalog as a FITS binary table.

    One row per target; per parameter-slot columns ``<name>_mean``,
    ``<name>_std``, ``<name>_map`` (vector slots like ``xy`` stay
    2-wide columns), plus ``lnp_map`` and ``acceptance``.  With
    ``injected`` given, ``<name>_true`` and ``<name>_pull`` columns
    record the completeness-simulation truth and recovery z-scores.
    IO is gated on process 0 (multi-host safe) like the trace database.
    """
    from collections import OrderedDict

    from .io.table import Table
    from .parallel.multihost import barrier, is_primary

    cols = OrderedDict()
    lens = res.param_lens
    if lens is None:
        # only safe when every slot is scalar — a silent all-ones
        # fallback would shift every column after a 2-wide xy slot
        if len(res.param_names) != res.mean.shape[1]:
            raise ValueError(
                "BatchFitResult.param_lens is required when parameter "
                "slots are not all scalar (found "
                f"{len(res.param_names)} names for {res.mean.shape[1]} "
                "slots)"
            )
        lens = [1] * len(res.param_names)
    pulls = res.pulls(injected) if injected is not None else None
    off = 0
    for name, size in zip(res.param_names, lens):
        sl = slice(off, off + size)

        def col(arr):
            block = np.asarray(arr[:, sl], np.float64)
            return block[:, 0] if size == 1 else block

        cols[f"{name}_mean"] = col(res.mean)
        cols[f"{name}_std"] = col(res.std)
        cols[f"{name}_map"] = col(res.map_theta)
        if injected is not None:
            cols[f"{name}_true"] = col(np.asarray(injected, np.float64))
            cols[f"{name}_pull"] = col(pulls)
        off += size
    cols["lnp_map"] = np.asarray(res.map_lnp, np.float64)
    cols["acceptance"] = np.asarray(res.acceptance, np.float64)
    meta = OrderedDict(
        [
            ("NTARGETS", (res.num_targets, "batch-fit targets")),
            (
                "MCINJECT",
                (injected is not None, "injected truth recorded"),
            ),
        ]
    )
    if is_primary():
        Table(cols, meta=meta).write(path, extname="BATCHFIT")
    barrier("save_batch_results")  # file visible before any host returns


def load_batch_results(path):
    """Read a :func:`save_batch_results` catalog back as a Table."""
    from .io.table import Table

    return Table.read(path, extname="BATCHFIT")


def simulate_stack(model, n_mocks, seed=0, thetas=None, add_noise=True):
    """K mock observations through the framework's own renderer.

    Batched equivalent of ``MultiComponentModel.simulate`` (which this
    reuses semantically: mock = PSF-convolved model + Gaussian noise at
    the observation's variance map; never a parallel reimplementation
    of the renderer — see the round-2 mode-swap lesson).  The returned
    ivm stack is the template observation's ivm (mocks inherit the
    field's noise model and bad pixels).

    :returns: ``(obs_stack (K,H,W) f64, ivm_stack (K,H,W) f64,
        thetas (K, dim) f64)``.
    """
    model = _as_model(model)
    spec = model.spec
    rng = np.random.RandomState(seed)
    if thetas is None:
        thetas = model.init_params_from_priors(n_mocks, random_state=rng)
    thetas = np.asarray(thetas, np.float64)
    if thetas.shape != (n_mocks, spec.num_params):
        raise ValueError(
            f"thetas shape {thetas.shape} != ({n_mocks}, {spec.num_params})"
        )

    def _mock_band(conv_batch, var, spec_b):
        from .models.multicomponent import replicate_noise

        obs = np.asarray(conv_batch, np.float64)
        if add_noise:
            sigma = np.where(np.isfinite(var), np.sqrt(var), 0.0)
            obs = replicate_noise(rng, obs, spec_b, sigma[None])
        with np.errstate(divide="ignore"):
            ivm = np.where(np.isfinite(var) & (var > 0), 1.0 / var, 0.0)
        return obs, np.broadcast_to(ivm, obs.shape).copy()

    band_specs = getattr(spec, "band_specs", None)
    if band_specs is not None:
        # joint model: one mock stack per band at the SAME thetas.
        # Batched renders are jitted once and cached on the posterior's
        # shared program cache (an eager vmap would re-trace and
        # dispatch op-by-op on every call).
        fns = model.posterior_fns
        th = jnp.asarray(thetas, fns.dtype)
        obs_list, ivm_list = [], []
        for i, (bs, f) in enumerate(zip(band_specs, fns.band_fns)):
            key = ("joint_conv_batch", i)
            prog = fns.programs.get(key)
            if prog is None:
                prog = jax.jit(
                    jax.vmap(lambda t, _f=f: _f._images_impl(t)["conv"])
                )
                fns.programs[key] = prog
            conv = np.asarray(prog(th))
            ob, iv = _mock_band(
                conv, np.asarray(bs.obs_var, np.float64), bs
            )
            obs_list.append(ob)
            ivm_list.append(iv)
        return obs_list, ivm_list, thetas

    conv = model.render_images_batch(thetas)["convolved_model"]
    obs, ivm_stack = _mock_band(
        conv, np.asarray(spec.obs_var, np.float64), spec
    )
    return obs, ivm_stack, thetas
