"""JIT-compiled affine-invariant ensemble sampler (Goodman & Weare 2010).

This replaces the reference's external emcee 2.2.1 dependency (reference
fitting.py:56-94) with a TPU-native sampler:

* emcee 2.x stretch-move semantics — ``a=2`` by default, red/black
  half-ensemble updates, ``z = ((a-1)u + 1)^2 / a``, acceptance ratio
  ``(dim-1) ln z + lnp(Y) - lnp(X)`` — statistically identical moves,
* the posterior is evaluated **vmapped over the whole half-ensemble**
  per half-step: renders, convolutions and likelihood reductions all
  run as one batched XLA computation,
* ``lax.scan`` over steps: the entire burn or sampling phase is a single
  device program; the chain lands in device memory and is fetched once,
* posterior-image running means accumulate **on device** in the scan
  carry (replacing the reference's emcee "blobs" machinery,
  models.py:74-97 / fitting.py:83).  Because the carry images are
  deterministic functions of the positions, they are *recomputed* from
  the current ensemble once per retained step rather than carried
  per-walker through the accept/reject selects — same retained-sample
  semantics as the reference, at a fraction of the HBM traffic (the
  per-walker image carry was 0.5 GB of scan state at 2000 walkers),
* optional walker-axis sharding: positions carry a ``NamedSharding``
  over the mesh's walker axis; the complementary-half partner gather
  becomes the one tiny ICI all-gather per half-step (SURVEY.md section 5
  "distributed communication backend").

PRNG: ``jax.random`` throughout — reproducible given a seed, independent
of host state.
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..parallel.multihost import fetch as _fetch
from ..parallel.multihost import put_sharded as _put_sharded

__all__ = ["EnsembleState", "EnsembleSampler", "run_stretch_move"]


@dataclass
class EnsembleState:
    """Device-side sampler state (a pytree)."""

    positions: jax.Array  # (nwalkers, dim)
    log_prob: jax.Array  # (nwalkers,)
    accum: Optional[Dict[str, jax.Array]]  # running-mean images or None
    accum_count: jax.Array  # scalar int32: accumulated samples
    naccept: jax.Array  # (nwalkers,) int32 accepted moves per walker
    key: jax.Array
    # optional on-device posterior moments: {"mean","m2","n"} (Welford);
    # cover EVERY retained step even under chain thinning
    moments: Optional[Dict[str, jax.Array]] = None


jax.tree_util.register_pytree_node(
    EnsembleState,
    lambda s: (
        (
            s.positions,
            s.log_prob,
            s.accum,
            s.accum_count,
            s.naccept,
            s.key,
            s.moments,
        ),
        None,
    ),
    lambda _aux, ch: EnsembleState(*ch),
)


def welford_batch_update(moments, batch):
    """Merge a (nbatch, dim) sample batch into Welford running moments.

    Chan et al. parallel-merge form: the batch's own mean/M2 are
    computed first (a single f32 reduction over walkers is exact
    enough), then merged into the carry — so carry error grows with the
    number of STEPS, not samples.  Final statistics should still be
    computed in f64 from the chain when bit-accuracy matters (the
    analysis layer does); these on-device moments exist so production-
    scale runs can monitor posteriors without shipping the chain d2h.
    """
    nb = batch.shape[0]
    bmean = jnp.mean(batch, axis=0)
    bm2 = jnp.sum((batch - bmean) ** 2, axis=0)
    n = moments["n"]
    n_new = n + nb
    delta = bmean - moments["mean"]
    ratio = (n.astype(batch.dtype) * nb) / n_new.astype(batch.dtype)
    mean = moments["mean"] + delta * (nb / n_new.astype(batch.dtype))
    m2 = moments["m2"] + bm2 + delta * delta * ratio
    return {"mean": mean, "m2": m2, "n": n_new}


def _stretch_half(key, active_pos, active_lnp, comp_pos, lnpost_batch, a, dim,
                  use_de=None, gamma0=None):
    """Update one half-ensemble against its complement.

    ``lnpost_batch`` evaluates the whole half-ensemble at once — either
    a vmapped log_posterior or the posterior's fused Pallas batch path.
    Returns (new_pos, new_lnp, accepted_count_per_walker).

    ``use_de`` (a traced bool scalar or None) selects a differential-
    evolution proposal (ter Braak 2006 / emcee-3 DEMove semantics)
    instead of the stretch move for this half-step: ``Y = X + gamma *
    (C_r1 - C_r2)`` with two distinct complementary walkers, ``gamma =
    gamma0 = 2.38/sqrt(2 dim)`` (90%) or 1 (10%, mode-jumping), small
    multiplicative jitter; symmetric, so plain Metropolis acceptance.
    Both candidate proposals are a handful of vector ops — the
    selection costs no extra posterior evaluations.  DE moves travel
    along the ensemble's own difference vectors, which cuts the
    autocorrelation of strongly correlated (flux-sharing) posterior
    directions that stretch moves random-walk across.
    """
    k = active_pos.shape[0]
    m = comp_pos.shape[0]
    key_z, key_r, key_u, key_r2, key_g, key_j = jax.random.split(key, 6)

    u = jax.random.uniform(key_z, (k,), active_pos.dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    partner = jax.random.randint(key_r, (k,), 0, m)
    c = comp_pos[partner]  # gather; all-gather over mesh when sharded
    proposal = c + z[:, None] * (active_pos - c)
    log_extra = (dim - 1.0) * jnp.log(z)

    if use_de is not None:
        # distinct second partner: shift by 1..m-1 (mod m)
        partner2 = jnp.mod(
            partner + 1 + jax.random.randint(key_r2, (k,), 0, m - 1), m
        )
        c2 = comp_pos[partner2]
        g0 = jnp.asarray(
            gamma0 if gamma0 is not None else 2.38 / np.sqrt(2.0 * dim),
            active_pos.dtype,
        )
        jump = jax.random.uniform(key_g, (k,), active_pos.dtype) < 0.1
        jitter = 1.0 + 1e-5 * jax.random.normal(key_j, (k,),
                                                active_pos.dtype)
        gamma = jnp.where(jump, 1.0, g0) * jitter
        de_proposal = active_pos + gamma[:, None] * (c - c2)
        proposal = jnp.where(use_de, de_proposal, proposal)
        log_extra = jnp.where(use_de, jnp.zeros_like(log_extra), log_extra)

    prop_lnp = lnpost_batch(proposal)

    log_ratio = log_extra + prop_lnp - active_lnp
    accept = jnp.log(jax.random.uniform(key_u, (k,), active_pos.dtype)) < log_ratio

    new_pos = jnp.where(accept[:, None], proposal, active_pos)
    new_lnp = jnp.where(accept, prop_lnp, active_lnp)
    return new_pos, new_lnp, accept.astype(jnp.int32)


def fresh_image_accumulators(images_fn, example_theta, image_shape,
                             accum_dtype):
    """Zero accumulators keyed AND shaped by a shape-only trace.

    Joint multi-band posteriors carry per-band images of different
    shapes, so shapes come from ``jax.eval_shape`` per key, never one
    assumed (H, W).  The legacy ``image_shape`` override forces a
    single shape and is rejected when the carries are mixed-shape.
    Every raw-image key (``raw`` or ``*_raw``) gets a Welford M2
    companion (``<key>_m2``) for the per-pixel posterior-std product.
    Leaves are HOST numpy: pjit replicates them onto whatever mesh the
    phase program runs over (committed single-device arrays would be an
    incompatible-devices error on a multi-host mesh).
    """
    shapes = {
        k: tuple(s.shape)
        for k, s in jax.eval_shape(images_fn, example_theta).items()
    }
    if image_shape:
        if len(set(shapes.values())) > 1:
            raise ValueError(
                "image_shape override is ambiguous for a posterior with "
                f"mixed carry-image shapes {sorted(set(shapes.values()))}"
            )
        shapes = {k: tuple(image_shape) for k in shapes}
    for k in [k for k in shapes if k == "raw" or k.endswith("_raw")]:
        shapes[k + "_m2"] = shapes[k]
    dt = np.dtype(accum_dtype)
    return {k: np.zeros(s, dt) for k, s in shapes.items()}


def ensemble_image_means(images_fn, ensemble_means_fn, positions):
    """Mean carry images over the ensemble's current positions.

    Prefers the posterior's linearity-exploiting batch path
    (``ensemble_carry_means``: convolve the walker-mean renders once per
    PSF instead of per walker); falls back to vmapping the per-walker
    ``images_fn`` for posterior objects without one.

    When the image basis contains ``raw``, the result additionally
    carries ``raw_m2`` — the batch SUM of squared deviations about this
    batch's mean raw image (the Welford batch statistic consumed by
    :func:`merge_image_accumulators`; deviation form so f32 never sees
    an O(mean^2) cancellation).
    """
    if ensemble_means_fn is not None:
        return ensemble_means_fn(positions)
    imgs = jax.vmap(images_fn)(positions)
    out = {k: jnp.mean(v, axis=0) for k, v in imgs.items()}
    for k in list(imgs):
        if k == "raw" or k.endswith("_raw"):
            out[k + "_m2"] = jnp.sum(
                (imgs[k] - out[k][None]) ** 2, axis=0
            )
    return out


def merge_image_accumulators(accum, count, means, nbatch):
    """Merge one batch of ensemble image statistics into the carry.

    ``accum`` holds running MEANS per image key plus (optionally) the
    Welford ``raw_m2`` sum-of-squared-deviations; ``means`` is the
    output of :func:`ensemble_image_means` for a batch of ``nbatch``
    samples.  Mean keys use the standard incremental-mean update;
    ``raw_m2`` uses the Chan parallel merge — every term is
    O(std^2) x counts, so the per-pixel posterior variance stays exact
    in f32 even when the mean is 1e4x the std (the naive
    E[raw^2]-E[raw]^2 form is catastrophically cancelled there).
    Returns ``(new_accum, new_count)``.
    """
    count_new = count + nbatch
    out = {}
    for k, v in accum.items():
        if k.endswith("raw_m2"):
            continue
        dt = v.dtype
        out[k] = v + nbatch * (means[k].astype(dt) - v) / count_new.astype(dt)
    for k, v in accum.items():
        if not k.endswith("raw_m2"):
            continue
        base = k[: -len("_m2")]  # 'raw' / 'b0_raw' (joint multi-band)
        dt = v.dtype
        delta = means[base].astype(dt) - accum[base]  # vs the OLD mean
        ratio = (count.astype(dt) * nbatch) / count_new.astype(dt)
        out[k] = v + means[k].astype(dt) + delta * delta * ratio
    return out, count_new


def make_step_fn(
    lnpost_batch: Callable,
    images_fn: Optional[Callable],
    nwalkers: int,
    dim: int,
    a: float = 2.0,
    accumulate: bool = False,
    record: bool = True,
    ensemble_means_fn: Optional[Callable] = None,
    moves: str = "stretch",
    de_gamma0: Optional[float] = None,
):
    """Build the one-iteration scan body (two half-ensemble updates).

    When ``accumulate`` is set, after both half-updates the *current*
    state of every walker contributes its carry images to the running
    accumulators (reference retained-sample semantics, fitting.py:83 +
    models.py:74-97) — see :func:`ensemble_image_means`.

    ``moves``: ``'stretch'`` (emcee-2.x parity default), ``'de'``
    (differential evolution only), or ``'mixed'`` (each step randomly
    picks one of the two with equal probability — emcee-3-style move
    mixtures; measured to cut the flux-sharing degeneracies' autocorr
    on the flagship fit).
    """
    if moves not in ("stretch", "de", "mixed"):
        raise ValueError(
            f"unknown moves {moves!r}: expected 'stretch', 'de' or 'mixed'"
        )
    half = nwalkers // 2

    def step(state: EnsembleState, _):
        key, key0, key1, key_m = jax.random.split(state.key, 4)
        pos, lnp = state.positions, state.log_prob

        if moves == "stretch":
            use_de = None
        elif moves == "de":
            use_de = jnp.asarray(True)
        else:  # mixed: both halves of a step use the same move
            use_de = jax.random.bernoulli(key_m)

        # First half moves against second half
        p0, l0, acc0 = _stretch_half(
            key0, pos[:half], lnp[:half], pos[half:], lnpost_batch, a, dim,
            use_de=use_de, gamma0=de_gamma0,
        )
        # Second half moves against the *updated* first half (emcee 2.x)
        p1, l1, acc1 = _stretch_half(
            key1, pos[half:], lnp[half:], p0, lnpost_batch, a, dim,
            use_de=use_de, gamma0=de_gamma0,
        )

        new_pos = jnp.concatenate([p0, p1], axis=0)
        new_lnp = jnp.concatenate([l0, l1], axis=0)
        naccept = state.naccept + jnp.concatenate([acc0, acc1])

        accum = state.accum
        count = state.accum_count
        if accumulate:
            means = ensemble_image_means(
                images_fn, ensemble_means_fn, new_pos
            )
            accum, count = merge_image_accumulators(
                accum, count, means, nwalkers
            )

        moments = state.moments
        if accumulate and moments is not None:
            moments = welford_batch_update(moments, new_pos)

        new_state = EnsembleState(
            positions=new_pos,
            log_prob=new_lnp,
            accum=accum,
            accum_count=count,
            naccept=naccept,
            key=key,
            moments=moments,
        )
        out = (new_pos, new_lnp) if record else None
        return new_state, out

    return step


def run_stretch_move(
    lnpost_batch,
    images_fn,
    state: EnsembleState,
    nsteps: int,
    a: float = 2.0,
    accumulate: bool = False,
    record: bool = True,
    unroll: int = 1,
    ensemble_means_fn=None,
    thin: int = 1,
    moves: str = "stretch",
    de_gamma0=None,
):
    """Scan ``nsteps`` ensemble iterations on device.

    Returns (final_state, chain, lnprob) where chain is
    (nsteps // thin, nwalkers, dim) and lnprob is
    (nsteps // thin, nwalkers); both are None when ``record=False``.

    ``thin > 1`` records only every thin-th state ON DEVICE — the scan
    output (and hence the device->host chain transfer) shrinks by the
    thinning factor while image accumulation still sees every retained
    step.  This is what makes large ensembles (2000 walkers) hardware-
    limited instead of d2h-transfer-limited.
    """
    nwalkers, dim = state.positions.shape
    step = make_step_fn(
        lnpost_batch,
        images_fn,
        nwalkers,
        dim,
        a=a,
        accumulate=accumulate,
        record=record and thin == 1,
        ensemble_means_fn=ensemble_means_fn,
        moves=moves,
        de_gamma0=de_gamma0,
    )
    if record and thin > 1:
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")

        def outer(st, _):
            st, _ = jax.lax.scan(step, st, None, length=thin, unroll=unroll)
            return st, (st.positions, st.log_prob)

        final, (chain, lnprob) = jax.lax.scan(
            outer, state, None, length=nsteps // thin
        )
        return final, chain, lnprob
    final, outs = jax.lax.scan(step, state, None, length=nsteps, unroll=unroll)
    if record:
        chain, lnprob = outs
        return final, chain, lnprob
    return final, None, None


class EnsembleSampler:
    """Driver-facing sampler: owns jitted phase programs + chain storage.

    A near drop-in replacement for the emcee 2.x API surface the
    reference consumes (reference fitting.py:56-103): ``chain``,
    ``lnprobability``, ``acceptance_fraction``, ``reset()``,
    ``run_burn()``/``run_sampling()`` phase methods and
    ``get_autocorr_time``.
    """

    # identifies which sampler family wrote a checkpoint (stretch-family
    # state is interchangeable across ensemble/pt; nuts is not)
    checkpoint_kind = "ensemble"

    def __init__(
        self,
        nwalkers: int,
        dim: int,
        posterior_fns,
        a: float = 2.0,
        seed: int = 0,
        image_shape: Optional[Tuple[int, int]] = None,
        accum_dtype=jnp.float32,
        sharding=None,
        thin: int = 1,
        track_moments: bool = False,
        moves: str = "stretch",
        de_gamma0: Optional[float] = None,
    ):
        """``moves``: proposal family — ``'stretch'`` (emcee-2.x parity
        default), ``'de'`` (differential evolution), or ``'mixed'``
        (random 50/50 per step; better autocorrelation on strongly
        correlated flux-sharing posteriors, see make_step_fn).

        ``thin`` records every thin-th retained step on device (the
        chain and its d2h transfer shrink by that factor; image
        accumulation and acceptance statistics still cover every step).

        ``track_moments`` maintains on-device Welford running moments of
        the parameter vector over EVERY retained step (see
        :attr:`posterior_moments`), so thinned production runs keep
        full-accuracy posterior mean/std without shipping the chain.
        """
        if nwalkers % 2 != 0:
            raise ValueError("nwalkers must be even for half-ensemble moves")
        if moves not in ("stretch", "de", "mixed"):
            raise ValueError(
                f"unknown moves {moves!r}: expected 'stretch', 'de' or "
                "'mixed'"
            )
        self.moves = moves
        self.de_gamma0 = None if de_gamma0 is None else float(de_gamma0)
        if thin < 1:
            raise ValueError("thin must be >= 1")
        if nwalkers < 2 * dim + 2:
            import warnings

            warnings.warn(
                f"nwalkers={nwalkers} is fewer than the recommended "
                f"2*dim+2={2 * dim + 2}"
            )
        self.nwalkers = nwalkers
        self.dim = dim
        self.a = a
        self.fns = posterior_fns
        self.image_shape = image_shape
        self.accum_dtype = accum_dtype
        self.sharding = sharding
        self.thin = int(thin)
        self.track_moments = bool(track_moments)
        self._key = jax.random.PRNGKey(seed)

        self._chain = None  # numpy (nwalkers, nsteps, dim), emcee layout
        self._lnprob = None  # numpy (nwalkers, nsteps)
        self._naccept = np.zeros(nwalkers, dtype=np.int64)
        self._nsteps_total = 0
        self.state: Optional[EnsembleState] = None

        # Phase programs are cached on the PosteriorFns object so every
        # sampler instance over the same posterior (and every rerun)
        # reuses the compiled artifacts instead of silently recompiling.
        self._burn_prog = self._phase_program(accumulate=False, record=False)
        self._sample_prog = self._phase_program(accumulate=True, record=True)

    def _images_fn(self):
        """theta -> dict of carry images (for retained-phase accumulation)."""
        fn = getattr(self.fns, "carry_images", None)
        if fn is not None:
            return fn
        pair = self.fns.log_posterior_and_images
        return lambda theta: pair(theta)[1]

    def _phase_program(self, accumulate: bool, record: bool):
        cache = getattr(self.fns, "programs", None)
        thin = self.thin if record else 1
        key = (
            "phase", self.nwalkers, self.dim, self.a, accumulate, record,
            thin, self.moves, self.de_gamma0,
        )
        if cache is not None and key in cache:
            return cache[key]
        prog = jax.jit(
            partial(
                run_stretch_move,
                self._batched_lnpost_unjitted(),
                self._images_fn(),
                a=self.a,
                accumulate=accumulate,
                record=record,
                thin=thin,
                moves=self.moves,
                de_gamma0=self.de_gamma0,
                ensemble_means_fn=getattr(
                    self.fns, "ensemble_carry_means", None
                ),
            ),
            static_argnames=("nsteps",),
        )
        if cache is not None:
            cache[key] = prog
        return prog

    def _batched_lnpost_unjitted(self):
        """Half-ensemble evaluator: the posterior's fused Pallas batch
        path when built (PSFMC_LNPOST=pallas), else vmapped lnpost."""
        fused = getattr(self.fns, "log_posterior_batch", None)
        if fused is not None:
            return fused
        return jax.vmap(self.fns.log_posterior)

    def _batched_lnpost(self):
        fused = getattr(self.fns, "log_posterior_batch", None)
        if fused is not None:
            key = "jitted_log_posterior_batch"
            cache = getattr(self.fns, "programs", None)
            if cache is not None and key in cache:
                return cache[key]
            fn = jax.jit(fused)
            if cache is not None:
                cache[key] = fn
            return fn
        fn = getattr(self.fns, "batched_lnpost", None)
        if fn is None:
            fn = jax.jit(jax.vmap(self.fns.log_posterior))
            self.fns.batched_lnpost = fn
        return fn

    # -- state management -------------------------------------------------
    def _constrain(self, arr):
        if self.sharding is not None:
            return jax.lax.with_sharding_constraint(arr, self.sharding)
        return arr

    def init_state(self, p0, key=None):
        """Initialize device state from (nwalkers, dim) positions.

        When the sampler was built with a ``sharding``, the positions
        are placed onto the mesh here — callers (e.g. the fitting
        driver) can pass plain host arrays.
        """
        p0 = jnp.asarray(p0, self.fns.dtype)
        if self.sharding is not None:
            p0 = _put_sharded(p0, self.sharding)
        if key is None:
            self._key, key = jax.random.split(self._key)
        lnp = self._batched_lnpost()(p0)
        # keys + shapes from a shape-only trace; M2 buffers per raw key
        # (see fresh_image_accumulators — shared by every sampler)
        accum = fresh_image_accumulators(
            self._images_fn(), p0[0], self.image_shape, self.accum_dtype
        )
        self.state = EnsembleState(
            positions=p0,
            log_prob=lnp,
            accum=accum,
            accum_count=np.int32(0),
            naccept=np.zeros(self.nwalkers, np.int32),
            key=_fetch(key),
            moments=self._fresh_moments(),
        )
        return self.state

    def _fresh_moments(self):
        if not self.track_moments:
            return None
        dt = np.dtype(self.fns.dtype)
        return {
            "mean": np.zeros(self.dim, dt),
            "m2": np.zeros(self.dim, dt),
            "n": np.int32(0),
        }

    def rejuvenate_stuck(self, random_state=None, floor_sigmas=20.0,
                         min_drop=50.0):
        """Burn-phase rescue: teleport stranded walkers onto healthy ones.

        A walker initialized in a pathological corner (an ``-inf``
        plateau, a razor support edge) can take thousands of stretch
        moves to rejoin the bulk; the reference only ships a post-hoc
        ``filter_lowp_walkers`` that silently discards those chains.
        Here the driver repairs them DURING burn: any walker whose lnp
        sits below the same robust floor the analysis layer uses
        (``median - max(min_drop, floor_sigmas * 1.4826 * MAD)`` —
        :func:`psfmc_tpu.analysis.model_comparison.robust_lnp_keep`
        semantics) is replaced by a copy of a randomly chosen healthy
        walker.  Copies (no jitter) are inside the support by
        construction; the next stretch move re-diversifies them
        against the complementary half-ensemble.

        ONLY call between burn segments — teleporting during retained
        sampling would bias the posterior.  When half or more of the
        ensemble is below the floor this is NOT a few bad walkers
        (multimodality / genuine misfit) and the method refuses to act.

        :returns: number of walkers rejuvenated (0 = no-op).
        """
        rng = (
            random_state
            if isinstance(random_state, np.random.RandomState)
            else np.random.RandomState(random_state)
        )
        lnp = _fetch(self.state.log_prob, np.float64)
        finite = np.isfinite(lnp)
        if not finite.any():
            return 0
        med = np.median(lnp[finite])
        mad = np.median(np.abs(lnp[finite] - med))
        floor = med - max(float(min_drop),
                          float(floor_sigmas) * 1.4826 * mad)
        stuck = ~finite | (lnp < floor)
        n_stuck = int(stuck.sum())
        if n_stuck == 0 or n_stuck >= self.nwalkers // 2:
            return 0
        donors = rng.choice(np.flatnonzero(~stuck), size=n_stuck)
        # np.array copy: _fetch of a JAX array is a READ-ONLY view
        pos = np.array(_fetch(self.state.positions, np.float64))
        pos[stuck] = pos[donors]
        p0 = jnp.asarray(pos, self.fns.dtype)
        if self.sharding is not None:
            p0 = _put_sharded(p0, self.sharding)
        # recompute lnp (one batched eval) instead of patching the old
        # vector: keeps device layout/sharding/dtype exactly as the
        # step program expects
        self.state = replace(
            self.state,
            positions=p0,
            log_prob=self._batched_lnpost()(p0),
        )
        return n_stuck

    def reset(self):
        """Clear chain storage + acceptance counts; keep current positions.

        Mirrors emcee's ``sampler.reset()`` between burn-in and sampling
        (reference fitting.py:76).
        """
        self._chain = None
        self._lnprob = None
        self._naccept = np.zeros(self.nwalkers, dtype=np.int64)
        self._nsteps_total = 0
        if self.state is not None:
            self.state = replace(
                self.state,
                naccept=np.zeros(self.nwalkers, np.int32),
                accum_count=np.int32(0),
                accum={
                    k: np.zeros(v.shape, np.dtype(v.dtype))
                    for k, v in self.state.accum.items()
                },
                moments=self._fresh_moments(),
            )

    # -- phases -----------------------------------------------------------
    @staticmethod
    def _segments(nsteps: int, segment):
        """Split ``nsteps`` into scan segment lengths.

        ``segment=None`` keeps the whole phase as one device program (at
        most one extra compile for a remainder segment otherwise, since
        the scan length is a static argument).
        """
        if segment is None or segment >= nsteps:
            return [nsteps]
        segment = max(1, int(segment))
        out = [segment] * (nsteps // segment)
        if nsteps % segment:
            out.append(nsteps % segment)
        return out

    def _cold_naccept(self, state):
        """Per-walker accept counts of the recorded (cold) ensemble."""
        return _fetch(state.naccept)

    def _burn_segment(self, n: int):
        final, _, _ = self._burn_prog(self.state, nsteps=n)
        self.state = final

    def _sample_segment(self, n: int):
        """Run n retained steps; returns (chain, lnprob) in emcee layout."""
        final, chain, lnprob = self._sample_prog(self.state, nsteps=n)
        self.state = final
        # emcee chain layout: (nwalkers, nsteps, dim)
        return (
            np.moveaxis(_fetch(chain), 0, 1),
            np.moveaxis(_fetch(lnprob), 0, 1),
        )

    def _advance_segment(self, n: int, storechain: bool = True,
                         burn: bool = False):
        """One device segment + ALL the bookkeeping.

        The single place maintaining the chain/lnprob/acceptance/step
        invariants — ``run_burn``, ``run_sampling`` and the
        ``sample()`` generator all call it, so the entry points can
        never desynchronize.  Returns the segment's (chain, lnprob) in
        emcee layout (``(None, None)`` for burn segments, which record
        nothing).
        """
        prev_naccept = self._cold_naccept(self.state)
        if burn:
            self._burn_segment(n)
            chain = lnprob = None
        else:
            chain, lnprob = self._sample_segment(n)
        self._naccept += self._cold_naccept(self.state) - prev_naccept
        if chain is not None and storechain:
            if self._chain is None:
                self._chain, self._lnprob = chain, lnprob
            else:
                self._chain = np.concatenate([self._chain, chain], axis=1)
                self._lnprob = np.concatenate(
                    [self._lnprob, lnprob], axis=1
                )
        self._nsteps_total += n
        return chain, lnprob

    def run_burn(self, nsteps: int, segment=None, callback=None):
        """Burn-in: no chain recording, no image accumulation.

        ``segment`` chunks the on-device scan so ``callback(done,
        total)`` can report progress / write mid-phase checkpoints
        (restores the reference's print_progress behavior,
        utils.py:167-171, lost to the single opaque scan).
        """
        done = 0
        for n in self._segments(nsteps, segment):
            self._advance_segment(n, burn=True)
            done += n
            if callback is not None:
                callback(done, nsteps)
        return self

    def run_sampling(self, nsteps: int, segment=None, callback=None):
        """Retained sampling: records the chain + accumulates images."""
        if nsteps % self.thin:
            raise ValueError(
                f"nsteps={nsteps} not divisible by thin={self.thin}"
            )
        if segment is not None and self.thin > 1:
            # segments must land on thinning boundaries
            segment = max(self.thin, (segment // self.thin) * self.thin)
        done = 0
        for n in self._segments(nsteps, segment):
            self._advance_segment(n)
            done += n
            if callback is not None:
                callback(done, nsteps)
        return self

    def sample(self, p0=None, lnprob0=None, rstate0=None, iterations=1,
               thin=1, storechain=True, segment=None, **kwargs):
        """emcee-2.x-style step generator: yields ``(pos, lnprob, rstate)``.

        API parity for users who drive the sampler directly the way the
        reference's own fitting loop does (reference fitting.py:68-74)::

            for step, result in enumerate(sampler.sample(p0, iterations=n)):
                pos = result[0]

        One tuple is yielded per iteration.  Internally the walk still
        runs as compiled device scans of ``segment`` steps (default:
        the whole phase as one program) and the per-step states are
        replayed from the recorded chain — a Python dispatch per step
        would defeat the scan.  Calling it again with a new ``p0``
        (the reference's convergence-retry idiom) re-seats the walker
        positions but keeps the image accumulators running.

        ``storechain=False`` runs the same program but discards the
        recorded chain (image accumulators still advance; ``reset()``
        clears them, which the emcee burn -> reset -> sample idiom does
        anyway).

        Divergences from emcee 2.x (documented, deliberate): the third
        element is the device PRNG key (an opaque token, like emcee's
        random state; ``rstate0``/``lnprob0`` are accepted and ignored
        — the state lives on device), and there is no 4th "blobs"
        element: per-sample model images never leave the device (see
        ``accumulated_images`` / ``posterior_moments``).
        """
        # only the known emcee-2.x parity extras pass silently; a
        # misspelled 'iterations' must not quietly run 1 step
        unknown = set(kwargs) - {"blobs0", "mh_proposal"}
        if unknown:
            raise TypeError(
                f"sample() got unexpected keyword arguments "
                f"{sorted(unknown)}"
            )
        if kwargs.get("mh_proposal") is not None:
            raise ValueError(
                "mh_proposal is not supported (stretch/DE moves only)"
            )
        if thin != 1 or self.thin != 1:
            raise ValueError(
                "sample() yields every step: thin must be 1 (use "
                "run_sampling(thin=...) for on-device thinning)"
            )
        if self.state is None:
            if p0 is None:
                raise ValueError("no current sampler state: pass p0")
            self.init_state(p0)
        elif p0 is not None:
            p = jnp.asarray(p0, self.fns.dtype)
            if self.sharding is not None:
                p = _put_sharded(p, self.sharding)
            self.state = replace(
                self.state,
                positions=p,
                log_prob=self._batched_lnpost()(p),
            )
        it = int(iterations)
        if it <= 0:
            return
        for n in self._segments(it, segment):
            chain, lnprob = self._advance_segment(n, storechain=storechain)
            for s in range(n):
                yield chain[:, s, :], lnprob[:, s], self.state.key

    def clear_blobs(self):
        """No-op parity shim: emcee blobs (per-step model images in the
        reference) never exist on the host here — images accumulate on
        device (``accumulated_images``), so there is nothing to clear
        between steps."""

    # -- checkpoint / resume -------------------------------------------------
    def checkpoint_payload(self):
        """Full resume state as a dict of host arrays (checkpoint v2).

        Includes the posterior-image accumulators so a resumed run keeps
        its fast streaming means instead of falling back to a full chain
        replay in save_posterior_images.
        """
        s = self.state
        return {
            "version": 2,
            "ntemps": 1,
            "positions": _fetch(s.positions, np.float64),
            "log_prob": _fetch(s.log_prob, np.float64),
            "naccept": _fetch(s.naccept, np.int64),
            "nsteps": int(self._nsteps_total),
            "key": _fetch(s.key).astype(np.uint32),
            "accum": (
                {k: _fetch(v) for k, v in s.accum.items()}
                if s.accum is not None
                else None
            ),
            "accum_count": int(_fetch(s.accum_count)),
        }

    def restore_state(self, payload):
        """Rebuild device state from a :meth:`checkpoint_payload` dict.

        Log-probabilities are recomputed (deterministic, one batched
        eval) rather than trusted from the file; accumulators, accept
        counts and the PRNG key are restored exactly.
        """
        positions = np.asarray(payload["positions"], np.float64)
        if positions.ndim == 3:  # tempered checkpoint into a plain sampler
            positions = positions[0]
        key = jnp.asarray(payload["key"], jnp.uint32)
        self.init_state(positions, key=key)
        self._restore_accum(payload)
        naccept = payload.get("naccept")
        if naccept is not None and np.ndim(naccept) == 1:
            self.state = replace(
                self.state, naccept=np.asarray(naccept, np.int32)
            )
        self._restore_counters(payload)
        return self.state

    def _restore_counters(self, payload):
        """Continue acceptance-fraction bookkeeping across the resume."""
        naccept = np.asarray(payload.get("naccept", 0), np.int64)
        if naccept.ndim == 2:  # tempered payload: cold rung
            naccept = naccept[0]
        if naccept.shape == (self.nwalkers,):
            self._naccept = naccept.copy()
            self._nsteps_total = int(payload.get("nsteps", 0))

    def _restore_accum(self, payload):
        accum = payload.get("accum")
        count = int(payload.get("accum_count", 0))
        if not accum or count <= 0 or self.state.accum is None:
            return
        dt = np.dtype(self.accum_dtype)
        restored = {}
        for k, v in self.state.accum.items():
            if k in accum:
                restored[k] = np.asarray(accum[k], dt)
            elif k == "raw_m2":
                # pre-raw_m2 (round-2) checkpoint: the MEAN accumulators
                # are still fully valid — restore them and poison only
                # the M2 so the std product reports unavailable instead
                # of silently undercounting the restored samples
                restored[k] = np.full(v.shape, np.nan, dt)
            else:
                return  # a mean key is missing: different image basis
        self.state = replace(
            self.state, accum=restored, accum_count=np.int32(count)
        )

    # -- emcee-compatible accessors ----------------------------------------
    @property
    def chain(self):
        return self._chain

    @property
    def lnprobability(self):
        return self._lnprob

    @property
    def flatchain(self):
        c = self._chain
        return c.reshape(-1, self.dim) if c is not None else None

    @property
    def acceptance_fraction(self):
        total = max(self._nsteps_total, 1)
        return self._naccept / total

    @property
    def accumulated_images(self):
        """Running-mean carry images as numpy, or None."""
        if self.state is None or self.state.accum is None:
            return None
        return {k: _fetch(v) for k, v in self.state.accum.items()}

    @property
    def accumulated_samples(self):
        if self.state is None:
            return 0
        return int(_fetch(self.state.accum_count))

    @property
    def posterior_moments(self):
        """(mean, std) per parameter from the on-device Welford carry,
        covering every retained step (including steps a ``thin`` factor
        dropped from the chain).  None unless ``track_moments=True``."""
        if self.state is None or self.state.moments is None:
            return None
        m = self.state.moments
        n = max(int(_fetch(m["n"])), 1)
        mean = _fetch(m["mean"], np.float64)
        var = _fetch(m["m2"], np.float64) / max(n - 1, 1)
        return mean, np.sqrt(var)

    def get_autocorr_time(self, c=1):
        from .autocorr import integrated_time

        if self._chain is None:
            raise ValueError("No chain recorded yet")
        # emcee 2.x: autocorr of the walker-averaged chain
        mean_chain = np.mean(self._chain, axis=0)  # (nsteps, dim)
        return integrated_time(mean_chain, axis=0, c=c)
