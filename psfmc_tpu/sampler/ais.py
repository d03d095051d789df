"""Annealed importance sampling (AIS) evidence estimation.

The parallel-tempering estimators (``PTEnsembleSampler.log_evidence``)
need a beta LADDER resolved to ``|dbeta| * std(lnL) = O(1)`` per rung —
for a high-S/N imaging likelihood (std(lnL) ~ sqrt(npix/2) ~ 90 for a
128x128 cutout) that is hundreds of simultaneous rungs.  AIS (Neal
2001) anneals beta over TIME instead: one walker batch starts at the
prior (beta=0) and follows a fine schedule to the posterior (beta=1),
accumulating importance-weight increments ``dbeta_t * lnL(x_t)``; with
T steps the per-step spread is ``std(lnL)/T`` — resolution is bought
with steps, not memory.

This is a full SMC sampler (Del Moral, Doucet & Jasra 2006): whenever
a group's weight ESS drops below ``resample_threshold * m`` the group
is resampled (SYSTEMATIC resampling — one stratified uniform per
group, strictly lower variance than multinomial; Douc et al. 2005) —
without this, imaging-scale lnL ranges (thousands of log-units between
a random prior draw and the fit) collapse the weights onto one walker
long before beta reaches 1.  Plain AIS is the ``resample_threshold=0``
special case.

TPU-first shape: the whole anneal is one ``lax.scan``; walkers are
split into independent GROUPS (one more vmapped batch axis, reusing
the tempered stretch-move kernel with the rung axis repurposed as the
group axis), because affine-invariant moves and resampling couple
walkers within a group: group-to-group scatter then gives an honest
empirical error bar and keeps the groups' estimates independent.

Estimator status: per-group Z-hat is the standard SMC estimator
(exactly unbiased for population-independent kernels; the ensemble
move's weak intra-group coupling makes it consistent with O(1/m)
bias); validated against analytic evidences in
``tests/test_evidence.py``.  The evidence convention matches the PT
estimators: relative to the NORMALIZED constrained prior (the Sersic
``reff >= reff_b`` truncation is part of the prior on both sides, so
Bayes factors between models are unaffected).

Reference: the reference framework has no evidence capability at all
(SURVEY.md section 2); this extends item 17's sampler family.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional
from warnings import warn

import numpy as np

import jax
import jax.numpy as jnp

from .tempered import _pt_stretch_half, batched_like_prior

__all__ = ["AISResult", "ais_evidence", "ais_beta_schedule"]


def ais_beta_schedule(nsteps: int, power: float = 4.0):
    """(nsteps+1,) annealing schedule 0 -> 1, beta_t = (t/T)^power.

    A power law front-loads resolution at small beta where the tempered
    posterior changes fastest (d<lnL>/dbeta ~ 1/beta^2 for Gaussian-like
    targets); power=4 is the standard AIS default and approximates
    geometric spacing without the need to pick a smallest rung.
    """
    t = np.arange(nsteps + 1, dtype=np.float64) / nsteps
    return t**power


@dataclass
class AISResult:
    """Outcome of :func:`ais_evidence`."""

    lnz: float  # log evidence (mean of the per-group log-estimates)
    err: float  # group-to-group standard error of lnz
    lnz_groups: np.ndarray  # (groups,) per-group estimates
    # worst pre-resample weight ESS over the anneal (summed over
    # groups, of nwalkers total): how close the run came to weight
    # collapse between resampling events
    ess: float
    nwalkers: int
    nsteps: int
    accept_fraction: float  # mean stretch-move acceptance over the anneal
    nresample: int = 0  # resampling events summed over groups


def run_ais(like_b, prior_b, p0, key, betas, a=2.0, sweeps=1,
            resample_threshold=0.5, moves="stretch"):
    """Core anneal: one scan over the beta schedule (an SMC sampler).

    ``p0``: (groups, m, dim) EXACT prior draws; ``betas``: (T+1,)
    ascending 0 -> 1.  Per step and group: (1) fold the incremental
    weight ``dbeta * lnL`` into the running evidence via the normalized
    particle weights, (2) systematically RESAMPLE the group whenever
    its weight ESS drops below ``resample_threshold * m`` (Del Moral et
    al.'s SMC; without this, imaging-scale lnL ranges collapse the
    weights onto one walker long before beta reaches 1), (3) move every
    walker with ``sweeps`` tempered stretch-move sweeps at the new
    beta.

    Returns (positions, lnl, lnz_groups, lnw_norm, naccept, nresample,
    ess_min) — ``ess_min`` is the per-group worst PRE-resample ESS
    over the anneal.
    """
    groups, m, dim = p0.shape
    half = m // 2

    lnl0 = like_b(p0.reshape(groups * m, dim)).reshape(groups, m)
    lnp0 = prior_b(p0.reshape(groups * m, dim)).reshape(groups, m)
    # normalized log-weights (logsumexp == 0 per group)
    lnw0 = jnp.full_like(lnl0, -jnp.log(jnp.asarray(m, lnl0.dtype)))
    lnz0 = jnp.zeros(groups, lnl0.dtype)
    ess_min0 = jnp.full(groups, jnp.asarray(m, lnl0.dtype))

    pairs = jnp.stack([betas[:-1], betas[1:]], axis=1)
    logsumexp = jax.scipy.special.logsumexp

    def step(carry, bpair):
        pos, lnl, lnp, lnw, lnz, key, nacc, nres, ess_min = carry
        b_prev, b_new = bpair[0], bpair[1]
        # evidence increment at the CURRENT states (distributed ~ the
        # b_prev-tempered target), before any move:
        #   Z(b_new)/Z(b_prev) ~= sum_i W_i * exp(dbeta * lnL_i)
        u = (b_new - b_prev) * lnl
        s = logsumexp(lnw + u, axis=1)  # (groups,)
        lnz = lnz + s
        lnw = lnw + u - s[:, None]  # renormalize

        # adaptive SYSTEMATIC resampling per group (one uniform per
        # group, stratified offsets — strictly lower variance than
        # multinomial; Douc et al. 2005).  ESS is tracked PRE-resample:
        # the post-resample reset to uniform would mask terminal weight
        # collapse in the reported diagnostic.
        ess = jnp.exp(-logsumexp(2.0 * lnw, axis=1))  # (groups,)
        ess_min = jnp.minimum(ess_min, ess)
        need = ess < resample_threshold * m
        key, kr = jax.random.split(key)
        cdf = jnp.cumsum(jnp.exp(lnw), axis=1)  # (groups, m), ends ~1
        cdf = cdf / cdf[:, -1:]  # exact 1 endpoint despite rounding
        u0 = jax.random.uniform(kr, (groups, 1), lnw.dtype)
        pts = (u0 + jnp.arange(m, dtype=lnw.dtype)[None, :]) / m
        idx = jax.vmap(
            lambda c, p: jnp.searchsorted(c, p, side="right")
        )(cdf, pts)
        idx = jnp.minimum(idx, m - 1)
        pos = jnp.where(
            need[:, None, None],
            jnp.take_along_axis(pos, idx[:, :, None], axis=1),
            pos,
        )
        lnl = jnp.where(need[:, None], jnp.take_along_axis(lnl, idx, 1), lnl)
        lnp = jnp.where(need[:, None], jnp.take_along_axis(lnp, idx, 1), lnp)
        lnw = jnp.where(need[:, None], jnp.full_like(lnw, -jnp.log(
            jnp.asarray(m, lnw.dtype))), lnw)
        nres = nres + jnp.sum(need, dtype=jnp.int32)

        bvec = jnp.full((groups,), b_new, lnl.dtype)
        for _ in range(sweeps):
            key, k0, k1, km = jax.random.split(key, 4)
            if moves == "stretch":
                use_de = None
            elif moves == "de":
                use_de = jnp.asarray(True)
            else:  # mixed
                use_de = jax.random.bernoulli(km)
            q0, l0, r0, acc0 = _pt_stretch_half(
                k0,
                bvec,
                (pos[:, :half], lnl[:, :half], lnp[:, :half]),
                pos[:, half:],
                like_b,
                prior_b,
                a,
                dim,
                use_de=use_de,
            )
            q1, l1, r1, acc1 = _pt_stretch_half(
                k1,
                bvec,
                (pos[:, half:], lnl[:, half:], lnp[:, half:]),
                q0,
                like_b,
                prior_b,
                a,
                dim,
                use_de=use_de,
            )
            pos = jnp.concatenate([q0, q1], axis=1)
            lnl = jnp.concatenate([l0, l1], axis=1)
            lnp = jnp.concatenate([r0, r1], axis=1)
            # keep int32: under x64 a bare sum promotes to int64 and
            # breaks the scan carry's type invariance
            nacc = nacc + jnp.sum(acc0, dtype=jnp.int32) + jnp.sum(
                acc1, dtype=jnp.int32
            )
        return (pos, lnl, lnp, lnw, lnz, key, nacc, nres, ess_min), None

    nacc0 = jnp.asarray(0, jnp.int32)
    nres0 = jnp.asarray(0, jnp.int32)
    (pos, lnl, lnp, lnw, lnz, _, nacc, nres, ess_min), _ = jax.lax.scan(
        step,
        (p0, lnl0, lnp0, lnw0, lnz0, key, nacc0, nres0, ess_min0),
        pairs,
    )
    return pos, lnl, lnz, lnw, nacc, nres, ess_min


def ais_evidence(
    posterior_fns,
    nwalkers: int = 256,
    nsteps: int = 2000,
    groups: int = 4,
    sweeps: int = 1,
    power: float = 4.0,
    schedule=None,
    seed: int = 0,
    p0: Optional[np.ndarray] = None,
    a: float = 2.0,
    resample_threshold: float = 0.5,
    mesh=None,
    moves: str = "mixed",
):
    """Marginal likelihood by annealed importance sampling.

    :param posterior_fns: ``PosteriorFns`` (or compatible; a
        ``log_prior`` decomposition is required — AIS starts at the
        prior, so ``Z(beta=0) = 1`` must hold).
    :param nwalkers: total walkers (split into ``groups`` independent
        sub-ensembles of ``nwalkers // groups``, each >= 4 and even).
        Walkers-per-group must be enough to FIND the posterior's modes
        from prior draws — for imaging posteriors with localized
        sources that means >= 64/group (measured: 8/group leaves whole
        groups stuck in the no-source mode and the group estimates
        disagree by thousands of log-units; 64/group agrees to <1).  A
        group spread ``err >> 1`` is exactly that failure flag —
        increase walkers per group (or ``sweeps``), don't average it
        away.
    :param nsteps: annealing steps.  Choose ``nsteps >>
        std(lnL_posterior)`` (the retained-phase ``rung_log_like_std``
        of a tempered run, or ~``sqrt(n_good_pixels / 2)``) so the
        per-step increment spread stays small.
    :param schedule: explicit (T+1,) ascending beta array from 0 to 1;
        overrides ``power``.
    :param p0: optional (nwalkers, dim) EXACT prior draws (e.g.
        ``MultiComponentModel.init_params_from_priors``).  ``None``
        draws them column-wise from the model's priors.
    :param moves: transition proposals: ``'mixed'`` (default —
        stretch + differential-evolution mixture).  Measured on the
        flagship fit, mixing quality directly bounds the estimator:
        stretch-only runs scattered ~11 lnZ units across seeds while
        claiming +/-3-6 (weight-degeneracy Jensen bias pushes
        under-mixed SMC evidence LOW); the mixture agrees to 0.05
        across seeds at +/-0.35.  ``'stretch'``/``'de'`` available for
        comparison.
    :param mesh: optional ``jax.sharding.Mesh`` (e.g.
        ``parallel.walker_mesh()``): the GROUP axis shards over the
        mesh.  Groups are embarrassingly parallel (moves and
        resampling act within a group), so evidence scales to a full
        slice with zero collectives in the hot loop; make ``groups`` a
        multiple of the device count.
    :returns: :class:`AISResult`.
    """
    fns = posterior_fns
    if getattr(fns, "log_prior", None) is None:
        raise ValueError(
            "ais_evidence needs a posterior with a log_prior "
            "decomposition (AIS anchors at the normalized prior)"
        )
    if groups < 2:
        raise ValueError(
            "need groups >= 2: the error bar is the group-to-group "
            "scatter (a single group has no dispersion estimate)"
        )
    m = nwalkers // groups
    m -= m % 2
    if m < 4:
        raise ValueError(
            f"nwalkers={nwalkers} over groups={groups} leaves {m} "
            "walkers/group; need >= 4 (and even) for stretch moves"
        )
    nwalkers = m * groups

    if schedule is None:
        schedule = ais_beta_schedule(nsteps, power=power)
    schedule = np.asarray(schedule, np.float64)
    if schedule[0] != 0.0 or schedule[-1] != 1.0 or np.any(
        np.diff(schedule) < 0
    ):
        raise ValueError("schedule must ascend from 0 to 1")
    nsteps = len(schedule) - 1

    # ONE cached batched-prior program (evaluated at the full fixed
    # (nwalkers, dim) shape every round): ad-hoc per-round jit wrappers
    # + changing shapes would recompile on every rejection round, and
    # tunnel compiles take minutes (posterior.py:183-186 convention)
    cache = getattr(fns, "programs", None)
    pkey = ("ais_batched_prior",)
    if cache is not None and pkey in cache:
        batched_prior = cache[pkey]
    else:
        batched_prior = jax.jit(jax.vmap(fns.log_prior))
        if cache is not None:
            cache[pkey] = batched_prior

    if p0 is None:
        from ..optimize import _prior_pool

        rng = np.random.RandomState(seed)
        p0 = _prior_pool(fns.spec, nwalkers, rng)
        # joint-constraint rejection (reff >= reff_b etc.): resample
        # rows with -inf prior so p0 is an exact constrained-prior draw
        lp = np.array(batched_prior(jnp.asarray(p0, fns.dtype)))
        tries = 0
        while not np.all(np.isfinite(lp)) and tries < 100:
            bad = ~np.isfinite(lp)
            p0[bad] = _prior_pool(fns.spec, int(bad.sum()), rng)
            lp = np.array(batched_prior(jnp.asarray(p0, fns.dtype)))
            tries += 1
        if not np.all(np.isfinite(lp)):
            raise RuntimeError(
                "could not draw in-support prior samples after 100 "
                "rejection rounds; check the joint prior constraints"
            )
    else:
        # a user p0 with out-of-support rows would silently bias lnZ by
        # ln(in-support fraction) — identically in EVERY group, so the
        # group error bar cannot catch it; refuse instead
        p0 = np.asarray(p0, np.float64)
        lp = np.array(batched_prior(jnp.asarray(p0, fns.dtype)))
        n_bad = int(np.sum(~np.isfinite(lp)))
        if n_bad:
            raise ValueError(
                f"{n_bad}/{len(p0)} rows of p0 are outside the prior "
                "support; AIS anchors at the normalized prior, so p0 "
                "must be an exact constrained-prior draw (pass p0=None "
                "to let ais_evidence rejection-sample one)"
            )
    p0 = np.asarray(p0, np.float64)[:nwalkers].reshape(groups, m, -1)
    dim = p0.shape[-1]

    like_b, prior_b = batched_like_prior(fns)
    if moves not in ("stretch", "de", "mixed"):
        raise ValueError(
            f"unknown moves {moves!r}: expected 'stretch', 'de' or 'mixed'"
        )
    cache_key = ("ais", groups, m, dim, sweeps, float(a), nsteps,
                 float(resample_threshold), moves)
    if cache is not None and cache_key in cache:
        program = cache[cache_key]
    else:
        from functools import partial

        program = jax.jit(
            partial(
                run_ais,
                like_b,
                prior_b,
                a=a,
                sweeps=sweeps,
                resample_threshold=resample_threshold,
                moves=moves,
            )
        )
        if cache is not None:
            cache[cache_key] = program

    key = jax.random.PRNGKey(seed)
    betas_dev = jnp.asarray(schedule, fns.dtype)
    p0_dev = jnp.asarray(p0, fns.dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if groups % mesh.size != 0:
            raise ValueError(
                f"groups={groups} must be a multiple of the mesh size "
                f"({mesh.size}) to shard the group axis"
            )
        from ..parallel.multihost import put_sharded

        axis = mesh.axis_names[0]
        p0_dev = put_sharded(
            p0_dev, NamedSharding(mesh, PartitionSpec(axis, None, None))
        )
    _pos, _lnl, lnz_g, _lnw, nacc, nres, ess_min = program(
        p0_dev, key, betas_dev
    )
    from ..parallel.multihost import fetch as _fetch_mh

    lnz_g = _fetch_mh(lnz_g, np.float64)  # (groups,)
    ess_min = _fetch_mh(ess_min)
    nacc = _fetch_mh(nacc)
    nres = _fetch_mh(nres)

    # point estimate and error bar form a CONSISTENT pair: the mean of
    # the per-group log-estimates with its standard error.  (The
    # Z-space mean of group estimates is the unbiased combination but
    # is dominated by the max group, which sits systematically above
    # the center of the log-scatter band — a mismatched interval.)
    lnz = float(np.mean(lnz_g))
    err = float(np.std(lnz_g, ddof=1) / np.sqrt(groups))
    # worst PRE-resample weight ESS over the anneal, summed over groups
    # (the post-resample reset would mask terminal collapse)
    ess = float(np.sum(np.asarray(ess_min, np.float64)))
    accept = float(nacc) / (nsteps * sweeps * nwalkers)

    # -- failure-mode diagnostics (measured on the flagship fit; see
    #    the parameter docs above) ------------------------------------
    group_spread = float(np.std(lnz_g, ddof=1))
    if group_spread > 3.0:
        # CRITICAL #1 — group stranding: with too few walkers per
        # group, whole groups miss posterior modes (e.g. sit in the
        # no-source mode) and the per-group estimates disagree by many
        # log-units.  The spread IS the flag; averaging it away gives
        # a wrong lnZ with a wrong error bar.
        warn(
            f"AIS group estimates disagree by {group_spread:.1f} lnZ "
            f"units (want O(1)): groups are likely stranded in "
            f"different posterior modes.  Increase walkers per group "
            f"(currently {m}; imaging posteriors need >= 64) or "
            "sweeps=; do NOT trust the averaged lnz."
        )
    min_group_ess = float(np.min(np.asarray(ess_min, np.float64)))
    if accept < 0.05 or min_group_ess < 0.05 * m:
        # CRITICAL #2 — weight degeneracy / under-mixing: when the
        # transition kernel mixes poorly, importance weights collapse
        # and the Jensen bias pushes lnZ systematically LOW while the
        # group error bar (which only sees between-group scatter of
        # equally-biased estimates) keeps shrinking — measured as
        # stretch-only runs scattering ~11 lnZ across seeds while
        # claiming +/-3-6.  Distrust an error bar that shrinks while
        # seeds disagree.
        warn(
            "AIS transitions are under-mixing (acceptance "
            f"{accept:.1%}, worst pre-resample group ESS "
            f"{min_group_ess:.1f}/{m}): importance weights are "
            "degenerate and lnz is likely biased LOW with an "
            "overconfident error bar.  Increase nsteps, use "
            "moves='mixed', or verify across seeds."
        )

    return AISResult(
        lnz=lnz,
        err=err,
        lnz_groups=lnz_g,
        ess=ess,
        nwalkers=nwalkers,
        nsteps=nsteps,
        accept_fraction=accept,
        nresample=int(nres),
    )
