"""Parallel-tempered ensemble sampler (replica exchange over rungs).

A capability beyond the reference: quasar/host decompositions have
genuinely multimodal posteriors (point-source/Sersic flux swaps,
position exchanges between components, discrete PSF choices), where a
single affine-invariant ensemble can take arbitrarily long to cross
between modes.  Parallel tempering runs ``ntemps`` replicas of the
ensemble at inverse temperatures ``1 = beta_0 > beta_1 > ... > 0``
(each sampling ``prior * likelihood^beta``), and exchanges
configurations between adjacent rungs with the standard replica-swap
Metropolis rule — hot rungs roam freely between modes and feed the cold
chain.

TPU-first design: the rung axis is one more vmapped batch dimension —
every stretch-move half-step evaluates ``ntemps * nwalkers/2``
posteriors in a single batched XLA computation, and the whole phase is
one ``lax.scan``.  The marginal cost of tempering is therefore ~linear
in ``ntemps`` with no extra dispatches, and the walker axis can still
shard over a device mesh.

Tempering applies to the LIKELIHOOD only (priors stay cold), the
standard choice so hot rungs still respect the prior's support:
``lnpost_beta(theta) = lnprior(theta) + beta * lnlike(theta)``.
Posteriors whose log-density does not decompose (a bare callable) are
tempered as ``beta * lnpost`` instead — correct for improper/flat
priors, documented fallback otherwise.

Only the cold (beta=1) rung's chain is recorded and accumulated; it is
a draw from the true posterior by construction.

The emcee-2.x-compatible surface matches :class:`EnsembleSampler`, so
``model_galaxy_mcmc(..., ntemps=K)`` swaps samplers transparently.
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..parallel.multihost import fetch as _fetch
from .ensemble import EnsembleSampler

__all__ = [
    "default_beta_ladder",
    "evidence_beta_ladder",
    "PTEnsembleSampler",
]


def default_beta_ladder(ntemps: int, tmax: float = 64.0):
    """Geometric inverse-temperature ladder 1 ... 1/tmax.

    Geometric spacing equalizes swap-acceptance rates for roughly
    Gaussian posteriors (the standard default for weak-data problems).

    CAVEAT for high-S/N imaging likelihoods: swaps accept only when
    adjacent rungs' log-likelihood distributions overlap, and the
    per-rung lnL spread scales like sqrt(n_eff_pixels/2) — ~90 units
    for a 16k-pixel image.  A ladder reaching 1/64 in a few rungs then
    swaps at ~0.1% (measured on the flagship fit).  The sampler
    therefore AUTO-SIZES the ladder when ``betas=None``: per-rung
    std(lnL) is measured every burn-in adaptation window and the betas
    re-spaced so ``|dbeta| * std(lnL) ~ delta`` (see
    :func:`ladder_from_sigma`), frozen for the retained phase.
    Measured on the flagship: 35-43% swap acceptance with ntemps=4 and
    no hand tuning.
    """
    if ntemps == 1:
        return np.ones(1)
    return np.exp(np.linspace(0.0, -np.log(tmax), ntemps))


def evidence_beta_ladder(ntemps: int, bmin: float = 1e-3):
    """Beta ladder for marginal-likelihood (evidence) estimation.

    Geometric rungs from 1 down to ``bmin`` plus an explicit ``beta=0``
    rung that samples the bare prior.  Evidence estimators integrate
    the tempered path from the prior (beta=0, Z=1 for proper priors) to
    the posterior (beta=1), so the ladder must span the whole interval —
    unlike the mixing-oriented default/adaptive ladders, which only
    need enough temperature contrast to hop modes.  Pass the result as
    ``betas=`` (this pins the ladder; burn-in adaptation is for mixing
    ladders, not quadrature grids).
    """
    if ntemps < 3:
        raise ValueError("evidence ladder needs >= 3 rungs (1 ... bmin, 0)")
    geo = np.exp(np.linspace(0.0, np.log(bmin), ntemps - 1))
    return np.concatenate([geo, [0.0]])


def ladder_from_sigma(sigmas, betas_old, ntemps: int, delta: float = 1.0):
    """Size a beta ladder from per-rung std(lnL) measurements.

    Integrates downward from beta=1 with spacing ``delta / sigma(beta)``
    so adjacent rungs' tempered log-likelihood distributions overlap by
    construction.  ``sigma(beta)`` is modelled as ``u(beta) / beta``
    where ``u = sigma * beta`` — for Gaussian-like posteriors u is a
    constant (fluctuation-dissipation: Var_beta(lnL) grows as 1/beta^2
    as the tempered posterior widens), so this interpolates the
    measured rungs AND extrapolates sanely beyond the hottest one.
    Spacings are clamped to the geometric default ladder: weak-data
    targets (small sigma) reproduce the classic ladder, high-S/N
    imaging likelihoods (sigma ~ tens at beta=1) get the required
    near-unity spacing automatically.

    For a Gaussian posterior the resulting mean swap log-ratio per pair
    is ~ ``-delta**2``, so ``delta = sqrt(-ln(target))`` targets a swap
    acceptance of ~``target``.
    """
    betas_old = np.asarray(betas_old, np.float64)
    sigmas = np.asarray(sigmas, np.float64)
    u = sigmas * betas_old  # ~constant for Gaussian-like posteriors
    geo = default_beta_ladder(ntemps)
    out = [1.0]
    for k in range(ntemps - 1):
        b = out[-1]
        # betas descend; np.interp needs ascending x (clamps outside)
        u_b = float(np.interp(b, betas_old[::-1], u[::-1]))
        sig = max(u_b, 1e-3 * b) / b
        nb = b - delta / sig
        nb = max(nb, geo[k + 1])  # floor: the geometric rung
        nb = min(nb, b * (1.0 - 1e-4))  # keep strictly decreasing
        out.append(nb)
    return np.asarray(out, np.float64)




@dataclass
class PTState:
    """Device-side tempered-sampler state (a pytree)."""

    positions: jax.Array  # (ntemps, nwalkers, dim)
    log_like: jax.Array  # (ntemps, nwalkers) untempered log-likelihood
    log_prior: jax.Array  # (ntemps, nwalkers)
    accum: Optional[Dict[str, jax.Array]]
    accum_count: jax.Array
    naccept: jax.Array  # (ntemps, nwalkers) move acceptances
    nswap: jax.Array  # (ntemps - 1,) accepted swaps per rung pair
    key: jax.Array
    # -- evidence accumulators (retained phase only; tiny: O(ntemps)).
    # Kahan-compensated sums of the per-step rung means: production
    # runs are f32 (x64 off), and 5e4 bare accumulations of O(1e4)
    # values drift by O(0.1-1) lnZ units — the exact f32-summation
    # hazard CLAUDE.md documents for chains.  lnl_sum/t is the mean.
    lnl_sum: jax.Array  # (ntemps,) Kahan sum of per-step mean lnL
    lnl_sum_c: jax.Array  # (ntemps,) Kahan compensation
    lnl_sq_sum: jax.Array  # (ntemps,) Kahan sum of per-step mean lnL^2
    lnl_sq_sum_c: jax.Array  # (ntemps,) Kahan compensation
    evid_steps: jax.Array  # scalar int32: retained steps accumulated
    # streaming logsumexp of dbeta*lnL at the hotter rung of each pair
    # (stepping-stone importance ratios)
    ss_max: jax.Array  # (ntemps - 1,)
    ss_sum: jax.Array  # (ntemps - 1,)


jax.tree_util.register_pytree_node(
    PTState,
    lambda s: (
        (
            s.positions,
            s.log_like,
            s.log_prior,
            s.accum,
            s.accum_count,
            s.naccept,
            s.nswap,
            s.key,
            s.lnl_sum,
            s.lnl_sum_c,
            s.lnl_sq_sum,
            s.lnl_sq_sum_c,
            s.evid_steps,
            s.ss_max,
            s.ss_sum,
        ),
        None,
    ),
    lambda _aux, ch: PTState(*ch),
)


def split_like_prior(fns):
    """(lnlike, lnprior) pair from a posterior object.

    Falls back to ``(lnpost, 0)`` when no ``log_prior`` decomposition is
    exposed (tempering then acts on the full posterior — correct for
    improper/flat priors, documented fallback otherwise).
    """
    lnprior = getattr(fns, "log_prior", None)
    lnpost = fns.log_posterior
    if lnprior is None:
        return lnpost, lambda theta: jnp.asarray(0.0, theta.dtype)

    def lnlike(theta):
        # lnpost = lnprior + lnlike; recover lnlike by subtraction
        # (both -inf outside support; where() keeps -inf dominant)
        lp = lnprior(theta)
        post = lnpost(theta)
        return jnp.where(jnp.isfinite(lp), post - lp, -jnp.inf)

    return lnlike, lnprior


def batched_like_prior(fns):
    """Flat-batch (n, dim) likelihood + prior evaluators; uses the
    posterior's fused Pallas likelihood when built."""
    lnlike, lnprior = split_like_prior(fns)
    fused = getattr(fns, "log_likelihood_batch", None)
    like_b = fused if fused is not None else jax.vmap(lnlike)
    return like_b, jax.vmap(lnprior)


def _kahan_add(s, c, v):
    """Compensated add: returns (s', c') with s' + c'-error ~ exact."""
    y = v - c
    t = s + y
    return t, (t - s) - y


def _temper(b, lnl):
    """``b * lnl`` with the beta=0 (prior) rung handled exactly.

    At beta=0 a bare ``0 * (-inf)`` is nan and would poison the
    acceptance ratio; out-of-support proposals must still reject (the
    prior term carries -inf when a decomposition exists, and when it
    does not — the beta*lnpost fallback — the -inf must survive here).
    """
    return jnp.where(
        b > 0,
        b * lnl,
        jnp.where(jnp.isfinite(lnl), jnp.zeros_like(lnl), -jnp.inf),
    )


def _pt_stretch_half(key, betas, active, comp, lnlike_batch, lnprior_batch,
                     a, dim, use_de=None, gamma0=None):
    """One tempered half-ensemble update, vmapped over rungs.

    ``active``/``comp`` are (pos, lnl, lnp) tuples with leading rung
    axis; acceptance uses ``lnprior + beta * lnlike``.  The batched
    likelihood/prior evaluate a flat (n, dim) batch — vmapped scalars
    or the posterior's fused Pallas batch path.

    ``use_de`` (traced bool scalar or None) swaps in a differential-
    evolution proposal for this half-step — same semantics as the
    plain ensemble's (see :func:`psfmc_tpu.sampler.ensemble.
    _stretch_half`): symmetric, two distinct complementary partners,
    gamma = 2.38/sqrt(2 dim) with 10% mode-jumping gamma=1.  Zero
    extra posterior evaluations; rung axis rides along.
    """
    pos, lnl, lnp = active
    ntemps, k, _ = pos.shape
    m = comp.shape[1]
    key_z, key_r, key_u, key_r2, key_g, key_j = jax.random.split(key, 6)

    u = jax.random.uniform(key_z, (ntemps, k), pos.dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    partner = jax.random.randint(key_r, (ntemps, k), 0, m)
    c = jnp.take_along_axis(comp, partner[..., None], axis=1)
    proposal = c + z[..., None] * (pos - c)
    log_extra = (dim - 1.0) * jnp.log(z)

    if use_de is not None:
        partner2 = jnp.mod(
            partner + 1 + jax.random.randint(key_r2, (ntemps, k), 0, m - 1),
            m,
        )
        c2 = jnp.take_along_axis(comp, partner2[..., None], axis=1)
        g0 = jnp.asarray(
            gamma0 if gamma0 is not None else 2.38 / np.sqrt(2.0 * dim),
            pos.dtype,
        )
        jump = jax.random.uniform(key_g, (ntemps, k), pos.dtype) < 0.1
        jitter = 1.0 + 1e-5 * jax.random.normal(
            key_j, (ntemps, k), pos.dtype
        )
        gamma = jnp.where(jump, 1.0, g0) * jitter
        de_proposal = pos + gamma[..., None] * (c - c2)
        proposal = jnp.where(use_de, de_proposal, proposal)
        log_extra = jnp.where(use_de, jnp.zeros_like(log_extra), log_extra)

    flat = proposal.reshape(ntemps * k, -1)
    prop_lnl = lnlike_batch(flat).reshape(ntemps, k)
    prop_lnp = lnprior_batch(flat).reshape(ntemps, k)

    b = betas[:, None]
    log_ratio = (
        log_extra
        + (prop_lnp + _temper(b, prop_lnl))
        - (lnp + _temper(b, lnl))
    )
    accept = (
        jnp.log(jax.random.uniform(key_u, (ntemps, k), pos.dtype)) < log_ratio
    )
    new_pos = jnp.where(accept[..., None], proposal, pos)
    new_lnl = jnp.where(accept, prop_lnl, lnl)
    new_lnp = jnp.where(accept, prop_lnp, lnp)
    return new_pos, new_lnl, new_lnp, accept.astype(jnp.int32)


def _swap_move(key, betas, pos, lnl, lnp, nswap):
    """Deterministic-sweep replica exchange between adjacent rungs.

    Sweeps from the hottest pair down to the coldest (the standard
    order, so a good configuration can migrate all the way to beta=1 in
    one sweep); each walker index swaps independently.
    """
    ntemps = pos.shape[0]
    keys = jax.random.split(key, ntemps - 1)

    def body(carry, t):
        pos, lnl, lnp, nswap = carry
        # pair (i, i+1), from hottest (ntemps-2, ntemps-1) downward
        i = ntemps - 2 - t
        db = betas[i] - betas[i + 1]
        log_ratio = db * (lnl[i + 1] - lnl[i])
        u = jax.random.uniform(keys[t], log_ratio.shape, lnl.dtype)
        do = jnp.log(u) < log_ratio

        pi = jnp.where(do[:, None], pos[i + 1], pos[i])
        pj = jnp.where(do[:, None], pos[i], pos[i + 1])
        li = jnp.where(do, lnl[i + 1], lnl[i])
        lj = jnp.where(do, lnl[i], lnl[i + 1])
        qi = jnp.where(do, lnp[i + 1], lnp[i])
        qj = jnp.where(do, lnp[i], lnp[i + 1])
        pos = pos.at[i].set(pi).at[i + 1].set(pj)
        lnl = lnl.at[i].set(li).at[i + 1].set(lj)
        lnp = lnp.at[i].set(qi).at[i + 1].set(qj)
        # keep the scatter operand int32: under x64 a bare sum promotes
        # to int64 and the at[].add into int32 nswap raises a
        # FutureWarning (error in future JAX releases)
        nswap = nswap.at[i].add(jnp.sum(do, dtype=jnp.int32))
        return (pos, lnl, lnp, nswap), None

    (pos, lnl, lnp, nswap), _ = jax.lax.scan(
        body, (pos, lnl, lnp, nswap), jnp.arange(ntemps - 1)
    )
    return pos, lnl, lnp, nswap


def make_pt_step_fn(
    lnlike_batch: Callable,
    lnprior_batch: Callable,
    images_fn: Optional[Callable],
    betas,
    nwalkers: int,
    dim: int,
    a: float = 2.0,
    accumulate: bool = False,
    record: bool = True,
    ensemble_means_fn: Optional[Callable] = None,
    moves: str = "stretch",
):
    """One tempered iteration: two half-updates per rung + a swap sweep.

    ``betas`` may be a traced array (runtime argument of the compiled
    phase program), so the burn-in ladder adaptation never recompiles.
    """
    half = nwalkers // 2
    betas = jnp.asarray(betas)
    ntemps = betas.shape[0]

    def step(state: PTState, _):
        key, key0, key1, key_s, key_m = jax.random.split(state.key, 5)
        pos, lnl, lnp = state.positions, state.log_like, state.log_prior

        if moves == "stretch":
            use_de = None
        elif moves == "de":
            use_de = jnp.asarray(True)
        else:  # mixed
            use_de = jax.random.bernoulli(key_m)

        p0, l0, q0, acc0 = _pt_stretch_half(
            key0,
            betas,
            (pos[:, :half], lnl[:, :half], lnp[:, :half]),
            pos[:, half:],
            lnlike_batch,
            lnprior_batch,
            a,
            dim,
            use_de=use_de,
        )
        p1, l1, q1, acc1 = _pt_stretch_half(
            key1,
            betas,
            (pos[:, half:], lnl[:, half:], lnp[:, half:]),
            p0,
            lnlike_batch,
            lnprior_batch,
            a,
            dim,
            use_de=use_de,
        )
        pos = jnp.concatenate([p0, p1], axis=1)
        lnl = jnp.concatenate([l0, l1], axis=1)
        lnp = jnp.concatenate([q0, q1], axis=1)
        naccept = state.naccept + jnp.concatenate([acc0, acc1], axis=1)

        pos, lnl, lnp, nswap = _swap_move(
            key_s, betas, pos, lnl, lnp, state.nswap
        )

        lnl_sum, lnl_sum_c = state.lnl_sum, state.lnl_sum_c
        lnl_sq_sum, lnl_sq_sum_c = state.lnl_sq_sum, state.lnl_sq_sum_c
        evid_steps = state.evid_steps
        ss_max, ss_sum = state.ss_max, state.ss_sum
        if record:
            # Evidence accumulators (retained phase only). Per-rung
            # Kahan-compensated sums of lnL and lnL^2 step means feed
            # thermodynamic integration; a streaming logsumexp of
            # dbeta*lnL at the HOTTER rung of each adjacent pair feeds
            # stepping-stone.  Cost: O(ntemps) scalars per step — free
            # next to the batched posterior evaluations.
            evid_steps = evid_steps + 1
            step_mean = jnp.mean(lnl, axis=1)
            step_sq = jnp.mean(lnl * lnl, axis=1)
            lnl_sum, lnl_sum_c = _kahan_add(lnl_sum, lnl_sum_c, step_mean)
            lnl_sq_sum, lnl_sq_sum_c = _kahan_add(
                lnl_sq_sum, lnl_sq_sum_c, step_sq
            )
            dbeta = betas[:-1] - betas[1:]  # (ntemps-1,) > 0
            v = dbeta[:, None] * lnl[1:]  # at the hotter rung
            vmax = jnp.max(v, axis=1)
            new_max = jnp.maximum(ss_max, vmax)
            # exp(-inf - -inf) guard: empty accumulator contributes 0
            scale = jnp.where(
                jnp.isfinite(ss_max), jnp.exp(ss_max - new_max), 0.0
            )
            ss_sum = ss_sum * scale + jnp.sum(
                jnp.exp(v - new_max[:, None]), axis=1
            )
            ss_max = new_max

        accum = state.accum
        count = state.accum_count
        if accumulate:
            from .ensemble import (
                ensemble_image_means,
                merge_image_accumulators,
            )

            means = ensemble_image_means(
                images_fn, ensemble_means_fn, pos[0]  # cold rung only
            )
            accum, count = merge_image_accumulators(
                accum, count, means, nwalkers
            )

        new_state = PTState(
            positions=pos,
            log_like=lnl,
            log_prior=lnp,
            accum=accum,
            accum_count=count,
            naccept=naccept,
            nswap=nswap,
            key=key,
            lnl_sum=lnl_sum,
            lnl_sum_c=lnl_sum_c,
            lnl_sq_sum=lnl_sq_sum,
            lnl_sq_sum_c=lnl_sq_sum_c,
            evid_steps=evid_steps,
            ss_max=ss_max,
            ss_sum=ss_sum,
        )
        out = (pos[0], lnp[0] + lnl[0]) if record else None
        return new_state, out

    return step


def run_pt(
    lnlike_batch,
    lnprior_batch,
    images_fn,
    state: PTState,
    betas,
    nsteps: int,
    a: float = 2.0,
    accumulate: bool = False,
    record: bool = True,
    ensemble_means_fn=None,
    moves: str = "stretch",
):
    ntemps, nwalkers, dim = state.positions.shape
    step = make_pt_step_fn(
        lnlike_batch,
        lnprior_batch,
        images_fn,
        betas,
        nwalkers,
        dim,
        a=a,
        accumulate=accumulate,
        record=record,
        ensemble_means_fn=ensemble_means_fn,
        moves=moves,
    )
    final, outs = jax.lax.scan(step, state, None, length=nsteps)
    if record:
        chain, lnprob = outs
        return final, chain, lnprob
    return final, None, None


class PTEnsembleSampler(EnsembleSampler):
    """Tempered drop-in for :class:`EnsembleSampler` (``ntemps`` rungs).

    The recorded ``chain``/``lnprobability`` and the image accumulators
    are the cold (beta=1) rung — true posterior draws.  Extra
    diagnostics: ``swap_acceptance_fraction`` per adjacent rung pair and
    ``tempered_acceptance_fraction`` per rung.
    """

    # stretch-family state: interchangeable with plain ensemble
    # checkpoints (rung-count changes restart hot rungs gracefully)
    checkpoint_kind = "ensemble"

    def __init__(
        self,
        nwalkers: int,
        dim: int,
        posterior_fns,
        ntemps: int = 4,
        betas=None,
        a: float = 2.0,
        seed: int = 0,
        image_shape=None,
        accum_dtype=jnp.float32,
        sharding=None,
        adapt_ladder=None,
        target_swap_accept: float = 0.3,
        moves: str = "stretch",
    ):
        """``betas=None`` enables automatic ladder sizing: during
        burn-in the per-rung std(lnL) is measured every adaptation
        window and the ladder re-spaced via :func:`ladder_from_sigma`
        with ``delta = sqrt(-ln(target_swap_accept))``, then frozen for
        the retained phase.  Pass explicit ``betas`` (or
        ``adapt_ladder=False``) to pin the ladder.
        """
        self.ntemps = int(ntemps)
        self.adapt_ladder = (betas is None) if adapt_ladder is None else bool(
            adapt_ladder
        )
        self.target_swap_accept = float(target_swap_accept)
        self.betas = np.asarray(
            default_beta_ladder(self.ntemps) if betas is None else betas,
            np.float64,
        )
        if self.betas[0] != 1.0:
            raise ValueError("betas[0] must be 1.0 (the cold chain)")
        self._adapt_t = 0  # adaptation windows completed
        self._u_ema = None  # EMA of sigma(lnL) * beta per rung
        super().__init__(
            nwalkers,
            dim,
            posterior_fns,
            a=a,
            seed=seed,
            image_shape=image_shape,
            accum_dtype=accum_dtype,
            sharding=sharding,
            moves=moves,
        )

    # -- likelihood/prior split --------------------------------------------
    def _lnlike_lnprior_fns(self):
        """(lnlike, lnprior) pair; falls back to (lnpost, 0) when the
        posterior object exposes no decomposition."""
        return split_like_prior(self.fns)

    def _batched_like_prior(self):
        """Flat-batch (n, dim) likelihood + prior evaluators; uses the
        posterior's fused Pallas likelihood when built."""
        return batched_like_prior(self.fns)

    def _phase_program(self, accumulate: bool, record: bool):
        # betas is a RUNTIME argument of the program (not baked in), so
        # burn-in ladder adaptation reuses one compiled artifact.
        cache = getattr(self.fns, "programs", None)
        key = (
            "pt_phase",
            self.ntemps,
            self.nwalkers,
            self.dim,
            self.a,
            accumulate,
            record,
            self.moves,
        )
        if cache is not None and key in cache:
            return cache[key]
        like_b, prior_b = self._batched_like_prior()
        prog = jax.jit(
            partial(
                run_pt,
                like_b,
                prior_b,
                self._images_fn(),
                a=self.a,
                accumulate=accumulate,
                record=record,
                ensemble_means_fn=getattr(
                    self.fns, "ensemble_carry_means", None
                ),
                moves=self.moves,
            ),
            static_argnames=("nsteps",),
        )
        if cache is not None:
            cache[key] = prog
        return prog

    def _device_betas(self):
        return jnp.asarray(self.betas, self.fns.dtype)

    def _burn_segment(self, n: int):
        final, _, _ = self._burn_prog(
            self.state, self._device_betas(), nsteps=n
        )
        self.state = final

    def _sample_segment(self, n: int):
        final, chain, lnprob = self._sample_prog(
            self.state, self._device_betas(), nsteps=n
        )
        self.state = final
        return (
            np.moveaxis(_fetch(chain), 0, 1),
            np.moveaxis(_fetch(lnprob), 0, 1),
        )

    # -- state management ---------------------------------------------------
    def _pt_sharding(self):
        """Walker-axis sharding lifted to the (ntemps, nwalkers, dim)
        layout: temps replicated, walkers split."""
        if self.sharding is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec

        spec = self.sharding.spec
        return NamedSharding(self.sharding.mesh, PartitionSpec(None, *spec))

    def init_state(self, p0, key=None):
        """Initialize from (nwalkers, dim) or (ntemps, nwalkers, dim)."""
        p0 = jnp.asarray(p0, self.fns.dtype)
        if p0.ndim == 2:
            p0 = jnp.broadcast_to(
                p0, (self.ntemps, self.nwalkers, self.dim)
            )
        pt_sharding = self._pt_sharding()
        if pt_sharding is not None:
            from ..parallel.multihost import put_sharded

            p0 = put_sharded(p0, pt_sharding)
        if key is None:
            self._key, key = jax.random.split(self._key)
        like_b, prior_b = self._batched_like_prior()
        flat = p0.reshape(self.ntemps * self.nwalkers, self.dim)
        lnl = like_b(flat).reshape(self.ntemps, self.nwalkers)
        lnp = prior_b(flat).reshape(self.ntemps, self.nwalkers)
        from .ensemble import fresh_image_accumulators

        # fresh small leaves are HOST numpy (multi-process placement;
        # see EnsembleSampler.init_state); accumulator keys + per-key
        # shapes from a shape-only trace (joint posteriors mix shapes)
        accum = fresh_image_accumulators(
            self._images_fn(), p0[0, 0], self.image_shape,
            self.accum_dtype,
        )
        # evidence accumulators match the COMPUTED lnL dtype: under x64
        # the priors' numpy-f64 hyperparameters promote lnL to f64 even
        # for an f32 posterior, and the scan carry must stay invariant
        dt = np.dtype(lnl.dtype)
        self.state = PTState(
            positions=p0,
            log_like=lnl,
            log_prior=lnp,
            accum=accum,
            accum_count=np.int32(0),
            naccept=np.zeros((self.ntemps, self.nwalkers), np.int32),
            nswap=np.zeros(self.ntemps - 1, np.int32),
            key=_fetch(key),
            lnl_sum=np.zeros(self.ntemps, dt),
            lnl_sum_c=np.zeros(self.ntemps, dt),
            lnl_sq_sum=np.zeros(self.ntemps, dt),
            lnl_sq_sum_c=np.zeros(self.ntemps, dt),
            evid_steps=np.int32(0),
            ss_max=np.full(self.ntemps - 1, -np.inf, dt),
            ss_sum=np.zeros(self.ntemps - 1, dt),
        )
        self._naccept = np.zeros(self.nwalkers, dtype=np.int64)
        return self.state

    def rejuvenate_stuck(self, random_state=None, floor_sigmas=20.0,
                         min_drop=50.0):
        """Per-rung burn-phase walker rescue (see
        :meth:`EnsembleSampler.rejuvenate_stuck`).

        Each rung's robust lnp floor uses its OWN tempered posterior
        (``beta * lnL + lnprior``), and donors come from the same rung
        — a hot-rung position teleported into the cold rung would be a
        likelihood outlier there by construction.  Like/prior vectors
        are recomputed in one batched eval afterwards.
        """
        rng = (
            random_state
            if isinstance(random_state, np.random.RandomState)
            else np.random.RandomState(random_state)
        )
        lnl = _fetch(self.state.log_like, np.float64)
        lpr = _fetch(self.state.log_prior, np.float64)
        lnp = np.asarray(self.betas, np.float64)[:, None] * lnl + lpr
        # np.array copy: _fetch of a JAX array is a READ-ONLY view
        pos = np.array(_fetch(self.state.positions, np.float64))
        total = 0
        for t in range(self.ntemps):
            row = lnp[t]
            finite = np.isfinite(row)
            if not finite.any():
                continue
            med = np.median(row[finite])
            mad = np.median(np.abs(row[finite] - med))
            floor = med - max(float(min_drop),
                              float(floor_sigmas) * 1.4826 * mad)
            stuck = ~finite | (row < floor)
            n_stuck = int(stuck.sum())
            if n_stuck == 0 or n_stuck >= self.nwalkers // 2:
                continue
            donors = rng.choice(np.flatnonzero(~stuck), size=n_stuck)
            pos[t, stuck] = pos[t, donors]
            total += n_stuck
        if total == 0:
            return 0
        p0 = jnp.asarray(pos, self.fns.dtype)
        pt_sharding = self._pt_sharding()
        if pt_sharding is not None:
            from ..parallel.multihost import put_sharded

            p0 = put_sharded(p0, pt_sharding)
        like_b, prior_b = self._batched_like_prior()
        flat = p0.reshape(self.ntemps * self.nwalkers, self.dim)
        self.state = replace(
            self.state,
            positions=p0,
            log_like=like_b(flat).reshape(self.ntemps, self.nwalkers),
            log_prior=prior_b(flat).reshape(self.ntemps, self.nwalkers),
        )
        return total

    def reset(self):
        self._chain = None
        self._lnprob = None
        self._naccept = np.zeros(self.nwalkers, dtype=np.int64)
        self._nsteps_total = 0
        if self.state is not None:
            def _z(v):
                return np.zeros(v.shape, np.dtype(v.dtype))

            s = self.state
            self.state = replace(
                s,
                naccept=_z(s.naccept),
                nswap=_z(s.nswap),
                accum_count=np.int32(0),
                accum={k: _z(v) for k, v in s.accum.items()},
                lnl_sum=_z(s.lnl_sum),
                lnl_sum_c=_z(s.lnl_sum_c),
                lnl_sq_sum=_z(s.lnl_sq_sum),
                lnl_sq_sum_c=_z(s.lnl_sq_sum_c),
                evid_steps=np.int32(0),
                ss_max=np.full(s.ss_max.shape, -np.inf, np.dtype(s.ss_max.dtype)),
                ss_sum=_z(s.ss_sum),
            )

    def _cold_naccept(self, state):
        return _fetch(state.naccept)[0]

    def run_burn(self, nsteps: int, segment=None, callback=None):
        """Burn-in with automatic ladder adaptation (when enabled).

        Runs in adaptation windows; after each window (except the last)
        the ladder is re-sized — first from the measured per-rung
        std(lnL) (pilot sizing), then by the proportional controller on
        the window's swap acceptances, with a decaying gain so the
        ladder settles well before burn-in ends.  The ladder is FROZEN
        for the retained phase.  ``betas`` being a runtime argument of
        the compiled program, adaptation costs no recompiles.
        """
        if not (self.adapt_ladder and self.ntemps > 1) or nsteps < 10:
            return super().run_burn(nsteps, segment=segment, callback=callback)

        window = max(5, min(nsteps // 12 if nsteps >= 60 else nsteps // 2, 250))
        delta = float(np.sqrt(-np.log(self.target_swap_accept)))
        done = 0
        while done < nsteps:
            n = min(window, nsteps - done)
            super().run_burn(n, segment=None, callback=None)
            done += n
            if done < nsteps:
                # Re-size from the measured per-rung lnL spread every
                # window: early windows overestimate sigma (chains not
                # yet equilibrated => ladder starts too tight), but the
                # estimate converges with burn-in and recent windows
                # dominate the geometric EMA.  The EMA runs on
                # u = sigma * beta — the ~beta-invariant spread scale —
                # so blending across windows stays valid while the
                # rungs themselves move.
                sig = np.std(
                    _fetch(self.state.log_like, np.float64), axis=1
                )
                u = np.maximum(sig, 1e-6) * self.betas
                if self._u_ema is None:
                    self._u_ema = u
                else:
                    self._u_ema = np.exp(
                        0.4 * np.log(self._u_ema) + 0.6 * np.log(u)
                    )
                self.betas = ladder_from_sigma(
                    self._u_ema / self.betas,
                    self.betas,
                    self.ntemps,
                    delta=delta,
                )
                self._adapt_t += 1
            if callback is not None:
                callback(done, nsteps)
        return self

    def checkpoint_payload(self):
        """Full resume state for ALL rungs (checkpoint v2).

        Persisting the complete ``(ntemps, nwalkers, dim)`` state means
        a resumed tempered run continues its hot rungs instead of
        re-paying their burn-in from the cold-rung positions.
        """
        s = self.state
        return {
            "version": 2,
            "ntemps": self.ntemps,
            "positions": _fetch(s.positions, np.float64),
            "log_prob": (
                _fetch(s.log_prior, np.float64)[0]
                + _fetch(s.log_like, np.float64)[0]
            ),
            "naccept": _fetch(s.naccept, np.int64),
            "nsteps": int(self._nsteps_total),
            "nswap": _fetch(s.nswap, np.int64),
            "betas": np.asarray(self.betas, np.float64),
            "key": _fetch(s.key).astype(np.uint32),
            "accum": (
                {k: _fetch(v) for k, v in s.accum.items()}
                if s.accum is not None
                else None
            ),
            "accum_count": int(_fetch(s.accum_count)),
            # _kahan_add keeps c = (t - s) - y, the overshoot to subtract
            # from the next input, so the exact running sum is s - c.
            "lnl_sum": _fetch(s.lnl_sum, np.float64)
            - _fetch(s.lnl_sum_c, np.float64),
            "lnl_sq_sum": _fetch(s.lnl_sq_sum, np.float64)
            - _fetch(s.lnl_sq_sum_c, np.float64),
            "evid_steps": int(_fetch(s.evid_steps)),
            "ss_max": _fetch(s.ss_max, np.float64),
            "ss_sum": _fetch(s.ss_sum, np.float64),
        }

    def restore_state(self, payload):
        """Rebuild device state from a checkpoint payload.

        A payload with matching ``ntemps`` restores every rung (and the
        swap counters); a cold-only payload (plain-sampler checkpoint,
        or a run checkpointed with different ``ntemps``) falls back to
        broadcasting the cold positions to all rungs, re-paying hot-rung
        burn-in.
        """
        positions = np.asarray(payload["positions"], np.float64)
        full = (
            positions.ndim == 3
            and int(payload.get("ntemps", 1)) == self.ntemps
        )
        if not full and positions.ndim == 3:
            from warnings import warn

            warn(
                f"checkpoint has {payload.get('ntemps')} tempering rungs "
                f"but ntemps={self.ntemps} was requested; hot rungs "
                "restart from the cold-rung positions"
            )
            positions = positions[0]
        betas = payload.get("betas")
        if full and betas is not None and np.shape(betas) == (self.ntemps,):
            # resume with the (possibly burn-adapted) ladder in force at
            # checkpoint time, and don't re-adapt a settled ladder
            self.betas = np.asarray(betas, np.float64)
            self._adapt_t = max(self._adapt_t, 1)
        key = jnp.asarray(payload["key"], jnp.uint32)
        self.init_state(positions, key=key)
        self._restore_accum(payload)
        naccept = payload.get("naccept")
        extra = {}
        if naccept is not None and np.shape(naccept) == (
            self.ntemps,
            self.nwalkers,
        ):
            extra["naccept"] = jnp.asarray(naccept, jnp.int32)
        nswap = payload.get("nswap")
        if full and nswap is not None and np.shape(nswap) == (self.ntemps - 1,):
            extra["nswap"] = jnp.asarray(nswap, jnp.int32)
        if full and payload.get("lnl_sum") is not None and np.shape(
            payload["lnl_sum"]
        ) == (self.ntemps,):
            dt = self.state.log_like.dtype
            extra["lnl_sum"] = jnp.asarray(payload["lnl_sum"], dt)
            extra["lnl_sum_c"] = jnp.zeros(self.ntemps, dt)
            extra["lnl_sq_sum"] = jnp.asarray(payload["lnl_sq_sum"], dt)
            extra["lnl_sq_sum_c"] = jnp.zeros(self.ntemps, dt)
            extra["evid_steps"] = jnp.asarray(
                int(payload.get("evid_steps", 0)), jnp.int32
            )
            extra["ss_max"] = jnp.asarray(payload["ss_max"], dt)
            extra["ss_sum"] = jnp.asarray(payload["ss_sum"], dt)
        if extra:
            self.state = replace(self.state, **extra)
        self._restore_counters(payload)
        return self.state

    # -- diagnostics ---------------------------------------------------------
    @property
    def tempered_acceptance_fraction(self):
        """(ntemps, nwalkers) move acceptance per rung."""
        total = max(self._nsteps_total, 1)
        return _fetch(self.state.naccept) / total

    @property
    def swap_acceptance_fraction(self):
        """(ntemps-1,) replica-swap acceptance per adjacent rung pair."""
        total = max(self._nsteps_total, 1) * self.nwalkers
        return _fetch(self.state.nswap) / total

    # -- evidence (marginal likelihood) --------------------------------------
    def _evid_means(self):
        t = max(int(_fetch(self.state.evid_steps)), 1)
        # Exact running sum is s - c (see _kahan_add: c is the overshoot).
        m = (
            _fetch(self.state.lnl_sum, np.float64)
            - _fetch(self.state.lnl_sum_c, np.float64)
        ) / t
        sq = (
            _fetch(self.state.lnl_sq_sum, np.float64)
            - _fetch(self.state.lnl_sq_sum_c, np.float64)
        ) / t
        return m, sq

    @property
    def rung_log_like_mean(self):
        """(ntemps,) mean untempered lnL per rung over the retained phase."""
        return self._evid_means()[0]

    @property
    def rung_log_like_std(self):
        """(ntemps,) std of untempered lnL per rung (retained phase)."""
        m, sq = self._evid_means()
        return np.sqrt(np.maximum(sq - m * m, 0.0))

    def log_evidence(self, method: str = "auto"):
        """Marginal-likelihood estimate ``(lnZ, dlnZ)`` from tempering.

        The evidence Z = ∫ prior(θ) · L(θ) dθ is what Bayesian model
        comparison needs (e.g. "does this quasar image require a host
        galaxy component?") — a capability the reference lacks
        entirely.  Estimated from the retained sampling phase's
        per-rung accumulators; the ladder should be
        :func:`evidence_beta_ladder` (spanning β = 1 … 0) — a
        mixing-oriented ladder that stops well short of β=0 leaves most
        of the integral to an extrapolated tail and the error bar says
        so.

        Methods:

        * ``'stepping-stone'`` — Xie et al. (2011): lnZ = Σ_k ln
          E_{β_{k+1}}[ L^{β_k − β_{k+1}} ], each expectation a streaming
          logsumexp over the hotter rung's retained samples.  Lower
          variance than quadrature; needs β to reach 0.
        * ``'ti'`` — thermodynamic integration, trapezoid of the
          per-rung mean lnL over β (plus a rectangle tail when the
          ladder stops at β_min > 0).
        * ``'auto'`` — stepping-stone when the ladder reaches β=0,
          else TI.

        The error estimate is the spread between independent
        estimators: |SS − TI| when both are valid, else the TI
        half-ladder quadrature difference.
        """
        if self.ntemps < 3:
            raise ValueError("evidence estimation needs ntemps >= 3")
        nsteps = int(_fetch(self.state.evid_steps))
        if nsteps == 0:
            raise RuntimeError(
                "no retained samples accumulated; run_sampling() first "
                "(burn-in does not feed the evidence accumulators)"
            )
        betas = np.asarray(self.betas, np.float64)
        mean_lnl = self.rung_log_like_mean
        reaches_prior = betas[-1] == 0.0

        def _ti(bs, ms):
            # betas descend, so the trapezoid comes out negated; close
            # the [0, beta_min] tail with a rectangle at the hottest
            # rung's mean when the ladder stops short of the prior
            trapezoid = getattr(np, "trapezoid", np.trapz)
            lnz = -float(trapezoid(ms, bs))
            if bs[-1] > 0:
                lnz += float(bs[-1] * ms[-1])
            return lnz

        idx = list(range(0, len(betas), 2))
        if idx[-1] != len(betas) - 1:
            idx.append(len(betas) - 1)
        lnz_ti = _ti(betas, mean_lnl)
        err_ti = abs(lnz_ti - _ti(betas[idx], mean_lnl[idx]))
        if betas[-1] > 0:
            # the [0, beta_min] rectangle is an EXTRAPOLATION (nothing
            # was sampled there); count its full magnitude as error so
            # mixing-ladder evidence numbers carry an honest bar
            err_ti += abs(float(betas[-1] * mean_lnl[-1]))

        # Resolution check: both estimators assume adjacent tempered
        # lnL distributions overlap, i.e. |dbeta| * std(lnL) = O(1) per
        # pair.  High-S/N imaging likelihoods (std(lnL) ~ sqrt(npix/2))
        # need correspondingly many rungs; warn instead of returning a
        # silently-biased number.
        sig = self.rung_log_like_std
        pair_width = np.abs(np.diff(betas)) * np.maximum(sig[:-1], sig[1:])
        if np.max(pair_width) > 4.0:
            from warnings import warn

            warn(
                "evidence ladder under-resolved: max |dbeta|*std(lnL) = "
                f"{np.max(pair_width):.1f} (want O(1)); increase ntemps "
                f"to ~{int(np.ceil(np.sum(pair_width))) + 2} rungs "
                "(rungs are a vmapped batch axis — cost is ~linear)"
            )

        if method == "auto":
            method = "stepping-stone" if reaches_prior else "ti"
        if method in ("stepping-stone", "ss"):
            if not reaches_prior:
                raise ValueError(
                    "stepping-stone needs a ladder reaching beta=0; use "
                    "betas=evidence_beta_ladder(ntemps) (or method='ti')"
                )
            n = nsteps * self.nwalkers
            ss_max = _fetch(self.state.ss_max, np.float64)
            ss_sum = _fetch(self.state.ss_sum, np.float64)
            ln_r = ss_max + np.log(ss_sum) - np.log(n)
            lnz = float(np.sum(ln_r))
            return lnz, abs(lnz - lnz_ti)
        if method == "ti":
            return lnz_ti, err_ti
        raise ValueError(f"unknown evidence method {method!r}")
