"""Gradient-based MAP optimization (beyond the reference).

psfMC users traditionally warm-start MCMC from a hand-run GALFIT
least-squares fit; here the framework does it natively.  The whole
render -> convolve -> likelihood chain is differentiable, so a
multi-start Adam ascent of the log-posterior in the unconstrained
reparameterization (``models/transforms.py``) finds the posterior mode
in a few hundred steps.  TPU-first shape: the starts are a vmapped
batch axis and the whole optimization is one ``lax.scan`` program — the
same batched-render machinery as the samplers, zero extra dispatches.

Uses: ``model_galaxy_mcmc(..., init='map')`` seeds the walkers/chains
from a tight cloud around the mode (in z-space, so every start is
in-support by construction); standalone :func:`fit_map` is a quick
point-estimate fit whose result feeds the same posterior-image writer
as the reference's MAP mode (reference images.py:59-67).

Reference anchors: start points are prior draws exactly like the
reference's init (models.py:108-130); the discrete PSF index — a
non-differentiable axis — is marginalized during the ascent (logsumexp
over the pre-FFT'd PSF stack) and assigned by argmax at the end.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .models.transforms import transform_token

__all__ = ["MAPResult", "fit_map", "laplace_covariance", "scatter_around"]


@dataclass
class MAPResult:
    """Outcome of :func:`fit_map`."""

    theta: np.ndarray  # (dim,) best parameter vector (constrained space)
    lnpost: float  # log-posterior at theta (discrete index substituted)
    psf_index: int  # argmax discrete PSF assignment (0 if none)
    all_theta: np.ndarray  # (n_starts, dim) per-start optima
    all_lnpost: np.ndarray  # (n_starts,) per-start best objective
    steps: int
    # Laplace approximation at the mode (fit_map(..., laplace=True)):
    # covariance / std over the CONTINUOUS slots, NaN rows at discrete
    # offsets.  None unless requested.
    cov: "np.ndarray | None" = None  # (dim, dim)
    theta_std: "np.ndarray | None" = None  # (dim,)


def _marginal_lnpost_fn(fns, transform):
    """z -> marginalized lnpost(theta(z)); the MAP objective.

    No transform Jacobian: the mode users want is argmax of the
    CONSTRAINED posterior density (what the reference's 'maximum' image
    mode renders), not of the z-space pushforward.
    """
    offsets = transform.discrete_offsets
    num_psfs = getattr(fns.spec, "num_psfs", 1)

    def lnpost(z):
        theta, _ld = transform.to_constrained(z)
        if len(offsets) == 0:
            return fns.log_posterior(theta)
        lps = jnp.stack(
            [
                fns.log_posterior(
                    theta.at[int(offsets[0])].set(
                        jnp.asarray(k, theta.dtype)
                    )
                )
                for k in range(num_psfs)
            ]
        )
        return jax.scipy.special.logsumexp(lps)

    return lnpost


def _cached_decode(fns, transform):
    """Batched z -> theta decoder, cached per transform signature
    (throwaway jit wrappers would recompile on every call — tunnel
    compiles take minutes)."""
    cache = getattr(fns, "programs", None)
    key = ("to_constrained_batch", transform_token(transform))
    if cache is not None and key in cache:
        return cache[key]
    fn = jax.jit(jax.vmap(lambda z: transform.to_constrained(z)[0]))
    if cache is not None:
        cache[key] = fn
    return fn


def _cached_batched_lnpost(fns):
    """(n, dim) -> (n,) posterior evaluator, cached on the fns."""
    fused = getattr(fns, "batched_lnpost", None)
    if fused is not None:
        return fused
    cache = getattr(fns, "programs", None)
    key = ("batched_lnpost_fallback",)
    if cache is not None and key in cache:
        return cache[key]
    fn = jax.jit(jax.vmap(fns.log_posterior))
    if cache is not None:
        cache[key] = fn
    return fn


def _prior_pool(spec, n, rng):
    """(n, dim) prior draws, column-assembled from the slot layout."""
    cols = []
    for slot in spec.slots:
        draws = np.stack(
            [
                np.ravel(np.asarray(slot.dist.random(random_state=rng)))
                for _ in range(n)
            ]
        )
        cols.append(draws.reshape(n, slot.size))
    return np.concatenate(cols, axis=1)


def laplace_covariance(posterior_fns, theta_map, transform=None):
    """(cov, std): Laplace approximation at an interior posterior mode.

    The curvature is taken directly in CONSTRAINED theta space over the
    continuous slots (``cov = inv(-H)`` with ``H`` the lnpost Hessian
    at the mode) — f64 on the host side of a single jitted Hessian
    evaluation.  Discrete slots get NaN rows/columns.  Only meaningful
    when the mode is interior to the prior support; a non-positive-
    definite ``-H`` (mode on a boundary or a saddle) returns NaN with a
    warning rather than fabricating error bars.
    """
    from .models.transforms import build_transform

    fns = posterior_fns
    transform = transform or build_transform(fns.spec, dtype=fns.dtype)
    offsets = np.asarray(transform.offsets, np.int64)
    dim = fns.spec.num_params
    theta_map = np.asarray(theta_map, np.float64)

    # theta_base is a RUNTIME argument (not a baked trace constant):
    # repeat calls on the same PosteriorFns — e.g. a second MAP whose
    # best discrete PSF index differs — must not hit a cached Hessian
    # conditioned on the first call's theta.  The offsets layout is
    # part of the cache key for the same reason (custom transforms).
    def lnpost_cont(x, theta_base):
        theta = theta_base.at[jnp.asarray(offsets)].set(x)
        return fns.log_posterior(theta)

    cache = getattr(fns, "programs", None)
    hkey = ("laplace_hessian", transform_token(transform))
    if cache is not None and hkey in cache:
        hess = cache[hkey]
    else:
        hess = jax.jit(jax.hessian(lnpost_cont, argnums=0))
        if cache is not None:
            cache[hkey] = hess

    # the posterior pins its own dtype internally; autodiff (no finite
    # differencing) keeps f32 curvature accurate to ~1e-4 relative —
    # ample for error bars.  Host-side linear algebra runs in f64.
    cov = np.full((dim, dim), np.nan)
    std = np.full(dim, np.nan)
    x0 = jnp.asarray(theta_map[offsets], fns.dtype)
    theta_base = jnp.asarray(theta_map, fns.dtype)
    try:
        H = np.asarray(hess(x0, theta_base), np.float64)
    except NotImplementedError:
        from warnings import warn

        # the PSFMC_KAPPA=newton gammaincinv path is only once-
        # differentiable (jax has no rule for igamma_grad_a's own
        # derivative); the default cubic-table kappa is C^2-smooth
        warn(
            "posterior is not twice-differentiable under the current "
            "PSFMC_KAPPA setting; Laplace covariance is NaN (use the "
            "default table-based kappa)"
        )
        return cov, std
    try:
        # inv via Cholesky of -H: fails (correctly) when not PD;
        # triangular solves, not explicit inverses (stabler, cheaper)
        from scipy.linalg import cho_factor, cho_solve

        cov_c = cho_solve(cho_factor(-H, lower=True), np.eye(len(H)))
    except (np.linalg.LinAlgError, ValueError):
        # LinAlgError: not PD; ValueError: NaN/inf curvature entries
        from warnings import warn

        warn(
            "Laplace curvature is not positive definite at the MAP "
            "(boundary mode or saddle); covariance is NaN"
        )
        return cov, std
    cov[np.ix_(offsets, offsets)] = cov_c
    std[offsets] = np.sqrt(np.diag(cov_c))
    return cov, std


def fit_map(
    posterior_fns,
    n_starts: int = 64,
    steps: int = 500,
    learning_rate: float = 0.05,
    seed: int = 0,
    p0: Optional[np.ndarray] = None,
    transform=None,
    laplace: bool = False,
):
    """Multi-start Adam MAP fit of the model posterior.

    :param posterior_fns: a ``PosteriorFns`` (or compatible: needs
        ``log_posterior``, ``spec``, ``dtype``).
    :param n_starts: independent starts (vmapped batch axis).  Imaging
        posteriors are multimodal (component swaps), so keep this
        generous — the cost is amortized by batching.
    :param steps: Adam steps (one ``lax.scan``; compiled once).
    :param p0: optional (m, dim) start pool in constrained space (e.g.
        prior draws from ``init_params_from_priors``).  More rows than
        ``n_starts`` keeps the highest-posterior ones.  ``None`` draws
        from the priors.
    :returns: :class:`MAPResult`.
    """
    import optax

    from .models.transforms import build_transform

    fns = posterior_fns
    spec = fns.spec
    transform = transform or build_transform(spec, dtype=fns.dtype)
    lnpost = _marginal_lnpost_fn(fns, transform)

    rng = np.random.RandomState(seed)
    if p0 is None:
        p0 = _prior_pool(spec, max(4 * n_starts, 128), rng)
    p0 = np.asarray(p0, np.float64)
    if p0.shape[0] > n_starts:
        # best-of-pool: same selection gradient-based inits need for
        # imaging likelihoods (gradients vanish far from sources)
        batched = _cached_batched_lnpost(fns)
        lnp = np.asarray(batched(jnp.asarray(p0, fns.dtype)))
        lnp = np.where(np.isfinite(lnp), lnp, -np.inf)
        p0 = p0[np.argsort(lnp)[::-1][:n_starts]]
    elif p0.shape[0] < n_starts:
        n_starts = p0.shape[0]
    z0 = jnp.asarray(transform.to_unconstrained(p0), fns.dtype)

    # pin the dtype: frozen numpy-f64 prior hyperparameters promote
    # lnpost to f64 under x64, which breaks the scan carry invariance
    neg_vg = jax.vmap(
        jax.value_and_grad(lambda z: (-lnpost(z)).astype(z.dtype))
    )
    opt = optax.adam(learning_rate)

    key = ("map_fit", n_starts, steps, float(learning_rate),
           transform_token(transform))
    cache = getattr(fns, "programs", None)
    if cache is not None and key in cache:
        program = cache[key]
    else:

        def program(z0):
            opt_state = opt.init(z0)

            def step(carry, _):
                z, opt_state, best_z, best_val = carry
                val, grad = neg_vg(z)
                # val is the objective AT z (pre-update); record that
                # pairing before stepping
                better = val < best_val
                best_val = jnp.where(better, val, best_val)
                best_z = jnp.where(better[:, None], z, best_z)
                # a start that wandered to a -inf/NaN pocket stops
                # moving rather than poisoning the Adam moments
                grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
                updates, opt_state = opt.update(grad, opt_state)
                z = optax.apply_updates(z, updates)
                return (z, opt_state, best_z, best_val), None

            init_val = jnp.full(z0.shape[0], jnp.inf, z0.dtype)
            (zf, _, best_z, best_val), _ = jax.lax.scan(
                step, (z0, opt_state, z0, init_val), None, length=steps
            )
            # the final iterate competes with the running best
            val_f, _ = neg_vg(zf)
            better = val_f < best_val
            best_val = jnp.where(better, val_f, best_val)
            best_z = jnp.where(better[:, None], zf, best_z)
            return best_z, -best_val

        program = jax.jit(program)
        if cache is not None:
            cache[key] = program

    best_z, best_lnp = program(z0)
    best_z = np.asarray(best_z, np.float64)
    best_lnp = np.asarray(best_lnp, np.float64)

    # back to constrained space + discrete assignment
    to_theta = _cached_decode(fns, transform)
    all_theta = np.array(to_theta(jnp.asarray(best_z, fns.dtype)), np.float64)

    i_best = int(np.nanargmax(np.where(np.isfinite(best_lnp), best_lnp, -np.inf)))
    theta = all_theta[i_best].copy()
    psf_index = 0
    offsets = transform.discrete_offsets
    if len(offsets) > 0:
        # per-start argmax assignment: every start's optimum gets ITS
        # best index (one batched eval over the (starts, psfs) grid)
        num_psfs = getattr(spec, "num_psfs", 1)
        off = int(offsets[0])
        cand = np.repeat(all_theta, num_psfs, axis=0)
        cand[:, off] = np.tile(np.arange(num_psfs), len(all_theta))
        batched = _cached_batched_lnpost(fns)
        lps = np.asarray(
            batched(jnp.asarray(cand, fns.dtype))
        ).reshape(len(all_theta), num_psfs)
        per_start = np.argmax(lps, axis=1)
        all_theta[:, off] = per_start
        psf_index = int(per_start[i_best])
        theta[off] = psf_index
        lnp_at_mode = float(lps[i_best, psf_index])
    else:
        lnp_at_mode = float(best_lnp[i_best])

    cov = std = None
    if laplace:
        cov, std = laplace_covariance(fns, theta, transform=transform)

    return MAPResult(
        theta=theta,
        lnpost=lnp_at_mode,
        psf_index=psf_index,
        all_theta=all_theta,
        all_lnpost=best_lnp,
        steps=steps,
        cov=cov,
        theta_std=std,
    )


def scatter_around(
    posterior_fns,
    theta_center: np.ndarray,
    n: int,
    scale: float = 0.25,
    seed: int = 0,
    transform=None,
):
    """(n, dim) walker cloud around a point, jittered in z-space.

    Jitter in the unconstrained space and map back, so every walker is
    inside the prior support (and satisfies reff >= reff_b) by
    construction — no rejection loop.  Discrete slots are re-drawn from
    their priors: giving every walker the center's index would freeze
    that coordinate forever under affine-invariant moves (proposals are
    spanned by the walker population — an all-equal coordinate has zero
    span).
    """
    from .models.transforms import build_transform

    fns = posterior_fns
    transform = transform or build_transform(fns.spec, dtype=fns.dtype)
    rng = np.random.RandomState(seed)
    z_c = transform.to_unconstrained(np.asarray(theta_center, np.float64))
    z = z_c[None, :] + scale * rng.randn(n, z_c.size)
    thetas = np.asarray(
        _cached_decode(fns, transform)(jnp.asarray(z, fns.dtype)),
        np.float64,
    )
    discrete = set(int(o) for o in transform.discrete_offsets)
    for slot in fns.spec.slots:
        if not slot.is_discrete or slot.offset not in discrete:
            continue
        draws = np.stack(
            [
                np.ravel(np.asarray(slot.dist.random(random_state=rng)))
                for _ in range(n)
            ]
        ).reshape(n, slot.size)
        thetas[:, slot.offset : slot.offset + slot.size] = draws
    return thetas
