"""Inverse-variance-weighted per-pixel log-likelihoods.

Gaussian parity with the reference inner loop
(``/root/reference/psfMC/models.py:228-241``): over good pixels only,

    lnL = -1/2 * sum( resid^2 * ivm - log(ivm / (2 pi)) )

plus two alternatives the reference lacks: a Student-t (robust
fitting: unmasked cosmic rays / residual artifacts get heavy-tailed
wings instead of quadratically dominating the fit) and a Poisson
(Cash-statistic) family for low-count imaging, where the Gaussian
IVM approximation biases fluxes.

Every produced function shares ONE signature,
``(resid, ivm, good_px, model=None)``: the Gaussian/Student families
ignore ``model``; the Poisson family needs it (its density is a
function of the model expectation and the observed counts
``model + resid``, not of the residual alone).

TPU-first design notes
----------------------
The reference uses boolean-mask fancy indexing (dynamic output shape);
under XLA we use a ``where``-masked dense reduction over the full static
image, which fuses with the residual/IVM math into one VPU pass.  The NaN
guard (reference models.py:240-241) is a ``jnp.where`` — no host branch.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = [
    "gaussian_lnlike",
    "student_t_lnlike",
    "poisson_lnlike",
    "make_lnlike",
    "gaussian_lnlike_pointwise",
    "student_t_lnlike_pointwise",
    "poisson_lnlike_pointwise",
    "make_lnlike_pointwise",
    "gaussian_cdf_pointwise",
    "student_t_cdf_pointwise",
    "poisson_cdf_pointwise",
    "make_cdf_pointwise",
]


def gaussian_lnlike(resid, ivm, good_px, model=None):
    """Masked Gaussian log-likelihood; NaN -> -inf (jittable).

    ``good_px`` is a boolean map (True = use the pixel); bad pixels
    carry ``ivm == 0`` (infinite variance), excluded by the ``where``.
    Defined as the sum of the pointwise map so the WAIC/PSIS-LOO
    decomposition holds BY CONSTRUCTION (single-twin rule; the -0.5
    factor is an exact power-of-two scale, so this is bitwise the
    -0.5 * sum(term) form).
    """
    lnl = jnp.sum(gaussian_lnlike_pointwise(resid, ivm, good_px))
    return jnp.where(jnp.isfinite(lnl), lnl, -jnp.inf)


def student_t_lnlike(resid, ivm, good_px, df, model=None):
    """Masked Student-t log-likelihood (robust; beyond the reference).

    Per good pixel, with scale ``sigma^2 = 1/ivm`` and ``df`` degrees
    of freedom (static):

        lnL = lnG((df+1)/2) - lnG(df/2) - 1/2 ln(df pi) + 1/2 ln(ivm)
              - (df+1)/2 * ln(1 + resid^2 ivm / df)

    Converges to :func:`gaussian_lnlike` as ``df -> inf``; at moderate
    ``df`` (3-8) an unmasked cosmic ray costs O(ln resid^2) instead of
    O(resid^2), so a handful of artifact pixels cannot drag the whole
    posterior.  Defined as the sum of the pointwise map (single-twin
    rule — see :func:`gaussian_lnlike`).
    """
    lnl = jnp.sum(student_t_lnlike_pointwise(resid, ivm, good_px, df))
    return jnp.where(jnp.isfinite(lnl), lnl, -jnp.inf)


def poisson_lnlike(resid, ivm, good_px, model, gain):
    """Masked Poisson log-likelihood (low-count imaging; Cash 1979).

    Beyond the reference: its Gaussian/IVM likelihood biases fluxes
    once pixel counts drop to O(10) (X-ray, UV, narrow-band imaging).
    ``model`` is the expected image in observation units and ``gain``
    converts observation units to detected counts, so per good pixel

        k  = gain * (model + resid)     (observed counts)
        mu = gain * model               (expected counts)
        lnL = k ln(mu) - mu - ln Gamma(k + 1)

    A good pixel whose expected counts are <= 0 is an invalid model
    state -> -inf (rejected proposal), NOT a masked pixel.  ``ivm``
    is unused (it defines the bad-pixel mask upstream only).  Defined
    as the sum of the pointwise map (single-twin rule — see
    :func:`gaussian_lnlike`).
    """
    lnl = jnp.sum(
        poisson_lnlike_pointwise(resid, ivm, good_px, model, gain)
    )
    return jnp.where(jnp.isnan(lnl), -jnp.inf, lnl)


def gaussian_lnlike_pointwise(resid, ivm, good_px, model=None):
    """Per-pixel Gaussian log-density map (analysis path).

    Returns an image-shaped array: each good pixel carries its own
    ``ln p(y_i | theta)`` term, bad pixels carry exactly 0 (they are
    not data points).  ``sum(pointwise) == gaussian_lnlike`` by
    construction (same masked term, same transcendentals), which the
    tests assert — the pointwise matrix feeding WAIC/PSIS-LOO must
    decompose the exact likelihood the sampler used.
    """
    from .fastmath import exp_log_fns

    _, log_ = exp_log_fns()
    term = resid * resid * ivm - log_(
        0.5 / jnp.pi * jnp.where(good_px, ivm, 1.0)
    )
    return jnp.where(good_px, -0.5 * term, 0.0)


def student_t_lnlike_pointwise(resid, ivm, good_px, df, model=None):
    """Per-pixel Student-t log-density map (see gaussian twin)."""
    from scipy.special import gammaln as h_gammaln

    from .fastmath import exp_log_fns

    _, log_ = exp_log_fns()
    df = float(df)
    norm = float(
        h_gammaln(0.5 * (df + 1.0))
        - h_gammaln(0.5 * df)
        - 0.5 * np.log(df * np.pi)
    )
    safe_ivm = jnp.where(good_px, ivm, 1.0)
    term = (
        norm
        + 0.5 * log_(safe_ivm)
        - (0.5 * (df + 1.0)) * log_(1.0 + resid * resid * ivm / df)
    )
    return jnp.where(good_px, term, 0.0)


def poisson_lnlike_pointwise(resid, ivm, good_px, model, gain):
    """Per-pixel Poisson log-density map (see :func:`poisson_lnlike`).

    ``ln Gamma(k+1)`` is evaluated on device (``k`` is traced in the
    batched-observation paths).  ``k`` is the continuous extension —
    non-integer scaled counts are fine as a fit statistic; the
    ``gammaln`` term is a per-dataset constant in ``theta`` so it
    cancels in sampling and is exact for integer counts.
    """
    import jax.scipy.special as jss

    from .fastmath import exp_log_fns

    _, log_ = exp_log_fns()
    gain = float(gain)
    mu = gain * model
    k = gain * (model + resid)  # gain * observed image
    ok = mu > 0
    safe_mu = jnp.where(ok, mu, 1.0)
    safe_k = jnp.where(good_px, k, 0.0)  # bad px may carry NaN obs
    term = safe_k * log_(safe_mu) - safe_mu - jss.gammaln(safe_k + 1.0)
    term = jnp.where(ok, term, -jnp.inf)
    return jnp.where(good_px, term, 0.0)


def make_lnlike_pointwise(kind="gaussian", df=4.0, gain=1.0):
    """Pointwise twin of :func:`make_lnlike`:
    ``(resid, ivm, good_px, model=None) -> (H, W)`` per-pixel
    log-density map (0 at masked pixels)."""
    if kind == "gaussian":
        return gaussian_lnlike_pointwise
    if kind == "student":
        if not np.isfinite(df) or df <= 0:
            raise ValueError(
                f"likelihood_df must be a positive finite number, got {df}"
            )

        def lnlike_pw(resid, ivm, good_px, model=None):
            return student_t_lnlike_pointwise(resid, ivm, good_px, df)

        return lnlike_pw
    if kind == "poisson":
        _check_gain(gain)

        def lnlike_pw(resid, ivm, good_px, model=None):
            return poisson_lnlike_pointwise(
                resid, ivm, good_px, model, gain
            )

        return lnlike_pw
    raise ValueError(
        f"Unknown likelihood {kind!r}: expected 'gaussian', 'student' "
        "or 'poisson'"
    )


def gaussian_cdf_pointwise(resid, ivm, good_px, model=None):
    """Per-pixel predictive CDF at the observation: P(y_rep <= y_obs).

    ``resid = y_obs - model``, so the standardized observation is
    ``resid * sqrt(ivm)`` and the CDF is ``Phi(resid * sqrt(ivm))``.
    Bad pixels carry 0.5 (excluded by the caller's mask; a neutral
    value keeps downstream reductions finite).  Feeds LOO-PIT.
    """
    import jax.scipy.special as jss

    z = resid * jnp.sqrt(jnp.where(good_px, ivm, 1.0))
    return jnp.where(good_px, jss.ndtr(z), 0.5)


def student_t_cdf_pointwise(resid, ivm, good_px, df, model=None):
    """Student-t twin of :func:`gaussian_cdf_pointwise` (static df).

    CDF via the regularized incomplete beta:
    ``F(t) = 1 - I_{df/(df+t^2)}(df/2, 1/2) / 2`` for ``t >= 0`` and
    ``F(-t) = 1 - F(t)``.
    """
    import jax.scipy.special as jss

    df = float(df)
    t = resid * jnp.sqrt(jnp.where(good_px, ivm, 1.0))
    x = df / (df + t * t)
    upper = 0.5 * jss.betainc(0.5 * df, 0.5, x)
    cdf = jnp.where(t >= 0, 1.0 - upper, upper)
    return jnp.where(good_px, cdf, 0.5)


def poisson_cdf_pointwise(resid, ivm, good_px, model, gain):
    """Poisson twin of :func:`gaussian_cdf_pointwise`.

    ``P(Y <= k) = Q(floor(k) + 1, mu)`` (regularized upper incomplete
    gamma).  Counts are discrete, so the PIT is only asymptotically
    uniform — negligible at the tens-of-counts-per-pixel level and
    above; at very low counts LOO-PIT's KS flag reads conservative
    (slightly anti-uniform even for a true model).
    """
    import jax.scipy.special as jss

    gain = float(gain)
    mu = gain * model
    k = gain * (model + resid)
    ok = good_px & (mu > 0)
    n = jnp.floor(jnp.maximum(jnp.where(good_px, k, 0.0), 0.0))
    cdf = jss.gammaincc(n + 1.0, jnp.where(ok, mu, 1.0))
    return jnp.where(ok, cdf, 0.5)


def _check_gain(gain):
    if not np.isfinite(gain) or gain <= 0:
        raise ValueError(
            "likelihood_gain must be a positive finite number "
            f"(counts per observation unit), got {gain}"
        )


def make_cdf_pointwise(kind="gaussian", df=4.0, gain=1.0):
    """Pointwise predictive-CDF factory matching :func:`make_lnlike`."""
    if kind == "gaussian":
        return gaussian_cdf_pointwise
    if kind == "student":
        if not np.isfinite(df) or df <= 0:
            raise ValueError(
                f"likelihood_df must be a positive finite number, got {df}"
            )

        def cdf_pw(resid, ivm, good_px, model=None):
            return student_t_cdf_pointwise(resid, ivm, good_px, df)

        return cdf_pw
    if kind == "poisson":
        _check_gain(gain)

        def cdf_pw(resid, ivm, good_px, model=None):
            return poisson_cdf_pointwise(resid, ivm, good_px, model, gain)

        return cdf_pw
    raise ValueError(
        f"Unknown likelihood {kind!r}: expected 'gaussian', 'student' "
        "or 'poisson'"
    )


def make_lnlike(kind="gaussian", df=4.0, gain=1.0):
    """Likelihood factory: ``(resid, ivm, good_px, model=None) ->
    scalar``.

    ``kind='gaussian'`` is the reference-parity default;
    ``kind='student'`` uses :func:`student_t_lnlike` with static
    ``df``; ``kind='poisson'`` uses :func:`poisson_lnlike` with static
    ``gain`` (and requires the caller to pass ``model``).
    """
    if kind == "gaussian":
        return gaussian_lnlike
    if kind == "student":
        if not np.isfinite(df) or df <= 0:
            raise ValueError(
                f"likelihood_df must be a positive finite number, got {df}"
            )

        def lnlike(resid, ivm, good_px, model=None):
            return student_t_lnlike(resid, ivm, good_px, df)

        return lnlike
    if kind == "poisson":
        _check_gain(gain)

        def lnlike(resid, ivm, good_px, model=None):
            return poisson_lnlike(resid, ivm, good_px, model, gain)

        return lnlike
    raise ValueError(
        f"Unknown likelihood {kind!r}: expected 'gaussian', 'student' "
        "or 'poisson'"
    )
