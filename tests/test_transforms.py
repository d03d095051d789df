"""Unconstraining transform: round trip, Jacobian, dependent bounds."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import Configuration, PointSource, Sersic, Sky
from psfmc_tpu.models.spec import build_model_spec
from psfmc_tpu.models.transforms import build_transform


@pytest.fixture()
def spec(rng, gaussian_psf):
    obs = 0.1 + rng.randn(32, 32) * 0.01
    config = Configuration(
        obs_file=obs,
        obsivm_file=np.full((32, 32), 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e6,
        mag_zeropoint=25.0,
    )
    return build_model_spec([
        config,
        Sky(adu=D.Normal(loc=0.1, scale=0.05)),
        PointSource(
            xy=D.Uniform(loc=np.array([8.0, 8.0]), scale=np.array([16.0, 16.0])),
            mag=D.Uniform(loc=19.0, scale=3.0),
        ),
        Sersic(
            xy=D.Uniform(loc=np.array([8.0, 8.0]), scale=np.array([16.0, 16.0])),
            mag=D.Uniform(loc=20.0, scale=3.0),
            reff=D.Uniform(loc=1.0, scale=7.0),
            reff_b=D.Uniform(loc=1.0, scale=7.0),
            index=D.WeibullMinimum(c=1.5, scale=4),  # support (0, inf)
            angle=D.Uniform(loc=0.0, scale=180.0),
            angle_degrees=True,
        ),
    ])


def test_roundtrip_and_support(spec, rng):
    tr = build_transform(spec, dtype=jnp.float64)
    assert tr.num_unconstrained == spec.num_params  # single PSF: no discrete
    z = rng.randn(tr.num_unconstrained) * 2.0
    theta, ld = tr.to_constrained(z)
    theta = np.asarray(theta)
    assert np.isfinite(ld)
    # every element lands inside its prior's support
    from psfmc_tpu.models.posterior import build_posterior

    fns = build_posterior(spec, dtype=jnp.float64)
    assert np.isfinite(float(fns.log_prior(jnp.asarray(theta))))
    # reff >= reff_b by construction
    names = spec.param_names
    i_reff = names.index("2_Sersic_reff")
    i_reffb = names.index("2_Sersic_reff_b")
    off = {s.name: s.offset for s in spec.slots}
    assert theta[off["2_Sersic_reff"]] >= theta[off["2_Sersic_reff_b"]]
    # inverse round trip
    z2 = tr.to_unconstrained(theta)
    theta2, _ = tr.to_constrained(jnp.asarray(z2))
    assert np.allclose(np.asarray(theta2), theta, atol=1e-8)


def test_logdet_matches_autodiff_jacobian(spec, rng):
    tr = build_transform(spec, dtype=jnp.float64)
    z = jnp.asarray(rng.randn(tr.num_unconstrained) * 1.5)
    _, ld = tr.to_constrained(z)
    x_of_z = lambda zz: tr.to_constrained(zz)[0][jnp.asarray(tr.offsets)]
    J = jax.jacfwd(x_of_z)(z)
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    assert sign > 0
    assert np.isclose(float(ld), logdet, atol=1e-8)


def test_reffb_follows_reff_bound(spec, rng):
    """Push reff to its lower edge: reff_b must squeeze below it."""
    tr = build_transform(spec, dtype=jnp.float64)
    zb, za, _kb = tr.reffb_pairs[0]
    z = rng.randn(tr.num_unconstrained)
    z = np.asarray(z)
    z[za] = -8.0  # reff ~ its lower bound (1.0)
    z[zb] = 8.0  # reff_b at its (dependent) upper edge
    theta, ld = tr.to_constrained(jnp.asarray(z))
    theta = np.asarray(theta)
    off = {s.name: s.offset for s in spec.slots}
    reff = theta[off["2_Sersic_reff"]]
    reffb = theta[off["2_Sersic_reff_b"]]
    assert reff == pytest.approx(1.0, abs=1e-2)
    assert reffb <= reff
    assert np.isfinite(ld)


def test_gradients_finite_everywhere(spec, rng):
    from psfmc_tpu.models.posterior import build_posterior

    tr = build_transform(spec, dtype=jnp.float64)
    fns = build_posterior(spec, dtype=jnp.float64)

    def lnpost_u(z):
        theta, ld = tr.to_constrained(z)
        return fns.log_posterior(theta) + ld

    for scale in (0.1, 2.0, 6.0):
        z = jnp.asarray(rng.randn(tr.num_unconstrained) * scale)
        val, grad = jax.value_and_grad(lnpost_u)(z)
        assert np.isfinite(float(val)), scale
        assert np.all(np.isfinite(np.asarray(grad))), scale


def test_discrete_slot_excluded(rng, gaussian_psf):
    psf2 = np.roll(gaussian_psf, 1, axis=0)
    obs = 0.1 + rng.randn(32, 32) * 0.01
    config = Configuration(
        obs_file=obs,
        obsivm_file=np.full((32, 32), 1e4),
        psf_files=[gaussian_psf, psf2],
        psfivm_files=[np.ones_like(gaussian_psf) * 1e6] * 2,
        mag_zeropoint=25.0,
    )
    spec = build_model_spec([
        config, Sky(adu=D.Normal(loc=0.1, scale=0.05)),
    ])
    tr = build_transform(spec)
    assert tr.num_unconstrained == spec.num_params - 1
    assert len(tr.discrete_offsets) == 1


@pytest.mark.parametrize("minor_prior", ["weibull", "normal", "const_major"])
def test_dependent_bound_with_nonintervalled_minor(rng, gaussian_psf,
                                                   minor_prior):
    """The dependent minor-axis bound must compose with ANY prior
    support kind — a lower-bounded (Weibull) or unbounded (Normal)
    reff_b prior previously hit the hi=0 placeholder and collapsed the
    transform to ld=-inf everywhere."""
    obs = 0.1 + rng.randn(32, 32) * 0.01
    config = Configuration(
        obs_file=obs,
        obsivm_file=np.full((32, 32), 1e4),
        psf_files=gaussian_psf,
        psfivm_files=np.ones_like(gaussian_psf) * 1e6,
        mag_zeropoint=25.0,
    )
    if minor_prior == "weibull":
        reff, reff_b = D.Uniform(loc=1.0, scale=7.0), D.WeibullMinimum(
            c=2.0, scale=3.0
        )
    elif minor_prior == "normal":
        reff, reff_b = D.Uniform(loc=1.0, scale=7.0), D.Normal(
            loc=3.0, scale=1.0
        )
    else:  # constant major axis with a lower-bounded minor prior
        reff, reff_b = 5.0, D.WeibullMinimum(c=2.0, scale=3.0)
    spec = build_model_spec([
        config,
        Sersic(
            xy=D.Uniform(loc=np.array([8.0, 8.0]),
                         scale=np.array([16.0, 16.0])),
            mag=D.Uniform(loc=20.0, scale=3.0),
            reff=reff,
            reff_b=reff_b,
            index=1.5,
            angle=30.0,
            angle_degrees=True,
        ),
    ])
    tr = build_transform(spec, dtype=jnp.float64)
    off = {s.name: s.offset for s in spec.slots}
    i_b = off["0_Sersic_reff_b"]

    z = rng.randn(32, tr.num_unconstrained) * 2.0
    thetas, lds = jax.vmap(tr.to_constrained)(jnp.asarray(z))
    thetas, lds = np.asarray(thetas), np.asarray(lds)
    assert np.all(np.isfinite(lds)), "transform must not be -inf a.e."
    major = (
        thetas[:, off["0_Sersic_reff"]]
        if minor_prior != "const_major"
        else 5.0
    )
    assert np.all(thetas[:, i_b] <= major + 1e-9)
    if minor_prior != "normal":
        assert np.all(thetas[:, i_b] > 0)

    # round trip through the inverse
    z2 = tr.to_unconstrained(thetas)
    thetas2, _ = jax.vmap(tr.to_constrained)(jnp.asarray(z2))
    assert np.allclose(np.asarray(thetas2), thetas, rtol=1e-6, atol=1e-6)
