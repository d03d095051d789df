"""Tied parameters: share another component's stochastic attribute.

Beyond the reference (GALFIT-style coupling psfMC lacks): e.g. pin the
quasar point source to its host galaxy's centroid.  The tie resolves to
the SAME parameter-vector slot at spec build, so it is exact by
construction and contributes no extra parameter or trace column.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models import (
    Configuration,
    PointSource,
    Sersic,
    Sky,
    Tied,
    build_model_spec,
    build_posterior,
)
from psfmc_tpu.models.multicomponent import MultiComponentModel


def _config(rng, h=24, w=24, noise=0.05):
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 12) ** 2 + (yy - 12) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()
    return Configuration(
        obs_file=0.05 + rng.randn(h, w) * noise,
        obsivm_file=np.full((h, w), 1.0 / noise**2),
        psf_files=psf,
        psfivm_files=np.full((h, w), 1e8),
        mag_zeropoint=25.0,
    )


def _host(xy_prior):
    return Sersic(
        xy=xy_prior,
        mag=D.Uniform(loc=20.0, scale=2.0),
        reff=D.Uniform(loc=1.0, scale=4.0),
        reff_b=D.Uniform(loc=1.0, scale=4.0),
        index=1.0,
        angle=0.0,
    )


def test_tied_xy_shares_slot():
    rng = np.random.RandomState(0)
    host = _host(D.Uniform(loc=np.array([8.0, 8.0]),
                           scale=np.array([8.0, 8.0])))
    ps = PointSource(xy=Tied(host, "xy"),
                     mag=D.Uniform(loc=21.0, scale=1.0))
    comps = [_config(rng), Sky(adu=0.05), host, ps]
    spec = build_model_spec(comps)

    # no slot (and no trace column) for the tied attribute
    assert "2_PointSource_xy" not in spec.param_names
    names_free = [n for n in spec.param_names]
    assert any(n.endswith("Sersic_xy") for n in names_free)

    # untied control has 2 more params
    host2 = _host(D.Uniform(loc=np.array([8.0, 8.0]),
                            scale=np.array([8.0, 8.0])))
    ps2 = PointSource(
        xy=D.Uniform(loc=np.array([8.0, 8.0]), scale=np.array([8.0, 8.0])),
        mag=D.Uniform(loc=21.0, scale=1.0),
    )
    spec2 = build_model_spec([_config(np.random.RandomState(0)),
                              Sky(adu=0.05), host2, ps2])
    assert spec2.num_params == spec.num_params + 2

    # rendering the tied model == rendering the untied model with the
    # PS positioned exactly at the host centroid
    fns = build_posterior(spec)
    fns2 = build_posterior(spec2)
    theta = np.asarray(
        MultiComponentModel(comps).init_params_from_priors(
            1, random_state=np.random.RandomState(1)
        )[0]
    )
    # untied layout: same values + duplicated xy in the PS slots
    i_xy = next(
        s for s in spec.slots if s.name.endswith("Sersic_xy")
    ).offset
    xy = theta[i_xy:i_xy + 2]
    i_ps2 = next(
        s for s in spec2.slots if s.name.endswith("PointSource_xy")
    ).offset
    theta2 = np.insert(theta, i_ps2, xy)
    img = np.asarray(fns.render_images(jnp.asarray(theta))["raw_model"])
    img2 = np.asarray(fns2.render_images(jnp.asarray(theta2))["raw_model"])
    np.testing.assert_allclose(img, img2, rtol=1e-6)

    # host-side dereference reads the referenced component
    MultiComponentModel(comps).param_values = theta
    assert np.allclose(np.ravel(ps.xy), xy)


def test_tied_to_constant_resolves_const():
    rng = np.random.RandomState(2)
    host = _host(np.array([11.0, 13.0]))  # constant centroid
    ps = PointSource(xy=Tied(host, "xy"),
                     mag=D.Uniform(loc=21.0, scale=1.0))
    spec = build_model_spec([_config(rng), host, ps])
    cs = next(c for c in spec.comp_specs if c.kind == "pointsource")
    kind, payload = cs.params["xy"]
    assert kind == "const"
    assert np.allclose(payload, [11.0, 13.0])


def test_tied_chain_and_cycle():
    rng = np.random.RandomState(3)
    host = _host(D.Uniform(loc=np.array([8.0, 8.0]),
                           scale=np.array([8.0, 8.0])))
    ps1 = PointSource(xy=Tied(host, "xy"),
                      mag=D.Uniform(loc=21.0, scale=1.0))
    ps2 = PointSource(xy=Tied(ps1, "xy"),
                      mag=D.Uniform(loc=21.5, scale=1.0))
    spec = build_model_spec([_config(rng), host, ps1, ps2])
    kinds = [c.params["xy"] for c in spec.comp_specs
             if c.kind == "pointsource"]
    assert kinds[0] == kinds[1]  # chain resolves to the host slot

    a = PointSource(xy=None, mag=D.Uniform(loc=21.0, scale=1.0))
    b = PointSource(xy=Tied(a, "xy"), mag=D.Uniform(loc=21.0, scale=1.0))
    a.xy = Tied(b, "xy")
    with pytest.raises(ValueError, match="cycle"):
        build_model_spec([_config(np.random.RandomState(4)), a, b])


def test_tied_in_model_file_dsl(tmp_path):
    """Model-file DSL: assigned components are collected (once) so a
    tie can name its target."""
    from psfmc_tpu.io import fits
    from psfmc_tpu.model_parser import component_list_from_string
    from psfmc_tpu.models.components import ComponentBase

    rng = np.random.RandomState(11)
    h = w = 24
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    psf = np.exp(-((xx - 12) ** 2 + (yy - 12) ** 2) / (2 * 1.2**2))
    psf /= psf.sum()
    fits.writeto(str(tmp_path / "sci.fits"),
                 (0.05 + rng.randn(h, w) * 0.05).astype(np.float32))
    fits.writeto(str(tmp_path / "ivm.fits"),
                 np.full((h, w), 400.0, np.float32))
    fits.writeto(str(tmp_path / "psf.fits"), psf.astype(np.float32))
    fits.writeto(str(tmp_path / "pivm.fits"),
                 np.full((h, w), 1e8, np.float32))
    src = """
from numpy import array
total_mag = 20.7
Configuration(obs_file='sci.fits', obsivm_file='ivm.fits',
              psf_files='psf.fits', psfivm_files='pivm.fits',
              mag_zeropoint=25.0)
Sky(adu=Normal(loc=0.05, scale=0.05))
host = Sersic(xy=Uniform(loc=array([8., 8.]), scale=array([8., 8.])),
              mag=Uniform(loc=total_mag, scale=2.0),
              reff=Uniform(loc=1.0, scale=4.0),
              reff_b=Uniform(loc=1.0, scale=4.0),
              index=1.0, angle=0.0)
host
PointSource(xy=Tied(host, 'xy'), mag=Uniform(loc=20.2, scale=1.5))
"""
    comps = component_list_from_string(src, model_dir=str(tmp_path))
    kinds = [type(c).__name__ for c in comps]
    # the assigned host joins at its BARE-EXPRESSION position (assigning
    # alone does not add it — reference ordering semantics), exactly once
    assert kinds == ["Configuration", "Sky", "Sersic", "PointSource"]
    assert all(isinstance(c, ComponentBase) for c in comps)
    spec = build_model_spec(comps)
    assert not any(n.endswith("PointSource_xy") for n in spec.param_names)
    # scalar assignment (total_mag) was filtered, not appended
    fns = build_posterior(spec)
    model = MultiComponentModel(comps)
    theta = model.init_params_from_priors(
        2, random_state=np.random.RandomState(12)
    )
    lnp = np.asarray(jax.vmap(fns.log_posterior)(jnp.asarray(theta)))
    assert np.all(np.isfinite(lnp))

    # a component assigned but never mentioned is DROPPED with a warning
    src_orphan = src.replace("host\nPointSource", "PointSource")
    with pytest.warns(UserWarning, match="never.*mentioned"):
        comps2 = component_list_from_string(
            src_orphan, model_dir=str(tmp_path)
        )
    assert [type(c).__name__ for c in comps2] == [
        "Configuration", "Sky", "PointSource",
    ]

    # host-side Tied cycle dereference raises cleanly, not RecursionError
    a = PointSource(xy=None, mag=D.Uniform(loc=21.0, scale=1.0))
    b = PointSource(xy=Tied(a, "xy"), mag=D.Uniform(loc=21.0, scale=1.0))
    a.xy = Tied(b, "xy")
    with pytest.raises(ValueError, match="cycle"):
        _ = a.xy


def test_tied_fit_recovers_cocentered_source():
    """End-to-end: tied-xy fit recovers an injected co-centered scene."""
    rng = np.random.RandomState(5)
    host = _host(D.Uniform(loc=np.array([9.0, 9.0]),
                           scale=np.array([6.0, 6.0])))
    ps = PointSource(xy=Tied(host, "xy"),
                     mag=D.Uniform(loc=20.5, scale=1.5))
    comps = [_config(rng), Sky(adu=D.Normal(loc=0.05, scale=0.05)),
             host, ps]
    model = MultiComponentModel(comps)

    # inject through the framework's own renderer
    mock, truth = model.simulate(random_state=7)
    from psfmc_tpu.sampler import EnsembleSampler

    spec = build_model_spec(
        [_config(np.random.RandomState(5)),
         Sky(adu=D.Normal(loc=0.05, scale=0.05)), host, ps]
    )
    spec.obs_data = mock.astype(np.float64)
    fns = build_posterior(spec)
    nw = 2 * spec.num_params + 2
    p0 = model.init_params_from_priors(
        nw, random_state=np.random.RandomState(8)
    )
    s = EnsembleSampler(nw, spec.num_params, fns, seed=9)
    s.init_state(p0)
    s.run_burn(300)
    s.reset()
    s.run_sampling(300)
    flat = s.flatchain
    # assert recovery of the TIED quantity (the shared centroid, sharply
    # constrained by the blended source) — the PS/host mag split has a
    # tau~180 flux-sharing degeneracy that 300 retained steps cannot
    # resolve, and the render-equality test above already proves the
    # tie's slot semantics exactly
    xy_slot = next(sl for sl in spec.slots if sl.name.endswith("Sersic_xy"))
    for j in range(xy_slot.size):
        col = flat[:, xy_slot.offset + j]
        mean, std = col.mean(), col.std()
        assert abs(mean - truth[xy_slot.offset + j]) < 6 * max(std, 1e-2), (
            mean, std, truth[xy_slot.offset + j]
        )
    assert np.all(np.isfinite(s.lnprobability))

    # draw_batch skips nothing here (no tied constraint operands) but
    # must also survive a model where a Sersic constraint operand IS
    # tied: build one and draw
    donor = _host(D.Uniform(loc=np.array([8.0, 8.0]),
                            scale=np.array([8.0, 8.0])))
    tied_sersic = Sersic(
        xy=D.Uniform(loc=np.array([8.0, 8.0]), scale=np.array([8.0, 8.0])),
        mag=D.Uniform(loc=20.0, scale=2.0),
        reff=Tied(donor, "reff"),
        reff_b=D.Uniform(loc=0.5, scale=2.0),
        index=1.0,
        angle=0.0,
    )
    m2 = MultiComponentModel(
        [_config(np.random.RandomState(6)), donor, tied_sersic]
    )
    draws = m2.init_params_from_priors(
        32, random_state=np.random.RandomState(10)
    )
    assert draws.shape == (32, m2.num_params)
    assert np.all(np.isfinite(draws))
