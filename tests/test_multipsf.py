"""Multi-PSF models: the PSF choice is a discrete free parameter.

Reference behavior (PSFSelector.py:27-43): >1 PSF => DiscreteUniform
index over the stack, inter-PSF mismatch variance propagated into each
variance map, all PSFs pre-FFT'd.  The sampler treats the index as a
continuous coordinate that rounds on use (emcee float-chain semantics).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import Configuration, PointSource, Sky
from psfmc_tpu.models.posterior import build_posterior
from psfmc_tpu.models.spec import build_model_spec
from psfmc_tpu.sampler.ensemble import EnsembleSampler


@pytest.fixture()
def two_psf_model(rng):
    h = w = 32
    yy, xx = np.mgrid[0:16, 0:16].astype(float)
    narrow = np.exp(-((xx - 8) ** 2 + (yy - 8) ** 2) / (2 * 1.0**2))
    narrow /= narrow.sum()
    wide = np.exp(-((xx - 8) ** 2 + (yy - 8) ** 2) / (2 * 3.0**2))
    wide /= wide.sum()

    # data made with the NARROW psf
    truth = np.full((h, w), 0.01)
    truth[15, 17] += 50.0
    pad = np.zeros((h, w))
    pad[8:24, 8:24] = narrow
    obs = np.fft.ifftshift(
        np.fft.irfft2(np.fft.rfft2(truth) * np.fft.rfft2(pad), s=(h, w))
    )
    obs += rng.randn(h, w) * 0.02
    ivm = np.full((h, w), 1 / 0.02**2)

    config = Configuration(
        obs_file=obs,
        obsivm_file=ivm,
        psf_files=[narrow, wide],
        psfivm_files=[np.ones_like(narrow) * 1e8] * 2,
        mag_zeropoint=25.0,
    )
    comps = [
        config,
        Sky(adu=D.Normal(loc=0.01, scale=0.05)),
        PointSource(
            xy=D.Uniform(loc=np.array([14.0, 12.0]), scale=np.array([6.0, 6.0])),
            mag=D.Uniform(loc=20.0, scale=2.0),
        ),
    ]
    return build_model_spec(comps)


def test_psf_index_is_free_parameter(two_psf_model):
    spec = two_psf_model
    assert spec.param_names[-1] == "PSF_Index"
    assert spec.num_psfs == 2
    # mismatch variance propagated: stacks differ from lone-psf ffts
    assert spec.f_var_stack.shape[0] == 2


def test_sampler_prefers_correct_psf(two_psf_model, rng):
    spec = two_psf_model
    fns = build_posterior(spec, dtype=jnp.float64)

    nwalkers = 16
    # start walkers split between both PSF hypotheses
    p0 = np.column_stack(
        [
            rng.normal(0.01, 0.01, nwalkers),
            rng.uniform(20.6, 21.0, nwalkers),
            rng.uniform(16.5, 17.5, nwalkers),
            rng.uniform(14.5, 15.5, nwalkers),
            np.tile([0.0, 1.0], nwalkers // 2),
        ]
    )
    s = EnsembleSampler(nwalkers, 5, fns, seed=11)
    s.init_state(p0)
    s.run_burn(150)
    s.reset()
    s.run_sampling(150)

    idx_trace = np.rint(s.flatchain[:, -1])
    # indices stay in-range under the DiscreteUniform prior
    assert set(np.unique(idx_trace)) <= {0.0, 1.0}
    # the narrow PSF (index 0) made the data; posterior should prefer it
    assert (idx_trace == 0).mean() > 0.9


def test_fit_map_marginalizes_and_assigns_psf(two_psf_model, rng):
    """fit_map on a multi-PSF model: the ascent marginalizes the
    discrete index (logsumexp over the pre-FFT'd stack) and the final
    assignment picks the PSF the data were made with (the narrow one,
    index 0)."""
    from psfmc_tpu.optimize import fit_map

    spec = two_psf_model
    fns = build_posterior(spec, dtype=jnp.float64)

    pool = np.column_stack(
        [
            rng.normal(0.01, 0.02, 128),
            rng.uniform(20.0, 22.0, 128),
            rng.uniform(14.0, 20.0, 128),
            rng.uniform(12.0, 18.0, 128),
            rng.randint(0, 2, 128).astype(float),
        ]
    )
    res = fit_map(fns, n_starts=16, steps=250, p0=pool, seed=2)
    assert res.psf_index == 0
    assert res.theta[-1] == 0.0
    # position recovered (data: delta at x=17, y=15)
    assert abs(res.theta[2] - 17.0) < 0.3
    assert abs(res.theta[3] - 15.0) < 0.3


def test_psf_oversample_binning(rng):
    """psf_oversample: block binning is flux-preserving and a
    Configuration with a 4x-oversampled PSF equals one given the
    pre-binned PSF directly."""
    import jax.numpy as jnp

    from psfmc_tpu import distributions as D
    from psfmc_tpu.io.preprocess import bin_psf
    from psfmc_tpu.models.components import Configuration, PointSource
    from psfmc_tpu.models.posterior import build_posterior
    from psfmc_tpu.models.spec import build_model_spec

    n = 4
    yy, xx = np.mgrid[0:32 * n, 0:32 * n].astype(float)
    cen = (32 * n - 1) / 2.0
    fine = np.exp(-((xx - cen) ** 2 + (yy - cen) ** 2) / (2 * (1.5 * n) ** 2))
    fine /= fine.sum()
    fine_ivm = np.full_like(fine, 1e8)

    binned, var = bin_psf(fine, 1.0 / fine_ivm, n)
    assert binned.shape == (32, 32)
    assert binned.sum() == pytest.approx(1.0, rel=1e-12)
    want = fine.reshape(32, n, 32, n).sum(axis=(1, 3))
    assert np.allclose(binned, want)
    assert np.allclose(var, (1.0 / fine_ivm).reshape(
        32, n, 32, n).sum(axis=(1, 3)))

    obs = 0.1 + rng.randn(64, 64) * 0.01

    def config(psf, ivm, oversample):
        return Configuration(
            obs_file=obs,
            obsivm_file=np.full((64, 64), 1e4),
            psf_files=psf,
            psfivm_files=ivm,
            mag_zeropoint=25.0,
            psf_oversample=oversample,
        )

    comps = lambda cfg: [
        cfg,
        PointSource(
            xy=D.Uniform(loc=(20.0, 20.0), scale=(24.0, 24.0)),
            mag=D.Uniform(loc=19.0, scale=3.0),
        ),
    ]
    spec_fine = build_model_spec(comps(config(fine, fine_ivm, n)))
    spec_binned = build_model_spec(
        comps(config(binned, np.full((32, 32), 1.0) / np.maximum(var, 1e-30),
                     1))
    )
    fns_fine = build_posterior(spec_fine, dtype=jnp.float64)
    fns_binned = build_posterior(spec_binned, dtype=jnp.float64)
    theta = jnp.asarray([20.5, 31.3, 30.8])
    i1 = np.asarray(fns_fine.render_images(theta)["convolved_model"])
    i2 = np.asarray(fns_binned.render_images(theta)["convolved_model"])
    assert np.allclose(i1, i2, rtol=1e-10, atol=1e-14)
    assert float(fns_fine.log_posterior(theta)) == pytest.approx(
        float(fns_binned.log_posterior(theta)), rel=1e-10
    )

    with pytest.raises(ValueError):
        config(fine[:-1], fine_ivm[:-1], n)
