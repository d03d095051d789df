"""Numeric kernel parity tests: convolution, coords, gammaincinv."""
import numpy as np
import pytest
import scipy.special as sp

import jax.numpy as jnp

from psfmc_tpu.ops import (
    array_coords,
    convolve,
    coord_grids,
    gammaincinv_half,
    mag_to_flux,
    pad_and_rfft_image,
)


def _np_reference_convolve(img, fourier_kernel):
    """The reference's convolution semantics (utils.py:25-32) in numpy."""
    return np.fft.ifftshift(
        np.fft.irfft2(np.fft.rfft2(img) * fourier_kernel, s=img.shape)
    )


def test_pad_and_rfft_matches_numpy(rng):
    psf = rng.rand(16, 16)
    fk = pad_and_rfft_image(psf, (64, 64))
    pad = np.zeros((64, 64))
    pad[24:40, 24:40] = psf
    assert np.allclose(fk, np.fft.rfft2(pad))


def test_psf_larger_than_obs_rejected(rng):
    with pytest.raises(NotImplementedError):
        pad_and_rfft_image(rng.rand(16, 16), (8, 8))


@pytest.mark.parametrize("shape", [(64, 64), (31, 31), (33, 47)])
def test_convolve_matches_reference_semantics(rng, shape):
    img = rng.rand(*shape)
    psf = rng.rand(9, 9)
    fk = pad_and_rfft_image(psf, shape)
    want = _np_reference_convolve(img, fk)
    got = np.asarray(convolve(jnp.asarray(img), jnp.asarray(fk)))
    assert np.allclose(got, want, atol=1e-6)


def test_convolve_delta_identity(rng):
    """A centered delta kernel must reproduce the input (incl. odd sizes,
    which the reference acknowledges it corrupts, models.py:276)."""
    for shape in [(32, 32), (31, 31)]:
        img = rng.rand(*shape)
        delta = np.zeros((5, 5))
        delta[2, 2] = 1.0
        fk = pad_and_rfft_image(delta, shape)
        out = np.asarray(convolve(jnp.asarray(img), jnp.asarray(fk)))
        assert np.allclose(out, img, atol=1e-6)


def test_array_coords_convention():
    coords = array_coords((3, 5))
    assert coords.shape == (15, 2)
    # index i -> (x = i % W, y = i // W), matching reference utils.py:35-42
    assert np.array_equal(coords[7], [2, 1])
    xg, yg = coord_grids((3, 5))
    flat = np.stack([np.asarray(xg).ravel(), np.asarray(yg).ravel()], axis=1)
    assert np.allclose(flat, coords)


def test_mag_to_flux():
    assert mag_to_flux(25.0, 25.0) == pytest.approx(1.0)
    assert mag_to_flux(20.0, 25.0) == pytest.approx(100.0)


def test_gammaincinv_half_vs_scipy():
    a = np.concatenate(
        [np.linspace(0.15, 2.0, 30), np.linspace(2.0, 40.0, 40)]
    )
    got = np.asarray(gammaincinv_half(jnp.asarray(a, jnp.float64)))
    want = sp.gammaincinv(a, 0.5)
    assert np.allclose(got, want, rtol=1e-10)


def test_gammaincinv_half_f32():
    a = np.linspace(0.5, 20.0, 25)
    got = np.asarray(gammaincinv_half(jnp.asarray(a, jnp.float32)))
    want = sp.gammaincinv(a, 0.5)
    assert np.allclose(got, want, rtol=2e-3)


def test_gammaincinv_table_accuracy():
    from psfmc_tpu.ops.gammainc import gammaincinv_half_table

    a = np.concatenate(
        [np.linspace(0.05, 2.0, 50), np.linspace(2.0, 150.0, 60)]
    )
    got = np.asarray(gammaincinv_half_table(jnp.asarray(a, jnp.float64)))
    want = sp.gammaincinv(a, 0.5)
    assert np.allclose(got, want, rtol=1e-7)
    # extreme small-a edge stays accurate too (cubic interpolation)
    edge = np.asarray(gammaincinv_half_table(jnp.asarray([0.02], jnp.float64)))
    assert np.allclose(edge, sp.gammaincinv(0.02, 0.5), rtol=1e-6)


def test_convolve_rdft_matches_fft(rng):
    from psfmc_tpu.ops.fourier import convolve_rdft, rdft_matrices

    # even, odd, and rectangular shapes; batched input
    for shape, kshape in [((48, 48), (15, 15)), ((31, 33), (7, 5))]:
        img = rng.rand(3, *shape)
        psf = rng.rand(*kshape)
        fk = pad_and_rfft_image(psf, shape)
        want = np.asarray(convolve(jnp.asarray(img), jnp.asarray(fk)))
        mats = rdft_matrices(shape, np.float64)
        got = np.asarray(
            convolve_rdft(
                jnp.asarray(img),
                jnp.asarray(fk.real),
                jnp.asarray(fk.imag),
                mats,
            )
        )
        assert np.allclose(got, want, atol=1e-10)


def test_accurate_transcendentals():
    """Software exp/log reach ~1 ulp (TPU hw f32 log is ~1e-4 abs)."""
    import jax as _jax

    from psfmc_tpu.ops.fastmath import accurate_exp, accurate_log

    x = np.concatenate(
        [np.logspace(-30, 30, 50000), np.linspace(0.5, 2.0, 20000)]
    ).astype(np.float32)
    got = np.asarray(accurate_log(jnp.asarray(x)), np.float64)
    want = np.log(np.asarray(x, np.float64))
    assert np.abs(got - want).max() < 5e-6  # ~1 ulp of |log| <= 70
    big = np.abs(want) > 0.1
    assert (np.abs(got - want)[big] / np.abs(want)[big]).max() < 3e-7

    a = np.linspace(-87, 88, 50000).astype(np.float32)
    got = np.asarray(accurate_exp(jnp.asarray(a)), np.float64)
    want = np.exp(np.asarray(a, np.float64))
    assert (np.abs(got - want) / want).max() < 2e-7

    # edge semantics match jnp.log / jnp.exp
    edges = np.asarray(
        accurate_log(jnp.asarray([0.0, -1.0, np.inf, np.nan], jnp.float32))
    )
    assert edges[0] == -np.inf and np.isnan(edges[1])
    assert edges[2] == np.inf and np.isnan(edges[3])
    eedges = np.asarray(
        accurate_exp(jnp.asarray([-200.0, 200.0, np.nan, 0.0], jnp.float32))
    )
    assert eedges[0] == 0.0 and eedges[1] == np.inf
    assert np.isnan(eedges[2]) and eedges[3] == 1.0

    # top octave (88, 88.72]: still finite and ~1e-4 accurate (the 2^k
    # clip stretches the polynomial argument there); inf only past f32 max
    top = np.array([88.3, 88.6, 88.72], np.float32)
    got = np.asarray(accurate_exp(jnp.asarray(top)), np.float64)
    want = np.exp(np.asarray(top, np.float64))
    assert np.all(np.isfinite(got))
    assert (np.abs(got - want) / want).max() < 5e-4
    assert np.asarray(accurate_exp(jnp.float32(88.8))) == np.inf

    # float64 inputs fall through to the hardware ops (bit recipes are
    # f32-specific); dtype is preserved
    if _jax.config.jax_enable_x64:
        x64 = jnp.asarray([0.5, 2.0, 100.0], jnp.float64)
        assert accurate_log(x64).dtype == jnp.float64
        assert np.allclose(
            np.asarray(accurate_log(x64)), np.log(np.asarray(x64))
        )
        assert accurate_exp(x64).dtype == jnp.float64


def test_kappa_table_dtype_preserved():
    """The table path must not promote f32 inputs to f64 under x64
    (it would silently upcast the whole render chain)."""
    from psfmc_tpu.ops.gammainc import gammaincinv_half_table

    out = gammaincinv_half_table(jnp.asarray([2.0, 8.0], jnp.float32))
    assert out.dtype == jnp.float32


def test_accurate_transcendental_gradients():
    """The fastmath recipes carry EXACT custom derivative rules.

    Plain autodiff through the bit-twiddling implementations is
    silently wrong (the exponent term flows through integer bitcasts,
    zero cotangent) — this collapsed NUTS step-size adaptation on TPU.
    """
    import jax
    from psfmc_tpu.ops.fastmath import (
        accurate_exp,
        accurate_exp_unsafe,
        accurate_log,
        accurate_log_unsafe,
    )

    xs = np.asarray([1e-6, 0.1, 1.0, 7.3, 1e4, 1e30], np.float32)
    for fn in (accurate_log, accurate_log_unsafe):
        g = jax.vmap(jax.grad(fn))(jnp.asarray(xs))
        assert np.allclose(np.asarray(g), 1.0 / xs, rtol=1e-6), fn.__name__
    a = np.asarray([-40.0, -1.0, 0.0, 1.0, 30.0], np.float32)
    for fn in (accurate_exp, accurate_exp_unsafe):
        g = jax.vmap(jax.grad(fn))(jnp.asarray(a))
        assert np.allclose(
            np.asarray(g, np.float64), np.exp(a.astype(np.float64)),
            rtol=1e-5,
        ), fn.__name__


def test_fastmath_mode_selection(monkeypatch):
    """PSFMC_FASTMATH=1|0|mixed pick the documented (exp, log) pairs."""
    import jax.numpy as jnp

    from psfmc_tpu.ops import fastmath

    monkeypatch.setattr(fastmath.jax, "default_backend", lambda: "tpu")

    monkeypatch.setenv("PSFMC_FASTMATH", "1")
    assert fastmath.exp_log_fns() == (
        fastmath.accurate_exp, fastmath.accurate_log
    )
    monkeypatch.setenv("PSFMC_FASTMATH", "mixed")
    e, lg = fastmath.exp_log_fns()
    assert e is jnp.exp and lg is fastmath.accurate_log
    e, lg = fastmath.exp_log_fns_unsafe()
    assert e is jnp.exp and lg is fastmath.accurate_log_unsafe
    monkeypatch.setenv("PSFMC_FASTMATH", "0")
    assert fastmath.exp_log_fns() == (jnp.exp, jnp.log)
