"""Hartley/FFT primitive tests (ref: ``test/test_ducc_scipy_fft.py`` role —
pins the framework FFT against an independent implementation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nifty_tpu import config
from nifty_tpu.ops.harmonic import (
    fourier_mode_distributor,
    fourier_mode_lengths,
    hartley,
    hartley_via_c2c,
)


@pytest.mark.parametrize("shape", [(8,), (8, 6), (7,), (5, 7, 4), (4, 4, 4)])
def test_hartley_rfft_matches_c2c(rng, shape):
    x = jnp.asarray(rng.normal(size=shape))
    np.testing.assert_allclose(
        hartley(x), hartley_via_c2c(x), rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("shape", [(8, 6), (5, 7, 4)])
def test_hartley_axes_subset(rng, shape):
    x = jnp.asarray(rng.normal(size=shape))
    axes = (1,)
    np.testing.assert_allclose(
        hartley(x, axes=axes), hartley_via_c2c(x, axes=axes), rtol=1e-12,
        atol=1e-12,
    )


@pytest.mark.parametrize("convention",
                         ["canonical_hartley", "non_canonical_hartley"])
def test_hartley_involution(rng, convention):
    """H(H(x)) = N * x for the Hartley transform."""
    old = config.get("hartley_convention")
    config.update("hartley_convention", convention)
    try:
        x = jnp.asarray(rng.normal(size=(8, 6)))
        np.testing.assert_allclose(hartley(hartley(x)) / x.size, x, rtol=1e-12)
    finally:
        config.update("hartley_convention", old)


def test_hartley_self_adjoint(rng):
    x = jnp.asarray(rng.normal(size=(8, 6)))
    y = jnp.asarray(rng.normal(size=(8, 6)))
    lhs = jnp.vdot(hartley(x), y)
    rhs = jnp.vdot(x, hartley(y))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_mode_lengths_match_fftfreq():
    shape, dist = (8, 6), (0.5, 0.25)
    ml = fourier_mode_lengths(shape, dist)
    kx = np.abs(np.fft.fftfreq(8, d=0.5))
    ky = np.abs(np.fft.fftfreq(6, d=0.25))
    expected = np.sqrt(kx[:, None] ** 2 + ky[None, :] ** 2)
    np.testing.assert_allclose(ml, expected, rtol=1e-13)


def test_mode_distributor_consistency():
    idx, um, cnt = fourier_mode_distributor((16, 16), (1 / 16, 1 / 16))
    assert idx.shape == (16, 16)
    assert um.shape == cnt.shape
    assert cnt.sum() == 16 * 16
    ml = fourier_mode_lengths((16, 16), (1 / 16, 1 / 16))
    np.testing.assert_allclose(um[idx], ml, rtol=1e-10, atol=1e-10)
