"""MXU four-step DFT vs NumPy FFT oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from wavespec_tpu.kernels import dft_factors, irfft_mxu, rfft_mxu


def rng(seed=0):
    return np.random.default_rng(seed)


def test_factors():
    assert dft_factors(4096) == (64, 64)
    assert dft_factors(8192) == (64, 128)
    assert dft_factors(16384) == (128, 128)
    assert dft_factors(262144) == (512, 512)
    with pytest.raises(ValueError):
        dft_factors(1000)


@pytest.mark.parametrize("n", [64, 256, 1024, 4096, 8192])
def test_rfft_mxu_matches_numpy(n):
    x = rng(n).standard_normal((3, n)).astype(np.float32)
    want = np.fft.rfft(x.astype(np.float64))[:, : n // 2]
    got = np.asarray(rfft_mxu(jnp.asarray(x)))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got.real, want.real, atol=scale * 2e-6)
    np.testing.assert_allclose(got.imag, want.imag, atol=scale * 2e-6)


def test_rfft_mxu_large_window():
    n = 32768
    x = rng(7).standard_normal(n).astype(np.float32)
    want = np.fft.rfft(x.astype(np.float64))[: n // 2]
    got = np.asarray(rfft_mxu(jnp.asarray(x)))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got.real, want.real, atol=scale * 5e-6)
    np.testing.assert_allclose(got.imag, want.imag, atol=scale * 5e-6)


def test_irfft_roundtrip():
    n = 1024
    # Band-limited input: the n/2-bin contract drops the Nyquist bin.
    spec0 = rng(3).standard_normal((2, n // 2 + 1, 2))
    spec0[..., -1, :] = 0.0
    x = np.fft.irfft(spec0[..., 0] + 1j * spec0[..., 1], n=n).astype(np.float32)
    spec = rfft_mxu(jnp.asarray(x))
    back = np.asarray(irfft_mxu(spec, n))
    np.testing.assert_allclose(back, x, atol=5e-4)


def test_matches_planted_sinusoid_bins():
    n = 4096
    t = np.arange(n)
    x = (2.5 * np.sin(2 * np.pi * t / 64)).astype(np.float32)  # bin 64
    spec = np.asarray(rfft_mxu(jnp.asarray(x)))
    power = np.abs(spec) ** 2
    assert power.argmax() == 64
    # amplitude recovery: |X_k| = A*N/2 for an exact-bin sinusoid
    np.testing.assert_allclose(np.abs(spec[64]), 2.5 * n / 2, rtol=1e-5)
