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


def test_rfft_band_fused_interpret_matches_numpy():
    """Fused Pallas band DFT (interpret mode) vs NumPy oracle."""
    from wavespec_tpu.kernels.fused_dft import rfft_band_fused

    B, n = 128, 2048
    w = rng(42).standard_normal((B, n)).astype(np.float32)
    spec = rfft_band_fused(jnp.asarray(w), max_bins=200, tile=64, interpret=True)
    bins = spec.shape[1]
    want = np.fft.rfft(w.astype(np.float64))[:, :bins]
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(spec).real, want.real, atol=scale * 2e-6)
    np.testing.assert_allclose(np.asarray(spec).imag, want.imag, atol=scale * 2e-6)


def test_rfft_mxu_max_bins_prefix():
    n = 4096
    x = rng(5).standard_normal((2, n)).astype(np.float32)
    full = np.asarray(rfft_mxu(jnp.asarray(x)))
    part = np.asarray(rfft_mxu(jnp.asarray(x), max_bins=230))
    assert part.shape[-1] == 256
    np.testing.assert_allclose(part, full[:, :256], rtol=1e-5, atol=1e-3)
