"""Fused Pallas band-DFT: interpret-mode parity with the XLA path."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.kernels.fused_dft import rfft_band_fused, rfft_band_fused_any
from wavespec_tpu.kernels.mxu_fft import rfft_mxu


def test_fused_dft_matches_numpy_rfft():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 1024)).astype(np.float32)
    got = np.asarray(rfft_band_fused(jnp.asarray(x), max_bins=200, tile=4,
                                     interpret=True))
    want = np.fft.rfft(x.astype(np.float64), axis=-1)[:, : got.shape[1]]
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-6


def test_fused_dft_any_pads_and_trims():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 5, 1024)).astype(np.float32)  # 15 rows, tile 4
    got = np.asarray(rfft_band_fused_any(jnp.asarray(x), max_bins=130,
                                         tile=4, interpret=True))
    assert got.shape == (3, 5, 130)
    want = np.asarray(rfft_mxu(jnp.asarray(x), max_bins=130))[..., :130]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)
