"""Overlap-shared hopped band DFT (kernels.hopped_dft) and its ridge
fast path in extract_cycles_batch.

The kernel computes rolling-window band spectra from per-row partial
transforms shared across overlapping windows (no frame materialization);
parity target is the per-window numpy rFFT. The ridge fast path must
match the framed path's attrs and keep the bitwise no-repaint invariant
(`Legacy/WaveSpecZZ_1.0.2.mq5:15-17`).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles_batch
from wavespec_tpu.kernels.hopped_dft import hopped_eligible, rfft_band_hopped


def _series(length, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(length)
    return (np.cumsum(0.05 * rng.standard_normal(length))
            + 1.5 * np.sin(2 * np.pi * t / 64)
            + 0.8 * np.sin(2 * np.pi * t / 150)).astype(np.float32)


def test_hopped_matches_numpy_per_window():
    for window, hop, extra, k in [(1024, 16, 63 * 16, 105),
                                  (512, 8, 97 * 8, 100),
                                  (1024, 48, 20 * 48, 80),   # P=8, step_q=3
                                  (1024, 64, 31 * 64, 105)]:
        assert hopped_eligible(window, hop)
        x = _series(window + extra)
        got = np.asarray(rfft_band_hopped(jnp.asarray(x), window, hop, k))
        nwin = 1 + extra // hop
        assert got.shape == (nwin, k)
        want = np.stack([
            np.fft.rfft(x[w * hop : w * hop + window].astype(np.float64))[:k]
            for w in range(nwin)
        ])
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 2e-6, (window, hop, rel)


def test_hopped_multilevel_combine_matches_numpy():
    """Windows with > 32 full rows route the row combine through the
    multi-level radix split (single fused chains exceed XLA's fusion
    operand budget there — see rfft_band_hopped); same numpy parity."""
    for window, hop, nwin, k in [(8192, 64, 9, 300),    # R=64  -> (8, 8)
                                 (16384, 128, 5, 220)]:  # R=128 -> (8, 8, 2)
        x = _series(window + (nwin - 1) * hop)
        got = np.asarray(rfft_band_hopped(jnp.asarray(x), window, hop, k))
        want = np.stack([
            np.fft.rfft(x[w * hop : w * hop + window].astype(np.float64))[:k]
            for w in range(nwin)
        ])
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 2e-6, (window, hop, rel)


def test_hopped_multilevel_no_repaint_bitwise():
    """The radix-split combine is shifted-slice elementwise work, so the
    append-invariance of the single-chain form carries over bitwise."""
    window, hop, k = 8192, 64, 120
    x = _series(window + 40 * hop, seed=3)
    a = rfft_band_hopped(jnp.asarray(x[: window + 24 * hop]), window, hop, k)
    b = rfft_band_hopped(jnp.asarray(x), window, hop, k)
    b = b[: a.shape[0]]
    np.testing.assert_array_equal(np.asarray(jnp.real(a)),
                                  np.asarray(jnp.real(b)))
    np.testing.assert_array_equal(np.asarray(jnp.imag(a)),
                                  np.asarray(jnp.imag(b)))


def test_hopped_multiseries_batch_dims():
    x = np.stack([_series(1024 + 40 * 16, seed=s) for s in range(5)])
    got = np.asarray(rfft_band_hopped(jnp.asarray(x), 1024, 16, 105))
    assert got.shape == (5, 41, 105)
    for s in (0, 4):
        want = np.stack([
            np.fft.rfft(x[s, w * 16 : w * 16 + 1024].astype(np.float64))[:105]
            for w in range(41)
        ])
        rel = np.abs(got[s] - want).max() / np.abs(want).max()
        assert rel < 2e-6, rel


def test_hopped_ineligible_shapes_raise():
    import pytest

    with pytest.raises(ValueError):
        rfft_band_hopped(jnp.zeros(2048, jnp.float32), 1024, 1, 100)


def test_ridge_fast_path_matches_framed():
    cfg = ExtractConfig(window=1024, top_k=4, min_period=10.0,
                        max_period=200.0, method=Method.FFT_RIDGE)
    cfg_framed = dataclasses.replace(cfg, use_hopped_dft=False)
    x = jnp.asarray(_series(1024 + 50 * 16, seed=3))
    fast = np.asarray(extract_cycles_batch(x, cfg, hop=16))
    slow = np.asarray(extract_cycles_batch(x, cfg_framed, hop=16))
    np.testing.assert_allclose(fast, slow, rtol=2e-4, atol=2e-4)


def test_ridge_fast_path_multiseries_matches_per_series():
    cfg = ExtractConfig(window=512, top_k=2, min_period=10.0,
                        max_period=100.0, method=Method.FFT_RIDGE)
    xs = np.stack([_series(512 + 30 * 8, seed=s) for s in range(4)])
    batch = np.asarray(extract_cycles_batch(jnp.asarray(xs), cfg, hop=8))
    for s in range(4):
        one = np.asarray(extract_cycles_batch(jnp.asarray(xs[s]), cfg, hop=8))
        np.testing.assert_array_equal(batch[s], one)


def test_hopped_spec_no_repaint_bitwise():
    """Every term of the hopped decomposition touches only in-window
    samples (the Hi boundary has its own masked basis, not a G - Lo
    subtraction) and every dot runs in fixed-shape row chunks, so
    appending bars must not change earlier windows' SPECTRA at the bit
    level."""
    x = _series(1024 + 80 * 16, seed=7)
    a = rfft_band_hopped(jnp.asarray(x[: 1024 + 40 * 16]), 1024, 16, 105)
    b = rfft_band_hopped(jnp.asarray(x), 1024, 16, 105)
    n = a.shape[0]
    np.testing.assert_array_equal(np.asarray(jnp.real(a)),
                                  np.asarray(jnp.real(b))[:n])
    np.testing.assert_array_equal(np.asarray(jnp.imag(a)),
                                  np.asarray(jnp.imag(b))[:n])


def test_ridge_fast_path_no_repaint():
    """Attrs through the hopped path: the estimator core (amp/freq/
    period/phase/ETA) is append-invariant bitwise; the noise-floor tail
    (coherence/score/eta_conf) is gated at float noise — CPU XLA's
    fusion-dependent FMA contraction can shift it ~1 ulp between batch
    shapes (see test_extract.test_no_repaint_invariant)."""
    cfg = ExtractConfig(window=1024, top_k=2, min_period=10.0,
                        max_period=200.0, method=Method.FFT_RIDGE)
    x = _series(1024 + 80 * 16, seed=7)
    a = np.asarray(extract_cycles_batch(jnp.asarray(x[:1024 + 40 * 16]), cfg, hop=16))
    b = np.asarray(extract_cycles_batch(jnp.asarray(x), cfg, hop=16))
    np.testing.assert_array_equal(a[..., :6], b[: a.shape[0], ..., :6])
    np.testing.assert_allclose(a, b[: a.shape[0]], rtol=2e-6, atol=1e-6)


def test_ridge_fast_path_ineligible_hop_falls_back():
    # hop=1 (P=128) and window 128 (a single 128-sample row) route to the
    # framed path — same answers as an explicit use_hopped_dft=False
    # config. (window 256 = 2 rows IS eligible.)
    for window, hop in [(1024, 1), (128, 16)]:
        cfg = ExtractConfig(window=window, top_k=2, min_period=10.0,
                            max_period=100.0, method=Method.FFT_RIDGE)
        cfg_framed = dataclasses.replace(cfg, use_hopped_dft=False)
        x = jnp.asarray(_series(window + 16 * hop, seed=5))
        np.testing.assert_array_equal(
            np.asarray(extract_cycles_batch(x, cfg, hop=hop)),
            np.asarray(extract_cycles_batch(x, cfg_framed, hop=hop)),
        )
