"""BASELINE.json's five benchmark configs, exercised at test scale.

These mirror /root/repo/BASELINE.json `configs` 1-5 so every named
workload shape has a correctness gate (full-scale numbers live in
bench.py / benchmarks/).
"""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu import ops
from wavespec_tpu.extract import DetrendMode, ExtractConfig, Method, extract_cycles_batch
from wavespec_tpu.filters import KalmanWaveConfig, kalman_wave
from wavespec_tpu.kernels.mxu_fft import rfft_mxu
from wavespec_tpu.mesh import extract_batch_sharded, make_mesh, shard_series_batch
from wavespec_tpu.ops.windows import WindowType
from wavespec_tpu.reconstruct import reconstruct_from_bins


def planted(n, period=64.0, amp=2.0, seed=0, noise=0.05):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * t / period)
            + noise * np.random.default_rng(seed).standard_normal(n)).astype(np.float32)


def test_config1_single_series_detrend_hann_top8():
    """4096-sample rFFT with linear detrend + Hann window -> top-8 cycles."""
    x = planted(4096, period=50.0) + 0.01 * np.arange(4096, dtype=np.float32)
    d = ops.linear_detrend(jnp.asarray(x))
    w = ops.apply_window(d, ops.WindowType.HANN)
    ps = ops.power_spectrum(ops.rfft_bins(w))  # CPU jnp.fft oracle path
    idx, powers, periods = ops.topk_cycles(ps, n=4096, top_k=8,
                                           min_period=18.0, max_period=200.0)
    assert abs(float(periods[0]) - 4096 / round(4096 / 50)) < 0.5


def test_config2_rolling_stft_512hop_100k():
    """512-bar hop over a 100k-bar series, one fused batch."""
    n = 100_000
    x = planted(n, period=120.0)
    cfg = ExtractConfig(window=4096, top_k=4, min_period=18.0, max_period=200.0,
                        method=Method.FFT_RIDGE)
    attrs = np.asarray(extract_cycles_batch(jnp.asarray(x), cfg, hop=512))
    nwin = 1 + (n - 4096) // 512
    assert attrs.shape == (nwin, 4, 15)
    np.testing.assert_allclose(attrs[:, 0, 2], 4096 / round(4096 / 120), rtol=0.02)


def test_config3_kalman_cycle_tracker_over_frames():
    """Per-bin Kalman filter over STFT frames (kalman-fast/nodetrend)."""
    x = planted(4096 + 512, period=64.0, noise=0.0)
    blended, weights, basis = kalman_wave(
        jnp.asarray(x), KalmanWaveConfig(window=4096, top_k=4,
                                         min_period=18.0, max_period=200.0),
        hop=1,
    )
    measured = x[4095:]
    err = np.abs(np.asarray(blended)[200:] - measured[200 : len(np.asarray(blended))])
    assert err.mean() < 0.15


def test_config4_wave_reconstruction_from_selected_bins():
    """Inverse rFFT of top-k bins rebuilds the cycle waveform."""
    n = 4096
    x = planted(n, period=64.0, amp=2.0, noise=0.3, seed=3)
    spec = rfft_mxu(jnp.asarray(x))
    ps = np.asarray(jnp.abs(spec) ** 2)
    k = int(np.argmax(ps[18:]) + 18)
    wave = np.asarray(reconstruct_from_bins(spec, jnp.asarray([[k]])[0], n))
    clean = 2.0 * np.sin(2 * np.pi * np.arange(n) / 64)
    corr = np.corrcoef(wave[100:-100], clean[100:-100])[0, 1]
    assert corr > 0.99
    # selected-bin energy only: reconstruction is much smoother than input
    assert np.std(wave - clean) < np.std(x - clean)


def test_config5_multi_symbol_sharded_batch():
    """Symbol batch sharded over the mesh data axis (v5e-8 stand-in)."""
    mesh = make_mesh({"data": 8})
    rng = np.random.default_rng(1)
    periods = rng.uniform(20, 180, 16)
    t = np.arange(4096 + 256)
    batch = np.sin(2 * np.pi * t[None, :] / periods[:, None]).astype(np.float32)
    cfg = ExtractConfig(window=4096, top_k=1, min_period=18.0, max_period=200.0,
                        method=Method.FFT_RIDGE)
    xb = shard_series_batch(jnp.asarray(batch), mesh)
    attrs = np.asarray(extract_batch_sharded(xb, cfg, hop=256, mesh=mesh))
    got = attrs[:, -1, 0, 2]
    want = 4096 / np.round(4096 / periods)
    np.testing.assert_allclose(got, want, rtol=0.05)
