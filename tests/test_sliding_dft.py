"""Sliding band DFT (`kernels/sliding_dft.py`): the hop=1 chunked
closed-form rolling spectrum vs a float64 framed-DFT oracle, plus its
routing inside the v757 spectral stage."""

import numpy as np
import pytest

import jax.numpy as jnp

from wavespec_tpu.kernels.sliding_dft import (
    sliding_band_spec,
    taper_harmonics,
    tapered_dft_of,
)
from wavespec_tpu.ops.windows import WindowType, _window_np


def _series(length, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(length)
    return (
        np.cumsum(0.05 * rng.standard_normal(length))
        + np.sin(2 * np.pi * t / 23.0)
        + 0.5 * np.sin(2 * np.pi * t / 57.0)
    ).astype(np.float32)


def _oracle(s, window, n_bins, wt):
    t = _window_np(window, wt)
    frames = np.stack([
        s[i : i + window].astype(np.float64) * t
        for i in range(len(s) - window + 1)
    ])
    return np.fft.rfft(frames, axis=-1)[:, :n_bins]


@pytest.mark.parametrize(
    "wt",
    [WindowType.NONE, WindowType.HANN, WindowType.HAMMING, WindowType.BLACKMAN],
)
def test_matches_framed_oracle(wt):
    window, n_bins = 128, 20
    s = _series(window + 299)
    spec = np.asarray(sliding_band_spec(jnp.asarray(s), window, n_bins, wt, chunk=64))
    oracle = _oracle(s, window, n_bins, wt)
    scale = np.abs(oracle).max()
    assert np.abs(spec - oracle).max() / scale < 3e-6


def test_k_lo_skips_subband_bins():
    """k_lo returns exact zeros below the band; kept bins match the full
    run (bitwise on the pinned path — its per-column fixed-tree
    contraction is column-count independent; f32-noise on the default
    path, whose dot shapes change with K)."""
    window, n_bins, k_lo = 128, 24, 9
    s = _series(window + 150, seed=5)
    for pin in (False, True):
        full = np.asarray(sliding_band_spec(
            jnp.asarray(s), window, n_bins, WindowType.HANN, pin=pin))
        part = np.asarray(sliding_band_spec(
            jnp.asarray(s), window, n_bins, WindowType.HANN, pin=pin,
            k_lo=k_lo))
        assert part.shape == full.shape
        assert np.all(part[..., :k_lo] == 0)
        if pin:
            np.testing.assert_array_equal(part[..., k_lo:], full[..., k_lo:])
        else:
            scale = np.abs(full).max()
            assert np.abs(part[..., k_lo:] - full[..., k_lo:]).max() / scale < 3e-6


def test_three_step_anchor_large_window():
    """Windows with > 256 row groups (window > 32768) ship the anchor
    basis as two u-factors instead of the [J1, K*M] a-table (~470 MB x2
    of jit constants at 262144 — it broke the remote-compile transport);
    same framed-oracle parity, and pin=True is a documented refusal."""
    import pytest

    window, n_bins, k_lo, t_frames = 65536, 40, 8, 4
    s = _series(window + t_frames - 1, seed=7)
    spec = np.asarray(sliding_band_spec(
        jnp.asarray(s), window, n_bins, WindowType.HANN, k_lo=k_lo))
    oracle = _oracle(s, window, n_bins, WindowType.HANN)
    oracle[:, :k_lo] = 0
    rel = np.abs(spec - oracle).max() / np.abs(oracle[:, k_lo:]).max()
    assert rel < 3e-6, rel
    with pytest.raises(ValueError, match="pin=True is unsupported"):
        sliding_band_spec(jnp.asarray(s), window, n_bins,
                          WindowType.HANN, pin=True)


def test_chunk_size_is_numerics_only():
    """Different chunkings agree to f32 noise (the math is chunk-invariant)."""
    window, n_bins = 128, 16
    s = _series(window + 200, seed=3)
    a = np.asarray(sliding_band_spec(jnp.asarray(s), window, n_bins,
                                     WindowType.BLACKMAN, chunk=32))
    b = np.asarray(sliding_band_spec(jnp.asarray(s), window, n_bins,
                                     WindowType.BLACKMAN, chunk=128))
    scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 3e-6


def test_partial_last_chunk_and_tiny_t():
    window, n_bins = 64, 10
    for t_frames in (1, 2, 63, 64, 65):
        s = _series(window + t_frames - 1, seed=t_frames)
        spec = np.asarray(sliding_band_spec(jnp.asarray(s), window, n_bins,
                                            WindowType.HANN, chunk=64))
        oracle = _oracle(s, window, n_bins, WindowType.HANN)
        assert spec.shape == (t_frames, n_bins)
        assert np.abs(spec - oracle).max() / np.abs(oracle).max() < 3e-6


def test_append_invariance_bitwise():
    """Appending samples never changes earlier frames (no-repaint)."""
    window, n_bins = 128, 16
    s = _series(window + 200, seed=5)
    base = np.asarray(sliding_band_spec(jnp.asarray(s), window, n_bins,
                                        WindowType.BLACKMAN))
    ext = np.concatenate([s, _series(90, seed=6)])
    longer = np.asarray(sliding_band_spec(jnp.asarray(ext), window, n_bins,
                                          WindowType.BLACKMAN))
    np.testing.assert_array_equal(longer[: base.shape[0]], base)


def test_batch_dims_exact():
    window, n_bins = 64, 12
    s = np.stack([_series(window + 99, seed=i) for i in range(3)])
    batch = np.asarray(sliding_band_spec(jnp.asarray(s), window, n_bins,
                                         WindowType.HAMMING, chunk=32))
    for i in range(3):
        single = np.asarray(sliding_band_spec(jnp.asarray(s[i]), window,
                                              n_bins, WindowType.HAMMING,
                                              chunk=32))
        np.testing.assert_array_equal(batch[i], single)


def test_bartlett_has_no_harmonics():
    assert taper_harmonics(WindowType.BARTLETT) is None
    assert taper_harmonics(WindowType.BLACKMAN) is not None


def test_tapered_dft_of_matches_numpy():
    n, n_bins = 128, 20
    v = np.linspace(1.0, 0.2, n)
    got = tapered_dft_of(v, n_bins, WindowType.BLACKMAN)
    want = np.fft.rfft(v * _window_np(n, WindowType.BLACKMAN))[:n_bins]
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-6


def test_v757_spectral_sliding_matches_framed():
    """The full spectral stage (Ehlers rank-1 correction + taper) agrees
    between the sliding and framed paths — candidates identical, floats at
    f32 noise — on a realistic price series."""
    import dataclasses

    from wavespec_tpu.pipeline.v757 import V757Config, _spectral_frames

    series = jnp.asarray(100.0 + _series(256 + 300, seed=11))
    cfg_s = V757Config(window=256, min_period=18.0, max_period=52.0,
                       sliding_spectral=True)
    cfg_f = dataclasses.replace(cfg_s, sliding_spectral=False)
    out_s = _spectral_frames(series, cfg_s, 1)
    out_f = _spectral_frames(series, cfg_f, 1)
    # candidate indices + validity: identical discrete picks
    np.testing.assert_array_equal(np.asarray(out_s[2]), np.asarray(out_f[2]))
    np.testing.assert_array_equal(np.asarray(out_s[3]), np.asarray(out_f[3]))
    # periods/powers/group-delay-index: f32 noise (gd is mode-selected
    # and all-zero in the default PHASE mode; gd_idx always carries the
    # leak-buffer convention)
    for a, b, tol in ((out_s[0], out_f[0], 1e-5),
                      (out_s[1], out_f[1], 1e-4),
                      (out_s[5], out_f[5], 2e-2)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() / scale < tol


def test_v757_spectral_hop2_falls_back():
    """hop > 1 routes to the framed path (same function output shape)."""
    from wavespec_tpu.pipeline.v757 import V757Config, _spectral_frames

    series = jnp.asarray(100.0 + _series(256 + 64, seed=12))
    cfg = V757Config(window=256, min_period=18.0, max_period=52.0)
    out = _spectral_frames(series, cfg, 2)
    assert out[0].shape[-2] == (64 // 2) + 1
