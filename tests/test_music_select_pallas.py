"""Parity: fused Pallas candidate selection vs the XLA stage chain.

The kernel (kernels/music_select_pallas.py) replaces the peaks -> ridge
-> prerank stages of `music_candidates` on device; on CPU the XLA chain
runs, so these tests drive the kernel in interpret mode on the SAME
pseudospectrum/band-power inputs and require bitwise agreement on every
output field (the kernel is op-for-op the same math).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wavespec_tpu.analyze import music as M
from wavespec_tpu.extract import ExtractConfig, Method
from wavespec_tpu.kernels.music_select_pallas import select_candidates_pallas
from wavespec_tpu.kernels.mxu_fft import rfft_mxu
from wavespec_tpu.ops.detrend import ehlers_highpass_detrend
from wavespec_tpu.ops.spectrum import band_indices


def _windows(cfg, n_win: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    n = cfg.window
    t = np.arange(n)
    rows = []
    for i in range(n_win):
        x = (
            np.cumsum(0.05 * rng.standard_normal(n))
            + 2.0 * np.sin(2 * np.pi * t / (20 + 3 * i) + rng.uniform(0, 6))
            + 1.0 * np.sin(2 * np.pi * t / (110 + 7 * i))
        )
        rows.append(x)
    w = jnp.asarray(np.stack(rows), jnp.float32)
    w = w - w[..., :1]
    return ehlers_highpass_detrend(w, M.music_hp_period(cfg))


def _stage_inputs(windows, cfg):
    pseudo, _freqs, _eig, _core, _slices = M.music_pseudospectrum(
        windows, cfg
    )
    k_min, k_max = band_indices(cfg.window, cfg.min_period, cfg.max_period)
    spec = rfft_mxu(windows, max_bins=k_max + 1)
    band_power = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)[
        ..., k_min : k_max + 1
    ]
    return pseudo, band_power


@pytest.mark.parametrize(
    "cfg",
    [
        ExtractConfig(window=4096, top_k=4, min_period=9.0, max_period=200.0,
                      method=Method.MUSIC, ar_order=10),
        ExtractConfig(window=1024, top_k=2, min_period=18.0, max_period=52.0,
                      method=Method.MUSIC, ar_order=10),
    ],
    ids=["flagship-4096", "small-1024"],
)
@pytest.mark.slow
def test_select_matches_xla_stage(cfg):
    windows = _windows(cfg, n_win=7)
    # XLA reference: the CPU branch of music_candidates.
    st = M.music_candidates(windows, cfg, upto="prerank")
    pseudo, band_power = _stage_inputs(windows, cfg)
    sel = select_candidates_pallas(pseudo, band_power, cfg, interpret=True)

    np.testing.assert_array_equal(np.asarray(sel["valid"]),
                                  np.asarray(st["valid"]))
    np.testing.assert_array_equal(np.asarray(sel["gidx"]),
                                  np.asarray(st["gidx"]))
    np.testing.assert_array_equal(np.asarray(sel["freq"]),
                                  np.asarray(st["freq"]))
    np.testing.assert_array_equal(np.asarray(sel["vals"]),
                                  np.asarray(st["vals"]))
    np.testing.assert_array_equal(np.asarray(sel["step0"]),
                                  np.asarray(st["step0"]))


@pytest.mark.slow
def test_select_leading_dims_and_padding():
    """Non-multiple-of-tile batches and 3D leading dims round-trip."""
    cfg = ExtractConfig(window=1024, top_k=3, min_period=10.0,
                        max_period=100.0, method=Method.MUSIC, ar_order=10)
    windows = _windows(cfg, n_win=6, seed=3).reshape(2, 3, cfg.window)
    st = M.music_candidates(windows, cfg, upto="prerank")
    pseudo, band_power = _stage_inputs(windows, cfg)
    sel = select_candidates_pallas(pseudo, band_power, cfg, interpret=True)
    assert sel["freq"].shape == st["freq"].shape == (2, 3, 2 * cfg.top_k)
    np.testing.assert_array_equal(np.asarray(sel["gidx"]),
                                  np.asarray(st["gidx"]))
    np.testing.assert_array_equal(np.asarray(sel["freq"]),
                                  np.asarray(st["freq"]))
    np.testing.assert_array_equal(np.asarray(sel["valid"]),
                                  np.asarray(st["valid"]))


def test_select_single_window():
    cfg = ExtractConfig(window=1024, top_k=2, min_period=18.0,
                        max_period=52.0, method=Method.MUSIC, ar_order=10)
    windows = _windows(cfg, n_win=1, seed=9)[0]
    st = M.music_candidates(windows, cfg, upto="prerank")
    pseudo, band_power = _stage_inputs(windows, cfg)
    sel = select_candidates_pallas(pseudo, band_power, cfg, interpret=True)
    assert sel["freq"].shape == st["freq"].shape
    np.testing.assert_array_equal(np.asarray(sel["freq"]),
                                  np.asarray(st["freq"]))
    np.testing.assert_array_equal(np.asarray(sel["valid"]),
                                  np.asarray(st["valid"]))
