"""Reference-scale windows (VERDICT r1 item 6): the v7.57 default window
16384 (`...pla-kalman.mq5:801`) through MUSIC extraction and the full v757
pipeline at test-scale bar counts."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles
from wavespec_tpu.pipeline.v757 import V757Config, run_v757
import pytest


@pytest.mark.slow
def test_music_extract_window_16384_recovers_planted():
    n = 16384
    t = np.arange(n)
    x = (np.cumsum(0.02 * np.random.default_rng(0).standard_normal(n))
         + 3.0 * np.sin(2 * np.pi * t / 48 + 0.3)
         + 1.5 * np.sin(2 * np.pi * t / 130 + 1.0)).astype(np.float32)
    cfg = ExtractConfig(window=n, top_k=4, min_period=9.0, max_period=200.0,
                        method=Method.MUSIC, ar_order=10)
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    periods = attrs[attrs[:, 0] > 0][:, 2]
    assert any(abs(p - 48.0) / 48.0 < 0.02 for p in periods)
    assert any(abs(p - 130.0) / 130.0 < 0.02 for p in periods)


def test_v757_window_16384_runs():
    n_bars = 16384 + 6
    t = np.arange(n_bars)
    x = (100.0 + 2.0 * np.sin(2 * np.pi * t / 32.0)
         + 0.02 * np.random.default_rng(1).standard_normal(n_bars)
         ).astype(np.float32)
    cfg = V757Config(window=16384, min_period=18.0, max_period=52.0)
    out = run_v757(x, cfg, hop=1)
    assert out["slot_period"].shape == (7, 12)
    valid = out["slot_valid"]
    assert valid.any()
    # planted 32-bar cycle lands in an active slot
    per = out["slot_period"][valid]
    assert any(abs(p - 32.0) / 32.0 < 0.05 for p in per)
