"""Model preset lineup tests (small shapes)."""

import numpy as np

from wavespec_tpu import models
import pytest


def series(n=1400, period=64.0):
    t = np.arange(n)
    return (2.0 * np.sin(2 * np.pi * t / period)
            + 0.05 * np.random.default_rng(0).standard_normal(n)).astype(np.float32)


@pytest.mark.slow
def test_flagship_preset():
    m = models.flagship(window=1024, hop=64)
    out = m.run(series())
    assert out["attrs"].shape[-1] == 15
    assert m.extract.method.name == "MUSIC" and m.extract.ar_order == 10
    assert "rendered" in out and out["wave"].shape[-1] == 2


def test_nodetrend_top8_preset():
    m = models.nodetrend_top8(window=1024, hop=64)
    out = m.run(series())
    assert out["wave"].shape[-1] == 8
    periods = np.asarray(out["period"])
    assert (np.abs(periods - 64.0) < 2).any()


def test_v757_preset():
    m = models.v757(window=1024, hop=8, min_period=18.0, max_period=100.0,
                    trend_period=256)
    out = m.run(series(1100))
    assert out["slot_period"].shape[-1] == 12


def test_preproc_core_preset():
    m = models.preproc_core(window=1024)
    out = m.run(series(1024))
    assert out["filtered"].shape == (1024,)
    assert out["attrs"].shape == (4, 15)


def test_kalman_wave_preset():
    m = models.kalman_wave_model(window=1024, hop=4)
    out = m.run(series(1200))
    assert out["basis"].shape[-1] == 8
