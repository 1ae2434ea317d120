"""Property tests: physical invariances of the extraction pipeline."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu import extract as ex
from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles
from wavespec_tpu.reconstruct import ReconstructConfig, quality_weight


def cfg(method=Method.FFT_RIDGE, **kw):
    d = dict(window=1024, top_k=2, min_period=10.0, max_period=200.0, method=method)
    d.update(kw)
    return ExtractConfig(**d)


def planted(n=1024, period=64.0, amp=2.0, phase=0.3, shift=0):
    t = np.arange(n) + shift
    return (amp * np.sin(2 * np.pi * t / period + phase)).astype(np.float32)


def test_amplitude_scaling_linearity():
    """Scaling the input scales amplitude; period/freq/energy_ratio hold."""
    for method in (Method.FFT_RIDGE, Method.MUSIC):
        a1 = np.asarray(extract_cycles(jnp.asarray(planted(amp=1.0)), cfg(method)))
        a3 = np.asarray(extract_cycles(jnp.asarray(planted(amp=3.0)), cfg(method)))
        np.testing.assert_allclose(a3[0, ex.AMPLITUDE], 3 * a1[0, ex.AMPLITUDE], rtol=1e-3)
        np.testing.assert_allclose(a3[0, ex.PERIOD], a1[0, ex.PERIOD], rtol=1e-4)
        np.testing.assert_allclose(a3[0, ex.ENERGY_RATIO], a1[0, ex.ENERGY_RATIO], rtol=1e-2)


def test_time_shift_advances_phase():
    """Shifting the window by d bars advances the end phase by omega*d."""
    for method in (Method.FFT_RIDGE, Method.MUSIC):
        d = 7
        a0 = np.asarray(extract_cycles(jnp.asarray(planted(shift=0)), cfg(method, top_k=1)))[0]
        ad = np.asarray(extract_cycles(jnp.asarray(planted(shift=d)), cfg(method, top_k=1)))[0]
        omega = 2 * np.pi * a0[ex.FREQ]
        dphi = (ad[ex.PHASE] - a0[ex.PHASE] - omega * d + np.pi) % (2 * np.pi) - np.pi
        assert abs(dphi) < 0.05, dphi


def test_eta_phase_consistency():
    """eta_bars always lands the phase on an extremum (theta = pi/2 mod pi)."""
    rngs = np.random.default_rng(0)
    for seed in range(3):
        x = planted(period=float(rngs.uniform(20, 150)), phase=float(rngs.uniform(0, 6)))
        a = np.asarray(extract_cycles(jnp.asarray(x), cfg(top_k=1)))[0]
        theta = a[ex.PHASE] + 2 * np.pi * a[ex.FREQ] * a[ex.ETA_BARS]
        r = (theta - np.pi / 2) % np.pi
        assert min(r, np.pi - r) < 1e-2


def test_quality_weight_monotonic_in_snr():
    base = np.zeros((1, 15), np.float32)
    base[0, ex.ENERGY_RATIO] = 0.5
    base[0, ex.COHERENCE] = 0.5
    base[0, ex.SCORE] = 0.5
    rc = ReconstructConfig()
    prev = -1.0
    for snr in (-10.0, 0.0, 10.0, 30.0):
        a = base.copy()
        a[0, ex.SNR_DB] = snr
        w = float(np.asarray(quality_weight(jnp.asarray(a), rc))[0])
        assert w > prev
        prev = w


def test_attrs_bounded_fields():
    """Bounded fields stay in range on noisy inputs, both methods."""
    r = np.random.default_rng(1)
    x = (np.cumsum(0.05 * r.standard_normal(1024))
         + np.sin(2 * np.pi * np.arange(1024) / 48)).astype(np.float32)
    for method in (Method.FFT_RIDGE, Method.MUSIC, Method.AUTO):
        a = np.asarray(extract_cycles(jnp.asarray(x), cfg(method, top_k=4, ar_order=12)))
        valid = a[:, ex.AMPLITUDE] > 0
        assert (a[valid, ex.ENERGY_RATIO] >= 0).all() and (a[valid, ex.ENERGY_RATIO] <= 1).all()
        assert (a[valid, ex.COHERENCE] >= 0).all() and (a[valid, ex.COHERENCE] <= 1).all()
        assert (a[valid, ex.SCORE] >= 0).all() and (a[valid, ex.SCORE] <= 1).all()
        assert (a[valid, ex.ETA_CONFIDENCE] >= 0).all() and (a[valid, ex.ETA_CONFIDENCE] <= 1).all()
        assert (a[valid, ex.ETA_BARS] >= 0).all()
        assert (a[valid, ex.PERIOD] >= 0).all()
