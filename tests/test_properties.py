"""Property tests: physical invariances of the extraction pipeline."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu import extract as ex
from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles
from wavespec_tpu.reconstruct import ReconstructConfig, quality_weight
import pytest


def cfg(method=Method.FFT_RIDGE, **kw):
    d = dict(window=1024, top_k=2, min_period=10.0, max_period=200.0, method=method)
    d.update(kw)
    return ExtractConfig(**d)


def planted(n=1024, period=64.0, amp=2.0, phase=0.3, shift=0):
    t = np.arange(n) + shift
    return (amp * np.sin(2 * np.pi * t / period + phase)).astype(np.float32)


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_config_matrix_smoke():
    """Shape/validity smoke across the legal config space: every
    combination must compile, return [top_k, 15] attrs, and keep
    field invariants (valid rows have period inside the band, bounded
    coherence/energy_ratio) — catches shape bugs that single-config
    tests at flagship defaults never exercise."""
    from wavespec_tpu.extract import extract_cycles_batch

    rng = np.random.default_rng(11)
    combos = [
        # (window, top_k, ar, min_p, max_p, method, hop)
        (256, 1, 6, 9.0, 60.0, Method.FFT_RIDGE, 32),
        (256, 3, 8, 4.0, 100.0, Method.MUSIC, 64),
        (512, 8, 10, 18.0, 200.0, Method.FFT_RIDGE, 1),
        (512, 2, 12, 10.0, 40.0, Method.MUSIC, 100),
        (1024, 4, 10, 9.0, 200.0, Method.MUSIC, 512),
        (1024, 6, 16, 30.0, 300.0, Method.FFT_RIDGE, 7),
        (2048, 5, 14, 9.0, 500.0, Method.MUSIC, 48),
    ]
    for window, top_k, ar, min_p, max_p, method, hop in combos:
        c = ExtractConfig(window=window, top_k=top_k, min_period=min_p,
                          max_period=max_p, method=method, ar_order=ar)
        slen = window + 2 * hop
        t = np.arange(slen)
        x = (np.cumsum(0.05 * rng.standard_normal(slen))
             + 2.0 * np.sin(2 * np.pi * t / (0.5 * (min_p + max_p)))
             ).astype(np.float32)
        attrs = np.asarray(extract_cycles_batch(jnp.asarray(x), c, hop=hop))
        assert attrs.shape == (3, top_k, 15), (c, attrs.shape)
        valid = attrs[..., ex.AMPLITUDE] > 0
        per = attrs[..., ex.PERIOD][valid]
        # periods inside the band (refinement may step one bin past the
        # band edge; allow that margin)
        bin_p_lo = window / (window / min_p + 1)
        bin_p_hi = window / max(window / max_p - 1, 1)
        assert np.all(per >= bin_p_lo * 0.99), (c, per.min())
        assert np.all(per <= bin_p_hi * 1.01), (c, per.max())
        coh = attrs[..., ex.COHERENCE][valid]
        er = attrs[..., ex.ENERGY_RATIO][valid]
        assert np.all((coh >= 0) & (coh <= 1.0 + 1e-5)), c
        assert np.all((er >= 0) & (er <= 1.0 + 1e-5)), c
        assert np.all(np.isfinite(attrs)), c
