"""Reconstruction/decode tests (flagship `1.1.0:1472-1561` semantics)."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu import extract as ex
from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles_batch
import pytest

from wavespec_tpu.reconstruct import (
    ReconstructConfig,
    decode_causal,
    quality_weight,
    render_final,
)


def make_attrs(nwin=4, k=3, **field_overrides):
    """Synthetic attrs with sane defaults."""
    a = np.zeros((nwin, k, 15), np.float32)
    a[..., ex.AMPLITUDE] = 1.0
    a[..., ex.FREQ] = 1.0 / 64.0
    a[..., ex.PERIOD] = 64.0
    a[..., ex.PHASE] = 0.5
    a[..., ex.ETA_BARS] = 10.0
    a[..., ex.ETA_SECONDS] = 600.0
    a[..., ex.ENERGY_RATIO] = 0.5
    a[..., ex.COHERENCE] = 0.8
    a[..., ex.SNR_DB] = 20.0
    a[..., ex.SCORE] = 0.4
    a[..., ex.ETA_CONFIDENCE] = 0.9
    a[..., ex.METHOD_ID] = 1.0
    for field, val in field_overrides.items():
        a[..., getattr(ex, field.upper())] = val
    return a


def test_quality_weight_formula():
    cfg = ReconstructConfig()
    a = jnp.asarray(make_attrs(1, 1))
    w = float(np.asarray(quality_weight(a, cfg))[0, 0])
    snr_sig = 1.0 / (1.0 + 10 ** (-20.0 / 10.0))
    np.testing.assert_allclose(w, 0.5 * 0.8 * 0.4 * snr_sig, rtol=1e-6)


def test_quality_floors_zero_weight():
    cfg = ReconstructConfig()
    a = make_attrs(1, 1, coherence=0.01)  # below min_coherence 0.05
    assert float(np.asarray(quality_weight(jnp.asarray(a), cfg))[0, 0]) == 0.0
    a = make_attrs(1, 1, score=0.001)  # below min_score 0.01
    assert float(np.asarray(quality_weight(jnp.asarray(a), cfg))[0, 0]) == 0.0


def test_weights_disabled():
    cfg = ReconstructConfig(use_music_weights=False)
    a = make_attrs(1, 1, coherence=0.0)
    assert float(np.asarray(quality_weight(jnp.asarray(a), cfg))[0, 0]) == 1.0


def test_music_only_gate_and_slot_order():
    cfg = ReconstructConfig(max_waves=2)
    a = make_attrs(1, 3)
    a[0, 0, ex.METHOD_ID] = 0.0  # FFT ridge -> skipped
    a[0, 1, ex.PERIOD] = 50.0
    a[0, 2, ex.PERIOD] = 30.0
    out = decode_causal(jnp.asarray(a), cfg)
    # slots should be cycles 1 and 2 (first two MUSIC cycles)
    np.testing.assert_allclose(np.asarray(out["period"])[0], [50.0, 30.0])
    assert np.all(np.asarray(out["slot_valid"])[0])


def test_decode_causal_wave_value():
    cfg = ReconstructConfig()
    a = make_attrs(2, 1)
    out = decode_causal(jnp.asarray(a), cfg)
    w = np.asarray(quality_weight(jnp.asarray(a), cfg))[0, 0]
    want = 1.0 * w * np.sin(0.5)
    np.testing.assert_allclose(np.asarray(out["wave"])[0, 0], want, rtol=1e-6)
    # forecast: eta 10 > 1, conf 0.9 >= 0 -> valid with offset 10
    assert bool(np.asarray(out["forecast_valid"])[0, 0])
    np.testing.assert_allclose(np.asarray(out["forecast_offset"])[0, 0], 10.0)


def test_decode_causal_points_mode():
    cfg = ReconstructConfig(draw_sine=False)
    a = make_attrs(1, 1)
    out = decode_causal(jnp.asarray(a), cfg)
    w = np.asarray(quality_weight(jnp.asarray(a), cfg))[0, 0]
    np.testing.assert_allclose(np.asarray(out["wave"])[0, 0], w, rtol=1e-6)


def test_render_final_backprop_and_last_writer_wins():
    window, hop, nwin, n_bars = 128, 1, 3, 130
    cfg = ReconstructConfig(max_waves=1, recon_span_cap=16,
                            sample_rate_seconds=60.0)
    a = make_attrs(nwin, 1, eta_bars=8.0)
    # give each window a distinct phase so overwrites are observable
    for wdx in range(nwin):
        a[wdx, 0, ex.PHASE] = 0.1 * (wdx + 1)
    out = render_final(jnp.asarray(a), n_bars=n_bars, window=window, hop=hop, cfg=cfg)
    wave = np.asarray(out["wave"])[:, 0]
    omega = 2 * np.pi / 64.0
    wq = 1.0 * 0.5 * 0.8 * 0.4 * (1 / (1 + 10 ** -2.0))
    # span = round(max(eta,1)) = 8. Newest window (w=2) ends at bar 129 and
    # covers bars 121..129; bar 125 must hold ITS value (k=4), not w=1's.
    np.testing.assert_allclose(
        wave[125], wq * np.sin(0.3 - omega * 4), rtol=1e-5
    )
    # bar covered only by window 0 (bar_end=127, k=8 -> bar 119): w=1 covers
    # 120..128, w=2 covers 121..129 -> bar 119 belongs to window 0, k=8.
    np.testing.assert_allclose(
        wave[119], wq * np.sin(0.1 - omega * 8), rtol=1e-5
    )
    # bars before any span are untouched
    assert np.isnan(wave[: 127 - 8]).all()
    # ETA countdown decreases by 60 s per bar within newest window's span
    eta = np.asarray(out["eta_seconds"])[:, 0]
    np.testing.assert_allclose(eta[129], 600.0, rtol=1e-6)
    np.testing.assert_allclose(eta[128], 540.0, rtol=1e-6)


def test_render_final_forecast_marker():
    window, nwin, n_bars = 128, 2, 200
    cfg = ReconstructConfig(max_waves=1)
    a = make_attrs(nwin, 1, eta_bars=20.0)
    out = render_final(jnp.asarray(a), n_bars=n_bars, window=window, hop=1, cfg=cfg)
    fc = np.asarray(out["forecast"])[:, 0]
    # window 1 ends at bar 128, marker at 128+20=148
    assert not np.isnan(fc[148])
    wq = 1.0 * 0.5 * 0.8 * 0.4 * (1 / (1 + 10 ** -2.0))
    np.testing.assert_allclose(fc[148], wq * np.sin(0.5), rtol=1e-5)


@pytest.mark.slow
def test_end_to_end_extract_then_render():
    """Full slice: series -> batch extract -> final render reproduces the
    planted wave shape (SURVEY §7 step 2 milestone)."""
    n = 1024 + 256
    t = np.arange(n)
    x = (2.0 * np.sin(2 * np.pi * t / 64 + 0.3)).astype(np.float32)
    ecfg = ExtractConfig(window=1024, top_k=2, min_period=10.0,
                         max_period=200.0, method=Method.MUSIC, ar_order=10)
    attrs = extract_cycles_batch(jnp.asarray(x), ecfg, hop=16)
    rcfg = ReconstructConfig(max_waves=1, min_eta_conf=0.0)
    out = render_final(attrs, n_bars=n, window=1024, hop=16, cfg=rcfg)
    wave = np.asarray(out["wave"])[:, 0]
    covered = ~np.isnan(wave)
    assert covered.sum() > 100
    # Reconstruction tracks the planted cycle up to the quality weight.
    w = wave[covered]
    xx = x[covered]
    corr = np.corrcoef(w, xx)[0, 1]
    assert corr > 0.99


def test_project_forward():
    from wavespec_tpu.reconstruct import project_forward

    cfg = ReconstructConfig(max_waves=1)
    a = make_attrs(1, 1)  # amp 1, period 64, phase 0.5
    proj = np.asarray(project_forward(jnp.asarray(a), bars=26, cfg=cfg))
    assert proj.shape == (1, 26, 1)
    w = np.asarray(quality_weight(jnp.asarray(a), cfg))[0, 0]
    omega = 2 * np.pi / 64.0
    want = w * np.sin(0.5 + omega * np.arange(1, 27))
    np.testing.assert_allclose(proj[0, :, 0], want, rtol=1e-5, atol=1e-6)


def test_forecast_marker_unfloored_weight_and_points_mode():
    """The forecast marker uses the UN-floored weight_total and only
    applies sin() in DRAW_SINE mode with period>0 (`1.1.0:1548-1552`) —
    a cycle whose wave value the coherence/score floors zeroed still
    plots a nonzero marker, and POINTS mode plots amp*weight flat."""
    a = np.zeros((1, 1, 15), np.float32)
    a[0, 0, ex.AMPLITUDE] = 2.0
    a[0, 0, ex.FREQ] = 1.0 / 50.0
    a[0, 0, ex.PERIOD] = 50.0
    a[0, 0, ex.PHASE] = 0.7
    a[0, 0, ex.ETA_BARS] = 10.0
    a[0, 0, ex.ETA_CONFIDENCE] = 1.0
    a[0, 0, ex.ENERGY_RATIO] = 0.5
    a[0, 0, ex.COHERENCE] = 0.01   # below min_coherence=0.05 -> floor fails
    a[0, 0, ex.SCORE] = 0.5
    a[0, 0, ex.SNR_DB] = 10.0
    a[0, 0, ex.METHOD_ID] = 1.0
    cfg = ReconstructConfig(max_waves=1)
    dec = decode_causal(jnp.asarray(a), cfg)
    # wave is floored to zero...
    assert float(dec["wave"][0, 0]) == 0.0
    # ...but the marker survives with the raw weight_total
    w_snr = 1.0 / (1.0 + 10.0 ** (-10.0 / 10.0))
    w_raw = 0.5 * 0.01 * 0.5 * w_snr
    want = 2.0 * w_raw * np.sin(0.7)
    np.testing.assert_allclose(float(dec["forecast_value"][0, 0]), want, rtol=1e-5)
    assert bool(dec["forecast_valid"][0, 0])

    # POINTS mode: flat amp*weight, no sin — for both wave and marker
    cfg_pts = ReconstructConfig(max_waves=1, draw_sine=False,
                                min_coherence=0.0)
    dec_pts = decode_causal(jnp.asarray(a), cfg_pts)
    np.testing.assert_allclose(float(dec_pts["wave"][0, 0]), 2.0 * w_raw, rtol=1e-5)
    np.testing.assert_allclose(float(dec_pts["forecast_value"][0, 0]), 2.0 * w_raw, rtol=1e-5)
