"""Bridge-compatibility API tests: the full mt-bridge surface works."""

import numpy as np
import pytest

from wavespec_tpu import bridge


def planted(n=1024, period=64.0, amp=2.0):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * t / period)).astype(np.float64)


def test_session_surface():
    assert bridge.gpu_init(0, 64) == bridge.Status.OK
    assert bridge.gpu_get_last_error() == ""


def test_fft_forward_inverse():
    x = planted()
    inter = bridge.gpu_fft_real_forward(x)
    assert inter.shape == (1024,)
    # bin 16 (period 64) dominates
    re, im = inter[0::2], inter[1::2]
    power = re**2 + im**2
    assert power.argmax() == 16
    back = bridge.gpu_fft_real_inverse(inter)
    np.testing.assert_allclose(back, x, atol=1e-2)


def test_fft_batch():
    x = np.concatenate([planted(256, 32), planted(256, 16)])
    out = bridge.gpu_fft_real_forward_batch(x, 256, 2)
    assert out.shape == (2, 256)
    p0 = out[0, 0::2] ** 2 + out[0, 1::2] ** 2
    p1 = out[1, 0::2] ** 2 + out[1, 1::2] ** 2
    assert p0.argmax() == 8 and p1.argmax() == 16


def test_fft_segmented():
    x = planted(4096, 100.0)
    power = bridge.gpu_wave_fft_segmented(x, 1024, 256, 0)
    assert power.shape == (512,)
    assert power.argmax() == round(1024 / 100)


def test_async_fft_job():
    jid = bridge.gpu_submit_fft_real_forward(planted(512, 32))
    while True:
        ready, spec = bridge.gpu_try_get_result(jid)
        if ready:
            break
    assert spec.shape == (512,)
    bridge.gpu_free_job(jid)


def test_preprocessing_ops_roundtrip():
    x = planted(512, 40)
    assert bridge.gpu_zero_pad_time_series(x, 8, 8).shape == (528,)
    assert bridge.gpu_resample_time_series(x, 0.5).shape == (256,)
    dc = bridge.gpu_remove_dc_time_series(x + 5.0, 0, 0.98)
    np.testing.assert_allclose(dc.mean(), 0.0, atol=1e-4)
    spec = bridge.gpu_fft_real_forward(x)
    den = bridge.gpu_spectral_denoise(spec)
    assert den.shape == spec.shape
    up = bridge.gpu_spectral_upscale(spec, 2.0)
    assert up.shape == (1024,)
    mask = np.ones(256)
    np.testing.assert_allclose(bridge.gpu_apply_mask(spec, mask), spec, rtol=1e-6)
    uw = bridge.gpu_spectral_phase_unwrap(spec)
    assert uw.shape == (256,)
    kern = np.ones(256)
    np.testing.assert_allclose(bridge.gpu_spectral_convolution(spec, kern), spec)
    np.testing.assert_allclose(bridge.gpu_spectral_correlation(spec, kern), spec)


def test_extract_cycles_sync():
    flat = bridge.gpu_extract_cycles(planted(), top_k=2, min_period=10,
                                     max_period=200, method=0)
    assert flat.shape == (30,)
    np.testing.assert_allclose(flat[2], 64.0, rtol=1e-4)  # period field
    np.testing.assert_allclose(flat[0], 2.0, rtol=1e-2)   # amplitude


def test_extract_cycles_async_and_batch():
    jid = bridge.gpu_submit_extract_cycles(planted(), top_k=2, method=1,
                                           min_period=10, ar_order=10)
    while True:
        ready, flat = bridge.gpu_try_get_cycles(jid)
        if ready:
            break
    assert flat.shape == (30,)
    bridge.gpu_free_job(jid)

    series = planted(1024 + 64)
    jid = bridge.gpu_submit_extract_cycles_batch(series, 1024, hop=32,
                                                 top_k=2, method=0,
                                                 min_period=10)
    while True:
        ready, attrs = bridge.gpu_try_get_cycles_batch(jid)
        if ready:
            break
    assert attrs.shape == (3, 2, 15)
    bridge.gpu_free_job(jid)


@pytest.mark.slow
def test_template_job():
    preset = ("time: dc(mode=0); extract: window=1024, top_k=2, method=music,"
              " min_period=10, max_period=200, ar_order=10; waves: 2")
    jid = bridge.mt_gpu_wave_submit_template_job(preset, planted(1536))
    while True:
        ready, res = bridge.mt_gpu_wave_try_get_template_job(jid)
        if ready:
            break
    assert res.cycles.shape == (2, 15)
    assert res.fft.shape == (1024,)  # interleaved re/im, bridge layout
    periods = res.cycles[:, 2]
    assert any(abs(p - 64.0) < 3 for p in periods if p > 0)
    bridge.mt_gpu_wave_free_template_job(jid)


def test_tick_series_builder():
    t = np.arange(3000, dtype=float)
    prices = np.sin(2 * np.pi * t / 500) + 10
    out = bridge.mt_gpu_wave_build_tick_series(
        prices, t, window_len=1024, interval_seconds=1.0, smoothing_window=3
    )
    assert out.shape == (1024,)


def test_hud_tracks_last_call():
    bridge.gpu_fft_real_forward(planted(256, 32))
    assert bridge.get_hud().last_call == "gpu_fft_real_forward"
    bridge.gpu_extract_cycles(planted(), top_k=1, method=0, min_period=10)
    assert "extract" in bridge.get_hud().render()


def test_async_fft_matches_sync_for_any_length():
    """Async/sync parity: gpu_submit_fft_real_forward must accept the
    same inputs as gpu_fft_real_forward — including non-power-of-two and
    short lengths, which route through the jnp.fft oracle."""
    import time as _t

    for n in (1000, 12, 4096):
        x = np.sin(np.arange(n) / 7.0)
        sync = bridge.gpu_fft_real_forward(x)
        job = bridge.gpu_submit_fft_real_forward(x)
        deadline = _t.time() + 30
        while _t.time() < deadline:
            ready, out = bridge.gpu_try_get_result(job)
            if ready:
                break
            _t.sleep(0.005)
        assert ready, n
        bridge.gpu_free_job(job)
        np.testing.assert_allclose(out, sync, rtol=1e-5, atol=1e-5)
