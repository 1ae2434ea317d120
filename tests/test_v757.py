"""End-to-end v7.57 analytics pipeline test."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.analyze.eta import EtaMode
from wavespec_tpu.extract import DetrendMode
from wavespec_tpu.ops.windows import WindowType
from wavespec_tpu.pipeline import V757Config, run_v757


def test_v757_full_pipeline():
    n = 1024 + 400
    t = np.arange(n)
    series = (
        100.0
        + np.cumsum(0.01 * np.random.default_rng(0).standard_normal(n))
        + 1.5 * np.sin(2 * np.pi * t / 36)
        + 0.8 * np.sin(2 * np.pi * t / 24)
    )
    cfg = V757Config(window=1024, min_period=18.0, max_period=52.0,
                     trend_period=256, taper=WindowType.BLACKMAN,
                     detrend=DetrendMode.EHLERS, n_candidates=16)
    out = run_v757(series, cfg, hop=1)
    t_frames = n - 1024 + 1

    assert out["slot_period"].shape == (t_frames, 12)
    assert out["sig"].shape == (t_frames, 12)
    assert out["kalman"].shape == (t_frames,)

    # the two planted periods must occupy the top two slots persistently
    tail = out["slot_period"][-50:]
    found = set()
    for s in range(12):
        vals = tail[:, s][tail[:, s] > 0]
        if len(vals):
            found.add(round(float(np.median(vals))))
    assert any(abs(p - 36) <= 2 for p in found), found
    assert any(abs(p - 24) <= 2 for p in found), found

    # slot identity is stable over the tail (no-repaint slot policy)
    uids = out["slot_uid"][-50:, 0]
    assert len(set(uids.tolist())) == 1

    # cycle waveforms oscillate and colors flip accordingly
    assert np.abs(out["cycle_values"][-200:, 0]).max() > 0.1
    colors = out["color"][-200:, 0]
    assert 0.2 < colors.mean() < 0.8  # both phases present

    # Kalman tracks the price level
    assert abs(out["kalman"][-1] - series[-1]) < 1.0

    # ETA display respects sign convention
    bullish = out["color"][-200:, 0] > 0.5
    disp = out["eta_display"][-200:, 0]
    valid = out["slot_valid"][-200:, 0]
    assert (disp[bullish & valid] >= 1.0 - 1e-6).all()
    assert (disp[~bullish & valid] <= 0.0).all()


def test_v757_leak_detection_end_to_end():
    """A short-period intruder burst must raise leak flags with signed ETA."""
    import jax

    n = 1024 + 300
    t = np.arange(n)
    series = 100.0 + 2.0 * np.sin(2 * np.pi * t / 40)
    # intruder: strong short cycle burst over the last 150 bars
    burst = np.zeros(n)
    burst[-150:] = 1.9 * np.sin(2 * np.pi * t[-150:] / 11)
    series = series + burst
    cfg = V757Config(window=1024, min_period=9.0, max_period=52.0,
                     trend_period=256, taper=WindowType.BLACKMAN,
                     detrend=DetrendMode.EHLERS, n_candidates=16)
    out = run_v757(series, cfg, hop=1)
    # some slot flags a leak during the burst window
    tail = out["leak_active"][-100:]
    assert tail.any(), "expected leak flags during the intruder burst"
    # leak ETA present and finite where flagged
    eta = out["leak_eta"][-100:]
    assert np.isfinite(eta).all()
    assert (np.abs(eta[tail]) > 0).any()


def test_v757_no_repaint():
    """Appending bars never changes previously computed v7.57 frames."""
    n = 1024 + 200
    t = np.arange(n)
    series = 100 + 1.5 * np.sin(2 * np.pi * t / 36) + 0.8 * np.sin(2 * np.pi * t / 24)
    cfg = V757Config(window=1024, min_period=18.0, max_period=52.0,
                     trend_period=256, taper=WindowType.BLACKMAN,
                     detrend=DetrendMode.EHLERS, n_candidates=8)
    a = run_v757(series[: n - 60], cfg, hop=4)
    b = run_v757(series, cfg, hop=4)
    frames = a["slot_period"].shape[0]
    for key in ("slot_period", "slot_uid", "color", "sig", "states"):
        np.testing.assert_array_equal(a[key], b[key][:frames])


def test_pack_transfer_roundtrips_large_uids():
    """slot_uid rides the single packed f32 transfer as TWO exact
    value-cast rows (v >> 12, v & 0xFFF): one value cast would round uids
    above 2^24 (f32 spacing 2), and a BITCAST lane flushes small ints to
    zero whenever XLA fuses it with arithmetic rows (chip-reproduced: the
    online driver's resumed steps returned all-zero slot_uid). Round-trip
    values straddling and far beyond 2^24 up to int32 max, plus small
    ints (denormal bit patterns under the old bitcast)."""
    from wavespec_tpu.pipeline.v757 import _pack_transfer, _unpack_transfer

    uids = np.array([[1, 2, 3], [2**24 - 1, 2**24 + 1, 2**24 + 3],
                     [2**30 + 7, 5, 2**31 - 1]], np.int32)
    out = {
        "slot_uid": jnp.asarray(uids),
        "slot_valid": jnp.asarray(uids % 2 == 1),
        "eta_raw": jnp.asarray(np.linspace(-3, 3, 9, dtype=np.float32).reshape(3, 3)),
        "confluence": jnp.asarray(np.array([0.0, 1.0, 2.0], np.float32)),
    }
    packed, spans = _pack_transfer(out)
    back = _unpack_transfer(np.asarray(packed), spans)
    np.testing.assert_array_equal(back["slot_uid"], uids)
    assert back["slot_uid"].dtype == np.int32
    np.testing.assert_array_equal(back["slot_valid"], np.asarray(uids % 2 == 1))
    np.testing.assert_allclose(back["eta_raw"], np.asarray(out["eta_raw"]))
    assert back["confluence"].shape == (3,)
