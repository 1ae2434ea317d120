"""Feed-layer tests: ZigZag, PLA, applied price, tick resampler."""

import numpy as np
import pytest

from wavespec_tpu.feeds import (
    AppliedPrice,
    PlaConfig,
    ZigMode,
    ZigZagConfig,
    applied_price_series,
    build_pla_series,
    build_tick_series,
    build_zigzag_feed,
    pla_segments,
    resample_ticks,
    zigzag_extrema,
)


def triangle_wave(n, period=50, amp=1.0):
    t = np.arange(n)
    phase = (t % period) / period
    return amp * (2 * np.abs(2 * phase - 1) - 1)


# ------------------------------------------------------------------ zigzag


def zig_prices(n=300, period=50):
    mid = triangle_wave(n, period) + 10.0
    high = mid + 0.01
    low = mid - 0.01
    return high, low


def test_zigzag_finds_alternating_extrema():
    high, low = zig_prices()
    cfg = ZigZagConfig(depth=12, deviation_points=5, backstep=3, point=1e-4)
    peaks, bottoms = zigzag_extrema(high, low, cfg)
    pk = np.nonzero(peaks)[0]
    bt = np.nonzero(bottoms)[0]
    assert len(pk) >= 3 and len(bt) >= 3
    # alternation: merge and check kinds alternate
    merged = sorted([(i, 1) for i in pk] + [(i, -1) for i in bt])
    kinds = [k for _, k in merged]
    assert all(kinds[i] != kinds[i + 1] for i in range(len(kinds) - 1))
    # peaks sit at local maxima of the triangle (within a couple bars)
    for i in pk:
        assert high[i] >= high[max(0, i - 10) : i + 10].max() - 1e-9


def test_zigzag_records_only_at_true_extreme_bars():
    """MT5's final recording gate (`low[shift]==val`): a bar is only
    marked when it IS the depth-window extreme. Without the gate, an old
    window minimum rolling off the back of the depth window marked a
    phantom extremum at the current (non-extreme) bar carrying the
    earlier bar's value."""
    rng = np.random.default_rng(7)
    mid = np.cumsum(rng.standard_normal(400)) * 0.01 + 10.0
    high = mid + np.abs(rng.standard_normal(400)) * 0.005
    low = mid - np.abs(rng.standard_normal(400)) * 0.005
    cfg = ZigZagConfig(depth=12, deviation_points=5, backstep=3, point=1e-4)
    peaks, bottoms = zigzag_extrema(high, low, cfg)
    for i in np.nonzero(peaks)[0]:
        assert peaks[i] == high[i], (i, peaks[i], high[i])
    for i in np.nonzero(bottoms)[0]:
        assert bottoms[i] == low[i], (i, bottoms[i], low[i])


def test_zigzag_step_feed_holds_extrema():
    high, low = zig_prices()
    cfg = ZigZagConfig(point=1e-4)
    feed = build_zigzag_feed(high, low, ZigMode.STEP, cfg)
    peaks, bottoms = zigzag_extrema(high, low, cfg)
    main = np.where(peaks != 0, peaks, bottoms)
    ext = np.nonzero(main)[0]
    # after each extremum until the next, the feed holds its value
    for a, b in zip(ext[:-1], ext[1:]):
        assert np.all(feed[a:b] == main[a])


def test_zigzag_interp_feed_is_piecewise_linear():
    high, low = zig_prices()
    cfg = ZigZagConfig(point=1e-4)
    feed = build_zigzag_feed(high, low, ZigMode.INTERP, cfg)
    peaks, bottoms = zigzag_extrema(high, low, cfg)
    main = np.where(peaks != 0, peaks, bottoms)
    ext = np.nonzero(main)[0]
    a, b = ext[0], ext[1]
    mid = (a + b) // 2
    expected = main[a] + (main[b] - main[a]) * (mid - a) / (b - a)
    np.testing.assert_allclose(feed[mid], expected, rtol=1e-9)


def test_zigzag_mid_feed():
    high, low = zig_prices()
    feed = build_zigzag_feed(high, low, ZigMode.MID)
    np.testing.assert_allclose(feed, (high + low) / 2)


# --------------------------------------------------------------------- pla


def test_pla_approximates_piecewise_line():
    x1 = np.linspace(0, 1, 50)
    x2 = np.linspace(1, 0.5, 50)
    series = np.concatenate([x1, x2])
    out = build_pla_series(series, PlaConfig(max_segments=8, max_error=1e-4))
    # reference recursion splits at the worst sample, which at a kink can
    # burn budget on boundary singletons; the fit is approximate, not exact
    np.testing.assert_allclose(out, series, atol=2e-2)
    segs = pla_segments(series, PlaConfig(max_segments=8, max_error=1e-4))
    assert 2 <= len(segs) <= 8


def test_pla_respects_segment_budget():
    rng = np.random.default_rng(0)
    series = np.cumsum(rng.standard_normal(500))
    segs = pla_segments(series, PlaConfig(max_segments=8, max_error=1e-9))
    # the reference budget check counts appended segments only, so pending
    # recursion branches can overshoot slightly
    assert len(segs) <= 10
    # segments tile the series
    assert segs[0][0] == 0
    covered = sorted((s, e) for s, e, *_ in segs)
    for (s1, e1), (s2, e2) in zip(covered[:-1], covered[1:]):
        assert s2 in (e1, e1 + 1)  # split at worst point duplicates one index
    assert covered[-1][1] == 499


def test_pla_single_segment_when_linear():
    series = 2.0 * np.arange(100) + 5.0
    segs = pla_segments(series, PlaConfig())
    assert len(segs) == 1
    s, e, slope, intercept = segs[0]
    np.testing.assert_allclose(slope, 2.0, rtol=1e-9)
    np.testing.assert_allclose(intercept, 5.0, atol=1e-6)


# ------------------------------------------------------------ applied price


def test_applied_price_modes():
    n = 64
    rng = np.random.default_rng(1)
    close = 10 + rng.standard_normal(n) * 0.01
    open_ = close + 0.001
    high = close + 0.01
    low = close - 0.01
    get = lambda m: applied_price_series(m, close=close, open=open_, high=high, low=low)
    np.testing.assert_array_equal(get(AppliedPrice.CLOSE), close)
    np.testing.assert_array_equal(get(AppliedPrice.OPEN), open_)
    np.testing.assert_allclose(get(AppliedPrice.MEDIAN), (high + low) / 2)
    np.testing.assert_allclose(get(AppliedPrice.TYPICAL), (high + low + close) / 3)
    np.testing.assert_allclose(get(AppliedPrice.WEIGHTED), (high + low + 2 * close) / 4)
    pla = get(AppliedPrice.PLA)
    assert pla.shape == close.shape


# -------------------------------------------------------------------- ticks


def test_resample_ticks_forward_fill():
    times = np.array([0.0, 1.0, 5.0, 9.0])
    prices = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    out = np.asarray(
        resample_ticks(prices, times, window_len=10, interval_seconds=1.0)
    )
    # grid: 0..9 seconds; forward fill
    want = [1, 2, 2, 2, 2, 3, 3, 3, 3, 4]
    np.testing.assert_allclose(out, want)


def test_resample_ticks_smoothing():
    times = np.arange(20, dtype=float)
    prices = np.zeros(20, np.float32)
    prices[10:] = 1.0
    out = np.asarray(
        resample_ticks(prices, times, window_len=20, interval_seconds=1.0,
                       smoothing_window=4)
    )
    # moving average of a step: ramps over 4 samples
    np.testing.assert_allclose(out[9], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[13], 1.0, atol=1e-6)
    assert 0 < out[11] < 1


def test_build_tick_series_with_zigzag():
    t = np.arange(2000, dtype=float)
    prices = (triangle_wave(2000, 100) + 10).astype(np.float32)
    out = build_tick_series(prices, t, window_len=500, interval_seconds=1.0,
                            zig_mode=int(ZigMode.STEP),
                            zig_cfg=ZigZagConfig(point=1e-3))
    assert out.shape == (500,)
    assert np.isfinite(out).all()


def test_build_tick_series_epoch_timestamps():
    """Unix-epoch tick times must not lose sub-second structure to f32."""
    base = 1.767e9  # ~2026 epoch seconds
    t = base + np.arange(600, dtype=np.float64) * 0.5  # 2 ticks/second
    prices = np.arange(600, dtype=np.float32)
    out = build_tick_series(prices, t, window_len=100, interval_seconds=1.0)
    # 1-second grid over 0.5-second ticks: strictly increasing by 2
    diffs = np.diff(out)
    assert (diffs > 0).all()
    np.testing.assert_allclose(diffs, 2.0, atol=0.5)


def test_feed_pool_lru_and_versioning():
    from wavespec_tpu.feeds import FeedPool, ZigMode

    calls = []

    def fetch_for(tf):
        def fetch():
            calls.append(tf)
            high, low = zig_prices(200)
            return high, low
        return fetch

    pool = FeedPool(capacity=2)
    pool.get_zigzag_feed("EURUSD", "M1", fetch_for("M1"), ZigMode.MID, version=0)
    pool.get_zigzag_feed("EURUSD", "M1", fetch_for("M1"), ZigMode.MID, version=0)
    assert calls == ["M1"]  # cached
    pool.get_zigzag_feed("EURUSD", "M1", fetch_for("M1"), ZigMode.MID, version=1)
    assert calls == ["M1", "M1"]  # version bump rebuilds
    pool.get_zigzag_feed("EURUSD", "M5", fetch_for("M5"), ZigMode.MID, version=0)
    pool.get_zigzag_feed("EURUSD", "H1", fetch_for("H1"), ZigMode.MID, version=0)
    # capacity 2: M1 evicted
    assert pool.active_timeframes() == ["M5", "H1"]
    pool.get_zigzag_feed("EURUSD", "M1", fetch_for("M1"), ZigMode.MID, version=1)
    assert calls == ["M1", "M1", "M5", "H1", "M1"]


def test_zigzag_deviation_is_inert_mt5_parity():
    """MT5-parity quirk, documented deliberately: in the standard MT5
    ZigZag the final recording gate (`low[shift]==val`) blocks every path
    where the deviation test could fire (the test can only fail at a
    non-extreme bar, where the write is blocked anyway, and the backstep
    clears it unlocks are provably no-ops — a candidate within backstep is
    always <= the new window extreme). Any deviation setting must produce
    identical output. A round-2 'fix' that made deviation effective did so
    by stamping phantom extrema at non-extreme bars."""
    rng = np.random.default_rng(9)
    n = 400
    base = np.cumsum(rng.standard_normal(n)) * 0.0003 + 1.2
    high = base + 0.0002 + 0.0002 * rng.random(n)
    low = base - 0.0002 - 0.0002 * rng.random(n)
    tight = zigzag_extrema(high, low, ZigZagConfig(deviation_points=0))
    loose = zigzag_extrema(high, low, ZigZagConfig(deviation_points=40))
    np.testing.assert_array_equal(tight[0], loose[0])
    np.testing.assert_array_equal(tight[1], loose[1])
