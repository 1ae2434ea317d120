"""External-oracle gate for the integrated v757 pipeline (VERDICT r1 #5).

`tests/oracle_v757.py` is an independent NumPy transcription of the open
v7.57 MQL5 math (no wavespec_tpu imports). Here the full JAX pipeline in
reference-exact configuration (all-bin candidates, sequential matching)
is run over one synthetic recorded price series and its integrated
per-bar outputs — slot periods, activity, states/colors, ETAs, cycle
waveforms — are gated against the transcription.
"""

import numpy as np
import pytest

from tests.oracle_v757 import run_oracle
from wavespec_tpu.analyze.trackers import TrackerConfig
from wavespec_tpu.extract import DetrendMode
from wavespec_tpu.ops.windows import WindowType
from wavespec_tpu.pipeline.v757 import V757Config, run_v757

WINDOW = 256
N_BARS = 700


def _price_series(n=N_BARS, seed=7):
    t = np.arange(n)
    rng = np.random.default_rng(seed)
    return (
        100.0
        + np.cumsum(0.03 * rng.standard_normal(n))
        + 1.5 * np.sin(2 * np.pi * t / 24.0)
        + 1.0 * np.sin(2 * np.pi * t / 40.0)
    ).astype(np.float64)


@pytest.fixture(scope="module")
def oracle_out():
    series = _price_series()
    return run_oracle(
        series, window=WINDOW, min_period=18.0, max_period=52.0,
        trend_period=1024, window_type="blackman", bandwidth=0.5,
        seconds_per_bar=60.0,
    )


# sliding_spectral=True forces the production TPU spectral path (the
# chunked sliding band DFT) through the same bar-exact gate on CPU;
# False is the framed reference path.
@pytest.fixture(scope="module", params=[False, True],
                ids=["framed", "sliding"])
def both(request, oracle_out):
    series = _price_series()
    cfg = V757Config(
        window=WINDOW, min_period=18.0, max_period=52.0, trend_period=1024,
        taper=WindowType.BLACKMAN, detrend=DetrendMode.EHLERS,
        n_candidates=0,
        tracker=TrackerConfig(capacity=64, sequential_match=True),
        seconds_per_bar=60.0, enable_kalman=False,
        sliding_spectral=request.param,
    )
    ours = run_v757(series.astype(np.float32), cfg, hop=1)
    # frame f of ours = bar WINDOW-1+f of the oracle
    sl = slice(WINDOW - 1, None)
    return {k: v[sl] for k, v in oracle_out.items()}, ours


def test_slot_activity_matches(both):
    oracle, ours = both
    np.testing.assert_array_equal(ours["slot_valid"], oracle["active"])


def test_slot_periods_match(both):
    oracle, ours = both
    np.testing.assert_allclose(
        ours["slot_period"], oracle["period"], rtol=1e-5, atol=1e-5
    )


def test_states_and_colors_match(both):
    oracle, ours = both
    np.testing.assert_array_equal(ours["states"], oracle["states"])
    np.testing.assert_array_equal(ours["color"], oracle["color"])


def test_cycle_waveforms_match(both):
    oracle, ours = both
    scale = np.abs(oracle["cycle"]).max()
    np.testing.assert_allclose(
        ours["cycle_values"], oracle["cycle"], atol=2e-4 * max(scale, 1.0)
    )


def test_etas_match(both):
    oracle, ours = both
    scale = max(1.0, np.abs(oracle["eta_raw"]).max())
    np.testing.assert_allclose(
        ours["eta_raw"], oracle["eta_raw"], atol=5e-3 * scale
    )
    np.testing.assert_allclose(
        ours["eta_display"], oracle["eta"], atol=5e-3 * scale
    )


def _run_mode(eta_mode_oracle, eta_mode_ours):
    from wavespec_tpu.analyze.eta import EtaMode

    series = _price_series()
    oracle = run_oracle(
        series, window=WINDOW, min_period=18.0, max_period=52.0,
        trend_period=1024, window_type="blackman", bandwidth=0.5,
        seconds_per_bar=60.0, eta_mode=eta_mode_oracle,
    )
    cfg = V757Config(
        window=WINDOW, min_period=18.0, max_period=52.0, trend_period=1024,
        taper=WindowType.BLACKMAN, detrend=DetrendMode.EHLERS,
        n_candidates=0,
        tracker=TrackerConfig(capacity=64, sequential_match=True),
        seconds_per_bar=60.0, enable_kalman=False,
        eta_mode={"realfft": EtaMode.REALFFT,
                  "hybrid": EtaMode.HYBRID}[eta_mode_oracle],
    )
    ours = run_v757(series.astype(np.float32), cfg, hop=1)
    sl = slice(WINDOW - 1, None)
    return {k: v[sl] for k, v in oracle.items()}, ours


def test_hybrid_mode_matches_oracle():
    """The full hybrid ETA path — phase-duration learning, median history,
    scientific group-delay blend 0.5/0.35/0.15, countdown — against the
    transcription (`:3080-3130`)."""
    oracle, ours = _run_mode("hybrid", "hybrid")
    np.testing.assert_array_equal(ours["states"], oracle["states"])
    scale = max(1.0, np.abs(oracle["eta_raw"]).max())
    np.testing.assert_allclose(
        ours["eta_raw"], oracle["eta_raw"], atol=5e-3 * scale
    )
    np.testing.assert_allclose(
        ours["eta_display"], oracle["eta"], atol=5e-3 * scale
    )


def test_realfft_mode_matches_oracle():
    """Group-delay ETA mode, including the reference's delta_omega =
    2*pi/(N/2) convention (`:1387`)."""
    oracle, ours = _run_mode("realfft", "realfft")
    np.testing.assert_array_equal(ours["states"], oracle["states"])
    scale = max(1.0, np.abs(oracle["eta_raw"]).max())
    np.testing.assert_allclose(
        ours["eta_raw"], oracle["eta_raw"], atol=5e-3 * scale
    )


# ------------------------------------------------- shipped-defaults gate

def _default_cfg(window):
    """The SHIPPED defaults: vectorized matcher, n_candidates=24."""
    return V757Config(
        window=window, min_period=18.0, max_period=52.0, trend_period=1024,
        taper=WindowType.BLACKMAN, detrend=DetrendMode.EHLERS,
        seconds_per_bar=60.0, enable_kalman=False,
    )


def test_default_config_matches_oracle_small_window(both):
    """Oracle gate for the DEFAULT config (vectorized matcher,
    n_candidates=24), measured — not asserted. At window 256 the band
    holds 10 bins: the 24-candidate cut covers every bin and the
    vectorized matcher reproduces the reference's sequential scan
    BAR-FOR-BAR (activity, states, colors exact; periods to f32 eps)."""
    oracle, _ = both
    series = _price_series()
    ours = run_v757(series.astype(np.float32), _default_cfg(WINDOW), hop=1)
    np.testing.assert_array_equal(ours["slot_valid"], oracle["active"])
    np.testing.assert_array_equal(ours["states"], oracle["states"])
    np.testing.assert_allclose(
        ours["slot_period"], oracle["period"], rtol=1e-5, atol=1e-5
    )


def test_default_config_divergence_dense_band_quantified():
    """Window 1024 puts 37 bins inside the 5% tracker tolerance: the
    reference's in-frame period drag (each bin re-matches the tracker the
    PREVIOUS bin just updated) assigns slots differently from the
    order-free matcher. This pins the measured divergence band of the
    shipped defaults on the gate series: slot-activity agreement stays
    >= 97%, per-slot period deltas are LARGE (median ~30% — slots hold
    different trackers), yet the steady-state slot contents still track
    the planted 24/40-bar cycles. Documented deviation, not a bug: the
    defaults trade bar-exact slot assignment for an order-free matcher
    and a spectrally-meaningful candidate cut."""
    window, n = 1024, 1524
    t = np.arange(n)
    rng = np.random.default_rng(7)
    series = (
        100.0
        + np.cumsum(0.03 * rng.standard_normal(n))
        + 1.5 * np.sin(2 * np.pi * t / 24.0)
        + 1.0 * np.sin(2 * np.pi * t / 40.0)
    )
    oracle = run_oracle(
        series, window=window, min_period=18.0, max_period=52.0,
        trend_period=1024, window_type="blackman", bandwidth=0.5,
        seconds_per_bar=60.0,
    )
    sl = slice(window - 1, None)
    oracle = {k: v[sl] for k, v in oracle.items()}
    ours = run_v757(series.astype(np.float32), _default_cfg(window), hop=1)

    activity = (ours["slot_valid"] == oracle["active"]).mean()
    assert activity >= 0.97, activity
    both_valid = ours["slot_valid"] & oracle["active"]
    pd = np.abs(ours["slot_period"][both_valid] - oracle["period"][both_valid])
    pd = pd / np.maximum(oracle["period"][both_valid], 1e-9)
    assert 0.1 <= np.median(pd) <= 0.45, np.median(pd)  # the measured band
    # steady state: the planted cycles live in the slots
    tail = ours["slot_period"][-50:][ours["slot_valid"][-50:]]
    assert np.any(np.abs(tail - 24.0) <= 1.5), np.unique(np.round(tail))
    assert np.any(np.abs(tail - 40.0) <= 2.0), np.unique(np.round(tail))


@pytest.mark.slow
def test_reference_default_window_16384_matches_oracle():
    """Bar-exact oracle gate at the v7.57 DEFAULT window 16384
    (`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:801` — the shipped input;
    VERDICT r3 item 3). The [18, 52]-bar band holds 595 bins at this
    window, so reference-exact mode (all-bin candidates, sequential
    in-frame matching) exercises the tracker at ~60x the window-256
    candidate density; capacity is sized to hold the reference's
    unbounded-append worst case."""
    window, n = 16384, 16384 + 150
    t = np.arange(n)
    rng = np.random.default_rng(7)
    series = (
        100.0
        + np.cumsum(0.03 * rng.standard_normal(n))
        + 1.5 * np.sin(2 * np.pi * t / 24.0)
        + 1.0 * np.sin(2 * np.pi * t / 40.0)
    )
    oracle = run_oracle(
        series, window=window, min_period=18.0, max_period=52.0,
        trend_period=1024, window_type="blackman", bandwidth=0.5,
        seconds_per_bar=60.0,
    )
    sl = slice(window - 1, None)
    oracle = {k: v[sl] for k, v in oracle.items()}
    cfg = V757Config(
        window=window, min_period=18.0, max_period=52.0, trend_period=1024,
        taper=WindowType.BLACKMAN, detrend=DetrendMode.EHLERS,
        n_candidates=0,
        tracker=TrackerConfig(capacity=1024, sequential_match=True),
        seconds_per_bar=60.0, enable_kalman=False,
    )
    ours = run_v757(series.astype(np.float32), cfg, hop=1)
    np.testing.assert_array_equal(ours["slot_valid"], oracle["active"])
    np.testing.assert_array_equal(ours["states"], oracle["states"])
    np.testing.assert_allclose(
        ours["slot_period"], oracle["period"], rtol=1e-5, atol=1e-5
    )
    scale = max(1.0, np.abs(oracle["eta_raw"]).max())
    np.testing.assert_allclose(
        ours["eta_raw"], oracle["eta_raw"], atol=5e-3 * scale
    )
    cyc_scale = np.abs(oracle["cycle"]).max()
    np.testing.assert_allclose(
        ours["cycle_values"], oracle["cycle"], atol=2e-4 * max(cyc_scale, 1.0)
    )


def test_window_1024_divergence_attributed_to_matcher_order():
    """Attribution of the shipped-defaults window-1024 divergence
    (VERDICT r3 item 4): it is matcher-ORDER semantics, not f32
    numerics. Two pinned facts on the gate series:

    (a) reference-exact semantics (all-bin candidates, sequential
        in-frame matching) with our f32 spectral stage reproduce the
        float64 NumPy oracle BAR-EXACT at window 1024 — activity, states
        and periods all match, so the f32 spectra flip nothing even at
        37-bins-per-tolerance density;
    (b) feeding the oracle's own float64 spectra (identical inputs, no
        f32 anywhere upstream) through the default vectorized order-free
        matcher still yields the same ~30%-median per-slot period delta
        — the divergence survives infinite spectral precision, so it is
        entirely the documented in-frame period-drag semantics the
        order-free matcher deliberately drops (analyze/trackers.py).
    """
    window, n = 1024, 1524
    t = np.arange(n)
    rng = np.random.default_rng(7)
    series = (
        100.0
        + np.cumsum(0.03 * rng.standard_normal(n))
        + 1.5 * np.sin(2 * np.pi * t / 24.0)
        + 1.0 * np.sin(2 * np.pi * t / 40.0)
    )
    oracle = run_oracle(
        series, window=window, min_period=18.0, max_period=52.0,
        trend_period=1024, window_type="blackman", bandwidth=0.5,
        seconds_per_bar=60.0,
    )
    sl = slice(window - 1, None)
    oracle = {k: v[sl] for k, v in oracle.items()}

    # (a) reference-exact semantics, f32 spectra: bar-exact
    cfg = V757Config(
        window=window, min_period=18.0, max_period=52.0, trend_period=1024,
        taper=WindowType.BLACKMAN, detrend=DetrendMode.EHLERS,
        n_candidates=0,
        tracker=TrackerConfig(capacity=128, sequential_match=True),
        seconds_per_bar=60.0, enable_kalman=False,
    )
    ours = run_v757(series.astype(np.float32), cfg, hop=1)
    np.testing.assert_array_equal(ours["slot_valid"], oracle["active"])
    np.testing.assert_array_equal(ours["states"], oracle["states"])
    np.testing.assert_allclose(
        ours["slot_period"], oracle["period"], rtol=1e-5, atol=1e-5
    )

    # (b) float64 oracle spectra -> default vectorized matcher: the
    # divergence band persists unchanged (same band the defaults gate
    # pins with f32 spectra), so precision is not the cause.
    import jax.numpy as jnp

    from tests.oracle_v757 import _apply_window
    from wavespec_tpu.analyze.trackers import track_frames

    w = window
    wf = 2.0 * np.pi / 1024
    alpha = (1 - np.sin(wf)) / np.cos(wf)
    c = (1 - alpha) / 2
    k_min = int(np.ceil(w / 52.0))
    k_max = int(w // 18)
    cands = []
    for i in range(w - 1, n):
        win = series[i - w + 1 : i + 1].copy()
        tr = np.empty(w)
        tr[0] = c * (win[0] + win[0])
        for j2 in range(1, w):
            tr[j2] = c * (win[j2] + win[j2 - 1]) + alpha * tr[j2 - 1]
        det = _apply_window(win - tr, "blackman")
        sp = np.fft.rfft(det)
        power = (sp.real ** 2 + sp.imag ** 2)[: w // 2]
        band = power[k_min : min(k_max + 1, w // 2)]
        order = np.argsort(-band, kind="stable")[:24]
        cands.append((w / (order + k_min).astype(np.float64),
                      band[order], order + k_min))
    cp = np.stack([x[0] for x in cands]).astype(np.float32)
    cw = np.stack([x[1] for x in cands]).astype(np.float32)
    ci = np.stack([x[2] for x in cands]).astype(np.int32)
    outs, _ = track_frames(
        jnp.asarray(cp), jnp.asarray(cw), jnp.asarray(ci),
        jnp.asarray(cw > 0), cfg=TrackerConfig(),
    )
    sv = np.asarray(outs["slot_valid"])
    spd = np.asarray(outs["slot_period"])
    activity = (sv == oracle["active"]).mean()
    assert activity >= 0.97, activity
    both_valid = sv & oracle["active"]
    pd = np.abs(spd[both_valid] - oracle["period"][both_valid])
    pd = pd / np.maximum(oracle["period"][both_valid], 1e-9)
    assert 0.1 <= np.median(pd) <= 0.45, np.median(pd)
