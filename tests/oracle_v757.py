"""Independent NumPy transcription of the v7.57 CPU analytics pipeline.

This is the EXTERNAL ORACLE for the integrated v757 pipeline (VERDICT r1
item 5): a line-by-line transcription of the open MQL5 math of
`/root/reference/Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5` —

- per-bar loop `:3357-3608` (price window, trend high-pass `:3422-3435`,
  taper `1.0.2.mq5:884-935`, FFT power spectrum `:3495-3501`, all-bin
  candidate scan `:3505-3516`);
- sequential tracker matching `IsSamePeriod`/`FindClosestTracker`/
  `UpdateTracker`/`AddTracker`/`DeactivateUnseenTrackers` `:1415-1530`
  (dynamic array with shift-removal, exactly as written);
- `UpdateStableSlots` `:1581-1667` (stable power-descending fill);
- `IsLeakage`/`DetectLeakages` `:1677-1782` (raw-index leak continuation);
- `CalculateCycle` biquad `:2888-2913`;
- `UpdateCycleEtaAndState` + `ComputeETA_PhaseNextExtremum` + phase
  history `:1330-1358`, `:2922-3033`, `:3038-3154`;
- `CollectCycleStates`/`GetCycleStateValue` `:1852-1866`.

IMPORTANT: this module must import NOTHING from wavespec_tpu — its value
as an oracle is total independence from the JAX implementation. Sequential
Python/NumPy float64 throughout; clarity over speed.
"""

from __future__ import annotations

import math

import numpy as np

S = 12  # display slots


def _apply_window(data: np.ndarray, window_type: str) -> np.ndarray:
    n = len(data)
    i = np.arange(n)
    if window_type == "none":
        return data
    if window_type == "hann":
        w = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / (n - 1)))
    elif window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * i / (n - 1))
    elif window_type == "blackman":
        w = (0.42 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))
             + 0.08 * np.cos(4.0 * np.pi * i / (n - 1)))
    elif window_type == "bartlett":
        w = 1.0 - np.abs((2.0 * i - n + 1) / (n - 1))
    else:
        raise ValueError(window_type)
    return data * w


def _calculate_cycle(i, price, buf, period, bandwidth):
    """`CalculateCycle` (`:2888-2913`)."""
    if period <= 0 or i < 2:
        buf[i] = 0.0
        return
    p_i, p_1, p_2 = price[i], price[i - 1], price[i - 2]
    c_1, c_2 = buf[i - 1], buf[i - 2]
    omega = 2.0 * math.pi / period
    bw = max(0.01, min(0.49, bandwidth))
    alpha = math.sin(omega) * math.sinh(
        math.log(2.0) / 2.0 * bw * omega / math.sin(omega)
    )
    a0 = 1.0 + alpha
    b0 = alpha / a0
    b2 = -alpha / a0
    a1 = -2.0 * math.cos(omega) / a0
    a2 = (1.0 - alpha) / a0
    buf[i] = b0 * p_i + b2 * p_2 - a1 * c_1 - a2 * c_2


def _count_bars_in_phase(bar_idx, color_buf):
    """`CountBarsInCurrentPhase` (`:3016-3033`)."""
    if bar_idx < 0:
        return 0
    cur = color_buf[bar_idx]
    count = 1
    for lb in range(bar_idx - 1, -1, -1):
        if color_buf[lb] == cur:
            count += 1
        else:
            break
    return count


def _unwrap_phase(phase):
    """`UnwrapPhase` (`1.0.2.mq5:996-1021`)."""
    n = len(phase)
    uw = np.empty(n)
    uw[0] = phase[0]
    for i in range(1, n):
        diff = phase[i] - phase[i - 1]
        corr = 0.0
        if diff > math.pi:
            corr = -2.0 * math.pi
        elif diff < -math.pi:
            corr = 2.0 * math.pi
        uw[i] = uw[i - 1] + diff + corr
    return uw


def _group_delay_index(uw):
    """`CalculateGroupDelay` (`1.0.2.mq5:1027-1059`): index-space gradient,
    deliberately NOT divided by domega; clamped +/-100."""
    n = len(uw)
    gd = np.empty(n)
    gd[0] = -(uw[1] - uw[0])
    for i in range(1, n - 1):
        gd[i] = -(uw[i + 1] - uw[i - 1]) / 2.0
    gd[n - 1] = -(uw[n - 1] - uw[n - 2])
    return np.clip(gd, -100.0, 100.0)


def _eta_realfft(uw, fft_index, period_bars, n, spb):
    """`ComputeETA_RealFFT` (`:1366-1406`): delta_omega uses the ARRAY
    length (N/2), and only the 1.5x-period clamp applies."""
    if period_bars <= 0.0 or n <= 0 or spb <= 0.0:
        return 0.0
    if fft_index < 0:
        return 0.0
    max_n = min(n, len(uw))
    if fft_index >= max_n:
        return 0.0
    delta_omega = 2.0 * math.pi / max_n
    if fft_index > 0 and fft_index < max_n - 1:
        dphi = (uw[fft_index + 1] - uw[fft_index - 1]) / 2.0
    elif fft_index == 0 and max_n >= 2:
        dphi = uw[1] - uw[0]
    elif fft_index == max_n - 1 and max_n >= 2:
        dphi = uw[max_n - 1] - uw[max_n - 2]
    else:
        dphi = 0.0
    tau_g = -(dphi / delta_omega)
    max_eta_bars = period_bars * 1.5
    tau_g = max(-max_eta_bars, min(max_eta_bars, tau_g))
    eta = abs(tau_g) * spb
    max_eta_seconds = period_bars * spb * 1.5
    return min(eta, max_eta_seconds)


def _eta_scientific(gd_idx, fft_index, phase_len_sec, progress, spb):
    """`CalculateScientificETASeconds` (`:1293-1323`)."""
    if phase_len_sec <= 0.0 or spb <= 0.0:
        return 0.0
    if fft_index < 0 or fft_index >= len(gd_idx):
        return 0.0
    progress = max(0.0, min(1.0, progress))
    eta_base = (1.0 - progress) * phase_len_sec
    gd_sec = gd_idx[fft_index] * spb
    max_adj = phase_len_sec * 0.25
    gd_sec = max(-max_adj, min(max_adj, gd_sec))
    eta = eta_base + gd_sec * 0.25
    if eta < 0.0:
        eta = 0.0
    upper = phase_len_sec * 1.5
    return min(eta, upper)


def _median_phase_duration(st, c, is_bullish):
    """`GetMedianPhaseDuration` (`:2947-2971`)."""
    hist = st.bull[c] if is_bullish else st.bear[c]
    vals = sorted(v for v in hist if v > 0)
    if not vals:
        return 0
    return vals[len(vals) // 2]


def _estimate_phase_duration(st, c, is_bullish, period, bars_completed):
    """`EstimatePhaseDuration` (`:2973-3011`)."""
    est = st.estimate[c][0 if is_bullish else 1]
    if est <= 0.0:
        m = _median_phase_duration(st, c, is_bullish)
        if m > 0:
            est = float(m)
    if est <= 0.0:
        m = _median_phase_duration(st, c, not is_bullish)
        if m > 0:
            est = float(m)
    if est <= 0.0 and period > 0.0:
        est = period
    if est <= 0.0:
        est = max(1.0, float(bars_completed))
    if period > 0.0 and est > period * 2.0:
        est = period * 2.0
    if est < float(bars_completed):
        est = float(bars_completed)
    if est < 1.0:
        est = 1.0
    return est


def _eta_phase_next_extremum(i, buf, period_bars, spb):
    """`ComputeETA_PhaseNextExtremum` (`:1330-1358`)."""
    if period_bars <= 0.0 or spb <= 0.0:
        return 0.0
    q = int(max(1.0, math.floor(period_bars / 4.0 + 0.5)))  # MathRound
    if i - q < 0:
        return 0.0
    ival = buf[i]
    qval = buf[i - q]
    phi = math.atan2(qval, ival)
    if phi < 0.0:
        phi += 2.0 * math.pi
    k = math.ceil(phi / math.pi)
    dphi = k * math.pi - phi
    period_seconds = period_bars * spb
    if period_seconds <= 0.0:
        return 0.0
    eta = (dphi / (2.0 * math.pi)) * period_seconds
    if eta < 0.0:
        eta = 0.0
    if eta > 1.5 * period_seconds:
        eta = 1.5 * period_seconds
    return eta


class _EtaState:
    def __init__(self):
        self.bull = [[0] * 5 for _ in range(S)]
        self.bear = [[0] * 5 for _ in range(S)]
        self.estimate = [[0.0, 0.0] for _ in range(S)]
        self.last_eta_seconds = [0.0] * S


def _store_phase_history(st: _EtaState, c, is_bullish, duration):
    """`StorePhaseHistory` (`:2922-2942`)."""
    if duration < 1:
        return
    hist = st.bull[c] if is_bullish else st.bear[c]
    for k in range(4, 0, -1):
        hist[k] = hist[k - 1]
    hist[0] = duration
    st.estimate[c][0 if is_bullish else 1] = float(duration)


def run_oracle(
    close,
    *,
    window=256,
    min_period=18.0,
    max_period=52.0,
    trend_period=1024,
    window_type="blackman",
    bandwidth=0.5,
    tolerance_pct=5.0,
    max_inactive=3,
    leak_period_ratio=0.30,
    leak_power_ratio=0.70,
    leak_min_bars=2,
    leak_max_bars=8,
    seconds_per_bar=60.0,
    eta_mode="phase",  # "phase" | "realfft" | "hybrid" (InpETAMode)
):
    """Per-bar outputs [n_bars, 12]: period, color, eta (display), eta_raw,
    states, active. Bars before the first full window stay zero."""
    close = np.asarray(close, np.float64)
    n_bars = len(close)
    w = window

    out = {
        k: np.zeros((n_bars, S))
        for k in ("period", "color", "eta", "eta_raw", "states")
    }
    out["active"] = np.zeros((n_bars, S), bool)

    cycle_buf = np.zeros((S, n_bars))
    color_buf = np.zeros((S, n_bars))

    trackers: list[dict] = []          # dynamic array, shift-removal
    slot_tracker_idx = [-1] * S
    dominant_periods = [0.0] * S
    dominant_indices = [0] * S
    cycle_active = [False] * S
    cyc_main = [-1] * S
    leak_active = [False] * S
    leak_idx = [-1] * S
    leak_bars = [0] * S
    eta_st = _EtaState()

    spb = seconds_per_bar

    for i in range(w - 1, n_bars):
        win = close[i - w + 1 : i + 1].copy()

        # --- trend high-pass (`:3422-3435`) ---
        om = 2.0 * math.pi / trend_period
        alpha = (1.0 - math.sin(om)) / math.cos(om)
        c = (1.0 - alpha) / 2.0
        trend = np.empty(w)
        trend[0] = c * (win[0] + win[0])
        for j2 in range(1, w):
            trend[j2] = c * (win[j2] + win[j2 - 1]) + alpha * trend[j2 - 1]
        det = win - trend

        det = _apply_window(det, window_type)

        spec_c = np.fft.rfft(det)
        spectrum = (spec_c.real**2 + spec_c.imag**2)[: w // 2]
        if eta_mode in ("realfft", "hybrid"):
            phase = np.arctan2(spec_c.imag, spec_c.real)[: w // 2]
            uw = _unwrap_phase(phase)
            gd_idx = _group_delay_index(uw)
        else:
            uw = gd_idx = None

        # --- all-bin candidate scan -> sequential tracker matching ---
        min_index = int(math.ceil(w / max_period))
        max_index = int(math.floor(w / min_period))
        for jj in range(min_index, min(max_index + 1, w // 2)):
            period = w / jj if jj > 0 else 0.0
            if period <= 0:
                continue
            power = spectrum[jj]
            best = -1
            smallest = 999999.0
            for ti, t in enumerate(trackers):
                if t["bars_inactive"] > 0:
                    continue
                if t["period"] <= 0:
                    continue
                diff = abs(t["period"] - period)
                avg = (t["period"] + period) / 2.0
                if (diff / avg) * 100.0 <= tolerance_pct and diff < smallest:
                    smallest = diff
                    best = ti
            if best >= 0:
                trackers[best].update(
                    period=period, fft_index=jj, power=power,
                    is_active=True, bars_inactive=0,
                )
            else:
                trackers.append(dict(
                    period=period, fft_index=jj, power=power,
                    is_active=True, bars_inactive=0,
                ))

        # --- DeactivateUnseenTrackers (backward, shift-removal) ---
        for ti in range(len(trackers) - 1, -1, -1):
            if not trackers[ti]["is_active"]:
                trackers[ti]["bars_inactive"] += 1
                if trackers[ti]["bars_inactive"] >= max_inactive:
                    del trackers[ti]
        for t in trackers:
            t["is_active"] = False

        # --- UpdateStableSlots (`:1581-1667`) ---
        cnt = len(trackers)
        for s in range(S):
            if not (0 <= slot_tracker_idx[s] < cnt):
                slot_tracker_idx[s] = -1
        # bubble sort by power desc is STABLE -> (-power, index) key
        order = sorted(range(cnt), key=lambda k: (-trackers[k]["power"], k))
        used = [False] * cnt
        for s in range(S):
            t = slot_tracker_idx[s]
            if 0 <= t < cnt:
                used[t] = True
                cycle_active[s] = True
                dominant_periods[s] = trackers[t]["period"]
                dominant_indices[s] = trackers[t]["fft_index"]
                cyc_main[s] = t
            else:
                cycle_active[s] = False
                cyc_main[s] = -1
        for s in range(S):
            if 0 <= slot_tracker_idx[s] < cnt:
                continue
            chosen = -1
            for k in order:
                if not used[k]:
                    chosen = k
                    break
            if chosen != -1:
                slot_tracker_idx[s] = chosen
                used[chosen] = True
                cycle_active[s] = True
                dominant_periods[s] = trackers[chosen]["period"]
                dominant_indices[s] = trackers[chosen]["fft_index"]
                cyc_main[s] = chosen
            else:
                slot_tracker_idx[s] = -1
                cycle_active[s] = False
                dominant_periods[s] = 0.0
                dominant_indices[s] = 0
                cyc_main[s] = -1

        # --- DetectLeakages (`:1704-1782`, raw-index continuation) ---
        for s in range(S):
            if not cycle_active[s]:
                continue
            main = cyc_main[s]
            if not (0 <= main < cnt):
                continue
            if leak_active[s]:
                leak_bars[s] += 1
                if leak_bars[s] > leak_max_bars:
                    leak_active[s] = False
                    leak_idx[s] = -1
                    leak_bars[s] = 0
            best = -1
            hp = 0.0
            for ti, t in enumerate(trackers):
                if t["bars_inactive"] > 0:
                    continue
                if ti == main:
                    continue
                if t["period"] >= trackers[main]["period"] * leak_period_ratio:
                    continue
                if t["power"] < trackers[main]["power"] * leak_power_ratio:
                    continue
                if t["bars_inactive"] > leak_min_bars:
                    continue
                if t["power"] > hp:
                    hp = t["power"]
                    best = ti
            if best >= 0:
                if not leak_active[s]:
                    leak_active[s] = True
                    leak_idx[s] = best
                    leak_bars[s] = 1
                elif leak_idx[s] == best:
                    pass
                else:
                    leak_idx[s] = best
                    leak_bars[s] = 1
            else:
                if leak_active[s]:
                    leak_active[s] = False
                    leak_idx[s] = -1
                    leak_bars[s] = 0

        # --- per-slot cycle + ETA (`:3577-3588`) ---
        for s in range(S):
            if cycle_active[s]:
                _calculate_cycle(i, close, cycle_buf[s],
                                 dominant_periods[s], bandwidth)
                _update_cycle_eta_and_state(
                    i, s, cycle_buf[s], color_buf[s], dominant_periods[s],
                    spb, eta_st, out, eta_mode=eta_mode, uw=uw,
                    gd_idx=gd_idx, fft_index=dominant_indices[s], window=w,
                )
                out["period"][i, s] = dominant_periods[s]
            else:
                cycle_buf[s][i] = 0.0
                color_buf[s][i] = 0.0
                out["eta"][i, s] = 0.0
                out["eta_raw"][i, s] = 0.0
                out["period"][i, s] = 0.0
                eta_st.last_eta_seconds[s] = 0.0
            out["active"][i, s] = cycle_active[s]
            out["color"][i, s] = color_buf[s][i]
            # GetCycleStateValue (`:1852-1859`)
            out["states"][i, s] = (
                0.0 if not cycle_active[s]
                else (1.0 if color_buf[s][i] > 0.5 else -1.0)
            )

    out["cycle"] = cycle_buf.T.copy()
    return out


def _update_cycle_eta_and_state(i, c, cyc, col, period_bars, spb,
                                st: _EtaState, out, *, eta_mode="phase",
                                uw=None, gd_idx=None, fft_index=0, window=0):
    """`UpdateCycleEtaAndState` (`:3038-3154`), all three ETA modes."""
    if spb <= 0.0:
        spb = 60.0
    if i < 1:
        start_bullish = cyc[i] >= 0.0
        col[i] = 1.0 if start_bullish else 0.0
        out["eta"][i, c] = 0.0
        out["eta_raw"][i, c] = 0.0
        st.last_eta_seconds[c] = 0.0
        return

    prev_color = col[i - 1]
    was_bullish = prev_color > 0.5
    is_bullish = cyc[i] >= cyc[i - 1]
    col[i] = 1.0 if is_bullish else 0.0

    if period_bars <= 0.0:
        out["eta"][i, c] = 0.0
        out["eta_raw"][i, c] = 0.0
        st.last_eta_seconds[c] = 0.0
        return

    bars_in_phase = _count_bars_in_phase(i, col)
    if eta_mode == "phase":
        eta_seconds = _eta_phase_next_extremum(i, cyc, period_bars, spb)
    elif eta_mode == "realfft":
        eta_seconds = _eta_realfft(uw, fft_index, period_bars, window, spb)
    else:  # hybrid blend (`:3080-3130`)
        is_b = col[i] > 0.5
        target_bars = _estimate_phase_duration(st, c, is_b, period_bars,
                                               bars_in_phase)
        if target_bars < 1.0:
            target_bars = 1.0
        if target_bars < float(bars_in_phase):
            target_bars = float(bars_in_phase)
        target_sec = target_bars * spb
        elapsed_sec = float(bars_in_phase) * spb
        progress = min(1.0, elapsed_sec / target_sec) if target_sec > 0 else 0.0
        eta_sci = 0.0
        if 0 < fft_index < len(gd_idx):
            eta_sci = _eta_scientific(gd_idx, fft_index, target_sec,
                                      progress, spb)
        est_dur = _median_phase_duration(st, c, is_b)
        eta_struct = max(0.0, target_sec - elapsed_sec)
        eta_hist = -1.0
        if est_dur > 0:
            eta_hist = max(0.0, float(est_dur) * spb - elapsed_sec)
        eta_seconds = 0.0
        wsum = 0.0
        if target_sec > 0.0:
            eta_seconds += eta_struct * 0.5
            wsum += 0.5
        if eta_hist >= 0.0:
            eta_seconds += eta_hist * 0.35
            wsum += 0.35
        if eta_sci > 0.0:
            eta_seconds += eta_sci * 0.15
            wsum += 0.15
        eta_seconds = eta_seconds / wsum if wsum > 0.0 else eta_struct
        if eta_seconds < 0.0:
            eta_seconds = 0.0
        max_ref = target_sec
        est_dur_sec = float(est_dur) * spb
        if est_dur > 0 and est_dur_sec > max_ref:
            max_ref = est_dur_sec
        period_sec = period_bars * spb
        if period_sec > max_ref:
            max_ref = period_sec
        if max_ref <= 0.0:
            max_ref = spb
        if eta_seconds > max_ref * 1.5:
            eta_seconds = max_ref * 1.5

    color_changed = col[i] != prev_color
    prev_eta_seconds = st.last_eta_seconds[c]
    if color_changed:
        prev_dur = _count_bars_in_phase(i - 1, col)
        _store_phase_history(st, c, was_bullish, prev_dur)
    elif prev_eta_seconds > 0.0:
        expected = max(0.0, prev_eta_seconds - spb)
        if eta_seconds > expected:
            eta_seconds = expected

    eta_bars = eta_seconds / spb if spb > 0.0 else 0.0
    eta_signed = eta_bars if col[i] > 0.5 else -eta_bars
    out["eta_raw"][i, c] = eta_signed
    eta_display = eta_signed
    if col[i] > 0.5 and 0.0 <= eta_display < 1.0:
        eta_display = 1.0
    out["eta"][i, c] = eta_display
    st.last_eta_seconds[c] = eta_seconds
