"""Single-launch Pallas kernel for the v757 per-frame tail.

After the tracker kernel landed, the v757 batch budget was left in the
remaining per-frame state machines — biquad cycle reconstruction, the
ETA/color machine, FollowFirst signals, and the Kalman 4D filter — four
separate `lax.scan`s whose per-step bodies are tiny elementwise ops
(chip-measured at B=64 x 512 frames: biquad +3.8 ms, eta +6.0 ms,
kalman +1.5 ms; docs/ROUND3.md). Same failure mode, same cure as
`tracker_pallas`: ONE Pallas program streams the frames through the
grid, keeps every machine's state in VMEM scratch, and advances
(slots x symbols) per step on the VPU lanes.

Semantics are op-for-op the XLA formulations in `filters.biquad`
(zero_first=0 + price_prev, the v757 alignment), `analyze.eta`
(prior_bars >= 0, all three modes), `signals.followfirst`, and
`filters.kalman4d` — parity is pinned by tests/test_v757_tail_pallas.py
against those functions (CPU keeps them; this kernel is device routing
inside `pipeline.v757._v757_tail`).

Layout: slots ride the sublane axis ([S, B] tiles), the symbol batch
rides the 128 lanes, frames stream as the minor grid axis with a batch
tile per major grid step. The quarter-period lag ring lives in VMEM as
[cap, S, B]; the per-(slot, lane) lag read is a masked reduction over
the cap axis (a cross-sublane gather does not exist on the VPU).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavespec_tpu.kernels.fused_dft import out_struct

LANES = 128


def _atan01_coeffs(n_terms: int = 9) -> tuple[float, ...]:
    """Least-squares even-polynomial fit of atan(x)/x on [0, 1]
    (atan(x) = x * sum_k c_k x^{2k}); max error ~1e-7 rad at 9 terms —
    Mosaic has no atan/atan2 lowering, and the phase-extremum ETA only
    needs the angle to ~1e-5 rad (1e-3 bars at period 50)."""
    x = np.linspace(0.0, 1.0, 8001)
    a = np.stack([(x * x) ** k for k in range(n_terms)], axis=1)
    w = np.arctan(x) / np.where(x == 0, 1.0, x)
    w[0] = 1.0
    c, *_ = np.linalg.lstsq(a, w, rcond=None)
    return tuple(float(v) for v in c)


_ATAN01 = _atan01_coeffs()


def _angle_mod_pi(q, i):
    """atan2(q, i) mod pi in [0, pi) — the line angle of (i, q).

    Octant reduction: t = min/max of |i|, |q| is in [0, 1]; the odd
    polynomial `_ATAN01` evaluates atan(t); reflect for |q| > |i| and
    for q/i < 0. Exactly-zero q (either sign of i) maps to 0, matching
    jnp.arctan2's phi in {0, pi} whose distance-to-next-multiple-of-pi
    is 0.
    """
    ax = jnp.abs(i)
    ay = jnp.abs(q)
    t = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    t2 = t * t
    acc = jnp.full_like(t, _ATAN01[-1])
    for c in _ATAN01[-2::-1]:
        acc = acc * t2 + c
    a = t * acc                                   # atan(t) in [0, pi/4]
    a = jnp.where(ay > ax, (np.pi / 2.0) - a, a)  # [0, pi/2]
    neg = (q >= 0) != (i >= 0)                    # tan < 0 half-turn
    m = jnp.where(neg, np.pi - a, a)
    return jnp.where(ay == 0.0, 0.0, m)


def _median5_masked(rows):
    """Median of the >0 entries of five [S, B] int rows (reference
    style: ascending sort of masked values, element at count//2; 0 when
    empty). Sorting network on 5 elements (9 comparators)."""
    imax = jnp.iinfo(jnp.int32).max
    valid = [r > 0 for r in rows]
    count = sum(v.astype(jnp.int32) for v in valid)
    v = [jnp.where(ok, r, imax) for r, ok in zip(rows, valid)]
    pairs = [(0, 1), (3, 4), (2, 4), (2, 3), (0, 3), (0, 2), (1, 4),
             (1, 3), (1, 2)]
    for a, b in pairs:
        lo = jnp.minimum(v[a], v[b])
        hi = jnp.maximum(v[a], v[b])
        v[a], v[b] = lo, hi
    idx = jnp.clip(count // 2, 0, 4)
    med = sum(jnp.where(idx == j, v[j], 0) for j in range(5))
    return jnp.where(count > 0, med, 0)


def _kernel(
    # inputs: t0 scalar (SMEM), then [1, ., B] per grid step
    t0_ref, price_ref, prev_ref, period_ref, valid_ref, gd_ref,
    # then (has_init) 19 initial-state blocks, outputs, scratch — in *rest
    *rest,
    s_slots: int, cap: int, bandwidth: float, spb: float,
    prior_bars: int, eta_mode: int, fft_window: int, ff, kal, t_total: int,
    has_init: bool, emit_state: bool,
):
    init_refs = rest[:19] if has_init else ()
    rest = rest[19:] if has_init else rest
    (cyc_ref, color_ref, eta_disp_ref, eta_raw_ref, states_ref, sig_ref,
     conf_ref, kal_ref) = rest[:8]
    rest = rest[8:]
    if emit_state:
        sf_ref, si_ref = rest[:2]
        rest = rest[2:]
    (y1_s, y2_s, xh_s, vprev_s, colorp_s, bars_s, lasteta_s, bull_s,
     bear_s, est_s, ring_s, stp_s, etp_s, lastdir_s, lastbar_s, posmode_s,
     kx_s, kp_s, kema_s) = rest

    # Absolute frame index: the ring slots, FollowFirst bar bookkeeping
    # and first-frame semantics all count from the BEGINNING OF TIME, so
    # a resumed chunk continues at t0 = carried tpos (0 fresh). Scalar —
    # the ring write needs a scalar dynamic-slice start.
    t = t0_ref[0] + pl.program_id(1)
    is_first = t == 0
    fzero = jnp.zeros((s_slots, LANES), jnp.float32)
    izero = jnp.zeros((s_slots, LANES), jnp.int32)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        if has_init:
            (i_y1, i_y2, i_xh, i_vprev, i_colorp, i_lasteta, i_est,
             i_ring, i_stp, i_etp, i_kx, i_kp, i_kema, i_bars, i_bull,
             i_bear, i_lastdir, i_lastbar, i_posmode) = init_refs
            y1_s[:] = i_y1[:]
            y2_s[:] = i_y2[:]
            xh_s[:] = i_xh[:]
            vprev_s[:] = i_vprev[:]
            colorp_s[:] = i_colorp[:]
            lasteta_s[:] = i_lasteta[:]
            est_s[:] = i_est[:].reshape(2, s_slots, LANES)
            ring_s[:] = i_ring[:].reshape(cap, s_slots, LANES)
            stp_s[:] = i_stp[:]
            etp_s[:] = i_etp[:]
            kx_s[:] = i_kx[:]
            kp_s[:] = i_kp[:].reshape(4, 4, LANES)
            kema_s[:] = i_kema[:]
            bars_s[:] = i_bars[:]
            bull_s[:] = i_bull[:].reshape(5, s_slots, LANES)
            bear_s[:] = i_bear[:].reshape(5, s_slots, LANES)
            lastdir_s[:] = i_lastdir[:]
            lastbar_s[:] = i_lastbar[:]
            posmode_s[:] = i_posmode[:]
        else:
            xh_s[:] = prev_ref[:]            # [2, B] = (x[-2], x[-1])
            y1_s[:] = fzero
            y2_s[:] = fzero
            vprev_s[:] = fzero
            colorp_s[:] = fzero
            bars_s[:] = izero + prior_bars
            lasteta_s[:] = fzero
            bull_s[:] = jnp.zeros((5, s_slots, LANES), jnp.int32)
            bear_s[:] = jnp.zeros((5, s_slots, LANES), jnp.int32)
            est_s[:] = jnp.zeros((2, s_slots, LANES), jnp.float32)
            ring_s[:] = jnp.zeros((cap, s_slots, LANES), jnp.float32)
            lastdir_s[:] = izero
            lastbar_s[:] = izero - 1
            pm_row = jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 0)
            posmode_s[:] = jnp.where(pm_row == 0, -1, 0)  # pos=-1, mode=0
            kema_s[:] = jnp.zeros((2, LANES), jnp.float32)

    x = price_ref[0]                     # [1, B]
    period = period_ref[0]               # [S, B]
    ok = valid_ref[0] != 0               # [S, B]
    gd = gd_ref[0]                       # [S, B]

    # ---------------- biquad (filters.biquad, zero_first=0) ----------
    bw = min(0.49, max(0.01, float(bandwidth)))
    pclamp = jnp.maximum(period, 2.01)
    omega = (2.0 * np.pi) / pclamp
    sin_w = jnp.sin(omega)
    sh = math.log(2.0) / 2.0 * bw
    z = sh * omega / sin_w
    alpha = sin_w * 0.5 * (jnp.exp(z) - jnp.exp(-z))   # sinh via exp
    a0 = 1.0 + alpha
    b0 = alpha / a0
    b2 = -alpha / a0
    a1 = -2.0 * jnp.cos(omega) / a0
    a2 = (1.0 - alpha) / a0

    live = ok & (period > 0)
    x2 = xh_s[0:1]
    u = jnp.where(live, b0 * x + b2 * x2, 0.0)
    y1 = y1_s[:]
    y2 = y2_s[:]
    y = jnp.where(live, u - a1 * y1 - a2 * y2, 0.0)
    y1_s[:] = y
    y2_s[:] = y1
    xh_s[:] = jnp.concatenate([xh_s[1:2], x], axis=0)
    cyc_ref[0] = y

    # ---------------- ETA machine (analyze.eta) ----------------------
    v = y
    v_prev_raw = vprev_s[:]
    v_prev = jnp.where(is_first, v, v_prev_raw)
    vprev_s[:] = v
    color_prev = colorp_s[:]
    bars_in_phase = bars_s[:]
    last_eta = lasteta_s[:]

    # logical blend, not a select on bool operands (Mosaic rejects the
    # i1-valued arith.select)
    is_bullish = (is_first & (v >= 0.0)) | (~is_first & (v >= v_prev))
    color = jnp.where(ok & is_bullish, 1.0, 0.0)
    if prior_bars > 0:
        color_changed = (color != color_prev) & ok
        bars_now = jnp.where(color != color_prev, 1, bars_in_phase + 1)
    else:
        color_changed = (~is_first) & (color != color_prev) & ok
        bars_now = jnp.where(
            is_first | (color != color_prev), 1, bars_in_phase + 1
        )

    # quarter-period lag from the ring (MathRound half-away-from-zero)
    q = jnp.clip(
        jnp.maximum(1.0, jnp.floor(period / 4.0 + 0.5)).astype(jnp.int32),
        1, cap - 1)
    lag_idx = jnp.remainder(t - q, cap)          # [S, B]
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, s_slots, LANES), 0)
    ring = ring_s[:]
    v_lag = jnp.sum(
        jnp.where(rows == lag_idx[None], ring, 0.0), axis=0)
    lag_ok = t >= q

    # estimator 0: phase next extremum. ceil(phi/pi)*pi - phi depends
    # only on phi mod pi (no Mosaic atan2 exists; see _angle_mod_pi).
    m_ang = _angle_mod_pi(v_lag, v)
    dphi = jnp.where(m_ang > 0.0, np.pi - m_ang, 0.0)
    period_sec = period * spb
    eta_phase = jnp.clip(dphi / (2.0 * np.pi) * period_sec,
                         0.0, 1.5 * period_sec)
    eta_phase = jnp.where(period > 0, eta_phase, 0.0)
    eta_phase = jnp.where(lag_ok, eta_phase, 0.0)

    # estimator 1: group delay
    max_bars = 1.5 * period
    tau = jnp.clip(gd, -max_bars, max_bars)
    eta_gd = jnp.abs(tau) * spb
    eta_gd = jnp.where(
        period > 0, jnp.minimum(eta_gd, max_bars * spb), 0.0)

    bull = [bull_s[j] for j in range(5)]
    bear = [bear_s[j] for j in range(5)]
    est_cache = est_s[:]

    if eta_mode == 2:  # HYBRID
        hist_same = [jnp.where(is_bullish, bl, br)
                     for bl, br in zip(bull, bear)]
        hist_opp = [jnp.where(is_bullish, br, bl)
                    for bl, br in zip(bull, bear)]
        est_cached = jnp.where(is_bullish, est_cache[0], est_cache[1])
        # _estimate_phase_duration fallback chain
        bars_f = bars_now.astype(jnp.float32)
        est = est_cached
        med = _median5_masked(hist_same).astype(jnp.float32)
        est = jnp.where(est <= 0.0, med, est)
        med_opp = _median5_masked(hist_opp).astype(jnp.float32)
        est = jnp.where(est <= 0.0, med_opp, est)
        est = jnp.where((est <= 0.0) & (period > 0), period, est)
        est = jnp.where(est <= 0.0, jnp.maximum(1.0, bars_f), est)
        est = jnp.where((period > 0) & (est > 2.0 * period),
                        2.0 * period, est)
        target_bars = jnp.maximum(jnp.maximum(est, bars_f), 1.0)
        target_sec = target_bars * spb
        elapsed_sec = bars_f * spb
        progress = jnp.where(
            target_sec > 0,
            jnp.minimum(1.0, elapsed_sec / target_sec), 0.0)
        # eta_scientific
        base = (1.0 - jnp.clip(progress, 0.0, 1.0)) * target_sec
        max_adj = target_sec * 0.25
        gd_sec = jnp.clip(gd * spb, -max_adj, max_adj)
        eta_sci = jnp.clip(base + 0.25 * gd_sec, 0.0, target_sec * 1.5)
        eta_sci = jnp.where(target_sec > 0, eta_sci, 0.0)
        med_same = _median5_masked(hist_same).astype(jnp.float32)
        eta_struct = jnp.maximum(0.0, target_sec - elapsed_sec)
        eta_hist = jnp.maximum(0.0, med_same * spb - elapsed_sec)
        w_struct = jnp.where(target_sec > 0, 0.5, 0.0)
        w_hist = jnp.where(med_same > 0, 0.35, 0.0)
        w_sci = jnp.where(eta_sci > 0, 0.15, 0.0)
        wsum = w_struct + w_hist + w_sci
        eta_hybrid = jnp.where(
            wsum > 0,
            (eta_struct * w_struct + eta_hist * w_hist + eta_sci * w_sci)
            / jnp.maximum(wsum, 1e-9),
            eta_struct)
        max_ref = jnp.maximum(jnp.maximum(target_sec, med_same * spb),
                              period * spb)
        max_ref = jnp.where(max_ref <= 0, spb, max_ref)
        eta_sec = jnp.clip(eta_hybrid, 0.0, 1.5 * max_ref)
    elif eta_mode == 1:
        eta_sec = eta_gd
    else:
        eta_sec = eta_phase
    eta_sec = jnp.where(period > 0, eta_sec, 0.0)

    # phase-history learning on color change (period > 0 gate)
    prev_dur = bars_in_phase
    was_bullish = color_prev > 0.5
    store_bull = color_changed & was_bullish & (period > 0)
    store_bear = color_changed & ~was_bullish & (period > 0)
    new_bull = [jnp.where(store_bull, prev_dur, bull[0])] + [
        jnp.where(store_bull, bull[j - 1], bull[j]) for j in range(1, 5)
    ]
    new_bear = [jnp.where(store_bear, prev_dur, bear[0])] + [
        jnp.where(store_bear, bear[j - 1], bear[j]) for j in range(1, 5)
    ]
    bull_s[:] = jnp.stack(new_bull, axis=0)
    bear_s[:] = jnp.stack(new_bear, axis=0)
    prev_f = prev_dur.astype(jnp.float32)
    est_s[:] = jnp.stack(
        [jnp.where(store_bull, prev_f, est_cache[0]),
         jnp.where(store_bear, prev_f, est_cache[1])], axis=0)

    # monotonic countdown within a phase
    expected = jnp.maximum(0.0, last_eta - spb)
    eta_sec = jnp.where(
        (~color_changed) & (~is_first) & (last_eta > 0.0),
        jnp.minimum(eta_sec, expected), eta_sec)
    eta_sec = jnp.where(period > 0, eta_sec, 0.0)
    if prior_bars == 0:
        eta_sec = jnp.where(is_first, 0.0, eta_sec)
    eta_sec = jnp.where(ok, eta_sec, 0.0)

    eta_bars = eta_sec / spb
    eta_signed = jnp.where(color > 0.5, eta_bars, -eta_bars)
    eta_display = jnp.where(
        (color > 0.5) & (eta_signed >= 0.0) & (eta_signed < 1.0),
        1.0, eta_signed)
    eta_display = jnp.where((period > 0) & ok, eta_display, 0.0)
    eta_raw = jnp.where((period > 0) & ok, eta_signed, 0.0)

    # write ring + carries
    widx = jnp.remainder(t, cap)
    ring_s[pl.ds(widx, 1)] = v[None]
    colorp_s[:] = color
    bars_s[:] = bars_now
    lasteta_s[:] = eta_sec

    color_ref[0] = color
    eta_disp_ref[0] = eta_display
    eta_raw_ref[0] = eta_raw

    # ---------------- states + FollowFirst (signals.followfirst) -----
    states = jnp.where(ok, jnp.where(color > 0.5, 1.0, -1.0), 0.0)
    states_ref[0] = states

    # previous frame's states / eta_raw (0 at t == 0) ride in the
    # stp/etp carries
    st_prev = jnp.where(is_first, 0.0, stp_s[:])
    eta_prev = jnp.where(is_first, 0.0, etp_s[:])
    stp_s[:] = states
    etp_s[:] = eta_raw

    if not ff.enable:
        sig_ref[0] = fzero
        conf_ref[0] = jnp.zeros((1, LANES), jnp.float32)
    else:
        slot_iota = jax.lax.broadcasted_iota(
            jnp.int32, (s_slots, LANES), 0)
        st = states
        eta = eta_raw
        last_dir = lastdir_s[:]
        last_bar = lastbar_s[:]
        position = posmode_s[0:1]
        mode = posmode_s[1:2]

        # exit management
        has_pos = position >= 0
        pos_onehot = slot_iota == jnp.clip(position, 0, s_slots - 1)
        pos_eta = jnp.where(
            has_pos,
            jnp.sum(jnp.where(pos_onehot, jnp.abs(eta), 0.0), axis=0,
                    keepdims=True),
            0.0)
        release = has_pos & (pos_eta <= ff.exit_bars_before_end)
        mode = jnp.where(release, 1 - mode, mode)
        position = jnp.where(release, -1, position)
        has_pos = position >= 0

        in_band = ok & (period >= ff.min_period) & (period <= ff.max_period)
        has_hist = st_prev != 0.0
        eligible = in_band & has_hist & (t >= 1)
        if not ff.allow_multiple_signals:
            eligible = eligible & ~has_pos

        states_equal = st == st_prev

        thr = float(ff.entry_bars_before_end)
        pre_sell = ((st > 0) & (eta_prev > 0) & (eta > 0)
                    & (eta_prev > thr) & (eta <= thr))
        pre_buy = ((st < 0) & (eta_prev < 0) & (eta < 0)
                   & (jnp.abs(eta_prev) > thr) & (jnp.abs(eta) <= thr))
        pre_dir = jnp.where(pre_buy, 1, jnp.where(pre_sell, -1, 0))
        pre_fire = (eligible & states_equal
                    & (ff.entry_bars_before_end > 0) & (pre_dir != 0))

        to_bull = (st_prev == -1.0) & (st == 1.0)
        to_bear = (st_prev == 1.0) & (st == -1.0)
        turn_dir = jnp.where(to_bull, 1, jnp.where(to_bear, -1, 0))
        suppressed = (ff.ignore_same_direction
                      & (last_dir == turn_dir)
                      & (t > last_bar)
                      & (turn_dir != 0))
        turn_fire = eligible & (~states_equal) & (turn_dir != 0) & ~suppressed

        fire = pre_fire | turn_fire
        direction = jnp.where(pre_fire, pre_dir, turn_dir)
        value = jnp.where(pre_fire, 60.0 * pre_dir.astype(jnp.float32),
                          100.0 * turn_dir.astype(jnp.float32))

        if not ff.allow_multiple_signals:
            first = jnp.min(
                jnp.where(fire, slot_iota, s_slots), axis=0, keepdims=True)
            fire = fire & (slot_iota == first)

        sig = jnp.where(fire, value, 0.0)
        record = fire & ((~pre_fire) | (not ff.allow_multiple_signals))
        lastdir_s[:] = jnp.where(record, direction, last_dir)
        lastbar_s[:] = jnp.where(record, t, last_bar)

        if not ff.allow_multiple_signals:
            any_fire = jnp.max(
                jnp.where(fire, 1, 0), axis=0, keepdims=True) > 0
            claim = jnp.min(
                jnp.where(fire, slot_iota, s_slots), axis=0, keepdims=True)
            position = jnp.where(any_fire, claim, position)
            mode = jnp.where(
                any_fire,
                jnp.where(
                    jnp.max(jnp.where(fire, direction, 0), axis=0,
                            keepdims=True) > 0, 0, 1),
                mode)
        posmode_s[:] = jnp.concatenate([position, mode], axis=0)

        n_active = jnp.sum(ok.astype(jnp.int32), axis=0, keepdims=True)
        buy_turns = jnp.sum((fire & (direction > 0)).astype(jnp.int32),
                            axis=0, keepdims=True)
        sell_turns = jnp.sum((fire & (direction < 0)).astype(jnp.int32),
                             axis=0, keepdims=True)
        denom = jnp.maximum(n_active, 1).astype(jnp.float32)
        buy_pct = 100.0 * buy_turns.astype(jnp.float32) / denom
        sell_pct = 100.0 * sell_turns.astype(jnp.float32) / denom
        conf = jnp.where(
            (n_active > 0) & (buy_pct >= ff.confluence_pct)
            & (buy_pct >= sell_pct),
            float(ff.confluence_lot_mult),
            jnp.where(
                (n_active > 0) & (sell_pct >= ff.confluence_pct)
                & (sell_pct > buy_pct),
                -float(ff.confluence_lot_mult), 0.0))
        sig_ref[0] = sig
        conf_ref[0] = conf

    def _emit_state():
        """Pack every machine's scratch into the two final-state outputs
        (written once, at the last grid step — the constant-index output
        blocks persist across steps). Row layout mirrors
        `_STATE_F32_ROWS`/`_STATE_I32_ROWS` in the host wrapper."""
        sf_ref[:] = jnp.concatenate([
            y1_s[:], y2_s[:], vprev_s[:], colorp_s[:], lasteta_s[:],
            stp_s[:], etp_s[:],
            est_s[:].reshape(2 * s_slots, LANES),
            ring_s[:].reshape(cap * s_slots, LANES),
            xh_s[:], kema_s[:], kx_s[:],
            kp_s[:].reshape(16, LANES),
        ], axis=0)
        si_ref[:] = jnp.concatenate([
            bars_s[:],
            bull_s[:].reshape(5 * s_slots, LANES),
            bear_s[:].reshape(5 * s_slots, LANES),
            lastdir_s[:], lastbar_s[:], posmode_s[:],
            jnp.full((1, LANES), t + 1, jnp.int32),
        ], axis=0)

    # ---------------- Kalman 4D (filters.kalman4d) -------------------
    if kal is None:
        kal_ref[0] = jnp.zeros((1, LANES), jnp.float32)
        if emit_state:
            @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
            def _():
                _emit_state()
        return

    f_mat = [[1.0, 1.0, 0.5, 1.0 / 6.0],
             [0.0, 1.0, 1.0, 0.5],
             [0.0, 0.0, 1.0, 1.0],
             [0.0, 0.0, 0.0, 1.0]]
    q_scale = max(0.05, kal.follow_strength)
    q_diag = [max(1e-9, kal.q_pos * q_scale),
              max(1e-9, kal.q_vel * q_scale),
              max(1e-9, kal.q_acc * q_scale),
              max(1e-9, kal.q_jerk * q_scale)]
    r_noise = max(1e-9, kal.r)
    z = x  # [1, B]

    @pl.when((pl.program_id(1) == 0) & jnp.bool_(not has_init))
    def _kinit():
        kx_s[:] = jnp.concatenate(
            [z, jnp.full((1, LANES), kal.init_vel, jnp.float32),
             jnp.full((1, LANES), kal.init_acc, jnp.float32),
             jnp.full((1, LANES), kal.init_jerk, jnp.float32)], axis=0)
        pd = [max(1e-9, kal.init_var_pos), max(1e-9, kal.init_var_vel),
              max(1e-9, kal.init_var_acc), max(1e-9, kal.init_var_jerk)]
        ii = jax.lax.broadcasted_iota(jnp.int32, (4, 4, LANES), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4, LANES), 1)
        p0 = jnp.zeros((4, 4, LANES), jnp.float32)
        for di, dv in enumerate(pd):
            p0 = jnp.where((ii == di) & (jj == di), jnp.float32(dv), p0)
        kp_s[:] = p0
        kema_s[:] = jnp.concatenate([z, jnp.zeros((1, LANES))], axis=0)

    xk = [kx_s[i : i + 1] for i in range(4)]
    pk = [[kp_s[i, j : j + 1] for j in range(4)] for i in range(4)]

    # xp = F x
    xp = [sum(f_mat[i][j] * xk[j] for j in range(4) if f_mat[i][j] != 0.0)
          for i in range(4)]
    # pp = F P F^T + diag(q)
    fp = [[sum(f_mat[i][k] * pk[k][j] for k in range(4)
               if f_mat[i][k] != 0.0) for j in range(4)] for i in range(4)]
    pp = [[sum(fp[i][k] * f_mat[j][k] for k in range(4)
               if f_mat[j][k] != 0.0) for j in range(4)] for i in range(4)]
    for i in range(4):
        pp[i][i] = pp[i][i] + q_diag[i]

    y_in = z - xp[0]
    s_var = pp[0][0] + r_noise
    if kal.adapt_gain > 0.0:
        sigma = jnp.sqrt(s_var)
        boost = jnp.minimum(5.0, jnp.abs(y_in) / sigma) * kal.adapt_gain
        for i in range(4):
            pp[i][i] = pp[i][i] + boost * q_diag[i]
        s_var = pp[0][0] + r_noise
    if kal.clip_std > 0.0:
        lim = kal.clip_std * jnp.sqrt(s_var)
        y_in = jnp.clip(y_in, -lim, lim)

    kgain = [pp[i][0] / s_var for i in range(4)]
    xn = [xp[i] + kgain[i] * y_in for i in range(4)]
    pn = [[pp[i][j] - kgain[i] * pp[0][j] for j in range(4)]
          for i in range(4)]
    for i in range(4):
        pn[i][i] = jnp.maximum(pn[i][i], 1e-12)

    kx_s[:] = jnp.concatenate(xn, axis=0)
    kp_s[:] = jnp.stack(
        [jnp.concatenate(pn[i], axis=0) for i in range(4)], axis=0)

    out = xn[0]
    if kal.ema_blend_period > 0.0:
        alpha_e = 2.0 / (kal.ema_blend_period + 1.0)
        ema = kema_s[0:1]
        ready = kema_s[1:2] > 0.5
        ema = jnp.where(ready, alpha_e * out + (1.0 - alpha_e) * ema, out)
        out = ema
        kema_s[:] = jnp.concatenate(
            [ema, jnp.ones((1, LANES), jnp.float32)], axis=0)
    kal_ref[0] = out
    if emit_state:
        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            _emit_state()


class V757TailState(NamedTuple):
    """Full tail-kernel state for chunked/online resume: every scratch
    array the kernel carries across frames, in natural shapes (leading
    dims = the symbol batch). `tpos` is the ABSOLUTE next frame index —
    the lag ring and FollowFirst bar bookkeeping count from the beginning
    of time, so a resumed chunk continues the same clock."""

    y1: jax.Array        # [..., S] biquad y[i-1]
    y2: jax.Array        # [..., S] biquad y[i-2]
    xh: jax.Array        # [..., 2] (x[-2], x[-1]) price history
    vprev: jax.Array     # [..., S] previous cycle value
    colorp: jax.Array    # [..., S] previous color
    lasteta: jax.Array   # [..., S] last eta seconds
    est: jax.Array       # [..., 2, S] phase-duration estimate cache
    ring: jax.Array      # [..., cap, S] quarter-period lag ring
    stp: jax.Array       # [..., S] previous states
    etp: jax.Array       # [..., S] previous raw ETA
    kx: jax.Array        # [..., 4] Kalman state
    kp: jax.Array        # [..., 4, 4] Kalman covariance
    kema: jax.Array      # [..., 2] Kalman (ema, ready)
    bars: jax.Array      # [..., S] i32 bars in phase
    bull: jax.Array      # [..., 5, S] i32 bull phase-duration history
    bear: jax.Array      # [..., 5, S] i32
    lastdir: jax.Array   # [..., S] i32 FollowFirst last signal dir
    lastbar: jax.Array   # [..., S] i32 FollowFirst last signal bar (abs)
    posmode: jax.Array   # [..., 2] i32 (position, mode)
    tpos: jax.Array      # [...] i32 absolute next frame


@partial(jax.jit, static_argnames=("cfg", "hop", "interpret", "return_state"))
def v757_tail_pallas(
    newest: jax.Array,       # [..., T] frame-aligned price
    price_prev: jax.Array,   # [..., 2] (x[-2], x[-1]) before frame 0
    periods: jax.Array,      # [..., T, S] slot period per frame
    valid: jax.Array,        # [..., T, S] bool slot active
    gd_slot: jax.Array,      # [..., T, S] group delay at the slot's bin
    cfg,                     # pipeline.v757.V757Config
    hop: int,
    interpret: bool = False,
    init: V757TailState | None = None,
    return_state: bool = False,
):
    """The whole v757 per-frame tail in one Pallas launch.

    Returns a dict of [..., T, S] arrays (cycle_values, color,
    eta_display, eta_raw, states, sig) and [..., T] (confluence,
    kalman; kalman omitted when cfg.enable_kalman is False). Leading
    dims are the symbol batch (flattened onto the VPU lanes).

    `init` resumes every in-kernel machine from a prior call's final
    state (returned as the second element with `return_state=True`):
    feeding chunk N's state into chunk N+1 reproduces the one-shot
    launch bitwise — the per-frame arithmetic is identical, only the
    scratch initialization (loaded from the 19 init blocks instead of
    zeros) and the absolute frame clock `t0` differ. The reference keeps
    all of this in persistent globals across `OnCalculate` ticks
    (`pla-kalman.mq5:966-986,1415-1530,2015-2125,2130-2288`).
    """
    lead = periods.shape[:-2]
    t_frames, s_slots = periods.shape[-2:]
    # Ring capacity: the quarter-period lag q = round(P/4) is bounded by
    # the candidate band (slot periods never exceed max_period), so the
    # ring only needs max_period/4 + margin rows — NOT the XLA path's
    # compat-driven max(64, ...) (its clip never binds below this bound
    # either, so the two paths read identical lags). The per-frame
    # masked ring reduction scales with cap: 64 -> 16 rows quarters it.
    cap = max(16, int(cfg.max_period / 4.0) + 3)
    prior_bars = (cfg.window - 1) // hop

    def to_lanes(a, dt, rows):
        x = a.astype(dt).reshape(-1, t_frames, rows) if rows else \
            a.astype(dt).reshape(-1, t_frames)[..., None]
        x = jnp.moveaxis(x, 0, -1)                   # [T, rows, B]
        b = x.shape[-1]
        b_pad = -(-b // LANES) * LANES
        if b_pad != b:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, b_pad - b)))
        return x

    pr = to_lanes(newest, jnp.float32, 0)            # [T, 1, B]
    pv = jnp.moveaxis(
        price_prev.astype(jnp.float32).reshape(-1, 2), 0, -1)  # [2, B]
    b = pv.shape[-1]
    b_pad = pr.shape[-1]
    if b_pad != b:
        pv = jnp.pad(pv, ((0, 0), (0, b_pad - b)))
    per = to_lanes(periods, jnp.float32, s_slots)
    va = to_lanes(valid, jnp.int32, s_slots)
    gd = to_lanes(gd_slot, jnp.float32, s_slots)

    grid = (b_pad // LANES, t_frames)
    in_s = pl.BlockSpec((1, s_slots, LANES), lambda i, t: (t, 0, i),
                        memory_space=pltpu.VMEM)
    in_1 = pl.BlockSpec((1, 1, LANES), lambda i, t: (t, 0, i),
                        memory_space=pltpu.VMEM)
    in_pv = pl.BlockSpec((2, LANES), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM)
    in_t0 = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_s = in_s
    out_1 = in_1

    # --- resumable state plumbing (init blocks in, packed state out) ---
    def srows(a, rows, dt):
        x = jnp.asarray(a, dt).reshape(-1, rows)
        x = jnp.swapaxes(x, 0, 1)                       # [rows, B]
        if b_pad != x.shape[-1]:
            x = jnp.pad(x, ((0, 0), (0, b_pad - x.shape[-1])))
        return x

    if init is None:
        t0 = jnp.zeros((1,), jnp.int32)
        init_arrays: list = []
    else:
        t0 = jnp.asarray(init.tpos, jnp.int32).reshape(-1)[:1]
        init_arrays = [
            srows(init.y1, s_slots, jnp.float32),
            srows(init.y2, s_slots, jnp.float32),
            srows(init.xh, 2, jnp.float32),
            srows(init.vprev, s_slots, jnp.float32),
            srows(init.colorp, s_slots, jnp.float32),
            srows(init.lasteta, s_slots, jnp.float32),
            srows(init.est, 2 * s_slots, jnp.float32),
            srows(init.ring, cap * s_slots, jnp.float32),
            srows(init.stp, s_slots, jnp.float32),
            srows(init.etp, s_slots, jnp.float32),
            srows(init.kx, 4, jnp.float32),
            srows(init.kp, 16, jnp.float32),
            srows(init.kema, 2, jnp.float32),
            srows(init.bars, s_slots, jnp.int32),
            srows(init.bull, 5 * s_slots, jnp.int32),
            srows(init.bear, 5 * s_slots, jnp.int32),
            srows(init.lastdir, s_slots, jnp.int32),
            srows(init.lastbar, s_slots, jnp.int32),
            srows(init.posmode, 2, jnp.int32),
        ]
    init_specs = [
        pl.BlockSpec((a.shape[0], LANES), lambda i, t: (0, i),
                     memory_space=pltpu.VMEM)
        for a in init_arrays
    ]
    rows_f = 9 * s_slots + cap * s_slots + 24
    rows_i = 13 * s_slots + 3

    kal = cfg.kalman if cfg.enable_kalman else None
    kernel = partial(
        _kernel, s_slots=s_slots, cap=cap,
        bandwidth=float(cfg.bandwidth),
        spb=float(cfg.seconds_per_bar), prior_bars=prior_bars,
        eta_mode=int(cfg.eta_mode), fft_window=int(cfg.window),
        ff=cfg.followfirst, kal=kal, t_total=t_frames,
        has_init=init is not None, emit_state=return_state,
    )
    so = lambda: out_struct((t_frames, s_slots, b_pad), jnp.float32, per)
    oo = lambda: out_struct((t_frames, 1, b_pad), jnp.float32, per)
    state_specs = []
    state_shapes = []
    if return_state:
        state_specs = [
            pl.BlockSpec((rows_f, LANES), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_i, LANES), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        state_shapes = [
            out_struct((rows_f, b_pad), jnp.float32, per),
            out_struct((rows_i, b_pad), jnp.int32, per),
        ]
    vmem = pltpu.VMEM
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_t0, in_1, in_pv, in_s, in_s, in_s] + init_specs,
        out_specs=[out_s] * 6 + [out_1, out_1] + state_specs,
        out_shape=[so(), so(), so(), so(), so(), so(), oo(), oo()]
        + state_shapes,
        scratch_shapes=[
            vmem((s_slots, LANES), jnp.float32),      # y1
            vmem((s_slots, LANES), jnp.float32),      # y2
            vmem((2, LANES), jnp.float32),            # x history
            vmem((s_slots, LANES), jnp.float32),      # v_prev
            vmem((s_slots, LANES), jnp.float32),      # color_prev
            vmem((s_slots, LANES), jnp.int32),        # bars_in_phase
            vmem((s_slots, LANES), jnp.float32),      # last_eta
            vmem((5, s_slots, LANES), jnp.int32),     # bull hist
            vmem((5, s_slots, LANES), jnp.int32),     # bear hist
            vmem((2, s_slots, LANES), jnp.float32),   # est cache
            vmem((cap, s_slots, LANES), jnp.float32), # lag ring
            vmem((s_slots, LANES), jnp.float32),      # states prev
            vmem((s_slots, LANES), jnp.float32),      # eta_raw prev
            vmem((s_slots, LANES), jnp.int32),        # ff last_dir
            vmem((s_slots, LANES), jnp.int32),        # ff last_bar
            vmem((2, LANES), jnp.int32),              # ff position/mode
            vmem((4, LANES), jnp.float32),            # kalman x
            vmem((4, 4, LANES), jnp.float32),         # kalman P
            vmem((2, LANES), jnp.float32),            # kalman ema/ready
        ],
        interpret=interpret,
    )(t0, pr, pv, per, va, gd, *init_arrays)

    def back(x, rows):
        y = jnp.moveaxis(x[..., :b], -1, 0)          # [B, T, rows]
        if rows == 1:
            return y.reshape(*lead, t_frames)
        return y.reshape(*lead, t_frames, rows)

    cyc, color, eta_disp, eta_raw, states, sig, conf, kalv = outs[:8]
    out = {
        "cycle_values": back(cyc, s_slots),
        "color": back(color, s_slots),
        "eta_display": back(eta_disp, s_slots),
        "eta_raw": back(eta_raw, s_slots),
        "states": back(states, s_slots),
        "sig": back(sig, s_slots),
        "confluence": back(conf, 1),
    }
    if cfg.enable_kalman:
        out["kalman"] = back(kalv, 1)
    if not return_state:
        return out

    sf, si = outs[8], outs[9]

    def unrows(x, r0, rows, shape, dt=None):
        y = jnp.moveaxis(x[r0 : r0 + rows, :b], -1, 0)
        y = y.reshape(*lead, *shape)
        return y if dt is None else y.astype(dt)

    s = s_slots
    state = V757TailState(
        y1=unrows(sf, 0, s, (s,)),
        y2=unrows(sf, s, s, (s,)),
        vprev=unrows(sf, 2 * s, s, (s,)),
        colorp=unrows(sf, 3 * s, s, (s,)),
        lasteta=unrows(sf, 4 * s, s, (s,)),
        stp=unrows(sf, 5 * s, s, (s,)),
        etp=unrows(sf, 6 * s, s, (s,)),
        est=unrows(sf, 7 * s, 2 * s, (2, s)),
        ring=unrows(sf, 9 * s, cap * s, (cap, s)),
        xh=unrows(sf, 9 * s + cap * s, 2, (2,)),
        kema=unrows(sf, 9 * s + cap * s + 2, 2, (2,)),
        kx=unrows(sf, 9 * s + cap * s + 4, 4, (4,)),
        kp=unrows(sf, 9 * s + cap * s + 8, 16, (4, 4)),
        bars=unrows(si, 0, s, (s,)),
        bull=unrows(si, s, 5 * s, (5, s)),
        bear=unrows(si, 6 * s, 5 * s, (5, s)),
        lastdir=unrows(si, 11 * s, s, (s,)),
        lastbar=unrows(si, 12 * s, s, (s,)),
        posmode=unrows(si, 13 * s, 2, (2,)),
        tpos=unrows(si, 13 * s + 2, 1, ()),
    )
    return out, state
