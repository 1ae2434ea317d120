"""ETA-to-next-extremum estimators and the per-cycle ETA/state machine.

Rebuild of the v7.57 ETA system (`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5`):
- `ComputeETA_PhaseNextExtremum` (`:1330-1358`): instantaneous phase from
  I/Q with a quarter-period delayed Q, distance to the next multiple of pi;
- `ComputeETA_RealFFT` (`:1366-1406`): group delay -dphi/domega at the
  dominant bin, clamped to 1.5x period;
- `CalculateScientificETASeconds` (`:1293-1323`): (1-progress) *
  phase_length + 0.25 * clamped group delay;
- asymmetric phase-duration learning (`StorePhaseHistory` /
  `GetMedianPhaseDuration` / `EstimatePhaseDuration` /
  `CountBarsInCurrentPhase` `:2922-3033`): rolling 5-deep bull/bear
  duration history with median estimator and fallback chain
  (cached -> median -> opposite median -> period -> bars), clamp 2x period;
- `UpdateCycleEtaAndState` (`:3038-3154`): hybrid blend 0.5 structural /
  0.35 history / 0.15 scientific, monotonic countdown constraint
  (eta may not exceed prev - 1 bar within a phase), bull/bear sign, and
  display floor of +1 for bullish.

TPU formulation: one `lax.scan` over bars per slot (vmapped over slots);
the quarter-period lag is served from a fixed-size ring buffer carried
through the scan.
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class EtaMode(enum.IntEnum):
    PHASE_NEXT_EXTREMUM = 0
    REALFFT = 1
    HYBRID = 2


@dataclasses.dataclass(frozen=True)
class EtaConfig:
    mode: EtaMode = EtaMode.PHASE_NEXT_EXTREMUM
    seconds_per_bar: float = 60.0
    lag_buffer: int = 64   # ring capacity for the quarter-period lag
    fft_window: int = 4096
    # Reference-exact startup: the reference's first analyzed bar sits at
    # chart index window-1 with `prior_bars` unwritten (color 0.0) bars
    # behind it — `CountBarsInCurrentPhase` counts into that region, the
    # first bar's color change vs the implicit 0.0 stores a phase-history
    # entry, and the first bar's ETA is COMPUTED (the `i < 1` early-out
    # never fires at real window sizes). 0 = standalone-machine semantics
    # (frame 0 is the beginning of time).
    prior_bars: int = 0


def eta_phase_next_extremum(value_now, value_lagged, period_bars, seconds_per_bar):
    """I/Q instantaneous-phase ETA (seconds). value_lagged ~ 90 deg shift."""
    phi = jnp.arctan2(value_lagged, value_now)
    phi = jnp.where(phi < 0, phi + 2.0 * jnp.pi, phi)
    target = jnp.ceil(phi / jnp.pi) * jnp.pi
    dphi = target - phi
    period_seconds = period_bars * seconds_per_bar
    eta = dphi / (2.0 * jnp.pi) * period_seconds
    eta = jnp.clip(eta, 0.0, 1.5 * period_seconds)
    return jnp.where(period_bars > 0, eta, 0.0)


def eta_realfft(group_delay_bars, period_bars, seconds_per_bar):
    """Group-delay ETA (seconds): |tau_g| clamped to 1.5x period."""
    max_bars = 1.5 * period_bars
    tau = jnp.clip(group_delay_bars, -max_bars, max_bars)
    eta = jnp.abs(tau) * seconds_per_bar
    return jnp.where(period_bars > 0, jnp.minimum(eta, max_bars * seconds_per_bar), 0.0)


def eta_scientific(group_delay_bars, phase_length_seconds, progress, seconds_per_bar):
    """(1 - progress) * phase_length + 0.25 * clamped group delay."""
    progress = jnp.clip(progress, 0.0, 1.0)
    base = (1.0 - progress) * phase_length_seconds
    gd_sec = group_delay_bars * seconds_per_bar
    max_adj = phase_length_seconds * 0.25
    gd_sec = jnp.clip(gd_sec, -max_adj, max_adj)
    eta = base + 0.25 * gd_sec
    eta = jnp.clip(eta, 0.0, phase_length_seconds * 1.5)
    return jnp.where(phase_length_seconds > 0, eta, 0.0)


def leak_eta_bars(
    leak_active, leak_period, leak_bars, leak_group_delay, main_eta_display,
    seconds_per_bar: float = 60.0,
):
    """Leak-intrusion ETA (`PopulateLeakBuffers`, `...pla-kalman.mq5:2290-2357`).

    Scientific ETA with phase target max(1, leak_period, leak_bars_active),
    progress = elapsed/target, falling back to the structural remainder;
    signed to follow the main cycle's ETA direction. All inputs are
    elementwise arrays (no state: the leak counters come from the tracker).
    """
    target_bars = jnp.maximum(jnp.maximum(1.0, leak_period),
                              leak_bars.astype(jnp.float32))
    target_sec = target_bars * seconds_per_bar
    elapsed_sec = leak_bars.astype(jnp.float32) * seconds_per_bar
    progress = jnp.where(target_sec > 0, jnp.minimum(1.0, elapsed_sec / target_sec), 0.0)
    eta_sec = eta_scientific(leak_group_delay, target_sec, progress, seconds_per_bar)
    eta_sec = jnp.where(eta_sec <= 0.0,
                        jnp.maximum(0.0, target_sec - elapsed_sec), eta_sec)
    bars = eta_sec / seconds_per_bar
    signed = jnp.where(main_eta_display < 0, -jnp.abs(bars), jnp.abs(bars))
    return jnp.where(leak_active, signed, 0.0)


def _masked_median_int(hist):
    """Median of the non-zero entries of a 5-vector, reference style:
    sorted ascending, element at index count//2; 0 when empty."""
    valid = hist > 0
    count = jnp.sum(valid.astype(jnp.int32))
    sort = jnp.sort(jnp.where(valid, hist, jnp.iinfo(jnp.int32).max))
    idx = jnp.clip(count // 2, 0, hist.shape[0] - 1)
    med = sort[idx]
    return jnp.where(count > 0, med, 0)


def _estimate_phase_duration(estimate_cached, hist_same, hist_opp, period, bars_completed):
    """`EstimatePhaseDuration` fallback chain + clamps."""
    est = estimate_cached
    med = _masked_median_int(hist_same).astype(jnp.float32)
    est = jnp.where(est <= 0.0, med, est)
    med_opp = _masked_median_int(hist_opp).astype(jnp.float32)
    est = jnp.where(est <= 0.0, med_opp, est)
    est = jnp.where((est <= 0.0) & (period > 0), period, est)
    est = jnp.where(est <= 0.0, jnp.maximum(1.0, bars_completed), est)
    est = jnp.where((period > 0) & (est > 2.0 * period), 2.0 * period, est)
    est = jnp.maximum(est, bars_completed)
    return jnp.maximum(est, 1.0)


class EtaMachineState(NamedTuple):
    """Carry of `eta_state_machine` for chunked/online resume: the
    reference keeps all of these in persistent per-slot globals across
    `OnCalculate` ticks (`...pla-kalman.mq5:2922-3154` state arrays).
    Leading dims mirror the machine's (batch x slot) vmap dims."""

    color_prev: jax.Array      # [...] f32 (1 bull / 0 bear)
    bars_in_phase: jax.Array   # [...] i32
    last_eta: jax.Array        # [...] f32 seconds
    bull_hist: jax.Array       # [..., 5] i32 phase durations
    bear_hist: jax.Array       # [..., 5] i32
    est_cache: jax.Array       # [..., 2] f32 (bull, bear)
    ring: jax.Array            # [..., lag_buffer] f32 lag ring
    tpos: jax.Array            # [...] i32 absolute frame counter
    v_prev: jax.Array          # [...] f32 previous frame's cycle value


def eta_machine_init(cfg: EtaConfig) -> EtaMachineState:
    """Fresh-start state (what a `init=None` run begins from)."""
    return EtaMachineState(
        color_prev=jnp.asarray(0.0, jnp.float32),
        bars_in_phase=jnp.asarray(cfg.prior_bars, jnp.int32),
        last_eta=jnp.asarray(0.0, jnp.float32),
        bull_hist=jnp.zeros(5, jnp.int32),
        bear_hist=jnp.zeros(5, jnp.int32),
        est_cache=jnp.zeros(2, jnp.float32),
        ring=jnp.zeros(cfg.lag_buffer, jnp.float32),
        tpos=jnp.asarray(0, jnp.int32),
        v_prev=jnp.asarray(0.0, jnp.float32),
    )


@partial(jax.jit, static_argnames=("cfg", "return_state"))
def eta_state_machine(
    cycle_values: jax.Array,   # [..., t] per-slot cycle waveform (biquad)
    periods: jax.Array,        # [..., t] slot period per bar (bars)
    group_delay: jax.Array,    # [..., t] group delay at the slot's bin (bars)
    cfg: EtaConfig = EtaConfig(),
    valid: jax.Array | None = None,  # [..., t] slot active per bar
    init: EtaMachineState | None = None,
    return_state: bool = False,
):
    """Run `UpdateCycleEtaAndState` over bars.

    `valid` marks bars where the slot is active; on inactive bars the
    reference never calls `UpdateCycleEtaAndState` — the else branch
    writes color 0, eta 0 and resets the countdown memory
    (`...pla-kalman.mq5:3578-3588` `g_last_eta_seconds[c] = 0`), and no
    phase history is stored. `None` = all bars active.

    `init` resumes from a prior call's `EtaMachineState` (returned when
    `return_state=True` as a second element): feeding chunk N's state
    into chunk N+1 reproduces the one-shot scan bitwise — frame 0 of a
    resumed chunk is NOT "first" (its v_prev/color_prev come from the
    state) and the lag ring keeps its absolute positions via `tpos`.

    Returns dict of [..., t]: color (1 bull / 0 bear), eta_display (signed
    bars, bullish floored at +1), eta_raw (signed bars), eta_seconds.
    """
    spb = cfg.seconds_per_bar
    lag_cap = cfg.lag_buffer
    resumed = init is not None

    def single(vals, pers, gds, vld, st):
        t_len = vals.shape[0]

        def step(carry, xs):
            (color_prev, bars_in_phase, last_eta, bull_hist, bear_hist,
             est_cache, ring, tpos) = carry
            v, v_prev, period, gd, is_first, ok = xs

            start_bullish = v >= 0.0
            is_bullish = jnp.where(is_first, start_bullish, v >= v_prev)
            color = jnp.where(ok & is_bullish, 1.0, 0.0)
            if cfg.prior_bars > 0:
                # exact mode: frame 0 compares against the implicit 0.0
                # color of the unwritten pre-window region
                color_changed = (color != color_prev) & ok
                bars_now = jnp.where(
                    color != color_prev, 1, bars_in_phase + 1
                )
            else:
                color_changed = (~is_first) & (color != color_prev) & ok
                # CountBarsInCurrentPhase: incremental (current bar
                # inclusive), over the WRITTEN color stream (inactive
                # bars write 0).
                bars_now = jnp.where(
                    is_first | (color != color_prev), 1, bars_in_phase + 1
                )

            # quarter-period lag from the ring buffer. MathRound is
            # half-AWAY-FROM-ZERO (floor(x+0.5) for x>0), not banker's
            # rounding (`:1334` q = MathMax(1, MathRound(period/4))).
            q = jnp.clip(
                jnp.maximum(1.0, jnp.floor(period / 4.0 + 0.5)).astype(jnp.int32),
                1, lag_cap - 1)
            lag_idx = jnp.mod(tpos - q, lag_cap)
            v_lag = ring[lag_idx]
            lag_ok = tpos >= q

            # --- estimators ---
            eta_phase = jnp.where(
                lag_ok, eta_phase_next_extremum(v, v_lag, period, spb), 0.0
            )
            eta_gd = eta_realfft(gd, period, spb)

            hist_same = jnp.where(is_bullish, bull_hist, bear_hist)
            hist_opp = jnp.where(is_bullish, bear_hist, bull_hist)
            est_cached = jnp.where(is_bullish, est_cache[0], est_cache[1])
            target_bars = _estimate_phase_duration(
                est_cached, hist_same, hist_opp, period, bars_now.astype(jnp.float32)
            )
            target_sec = target_bars * spb
            elapsed_sec = bars_now.astype(jnp.float32) * spb
            progress = jnp.where(target_sec > 0, jnp.minimum(1.0, elapsed_sec / target_sec), 0.0)
            eta_sci = eta_scientific(gd, target_sec, progress, spb)
            med_same = _masked_median_int(hist_same).astype(jnp.float32)
            eta_struct = jnp.maximum(0.0, target_sec - elapsed_sec)
            eta_hist = jnp.maximum(0.0, med_same * spb - elapsed_sec)

            # hybrid blend 0.5 / 0.35 / 0.15 with availability weights
            w_struct = jnp.where(target_sec > 0, 0.5, 0.0)
            w_hist = jnp.where(med_same > 0, 0.35, 0.0)
            w_sci = jnp.where(eta_sci > 0, 0.15, 0.0)
            wsum = w_struct + w_hist + w_sci
            eta_hybrid = jnp.where(
                wsum > 0,
                (eta_struct * w_struct + eta_hist * w_hist + eta_sci * w_sci) / jnp.maximum(wsum, 1e-9),
                eta_struct,
            )
            max_ref = jnp.maximum(jnp.maximum(target_sec, med_same * spb), period * spb)
            max_ref = jnp.where(max_ref <= 0, spb, max_ref)
            eta_hybrid = jnp.clip(eta_hybrid, 0.0, 1.5 * max_ref)

            if cfg.mode == EtaMode.PHASE_NEXT_EXTREMUM:
                eta_sec = eta_phase
            elif cfg.mode == EtaMode.REALFFT:
                eta_sec = eta_gd
            else:
                eta_sec = eta_hybrid
            eta_sec = jnp.where(period > 0, eta_sec, 0.0)

            # --- phase-history learning on color change ---
            # The reference early-returns BEFORE StorePhaseHistory when
            # this bar's period <= 0 (`...pla-kalman.mq5:3066-3073` vs
            # the store at `:3132`): color is still written, but no
            # history entry or estimate-cache update happens on such bars.
            prev_dur = bars_in_phase  # duration of the phase that just ended
            was_bullish = color_prev > 0.5
            store_bull = color_changed & was_bullish & (period > 0)
            store_bear = color_changed & ~was_bullish & (period > 0)
            bull_hist = jnp.where(
                store_bull, jnp.concatenate([prev_dur[None], bull_hist[:-1]]), bull_hist
            )
            bear_hist = jnp.where(
                store_bear, jnp.concatenate([prev_dur[None], bear_hist[:-1]]), bear_hist
            )
            est_cache = jnp.where(
                store_bull,
                est_cache.at[0].set(prev_dur.astype(jnp.float32)),
                jnp.where(
                    store_bear,
                    est_cache.at[1].set(prev_dur.astype(jnp.float32)),
                    est_cache,
                ),
            )

            # monotonic countdown within a phase
            expected = jnp.maximum(0.0, last_eta - spb)
            eta_sec = jnp.where(
                (~color_changed) & (~is_first) & (last_eta > 0.0),
                jnp.minimum(eta_sec, expected),
                eta_sec,
            )
            eta_sec = jnp.where(period > 0, eta_sec, 0.0)
            if cfg.prior_bars == 0:
                # standalone semantics: frame 0 is bar 0 (`:3049-3056`);
                # in exact mode the first analyzed bar computes normally.
                eta_sec = jnp.where(is_first, 0.0, eta_sec)
            eta_sec = jnp.where(ok, eta_sec, 0.0)  # inactive slot -> 0

            eta_bars = eta_sec / spb
            eta_signed = jnp.where(color > 0.5, eta_bars, -eta_bars)
            eta_display = jnp.where(
                (color > 0.5) & (eta_signed >= 0.0) & (eta_signed < 1.0),
                1.0,
                eta_signed,
            )
            eta_display = jnp.where((period > 0) & ok, eta_display, 0.0)
            eta_raw = jnp.where((period > 0) & ok, eta_signed, 0.0)

            ring = ring.at[jnp.mod(tpos, lag_cap)].set(v)
            carry = (color, bars_now, eta_sec, bull_hist, bear_hist,
                     est_cache, ring, tpos + 1)
            return carry, (color, eta_display, eta_raw, eta_sec)

        if resumed:
            v_prev = jnp.concatenate([st.v_prev[None], vals[:-1]])
            is_first = jnp.zeros(t_len, bool)
        else:
            v_prev = jnp.concatenate([vals[:1], vals[:-1]])
            is_first = jnp.arange(t_len) == 0
        carry0 = (st.color_prev, st.bars_in_phase, st.last_eta,
                  st.bull_hist, st.bear_hist, st.est_cache, st.ring,
                  st.tpos)
        carry, (color, eta_display, eta_raw, eta_sec) = jax.lax.scan(
            step, carry0, (vals, v_prev, pers, gds, is_first, vld)
        )
        final = EtaMachineState(*carry, v_prev=vals[-1])
        return color, eta_display, eta_raw, eta_sec, final

    if valid is None:
        valid = jnp.ones(cycle_values.shape, bool)
    fn = single
    for _ in range(cycle_values.ndim - 1):
        fn = jax.vmap(fn)
    if init is None:
        st0 = eta_machine_init(cfg)
        lead = cycle_values.shape[:-1]
        init = EtaMachineState(*(
            jnp.broadcast_to(v, (*lead, *v.shape)) for v in st0
        ))
    else:
        ref = eta_machine_init(cfg)
        init = EtaMachineState(*(
            jnp.asarray(v, getattr(ref, f).dtype)
            for f, v in zip(EtaMachineState._fields, init)
        ))
    from wavespec_tpu.utils.vma import pvary_like

    # shard_map(check_vma=True): promote the replicated init carry to the
    # data's varying axes (utils.vma; no-op outside shard_map).
    init = pvary_like(init, cycle_values)
    color, eta_display, eta_raw, eta_sec, final = fn(
        cycle_values.astype(jnp.float32),
        periods.astype(jnp.float32),
        group_delay.astype(jnp.float32),
        jnp.broadcast_to(jnp.asarray(valid, bool), cycle_values.shape),
        init,
    )
    out = {
        "color": color,
        "eta_display": eta_display,
        "eta_raw": eta_raw,
        "eta_seconds": eta_sec,
    }
    if return_state:
        return out, final
    return out
