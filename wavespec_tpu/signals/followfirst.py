"""FollowFirst signal engine: peak/valley alternation over cycle states.

Rebuild of `ProcessFollowFirst` / `ProcessFollowFirstSignal`
(`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:2130-2288`, inputs `:1077-1088`):

- per bar, each active slot whose period lies in [min_period, max_period]
  emits +/-100 on a state flip (-1 -> +1 buy, +1 -> -1 sell) into its SIG
  buffer, with optional same-direction suppression;
- with entry_bars_before_end > 0, a +/-60 *pre-signal* fires when the
  |raw ETA| crosses down through that threshold inside an unchanged phase
  (buffer conventions +/-100 entry, +/-60 pre-signal, comment `:934`);
- "follow the FIRST": when multiple signals are disallowed, the first
  signaling slot (lowest index) claims the position; the position is
  released when |eta| <= exit_bars_before_end, flipping the waiting mode;
- confluence: when >= confluence_pct % of active cycles turn the same way
  on one bar, SigConfluence carries +/-lot_mult (`:2266-2277`).

TPU formulation: `lax.scan` over bars; the 12-slot loop is vectorized with
a first-eligible argmin standing in for the reference's `break`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FollowFirstConfig:
    enable: bool = True
    min_period: float = 15.0
    max_period: float = 100.0
    exit_bars_before_end: int = 3
    entry_bars_before_end: int = 0
    allow_multiple_signals: bool = True
    ignore_same_direction: bool = True
    confluence_pct: float = 80.0
    confluence_lot_mult: int = 3
    n_slots: int = 12


class FollowFirstState(NamedTuple):
    """Carry of `followfirst_signals` for chunked/online resume — the
    reference's signal engine keeps these in globals across ticks
    (`...pla-kalman.mq5:2130-2288` `g_last_signal_*`, position/mode)."""

    last_dir: jax.Array    # [s] i32 last signal direction per slot
    last_bar: jax.Array    # [s] i32 ABSOLUTE frame of that signal (-1 none)
    position: jax.Array    # scalar i32 claiming slot (-1 none)
    mode: jax.Array        # scalar i32 0 waiting peak / 1 valley
    st_prev: jax.Array     # [s] f32 previous frame's states
    eta_prev: jax.Array    # [s] f32 previous frame's raw ETA
    next_bar: jax.Array    # scalar i32 absolute index of the next frame


def followfirst_init(cfg: FollowFirstConfig) -> FollowFirstState:
    s = cfg.n_slots
    return FollowFirstState(
        last_dir=jnp.zeros(s, jnp.int32),
        last_bar=jnp.full(s, -1, jnp.int32),
        position=jnp.asarray(-1, jnp.int32),
        mode=jnp.asarray(0, jnp.int32),
        st_prev=jnp.zeros(s, jnp.float32),
        eta_prev=jnp.zeros(s, jnp.float32),
        next_bar=jnp.asarray(0, jnp.int32),
    )


@partial(jax.jit, static_argnames=("cfg", "return_state"))
def followfirst_signals(
    states: jax.Array,    # [t, s] cycle state: +1 bull / -1 bear / 0 inactive
    eta_raw: jax.Array,   # [t, s] signed raw ETA (bars)
    periods: jax.Array,   # [t, s] period (bars)
    active: jax.Array,    # [t, s] bool slot active
    cfg: FollowFirstConfig = FollowFirstConfig(),
    init: FollowFirstState | None = None,
    return_state: bool = False,
):
    """Returns dict: sig [t, s] (+/-100 turn, +/-60 pre-signal, 0),
    confluence [t] (+/-lot_mult or 0), position_cycle [t] (claiming slot,
    -1 none). `init` resumes from a prior call's `FollowFirstState`
    (second return element with `return_state=True`): chunked == one-shot
    bitwise — bar indices are absolute (continued via `next_bar`), so the
    `bar >= 1` eligibility and same-direction suppression see the full
    history."""
    t_len, s = states.shape
    if init is None:
        init = followfirst_init(cfg)
    else:
        ref = followfirst_init(cfg)
        init = FollowFirstState(*(
            jnp.asarray(v, getattr(ref, f).dtype)
            for f, v in zip(FollowFirstState._fields, init)
        ))
    if not cfg.enable:
        z = jnp.zeros((t_len, s), jnp.float32)
        out = {
            "sig": z,
            "confluence": jnp.zeros(t_len, jnp.float32),
            "position_cycle": jnp.full(t_len, -1, jnp.int32),
        }
        if return_state:
            final = init._replace(
                st_prev=states[-1].astype(jnp.float32),
                eta_prev=eta_raw[-1].astype(jnp.float32),
                next_bar=init.next_bar + t_len,
            )
            return out, final
        return out

    slot_ids = jnp.arange(s)

    def step(carry, xs):
        last_dir, last_bar, position, mode = carry
        st, st_prev, eta, eta_prev, per, act, bar = xs

        # --- exit management (ProcessFollowFirst) ---
        has_pos = position >= 0
        pos_eta = jnp.where(has_pos, jnp.abs(eta[jnp.clip(position, 0, s - 1)]), 0.0)
        release = has_pos & (pos_eta <= cfg.exit_bars_before_end)
        mode = jnp.where(release, 1 - mode, mode)
        position = jnp.where(release, -1, position)
        has_pos = position >= 0

        in_band = act & (per >= cfg.min_period) & (per <= cfg.max_period)
        has_hist = st_prev != 0.0
        eligible = in_band & has_hist & (bar >= 1)
        if not cfg.allow_multiple_signals:
            eligible = eligible & ~has_pos

        states_equal = st == st_prev

        # --- pre-signal (entry_bars_before_end > 0) ---
        thr = float(cfg.entry_bars_before_end)
        pre_sell = (
            (st > 0) & (eta_prev > 0) & (eta > 0)
            & (eta_prev > thr) & (eta <= thr)
        )
        pre_buy = (
            (st < 0) & (eta_prev < 0) & (eta < 0)
            & (jnp.abs(eta_prev) > thr) & (jnp.abs(eta) <= thr)
        )
        pre_dir = jnp.where(pre_buy, 1, jnp.where(pre_sell, -1, 0))
        pre_fire = (
            eligible & states_equal & (cfg.entry_bars_before_end > 0) & (pre_dir != 0)
        )

        # --- turn signals ---
        to_bull = (st_prev == -1.0) & (st == 1.0)
        to_bear = (st_prev == 1.0) & (st == -1.0)
        turn_dir = jnp.where(to_bull, 1, jnp.where(to_bear, -1, 0))
        suppressed = (
            cfg.ignore_same_direction
            & (last_dir == turn_dir)
            & (bar > last_bar)
            & (turn_dir != 0)
        )
        turn_fire = eligible & (~states_equal) & (turn_dir != 0) & ~suppressed

        fire = pre_fire | turn_fire
        direction = jnp.where(pre_fire, pre_dir, turn_dir)
        value = jnp.where(pre_fire, 60.0 * pre_dir, 100.0 * turn_dir)

        if not cfg.allow_multiple_signals:
            # follow the FIRST: only the lowest firing slot signals
            first = jnp.argmin(jnp.where(fire, slot_ids, s))
            only_first = slot_ids == first
            fire = fire & only_first

        sig = jnp.where(fire, value, 0.0)
        # suppression bookkeeping: the reference records last dir/bar for
        # turn signals always, and for pre-signals only in single-mode.
        record = fire & (
            (~pre_fire) | (not cfg.allow_multiple_signals)
        )
        last_dir = jnp.where(record, direction, last_dir)
        last_bar = jnp.where(record, bar, last_bar)

        if not cfg.allow_multiple_signals:
            any_fire = fire.any()
            claim = jnp.argmin(jnp.where(fire, slot_ids, s))
            position = jnp.where(any_fire, claim, position)
            mode = jnp.where(
                any_fire,
                jnp.where(jnp.max(jnp.where(fire, direction, 0)) > 0, 0, 1),
                mode,
            )

        # --- confluence ---
        n_active = jnp.sum(act.astype(jnp.int32))
        buy_turns = jnp.sum((fire & (direction > 0)).astype(jnp.int32))
        sell_turns = jnp.sum((fire & (direction < 0)).astype(jnp.int32))
        buy_pct = 100.0 * buy_turns / jnp.maximum(n_active, 1)
        sell_pct = 100.0 * sell_turns / jnp.maximum(n_active, 1)
        conf = jnp.where(
            (n_active > 0) & (buy_pct >= cfg.confluence_pct) & (buy_pct >= sell_pct),
            float(cfg.confluence_lot_mult),
            jnp.where(
                (n_active > 0) & (sell_pct >= cfg.confluence_pct) & (sell_pct > buy_pct),
                -float(cfg.confluence_lot_mult),
                0.0,
            ),
        )

        return (last_dir, last_bar, position, mode), (sig, conf, position)

    from wavespec_tpu.utils.vma import pvary_like

    # shard_map(check_vma=True): promote the replicated init carry to the
    # data's varying axes (utils.vma; no-op outside shard_map).
    init = pvary_like(init, states)
    st_prev = jnp.concatenate([init.st_prev[None], states[:-1]], axis=0)
    eta_prev = jnp.concatenate([init.eta_prev[None], eta_raw[:-1]], axis=0)
    carry0 = (init.last_dir, init.last_bar, init.position, init.mode)
    bars = jnp.arange(t_len, dtype=jnp.int32) + init.next_bar
    (last_dir, last_bar, position, mode), (sig, conf, pos) = jax.lax.scan(
        step,
        carry0,
        (
            states.astype(jnp.float32), st_prev.astype(jnp.float32),
            eta_raw.astype(jnp.float32), eta_prev.astype(jnp.float32),
            periods.astype(jnp.float32), active.astype(bool), bars,
        ),
    )
    out = {"sig": sig, "confluence": conf, "position_cycle": pos}
    if return_state:
        final = FollowFirstState(
            last_dir=last_dir, last_bar=last_bar, position=position,
            mode=mode, st_prev=states[-1].astype(jnp.float32),
            eta_prev=eta_raw[-1].astype(jnp.float32),
            next_bar=init.next_bar + t_len,
        )
        return out, final
    return out
