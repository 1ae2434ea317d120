"""Persistent period trackers, stable slots, and leakage detection.

Rebuild of the v7.57 tracking system
(`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5`):
- `IsSamePeriod`/`FindClosestTracker`/`UpdateTracker`/`AddTracker`/
  `DeactivateUnseenTrackers` (`:1415-1530`): identity-preserving trackers
  matched by period within a % tolerance (default 5%), deactivated after
  `max_inactive` (3) unseen frames;
- `UpdateStableSlots` (`:1581-1667`): 12 display slots that KEEP their
  tracker while it lives and fill free slots with the strongest unused
  trackers (the no-repaint slot policy, `1.0.2.mq5:15-17`);
- `IsLeakage`/`DetectLeakages` (`:1677-1782`): per-slot transient-intruder
  flags (candidate period < leak_period_ratio x main, power >=
  leak_power_ratio x main, recent), expiring after leak_max_bars.

TPU formulation: the reference mutates a dynamically-sized tracker array
per bar; here the state is a fixed-capacity struct-of-arrays advanced by a
`lax.scan` over frames. Dead capacity rows are reused; identity is a
monotonically increasing uid so tests can assert slots never silently
swap trackers. One deliberate divergence: the reference matches
candidates sequentially (later candidates see earlier updates within the
same frame); we match all candidates against the frame-start tracker
state and resolve conflicts by smallest period difference — order-free
and vectorizable. MEASURED equivalence (tests/test_v757_oracle.py
defaults gate): when the candidate set is small relative to the
tolerance spacing (the window-256 oracle series: 10 in-band bins) the
vectorized matcher reproduces the reference bar-for-bar (activity,
states, periods to f32 eps); with dense candidate sets (window 1024:
37 bins inside the same 5% tolerance) in-frame period drag changes
which tracker each bin feeds, so slot ASSIGNMENTS diverge (~1% activity,
~30% median per-slot period delta on the gate series) while both runs
track the same spectral content. Reference-exact behavior at any window
is available via `sequential_match=True`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = 1e30


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Defaults = reference inputs (`:985-986`, `:1059-1062`)."""

    capacity: int = 64
    n_slots: int = 12
    tolerance_pct: float = 5.0
    max_inactive: int = 3
    leak_period_ratio: float = 0.30
    leak_power_ratio: float = 0.70
    leak_min_bars: int = 2
    leak_max_bars: int = 8
    # Reference-exact candidate matching: process candidates SEQUENTIALLY
    # (a lax.scan within the frame), so later candidates see earlier
    # updates — the v7.57 in-frame "period drag" semantics where adjacent
    # bins keep re-matching the same tracker (`:3530-3551` feeding
    # `FindClosestTracker` after each `UpdateTracker`). Default False =
    # the vectorized order-free matcher (same steady state, faster).
    sequential_match: bool = False


class TrackerState(NamedTuple):
    period: jax.Array        # [C] f32
    fft_index: jax.Array     # [C] i32
    power: jax.Array         # [C] f32
    alive: jax.Array         # [C] bool
    seen_now: jax.Array      # [C] bool (is_active this frame)
    bars_inactive: jax.Array # [C] i32
    uid: jax.Array           # [C] i32 (0 = never used)
    next_uid: jax.Array      # scalar i32
    slot_uid: jax.Array      # [S] i32 (0 = free) — slot keeps its tracker by uid
    leak_active: jax.Array   # [S] bool
    leak_uid: jax.Array      # [S] i32
    leak_bars: jax.Array     # [S] i32


def init_state(cfg: TrackerConfig) -> TrackerState:
    c, s = cfg.capacity, cfg.n_slots
    return TrackerState(
        period=jnp.zeros(c, jnp.float32),
        fft_index=jnp.zeros(c, jnp.int32),
        power=jnp.zeros(c, jnp.float32),
        alive=jnp.zeros(c, bool),
        seen_now=jnp.zeros(c, bool),
        bars_inactive=jnp.zeros(c, jnp.int32),
        uid=jnp.zeros(c, jnp.int32),
        next_uid=jnp.asarray(1, jnp.int32),
        slot_uid=jnp.zeros(s, jnp.int32),
        leak_active=jnp.zeros(s, bool),
        leak_uid=jnp.zeros(s, jnp.int32),
        leak_bars=jnp.zeros(s, jnp.int32),
    )


def _match_candidates(state: TrackerState, cand_period, cand_valid, cfg):
    """Candidate->tracker matching (tolerance + closest-period)."""
    # eligibility: tracker alive and active now (bars_inactive == 0)
    eligible = state.alive & (state.bars_inactive == 0)
    diff = jnp.abs(cand_period[:, None] - state.period[None, :])          # [J, C]
    avg = 0.5 * (cand_period[:, None] + state.period[None, :])
    pct = jnp.where(avg > 0, diff / jnp.maximum(avg, 1e-30) * 100.0, BIG)
    ok = (
        cand_valid[:, None]
        & eligible[None, :]
        & (cand_period[:, None] > 0)
        & (state.period[None, :] > 0)
        & (pct <= cfg.tolerance_pct)
    )
    cost = jnp.where(ok, diff, BIG)
    best_trk = jnp.argmin(cost, axis=1)                                    # [J]
    best_cost = jnp.min(cost, axis=1)
    has_match = best_cost < BIG
    # conflict resolution: per tracker keep the candidate with min diff
    j_cost = jnp.where(
        has_match[:, None]
        & (best_trk[:, None] == jnp.arange(state.period.shape[0])[None, :]),
        best_cost[:, None],
        BIG,
    )                                                                       # [J, C]
    winner_j = jnp.argmin(j_cost, axis=0)                                   # [C]
    trk_matched = jnp.min(j_cost, axis=0) < BIG                             # [C]
    cand_won = has_match & (winner_j[best_trk] == jnp.arange(cand_period.shape[0]))
    return trk_matched, winner_j, cand_won, has_match


def _sequential_match_update(state: TrackerState, frame, cfg: TrackerConfig):
    """Reference-exact in-frame candidate processing (`:3530-3551`).

    A lax.scan over candidates: each candidate matches the CLOSEST
    currently-eligible tracker within tolerance (ties broken by creation
    order = smallest uid, the reference's first-array-index rule) and
    updates it immediately — later candidates of the same frame see the
    update (the "period drag" dynamics of the all-bins scan). Unmatched
    candidates allocate a dead capacity row (the reference appends
    unboundedly; overflow drops extras as documented).

    Returns (period, power, fft_index, alive, seen, uid, next_uid).
    """
    cand_period, cand_power, cand_fft, cand_valid = frame
    c = cfg.capacity
    rows = jnp.arange(c)
    imax = jnp.iinfo(jnp.int32).max

    def one_candidate(carry, cand):
        period, power, fft_index, alive, seen, uid, next_uid, bi = carry
        p, pw, fi, ok = cand
        eligible = alive & (bi == 0)
        diff = jnp.abs(period - p)
        avg = 0.5 * (period + p)
        pct = jnp.where(avg > 0, diff / jnp.maximum(avg, 1e-30) * 100.0, BIG)
        within = (
            eligible & ok & (p > 0) & (period > 0) & (pct <= cfg.tolerance_pct)
        )
        cost = jnp.where(within, diff, BIG)
        min_cost = jnp.min(cost)
        matched = min_cost < BIG
        tie = within & (cost <= min_cost)
        best = jnp.argmin(jnp.where(tie, uid, imax))
        hit = matched & (rows == best)

        dead = ~alive
        can_alloc = (~matched) & ok & (p > 0) & jnp.any(dead)
        new_row = jnp.argmax(dead)
        make = can_alloc & (rows == new_row)

        touch = hit | make
        period = jnp.where(touch, p, period)
        power = jnp.where(touch, pw, power)
        fft_index = jnp.where(touch, fi, fft_index)
        seen = seen | touch
        alive = alive | make
        bi = jnp.where(touch, 0, bi)  # AddTracker/UpdateTracker reset
        uid = jnp.where(make, next_uid, uid)
        next_uid = next_uid + can_alloc.astype(jnp.int32)
        return (period, power, fft_index, alive, seen, uid, next_uid, bi), None

    init = (state.period, state.power, state.fft_index, state.alive,
            jnp.zeros(c, bool), state.uid, state.next_uid,
            state.bars_inactive)
    (period, power, fft_index, alive, seen, uid, next_uid, _), _ = jax.lax.scan(
        one_candidate, init,
        (cand_period, cand_power, cand_fft, cand_valid),
    )
    return period, power, fft_index, alive, seen, uid, next_uid


def tracker_step(state: TrackerState, frame, cfg: TrackerConfig):
    """Advance one frame. frame = (periods [J], powers [J], fft_idx [J],
    valid [J]). Returns (new_state, slot_outputs dict)."""
    cand_period, cand_power, cand_fft, cand_valid = frame
    c = cfg.capacity
    j = cand_period.shape[0]

    if cfg.sequential_match:
        (period, power, fft_index, alive, seen, uid, next_uid) = (
            _sequential_match_update(state, frame, cfg)
        )
        bars_inactive = jnp.where(seen, 0, state.bars_inactive + 1)
        killed = alive & ~seen & (bars_inactive >= cfg.max_inactive)
        alive = alive & ~killed
        return _slots_and_leaks(
            state, cfg, period, power, fft_index, alive, seen,
            bars_inactive, uid, next_uid,
        )

    trk_matched, winner_j, cand_won, cand_matched = _match_candidates(
        state, cand_period, cand_valid, cfg
    )

    # --- update matched trackers with their winning candidate ---
    period = jnp.where(trk_matched, cand_period[winner_j], state.period)
    power = jnp.where(trk_matched, cand_power[winner_j], state.power)
    fft_index = jnp.where(trk_matched, cand_fft[winner_j], state.fft_index)
    seen = trk_matched

    # --- allocate unmatched candidates into dead capacity rows ---
    # A candidate that matched a tracker but LOST the per-tracker conflict
    # must not allocate: in the reference's sequential scan it would have
    # updated the same tracker again (two adjacent in-tolerance bins are
    # common), so spawning a near-duplicate tracker here would diverge
    # from both the reference and the sequential_match path. The period>0
    # guard mirrors the sequential path's can_alloc condition.
    unmatched = cand_valid & ~cand_matched & (cand_period > 0)
    dead = ~state.alive
    # nth unmatched candidate -> nth dead row
    cand_rank = jnp.cumsum(unmatched.astype(jnp.int32)) - 1      # [J]
    dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1           # [C]
    # row_for_rank[r] = index of the r-th dead row
    row_ids = jnp.where(dead, dead_rank, c + 1)
    # scatter: build [C] updates from candidates
    take = jnp.zeros(c, jnp.int32) - 1
    cand_ids = jnp.arange(j, dtype=jnp.int32)
    # for each dead row with rank r, find candidate with rank r (if any)
    cand_of_rank = jnp.full(j + 1, -1, jnp.int32)
    cand_of_rank = cand_of_rank.at[
        jnp.where(unmatched, cand_rank, j)
    ].set(jnp.where(unmatched, cand_ids, -1))
    take = jnp.where(
        dead & (dead_rank < jnp.sum(unmatched)),
        cand_of_rank[jnp.clip(dead_rank, 0, j - 1)],
        -1,
    )
    is_new = take >= 0
    take_c = jnp.clip(take, 0, j - 1)
    period = jnp.where(is_new, cand_period[take_c], period)
    power = jnp.where(is_new, cand_power[take_c], power)
    fft_index = jnp.where(is_new, cand_fft[take_c], fft_index)
    seen = seen | is_new
    uid = jnp.where(
        is_new, state.next_uid + jnp.cumsum(is_new.astype(jnp.int32)) - 1, state.uid
    )
    next_uid = state.next_uid + jnp.sum(is_new.astype(jnp.int32))
    alive = state.alive | is_new

    # --- deactivate unseen; kill after max_inactive ---
    bars_inactive = jnp.where(seen, 0, state.bars_inactive + 1)
    killed = alive & ~seen & (bars_inactive >= cfg.max_inactive)
    alive = alive & ~killed

    return _slots_and_leaks(
        state, cfg, period, power, fft_index, alive, seen, bars_inactive,
        uid, next_uid,
    )


def _slots_and_leaks(
    state: TrackerState, cfg: TrackerConfig, period, power, fft_index,
    alive, seen, bars_inactive, uid, next_uid,
):
    """Stable slot assignment + leakage detection + state assembly
    (shared by the vectorized and sequential matchers)."""
    c = cfg.capacity
    # --- stable slot assignment (fully vectorized: the per-slot Python
    # loops of the first cut serialized ~100 tiny ops per frame inside the
    # scan and were 91% of the v757 device budget) ---
    s = cfg.n_slots
    imax = jnp.iinfo(jnp.int32).max
    rows = jnp.arange(c)
    # a slot keeps its uid while that tracker is alive
    uid_alive = jnp.where(alive, uid, 0)
    slot_uid = state.slot_uid
    match = (slot_uid[:, None] > 0) & (uid_alive[None, :] == slot_uid[:, None])
    hit_rows = jnp.where(match, rows[None, :], c)              # [S, C]
    slot_row = jnp.min(hit_rows, axis=1)                       # [S]
    slot_keep = slot_row < c
    slot_row = jnp.where(slot_keep, slot_row, -1)
    slot_uid = jnp.where(slot_keep, slot_uid, 0)
    used = jnp.any(match & slot_keep[:, None], axis=0)         # [C]

    # fill free slots (in slot order) with the strongest unused alive
    # trackers; power ties go to the OLDEST tracker (min uid) — the
    # reference's bubble sort is stable over array order = creation order
    # (`:1596-1609`). One lexicographic sort replaces the greedy loop.
    fillable = alive & ~used & (power > 0)
    neg_p = jnp.where(fillable, -power, jnp.inf)
    uid_key = jnp.where(fillable, uid, imax)
    _, _, ranked_rows = jax.lax.sort(
        (neg_p, uid_key, rows.astype(jnp.int32)), num_keys=2
    )
    n_avail = jnp.sum(fillable.astype(jnp.int32))
    free = ~slot_keep
    fill_rank = jnp.cumsum(free.astype(jnp.int32)) - 1         # [S]
    cand_row = ranked_rows[jnp.clip(fill_rank, 0, c - 1)]      # [S]
    take_fill = free & (fill_rank < n_avail)
    slot_row = jnp.where(take_fill, cand_row, slot_row)
    slot_uid = jnp.where(take_fill, uid[cand_row], slot_uid)

    slot_valid = slot_uid > 0
    srow = jnp.clip(slot_row, 0, c - 1)
    slot_period = jnp.where(slot_valid, period[srow], 0.0)
    slot_power = jnp.where(slot_valid, power[srow], 0.0)
    slot_fft = jnp.where(slot_valid, fft_index[srow], 0)

    # --- leakage detection per slot ---
    active_now = alive & seen
    # NOTE: the bars_inactive <= leak_min_bars clause is vacuous here —
    # candidates already require active_now (bars_inactive == 0). The
    # reference has the same redundancy: `DetectLeakages` skips trackers
    # with bars_inactive > 0 before `IsLeakage` re-checks the threshold
    # (`...pla-kalman.mq5:1733` vs `:1695`). Kept for contract parity.
    cand_is_leak = (
        active_now[None, :]
        & slot_valid[:, None]
        & (period[None, :] < slot_period[:, None] * cfg.leak_period_ratio)
        & (power[None, :] >= slot_power[:, None] * cfg.leak_power_ratio)
        & (bars_inactive[None, :] <= cfg.leak_min_bars)
        & (uid[None, :] != slot_uid[:, None])
    )                                                                # [S, C]
    leak_score = jnp.where(cand_is_leak, power[None, :], -1.0)
    # strongest leak; power ties -> oldest tracker (reference scans in
    # array order with a strict `>` comparison, `:1735-1741`)
    top_leak = jnp.max(leak_score, axis=1, keepdims=True)            # [S, 1]
    best_leak = jnp.argmin(
        jnp.where(leak_score >= top_leak, uid[None, :], imax), axis=1
    )                                                                # [S]
    found_leak = jnp.squeeze(top_leak, -1) > 0
    best_leak_uid = uid[best_leak]

    # expire old leaks past max_bars (pre-increment like the reference)
    leak_bars = jnp.where(state.leak_active, state.leak_bars + 1, 0)
    expired = state.leak_active & (leak_bars > cfg.leak_max_bars)
    was_active = state.leak_active & ~expired

    same = was_active & found_leak & (state.leak_uid == best_leak_uid)
    switched = found_leak & ~same
    leak_active = found_leak
    leak_uid = jnp.where(found_leak, best_leak_uid, 0)
    leak_bars = jnp.where(same, leak_bars, jnp.where(switched, 1, 0))

    new_state = TrackerState(
        period=period, fft_index=fft_index, power=power, alive=alive,
        seen_now=seen, bars_inactive=bars_inactive, uid=uid,
        next_uid=next_uid, slot_uid=slot_uid, leak_active=leak_active,
        leak_uid=leak_uid, leak_bars=leak_bars,
    )
    out = {
        "slot_period": slot_period,
        "slot_power": slot_power,
        "slot_fft_index": slot_fft,
        "slot_valid": slot_valid,
        "slot_uid": slot_uid,
        "leak_active": leak_active,
        "leak_uid": leak_uid,
        "leak_period": jnp.where(leak_active, period[best_leak], 0.0),
        "leak_power": jnp.where(leak_active, power[best_leak], 0.0),
        "leak_fft_index": jnp.where(leak_active, fft_index[best_leak], 0),
        "leak_bars": jnp.where(leak_active, leak_bars, 0),
    }
    return new_state, out


def _coerce_state(st: TrackerState) -> TrackerState:
    """Dtype-normalize a TrackerState (resume inputs may arrive as
    numpy arrays or loosened dtypes)."""
    ref = init_state(TrackerConfig())
    return TrackerState(*(
        jnp.asarray(v, getattr(ref, f).dtype)
        for f, v in zip(TrackerState._fields, st)
    ))


@partial(jax.jit, static_argnames=("cfg",))
def track_frames(
    cand_periods: jax.Array,   # [..., T, J]
    cand_powers: jax.Array,    # [..., T, J]
    cand_fft_idx: jax.Array,   # [..., T, J] int32
    cand_valid: jax.Array,     # [..., T, J] bool
    cfg: TrackerConfig = TrackerConfig(),
    init: TrackerState | None = None,
):
    """Run the tracker over T frames of candidates; returns per-frame slot
    outputs (dict of [..., T, n_slots] arrays) and the final state.

    Leading dims are a symbol batch. `init` resumes from a prior call's
    final state — the reference's tracker arrays persist in globals
    across `OnCalculate` ticks (`pla-kalman.mq5:1415-1530`), so chunked
    online runs must see the full history's state: feeding chunk N's
    state into chunk N+1 reproduces the one-shot run bitwise (pinned by
    tests), and a live tick only pays for its new frames.

    Routing (trace-time, like `jacobi.jacobi_eigh`): on a real device
    the vectorized matcher runs as ONE Pallas launch with the whole
    batch on the VPU lanes and the frame axis streamed through the grid
    (`kernels.tracker_pallas`) — the `lax.scan` body is ~a hundred tiny
    fused ops whose per-step dispatch latency dominated the v757 device
    budget (~13.7 us/frame single series, +103 ms of the 272 ms B=64
    batch). CPU/tests and the reference-exact sequential matcher keep
    the XLA scan (vmapped over leading dims).
    """
    if init is not None:
        init = _coerce_state(init)
    if not cfg.sequential_match and jax.default_backend() != "cpu":
        from wavespec_tpu.kernels.tracker_pallas import track_frames_pallas

        return track_frames_pallas(
            cand_periods, cand_powers, cand_fft_idx, cand_valid, cfg,
            init=init,
        )

    if cand_periods.ndim > 2:
        fn = lambda p, w, f, v, st: track_frames(p, w, f, v, cfg=cfg, init=st)
        for _ in range(cand_periods.ndim - 2):
            fn = jax.vmap(fn)
        if init is None:
            st0 = init_state(cfg)
            shape = cand_periods.shape[:-2]
            init = TrackerState(*(
                jnp.broadcast_to(v, (*shape, *v.shape)) for v in st0
            ))
        return fn(cand_periods, cand_powers, cand_fft_idx, cand_valid, init)

    def step(state, frame):
        return tracker_step(state, frame, cfg)

    from wavespec_tpu.utils.vma import pvary_like

    # Under shard_map(check_vma=True) the replicated zero-init carry must
    # be pvary-promoted to the candidates' varying axes or the scan's
    # carry-vma check rejects it (utils.vma; no-op outside shard_map).
    state, outs = jax.lax.scan(
        step,
        pvary_like(init_state(cfg) if init is None else init, cand_periods),
        (
            cand_periods.astype(jnp.float32),
            cand_powers.astype(jnp.float32),
            cand_fft_idx.astype(jnp.int32),
            cand_valid.astype(bool),
        ),
    )
    return outs, state
