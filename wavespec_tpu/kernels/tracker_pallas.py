"""Single-launch Pallas tracker scan (persistent period trackers).

The v7.57 tracker/slot/leak state machine (`analyze.trackers`, rebuilt
from `Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:1415-1782`) advances once
per frame; as a `lax.scan` its per-step body is ~a hundred small fused
VPU ops over [C=64] / [S=12] state rows, and the chip-measured cost is
spread-out small-op launch/sequencing latency with NO dominant op
(docs/ROUND2.md open item 1: ~13.7 us/frame single-series; +103 ms of
the 272 ms B=64 batch at 512 frames). Exactly the failure mode the
Jacobi Pallas kernel removed for eigh.

This kernel runs the ENTIRE scan in ONE Pallas program: the frame axis
is the (sequential, minor) grid dimension streaming candidate blocks
from HBM while the tracker state lives in VMEM scratch across grid
steps; the symbol batch rides the 128 VPU lanes, so one grid step
advances 128 symbols' trackers at the per-step cost the XLA scan paid
for one. Candidate matching is an unrolled loop over the J candidate
rows of [C, B] state tiles — the same order-free vectorized matcher
semantics as `trackers.tracker_step` (sequential_match=False), kept
op-for-op comparable so the two paths agree bitwise on every output
(parity pinned by tests/test_trackers.py).

I/O is packed — ONE f32 + ONE i32 array on each side instead of 4 + 23
blocks (each extra block is a per-step DMA descriptor for Mosaic to
schedule; measured ~2% at B=64). `frames_per_step` unrolls F frames
per grid step with the state chained through registers — measured and
REJECTED as the default: the kernel is VPU-compute-bound, not
grid-overhead-bound (chip A/B at B=64/128, 512 frames: F=1 5.9 ms,
F=2 5.86, F=4 6.96, F=6 6.75, F=8 OOMs scoped VMEM), so unrolling only
adds register pressure. The knob stays for shapes where the balance
differs; frames past the true length are masked out of the state
chain, so any T works.

Routing: `analyze.trackers.track_frames` uses this kernel on non-CPU
backends for the vectorized matcher; CPU/tests and the reference-exact
sequential matcher keep the XLA scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavespec_tpu.kernels.fused_dft import out_struct

LANES = 128
BIG = 1e30
FRAMES_PER_STEP = 1
# Candidates per [Jc, C, B] matching slab: 32 covers the default J=24 in
# one fully-parallel block; larger J (reference-exact all-bins mode,
# J ~ 149) tiles across slabs to stay inside scoped VMEM.
J_CHUNK = 32


def _slab(x, lo, hi):
    """x[lo:hi, None, :] without the mixed slice+newaxis getitem (jnp
    lowers that through a gather, which Mosaic rejects for non-trivial
    static slices)."""
    return jax.lax.slice_in_dim(x, lo, hi, axis=0)[:, None, :]


def _cumsum_rows(x):
    """Inclusive prefix sum over axis 0 of an [N, B] i32 tile via
    log2(N) statically-shifted adds (no native cumsum in Mosaic)."""
    n = x.shape[0]
    shift = 1
    while shift < n:
        x = x + jnp.concatenate(
            [jnp.zeros((shift, x.shape[1]), x.dtype), x[:-shift]], axis=0
        )
        shift *= 2
    return x


def _advance(
    state, cand_f, cand_i,
    *, j_cand: int, capacity: int, n_slots: int, tol: float,
    max_inactive: int, leak_pr: float, leak_wr: float, leak_min: int,
    leak_max: int,
):
    """One tracker frame: state tuple -> (new state tuple, f32 out rows,
    i32 out rows). All state entries are numeric [rows, LANES] tiles
    (bools ride as i32) so the caller can mask padded frames with a
    plain jnp.where.

    Layout note: the first cut looped over the J candidates (and the S
    slots) with [C, B] tiles per iteration — ~36 serial dependency
    chains of small dependent ops per frame, measured at 11.4 us/step
    (B=64, J=24, C=64; scaling probes put ~7 us of it in the J x C
    matching+alloc loops alone, ~3x the raw elementwise cost). This
    version mirrors `trackers._match_candidates`'s tensor formulation
    IN-KERNEL: full [J, C, B] / [S, C, B] arrays, rank-based
    allocation (prefix sums instead of the nth-dead-row scan), and
    per-slot leak detection with no cross-slot dependency — identical
    results (all tie-breaks are strict total orders), pipelinable
    straight-line vector code."""
    c = capacity
    j_c = j_cand
    s_n = n_slots
    imax = jnp.iinfo(jnp.int32).max
    (period, power, fft_index, alive_i, bi0, uid, next_uid,
     slot_uid_in, lact_in, luid_in, lbars_in) = state
    alive0 = alive_i != 0

    cand_p = cand_f[:j_c]                # [J, B]
    cand_pw = cand_f[j_c:]
    cand_fi = cand_i[:j_c]
    cand_ok = cand_i[j_c:] != 0

    rows = jax.lax.broadcasted_iota(jnp.int32, (c, LANES), 0)
    eligible = alive0 & (bi0 == 0)

    # ---- candidate -> tracker matching (`_match_candidates` semantics:
    # per candidate the closest eligible in-tolerance tracker by period
    # diff, first row on ties; per tracker the smallest-diff winning
    # candidate, first candidate on ties). Candidates are processed in
    # J_CHUNK-wide [Jc, C, B] tensor slabs: one slab of J=24 covers the
    # default config in a single fully-parallel block, while the
    # reference-exact all-bins mode (n_candidates=0, J~149 at window
    # 4096) stays inside scoped VMEM (a monolithic [149, 64, 128] f32
    # temp is ~4.9 MB and a handful of them OOM the 16 MB budget).
    # Cross-slab conflict resolution is a lexicographic (cost, j) merge
    # — identical to the single-slab min-reductions. ----
    imax_f = BIG
    trk_best = jnp.full((c, LANES), imax_f, jnp.float32)   # min cost
    wj_best = jnp.full((c, LANES), j_c, jnp.int32)         # its first j
    matched_rows = []                                      # [Jc, B] per slab
    for lo in range(0, j_c, J_CHUNK):
        hi = min(lo + J_CHUNK, j_c)
        jc = hi - lo
        cp3 = _slab(cand_p, lo, hi)     # [Jc, 1, B]
        per3 = period[None]              # [1, C, B]
        diff = jnp.abs(cp3 - per3)       # [Jc, C, B]
        avg = 0.5 * (cp3 + per3)
        pct = diff / jnp.maximum(avg, 1e-30) * 100.0
        ok3 = (
            _slab(cand_ok, lo, hi)
            & eligible[None]
            & (cp3 > 0)
            & (per3 > 0)
            & (pct <= tol)
        )
        cost = jnp.where(ok3, diff, BIG)                   # [Jc, C, B]
        best_cost = jnp.min(cost, axis=1, keepdims=True)   # [Jc, 1, B]
        matched = best_cost < BIG
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (jc, c, LANES), 1)
        sel_row = jnp.min(
            jnp.where(cost == best_cost, c_iota, c), axis=1, keepdims=True
        )
        onehot = (c_iota == sel_row) & matched             # [Jc, C, B]
        csel = jnp.where(onehot, cost, BIG)
        slab_best = jnp.min(csel, axis=0)                  # [C, B]
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (jc, c, LANES), 0)
        slab_wj = jnp.min(
            jnp.where(csel == slab_best[None], j_iota + lo, j_c), axis=0
        )                                                  # [C, B]
        # lex merge with the running winner: strictly-smaller cost wins;
        # equal cost keeps the earlier j (slabs ascend in j, so a tie
        # never displaces the running winner)
        better = slab_best < trk_best
        trk_best = jnp.where(better, slab_best, trk_best)
        wj_best = jnp.where(better, slab_wj, wj_best)
        matched_rows.append(matched[:, 0, :])

    trk_matched = trk_best < BIG
    matched_j = jnp.concatenate(matched_rows, axis=0)      # [J, B]
    # winner fields via a j one-hot (wj_best = j_c where unmatched, so
    # no row fires there and the pick stays 0 — gated by trk_matched)
    wj_c = jnp.where(trk_matched, wj_best, j_c)            # [C, B]
    win_p = jnp.zeros((c, LANES), jnp.float32)
    win_pw = jnp.zeros((c, LANES), jnp.float32)
    win_fi = jnp.zeros((c, LANES), jnp.int32)
    for lo in range(0, j_c, J_CHUNK):
        hi = min(lo + J_CHUNK, j_c)
        jc = hi - lo
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (jc, c, LANES), 0)
        woh = j_iota + lo == wj_c[None]                    # [Jc, C, B]
        win_p = win_p + jnp.sum(
            jnp.where(woh, _slab(cand_p, lo, hi), 0.0), axis=0)
        win_pw = win_pw + jnp.sum(
            jnp.where(woh, _slab(cand_pw, lo, hi), 0.0), axis=0)
        win_fi = win_fi + jnp.sum(
            jnp.where(woh, _slab(cand_fi, lo, hi), 0), axis=0)

    period = jnp.where(trk_matched, win_p, period)
    power = jnp.where(trk_matched, win_pw, power)
    fft_index = jnp.where(trk_matched, win_fi, fft_index)
    seen = trk_matched

    # ---- allocate unmatched candidates into dead rows: the nth
    # unmatched candidate (j order) takes the nth dead row (row order),
    # uid = next_uid + n — rank pairing via two prefix sums, no scan ----
    dead = ~alive0
    unm = cand_ok & ~matched_j & (cand_p > 0)              # [J, B]
    cand_rank = _cumsum_rows(unm.astype(jnp.int32)) - 1    # [J, B]
    dead_rank = _cumsum_rows(dead.astype(jnp.int32)) - 1   # [C, B]
    new_p = jnp.zeros((c, LANES), jnp.float32)
    new_pw = jnp.zeros((c, LANES), jnp.float32)
    new_fi = jnp.zeros((c, LANES), jnp.int32)
    any_new = jnp.zeros((c, LANES), jnp.int32)
    for lo in range(0, j_c, J_CHUNK):
        hi = min(lo + J_CHUNK, j_c)
        pair = (
            _slab(unm, lo, hi)
            & dead[None]
            & (_slab(cand_rank, lo, hi) == dead_rank[None])
        )                                                  # [Jc, C, B]
        any_new = any_new + jnp.sum(pair.astype(jnp.int32), axis=0)
        new_p = new_p + jnp.sum(
            jnp.where(pair, _slab(cand_p, lo, hi), 0.0), axis=0)
        new_pw = new_pw + jnp.sum(
            jnp.where(pair, _slab(cand_pw, lo, hi), 0.0), axis=0)
        new_fi = new_fi + jnp.sum(
            jnp.where(pair, _slab(cand_fi, lo, hi), 0), axis=0)
    is_new = any_new > 0                                   # [C, B]
    period = jnp.where(is_new, new_p, period)
    power = jnp.where(is_new, new_pw, power)
    fft_index = jnp.where(is_new, new_fi, fft_index)
    uid = jnp.where(is_new, next_uid + dead_rank, uid)
    next_uid = next_uid + jnp.sum(
        is_new.astype(jnp.int32), axis=0, keepdims=True)
    seen = seen | is_new

    alive = alive0 | is_new
    bars_inactive = jnp.where(seen, 0, bi0 + 1)
    killed = alive & ~seen & (bars_inactive >= max_inactive)
    alive = alive & ~killed

    # ---- stable slots: keep by uid while alive, fill free slots with
    # the strongest unused alive trackers (power desc, uid asc) ----
    uid_alive = jnp.where(alive, uid, 0)

    # keep pass, all slots at once: [S, C, B] uid equality (<=1 row per
    # slot since uids are unique among alive trackers)
    su3 = slot_uid_in[:, None, :]                          # [S, 1, B]
    eq3 = (su3 > 0) & (uid_alive[None] == su3)             # [S, C, B]
    keep_v = jnp.max(eq3.astype(jnp.int32), axis=1) > 0    # [S, B]
    used = jnp.max(eq3.astype(jnp.int32), axis=0) > 0      # [C, B]
    keep = [keep_v[s : s + 1] for s in range(s_n)]
    rowsel = [eq3[s] for s in range(s_n)]

    # greedy fill stays a loop: each pick consumes availability (a rank
    # formulation would need [C, C, B] pairwise comparisons — more work
    # than S=12 max/min rounds)
    fillable = alive & ~used & (power > 0)
    avail = fillable
    slot_uid_new = []
    for s in range(s_n):
        maxp = jnp.max(jnp.where(avail, power, -1.0), axis=0, keepdims=True)
        exists = maxp > 0.0
        tie = avail & (power == maxp)
        sel_uid = jnp.min(jnp.where(tie, uid, imax), axis=0, keepdims=True)
        onehot_s = tie & (uid == sel_uid)
        take = ~keep[s] & exists
        # logical blend, not jnp.where — a select on BOOL operands makes
        # XLA round-trip through i8 and Mosaic rejects the i8 -> i1 cast
        rowsel[s] = (take & onehot_s) | (~take & rowsel[s])
        su = jnp.where(
            keep[s], slot_uid_in[s : s + 1],
            jnp.where(take, sel_uid, 0),
        )
        slot_uid_new.append(su)
        avail = avail & ~(onehot_s & take)

    slot_uid_v = jnp.concatenate(slot_uid_new, axis=0)     # [S, B]
    rowsel_v = jnp.stack(rowsel, axis=0)                   # [S, C, B]
    slot_v = slot_uid_v > 0
    slot_p = jnp.where(
        slot_v, jnp.sum(jnp.where(rowsel_v, period[None], 0.0), axis=1),
        0.0)
    slot_pw = jnp.where(
        slot_v, jnp.sum(jnp.where(rowsel_v, power[None], 0.0), axis=1),
        0.0)
    slot_fi = jnp.where(
        slot_v, jnp.sum(jnp.where(rowsel_v, fft_index[None], 0), axis=1),
        0)

    # ---- leakage detection, all slots at once (no cross-slot state) ----
    active_now = alive & seen
    is_leak = (
        active_now[None]
        & slot_v[:, None, :]
        & (period[None] < slot_p[:, None, :] * leak_pr)
        & (power[None] >= slot_pw[:, None, :] * leak_wr)
        & (bars_inactive[None] <= leak_min)
        & (uid[None] != slot_uid_v[:, None, :])
    )                                                      # [S, C, B]
    score = jnp.where(is_leak, power[None], -1.0)
    top = jnp.max(score, axis=1, keepdims=True)            # [S, 1, B]
    sel_uid = jnp.min(
        jnp.where(score >= top, uid[None], imax), axis=1
    )                                                      # [S, B]
    loh = (score >= top) & (uid[None] == sel_uid[:, None, :])
    found = top[:, 0, :] > 0.0                             # [S, B]

    was_act = lact_in != 0
    bars = jnp.where(was_act, lbars_in + 1, 0)
    expired = was_act & (bars > leak_max)
    was = was_act & ~expired
    same = was & found & (luid_in == sel_uid)
    switched = found & ~same
    bars = jnp.where(same, bars, jnp.where(switched, 1, 0))

    lact = found.astype(jnp.int32)
    luid = jnp.where(found, sel_uid, 0)
    lp = jnp.where(
        found, jnp.sum(jnp.where(loh, period[None], 0.0), axis=1), 0.0)
    lpw = jnp.where(
        found, jnp.sum(jnp.where(loh, power[None], 0.0), axis=1), 0.0)
    lfi = jnp.where(
        found, jnp.sum(jnp.where(loh, fft_index[None], 0), axis=1), 0)
    lb = jnp.where(found, bars, 0)

    new_state = (
        period, power, fft_index, alive.astype(jnp.int32), bars_inactive,
        uid, next_uid, slot_uid_v, lact, luid, bars,
    )
    seen_i = seen.astype(jnp.int32)
    out_f = jnp.concatenate([slot_p, slot_pw, lp, lpw], axis=0)
    out_i = jnp.concatenate(
        [slot_fi, slot_v.astype(jnp.int32), slot_uid_v,
         lact, luid, lfi, lb],
        axis=0,
    )
    return new_state, seen_i, out_f, out_i


def _kernel(
    # packed inputs [1, F*2J, B]: (periods; powers) f32,
    # (fft_idx; valid) i32 — F frames per grid step, frame-major rows.
    # With has_init, 11 initial-state blocks follow (constant index map;
    # separate blocks because the packed fi layout slices at non-8-
    # aligned sublane offsets, which Mosaic lowers through a rejected
    # gather), then outputs, then scratch.
    cf_ref, ci_ref, *rest,
    j_cand: int, capacity: int, n_slots: int, tol: float,
    max_inactive: int, leak_pr: float, leak_wr: float, leak_min: int,
    leak_max: int, f_frames: int, t_total: int, has_init: bool,
):
    c = capacity
    s = n_slots
    if has_init:
        init_refs = rest[:11]
        rest = rest[11:]
    (of_ref, oi_ref, ff_ref, fi_ref,
     st_p, st_pw, st_fi, st_alive, st_bi, st_uid, st_next, st_slot,
     st_lact, st_luid, st_lbars) = rest

    @pl.when(pl.program_id(1) == 0)
    def _init():
        if has_init:
            # resume: the caller feeds a prior run's final TrackerState
            # back in; chunked == full-history bitwise (pinned by
            # tests/test_trackers.py resume tests)
            (ip, ipw, ifi, ial, ibi, iuid, inx, islt, ilct, ilud,
             ilbr) = init_refs
            st_p[:] = ip[:]
            st_pw[:] = ipw[:]
            st_fi[:] = ifi[:]
            st_alive[:] = ial[:]
            st_bi[:] = ibi[:]
            st_uid[:] = iuid[:]
            st_next[:] = inx[:]
            st_slot[:] = islt[:]
            st_lact[:] = ilct[:]
            st_luid[:] = ilud[:]
            st_lbars[:] = ilbr[:]
        else:
            st_p[:] = jnp.zeros((c, LANES), jnp.float32)
            st_pw[:] = jnp.zeros((c, LANES), jnp.float32)
            st_fi[:] = jnp.zeros((c, LANES), jnp.int32)
            st_alive[:] = jnp.zeros((c, LANES), jnp.int32)
            st_bi[:] = jnp.zeros((c, LANES), jnp.int32)
            st_uid[:] = jnp.zeros((c, LANES), jnp.int32)
            st_next[:] = jnp.ones((1, LANES), jnp.int32)
            st_slot[:] = jnp.zeros((s, LANES), jnp.int32)
            st_lact[:] = jnp.zeros((s, LANES), jnp.int32)
            st_luid[:] = jnp.zeros((s, LANES), jnp.int32)
            st_lbars[:] = jnp.zeros((s, LANES), jnp.int32)

    state = (
        st_p[:], st_pw[:], st_fi[:], st_alive[:], st_bi[:], st_uid[:],
        st_next[:], st_slot[:], st_lact[:], st_luid[:], st_lbars[:],
    )
    cand_f_all = cf_ref[0]               # [F*2J, B]
    cand_i_all = ci_ref[0]
    seen_last = None

    adv = partial(
        _advance, j_cand=j_cand, capacity=c, n_slots=s, tol=tol,
        max_inactive=max_inactive, leak_pr=leak_pr, leak_wr=leak_wr,
        leak_min=leak_min, leak_max=leak_max,
    )
    for f in range(f_frames):
        cand_f = cand_f_all[f * 2 * j_cand : (f + 1) * 2 * j_cand]
        cand_i = cand_i_all[f * 2 * j_cand : (f + 1) * 2 * j_cand]
        new_state, seen_i, out_f, out_i = adv(state, cand_f, cand_i)
        if f_frames > 1 and (t_total % f_frames) != 0:
            # frames past t_total are padding: keep the state frozen so
            # the final-state mirror reflects frame t_total-1
            real = (pl.program_id(1) * f_frames + f) < t_total
            state = tuple(
                jnp.where(real, n, o) for n, o in zip(new_state, state)
            )
            seen_last = (
                seen_i if seen_last is None
                else jnp.where(real, seen_i, seen_last)
            )
        else:
            state = new_state
            seen_last = seen_i
        of_ref[0, f * 4 * s : (f + 1) * 4 * s] = out_f
        oi_ref[0, f * 7 * s : (f + 1) * 7 * s] = out_i

    (period, power, fft_index, alive_i, bars_inactive, uid, next_uid,
     slot_uid, lact, luid, lbars) = state

    # ---- persist state ----
    st_p[:] = period
    st_pw[:] = power
    st_fi[:] = fft_index
    st_alive[:] = alive_i
    st_bi[:] = bars_inactive
    st_uid[:] = uid
    st_next[:] = next_uid
    st_slot[:] = slot_uid
    st_lact[:] = lact
    st_luid[:] = luid
    st_lbars[:] = lbars

    # ---- final state mirror (drop-in parity with the XLA scan's carry;
    # the same block is revisited every step, so the last step's write
    # is what lands in HBM). ONE f32 + ONE i32 output instead of twelve:
    # every extra output block is another per-step DMA descriptor for
    # Mosaic to schedule. ----
    ff_ref[:] = jnp.concatenate([period, power], axis=0)
    fi_ref[:] = jnp.concatenate(
        [fft_index, alive_i, seen_last, bars_inactive, uid, next_uid,
         slot_uid, lact, luid, lbars],
        axis=0,
    )


@partial(jax.jit, static_argnames=("cfg", "interpret", "frames_per_step"))
def track_frames_pallas(
    cand_periods: jax.Array,   # [..., T, J] f32
    cand_powers: jax.Array,    # [..., T, J] f32
    cand_fft_idx: jax.Array,   # [..., T, J] i32
    cand_valid: jax.Array,     # [..., T, J] bool
    cfg,
    interpret: bool = False,
    frames_per_step: int = FRAMES_PER_STEP,
    init=None,
):
    """Batched tracker scan in one Pallas launch.

    Leading dims are the symbol batch (flattened onto the VPU lanes —
    NOT vmapped pallas). Returns (slot outputs dict of [..., T, S]
    arrays, final TrackerState). `init` resumes from a prior run's
    final state (the reference keeps its tracker arrays in persistent
    globals across `OnCalculate` ticks, `pla-kalman.mq5:1415-1530`):
    feeding chunk N's returned state into chunk N+1 reproduces the
    full-history run bitwise, so online serving only pays for NEW
    frames per tick.
    """
    lead = cand_periods.shape[:-2]
    t_frames, j_real = cand_periods.shape[-2:]
    c, s = cfg.capacity, cfg.n_slots
    ff = max(1, min(int(frames_per_step), t_frames))
    t_pad = -(-t_frames // ff) * ff
    # Pad J to a sublane multiple: the packed block slices rows at
    # offsets j_cand and lo/hi within each matching slab, and Mosaic
    # lowers a non-8-aligned sublane slice through an unsupported
    # gather. Padded candidates carry valid=0 — inert in matching
    # (ok requires cand_ok) and allocation (unm requires cand_ok).
    j_cand = -(-j_real // 8) * 8

    def to_lanes(a, dt):
        x = a.astype(dt).reshape(-1, t_frames, j_real)
        x = jnp.moveaxis(x, 0, -1)                       # [T, J, B]
        b = x.shape[-1]
        b_pad = -(-b // LANES) * LANES
        if b_pad != b or t_pad != t_frames or j_cand != j_real:
            x = jnp.pad(
                x,
                ((0, t_pad - t_frames), (0, j_cand - j_real),
                 (0, b_pad - b)),
            )
        return x

    # Packed inputs/outputs: one f32 + one i32 array on each side (the
    # per-step DMA descriptor count is part of the fixed grid-step
    # cost), F frames per block so the sequential grid runs T/F steps.
    cf32 = jnp.concatenate(
        [to_lanes(cand_periods, jnp.float32),
         to_lanes(cand_powers, jnp.float32)], axis=1,
    ).reshape(t_pad // ff, ff * 2 * j_cand, -1)     # [T/F, F*2J, Bp]
    ci32 = jnp.concatenate(
        [to_lanes(cand_fft_idx, jnp.int32),
         to_lanes(cand_valid, jnp.int32)], axis=1,
    ).reshape(t_pad // ff, ff * 2 * j_cand, -1)
    b_pad = cf32.shape[-1]
    b = max(1, np_prod(lead))
    n_fi = 5 * c + 1 + 4 * s

    grid = (b_pad // LANES, t_pad // ff)
    in_spec = pl.BlockSpec((1, ff * 2 * j_cand, LANES),
                           lambda i, t: (t, 0, i),
                           memory_space=pltpu.VMEM)
    of_spec = pl.BlockSpec((1, ff * 4 * s, LANES), lambda i, t: (t, 0, i),
                           memory_space=pltpu.VMEM)
    oi_spec = pl.BlockSpec((1, ff * 7 * s, LANES), lambda i, t: (t, 0, i),
                           memory_space=pltpu.VMEM)
    # Final-state outputs revisit the same block for every t of a batch
    # tile — only the last step's write survives, which IS the final
    # state.
    ff_spec = pl.BlockSpec((2 * c, LANES), lambda i, t: (0, i),
                           memory_space=pltpu.VMEM)
    fi_spec = pl.BlockSpec((n_fi, LANES), lambda i, t: (0, i),
                           memory_space=pltpu.VMEM)

    init_arrays = []
    init_specs = []
    if init is not None:
        def state_rows(a, rows, dt):
            x = jnp.swapaxes(a.astype(dt).reshape(-1, rows), 0, 1)
            if b_pad != x.shape[-1]:
                x = jnp.pad(x, ((0, 0), (0, b_pad - x.shape[-1])))
            return x

        init_arrays = [
            state_rows(init.period, c, jnp.float32),
            state_rows(init.power, c, jnp.float32),
            state_rows(init.fft_index, c, jnp.int32),
            state_rows(init.alive, c, jnp.int32),
            state_rows(init.bars_inactive, c, jnp.int32),
            state_rows(init.uid, c, jnp.int32),
            state_rows(init.next_uid[..., None], 1, jnp.int32),
            state_rows(init.slot_uid, s, jnp.int32),
            state_rows(init.leak_active, s, jnp.int32),
            state_rows(init.leak_uid, s, jnp.int32),
            state_rows(init.leak_bars, s, jnp.int32),
        ]
        init_specs = [
            pl.BlockSpec((a.shape[0], LANES), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM)
            for a in init_arrays
        ]

    kernel = partial(
        _kernel, j_cand=j_cand, capacity=c, n_slots=s,
        tol=float(cfg.tolerance_pct), max_inactive=int(cfg.max_inactive),
        leak_pr=float(cfg.leak_period_ratio),
        leak_wr=float(cfg.leak_power_ratio),
        leak_min=int(cfg.leak_min_bars), leak_max=int(cfg.leak_max_bars),
        f_frames=ff, t_total=t_frames, has_init=init is not None,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec, in_spec] + init_specs,
        out_specs=[of_spec, oi_spec, ff_spec, fi_spec],
        out_shape=[
            out_struct((t_pad // ff, ff * 4 * s, b_pad), jnp.float32, cf32),
            out_struct((t_pad // ff, ff * 7 * s, b_pad), jnp.int32, cf32),
            out_struct((2 * c, b_pad), jnp.float32, cf32),
            out_struct((n_fi, b_pad), jnp.int32, cf32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, LANES), jnp.float32),   # period
            pltpu.VMEM((c, LANES), jnp.float32),   # power
            pltpu.VMEM((c, LANES), jnp.int32),     # fft_index
            pltpu.VMEM((c, LANES), jnp.int32),     # alive
            pltpu.VMEM((c, LANES), jnp.int32),     # bars_inactive
            pltpu.VMEM((c, LANES), jnp.int32),     # uid
            pltpu.VMEM((1, LANES), jnp.int32),     # next_uid
            pltpu.VMEM((s, LANES), jnp.int32),     # slot_uid
            pltpu.VMEM((s, LANES), jnp.int32),     # leak_active
            pltpu.VMEM((s, LANES), jnp.int32),     # leak_uid
            pltpu.VMEM((s, LANES), jnp.int32),     # leak_bars
        ],
        interpret=interpret,
    )(cf32, ci32, *init_arrays)

    of, oi, ffin, fi = outs
    of = of.reshape(t_pad, 4 * s, b_pad)[:t_frames]
    oi = oi.reshape(t_pad, 7 * s, b_pad)[:t_frames]

    def back(x, row, dt=None):
        y = x[:, row * s : (row + 1) * s, :b]      # [T, S, B]
        y = jnp.moveaxis(y, -1, 0).reshape(*lead, t_frames, s)
        return y if dt is None else y.astype(dt)

    def back_state(x, r0, rows, dt=None, scalar=False):
        y = jnp.moveaxis(x[r0 : r0 + rows, :b], -1, 0)   # [B, rows]
        y = y.reshape(*lead, rows) if not scalar else y.reshape(*lead)
        return y if dt is None else y.astype(dt)

    from wavespec_tpu.analyze.trackers import TrackerState

    state = TrackerState(
        period=back_state(ffin, 0, c),
        fft_index=back_state(fi, 0, c),
        power=back_state(ffin, c, c),
        alive=back_state(fi, c, c, bool),
        seen_now=back_state(fi, 2 * c, c, bool),
        bars_inactive=back_state(fi, 3 * c, c),
        uid=back_state(fi, 4 * c, c),
        next_uid=back_state(fi, 5 * c, 1, scalar=True),
        slot_uid=back_state(fi, 5 * c + 1, s),
        leak_active=back_state(fi, 5 * c + 1 + s, s, bool),
        leak_uid=back_state(fi, 5 * c + 1 + 2 * s, s),
        leak_bars=back_state(fi, 5 * c + 1 + 3 * s, s),
    )
    outs_dict = {
        "slot_period": back(of, 0),
        "slot_power": back(of, 1),
        "slot_fft_index": back(oi, 0),
        "slot_valid": back(oi, 1, bool),
        "slot_uid": back(oi, 2),
        "leak_active": back(oi, 3, bool),
        "leak_uid": back(oi, 4),
        "leak_period": back(of, 2),
        "leak_power": back(of, 3),
        "leak_fft_index": back(oi, 5),
        "leak_bars": back(oi, 6),
    }
    return outs_dict, state


def np_prod(t):
    out = 1
    for v in t:
        out *= int(v)
    return out
