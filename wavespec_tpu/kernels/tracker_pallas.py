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


def _kernel(
    cand_p_ref, cand_pw_ref, cand_fi_ref, cand_v_ref,
    # outputs [1, S, B] per grid step
    sp_ref, spw_ref, sfi_ref, sv_ref, su_ref,
    la_ref, lu_ref, lp_ref, lpw_ref, lfi_ref, lb_ref,
    # final-state outputs (same block every step; last write wins)
    fs_p, fs_pw, fs_fi, fs_alive, fs_seen, fs_bi, fs_uid, fs_next,
    fs_slot, fs_lact, fs_luid, fs_lbars,
    # VMEM scratch: persistent tracker state across the frame grid axis
    st_p, st_pw, st_fi, st_alive, st_bi, st_uid, st_next, st_slot, st_lact,
    st_luid, st_lbars,
    *, j_cand: int, capacity: int, n_slots: int, tol: float,
    max_inactive: int, leak_pr: float, leak_wr: float, leak_min: int,
    leak_max: int,
):
    c = capacity
    imax = jnp.iinfo(jnp.int32).max

    @pl.when(pl.program_id(1) == 0)
    def _init():
        st_p[:] = jnp.zeros((c, LANES), jnp.float32)
        st_pw[:] = jnp.zeros((c, LANES), jnp.float32)
        st_fi[:] = jnp.zeros((c, LANES), jnp.int32)
        st_alive[:] = jnp.zeros((c, LANES), jnp.int32)
        st_bi[:] = jnp.zeros((c, LANES), jnp.int32)
        st_uid[:] = jnp.zeros((c, LANES), jnp.int32)
        st_next[:] = jnp.ones((1, LANES), jnp.int32)
        st_slot[:] = jnp.zeros((n_slots, LANES), jnp.int32)
        st_lact[:] = jnp.zeros((n_slots, LANES), jnp.int32)
        st_luid[:] = jnp.zeros((n_slots, LANES), jnp.int32)
        st_lbars[:] = jnp.zeros((n_slots, LANES), jnp.int32)

    period = st_p[:]
    power = st_pw[:]
    fft_index = st_fi[:]
    alive0 = st_alive[:] != 0            # frame-start aliveness
    bi0 = st_bi[:]
    uid = st_uid[:]
    next_uid = st_next[:]                # [1, B]

    cand_p = cand_p_ref[0]               # [J, B]
    cand_pw = cand_pw_ref[0]
    cand_fi = cand_fi_ref[0]
    cand_ok = cand_v_ref[0] != 0

    rows = jax.lax.broadcasted_iota(jnp.int32, (c, LANES), 0)
    eligible = alive0 & (bi0 == 0)

    # ---- candidate -> tracker matching (`_match_candidates` semantics:
    # per candidate the closest eligible in-tolerance tracker by period
    # diff, first row on ties; per tracker the smallest-diff winning
    # candidate, first candidate on ties) ----
    trk_best = jnp.full((c, LANES), BIG, jnp.float32)
    win_p, win_pw, win_fi = period, power, fft_index
    matched_j = []
    for j in range(j_cand):
        p_j = cand_p[j : j + 1]          # [1, B]
        diff = jnp.abs(p_j - period)     # [C, B]
        avg = 0.5 * (p_j + period)
        pct = diff / jnp.maximum(avg, 1e-30) * 100.0
        ok = (
            (cand_ok[j : j + 1])
            & eligible
            & (p_j > 0)
            & (period > 0)
            & (pct <= tol)
        )
        cost = jnp.where(ok, diff, BIG)
        best_cost = jnp.min(cost, axis=0, keepdims=True)       # [1, B]
        matched = best_cost < BIG
        sel_row = jnp.min(
            jnp.where(cost == best_cost, rows, c), axis=0, keepdims=True
        )
        onehot = (rows == sel_row) & matched
        improve = onehot & (cost < trk_best)
        trk_best = jnp.where(improve, cost, trk_best)
        win_p = jnp.where(improve, p_j, win_p)
        win_pw = jnp.where(improve, cand_pw[j : j + 1], win_pw)
        win_fi = jnp.where(improve, cand_fi[j : j + 1], win_fi)
        matched_j.append(matched)

    trk_matched = trk_best < BIG
    period = jnp.where(trk_matched, win_p, period)
    power = jnp.where(trk_matched, win_pw, power)
    fft_index = jnp.where(trk_matched, win_fi, fft_index)
    seen = trk_matched

    # ---- allocate unmatched candidates into dead rows (nth unmatched
    # candidate -> nth dead row, uid in candidate order) ----
    dead = ~alive0
    # all-false masks via comparison (a jnp.zeros(..., bool) constant is
    # i8 in XLA and Mosaic rejects the i8 -> i1 truncation)
    allocated = rows < 0
    for j in range(j_cand):
        p_j = cand_p[j : j + 1]
        unm = cand_ok[j : j + 1] & ~matched_j[j] & (p_j > 0)   # [1, B]
        new_row = jnp.min(jnp.where(dead, rows, c), axis=0, keepdims=True)
        make = unm & (new_row < c)
        onehot = (rows == new_row) & make
        period = jnp.where(onehot, p_j, period)
        power = jnp.where(onehot, cand_pw[j : j + 1], power)
        fft_index = jnp.where(onehot, cand_fi[j : j + 1], fft_index)
        uid = jnp.where(onehot, next_uid, uid)
        next_uid = next_uid + make.astype(jnp.int32)
        seen = seen | onehot
        allocated = allocated | onehot
        dead = dead & ~onehot

    alive = alive0 | allocated
    bars_inactive = jnp.where(seen, 0, bi0 + 1)
    killed = alive & ~seen & (bars_inactive >= max_inactive)
    alive = alive & ~killed

    # ---- stable slots: keep by uid while alive, fill free slots with
    # the strongest unused alive trackers (power desc, uid asc) ----
    uid_alive = jnp.where(alive, uid, 0)
    slot_uid_in = st_slot[:]             # [S, B]

    keep = []
    rowsel = []                          # per-slot [C, B] one-hot
    used = rows < 0
    for s in range(n_slots):
        su = slot_uid_in[s : s + 1]      # [1, B]
        eq = (su > 0) & (uid_alive == su)            # [C, B] (<=1 row set)
        keep_s = jnp.max(jnp.where(eq, 1, 0), axis=0, keepdims=True) > 0
        keep.append(keep_s)
        rowsel.append(eq)
        used = used | eq

    fillable = alive & ~used & (power > 0)
    avail = fillable
    slot_uid_new = []
    for s in range(n_slots):
        maxp = jnp.max(jnp.where(avail, power, -1.0), axis=0, keepdims=True)
        exists = maxp > 0.0
        tie = avail & (power == maxp)
        sel_uid = jnp.min(jnp.where(tie, uid, imax), axis=0, keepdims=True)
        onehot = tie & (uid == sel_uid)
        take = ~keep[s] & exists
        # logical blend, not jnp.where — a select on BOOL operands makes
        # XLA round-trip through i8 and Mosaic rejects the i8 -> i1 cast
        rowsel[s] = (take & onehot) | (~take & rowsel[s])
        su = jnp.where(
            keep[s], slot_uid_in[s : s + 1],
            jnp.where(take, sel_uid, 0),
        )
        slot_uid_new.append(su)
        avail = avail & ~(onehot & take)

    def pick_f32(onehot, field):
        return jnp.sum(jnp.where(onehot, field, 0.0), axis=0, keepdims=True)

    def pick_i32(onehot, field):
        return jnp.sum(jnp.where(onehot, field, 0), axis=0, keepdims=True)

    slot_p, slot_pw, slot_fi, slot_v, slot_u = [], [], [], [], []
    for s in range(n_slots):
        sv = slot_uid_new[s] > 0
        slot_v.append(sv)
        slot_u.append(slot_uid_new[s])
        slot_p.append(jnp.where(sv, pick_f32(rowsel[s], period), 0.0))
        slot_pw.append(jnp.where(sv, pick_f32(rowsel[s], power), 0.0))
        slot_fi.append(jnp.where(sv, pick_i32(rowsel[s], fft_index), 0))

    # ---- leakage detection per slot ----
    active_now = alive & seen
    lact_in = st_lact[:]                 # [S, B]
    luid_in = st_luid[:]
    lbars_in = st_lbars[:]

    la_out, lu_out, lp_out, lpw_out, lfi_out, lb_out = [], [], [], [], [], []
    lact_new, luid_new, lbars_new = [], [], []
    for s in range(n_slots):
        is_leak = (
            active_now
            & slot_v[s]
            & (period < slot_p[s] * leak_pr)
            & (power >= slot_pw[s] * leak_wr)
            & (bars_inactive <= leak_min)
            & (uid != slot_u[s])
        )
        score = jnp.where(is_leak, power, -1.0)
        top = jnp.max(score, axis=0, keepdims=True)            # [1, B]
        sel_uid = jnp.min(
            jnp.where(score >= top, uid, imax), axis=0, keepdims=True
        )
        onehot = (score >= top) & (uid == sel_uid)
        found = top > 0.0

        was_act = lact_in[s : s + 1] != 0
        bars = jnp.where(was_act, lbars_in[s : s + 1] + 1, 0)
        expired = was_act & (bars > leak_max)
        was = was_act & ~expired
        same = was & found & (luid_in[s : s + 1] == sel_uid)
        switched = found & ~same
        bars = jnp.where(same, bars, jnp.where(switched, 1, 0))

        lact_new.append(found.astype(jnp.int32))
        luid_new.append(jnp.where(found, sel_uid, 0))
        lbars_new.append(bars)

        la_out.append(found.astype(jnp.int32))
        lu_out.append(jnp.where(found, sel_uid, 0))
        lp_out.append(jnp.where(found, pick_f32(onehot, period), 0.0))
        lpw_out.append(jnp.where(found, pick_f32(onehot, power), 0.0))
        lfi_out.append(jnp.where(found, pick_i32(onehot, fft_index), 0))
        lb_out.append(jnp.where(found, bars, 0))

    # ---- persist state ----
    st_p[:] = period
    st_pw[:] = power
    st_fi[:] = fft_index
    st_alive[:] = alive.astype(jnp.int32)
    st_bi[:] = bars_inactive
    st_uid[:] = uid
    st_next[:] = next_uid
    st_slot[:] = jnp.concatenate(slot_uid_new, axis=0)
    st_lact[:] = jnp.concatenate(lact_new, axis=0)
    st_luid[:] = jnp.concatenate(luid_new, axis=0)
    st_lbars[:] = jnp.concatenate(lbars_new, axis=0)

    # ---- final state mirror (drop-in parity with the XLA scan's carry;
    # the same block is revisited every step, so the last frame's write
    # is what lands in HBM) ----
    fs_p[:] = period
    fs_pw[:] = power
    fs_fi[:] = fft_index
    fs_alive[:] = alive.astype(jnp.int32)
    fs_seen[:] = seen.astype(jnp.int32)
    fs_bi[:] = bars_inactive
    fs_uid[:] = uid
    fs_next[:] = next_uid
    fs_slot[:] = jnp.concatenate(slot_uid_new, axis=0)
    fs_lact[:] = jnp.concatenate(lact_new, axis=0)
    fs_luid[:] = jnp.concatenate(luid_new, axis=0)
    fs_lbars[:] = jnp.concatenate(lbars_new, axis=0)

    # ---- per-frame outputs ----
    sp_ref[0] = jnp.concatenate(slot_p, axis=0)
    spw_ref[0] = jnp.concatenate(slot_pw, axis=0)
    sfi_ref[0] = jnp.concatenate(slot_fi, axis=0)
    sv_ref[0] = jnp.concatenate(
        [v.astype(jnp.int32) for v in slot_v], axis=0
    )
    su_ref[0] = jnp.concatenate(slot_u, axis=0)
    la_ref[0] = jnp.concatenate(la_out, axis=0)
    lu_ref[0] = jnp.concatenate(lu_out, axis=0)
    lp_ref[0] = jnp.concatenate(lp_out, axis=0)
    lpw_ref[0] = jnp.concatenate(lpw_out, axis=0)
    lfi_ref[0] = jnp.concatenate(lfi_out, axis=0)
    lb_ref[0] = jnp.concatenate(lb_out, axis=0)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def track_frames_pallas(
    cand_periods: jax.Array,   # [..., T, J] f32
    cand_powers: jax.Array,    # [..., T, J] f32
    cand_fft_idx: jax.Array,   # [..., T, J] i32
    cand_valid: jax.Array,     # [..., T, J] bool
    cfg,
    interpret: bool = False,
):
    """Batched tracker scan in one Pallas launch.

    Leading dims are the symbol batch (flattened onto the VPU lanes —
    NOT vmapped pallas). Returns (slot outputs dict of [..., T, S]
    arrays, final-state dict) matching `trackers.track_frames`'s output
    dict field-for-field (the TrackerState carry itself stays internal;
    callers that need it use the XLA path).
    """
    lead = cand_periods.shape[:-2]
    t_frames, j_cand = cand_periods.shape[-2:]
    c, s = cfg.capacity, cfg.n_slots

    def to_lanes(a, dt):
        x = a.astype(dt).reshape(-1, t_frames, j_cand)
        x = jnp.moveaxis(x, 0, -1)                       # [T, J, B]
        b = x.shape[-1]
        b_pad = -(-b // LANES) * LANES
        if b_pad != b:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, b_pad - b)))
        return x

    cp = to_lanes(cand_periods, jnp.float32)
    cw = to_lanes(cand_powers, jnp.float32)
    cf = to_lanes(cand_fft_idx, jnp.int32)
    cv = to_lanes(cand_valid, jnp.int32)
    b_pad = cp.shape[-1]
    b = max(1, int(np_prod(lead)))

    grid = (b_pad // LANES, t_frames)
    in_spec = pl.BlockSpec((1, j_cand, LANES), lambda i, t: (t, 0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, s, LANES), lambda i, t: (t, 0, i),
                            memory_space=pltpu.VMEM)
    # Final-state outputs revisit the same block for every t of a batch
    # tile — only the last frame's write survives, which IS the final
    # state.
    c_spec = pl.BlockSpec((c, LANES), lambda i, t: (0, i),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((s, LANES), lambda i, t: (0, i),
                          memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((1, LANES), lambda i, t: (0, i),
                            memory_space=pltpu.VMEM)

    kernel = partial(
        _kernel, j_cand=j_cand, capacity=c, n_slots=s,
        tol=float(cfg.tolerance_pct), max_inactive=int(cfg.max_inactive),
        leak_pr=float(cfg.leak_period_ratio),
        leak_wr=float(cfg.leak_power_ratio),
        leak_min=int(cfg.leak_min_bars), leak_max=int(cfg.leak_max_bars),
    )
    f32o = lambda: out_struct((t_frames, s, b_pad), jnp.float32, cp)
    i32o = lambda: out_struct((t_frames, s, b_pad), jnp.int32, cp)
    fso = lambda shp, dt: out_struct(shp, dt, cp)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=[out_spec] * 11
        + [c_spec] * 7 + [one_spec] + [s_spec] * 4,
        out_shape=[
            f32o(), f32o(), i32o(), i32o(), i32o(),   # slot p/pw/fi/valid/uid
            i32o(), i32o(), f32o(), f32o(), i32o(), i32o(),  # leak fields
            fso((c, b_pad), jnp.float32),   # state period
            fso((c, b_pad), jnp.float32),   # state power
            fso((c, b_pad), jnp.int32),     # state fft_index
            fso((c, b_pad), jnp.int32),     # state alive
            fso((c, b_pad), jnp.int32),     # state seen_now
            fso((c, b_pad), jnp.int32),     # state bars_inactive
            fso((c, b_pad), jnp.int32),     # state uid
            fso((1, b_pad), jnp.int32),     # state next_uid
            fso((s, b_pad), jnp.int32),     # state slot_uid
            fso((s, b_pad), jnp.int32),     # state leak_active
            fso((s, b_pad), jnp.int32),     # state leak_uid
            fso((s, b_pad), jnp.int32),     # state leak_bars
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
    )(cp, cw, cf, cv)

    def back(x, dt=None):
        y = jnp.moveaxis(x[..., :b], -1, 0)        # [B, T, S]
        y = y.reshape(*lead, t_frames, s)
        return y if dt is None else y.astype(dt)

    def back_state(x, dt=None, scalar=False):
        y = jnp.moveaxis(x[..., :b], -1, 0)        # [B, rows]
        y = y.reshape(*lead, x.shape[0]) if not scalar else \
            y.reshape(*lead)
        return y if dt is None else y.astype(dt)

    (sp, spw, sfi, sv, su, la, lu, lp, lpw, lfi, lb,
     fp, fpw, ffi, fal, fse, fbi, fuid, fnext, fslot, flact, fluid,
     flbars) = outs
    from wavespec_tpu.analyze.trackers import TrackerState

    state = TrackerState(
        period=back_state(fp),
        fft_index=back_state(ffi),
        power=back_state(fpw),
        alive=back_state(fal, bool),
        seen_now=back_state(fse, bool),
        bars_inactive=back_state(fbi),
        uid=back_state(fuid),
        next_uid=back_state(fnext[0:1], scalar=True),
        slot_uid=back_state(fslot),
        leak_active=back_state(flact, bool),
        leak_uid=back_state(fluid),
        leak_bars=back_state(flbars),
    )
    outs_dict = {
        "slot_period": back(sp),
        "slot_power": back(spw),
        "slot_fft_index": back(sfi),
        "slot_valid": back(sv, bool),
        "slot_uid": back(su),
        "leak_active": back(la, bool),
        "leak_uid": back(lu),
        "leak_period": back(lp),
        "leak_power": back(lpw),
        "leak_fft_index": back(lfi),
        "leak_bars": back(lb),
    }
    return outs_dict, state


def np_prod(t):
    out = 1
    for v in t:
        out *= int(v)
    return out
