"""Single-launch MUSIC candidate selection (peaks -> ridge -> prerank).

The post-pseudospectrum half of `analyze.music.music_candidates` is a
chain of ~100 small ops per batch — greedy per-band local-maxima rounds
(k sequential argmax/mask passes), the ridge-seed top-k, duplicate
masking, the band-power parabola pre-rank and the packed keep-gather.
Chip profiling (benchmarks/profile_music.py) shows the whole chain is
dispatch/sequencing latency, not arithmetic: ~0.6-0.8 ms of the 1.8 ms
flagship batch at 512 windows while touching only [B, G~1.7k] floats.
Exactly the failure mode `kernels.jacobi_pallas` / `tracker_pallas`
removed for eigh and the tracker scan.

This kernel runs ALL of it in ONE Pallas program: a tile of windows
rides the sublanes, the merged pseudospectrum grid / FFT band rides the
lanes, and every greedy round, gather and top-k is an unrolled
in-register loop (argmax = max + min-index-of-max; gather = one-hot
multiply-reduce, the same trick as `ops.gather`). Op-for-op the math is
kept identical to the XLA stage (`music.py` peaks/ridge/prerank) so the
two paths agree bitwise; parity is pinned by
tests/test_music_select_pallas.py in interpret mode.

Routing: `music_candidates` uses this kernel on non-CPU backends (the
XLA stage remains the CPU/test path and the `upto="peaks"/"ridge"`
profiling stops). Reference semantics: candidate band scan
`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:3505-3516`, method blend
`WaveSpecZZ_1.1.0-gpuopt.mq5:49-51` (the closed DLL's extractor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavespec_tpu.kernels.fused_dft import out_struct

LANES = 128
BIG = 1e30
WT = 32  # windows per grid step (sublane tile)


def _pad128(w: int) -> int:
    return -(-w // LANES) * LANES


def _kernel(
    *refs,
    r: int, k: int, keep: int, n: int,
    g_real: tuple, offs: tuple, kb_real: int, k_min: int,
    grid_step: float, ridge_step: float,
):
    ps = refs[0:r]                    # per-band pseudo [WT, Gbp]
    bp_ref = refs[r]                  # band power [WT, KbP]
    fr = refs[r + 1 : 2 * r + 1]      # per-band freqs [1, Gbp]
    co = refs[2 * r + 1 : 3 * r + 1]  # per-band core mask [1, Gbp] i32
    b2g_ref = refs[3 * r + 1]         # bin -> merged gidx [1, KbP] i32
    freq_o, valid_o, gidx_o, vals_o, step_o = refs[3 * r + 2 : 3 * r + 7]

    excl = 1.0 / n
    tol = 0.5 / n
    c_count = r * k + k

    freq_cols, vals_cols, gidx_cols, valid_cols = [], [], [], []

    # ---- per-band greedy top-k local maxima (`_topk_local_maxima_bands`
    # semantics: strict-vs-right / >=-vs-left, core-only, +/-excl
    # frequency exclusion, first-index argmax) ----
    for b in range(r):
        psb = ps[b][:]
        frb = jnp.broadcast_to(fr[b][:], psb.shape)
        cob = jnp.broadcast_to(co[b][:], psb.shape) != 0
        left = jnp.concatenate([psb[:, :1], psb[:, :-1]], axis=1)
        right = jnp.concatenate([psb[:, 1:], psb[:, -1:]], axis=1)
        masked = jnp.where((psb >= left) & (psb > right) & cob, psb, 0.0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, psb.shape, 1)
        for _ in range(k):
            v = jnp.max(masked, axis=1, keepdims=True)          # [WT, 1]
            idx = jnp.min(
                jnp.where(masked == v, lanes, psb.shape[1]),
                axis=1, keepdims=True,
            )
            onehot = lanes == idx
            f_pick = jnp.sum(jnp.where(onehot, frb, 0.0), axis=1,
                             keepdims=True)
            vals_cols.append(v)
            freq_cols.append(f_pick)
            gidx_cols.append(idx + offs[b])
            valid_cols.append((v > 0).astype(jnp.int32))
            masked = jnp.where(jnp.abs(frb - f_pick) > excl, masked, 0.0)

    # ---- ridge seeds: top-k FFT band-power bins (stable greedy = XLA
    # top_k tie order), freq/gidx/vals derived like the XLA stage ----
    bp = bp_ref[:]                                              # [WT, KbP]
    lanesb = jax.lax.broadcasted_iota(jnp.int32, bp.shape, 1)
    b2g = jnp.broadcast_to(b2g_ref[:], bp.shape)
    masked_bp = bp
    for _ in range(k):
        v = jnp.max(masked_bp, axis=1, keepdims=True)
        idx = jnp.min(
            jnp.where(masked_bp == v, lanesb, bp.shape[1]),
            axis=1, keepdims=True,
        )
        onehot = lanesb == idx
        masked_bp = jnp.where(onehot, -BIG, masked_bp)
        rfreq = (idx + k_min).astype(jnp.float32) / n
        rgidx = jnp.sum(jnp.where(onehot, b2g, 0), axis=1, keepdims=True)
        # pseudo value at the merged grid index, read from the band rows
        rval = None
        for b in range(r):
            local = rgidx - offs[b]
            inb = (rgidx >= offs[b]) & (rgidx < offs[b] + g_real[b])
            lanesg = jax.lax.broadcasted_iota(jnp.int32, ps[b].shape, 1)
            hit = (lanesg == local) & inb
            pick = jnp.sum(jnp.where(hit, ps[b][:], 0.0), axis=1,
                           keepdims=True)
            rval = pick if rval is None else rval + pick
        freq_cols.append(rfreq)
        vals_cols.append(rval)
        gidx_cols.append(rgidx)
        valid_cols.append((v > 0).astype(jnp.int32))

    f = jnp.concatenate(freq_cols, axis=1)                      # [WT, C]
    vals = jnp.concatenate(vals_cols, axis=1)
    gidx = jnp.concatenate(gidx_cols, axis=1)
    valid = jnp.concatenate(valid_cols, axis=1)                 # i32 0/1

    # ---- dedupe vs earlier valid candidates (`_dedupe_mask`) ----
    lanes_c = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
    dedup_cols = [valid[:, :1]]
    for i in range(1, c_count):
        fi = f[:, i : i + 1]
        dup = jnp.max(
            jnp.where(
                (jnp.abs(f - fi) < tol) & (valid != 0) & (lanes_c < i),
                1, 0,
            ),
            axis=1, keepdims=True,
        )
        dedup_cols.append(valid[:, i : i + 1] * (1 - dup))
    valid = jnp.concatenate(dedup_cols, axis=1)

    # ---- pre-rank key: parabola-interpolated FFT band power at each
    # candidate's nearest bin (edge-padded band power, one one-hot with
    # two shifted reads) ----
    bp_real = bp[:, :kb_real]
    padbp = jnp.concatenate(
        [bp_real[:, :1], bp_real, bp_real[:, -1:]], axis=1
    )                                                           # [WT, Kb+2]
    pb0 = padbp[:, :-2]
    pb1 = padbp[:, 1:-1]
    pb2 = padbp[:, 2:]
    lanes_k = jax.lax.broadcasted_iota(jnp.int32, pb0.shape, 1)
    k0 = jnp.clip(
        jnp.round(f * n).astype(jnp.int32) - k_min, 0, kb_real - 1
    )
    pm_cols, p0_cols, pp_cols = [], [], []
    for i in range(c_count):
        oh = lanes_k == k0[:, i : i + 1]
        pm_cols.append(jnp.sum(jnp.where(oh, pb0, 0.0), axis=1,
                               keepdims=True))
        p0_cols.append(jnp.sum(jnp.where(oh, pb1, 0.0), axis=1,
                               keepdims=True))
        pp_cols.append(jnp.sum(jnp.where(oh, pb2, 0.0), axis=1,
                               keepdims=True))
    pm = jnp.concatenate(pm_cols, axis=1)
    p0 = jnp.concatenate(p0_cols, axis=1)
    pp = jnp.concatenate(pp_cols, axis=1)
    denom = pm - 2.0 * p0 + pp
    shift = jnp.clip(
        (pm - pp) / jnp.where(jnp.abs(denom) > 1e-30, 2.0 * denom, 1e-30),
        -1.0, 1.0,
    )
    pgram0 = p0 + 0.5 * (pp - pm) * shift + 0.5 * denom * shift * shift
    pre_key = jnp.where(valid != 0, pgram0, -1.0)

    # per-candidate refine step (subspace fine step, ridge half-bin)
    step0 = jnp.where(
        lanes_c < c_count - k,
        jnp.float32(grid_step), jnp.float32(ridge_step),
    )

    # ---- keep the strongest `keep` (stable greedy top-k + packed
    # one-hot gather of all five fields) ----
    of, ov, og, ol, os = [], [], [], [], []
    masked_key = pre_key
    for _ in range(keep):
        v = jnp.max(masked_key, axis=1, keepdims=True)
        idx = jnp.min(
            jnp.where(masked_key == v, lanes_c, c_count),
            axis=1, keepdims=True,
        )
        oh = lanes_c == idx
        masked_key = jnp.where(oh, -BIG, masked_key)
        ohf = oh.astype(jnp.float32)
        of.append(jnp.sum(jnp.where(oh, f, 0.0), axis=1, keepdims=True))
        ov.append(jnp.sum(jnp.where(oh, valid, 0), axis=1, keepdims=True))
        og.append(jnp.sum(jnp.where(oh, gidx, 0), axis=1, keepdims=True))
        ol.append(jnp.sum(jnp.where(oh, vals, 0.0), axis=1, keepdims=True))
        os.append(jnp.sum(ohf * step0, axis=1, keepdims=True))

    zf = jnp.zeros((f.shape[0], LANES - keep), jnp.float32)
    zi = jnp.zeros((f.shape[0], LANES - keep), jnp.int32)
    freq_o[:] = jnp.concatenate(of + [zf], axis=1)
    valid_o[:] = jnp.concatenate(ov + [zi], axis=1)
    gidx_o[:] = jnp.concatenate(og + [zi], axis=1)
    vals_o[:] = jnp.concatenate(ol + [zf], axis=1)
    step_o[:] = jnp.concatenate(os + [zf], axis=1)


def select_candidates_pallas(
    pseudo: jax.Array,       # [..., G] merged pseudospectrum
    band_power: jax.Array,   # [..., Kb] FFT band power (k_min..k_max)
    cfg,
    interpret: bool = False,
):
    """Fused peaks+ridge+prerank. Returns dict(freq, valid, gidx, vals,
    step0), each ``[..., keep]`` — drop-in for the XLA stage chain in
    `music_candidates` (bitwise parity pinned in interpret mode)."""
    from wavespec_tpu.analyze.music import (
        _band_plan, _bin_to_gidx_table, _freq_grid_band_np,
    )
    from wavespec_tpu.ops.spectrum import band_indices

    n = cfg.window
    k = cfg.top_k
    bands = _band_plan(cfg)
    r = len(bands)
    c_count = r * k + k
    keep = min(2 * k, c_count)
    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    kb_real = k_max - k_min + 1
    if band_power.shape[-1] != kb_real:
        raise ValueError(
            f"band_power width {band_power.shape[-1]} != band bins {kb_real}"
        )
    if keep > LANES or c_count > LANES:
        raise ValueError("candidate count exceeds one lane tile")

    lead = pseudo.shape[:-1]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1
    b_pad = -(-max(b, 1) // WT) * WT

    # Static per-band tables (numpy, baked into the jaxpr as constants).
    fr_np, co_np, g_real, offs = [], [], [], []
    start = 0
    for (lo, hi, _d) in bands:
        fb, cb = _freq_grid_band_np(cfg, lo, hi)
        g = len(fb)
        gp = _pad128(g)
        fr_np.append(np.pad(fb.astype(np.float32), (0, gp - g),
                            constant_values=-1.0)[None, :])
        co_np.append(np.pad(cb.astype(np.int32), (0, gp - g))[None, :])
        g_real.append(g)
        offs.append(start)
        start += g
    kb_pad = _pad128(kb_real)
    b2g_np = np.pad(
        _bin_to_gidx_table(cfg, k_min, k_max).astype(np.int32),
        (0, kb_pad - kb_real),
    )[None, :]

    def flat_pad(x, width, width_pad, pad_value, edge=False):
        y = x.reshape(-1, width).astype(x.dtype)
        if b_pad != y.shape[0]:
            y = jnp.pad(y, ((0, b_pad - y.shape[0]), (0, 0)))
        if width_pad != width:
            if edge:
                y = jnp.pad(y, ((0, 0), (0, width_pad - width)), mode="edge")
            else:
                y = jnp.pad(y, ((0, 0), (0, width_pad - width)),
                            constant_values=pad_value)
        return y

    # Per-band pseudo slices, edge-padded (matches the XLA stage's
    # mode="edge" g_max pad: the pad region has core=False so it can
    # never produce a pick, and the last real point never beats its
    # duplicated neighbor).
    ps_in = []
    for bi, (s0g, g) in enumerate(zip(offs, g_real)):
        ps_in.append(
            flat_pad(pseudo[..., s0g : s0g + g], g, _pad128(g), 0.0,
                     edge=True)
        )
    bp_in = flat_pad(band_power, kb_real, kb_pad, -1.0)

    grid = (b_pad // WT,)
    data_spec = lambda w: pl.BlockSpec((WT, w), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    const_spec = lambda w: pl.BlockSpec((1, w), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((WT, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    from wavespec_tpu.utils.vma import pvary_like

    consts = pvary_like([jnp.asarray(c) for c in (*fr_np, *co_np, b2g_np)],
                        pseudo)
    fr_in, co_in, b2g_in = consts[:r], consts[r : 2 * r], consts[2 * r]

    kernel = partial(
        _kernel, r=r, k=k, keep=keep, n=n,
        g_real=tuple(g_real), offs=tuple(offs), kb_real=kb_real,
        k_min=k_min,
        grid_step=1.0 / (cfg.music_grid_per_bin * n),
        ridge_step=0.5 / n,
    )
    f32o = out_struct((b_pad, LANES), jnp.float32, ps_in[0])
    i32o = out_struct((b_pad, LANES), jnp.int32, ps_in[0])
    freq, valid, gidx, vals, step0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[data_spec(x.shape[1]) for x in ps_in]
        + [data_spec(kb_pad)]
        + [const_spec(x.shape[1]) for x in fr_in]
        + [const_spec(x.shape[1]) for x in co_in]
        + [const_spec(kb_pad)],
        out_specs=[out_spec] * 5,
        out_shape=[f32o, i32o, i32o, f32o, f32o],
        interpret=interpret,
    )(*ps_in, bp_in, *fr_in, *co_in, b2g_in)

    def back(x):
        return x[:b, :keep].reshape(*lead, keep)

    return {
        "freq": back(freq),
        "valid": back(valid) != 0,
        "gidx": back(gidx),
        "vals": back(vals),
        "step0": back(step0),
    }
