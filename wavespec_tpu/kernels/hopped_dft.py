"""Overlap-shared band DFT for rolling-STFT windows ("hopped DFT").

The ridge batch workload (`gpu_submit_extract_cycles_batch`,
`Include/imports.mqh:15-17`) computes the SAME band-limited DFT over
windows that overlap by window/hop (256x at the flagship hop=16) — and
the chip-measured cost of that path was never the DFT math but the
materialization of the [nwin, n] window matrix (hop-wide block minors,
~256x HBM duplication: benchmarks/profile_ridge.py measured the framing
at more than the whole fused-DFT pipeline).

This module computes the same spectra with NO window materialization and
~window/hop fewer FLOPs by sharing per-row partial transforms across
overlapping windows. Decompose the series into 128-sample rows
``s2d[q, j] = series[128 q + j]`` and write a window start as
``w*hop = 128*q0 + phi`` (phi = lane phase). With n = 128 R:

    X_w[k] = T_phi[k] * (  Lo_phi[k] . s2d[q0]            (partial row)
                         + sum_{r=1}^{R-1} W[r,k] G[q0+r, k]  (full rows)
                         + Hi_phi[k] . s2d[q0+R] )         (partial row)

    G[q, k]   = sum_j s2d[q, j] e^{-2 pi i j k / n}   (shared by ALL
                windows that contain row q — computed ONCE)
    W[r, k]   = e^{-2 pi i 128 r k / n}
    T_phi[k]  = e^{+2 pi i phi k / n}
    Lo/Hi_phi = the j >= phi / j < phi halves of the G basis (the two
                boundary rows are the only per-phase work)

Only ``P = 128 / gcd(hop, 128)`` distinct phases exist, so the
boundary-row transforms batch into one [P, 128, K] einsum; the full-row
sum is R-1 static shifted FMAs over the shared G. Every term touches
ONLY in-window samples (the Hi boundary has its own masked basis rather
than a G - Lo subtraction) and every dot runs in FIXED-shape row chunks
(XLA dot emitters otherwise change per-row rounding with the M
dimension), so appending bars to the series cannot perturb earlier
windows' spectra even at the bit level — the no-repaint invariant
(`Legacy/WaveSpecZZ_1.0.2.mq5:15-17`) holds bitwise at the spectrum
level. (The downstream attr tail is gated at float-noise tolerance
instead: CPU XLA's fusion-dependent FMA contraction can shift
noise-floor fields ~1 ulp between batch shapes.)

Cost at the flagship headline shape (window 4096, hop 16, 4096 windows,
230 bins): ~70 MFLOP total vs ~17 GFLOP for per-window DFTs — the
band extraction becomes O(series_length) instead of O(nwin * window).
Pure XLA (einsums + static slices): runs on every backend, shard_map
vma-safe, no Pallas compile wait.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST
LANES = 128


def hopped_eligible(window: int, hop: int) -> bool:
    """True when the overlap-shared formulation applies: the window must
    split into 128-sample rows and the lane-phase count P must stay small
    (P masked boundary bases; P > 16 would make the boundary work rival
    the shared-row savings — hop=1 online serving keeps the framed path)."""
    if window % LANES or window // LANES < 2:
        return False
    p = LANES // math.gcd(hop, LANES)
    return p <= 16


def _combine_factors(r_rows: int, smax: int = 8) -> tuple[int, ...]:
    """Factor the full-row count into per-level radices ≤ `smax`.

    Greedy largest-divisor-first so the stride grows fastest (later
    levels then run on the shortest arrays). A prime remainder > smax
    becomes its own (final) level.
    """
    fs: list[int] = []
    r = r_rows
    while r > smax:
        for f in range(smax, 1, -1):
            if r % f == 0:
                fs.append(f)
                r //= f
                break
        else:  # prime remainder
            break
    fs.append(r)
    return tuple(fs)


@lru_cache(maxsize=32)
def _plan(window: int, hop: int, k_bins: int):
    """Constant tables (numpy, trace-time)."""
    n = window
    r_rows = n // LANES
    g = math.gcd(hop, LANES)
    p_count = LANES // g
    step_q = hop * p_count // LANES
    phis = [(hop * j) % LANES for j in range(p_count)]
    bases = [(hop * j) // LANES for j in range(p_count)]

    k = np.arange(k_bins)
    j = np.arange(LANES)
    e = np.exp(-2j * np.pi * np.outer(j, k) / n)          # [128, K]
    w = np.exp(-2j * np.pi * LANES * np.outer(np.arange(1, r_rows), k) / n)
    t = np.exp(+2j * np.pi * np.outer(np.asarray(phis), k) / n)   # [P, K]
    lo = np.where(j[None, :, None] >= np.asarray(phis)[:, None, None],
                  e[None, :, :], 0.0)                      # [P, 128, K]
    hi = np.where(j[None, :, None] < np.asarray(phis)[:, None, None],
                  e[None, :, :], 0.0)

    f32 = lambda a: a.astype(np.float32)
    return (
        r_rows, p_count, step_q, tuple(bases),
        f32(e.real), f32(e.imag),
        f32(w.real), f32(w.imag),
        f32(t.real), f32(t.imag),
        f32(lo.real), f32(lo.imag),
        f32(hi.real), f32(hi.imag),
    )


@partial(jax.jit, static_argnames=("window", "hop", "max_bins"))
def rfft_band_hopped(
    series: jax.Array, window: int, hop: int, max_bins: int
) -> jax.Array:
    """Band-limited rFFT of every rolling window of `series`.

    series [..., L] real; returns complex64 [..., nwin, K] with
    ``nwin = 1 + (L - window) // hop`` and ``K = min(max_bins, window//2)``
    — a drop-in for ``rfft_mxu(frame_series(series, window, hop),
    max_bins)[..., :K]`` without ever materializing the frames.
    Requires `hopped_eligible(window, hop)`.
    """
    if not hopped_eligible(window, hop):
        raise ValueError(f"hopped DFT ineligible for window={window} hop={hop}")
    length = series.shape[-1]
    nwin = 1 + (length - window) // hop
    k_bins = min(max_bins, window // 2)
    (r_rows, p_count, step_q, bases, er, ei, wr, wi, tr, ti,
     lor, loi, hir, hii) = _plan(window, hop, k_bins)

    lead = series.shape[:-1]
    x = series.reshape(-1, length).astype(jnp.float32)

    n_i = -(-nwin // p_count)                 # windows per phase (padded)
    q_need = max(bases) + (n_i - 1) * step_q + r_rows + 1
    pad = q_need * LANES - length
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    s2d = x[:, : q_need * LANES].reshape(-1, q_need, LANES)

    # FIXED-SHAPE chunked dots: XLA's dot emitters change per-ROW rounding
    # when the M dimension crosses size thresholds (measured on CPU:
    # identical rows differ by ~1 ulp between M=32 and M=64 programs), so
    # one length-dependent [Q, 128] @ [128, K] would let appending bars
    # perturb earlier windows and break the bitwise no-repaint invariant.
    # Chunking at fixed absolute row indices gives every row an
    # append-invariant dot shape and in-chunk position.
    def row_dot(rows, basis, chunk=LANES):
        nq = rows.shape[-2]
        nc = -(-nq // chunk)
        if nc * chunk != nq:
            widths = [(0, 0)] * (rows.ndim - 2) + [(0, nc * chunk - nq), (0, 0)]
            rows = jnp.pad(rows, widths)
        outs = [
            jnp.einsum("...qj,jk->...qk",
                       rows[..., c * chunk : (c + 1) * chunk, :], basis,
                       precision=HIGHEST)
            for c in range(nc)
        ]
        return jnp.concatenate(outs, axis=-2)[..., :nq, :]

    # Shared per-row transforms G[q, k] — each row computed once, reused
    # by every window containing it.
    gr = row_dot(s2d, jnp.asarray(er))
    gi = row_dot(s2d, jnp.asarray(ei))

    # Full-row sum C[m, k] = sum_{r=1}^{R-1} W[r] G[m+r]: static shifted
    # complex FMAs (row-independent -> append-invariant). A single
    # (R-1)-term chain exceeds XLA's fusion operand limit once R grows
    # past ~32, and the unfused chain runs at HBM bandwidth (chip: the
    # window-16384 R=128 chain was ~0.3 ms of a 0.76 ms/window MUSIC
    # budget). For large R the sum is evaluated instead as a multi-level
    # radix split over the row digits r = sum_l a_l*T_l (a Cooley-Tukey
    # DFT over the row axis, T_l = prod of earlier radices):
    #     E_{l+1}[p] = sum_a W[a*T_l] E_l[p + a*T_l]
    # so each level is a <=8-term fused elementwise pass, log depth, and
    # the r=0 exclusion becomes one exact subtraction C = E_final - G.
    # Small R keeps the original single chain (bit-identical to r4).
    m_count = max(bases) + (n_i - 1) * step_q + 1
    if r_rows - 1 <= 32:
        cr = jnp.zeros_like(gr[:, :m_count])
        ci = jnp.zeros_like(cr)
        for r in range(1, r_rows):
            gsr = gr[:, r : r + m_count]
            gsi = gi[:, r : r + m_count]
            wrr = wr[r - 1][None, None, :]
            wir = wi[r - 1][None, None, :]
            cr = cr + (wrr * gsr - wir * gsi)
            ci = ci + (wrr * gsi + wir * gsr)
    else:
        sum_r = gr[:, : m_count + r_rows - 1]
        sum_i = gi[:, : m_count + r_rows - 1]
        t_stride = 1
        for s_fac in _combine_factors(r_rows):
            new_len = sum_r.shape[1] - (s_fac - 1) * t_stride
            ar = jax.lax.slice_in_dim(sum_r, 0, new_len, axis=1)
            ai = jax.lax.slice_in_dim(sum_i, 0, new_len, axis=1)
            for a in range(1, s_fac):
                off = a * t_stride
                sr = jax.lax.slice_in_dim(sum_r, off, off + new_len, axis=1)
                si = jax.lax.slice_in_dim(sum_i, off, off + new_len, axis=1)
                wrr = wr[off - 1][None, None, :]
                wir = wi[off - 1][None, None, :]
                ar = ar + (wrr * sr - wir * si)
                ai = ai + (wrr * si + wir * sr)
            sum_r, sum_i = ar, ai
            t_stride *= s_fac
        cr = sum_r[:, :m_count] - gr[:, :m_count]
        ci = sum_i[:, :m_count] - gi[:, :m_count]

    # Per-phase boundary rows (strided row slices, one per window).
    def stride_rows(a, start):
        end = start + (n_i - 1) * step_q + 1
        return a[:, start:end:step_q]

    s_lo = jnp.stack([stride_rows(s2d, b) for b in bases], axis=1)
    s_hi = jnp.stack([stride_rows(s2d, b + r_rows) for b in bases], axis=1)
    c_ph_r = jnp.stack([stride_rows(cr, b) for b in bases], axis=1)
    c_ph_i = jnp.stack([stride_rows(ci, b) for b in bases], axis=1)

    # Same fixed-shape chunking over the window axis as row_dot (the
    # boundary dot's M would otherwise scale with nwin).
    def phase_dot(rows, basis, chunk=LANES):
        ni = rows.shape[-2]
        nc = -(-ni // chunk)
        if nc * chunk != ni:
            widths = [(0, 0), (0, 0), (0, nc * chunk - ni), (0, 0)]
            rows = jnp.pad(rows, widths)
        outs = [
            jnp.einsum("bpij,pjk->bpik",
                       rows[:, :, c * chunk : (c + 1) * chunk, :], basis,
                       precision=HIGHEST)
            for c in range(nc)
        ]
        return jnp.concatenate(outs, axis=-2)[:, :, :ni, :]

    lo_r = phase_dot(s_lo, jnp.asarray(lor))
    lo_i = phase_dot(s_lo, jnp.asarray(loi))
    hi_r = phase_dot(s_hi, jnp.asarray(hir))
    hi_i = phase_dot(s_hi, jnp.asarray(hii))

    yr = lo_r + c_ph_r + hi_r
    yi = lo_i + c_ph_i + hi_i
    tpr = tr[None, :, None, :]
    tpi = ti[None, :, None, :]
    xr = tpr * yr - tpi * yi
    xi = tpr * yi + tpi * yr

    # (i, p) -> window w = i * P + p: phase is the fast axis.
    xr = jnp.swapaxes(xr, 1, 2).reshape(-1, n_i * p_count, k_bins)[:, :nwin]
    xi = jnp.swapaxes(xi, 1, 2).reshape(-1, n_i * p_count, k_bins)[:, :nwin]
    spec = jax.lax.complex(xr, xi)
    return spec.reshape(*lead, nwin, k_bins)
