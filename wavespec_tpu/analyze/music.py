"""MUSIC subspace dominant-cycle estimation (`gpu_extract_cycles` method=1).

The reference's MUSIC/ESPRIT implementation lives in the closed
`mt-bridge.dll`; only its interface is observable (`method=1`,
`ar_order`, and the stride-15 attribute fields — `1.1.0:49-51,1477-1490`,
SURVEY.md §2.2). This is a principled re-implementation, validated
property-wise (recovers planted sinusoids in the `ar_order=10, top_k=2`
"perfect cycles" regime noted in the reference CHANGELOG).

Pipeline (one jitted program, batched over windows):

1. Toeplitz autocovariance of order m=ar_order via lag matmuls.
2. Batched Jacobi eigh (wavespec_tpu.analyze.jacobi) -> signal/noise split:
   per sub-band signal dim p = 2*music_signals_per_band (a real sinusoid
   spans 2 complex exponentials; each band only needs to localize a couple
   of cycles, and a small p keeps a deep noise projector — the final
   ranking over all bands' candidates is by fitted power).
3. Noise-subspace pseudospectrum P(w) = 1 / ||a(w)^H E_n||^2 evaluated on a
   dense in-band frequency grid via the sum-of-lags identity — ONE real
   [G, m] @ [m, batch] matmul (`_pseudo_denominator_lags`).
4. Top-k local maxima of P -> cycle frequencies (super-resolution: the grid
   is `music_grid_per_bin` times finer than the FFT bin spacing).
5. Amplitude/phase per cycle by least-squares sinusoid fit to the window,
   solved matrix-free: sinusoid columns over N>=4096 samples are nearly
   orthogonal, so c = (2/N) H^T x plus two residual-refinement passes
   converges without a linear solver (no LAPACK lowering needed).
6. Attribute assembly shared with the FFT-ridge path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from wavespec_tpu.analyze.jacobi import jacobi_eigh
from wavespec_tpu.ops.gather import take_last, take_rows
from wavespec_tpu.ops.detrend import ehlers_highpass_detrend
from wavespec_tpu.ops.spectrum import band_indices

__all__ = ["music_extract", "music_hp_period", "music_pseudospectrum"]


def music_hp_period(cfg) -> int:
    """Cutoff period of the MUSIC preconditioning high-pass (bars)."""
    return min(int(2 * cfg.max_period), cfg.window // 2)


def _autocov_toeplitz(windows: jax.Array, m: int) -> jax.Array:
    """Symmetric Toeplitz autocovariance ``[..., m, m]`` from ``[..., n]``.

    r[lag] = (1/n) sum_t x[t] x[t+lag]; Toeplitz structure equals
    forward-backward averaging for a stationary estimate.
    """
    n = windows.shape[-1]
    x0 = windows
    lags = []
    for lag in range(m):
        prod = x0[..., : n - lag] * x0[..., lag:]
        lags.append(jnp.sum(prod, axis=-1) / (n - lag))
    r = jnp.stack(lags, axis=-1)  # [..., m]
    i = jnp.arange(m)
    toep_idx = jnp.abs(i[:, None] - i[None, :])  # [m, m]
    return r[..., toep_idx]


def _auto_decimation(cfg) -> int:
    """Decimation factor D for the subspace stage.

    Adjacent-tap covariance of order m cannot resolve periods >> m in
    float32: for a period P the steering vectors advance only 2*pi*m/P rad
    across the aperture, so distinct long periods become numerically
    collinear (4th eigenvalue underflows f32). Subsampling by D stretches
    the aperture to m*D bars. We target the geometric band center at ~m
    decimated samples/period while keeping min_period >= 2.2*D (above
    decimated Nyquist with margin):

        D = clip(round(sqrt(minP*maxP)/m), 1, floor(minP/2.2))

    The decimated series only feeds the covariance/pseudospectrum;
    amplitude and phase are always fit on the full-rate window.
    """
    if cfg.music_decimation:
        return int(cfg.music_decimation)
    import math

    gm = math.sqrt(cfg.min_period * cfg.max_period)
    d = max(1, round(gm / cfg.ar_order))
    d_max = max(1, int(cfg.min_period / 2.2))
    return max(1, min(d, d_max))


def _decimate_box(windows: jax.Array, d: int) -> jax.Array:
    """Box-prefiltered decimation by d (anti-alias + subsample in one
    reshape-mean — no convolution kernel needed)."""
    if d == 1:
        return windows
    n = windows.shape[-1]
    n_keep = (n // d) * d
    x = windows[..., n - n_keep :]
    return jnp.mean(x.reshape(*x.shape[:-1], n_keep // d, d), axis=-1)


def _band_plan(cfg) -> list[tuple[float, float, int]]:
    """Octave-style sub-band plan: (lo_period, hi_period, decimation).

    A single decimation cannot serve a wide band like [9, 200]: the
    aperture m*D must approach the longest period while min_period/D stays
    above decimated Nyquist. Splitting into ~3x-ratio sub-bands gives each
    its own aperture: D_b targets hi_b/m, clipped by lo_b/2.2.
    `music_bands` forces a count (1 = legacy single band); 0 = auto.
    """
    import math

    if cfg.music_bands == 1 or cfg.max_period <= cfg.min_period:
        return [(cfg.min_period, cfg.max_period, _auto_decimation(cfg))]
    ratio = cfg.max_period / cfg.min_period
    n_bands = cfg.music_bands or max(1, math.ceil(math.log(ratio) / math.log(3.0)))
    edges = [
        cfg.min_period * ratio ** (i / n_bands) for i in range(n_bands + 1)
    ]
    bands = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        if cfg.music_decimation:
            d = int(cfg.music_decimation)
        else:
            d = max(1, min(round(hi / cfg.ar_order), int(lo / 2.2)))
        bands.append((lo, hi, max(1, d)))
    return bands


def _freq_grid_band_np(cfg, lo: float, hi: float):
    """Host-side (NumPy) frequency grid for a sub-band plus a core mask.

    The grid extends one FFT bin beyond the band's core on each side
    (clipped to the FULL analysis band) so that every core frequency has
    genuine same-band neighbors for the local-maximum test; only core
    points may be picked — without this, per-band normalization
    discontinuities at the concatenation boundaries masquerade as peaks.
    """
    n = cfg.window
    g = cfg.music_grid_per_bin
    k_lo_full, k_hi_full = band_indices(n, cfg.min_period, cfg.max_period)
    k_min, k_max = band_indices(n, lo, hi)
    ext_min = max(k_lo_full, k_min - 1)
    ext_max = min(k_hi_full, k_max + 1)
    kg = ext_min + np.arange(max(1, (ext_max - ext_min) * g + 1)) / g
    core = (kg >= k_min) & (kg <= k_max)
    # never mask the full band's outermost edges
    core |= kg <= k_lo_full
    core |= kg >= k_hi_full
    return (kg / n).astype(np.float32), core


def _freq_grid_band(cfg, lo: float, hi: float):
    kg, core = _freq_grid_band_np(cfg, lo, hi)
    return jnp.asarray(kg), jnp.asarray(core)


def _bin_to_gidx_table(cfg, k_min_fb: int, k_max_fb: int) -> np.ndarray:
    """Static table: integer FFT bin k (offset by k_min_fb) -> nearest
    MERGED-grid index. The grid is a trace-time constant, so the whole
    nearest-point search collapses to one host-side argmin here and ONE
    device gather at runtime (ridge seeds are always integer bins; the
    general `_nearest_merged_idx` costs a per-band searchsorted chain in
    the latency path)."""
    parts = [_freq_grid_band_np(cfg, lo, hi)[0] for (lo, hi, _) in _band_plan(cfg)]
    k_vals = np.arange(k_min_fb, k_max_fb + 1, dtype=np.float64) / cfg.window
    # Nearest point via per-band searchsorted (each band's grid IS sorted
    # ascending; only the concatenation isn't): the dense [bins, grid]
    # argmin broadcast is ~27 GB of host f64 at window 262144 (29k bins x
    # 116k grid points) and minutes of trace time. Ties reproduce the
    # argmin's first-occurrence rule: within a band the earlier (lower)
    # neighbor wins, across bands the earlier band wins (strict <).
    best_d = np.full(k_vals.shape, np.inf)
    best_i = np.zeros(k_vals.shape, np.int32)
    off = 0
    for p in parts:
        pos = np.searchsorted(p, k_vals)
        lo_i = np.clip(pos - 1, 0, len(p) - 1)
        hi_i = np.clip(pos, 0, len(p) - 1)
        d_lo = np.abs(k_vals - p[lo_i])
        d_hi = np.abs(p[hi_i] - k_vals)
        idx_b = np.where(d_hi < d_lo, hi_i, lo_i)
        d_b = np.minimum(d_lo, d_hi)
        take = d_b < best_d
        best_d = np.where(take, d_b, best_d)
        best_i = np.where(take, (idx_b + off).astype(np.int32), best_i)
        off += len(p)
    return best_i


def band_precondition_windows(series: jax.Array, cfg, hop: int):
    """Per-band decimated covariance inputs built at SERIES level.

    The per-band preconditioning high-pass normally runs inside
    `music_pseudospectrum` on every (overlapping) decimated window; for
    the rolling-STFT batch path one scan over the unframed series per
    band replaces nwin scans (and the filter is warm at every window
    start). Equivalent cutoff: the in-window filter runs at the
    decimated rate with period ~1.5*hi/d, this one at the full rate with
    period ~1.5*hi. `series` should already carry the main MUSIC
    high-pass (the preconditioning cascade is main-hp then band-hp).

    Decimation ALSO happens at series level: framing the full-rate
    series and box-decimating every window ([..., R, nwin, n] — 25 MB at
    the flagship batch, and the largest single block of the MUSIC chip
    budget: 549 of 1557 us at 512 windows) is replaced by decimating the
    series once per box PHASE and framing the decimated series. A
    window's boxes start at w*hop + (n - n_keep), so only
    g = d / gcd(d, hop) distinct alignments exist; windows w = r (mod g)
    frame the phase-r decimated series at stride g*hop/d. Same samples,
    same per-box mean, framing is slices — bitwise equal to the framed
    path (`_band_precondition_windows_framed`, kept as the test oracle).

    Returns a tuple of per-band stacks [nwin, n_keep_b // d_b] matching
    `music_pseudospectrum`'s `band_windows` parameter.
    """
    import math

    from wavespec_tpu.extract import frame_series  # circular-safe
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu

    n = cfg.window
    bands = _band_plan(cfg)
    periods = tuple(max(4, int(1.5 * hi)) for (_, hi, _) in bands)
    # All R band filters as blocked MXU Toeplitz matmuls (the stacked
    # associative scan is launch-bound on the v5e: 212 us vs 5 us at the
    # flagship 37k-sample series; ~7e-6 relative agreement).
    hp_all = ehlers_highpass_detrend_mxu(series, periods)  # [..., R, L]
    ell = series.shape[-1]
    nwin = 1 + (ell - n) // hop
    outs = []
    for bi, (_, _, d) in enumerate(bands):
        hp_b = hp_all[..., bi, :]                            # [..., L]
        if d == 1:
            outs.append(frame_series(hp_b, n, hop))
            continue
        n_keep = (n // d) * d
        off = n - n_keep
        ld = n_keep // d
        g = d // math.gcd(d, hop)
        hop_d = g * hop // d
        nw_max = -(-nwin // g)
        # ALL g phases in one stacked slice + one reshape-mean + one
        # batched framing. The per-phase loop was launch-bound on the
        # v5e (~25 small ops per phase, 193 us of the 229 us pseudo
        # stage at the flagship shape — benchmarks/probe_pseudo.py);
        # phases beyond a window's reach produce junk rows that land at
        # interleaved indices >= nwin and are sliced off, so every KEPT
        # row sees the exact per-phase slices/means/frames of the loop
        # form — still bitwise equal to the framed oracle.
        need = ld + (nw_max - 1) * hop_d
        lmax = (g - 1) * hop + off + need * d
        pad_amt = max(0, lmax - hp_b.shape[-1])
        hp_p = hp_b
        if pad_amt:
            hp_p = jnp.pad(
                hp_b, [(0, 0)] * (hp_b.ndim - 1) + [(0, pad_amt)])
        stacked = jnp.stack(
            [
                jax.lax.slice_in_dim(
                    hp_p, r * hop + off, r * hop + off + need * d, axis=-1)
                for r in range(g)
            ],
            axis=-2,
        )                                            # [..., g, need*d]
        dec = jnp.mean(
            stacked.reshape(*stacked.shape[:-1], need, d), axis=-1)
        fr = frame_series(dec, ld, hop_d)            # [..., g, nw_max, ld]
        st = jnp.swapaxes(fr, -3, -2)                # [..., nw_max, g, ld]
        outs.append(st.reshape(
            *st.shape[:-3], nw_max * g, ld)[..., :nwin, :])
    return tuple(outs)


def _band_precondition_windows_framed(series: jax.Array, cfg, hop: int):
    """The frame-then-decimate formulation of `band_precondition_windows`
    (materializes [..., R, nwin, n]) — superseded on the hot path by the
    phase-decimated framing above, kept as its bitwise test oracle."""
    from wavespec_tpu.extract import frame_series  # circular-safe
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu

    bands = _band_plan(cfg)
    periods = tuple(max(4, int(1.5 * hi)) for (_, hi, _) in bands)
    hp_all = ehlers_highpass_detrend_mxu(series, periods)  # [..., R, L]
    w_all = frame_series(hp_all, cfg.window, hop)  # [..., R, nwin, n]
    outs = []
    for bi, (_, _, d) in enumerate(bands):
        outs.append(_decimate_box(w_all[..., bi, :, :], d))
    return tuple(outs)


def _pseudo_denominator_lags(vecs_b, w_b, freqs_b, m: int, d: int):
    """``||a(w)^H E_n||^2`` on the grid via the sum-of-lags identity.

    With a_j(w) = e^{i 2 pi w d j} and E the (possibly mask-weighted)
    noise eigenvector block, the denominator is a^H (E W E^H) a =
    g_0 + 2 sum_{lag>=1} g_lag cos(2 pi w d lag), where g_lag is the
    lag-diagonal sum of Q = E W E^H — computed directly as weighted
    column autocorrelations of E without forming Q. This removes the
    noise-vector dimension from the grid contraction entirely: ONE real
    [G, m] @ [m, ...batch] matmul replaces the cos/sin pair of
    [G, m] @ [m, ..., m-p] projections plus the |.|^2 reduction (12x
    fewer grid FLOPs at flagship m=10, p=4). Exact same value up to f32
    summation order (`_pseudo_denominator_projected` is the test oracle).

    vecs_b ``[..., m, P]``, w_b ``[..., 1, P]`` weights or None,
    freqs_b ``[G]`` cycles/bar. Returns ``[..., G]``.
    """
    ew = vecs_b if w_b is None else vecs_b * w_b
    # g_lag = sum_{i,p} (E W)[i+lag, p] E[i, p]; lag 0 doubled so one
    # table row covers the +/- lag pair.
    glags = []
    for lag in range(m):
        corr = jnp.sum(
            ew[..., lag:, :] * vecs_b[..., : m - lag, :], axis=(-2, -1)
        )
        glags.append(corr if lag == 0 else 2.0 * corr)
    g = jnp.stack(glags, axis=-1)                        # [..., m]
    lags = jnp.arange(m, dtype=jnp.float32) * d
    ang = 2.0 * jnp.pi * freqs_b[:, None] * lags[None, :]  # [G, m]
    return jnp.einsum("gl,...l->...g", jnp.cos(ang), g,
                      precision=jax.lax.Precision.HIGHEST)


def _pseudo_denominator_projected(vecs_b, w_b, freqs_b, m: int, d: int):
    """Dense-projection formulation of `_pseudo_denominator_lags` —
    superseded on the hot path by the sum-of-lags identity, kept as its
    test oracle (tests/test_extract.py)."""
    taps = jnp.arange(m, dtype=jnp.float32) * d
    ang = 2.0 * jnp.pi * freqs_b[:, None] * taps[None, :]  # [Gb, m]
    cos_g, sin_g = jnp.cos(ang), jnp.sin(ang)
    cn = jnp.einsum("gm,...mp->...gp", cos_g, vecs_b,
                    precision=jax.lax.Precision.HIGHEST)
    sn = jnp.einsum("gm,...mp->...gp", sin_g, vecs_b,
                    precision=jax.lax.Precision.HIGHEST)
    sq = cn * cn + sn * sn
    if w_b is not None:
        return jnp.sum(sq * w_b, axis=-1)
    return jnp.sum(sq, axis=-1)


def music_pseudospectrum(windows: jax.Array, cfg, band_windows=None):
    """Multi-resolution noise-subspace pseudospectrum over the band.

    Per sub-band (see `_band_plan`): box-decimated covariance -> batched
    Jacobi eigh (ALL bands stacked into one eigh call — the sequential
    rotation chain is the latency cost and batching is free) -> eigenvalue-
    gated noise projector -> band-grid pseudospectrum, normalized by its
    band mean so bands are comparable.

    `band_windows`: optional pre-built per-band covariance inputs
    (`band_precondition_windows`) — skips the in-window decimate+high-pass.

    The eigenvalue gate matters at flagship defaults (top_k=4, ar_order=10):
    a fixed m-2k split leaves a 2-dim noise subspace, fragile under colored
    random-walk residue, which otherwise manufactures band-edge super-peaks.
    Directions whose eigenvalue is below gate x noise_floor join the noise
    projector per window.

    Returns (pseudo [..., G], freqs [G] cycles/bar, eigvals [..., R, m],
    core [G] bool — only core points are peak candidates, band_slices —
    static (start, stop) of each sub-band inside the merged grid).
    """
    m = cfg.ar_order
    s_eff = min(cfg.music_signals_per_band, cfg.top_k)
    p = 2 * s_eff
    if m < p + 2:
        raise ValueError(
            f"ar_order={m} too small: need ar_order >= "
            f"2*min(music_signals_per_band, top_k)+2 = {p + 2}"
        )
    bands = _band_plan(cfg)

    # Per-band preconditioning: high-pass just above the band's own top
    # period before the covariance, so longer cycles and random-walk
    # residue (whose variance can dwarf in-band cycles) stay out of this
    # band's subspace. This only steers LOCALIZATION — amplitude/phase are
    # always fit on the (globally compensated) full-rate window.
    if band_windows is not None:
        covs = [_autocov_toeplitz(bw, m) for bw in band_windows]
    else:
        # All R per-band filters in ONE scan: the decimated bands have
        # different lengths, so they are zero-padded to the longest (the
        # filter is causal — trailing padding never reaches the real
        # prefix) and stacked on a row axis. Three sequential scans were
        # the largest term of the batch=1 serving latency (~67 us of
        # 174, benchmarks/profile_latency.py).
        from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_rows_mxu

        decs = [_decimate_box(windows, d) for (_, _, d) in bands]
        periods = tuple(max(4, int(1.5 * hi / d)) for (_, hi, d) in bands)
        n_max = max(dw.shape[-1] for dw in decs)
        stacked = jnp.stack(
            [
                jnp.pad(dw, [(0, 0)] * (dw.ndim - 1)
                        + [(0, n_max - dw.shape[-1])])
                for dw in decs
            ],
            axis=-2,
        )  # [..., R, n_max]
        hp_rows = ehlers_highpass_detrend_rows_mxu(stacked, periods)
        covs = [
            _autocov_toeplitz(hp_rows[..., bi, : decs[bi].shape[-1]], m)
            for bi in range(len(bands))
        ]
    r = jnp.stack(covs, axis=-3)  # [..., R, m, m]
    eigvals, eigvecs = jacobi_eigh(r)  # [..., R, m], [..., R, m, m]

    gate_on = cfg.music_signal_gate > 0
    if gate_on:
        # Optional eigenvalue gate: candidate signal directions below
        # gate x noise_floor join the noise projector. OFF by default:
        # colored (random-walk) residue has LARGER eigenvalues than weak
        # genuine cycle pairs, so magnitude gating can demote true cycles
        # into the noise projector (P then dips at the true frequency).
        # Localization robustness comes from the multi-band split; final
        # ranking is by fitted power, not pseudospectrum magnitude.
        base_noise = jnp.arange(m) < (m - p)
        noise_floor = jnp.mean(eigvals[..., : m - p], axis=-1, keepdims=True)
        is_noise = eigvals <= cfg.music_signal_gate * jnp.maximum(noise_floor, 1e-30)
        w_noise = (is_noise | base_noise).astype(eigvecs.dtype)

    pseudos = []
    freq_parts = []
    core_parts = []
    for bi, (lo, hi, d) in enumerate(bands):
        freqs_b, core_b = _freq_grid_band(cfg, lo, hi)
        if gate_on:
            # per-window adaptive projector: correlate ALL m directions,
            # weighted by the gated noise mask
            vecs_b = eigvecs[..., bi, :, :]
            w_b = w_noise[..., bi, None, :]
        else:
            # static split: eigvals ascend, so the noise subspace is the
            # FIRST m-p eigenvector columns
            vecs_b = eigvecs[..., bi, :, : m - p]
            w_b = None
        den = _pseudo_denominator_lags(vecs_b, w_b, freqs_b, m, d)
        pseudo_b = 1.0 / jnp.maximum(den, 1e-12)
        # normalize per band so merged peaks are comparable across bands
        pseudo_b = pseudo_b / jnp.mean(pseudo_b, axis=-1, keepdims=True)
        pseudos.append(pseudo_b)
        freq_parts.append(freqs_b)
        core_parts.append(core_b)

    pseudo = jnp.concatenate(pseudos, axis=-1)
    freqs = jnp.concatenate(freq_parts, axis=0)
    core = jnp.concatenate(core_parts, axis=0)
    slices = []
    start = 0
    for fp in freq_parts:
        slices.append((start, start + fp.shape[0]))
        start += fp.shape[0]
    return pseudo, freqs, eigvals, core, tuple(slices)


def _topk_local_maxima_bands(
    pseudo: jax.Array,           # [..., G] merged grid
    freqs: jax.Array,            # [G]
    core: jax.Array,             # [G] bool
    band_slices: tuple,          # static (start, stop) per band
    k: int,
    excl: float,
):
    """Per-band greedy top-k local maxima, ALL BANDS BATCHED into one loop.

    Noise makes the pseudospectrum jagged: adjacent grid points can both
    be strict local maxima of the same physical peak, so each accepted
    pick masks a +/-`excl` FREQUENCY radius (the grid is non-uniform —
    index distance would miss duplicates at band boundaries). Running
    the greedy exclusion per band would cost R*k sequential argmax/mask
    rounds in the latency chain; padding the bands to a common length
    and stacking them on a new axis runs it in k rounds total. Returns
    (vals [..., R*k], gidx [..., R*k] into the MERGED grid).
    """
    g_max = max(s1 - s0 for s0, s1 in band_slices)
    r = len(band_slices)
    lead = pseudo.shape[:-1]

    ps_b, fr_b, co_b, off = [], [], [], []
    for (s0, s1) in band_slices:
        pad = g_max - (s1 - s0)
        # edge-mode pad keeps the "duplicated last neighbor" rule of the
        # per-band picker: the last real point never counts as a strict
        # peak against itself (a zero pad would fabricate band-edge peaks)
        ps_b.append(jnp.pad(pseudo[..., s0:s1],
                            [(0, 0)] * len(lead) + [(0, pad)], mode="edge"))
        fr_b.append(jnp.pad(freqs[s0:s1], (0, pad), constant_values=-1.0))
        co_b.append(jnp.pad(core[s0:s1], (0, pad), constant_values=False))
        off.append(s0)
    ps = jnp.stack(ps_b, axis=-2)          # [..., R, G]
    fr = jnp.stack(fr_b, axis=0)           # [R, G]
    co = jnp.stack(co_b, axis=0)           # [R, G]
    offs = jnp.asarray(off, jnp.int32)     # [R]

    left = jnp.concatenate([ps[..., :1], ps[..., :-1]], axis=-1)
    right = jnp.concatenate([ps[..., 1:], ps[..., -1:]], axis=-1)
    masked = jnp.where((ps >= left) & (ps > right) & co, ps, 0.0)

    vals, idxs = [], []
    for _ in range(k):
        v = jnp.max(masked, axis=-1)                       # [..., R]
        i = jnp.argmax(masked, axis=-1)                    # [..., R]
        vals.append(v)
        idxs.append(i)
        f_pick = take_last(
            jnp.broadcast_to(fr, (*lead, r, g_max)), i[..., None]
        )
        far = jnp.abs(fr - f_pick) > excl                  # [..., R, G]
        masked = jnp.where(far, masked, 0.0)
    vals = jnp.stack(vals, axis=-1)                        # [..., R, k]
    gidx = jnp.stack(idxs, axis=-1).astype(jnp.int32) + offs[:, None]
    return (
        vals.reshape(*lead, r * k),
        gidx.reshape(*lead, r * k),
    )


def _factored_trig(freq: jax.Array, n1: int, n2: int):
    """Split cos/sin tables: ``cos(2*pi*f*(u*n2+v)) = c1*c2 - s1*s2``.

    freq ``[...]`` (cycles/bar) -> (c1, s1 ``[..., n1]``, c2, s2 ``[..., n2]``)
    for t = u*n2 + v (u < n1, v < n2). This is the transcendental-count
    fix ROUND1 item 6 called for: a length-n cos/sin evaluation becomes
    n1+n2 (128 for n=4096) plus MXU contractions. The coarse angle is
    folded mod 1 BEFORE the multiply (integer turns drop exactly), so
    large-t argument reduction error actually improves vs the direct
    2*pi*f*t evaluation (6e-5 rad vs 2.4e-4 rad at n=4096, f=1/9).
    """
    u = jnp.arange(n1, dtype=jnp.float32)
    v = jnp.arange(n2, dtype=jnp.float32)
    fr = jnp.mod(freq * n2, 1.0)
    a1 = (2.0 * jnp.pi) * jnp.mod(fr[..., None] * u, 1.0)  # [..., n1]
    a2 = (2.0 * jnp.pi) * freq[..., None] * v              # [..., n2]
    return jnp.cos(a1), jnp.sin(a1), jnp.cos(a2), jnp.sin(a2)


def _trig_dot(xr: jax.Array, c1, s1, c2, s2):
    """(sum_t x[t] cos(w t), sum_t x[t] sin(w t)) for per-k frequencies.

    xr ``[..., n1, n2]`` (window reshaped), tables ``[..., K, n1|n2]``.
    The [n2]-contraction matmul rides the MXU with the cos and sin fine
    tables MERGED on the output dim (one [n1, n2] @ [n2, 2K] per window
    instead of two @ [n2, K]): these are B-batched TINY matmuls — at the
    flagship refine shape [64, 64] @ [64, 24] filled 4.7% of the MXU
    tiles and the merge plus the 128-lane n2 split (`_split_n2`) measured
    461 -> 278 us per refine call on the v5e (benchmarks/probe_refine.py;
    block-diagonal window pairing lost its tile gains to the build
    overhead). The length-n cos/sin arrays of the naive form are never
    materialized.
    """
    hp = jax.lax.Precision.HIGHEST
    cs2 = jnp.concatenate([c2, s2], axis=-2)                  # [..., 2K, n2]
    i_cs = jnp.einsum("...uv,...kv->...ku", xr, cs2, precision=hp)
    k = c2.shape[-2]
    ic, is_ = i_cs[..., :k, :], i_cs[..., k:, :]
    cos_dot = jnp.einsum("...ku,...ku->...k", c1, ic, precision=hp) - \
        jnp.einsum("...ku,...ku->...k", s1, is_, precision=hp)
    sin_dot = jnp.einsum("...ku,...ku->...k", s1, ic, precision=hp) + \
        jnp.einsum("...ku,...ku->...k", c1, is_, precision=hp)
    return cos_dot, sin_dot


def _split_n2(n: int) -> int:
    # 128 fills the MXU lane dim on the fine-table contraction (chip A/B:
    # 307 us at n2=64 vs 278 us at n2=128 for the flagship refine call).
    return min(128, n)


def _dirichlet_cs(f: jax.Array, n: int):
    """Closed-form trig sums ``C(f) = sum_t cos(2*pi*f*t)``,
    ``S(f) = sum_t sin(2*pi*f*t)`` over t = 0..n-1.

    Geometric series: sum_t e^{2*pi*i*f*t} = e^{i*pi*f*(n-1)} *
    sin(pi*f*n) / sin(pi*f). Angles are folded mod 2 BEFORE the multiply
    by pi (f*n is exact in f32 for power-of-two n, so the fold sheds the
    integer turns losslessly — same argument-reduction trick as
    `_factored_trig`). Near-integer f takes the limit C = n, S = 0.
    """
    fn = f * n
    fn1 = fn - f  # f * (n - 1)
    y1 = fn1 - 2.0 * jnp.round(0.5 * fn1)
    y2 = fn - 2.0 * jnp.round(0.5 * fn)
    den = jnp.sin(jnp.pi * f)
    near_int = jnp.abs(f - jnp.round(f)) < 1e-6
    ratio = jnp.sin(jnp.pi * y2) / jnp.where(near_int, 1.0, den)
    c = jnp.where(near_int, float(n), jnp.cos(jnp.pi * y1) * ratio)
    s = jnp.where(near_int, 0.0, jnp.sin(jnp.pi * y1) * ratio)
    return c, s


def _sinusoid_gram(freq: jax.Array, n: int, valid: jax.Array):
    """Exact Gram matrix of the sinusoid basis, closed form — [..., 2K, 2K].

    Basis columns are ``cos(w_j t), sin(w_j t)`` (coefficient order
    [a_0..a_{K-1}, b_0..b_{K-1}]); every entry is a Dirichlet-kernel
    combination of `_dirichlet_cs` at f_i - f_j and f_i + f_j, so the
    whole matrix costs O(K^2) transcendentals per window and never
    touches the data. Invalid columns are replaced by scaled identity
    rows (diag n/2 keeps the system uniformly scaled).
    """
    fd = freq[..., :, None] - freq[..., None, :]
    fs = freq[..., :, None] + freq[..., None, :]
    cd, sd = _dirichlet_cs(fd, n)
    cs_, ss = _dirichlet_cs(fs, n)
    gcc = 0.5 * (cd + cs_)
    gss = 0.5 * (cd - cs_)
    gcs = 0.5 * (ss - sd)  # [i, j] = sum_t cos(w_i t) sin(w_j t)
    gsc = 0.5 * (ss + sd)
    g = jnp.concatenate(
        [
            jnp.concatenate([gcc, gcs], axis=-1),
            jnp.concatenate([gsc, gss], axis=-1),
        ],
        axis=-2,
    )  # [..., 2K, 2K]
    v2 = jnp.concatenate([valid, valid], axis=-1)
    mask = v2[..., :, None] * v2[..., None, :]
    eye = jnp.eye(g.shape[-1], dtype=g.dtype)
    return g * mask + eye * (1.0 - v2[..., :, None]) * (n / 2.0)


def _cg_solve(gram: jax.Array, rhs: jax.Array, iters: int) -> jax.Array:
    """Batched conjugate gradients on SPD ``gram @ x = rhs`` ([..., M, M]).

    The system is tiny (M = 2K <= 16) and near-identity after the n/2
    scaling (off-diagonal coupling <= ~0.64 even for peaks half a bin
    apart), so a fixed, unrolled iteration count reaches f32 machine
    precision; each step is one [..., M, M] @ [..., M] matvec —
    elementwise-cheap, no LAPACK lowering on TPU.
    """
    hp = jax.lax.Precision.HIGHEST

    def mv(x):
        return jnp.einsum("...ij,...j->...i", gram, x, precision=hp)

    def dot(u, v):
        return jnp.sum(u * v, axis=-1, keepdims=True)

    x = rhs
    r = rhs - mv(x)
    p = r
    rr = dot(r, r)
    for _ in range(iters):
        ap = mv(p)
        alpha = rr / jnp.maximum(dot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rr_new = dot(r, r)
        beta = rr_new / jnp.maximum(rr, 1e-30)
        p = r + beta * p
        rr = rr_new
    return x


def _dedupe_mask(freq: jax.Array, valid: jax.Array, tol: float) -> jax.Array:
    """Mask candidates closer than `tol` (cycles/bar) to an EARLIER valid
    candidate (band-overlap duplicates / peaks that merged under
    refinement; duplicated basis columns would make the fit Gram
    singular). Returns the updated valid mask."""
    c_count = freq.shape[-1]
    df = jnp.abs(freq[..., :, None] - freq[..., None, :])
    earlier = jnp.tril(jnp.ones((c_count, c_count), bool), k=-1)
    dup = ((df < tol) & earlier & valid[..., None, :]).any(axis=-1)
    return valid & ~dup


def _refine_freq(
    windows: jax.Array, freq: jax.Array, step, iters: int = 2
) -> jax.Array:
    """Parabolically refine frequencies against the window periodogram.

    A frequency error df costs the downstream LS fit a sinc(pi*df*n)
    amplitude loss (2.4 rad of phase drift across a 4096 window for half an
    FFT bin), so grid-resolution peaks are not enough. Each iteration
    evaluates the exact periodogram |sum_t x e^{-2pi i f t}|^2 at f-step,
    f, f+step and moves to the parabola vertex. Evaluation is matrix-free
    via the factored trig tables (`_factored_trig`) — no length-n cos/sin.

    `step` may be scalar or per-candidate ``[..., k]``: ridge-seeded
    candidates start at an integer FFT bin, up to HALF a bin from the true
    line, beyond the ±(step + step/4) reach of the subspace grid's fine
    step — they need a half-bin first step, while subspace picks keep the
    fine step so a 1-bin-away neighbor never enters their parabola.
    """
    n = windows.shape[-1]
    n2 = _split_n2(n)
    xr = windows.reshape(*windows.shape[:-1], n // n2, n2)

    def periodogram(f):  # f [..., k, 3] -> [..., k, 3]
        kk = f.shape[-2] * f.shape[-1]
        ff = f.reshape(*f.shape[:-2], kk)
        c1, s1, c2, s2 = _factored_trig(ff, n // n2, n2)
        c, s = _trig_dot(xr, c1, s1, c2, s2)
        p = c * c + s * s
        return p.reshape(*f.shape)

    offsets = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    step = jnp.asarray(step, jnp.float32)  # scalar or [..., k]
    p = None
    for _ in range(iters):
        cand = freq[..., None] + step[..., None] * offsets  # [..., k, 3]
        p = periodogram(cand)
        freq, step = _parabola_move(freq, step, p)
    return freq, p[..., 1]


def _parabola_move(freq, step, p):
    """One parabolic-refinement move from the 3-point stencil values.

    Vertex through (-1, p0), (0, p1), (1, p2) — valid only when the
    triple is concave (denom < 0 is the quadratic's condition). A ridge
    seed half a bin from a strong line sees an INCREASING triple: its
    "vertex" is a minimum and the update would walk AWAY from the peak,
    so step toward the larger endpoint instead.
    """
    denom = p[..., 0] - 2.0 * p[..., 1] + p[..., 2]
    vertex = 0.5 * (p[..., 0] - p[..., 2]) / jnp.where(
        jnp.abs(denom) > 1e-30, denom, 1e-30
    )
    shift = jnp.where(
        denom < 0.0,
        jnp.clip(vertex, -1.0, 1.0),
        jnp.sign(p[..., 2] - p[..., 0]),
    )
    return freq + shift * step, step / 4.0


def _refine_freq_moments(
    windows: jax.Array, freq: jax.Array, step, iters: int = 2
) -> jax.Array:
    """`_refine_freq` evaluated through per-candidate block MOMENTS.

    The exact form pays one full data pass per stencil point (2
    iterations x 3 points x k candidates of [n1, n2] @ [n2, 2K]
    matmuls). But every stencil point of a candidate stays within
    delta <= 1.25 * step of its CENTER frequency, so the fine-table
    factor separates: e^{-i 2 pi (f0+delta) v} = e^{-i 2 pi f0 v}
    e^{-i theta w} with w = v/n2 in [0,1) and theta = 2 pi delta n2,
    and e^{-i theta w} expands in a 4-term Taylor series. ONE einsum
    against the moment-extended window rows [x, wx, w^2 x, w^3 x]
    ([4*n1, n2] @ [n2, 2K] — the lhs tile is FULL at n1=32) yields
    block moments M_m,u = sum_v w^m x e^{-i 2 pi f0 v}; each stencil
    evaluation is then a cheap n1-length outer contraction
    B_u(delta) = sum_m coef_m(theta) M_m,u,
    DFT = sum_u e^{-i 2 pi f n2 u} B_u. 6 data passes at 2K=48 become
    ONE at 2K=16 with 33% fewer FLOPs and fuller tiles.

    Truncation error: |e^{-i theta w} - taylor_3| <= theta^4/24. The
    worst theta is a ridge seed's half-bin first step:
    theta_max = 2 pi * 1.25 * (0.5/n) * n2, so n/n2 >= 16 keeps the
    relative periodogram error < ~1e-4 (9.5e-6 at the flagship n=4096)
    — far below the vertex sensitivity. `_refine_and_fit` routes here
    only when n >= 16 * n2; smaller windows keep the exact form.
    Agreement is gated by tests/test_extract.py
    (test_refine_moments_matches_exact).
    """
    n = windows.shape[-1]
    n2 = _split_n2(n)
    n1 = n // n2
    xr = windows.reshape(*windows.shape[:-1], n1, n2)
    w = jnp.arange(n2, dtype=jnp.float32) / n2
    xm = jnp.concatenate([xr * (w**m) for m in range(4)], axis=-2)
    k = freq.shape[-1]
    _c1, _s1, c2, s2 = _factored_trig(freq, n1, n2)   # fine tables at f0
    cs2 = jnp.concatenate([c2, s2], axis=-2)          # [..., 2k, n2]
    hp = jax.lax.Precision.HIGHEST
    i_cs = jnp.einsum("...uv,...kv->...ku", xm, cs2, precision=hp)
    cm = i_cs[..., :k, :].reshape(*i_cs.shape[:-2], k, 4, n1)
    sm = i_cs[..., k:, :].reshape(*i_cs.shape[:-2], k, 4, n1)
    c0 = cm[..., 0, :][..., None, :]   # [..., k, 1, n1]
    c1m = cm[..., 1, :][..., None, :]
    c2m = cm[..., 2, :][..., None, :]
    c3m = cm[..., 3, :][..., None, :]
    s0 = sm[..., 0, :][..., None, :]
    s1m = sm[..., 1, :][..., None, :]
    s2m = sm[..., 2, :][..., None, :]
    s3m = sm[..., 3, :][..., None, :]

    f0 = freq
    u = jnp.arange(n1, dtype=jnp.float32)
    offsets = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    step = jnp.asarray(step, jnp.float32)
    p = None
    for _ in range(iters):
        cand = freq[..., None] + step[..., None] * offsets    # [..., k, 3]
        th = ((2.0 * jnp.pi * n2) * (cand - f0[..., None]))[..., None]
        th2 = 0.5 * th * th
        th3 = th * th * th * (1.0 / 6.0)
        b_re = c0 - th * s1m - th2 * c2m + th3 * s3m
        b_im = -s0 - th * c1m + th2 * s2m + th3 * c3m
        fr_ = jnp.mod(cand * n2, 1.0)
        a1 = (2.0 * jnp.pi) * jnp.mod(fr_[..., None] * u, 1.0)
        cu, su = jnp.cos(a1), jnp.sin(a1)                     # [..., k, 3, n1]
        re = jnp.sum(cu * b_re + su * b_im, axis=-1)
        im = jnp.sum(cu * b_im - su * b_re, axis=-1)
        p = re * re + im * im
        freq, step = _parabola_move(freq, step, p)
    return freq, p[..., 1]


def _sinusoid_fit(windows: jax.Array, freq: jax.Array,
                  valid: jax.Array | None = None, iters: int = 10):
    """Exact LS fit of k sinusoids: x[t] ~ sum_j a_j cos(w_j t) + b_j sin(w_j t).

    windows [..., n], freq [..., k] (cycles/bar), valid [..., k] float
    mask (invalid picks all collapse to the same argmax-of-zeros
    frequency and would make the Gram singular). Returns
    (a [..., k], b [..., k], residual_energy [...]).

    ONE data pass: g = H^T x via the factored trig tables
    (`_factored_trig` — the [..., k, n] basis never exists). The normal
    matrix G = H^T H needs no data at all — every entry is a closed-form
    Dirichlet sum (`_sinusoid_gram`) — and the 2K x 2K system is solved
    exactly by batched CG (`_cg_solve`). This replaces the previous
    matrix-free Richardson iteration, which cost 5 more passes over the
    window data (each a badly-shaped [n1, n2] x [n2, k] batched matmul)
    and only converged geometrically for close frequency pairs.

    Residual energy is closed-form too:
    ||x - Hc||^2 = ||x||^2 - 2 c.g + c.(G c), clamped at 0 against f32
    cancellation on near-noiseless windows.
    """
    n = windows.shape[-1]
    n2 = _split_n2(n)
    k = freq.shape[-1]
    if valid is None:
        valid = jnp.ones_like(freq)
    xr = windows.reshape(*windows.shape[:-1], n // n2, n2)
    c1, s1, c2, s2 = _factored_trig(freq, n // n2, n2)  # [..., k, n1|n2]
    # Zeroing the coarse tables zeroes both basis columns exactly.
    c1 = c1 * valid[..., None]
    s1 = s1 * valid[..., None]

    gc, gs = _trig_dot(xr, c1, s1, c2, s2)
    g_raw = jnp.concatenate([gc, gs], axis=-1)          # [..., 2k]
    gram = _sinusoid_gram(freq, n, valid)               # [..., 2k, 2k]
    scale = 2.0 / n
    coef = _cg_solve(gram * scale, g_raw * scale, iters)
    a, b = coef[..., :k], coef[..., k:]

    xx = jnp.sum(windows * windows, axis=-1)
    hp = jax.lax.Precision.HIGHEST
    quad = jnp.einsum("...i,...ij,...j->...", coef, gram, coef, precision=hp)
    resid = xx - 2.0 * jnp.sum(coef * g_raw, axis=-1) + quad
    return a, b, jnp.maximum(resid, 0.0)


def music_candidates(windows: jax.Array, cfg, band_windows=None,
                     seed_spec=None, upto: str | None = None) -> dict:
    """The MUSIC candidate pipeline: pseudospectrum -> per-band peaks ->
    ridge seeds -> pre-rank -> parabolic refine -> LS fit.

    The SINGLE source of truth for the stage sequence — `music_extract`
    consumes the full run, and `benchmarks/profile_music.py` times
    truncated prefixes via `upto` (one of "pseudo", "peaks", "ridge",
    "prerank", "refine"; None runs everything) instead of duplicating
    the stage code. Returns a dict of whatever exists at the stop point.

    `seed_spec`: optional precomputed complex spectrum of `windows`
    covering at least bins [0, floor(n/min_period)] — the rolling-STFT
    batch path passes the overlap-shared hopped band DFT of the
    preconditioned series here (`kernels.hopped_dft`), replacing the
    framed-window MXU DFT that was ~26% of the flagship batch budget
    (same spectra to ~2e-7; seeds only steer candidate selection and
    pre-ranking, the fit always re-reads the windows).
    """
    n = cfg.window
    k = cfg.top_k

    out: dict = {}
    pseudo, freqs, eigvals, core, band_slices = music_pseudospectrum(
        windows, cfg, band_windows=band_windows
    )
    out.update(pseudo=pseudo, freqs=freqs, eigvals=eigvals, core=core,
               band_slices=band_slices)
    if upto == "pseudo":
        return out

    if (upto not in ("peaks", "ridge")
            and not getattr(cfg, "music_xla_select", False)
            and jax.default_backend() != "cpu"):
        # Device path: the whole peaks -> ridge -> prerank selection in
        # ONE Pallas launch (kernels.music_select_pallas) — the XLA
        # stage chain below is ~0.6-0.8 ms of dispatch latency at 512
        # windows while touching only [B, ~1.7k] floats. Bitwise-equal
        # outputs (pinned by tests/test_music_select_pallas.py); the
        # XLA chain remains the CPU/test path and the "peaks"/"ridge"
        # profiling stops.
        from wavespec_tpu.kernels.mxu_fft import rfft_mxu
        from wavespec_tpu.kernels.music_select_pallas import (
            select_candidates_pallas,
        )

        k_min_fb, k_max_fb = band_indices(n, cfg.min_period, cfg.max_period)
        if seed_spec is None:
            seed_spec = rfft_mxu(windows, max_bins=k_max_fb + 1)
        band_power = (jnp.real(seed_spec) ** 2 + jnp.imag(seed_spec) ** 2)[
            ..., k_min_fb : k_max_fb + 1
        ]
        sel = select_candidates_pallas(pseudo, band_power, cfg)
        freq, valid, gidx = sel["freq"], sel["valid"], sel["gidx"]
        vals, step0 = sel["vals"], sel["step0"]
        out.update(freq=freq, valid=valid, gidx=gidx, vals=vals,
                   step0=step0)
        if upto == "prerank":
            return out
        return _refine_and_fit(windows, cfg, out, upto)

    # Candidate stage: top-k local maxima PER SUB-BAND (exclusion radius =
    # one FFT bin of frequency), all bands batched into one greedy loop.
    # Cross-band pseudospectrum magnitudes are not comparable (each band
    # has its own noise projector), so the final ranking happens after the
    # joint fit, by fitted power.
    vals, gidx = _topk_local_maxima_bands(
        pseudo, freqs, core, band_slices, k, excl=1.0 / n
    )                                             # [..., C]
    freq = freqs[gidx]                            # [..., C]
    valid = vals > 0
    out.update(freq=freq, valid=valid, gidx=gidx, vals=vals)
    if upto == "peaks":
        return out

    # Periodogram-seeded candidates: the FFT-ridge top-k bins join the
    # candidate set. Colored (random-walk) residue can bias the subspace
    # peaks by several bins while the per-bin periodogram still nails a
    # strong line; the fit-power ranking below keeps whichever
    # localization carries more energy, so the MUSIC method never places
    # WORSE than the ridge on strong cycles (and still super-resolves
    # clean ones). Coherence for seeded candidates is read off the merged
    # pseudospectrum like any other pick.
    from wavespec_tpu.kernels.mxu_fft import rfft_mxu

    k_min_fb, k_max_fb = band_indices(n, cfg.min_period, cfg.max_period)
    if seed_spec is None:
        seed_spec = rfft_mxu(windows, max_bins=k_max_fb + 1)
    band_power = (jnp.real(seed_spec) ** 2 + jnp.imag(seed_spec) ** 2)[
        ..., k_min_fb : k_max_fb + 1
    ]
    rp, ridx = jax.lax.top_k(band_power, k)
    ridge_freq = (ridx + k_min_fb).astype(jnp.float32) / n
    # Ridge seeds are integer FFT bins -> static bin->grid-index table,
    # one gather (the merged grid is NOT globally sorted, so a naive
    # searchsorted would return unrelated indices; see _bin_to_gidx_table).
    ridge_gidx = jnp.asarray(_bin_to_gidx_table(cfg, k_min_fb, k_max_fb))[ridx]
    freq = jnp.concatenate([freq, ridge_freq], axis=-1)
    gidx = jnp.concatenate([gidx, ridge_gidx], axis=-1)
    vals = jnp.concatenate([vals, take_last(pseudo, ridge_gidx)], axis=-1)
    valid = jnp.concatenate([valid, rp > 0], axis=-1)
    out.update(freq=freq, valid=valid, gidx=gidx, vals=vals, rp=rp)
    if upto == "ridge":
        return out

    # Cheap pre-ranking BEFORE the (trig-dot-heavy) parabolic refinement:
    # only the strongest 2k of the C = R*k + k candidates pay for the
    # 3-point x 2-iteration refinement. The rank key is the FFT band
    # power ALREADY computed for the ridge seeds, parabola-interpolated
    # through the three bins around each candidate (off-grid subspace
    # peaks would lose up to sinc^2(pi/2) ~ 0.41x against on-bin seeds
    # under a nearest-bin read; the vertex height restores them). This is
    # gathers + elementwise — no extra pass over the window data, which
    # an exact per-candidate periodogram costs (~1 ms at 512 windows).
    # Grid-level duplicates (band-overlap picks, ridge seeds landing on a
    # subspace peak) are masked first so they don't crowd out genuine
    # candidates. All five per-candidate arrays move through ONE
    # take_along_axis (gathers serialize on TPU).
    c_count = freq.shape[-1]
    valid = _dedupe_mask(freq, valid, 0.5 / n)
    k0 = jnp.clip(
        jnp.round(freq * n).astype(jnp.int32) - k_min_fb,
        0, k_max_fb - k_min_fb,
    )
    padbp = jnp.pad(
        band_power, [(0, 0)] * (band_power.ndim - 1) + [(1, 1)], mode="edge"
    )
    tri = jnp.stack(
        [padbp[..., :-2], padbp[..., 1:-1], padbp[..., 2:]], axis=-1
    )                                             # [..., Kb, 3]
    p3 = take_rows(tri, k0)                         # [..., C, 3]
    pm, p0, pp = p3[..., 0], p3[..., 1], p3[..., 2]
    denom = pm - 2.0 * p0 + pp
    shift = jnp.clip(
        (pm - pp) / jnp.where(jnp.abs(denom) > 1e-30, 2.0 * denom, 1e-30),
        -1.0, 1.0,
    )
    pgram0 = p0 + 0.5 * (pp - pm) * shift + 0.5 * denom * shift * shift
    keep = min(2 * k, c_count)
    pre_key = jnp.where(valid, pgram0, -1.0)
    _, keep_idx = jax.lax.top_k(pre_key, keep)
    # Per-candidate refine step: subspace picks sit within one grid cell
    # of the truth (fine step keeps 1-bin-away neighbors out of their
    # parabola); ridge seeds start at an integer bin, up to half a bin
    # off, and need the half-bin step to reach it.
    grid_step = 1.0 / (cfg.music_grid_per_bin * n)
    ridge_step = 0.5 / n
    step0 = jnp.concatenate(
        [
            jnp.full(freq.shape[:-1] + (c_count - k,), grid_step, jnp.float32),
            jnp.full(freq.shape[:-1] + (k,), ridge_step, jnp.float32),
        ],
        axis=-1,
    )
    packed = jnp.stack(
        [freq, valid.astype(jnp.float32), gidx.astype(jnp.float32), vals,
         step0],
        axis=-1,
    )                                             # [..., C, 5]
    taken = take_rows(packed, keep_idx)
    freq = taken[..., 0]
    valid = taken[..., 1] > 0.5
    gidx = taken[..., 2].astype(jnp.int32)
    vals = taken[..., 3]
    step0 = taken[..., 4]
    out.update(freq=freq, valid=valid, gidx=gidx, vals=vals, step0=step0)
    if upto == "prerank":
        return out
    return _refine_and_fit(windows, cfg, out, upto)


def _refine_and_fit(windows: jax.Array, cfg, out: dict,
                    upto: str | None) -> dict:
    """Shared tail of `music_candidates`: parabolic refine + LS fit."""
    n = cfg.window
    freq, valid, step0 = out["freq"], out["valid"], out["step0"]
    if n >= 16 * _split_n2(n):
        # Moment-expansion refine: one data pass instead of six; the
        # Taylor truncation needs theta = 2 pi * 1.25 * step * n2 small,
        # which n/n2 >= 16 guarantees for the half-bin ridge step.
        freq, _ = _refine_freq_moments(windows, freq, step=step0)
    else:
        freq, _ = _refine_freq(windows, freq, step=step0)

    # Refinement can merge two distinct grid peaks onto one frequency;
    # re-dedupe so the fit basis stays non-singular.
    valid = _dedupe_mask(freq, valid, 0.5 / n)
    out.update(freq=freq, valid=valid)
    if upto == "refine":
        return out

    a, b, resid_energy = _sinusoid_fit(
        windows, freq, valid=valid.astype(jnp.float32))
    out.update(a=a, b=b, resid_energy=resid_energy)
    return out


def hp_gain_compensate(amp: jax.Array, psi: jax.Array, freq: jax.Array,
                       hp_period: int):
    """Undo the preconditioning high-pass's exactly-known complex gain.

    Ehlers HP: trend T(z) = c(1+z^-1)/(1-alpha z^-1), H = 1 - T. An input
    A sin(wt+psi0) emerges as A|H| sin(wt+psi0+argH), so the true
    parameters are amp/|H| and psi - argH. Shared by the MUSIC and ESPRIT
    extraction tails.
    """
    import math

    w_hp = 2.0 * math.pi / hp_period
    alpha = (1.0 - math.sin(w_hp)) / math.cos(w_hp)
    c = (1.0 - alpha) / 2.0
    wrad = 2.0 * jnp.pi * freq
    z_re, z_im = jnp.cos(-wrad), jnp.sin(-wrad)  # z^-1 on unit circle
    num_re, num_im = c * (1.0 + z_re), c * z_im
    den_re, den_im = 1.0 - alpha * z_re, -alpha * z_im
    den2 = den_re * den_re + den_im * den_im
    t_re = (num_re * den_re + num_im * den_im) / den2
    t_im = (num_im * den_re - num_re * den_im) / den2
    h_re, h_im = 1.0 - t_re, -t_im
    h_mag = jnp.sqrt(h_re * h_re + h_im * h_im)
    amp = amp / jnp.maximum(h_mag, 0.05)
    psi = psi - jnp.arctan2(h_im, h_re)
    return amp, psi


def music_extract(windows: jax.Array, cfg, pre_highpassed: bool = False,
                  band_windows=None, seed_spec=None) -> jax.Array:
    """MUSIC extraction over preconditioned windows ``[..., n]``.

    Returns ``[..., top_k, 15]`` stride-15 attrs with method_id=1.
    Power scale is FFT-compatible: a fitted amplitude A maps to
    ``(A*n/2)^2`` (the exact-bin |X_k|^2 of that sinusoid), and the noise
    floor is the per-bin residual power (Parseval), so snr_db/energy_ratio
    are directly comparable with the FFT-ridge method's.

    `pre_highpassed`: the caller already ran `ehlers_highpass_detrend` at
    this config's `hp_period` over the UNFRAMED series (the rolling-STFT
    batch path — one scan over the series instead of one per overlapping
    window, and the filter is warm at every window start instead of
    re-cold-starting). The frequency-domain gain compensation below still
    applies either way.
    """
    from wavespec_tpu.extract import Method, _attrs_from_peaks  # circular-safe

    n = cfg.window
    k = cfg.top_k
    m = cfg.ar_order
    p = 2 * min(cfg.music_signals_per_band, k)

    # Subspace preconditioning: MUSIC models sinusoids in white-ish noise;
    # raw price is a random walk whose low-frequency power swamps the
    # covariance. High-pass above the analysis band before both the
    # covariance and the amplitude fit, then undo the filter's (exactly
    # known) complex gain at each fitted frequency.
    hp_period = music_hp_period(cfg)
    if cfg.music_highpass and not pre_highpassed:
        # Remove the price LEVEL before the cold-start filter: the
        # one-pole high-pass seeded at a ~100-level price leaves a
        # level-sized decaying exponential that dominates the covariance
        # (real cycles lost, spurious low-frequency picks — the batch
        # fast path avoids this with a warm series-level filter).
        # Anchoring on the FIRST SAMPLE zeroes the filter's init step
        # exactly (trend[0] = c*2*p[0] with y[-1]=0, so an input starting
        # at 0 has no step); the filter is linear, so the constant shift
        # never touches sinusoid amplitudes or phases.
        from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu

        windows = windows - windows[..., :1]
        windows = ehlers_highpass_detrend_mxu(
            windows, (hp_period,)
        )[..., 0, :]

    st = music_candidates(windows, cfg, band_windows=band_windows,
                          seed_spec=seed_spec)
    pseudo, eigvals = st["pseudo"], st["eigvals"]
    freq, valid, gidx, vals = st["freq"], st["valid"], st["gidx"], st["vals"]
    a, b, resid_energy = st["a"], st["b"], st["resid_energy"]
    amp = jnp.sqrt(a * a + b * b)
    # x = a cos + b sin = amp * sin(w t + psi), psi = atan2(a, b)
    psi = jnp.arctan2(a, b)

    if cfg.music_highpass:
        amp, psi = hp_gain_compensate(amp, psi, freq, hp_period)
    omega = 2.0 * jnp.pi * freq
    phase_end = omega * (n - 1) + psi

    power = (amp * n / 2.0) ** 2
    noise_floor = jnp.maximum(resid_energy, 1e-30)  # per-bin (Parseval)

    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    n_band = float(k_max - k_min + 1)
    total_inband = jnp.sum(jnp.where(valid, power, 0.0), axis=-1) + noise_floor * n_band

    # Coherence: pseudospectrum concentration at the peak (same +/-2
    # neighborhood definition as the FFT path, on the refined grid).
    # The 5-point neighborhood sum is a shift-add over the WHOLE grid
    # (one elementwise pass) followed by a SINGLE gather — five clipped
    # take_along_axis calls serialize on TPU.
    padp = jnp.pad(pseudo, [(0, 0)] * (pseudo.ndim - 1) + [(2, 2)],
                   mode="edge")  # edge pad == the old index clip
    nb_full = sum(
        padp[..., off : off + pseudo.shape[-1]] for off in range(5)
    )
    nb_sum = take_last(nb_full, gidx)
    coherence = vals / jnp.maximum(nb_sum, 1e-30)

    # Eigen ratio: mean signal eigenvalue / mean noise eigenvalue, best
    # sub-band (eigvals [..., R, m]).
    sig_mean = jnp.mean(eigvals[..., m - p :], axis=-1)
    noi_mean = jnp.maximum(jnp.mean(eigvals[..., : m - p], axis=-1), 1e-30)
    # Cap: noiseless windows drive the noise eigenvalues to f32 underflow.
    ratio = jnp.max(jnp.clip(sig_mean / noi_mean, 0.0, 1e6), axis=-1)
    eigen_ratio = jnp.broadcast_to(ratio[..., None], amp.shape)

    # Final ranking: top_k candidates by fitted power (physical energy in
    # the window — comparable across sub-bands). One packed gather.
    rank_key = jnp.where(valid, power, -1.0)
    _, top_idx = jax.lax.top_k(rank_key, k)
    packed = jnp.stack(
        [freq, amp, phase_end, power, coherence,
         valid.astype(jnp.float32), eigen_ratio], axis=-1,
    )                                             # [..., keep, 7]
    taken = take_rows(packed, top_idx)
    freq, amp, phase_end = taken[..., 0], taken[..., 1], taken[..., 2]
    power, coherence = taken[..., 3], taken[..., 4]
    valid = taken[..., 5] > 0.5
    eigen_ratio = taken[..., 6]

    return _attrs_from_peaks(
        freq, amp, phase_end, power, valid, total_inband, noise_floor,
        coherence, eigen_ratio, int(Method.MUSIC), cfg,
    )
