"""Sliding band DFT: the hop=1 rolling spectrum as chunked closed-form
prefix convolutions instead of per-window DFTs.

The v757 online path (`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5` OnCalculate,
one windowed FFT per bar) re-transforms 4095/4096ths of the same samples
every frame.  For ANY fixed angular frequency ``f`` the window transform

    Y_i(f) = sum_{j<N} s[i+j] * exp(-i f j)

obeys the exact one-step recurrence

    Y_{i+1} = exp(if) * (Y_i - s[i] + s[i+N] * exp(-ifN))

which unrolls in closed form from a chunk anchor ``n0``:

    Y_{n0+n} = e^{ifn} Y_{n0}
             + sum_{t<n} e^{if(n-t)} (s[n0+t+N] e^{-ifN} - s[n0+t])

i.e. one anchor DFT per chunk plus a CAUSAL CONVOLUTION of the series
against a fixed complex kernel — expressed here as four real MXU matmuls
per chunk.  Per frame this costs ``N*K*M/C + C*K`` MACs against the framed
path's ``N*K`` (~14x fewer at the flagship shape, C=128) and never
materializes the ``[T, N]`` frame matrix (537 MB at B=64 x 512 x 4096).

The symmetric taper folds in EXACTLY: Hann/Hamming/Blackman are finite
cosine sums, so ``t[j] = sum_m a_m e^{+i m w0 j}`` with ``w0 = 2pi/(N-1)``
(the reference's symmetric convention, `Legacy/WaveSpecZZ_1.0.2.mq5:884-935`)
and the tapered spectrum is the same sliding machinery evaluated at the
M = 1/3/5 shifted frequencies ``f_{k,m} = 2pi*k/N - m*w0`` per bin.
Bartlett is not a cosine sum — callers fall back to the framed path.

All phase tables are built host-side in float64 with mod-1 folding (the
fractional phase is exact there; on-device f32 transcendentals both cost
VPU budget and lose accuracy at large ``j*k``).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from wavespec_tpu.ops.windows import WindowType

_HIGHEST = jax.lax.Precision.HIGHEST


def taper_harmonics(window_type: WindowType | int) -> list[tuple[int, float]] | None:
    """Taper as an exact list of ``(m, a_m)`` complex-exponential terms
    (``t[j] = sum a_m e^{i m w0 j}``, w0 = 2pi/(N-1)), or None when the
    taper is not a finite cosine sum (Bartlett)."""
    wt = WindowType(int(window_type))
    if wt == WindowType.NONE:
        return [(0, 1.0)]
    if wt == WindowType.HANN:
        return [(0, 0.5), (1, -0.25), (-1, -0.25)]
    if wt == WindowType.HAMMING:
        return [(0, 0.54), (1, -0.23), (-1, -0.23)]
    if wt == WindowType.BLACKMAN:
        return [(0, 0.42), (1, -0.25), (-1, -0.25), (2, 0.04), (-2, 0.04)]
    return None  # BARTLETT: piecewise-linear, no finite harmonic form


@lru_cache(maxsize=None)
def _tables(window: int, n_bins: int, chunk: int, window_type: int,
            k_lo: int = 0):
    """Host-side f64 phase tables for (N, K, C, taper); f32 parts out.

    Returns a dict of numpy arrays:
      basis_a/b (re, im): anchor-DFT basis factors, [J1, K*M] and [J2, K*M]
        with basis[j] = a[j // J2] * b[j % J2] = e^{-2pi i phi j};
      k_head / k_tail (re, im): conv kernel matrices [C-1, K], indexed by
        u with d = C-1-u (see `sliding_band_spec`);
      en (re, im): anchor spread table [C, K, M] = a_m e^{+2pi i phi n}.

    `k_lo` drops bins below the analysis band from every table
    (K = n_bins - k_lo effective columns); each bin's math is
    column-independent, so the kept bins are identical to the full run.
    """
    n = window
    harmonics = taper_harmonics(window_type)
    if harmonics is None:
        raise ValueError(f"no harmonic form for taper {window_type}")
    m_vals = np.array([m for m, _ in harmonics], np.float64)
    a_vals = np.array([a for _, a in harmonics], np.float64)
    n_m = len(harmonics)
    k = np.arange(k_lo, n_bins, dtype=np.float64)
    # cycles/sample; [K, M]
    phi = k[:, None] / n - m_vals[None, :] / (n - 1)
    phi_f = phi.reshape(-1)  # [K*M], k-major

    def cis(x):  # e^{2pi i frac(x)} — fold in f64 BEFORE the trig
        x = x - np.round(x)
        return np.cos(2 * np.pi * x), np.sin(2 * np.pi * x)

    # anchor basis e^{-2pi i phi j}, factored j = u*J2 + v (J2 = 128
    # fills the MXU lane dim when the factored anchor route contracts
    # over v; the collapsed route only ever uses the a*b product, which
    # is J2-invariant)
    j2 = min(128, n)
    j1 = -(-n // j2)
    u = np.arange(j1, dtype=np.float64)[:, None] * j2
    v = np.arange(j2, dtype=np.float64)[:, None]
    # For very large windows the [J1, K*M] a-table is itself the
    # problem: at window 262144 / the v757 band it is ~470 MB of f32 x2
    # as jit CONSTANTS, which broke the remote-compile transport. Factor
    # u = u1*U2 + u2 once more (exact complex identity, each factor
    # mod-1 folded in f64) and ship [J1/U2 + U2, K*M] instead; the
    # two-level combine is gated to j1 > 256 so smaller windows keep
    # their existing arithmetic bit-for-bit.
    if j1 > 256:
        u2n = 64
        while j1 % u2n:
            u2n //= 2
        u1 = np.arange(j1 // u2n, dtype=np.float64)[:, None] * (u2n * j2)
        u2 = np.arange(u2n, dtype=np.float64)[:, None] * j2
        a1_re, a1_im = cis(-u1 * phi_f[None, :])
        a2_re, a2_im = cis(-u2 * phi_f[None, :])
        a_re = a_im = None
    else:
        a_re, a_im = cis(-u * phi_f[None, :])
        a1_re = a1_im = a2_re = a2_im = None
    b_re, b_im = cis(-v * phi_f[None, :])

    # conv kernels: Khead[d] = sum_m a_m e^{+2pi i phi d},
    #               Ktail[d] = sum_m a_m e^{+2pi i phi (d - N)}, d in [1, C)
    d = np.arange(1, chunk, dtype=np.float64)[:, None, None]  # [C-1, 1, 1]
    ph = phi[None, :, :]  # [1, K, M]
    hr, hi = cis(d * ph)
    tr, ti = cis((d - n) * ph)
    k_head_re = (hr * a_vals).sum(-1)  # [C-1, K]
    k_head_im = (hi * a_vals).sum(-1)
    k_tail_re = (tr * a_vals).sum(-1)
    k_tail_im = (ti * a_vals).sum(-1)
    # index by u = C-1-d (frame column u holds sample n-1-(C-2-u)):
    k_head_re, k_head_im = k_head_re[::-1], k_head_im[::-1]
    k_tail_re, k_tail_im = k_tail_re[::-1], k_tail_im[::-1]

    # anchor spread: En[n, k, m] = a_m e^{+2pi i phi n}
    nn = np.arange(chunk, dtype=np.float64)[:, None, None]
    er, ei = cis(nn * ph)
    en_re = (er * a_vals).astype(np.float32)
    en_im = (ei * a_vals).astype(np.float32)

    f32 = lambda x: np.ascontiguousarray(x, np.float32)
    opt = lambda x: None if x is None else f32(x)
    return {
        "a_re": opt(a_re), "a_im": opt(a_im),
        "a1_re": opt(a1_re), "a1_im": opt(a1_im),
        "a2_re": opt(a2_re), "a2_im": opt(a2_im),
        "b_re": f32(b_re), "b_im": f32(b_im),
        "k_head_re": f32(k_head_re), "k_head_im": f32(k_head_im),
        "k_tail_re": f32(k_tail_re), "k_tail_im": f32(k_tail_im),
        "en_re": en_re, "en_im": en_im,
        "n_m": n_m,
    }


def tapered_dft_of(vector: np.ndarray, n_bins: int,
                   window_type: WindowType | int) -> np.ndarray:
    """Host-side f64 tapered DFT of a fixed length-N vector at bins
    [0, n_bins) — for trace-time constants like the Ehlers rank-1
    correction spectrum (`extract.frame_highpassed`).

    Factored two-step (j = u*J2 + v, mod-1 folded phases per factor):
    the direct [N, K] outer-product basis is ~30 GB of host f64 at
    window 262144 / 14564 bins and was ~25 min of single-threaded trig
    at TRACE time; the factored form peaks at [N/128, K] (~240 MB) with
    the same f64 arithmetic.
    """
    n = len(vector)
    from wavespec_tpu.ops.windows import _window_np

    t = _window_np(n, WindowType(int(window_type)))
    tv = t * np.asarray(vector, np.float64)
    j2 = min(128, n)
    j1 = -(-n // j2)
    if j1 * j2 != n:
        tv = np.pad(tv, (0, j1 * j2 - n))
    k = np.arange(n_bins, dtype=np.float64)

    def cs(ph):
        ph = ph - np.round(ph)
        return np.cos(-2 * np.pi * ph), np.sin(-2 * np.pi * ph)

    cv, sv = cs(np.outer(np.arange(j2, dtype=np.float64), k) / n)
    inner_re = tv.reshape(j1, j2) @ cv            # [J1, K]
    inner_im = tv.reshape(j1, j2) @ sv
    cu, su = cs(np.outer(np.arange(j1, dtype=np.float64) * j2, k) / n)
    re = (cu * inner_re - su * inner_im).sum(0)
    im = (cu * inner_im + su * inner_re).sum(0)
    return (re + 1j * im).astype(np.complex64)


def _matmul(x, w_re, w_im):
    re = jnp.einsum("...u,uk->...k", x, w_re, precision=_HIGHEST)
    im = jnp.einsum("...u,uk->...k", x, w_im, precision=_HIGHEST)
    return re, im


def _stable_matmul(x, w_re, w_im):
    """Context-independent ``[..., U] x [U, K]`` contraction.

    XLA's dot emission is fusion-context-dependent on CPU (the SAME
    [1, N] x [N, KM] anchor einsum rounded ~1e-7-relative differently
    inside a scan body vs standalone), which breaks the bitwise
    chunked==one-shot contract of the resumable v757 paths. Explicit
    products (pinned to their own rounding by optimization_barrier) +
    a fixed pairwise-halving add tree give every output an evaluation
    order fixed by the graph — `extract._stable_row_sum`'s technique
    lifted to a matmul. Costs a [..., U, K] materialization; only the
    `pin=True` (resumable/online) paths pay it.
    """
    u = x.shape[-1]
    size = 1 << max(u - 1, 0).bit_length()

    def one(w):
        p = jax.lax.optimization_barrier(x[..., :, None] * w)
        p = jnp.pad(p, [(0, 0)] * (p.ndim - 2) + [(0, size - u), (0, 0)])
        s = size
        while s > 1:
            s //= 2
            p = p[..., :s, :] + p[..., s:, :]
        return p[..., 0, :]

    return one(w_re), one(w_im)


@partial(
    jax.jit,
    static_argnames=("window", "n_bins", "window_type", "chunk", "pin",
                     "k_lo"),
)
def sliding_band_spec(
    series: jax.Array,
    window: int,
    n_bins: int,
    window_type: WindowType | int = WindowType.NONE,
    chunk: int = 128,
    pin: bool = False,
    k_lo: int = 0,
) -> jax.Array:
    """Tapered band spectrum of EVERY hop=1 window of ``series``.

    series: [..., L] f32; frame n covers samples [n, n+window).
    Returns complex64 [..., T, n_bins] with T = L - window + 1, equal (to
    f32 rounding) to ``DFT(frame_series(series) * taper)[..., :n_bins]``.

    ``k_lo > 0`` skips the DFT work for bins [0, k_lo) and returns exact
    ZEROS there (shape unchanged): every internal table/contraction is
    per-bin, so the kept bins are untouched. Callers that never read
    below their analysis band (v757 reads only [k_min-1, k_max+2]) drop
    ~1/3 of the anchor-basis FLOPs and memory this way — at window
    262144 the difference between a fitting and a non-fitting program.

    Chunked: frames are grouped in blocks of ``chunk``; each block anchors
    on an exact framed DFT of its first window (bounding the closed-form
    resummation error to ``chunk`` steps) and reaches the rest by causal
    convolution.  Appending samples never changes earlier frames' values:
    each output row reads only samples [n0, n+window) and the per-row
    contraction order is fixed.

    ``pin=True`` wraps every dot operand/result and every multiply that
    feeds an add in `jax.lax.optimization_barrier`, making the
    arithmetic identical in EVERY fusion context (CPU XLA forms FMAs and
    fuses skinny dots context-dependently, ~1e-7-relative drift between
    the same block computed standalone vs inside a larger program). The
    v757 resumable/online paths require this for bitwise chunk parity;
    the default batch path stays unpinned (fusion is its performance).
    """
    pb = jax.lax.optimization_barrier if pin else (lambda x: x)
    # Pinned matmuls: `_stable_matmul`'s explicit-product pairwise tree
    # exists for CPU XLA, whose LLVM codegen forms FMAs/reassociates dot
    # reductions fusion-context-dependently. On TPU an MXU dot's
    # accumulation order is a function of the operand SHAPES (which this
    # resumable path pins to the canonical block everywhere), so the
    # plain einsum is already context-independent — and the explicit
    # [..., U, K] product materialization is catastrophic at fleet batch
    # (B=128 anchors: a 2.4 GB intermediate, chip-measured 85 ms/tick vs
    # ~1 ms with the MXU dot; bitwise chunk==one-shot parity on-chip is
    # verified by benchmarks/verify_online_chip.py). The surrounding
    # elementwise arithmetic keeps its barriers on every backend.
    mm = (
        _stable_matmul
        if pin and jax.default_backend() == "cpu"
        else _matmul
    )
    wt = int(WindowType(int(window_type)))
    n = window
    if not 0 <= k_lo < n_bins:
        raise ValueError(f"k_lo {k_lo} outside [0, {n_bins})")
    kb = n_bins - k_lo
    tabs = _tables(n, n_bins, chunk, wt, k_lo)
    lead = series.shape[:-1]
    length = series.shape[-1]
    t_frames = length - n + 1
    if t_frames < 1:
        raise ValueError(f"series length {length} < window {n}")
    n_chunk = -(-t_frames // chunk)
    # one sample beyond the last frame's window: the tail conv operand is
    # [n_chunk, C] wide though its final column is never read (frame n
    # only reads tail columns t < n within the chunk).
    pad = n + n_chunk * chunk - length
    s = series.astype(jnp.float32)
    if pad:
        s = jnp.pad(s, [(0, 0)] * len(lead) + [(0, pad)])

    from wavespec_tpu.extract import frame_series

    # 1) anchor DFTs: windows at chunk starts contracted against the
    # e^{-2pi i phi j} basis.
    w0 = pb(frame_series(s, n, chunk)[..., :n_chunk, :])  # [.., n_chunk, N]
    j2, km = tabs["b_re"].shape
    j1 = -(-n // j2)
    b_re, b_im = jnp.asarray(tabs["b_re"]), jnp.asarray(tabs["b_im"])
    lead_rows = 1
    for d_ in lead:
        lead_rows *= int(d_)
    two_level = tabs["a_re"] is None       # j1 > 256 (see _tables)
    if two_level and pin:
        raise ValueError(
            f"pin=True is unsupported at window {n}: the bitwise "
            "fixed-order anchor would need O(window * bins) collapsed-"
            "basis constants (30 GB at 262144) — use the default path"
        )
    if two_level:
        # THREE-step anchor (j = (u1*U2 + u2)*J2 + v): the [J1, K*M]
        # a-table itself is ~470 MB x2 of jit constants at window
        # 262144 and broke the remote-compile transport; ship the two
        # u-factors (~11 MB) and fold them in as two mul-reduce levels
        # over runtime tensors instead.
        w0f = w0
        if j1 * j2 != n:
            w0f = jnp.pad(
                w0, [(0, 0)] * (w0.ndim - 1) + [(0, j1 * j2 - n)])
        w0f = w0f.reshape(*lead, n_chunk, j1, j2)
        i_re, i_im = mm(w0f, b_re, b_im)       # [.., n_chunk, j1, K*M]
        u2n = tabs["a2_re"].shape[0]
        i_re = i_re.reshape(*lead, n_chunk, j1 // u2n, u2n, km)
        i_im = i_im.reshape(*lead, n_chunk, j1 // u2n, u2n, km)
        a2r, a2i = jnp.asarray(tabs["a2_re"]), jnp.asarray(tabs["a2_im"])
        s_re = jnp.sum(a2r * i_re - a2i * i_im, axis=-2)  # [.., U1, K*M]
        s_im = jnp.sum(a2r * i_im + a2i * i_re, axis=-2)
        a1r, a1i = jnp.asarray(tabs["a1_re"]), jnp.asarray(tabs["a1_im"])
        y0_re = jnp.sum(a1r * s_re - a1i * s_im, axis=-2)
        y0_im = jnp.sum(a1r * s_im + a1i * s_re, axis=-2)
    elif not pin and lead_rows * n_chunk < 256:
        # FACTORED anchor (j = u*J2 + v two-step, like the four-step
        # FFT): with few anchor rows the collapsed [N, K*M] basis is
        # both memory-bound (300 MB x2 at window 16384 / 913 bins,
        # re-read 6x by the HIGHEST-precision passes) and tile-starved
        # (M = rows). Two-step never materializes it and puts rows*J1
        # on the matmul M dim: the v757@16384 B=1 spectral stage
        # measured 6.77 ms -> see benchmarks/probe_v757_spectral.py.
        # Large-row batches keep the collapsed form (its basis reads
        # amortize and the factored [.., J1, K*M] intermediate would
        # exceed them); the pinned path keeps the one fixed-order
        # contraction its bitwise chunk-parity contract documents.
        w0f = w0
        if j1 * j2 != n:
            w0f = jnp.pad(
                w0, [(0, 0)] * (w0.ndim - 1) + [(0, j1 * j2 - n)])
        w0f = w0f.reshape(*lead, n_chunk, j1, j2)
        i_re, i_im = mm(w0f, b_re, b_im)       # [.., n_chunk, j1, K*M]
        a_re, a_im = jnp.asarray(tabs["a_re"]), jnp.asarray(tabs["a_im"])
        y0_re = jnp.sum(a_re * i_re - a_im * i_im, axis=-2)
        y0_im = jnp.sum(a_re * i_im + a_im * i_re, axis=-2)
    else:
        a_re, a_im = jnp.asarray(tabs["a_re"]), jnp.asarray(tabs["a_im"])
        basis_re = (a_re[:, None, :] * b_re[None, :, :]
                    - a_im[:, None, :] * b_im[None, :, :]).reshape(
                        j1 * j2, km)[:n]
        basis_im = (a_re[:, None, :] * b_im[None, :, :]
                    + a_im[:, None, :] * b_re[None, :, :]).reshape(
                        j1 * j2, km)[:n]
        y0_re, y0_im = mm(w0, basis_re, basis_im)  # [.., n_chunk, K*M]
    n_m = tabs["n_m"]
    y0_re = pb(y0_re).reshape(*lead, n_chunk, kb, n_m)
    y0_im = pb(y0_im).reshape(*lead, n_chunk, kb, n_m)

    # 2) spread anchors over the chunk: P0[c, n, k] = sum_m En[n,k,m] Y0[c,k,m].
    # As an unrolled M-term broadcast-FMA chain, NOT an einsum: the dot
    # form makes k a batch dim (230 tiny [C,M]@[M,...] matmuls + two
    # [.., C, K] layout transposes) — m <= 5, so elementwise FMAs fuse
    # into a single output pass instead.
    en_re, en_im = jnp.asarray(tabs["en_re"]), jnp.asarray(tabs["en_im"])
    p_re = jnp.zeros((*lead, n_chunk, chunk, kb), jnp.float32)
    p_im = p_re
    for mi in range(tabs["n_m"]):
        er, ei = en_re[:, :, mi], en_im[:, :, mi]          # [C, K]
        yr = y0_re[..., :, None, :, mi]                     # [.., c, 1, K]
        yi = y0_im[..., :, None, :, mi]
        p_re = p_re + (pb(er * yr) - pb(ei * yi))
        p_im = p_im + (pb(er * yi) + pb(ei * yr))

    # 3) causal convolutions. Chunk-local operands: head x[c, t] = s[c*C+t],
    # tail x[c, t] = s[c*C+t+N]; frame rows Fz[c, n, u] = x[c, n+u-(C-1)]
    # (zero below the chunk start) so out[n, k] = sum_u Fz[n, u] Kmat[u, k].
    c = chunk
    head = s[..., : n_chunk * c].reshape(*lead, n_chunk, c)
    tail = s[..., n : n + n_chunk * c].reshape(*lead, n_chunk, c)

    def conv_frames(x):
        z = jnp.concatenate(
            [jnp.zeros((*x.shape[:-1], c - 1), x.dtype), x[..., : c - 1]],
            axis=-1,
        )
        return frame_series(z, c - 1, 1)  # [.., n_chunk, C, C-1]

    fh = pb(conv_frames(head))
    ft = pb(conv_frames(tail))
    h_re, h_im = mm(
        fh, jnp.asarray(tabs["k_head_re"]), jnp.asarray(tabs["k_head_im"])
    )
    t_re, t_im = mm(
        ft, jnp.asarray(tabs["k_tail_re"]), jnp.asarray(tabs["k_tail_im"])
    )

    spec_re = (pb(p_re) + pb(t_re) - pb(h_re)).reshape(
        *lead, n_chunk * c, kb)
    spec_im = (pb(p_im) + pb(t_im) - pb(h_im)).reshape(
        *lead, n_chunk * c, kb)
    if k_lo:
        widths = [(0, 0)] * (spec_re.ndim - 1) + [(k_lo, 0)]
        spec_re = jnp.pad(spec_re, widths)
        spec_im = jnp.pad(spec_im, widths)
    return jax.lax.complex(spec_re[..., :t_frames, :],
                           spec_im[..., :t_frames, :])
