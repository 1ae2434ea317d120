"""Detrending / DC-removal ops.

Rebuilds, TPU-native:
- the Ehlers-style one-pole high-pass "trend filter" the reference applies
  before the FFT (`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:3422-3435`), and
- `gpu_remove_dc_time_series` modes: mean removal (mode 0) and a one-pole
  leaky DC tracker with ``alpha`` (`Legacy/WaveSpecZZ_1.0.4-core.mq5:204-222`),
- a least-squares linear detrend (used by the PLA feed's per-segment fits and
  by our FFT-path preprocessing, BASELINE config #1).

The recursive filters are first-order linear recurrences
``y[t] = a*y[t-1] + b[t]``; we evaluate them in O(log n) depth with
`jax.lax.associative_scan` so the whole batch of windows stays on the VPU
rather than running a length-N sequential loop per window.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp


def _linear_recurrence(a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
    """Solve y[t] = a[t] * y[t-1] + b[t] (y[-1] = 0) via associative scan."""

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r

    _, y = jax.lax.associative_scan(combine, (a, b), axis=axis)
    return y


@partial(jax.jit, static_argnames=("trend_period",))
def ehlers_highpass_detrend(price: jax.Array, trend_period: int = 1024) -> jax.Array:
    """One-pole high-pass detrend: ``detrended = price - trend``.

    ``trend[j] = c*(p[j] + p[j-1]) + alpha*trend[j-1]`` with
    ``alpha = (1 - sin w)/cos w``, ``c = (1 - alpha)/2``, ``w = 2*pi/period``,
    seeded with ``trend[0] = c*(p[0]+p[0])`` exactly as the reference does.
    Operates along the last axis; batch dims broadcast.
    """
    w = 2.0 * jnp.pi / trend_period
    alpha = (1.0 - jnp.sin(w)) / jnp.cos(w)
    c = (1.0 - alpha) / 2.0
    prev = jnp.concatenate([price[..., :1], price[..., :-1]], axis=-1)
    b = c * (price + prev)
    a = jnp.full_like(price, alpha)
    # Reference seeds trend[0] with no alpha*trend[-1] term; y[-1]=0 matches.
    trend = _linear_recurrence(a, b)
    return price - trend


@partial(jax.jit, static_argnames=("periods",))
def ehlers_highpass_detrend_stacked(
    price: jax.Array, periods: tuple[int, ...]
) -> jax.Array:
    """`ehlers_highpass_detrend` at several cutoff periods in ONE scan.

    Returns ``[..., R, L]`` where row r filters the SAME input at
    ``periods[r]`` — per-row results match the scalar function (the
    recurrence coefficients are elementwise, so stacking rows changes
    neither the combine tree nor the per-row arithmetic). The MUSIC
    per-band preconditioning otherwise runs R sequential length-L
    associative scans whose cost is scan-depth latency, not FLOPs.
    """
    w = 2.0 * jnp.pi / jnp.asarray(periods, price.dtype)   # [R]
    alpha = (1.0 - jnp.sin(w)) / jnp.cos(w)
    c = (1.0 - alpha) / 2.0
    prev = jnp.concatenate([price[..., :1], price[..., :-1]], axis=-1)
    b = c[:, None] * (price[..., None, :] + prev[..., None, :])
    a = jnp.broadcast_to(alpha[:, None], b.shape)
    trend = _linear_recurrence(a, b)
    return price[..., None, :] - trend


@partial(jax.jit, static_argnames=("periods",))
def ehlers_highpass_detrend_rows(
    rows: jax.Array, periods: tuple[int, ...]
) -> jax.Array:
    """Per-row Ehlers high-pass: row r of ``[..., R, L]`` is filtered at
    ``periods[r]``, all rows in ONE associative scan (each row matches
    the scalar filter exactly — the coefficients are elementwise).

    Unlike `ehlers_highpass_detrend_stacked` (one input, R cutoffs) the
    rows here are DIFFERENT series — the MUSIC single-window fallback
    stacks its per-band decimated windows (zero-padded to a common
    length; the filter is causal, so trailing padding cannot affect the
    real prefix) to collapse R sequential latency-bound scans into one.
    """
    w = 2.0 * jnp.pi / jnp.asarray(periods, rows.dtype)   # [R]
    alpha = (1.0 - jnp.sin(w)) / jnp.cos(w)
    c = (1.0 - alpha) / 2.0
    prev = jnp.concatenate([rows[..., :1], rows[..., :-1]], axis=-1)
    b = c[:, None] * (rows + prev)
    a = jnp.broadcast_to(alpha[:, None], b.shape)
    return rows - _linear_recurrence(a, b)


@partial(jax.jit, static_argnames=("periods", "block"))
def ehlers_highpass_detrend_mxu(
    price: jax.Array, periods: tuple[int, ...], block: int = 128
) -> jax.Array:
    """`ehlers_highpass_detrend_stacked` evaluated as MXU matmuls.

    Same filter (one-pole high-pass of the SAME input at R cutoff
    periods, -> ``[..., R, L]``), different evaluation: the trend
    recurrence ``y[t] = alpha*y[t-1] + b[t]`` has a CONSTANT coefficient,
    so over a `block`-sample tile it is a lower-triangular Toeplitz
    matmul ``y_in = A @ b`` with ``A[t, s] = alpha^(t-s)`` — one
    [L/block, block] @ [block, block] MXU contraction per cutoff — plus
    the homogeneous carry ``alpha^(t+1) * y_end[prev block]``, where the
    per-block end values themselves satisfy a block-level recurrence
    with coefficient ``alpha^block`` (another tiny Toeplitz matvec).
    All tables are trace-time NumPy constants.

    Why: `jax.lax.associative_scan` over the ~37k-sample flagship series
    lowers to ~17 levels of strided-slice fusions whose cost is per-op
    dispatch, not data (~70 us PER ROW on the v5e for a 147 KB row —
    the largest block of the MUSIC preconditioning budget). This
    formulation is two matmuls + one FMA: ~15 us for all three bands.
    Numerics: weights ``alpha^j <= 1`` decay monotonically and the
    matmuls run at HIGHEST precision; agreement with the scan
    formulation is ~1e-6 relative (different summation grouping — same
    bound as `ehlers_highpass_blocked`). Used by the MUSIC/ESPRIT
    preconditioning (tolerance-gated); the bitwise-pinned v757 paths
    keep the scan/blocked forms.
    """
    length = price.shape[-1]
    nblk = -(-length // block)
    c, a_tbl, t_tbl, apow = _hp_mxu_tables(periods, block, nblk)
    price = price.astype(jnp.float32)
    prev = jnp.concatenate([price[..., :1], price[..., :-1]], axis=-1)
    b = jnp.asarray(c)[:, None] * (
        price[..., None, :] + prev[..., None, :]
    )                                                     # [..., R, L]
    trend = _hp_mxu_solve(b, a_tbl, t_tbl, apow, nblk, block, length)
    return price[..., None, :] - trend


def _hp_mxu_tables(periods, block: int, nblk: int):
    """Trace-time NumPy constants for the blocked Toeplitz evaluation:
    (c [R], A [R, block, block], T [R, nblk, nblk], apow [R, block])."""
    import numpy as _np

    w64 = 2.0 * _np.pi / _np.asarray(periods, _np.float64)
    alpha = (1.0 - _np.sin(w64)) / _np.cos(w64)
    c = ((1.0 - alpha) / 2.0).astype(_np.float32)
    idx = _np.arange(block)
    e_in = idx[:, None] - idx[None, :]
    a_tbl = _np.where(
        e_in >= 0, alpha[:, None, None] ** _np.maximum(e_in, 0)[None], 0.0
    ).astype(_np.float32)
    ab = alpha**block
    j = _np.arange(nblk)
    e_c = j[:, None] - 1 - j[None, :]
    with _np.errstate(under="ignore"):
        t_tbl = _np.where(
            e_c >= 0, ab[:, None, None] ** _np.maximum(e_c, 0)[None], 0.0
        ).astype(_np.float32)
        apow = (alpha[:, None] ** _np.arange(1, block + 1)[None]).astype(
            _np.float32
        )
    return c, a_tbl, t_tbl, apow


def _hp_mxu_solve(b: jax.Array, a_tbl, t_tbl, apow, nblk: int, block: int,
                  length: int) -> jax.Array:
    """Solve the trend recurrence for driving term ``b [..., R, L]`` via
    in-block Toeplitz matmuls + the block-carry correction."""
    pad = nblk * block - length
    if pad:
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, pad)])
    bb = b.reshape(*b.shape[:-1], nblk, block)
    hp = jax.lax.Precision.HIGHEST
    y_in = jnp.einsum("rts,...rns->...rnt", jnp.asarray(a_tbl), bb,
                      precision=hp)
    carry_prev = jnp.einsum("rnj,...rj->...rn", jnp.asarray(t_tbl),
                            y_in[..., -1], precision=hp)
    y = y_in + carry_prev[..., None] * jnp.asarray(apow)[:, None, :]
    return y.reshape(*y.shape[:-2], nblk * block)[..., :length]


@partial(jax.jit, static_argnames=("periods", "block"))
def ehlers_highpass_detrend_rows_mxu(
    rows: jax.Array, periods: tuple[int, ...], block: int = 128
) -> jax.Array:
    """`ehlers_highpass_detrend_rows` (row r of ``[..., R, L]`` filtered
    at ``periods[r]``) evaluated as blocked MXU Toeplitz matmuls — same
    launch-bound-scan fix as `ehlers_highpass_detrend_mxu`, for the
    in-window per-band path where each row is a DIFFERENT series."""
    length = rows.shape[-1]
    nblk = -(-length // block)
    c, a_tbl, t_tbl, apow = _hp_mxu_tables(periods, block, nblk)
    rows = rows.astype(jnp.float32)
    prev = jnp.concatenate([rows[..., :1], rows[..., :-1]], axis=-1)
    b = jnp.asarray(c)[:, None] * (rows + prev)
    return rows - _hp_mxu_solve(b, a_tbl, t_tbl, apow, nblk, block, length)


@partial(
    jax.jit,
    static_argnames=("trend_period", "block", "return_carry"),
)
def ehlers_highpass_blocked(
    price: jax.Array,
    trend_period: int = 1024,
    block: int = 128,
    carry: tuple[jax.Array, jax.Array] | None = None,
    return_carry: bool = False,
):
    """`ehlers_highpass_detrend` with bitwise-resumable block boundaries.

    The plain associative-scan filter is prefix-invariant (appending
    samples never changes earlier outputs) but NOT suffix-computable: a
    resumed computation cannot reproduce the canonical combine tree from
    a carried scalar state. This variant fixes the arithmetic per
    `block`-sample segment — inside each block a fixed-shape associative
    scan solves the recurrence from zero state, then the carried trend
    folds in as an exact ``alpha^(j+1) * trend_carry`` correction (the
    homogeneous solution) — so ``hp[j]`` depends only on (carry at the
    block start, the block's samples), and resuming from any block
    boundary with the carried ``(trend_last, price_last)`` reproduces the
    one-shot run BITWISE. This is the spectral-stage resumability the
    v757 online driver needs (`V757Config(resumable=True)` routes the
    pipeline's detrend here); it matches the plain filter to ~1e-6
    relative (same math, different summation grouping).

    ``price``: [..., L]; blocks are aligned to index 0 of the LAST axis,
    so a resumed call must start at a multiple of ``block`` of the
    original stream (the driver keeps its buffers 128-aligned).
    ``carry``: ``(trend_last, price_last)`` [...]-shaped, the state after
    the sample preceding ``price[..., 0]``; None = fresh start (the
    reference seeds ``trend[0] = c*(p[0]+p[0])``, i.e. carry
    ``(0, price[..., 0])``). With ``return_carry=True`` returns
    ``(hp, (trend_last, price_last))`` — L must then be a block multiple
    so the carry is taken after a full real block.
    """
    w = 2.0 * jnp.pi / trend_period
    alpha = (1.0 - jnp.sin(w)) / jnp.cos(w)
    c = (1.0 - alpha) / 2.0
    import numpy as _np

    wf = 2.0 * _np.pi / trend_period
    alpha64 = (1.0 - _np.sin(wf)) / _np.cos(wf)
    # alpha^(j+1), j in [0, block): homogeneous propagation of the carry
    apow = jnp.asarray(
        (alpha64 ** _np.arange(1, block + 1)).astype(_np.float32)
    )

    price = price.astype(jnp.float32)
    lead = price.shape[:-1]
    length = price.shape[-1]
    if return_carry and length % block:
        raise ValueError(
            f"return_carry needs a block-multiple length, got {length}"
        )
    nblk = -(-length // block)
    pad = nblk * block - length
    pb = jnp.pad(price, [(0, 0)] * len(lead) + [(0, pad)]) if pad else price
    pb = pb.reshape(*lead, nblk, block)
    pb = jnp.moveaxis(pb, -2, 0)                       # [nblk, ..., block]

    if carry is None:
        trend0 = jnp.zeros(lead, jnp.float32)
        p0 = price[..., 0]
    else:
        trend0 = jnp.asarray(carry[0], jnp.float32)
        p0 = jnp.asarray(carry[1], jnp.float32)
    from wavespec_tpu.utils.vma import pvary_like

    trend0, p0 = pvary_like(
        (jnp.broadcast_to(trend0, lead), jnp.broadcast_to(p0, lead)), price
    )

    def step(cr, blk):
        trend_c, p_c = cr
        prev = jnp.concatenate([p_c[..., None], blk[..., :-1]], axis=-1)
        b = c * (blk + prev)
        a = jnp.full_like(blk, alpha)
        trend = _linear_recurrence(a, b) + apow * trend_c[..., None]
        return (trend[..., -1], blk[..., -1]), blk - trend

    cr, hp = jax.lax.scan(step, (trend0, p0), pb)
    hp = jnp.moveaxis(hp, 0, -2).reshape(*lead, nblk * block)[..., :length]
    if return_carry:
        return hp, cr
    return hp


class DcMode(enum.IntEnum):
    """`gpu_remove_dc_time_series` mode ids (mode 0 = mean removal default)."""

    MEAN = 0
    LEAKY = 1


@partial(jax.jit, static_argnames=("mode",))
def remove_dc(data: jax.Array, mode: DcMode | int = DcMode.MEAN, alpha: float = 0.98) -> jax.Array:
    """DC removal along the last axis.

    mode 0: subtract the window mean. mode 1: one-pole leaky DC tracker
    ``dc[t] = alpha*dc[t-1] + (1-alpha)*x[t]``, subtracted from the signal
    (`Legacy/WaveSpecZZ_1.0.4-core.mq5:204-222` — alpha default 0.98).
    """
    mode = DcMode(int(mode))
    if mode == DcMode.MEAN:
        return data - jnp.mean(data, axis=-1, keepdims=True)
    a = jnp.full_like(data, alpha)
    dc = _linear_recurrence(a, (1.0 - alpha) * data)
    return data - dc


@jax.jit
def linear_detrend(data: jax.Array) -> jax.Array:
    """Least-squares linear detrend along the last axis (BASELINE config #1).

    Closed form via centered first/second moments — two reductions and one
    fused multiply-add per sample; no solve needed.
    """
    n = data.shape[-1]
    t = jnp.arange(n, dtype=data.dtype)
    t_mean = (n - 1) / 2.0
    tc = t - t_mean
    denom = jnp.sum(tc * tc)
    x_mean = jnp.mean(data, axis=-1, keepdims=True)
    slope = jnp.sum(data * tc, axis=-1, keepdims=True) / denom
    return data - x_mean - slope * tc


def linear_trend_fit(data: jax.Array):
    """Return (intercept, slope) of the least-squares line along the last axis."""
    n = data.shape[-1]
    t = jnp.arange(n, dtype=data.dtype)
    t_mean = (n - 1) / 2.0
    tc = t - t_mean
    denom = jnp.sum(tc * tc)
    x_mean = jnp.mean(data, axis=-1)
    slope = jnp.sum(data * tc, axis=-1) / denom
    intercept = x_mean - slope * t_mean
    return intercept, slope
