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
