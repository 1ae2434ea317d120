"""Tick-series builder: irregular ticks -> uniform-grid feed.

Rebuild of `mt_gpu_wave_build_tick_series` (`Legacy/WaveSpecZZ_gpu_wip.mq5:
227-233`, params `:46-55`): resample the last `window_len * interval`
seconds of tick prices onto a uniform grid (forward-fill of the latest
tick at or before each grid instant), optionally smooth with a moving
average, and optionally replace the series with its ZigZag feed
(depth/deviation/backstep/mode as in the bridge signature).

The grid/smoothing path is jitted JAX (this was a device op in the
reference); the optional ZigZag pass reuses the host-side detector.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wavespec_tpu.feeds.zigzag import ZigMode, ZigZagConfig, build_zigzag_feed


@partial(jax.jit, static_argnames=("window_len", "smoothing_window"))
def resample_ticks(
    tick_prices: jax.Array,
    tick_times: jax.Array,
    *,
    window_len: int,
    interval_seconds: float,
    smoothing_window: int = 1,
    end_time: float | None = None,
) -> jax.Array:
    """Uniform series of `window_len` samples ending at `end_time`
    (default: the last tick). Sample t holds the latest tick price at or
    before that grid instant (forward fill; samples before the first tick
    hold the first tick's price)."""
    prices = tick_prices.astype(jnp.float32)
    times = tick_times.astype(jnp.float32)
    t_end = times[-1] if end_time is None else jnp.asarray(end_time, jnp.float32)
    grid = t_end - interval_seconds * jnp.arange(window_len - 1, -1, -1, dtype=jnp.float32)
    idx = jnp.searchsorted(times, grid, side="right") - 1
    series = prices[jnp.clip(idx, 0, prices.shape[0] - 1)]
    if smoothing_window > 1:
        k = smoothing_window
        pad = jnp.concatenate([jnp.repeat(series[:1], k - 1), series])
        csum = jnp.cumsum(pad)
        series = (csum[k - 1 :] - jnp.concatenate([jnp.zeros(1), csum[: window_len - 1]])) / k
    return series


def build_tick_series(
    tick_prices: np.ndarray,
    tick_times: np.ndarray,
    *,
    window_len: int,
    interval_seconds: float,
    smoothing_window: int = 1,
    zig_mode: int = -1,
    zig_cfg: ZigZagConfig = ZigZagConfig(),
) -> np.ndarray:
    """Full bridge-parity builder: resample (+smooth), optional ZigZag."""
    # Normalize epoch timestamps to window-relative seconds on the host:
    # raw unix times truncated to f32 at the jit boundary only resolve to
    # ~128 s, which would scramble the grid lookup.
    times = np.asarray(tick_times, np.float64)
    times = times - times[0]
    series = np.asarray(
        resample_ticks(
            jnp.asarray(tick_prices),
            jnp.asarray(times),
            window_len=window_len,
            interval_seconds=interval_seconds,
            smoothing_window=smoothing_window,
        )
    )
    if zig_mode >= 0:
        series = build_zigzag_feed(series, series, ZigMode(zig_mode), zig_cfg)
    return series
