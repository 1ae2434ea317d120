"""Taper windows applied before the rFFT.

TPU-native rebuild of the reference's in-place CPU taper loops
(`Legacy/WaveSpecZZ_1.0.2.mq5:884-935`, enum default Blackman at
`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:835-842`). The reference uses
*symmetric* windows (denominator ``n-1``); we match that convention.

Windows are precomputed coefficient vectors (computed at trace time for a
static ``n``) so XLA folds them into constants and fuses the multiply into
the surrounding kernel — no per-sample control flow on device.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class WindowType(enum.IntEnum):
    """Matches the reference WINDOW_TYPE enum ordering."""

    NONE = 0
    HANN = 1
    HAMMING = 2
    BLACKMAN = 3
    BARTLETT = 4


def window_coefficients(
    n: int, window_type: WindowType | int, dtype=jnp.float32
) -> jax.Array:
    """Return the length-``n`` taper coefficient vector.

    ``n`` must be static (Python int): the reference enforces power-of-2
    windows (`Legacy/WaveSpecZZ_1.0.4-kalman.mq5:62-66`) and we keep shapes
    static for XLA.
    """
    wt = WindowType(int(window_type))
    if n <= 1:
        return jnp.ones((n,), dtype=dtype)
    # Computed host-side in float64 so it stays a true constant even when
    # called inside a jit trace (and can be consumed by trace-time Python).
    i = np.arange(n, dtype=np.float64)
    x = 2.0 * np.pi * i / (n - 1)
    if wt == WindowType.NONE:
        w = np.ones((n,), dtype=np.float64)
    elif wt == WindowType.HANN:
        w = 0.5 * (1.0 - np.cos(x))
    elif wt == WindowType.HAMMING:
        w = 0.54 - 0.46 * np.cos(x)
    elif wt == WindowType.BLACKMAN:
        w = 0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2.0 * x)
    elif wt == WindowType.BARTLETT:
        w = 1.0 - np.abs((2.0 * i - (n - 1)) / (n - 1))
    else:  # pragma: no cover - exhaustive enum
        raise ValueError(f"unknown window type {window_type}")
    return jnp.asarray(w, dtype=dtype)


def coherent_gain(n: int, window_type: WindowType | int) -> float:
    """Mean of the taper coefficients (host-side float, usable at trace time).

    Scales |X_k| back to true sinusoid amplitude: amp = 2|X_k| / (N * cg).
    """
    wt = WindowType(int(window_type))
    if wt == WindowType.NONE or n <= 1:
        return 1.0
    i = np.arange(n, dtype=np.float64)
    x = 2.0 * np.pi * i / (n - 1)
    if wt == WindowType.HANN:
        w = 0.5 * (1.0 - np.cos(x))
    elif wt == WindowType.HAMMING:
        w = 0.54 - 0.46 * np.cos(x)
    elif wt == WindowType.BLACKMAN:
        w = 0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2.0 * x)
    else:  # BARTLETT
        w = 1.0 - np.abs((2.0 * i - (n - 1)) / (n - 1))
    return float(w.mean())


@partial(jax.jit, static_argnames=("window_type",))
def apply_window(data: jax.Array, window_type: WindowType | int) -> jax.Array:
    """Apply a taper window along the last axis (broadcasts over batch dims)."""
    n = data.shape[-1]
    w = window_coefficients(n, window_type, dtype=data.dtype)
    return data * w
