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


def _window_np(n: int, wt: WindowType) -> np.ndarray:
    """Host-side float64 coefficients (single source for both the device
    vector and scalar derivations like the coherent gain)."""
    if n <= 1 or wt == WindowType.NONE:
        return np.ones((n,), dtype=np.float64)
    i = np.arange(n, dtype=np.float64)
    x = 2.0 * np.pi * i / (n - 1)
    if wt == WindowType.HANN:
        return 0.5 * (1.0 - np.cos(x))
    if wt == WindowType.HAMMING:
        return 0.54 - 0.46 * np.cos(x)
    if wt == WindowType.BLACKMAN:
        return 0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2.0 * x)
    if wt == WindowType.BARTLETT:
        return 1.0 - np.abs((2.0 * i - (n - 1)) / (n - 1))
    raise ValueError(f"unknown window type {wt}")  # pragma: no cover


def window_coefficients(
    n: int, window_type: WindowType | int, dtype=jnp.float32
) -> jax.Array:
    """Return the length-``n`` taper coefficient vector.

    ``n`` must be static (Python int): the reference enforces power-of-2
    windows (`Legacy/WaveSpecZZ_1.0.4-kalman.mq5:62-66`) and we keep shapes
    static for XLA. Computed host-side so it stays a true constant even
    when called inside a jit trace.
    """
    # Cast host-side first: handing jnp a float64 ndarray trips the x64
    # truncation UserWarning on every call even when dtype is given.
    coeffs = np.asarray(_window_np(n, WindowType(int(window_type))), dtype=dtype)
    return jnp.asarray(coeffs)


def coherent_gain(n: int, window_type: WindowType | int) -> float:
    """Mean of the taper coefficients (host-side float, usable at trace time).

    Scales |X_k| back to true sinusoid amplitude: amp = 2|X_k| / (N * cg).
    """
    if n <= 1:
        return 1.0
    return float(_window_np(n, WindowType(int(window_type))).mean())


@partial(jax.jit, static_argnames=("window_type",))
def apply_window(data: jax.Array, window_type: WindowType | int) -> jax.Array:
    """Apply a taper window along the last axis (broadcasts over batch dims)."""
    n = data.shape[-1]
    w = window_coefficients(n, window_type, dtype=data.dtype)
    return data * w
