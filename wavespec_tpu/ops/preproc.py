"""Time/frequency preprocessing op library.

TPU rebuild of the bridge's preprocessing ops
(`Legacy/WaveSpecZZ_1.0.4-core.mq5:61-74` imports; stage drivers
`:123-433`; also `Legacy/WaveSpecZZ_1.0.4-parallel.mq5:31-37`):

  gpu_zero_pad_time_series   -> zero_pad
  gpu_resample_time_series   -> resample          (factor, low-pass cutoff)
  gpu_remove_dc_time_series  -> ops.detrend.remove_dc
  gpu_spectral_denoise       -> spectral_denoise  (subtraction flavor)
  gpu_spectral_upscale       -> spectral_upscale  (interpolation/zoom)
  gpu_apply_mask             -> apply_mask (+ build_band_mask / zigzag blend)
  gpu_spectral_convolution   -> spectral_convolution (Gaussian kernel)
  gpu_spectral_correlation   -> spectral_correlation
  gpu_spectral_phase_unwrap  -> ops.phase.unwrap_phase

All frequency-domain ops take/return the **complex n//2-bin layout** from
`ops.spectrum.rfft_bins`; interleaved adapters for bridge-layout parity
live in `ops.spectrum`. The closed DLL's exact numerics are unobservable;
each op documents the principled definition used here (caller-visible
parameters and their defaults match `1.0.4-core.mq5:28-59`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("pad_left", "pad_right"))
def zero_pad(series: jax.Array, pad_left: int = 0, pad_right: int = 0) -> jax.Array:
    """Zero-pad along the last axis (`gpu_zero_pad_time_series`)."""
    pads = [(0, 0)] * (series.ndim - 1) + [(max(0, pad_left), max(0, pad_right))]
    return jnp.pad(series, pads)


def _sinc_lowpass_kernel(cutoff: float, taps: int = 63) -> np.ndarray:
    """Hann-windowed-sinc low-pass FIR (cutoff in cycles/sample, 0..0.5)."""
    cutoff = min(0.5, max(1e-4, cutoff))
    m = np.arange(taps) - (taps - 1) / 2.0
    h = 2.0 * cutoff * np.sinc(2.0 * cutoff * m)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(taps) / (taps - 1)))
    h = h * w
    return (h / h.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("out_len", "cutoff", "method", "taps"))
def resample(
    series: jax.Array,
    out_len: int,
    cutoff: float = 0.45,
    method: int = 0,
    taps: int = 63,
) -> jax.Array:
    """Resample the last axis to `out_len` samples (`gpu_resample_time_series`).

    The bridge takes a `factor`; callers compute ``out_len = ceil(len *
    factor)`` (and re-invoke to force an exact target length,
    `1.0.4-core.mq5:150-202` — with a static out_len one call suffices).
    method 0: windowed-sinc low-pass at `cutoff` (cycles/sample of the
    *input* rate) + linear interpolation; method 1: interpolation only.
    """
    x = series.astype(jnp.float32)
    n = x.shape[-1]
    if method == 0:
        # An even tap count would make the VALID conv output n+1 samples
        # (pad = taps//2 on both sides) and break the reshape back to n;
        # widen to the next odd count (same cutoff, symmetric kernel).
        taps = taps | 1
        k = jnp.asarray(_sinc_lowpass_kernel(cutoff, taps))
        pad = taps // 2
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
        flat = xp.reshape(-1, 1, xp.shape[-1])
        y = jax.lax.conv_general_dilated(
            flat, k.reshape(1, 1, taps), (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        x = y.reshape(*x.shape[:-1], n)
    # linear interpolation onto the new grid (endpoints preserved)
    pos = jnp.linspace(0.0, n - 1.0, out_len)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = pos - lo.astype(jnp.float32)
    return x[..., lo] * (1.0 - frac) + x[..., hi] * frac


@partial(jax.jit, static_argnames=("method", "iterations"))
def spectral_denoise(
    spec: jax.Array,
    method: int = 0,
    threshold: float = 0.10,
    beta: float = 0.75,
    iterations: int = 1,
) -> jax.Array:
    """Spectral-subtraction denoise (`gpu_spectral_denoise`).

    Definition (method 0): per iteration the noise floor is
    ``threshold * mean(|X|)``; magnitudes shrink by ``beta * floor`` and
    clamp at 0; phase is preserved. Defaults threshold=0.10, beta=0.75,
    iterations=1 (`1.0.4-core.mq5:44-46`).
    """
    del method
    out = spec
    for _ in range(max(1, iterations)):
        mag = jnp.abs(out)
        floor = threshold * jnp.mean(mag, axis=-1, keepdims=True)
        new_mag = jnp.maximum(mag - beta * floor, 0.0)
        scale = jnp.where(mag > 0, new_mag / jnp.maximum(mag, 1e-30), 0.0)
        out = out * scale
    return out


@partial(jax.jit, static_argnames=("factor", "mode", "normalize"))
def spectral_upscale(
    spec: jax.Array, factor: float = 2.0, mode: int = 0, normalize: bool = True
) -> jax.Array:
    """Spectral interpolation/zoom to ``round(bins*factor)`` bins
    (`gpu_spectral_upscale`). mode 0: linear interpolation of re/im.
    normalize keeps total spectral energy unchanged."""
    del mode
    bins = spec.shape[-1]
    out_bins = max(2, int(round(bins * factor)))
    pos = jnp.linspace(0.0, bins - 1.0, out_bins)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, bins - 1)
    hi = jnp.clip(lo + 1, 0, bins - 1)
    frac = (pos - lo.astype(jnp.float32)).astype(jnp.float32)
    out = spec[..., lo] * (1.0 - frac) + spec[..., hi] * frac
    if normalize:
        e_in = jnp.sum(jnp.abs(spec) ** 2, axis=-1, keepdims=True)
        e_out = jnp.sum(jnp.abs(out) ** 2, axis=-1, keepdims=True)
        out = out * jnp.sqrt(e_in / jnp.maximum(e_out, 1e-30))
    return out


def build_band_mask(
    bins: int,
    low: float = 0.15,
    high: float = 0.85,
    zigzag_bins: jax.Array | None = None,
    zigzag_width: int = 2,
    zigzag_blend: float = 0.65,
    dtype=jnp.float32,
) -> jax.Array:
    """CPU-side mask builder parity (`BuildMaskArray`, `1.0.4-core.mq5:224-264`).

    Band-pass by *position ratio* over the bin array: mask=1 where
    ``low <= i/(bins-1) <= high``. Optionally blends in a ZigZag-derived
    mask: 1 in +/-zigzag_width around each listed bin, combined as
    ``(1-blend)*band + blend*zig``.
    """
    low = min(1.0, max(0.0, low))
    high = max(low, min(1.0, max(0.0, high)))
    ratio = jnp.arange(bins, dtype=jnp.float32) / max(1, bins - 1)
    mask = ((ratio >= low) & (ratio <= high)).astype(dtype)
    if zigzag_bins is not None:
        i = jnp.arange(bins)[None, :]
        centers = jnp.asarray(zigzag_bins).astype(jnp.int32)[:, None]
        hit = (jnp.abs(i - centers) <= max(0, zigzag_width)).any(axis=0)
        blend = min(1.0, max(0.0, zigzag_blend))
        mask = (1.0 - blend) * mask + blend * hit.astype(dtype)
    return mask


@jax.jit
def apply_mask(spec: jax.Array, mask: jax.Array) -> jax.Array:
    """Multiply spectrum bins by a real or complex mask (`gpu_apply_mask`,
    mode 0 = multiplicative)."""
    return spec * mask


def build_gaussian_kernel(
    bins: int,
    period: float = 32.0,
    bandwidth: float = 0.04,
    gain: float = 1.0,
) -> jax.Array:
    """Gaussian frequency kernel centered at 1/period
    (`BuildConvolutionKernel`, `1.0.4-core.mq5:266-282`):
    ``K[i] = gain * exp(-(i/bins - 1/period)^2 / (2*bw^2))``."""
    period = max(4.0, period)
    bw = min(0.5, max(1e-4, bandwidth))
    freq = np.arange(bins, dtype=np.float64) / bins
    delta = freq - 1.0 / period
    k = max(0.0, gain) * np.exp(-(delta**2) / (2.0 * bw * bw))
    return jnp.asarray(k, jnp.float32)


@jax.jit
def spectral_convolution(spec: jax.Array, kernel: jax.Array) -> jax.Array:
    """Frequency-domain convolution = per-bin product with the kernel
    (`gpu_spectral_convolution`, mode 0)."""
    return spec * kernel


@jax.jit
def spectral_correlation(spec: jax.Array, kernel: jax.Array) -> jax.Array:
    """Frequency-domain correlation = product with the conjugate kernel
    (`gpu_spectral_correlation`; equals convolution for real kernels)."""
    return spec * jnp.conj(kernel)
