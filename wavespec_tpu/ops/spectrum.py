"""Real FFT, power spectrum, band scan, and top-k dominant-cycle picking.

This is the TPU rebuild of the bridge FFT contract and the CPU band scan:
- `gpu_fft_real_forward(in, len, out)` returns interleaved re/im pairs,
  ``len`` doubles = ``len/2`` bins (unpacked at
  `WaveSpecZZ_1.1.0-gpuopt.mq5:520-531`). We expose both a complex-bin API
  (idiomatic JAX) and the interleaved layout for parity tests.
- power spectrum ``re^2 + im^2`` over N/2 bins
  (`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:3497-3501`).
- candidate band ``k in [ceil(N/maxP), floor(N/minP)]``, period ``N/k``
  (`...pla-kalman.mq5:3505-3516`), and top-k by power
  (`...nodetrend.mq5:536-554`, `Legacy/WaveSpecZZ_1.0.4-kalman.mq5:159-179`).

All ops are batch-first: shapes ``[..., n]`` -> ``[..., n//2]`` etc., so a
rolling-STFT batch of thousands of windows compiles to one fused XLA
program. The hot fused path lives in `wavespec_tpu.kernels`; these are the
reference-precision building blocks and oracles.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def rfft_bins(data: jax.Array) -> jax.Array:
    """Forward real FFT returning the first ``n//2`` complex bins.

    The reference bridge emits exactly ``n/2`` bins (DC .. below-Nyquist);
    `jnp.fft.rfft` emits ``n/2+1`` — we drop the Nyquist bin to match.
    """
    n = data.shape[-1]
    return jnp.fft.rfft(data, axis=-1)[..., : n // 2]


def rfft_interleaved(data: jax.Array) -> jax.Array:
    """Bridge-layout forward rFFT: interleaved [re0, im0, re1, im1, ...].

    Output has the same length as the input (``n`` reals = ``n/2`` bins),
    matching `gpu_fft_real_forward`'s packing.
    """
    spec = rfft_bins(data)
    out = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    return out.reshape(*data.shape[:-1], data.shape[-1]).astype(data.dtype)


def irfft_from_bins(spec: jax.Array, n: int) -> jax.Array:
    """Inverse of `rfft_bins`: n//2 complex bins -> length-n real series.

    Parity target: `gpu_fft_real_inverse` (`Legacy/WaveSpecZZ_1.0.4-core.mq5:65`).
    The dropped Nyquist bin is treated as zero.
    """
    nyquist = jnp.zeros(spec.shape[:-1] + (1,), dtype=spec.dtype)
    full = jnp.concatenate([spec, nyquist], axis=-1)
    return jnp.fft.irfft(full, n=n, axis=-1)


def irfft_from_interleaved(inter: jax.Array) -> jax.Array:
    """Inverse rFFT from the bridge's interleaved re/im layout."""
    n = inter.shape[-1]
    pairs = inter.reshape(*inter.shape[:-1], n // 2, 2)
    spec = jax.lax.complex(pairs[..., 0], pairs[..., 1])
    return irfft_from_bins(spec, n).astype(inter.dtype)


def power_spectrum(spec: jax.Array) -> jax.Array:
    """``|X_k|^2 = re^2 + im^2`` (no normalization, as in the reference)."""
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def band_indices(n: int, min_period: float, max_period: float) -> tuple[int, int]:
    """Static candidate-bin band: ``[ceil(n/maxP), floor(n/minP)]`` inclusive.

    Bin k corresponds to period ``n/k`` bars.
    """
    k_min = int(math.ceil(n / max_period))
    k_max = int(math.floor(n / min_period))
    k_max = min(k_max, n // 2 - 1)
    k_min = max(k_min, 1)  # never the DC bin
    return k_min, k_max


def band_mask(n: int, min_period: float, max_period: float, dtype=jnp.float32) -> jax.Array:
    """[n//2] multiplicative 0/1 mask selecting the candidate band."""
    k_min, k_max = band_indices(n, min_period, max_period)
    k = jnp.arange(n // 2)
    return ((k >= k_min) & (k <= k_max)).astype(dtype)


@partial(jax.jit, static_argnames=("top_k", "min_period", "max_period", "n"))
def topk_cycles(
    spectrum: jax.Array,
    *,
    n: int,
    top_k: int = 8,
    min_period: float = 18.0,
    max_period: float = 200.0,
):
    """Pick the ``top_k`` strongest in-band bins by power.

    Args:
      spectrum: ``[..., n//2]`` power spectrum.
      n: FFT window length (static; defines bin->period mapping).

    Returns:
      (indices ``[..., top_k]`` int32, powers ``[..., top_k]``,
       periods ``[..., top_k]`` = n/k). Slots beyond the number of in-band
      bins get power 0. ``jax.lax.top_k`` keeps the whole pick on-device —
      no host round trip, unlike the reference's CPU selection sorts.
    """
    mask = band_mask(n, min_period, max_period, dtype=spectrum.dtype)
    masked = jnp.where(mask > 0, spectrum, jnp.zeros_like(spectrum))
    powers, idx = jax.lax.top_k(masked, top_k)
    periods = n / jnp.maximum(idx.astype(spectrum.dtype), 1.0)
    periods = jnp.where(powers > 0, periods, jnp.zeros_like(periods))
    return idx.astype(jnp.int32), powers, periods
