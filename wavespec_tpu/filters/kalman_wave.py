"""Integrated Kalman wave blend over rolling STFT frames.

Rebuild of the `1.0.4-kalman` / `1.0.4-old` integrated path
(`Legacy/WaveSpecZZ_1.0.4-kalman.mq5:96-231` standalone;
`Legacy/WaveSpecZZ_1.0.4-old.mq5:2562-2770` `UpdateKalmanWave` /
`CollectGpuKalmanValues`): per frame, take the top-k FFT bins of the
(Hann-windowed) trailing window, evaluate each bin's contribution at the
window's newest sample, and recursively regress per-cycle weights against
the measured close — the blended output is the Kalman-smoothed wave
(BASELINE config #3).

TPU formulation: ALL frames' spectra and contributions come from one
batched MXU DFT + one-hot contractions; only the scalar-innovation weight
recursion is a scan.

Faithfulness note: like the reference (`1.0.4-kalman.mq5:283` regresses the
RAW close against Hann-windowed bin contributions, and Hann is ~0 at the
window endpoint n0 = N-1), the basis is purely oscillatory and near-zero
scaled — the regressor must inflate weights to express any price LEVEL, so
absolute tracking error grows with the series' mean level. Feed detrended
or zero-mean series for level-robust blends.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from wavespec_tpu.extract import frame_series
from wavespec_tpu.filters.kalman_weights import (
    KalmanWeightsConfig,
    kalman_weights_filter,
)
from wavespec_tpu.kernels.mxu_fft import rfft_mxu
from wavespec_tpu.ops.spectrum import band_indices
from wavespec_tpu.ops.windows import WindowType, window_coefficients


@dataclasses.dataclass(frozen=True)
class KalmanWaveConfig:
    """Defaults = `1.0.4-kalman.mq5` inputs (`:26-35`)."""

    window: int = 4096
    top_k: int = 8            # InpTopCycles
    min_period: float = 18.0
    max_period: float = 200.0
    apply_hann: bool = True   # InpApplyHann
    weights: KalmanWeightsConfig = KalmanWeightsConfig()
    # Level-robust variant (see faithfulness note above): regress the
    # DEVIATION of the close from the window mean instead of the raw
    # close, and add the mean back to the blend. Off by default =
    # reference-faithful level sensitivity.
    detrend_level: bool = False


@partial(jax.jit, static_argnames=("cfg", "hop"))
def kalman_wave(series: jax.Array, cfg: KalmanWaveConfig = KalmanWaveConfig(),
                hop: int = 1):
    """Run the integrated blend over a series.

    Returns (blended [t_frames], weights_final [top_k], basis [t_frames,
    top_k]). Frame f covers bars [f*hop, f*hop + window); the measurement
    is that frame's newest close.
    """
    n = cfg.window
    x = series.astype(jnp.float32)
    windows = frame_series(x, n, hop)
    measured = windows[:, -1]

    level = jnp.zeros_like(measured)
    if cfg.detrend_level:
        level = jnp.mean(windows, axis=-1)
        windows = windows - level[:, None]
        measured = measured - level

    w = windows
    if cfg.apply_hann:
        w = w * window_coefficients(n, WindowType.HANN, w.dtype)

    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    spec = rfft_mxu(w, max_bins=k_max + 1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    band_p = power[..., k_min : k_max + 1]
    _, band_idx = jax.lax.top_k(band_p, cfg.top_k)
    idx = band_idx + k_min

    # contribution of bin k at the newest sample n0 = n-1 (`:196-206`),
    # gathered with a one-hot contraction (TPU-friendly)
    one_hot = jax.nn.one_hot(band_idx, band_p.shape[-1], dtype=w.dtype)
    gathered = jnp.stack(
        [jnp.real(spec)[..., k_min : k_max + 1],
         jnp.imag(spec)[..., k_min : k_max + 1]], axis=-1
    )
    vals = jnp.einsum("tkn,tnc->tkc", one_hot, gathered,
                      precision=jax.lax.Precision.HIGHEST)
    re_k, im_k = vals[..., 0], vals[..., 1]
    angle = 2.0 * jnp.pi * idx.astype(jnp.float32) * (n - 1) / n
    basis = (2.0 / n) * (re_k * jnp.cos(angle) - im_k * jnp.sin(angle))

    blended, w_final = kalman_weights_filter(basis, measured, cfg.weights)
    return blended + level, w_final, basis
