"""wavespec_tpu: TPU-native sliding-window spectral analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
sindlinger/fft-wavespec (WaveSpecZZ): detrend + taper + real FFT + power
spectrum + top-k dominant-cycle extraction (FFT ridge and MUSIC/ESPRIT),
persistent cycle tracking, ETA estimation, sinusoid/band-pass wave
reconstruction, Kalman smoothing, a composable spectral preprocessing
pipeline, segmented long-window FFT, and mesh-sharded multi-series batch
execution. See SURVEY.md for the reference layer map this mirrors and
docs/PARITY.md for the component-by-component mapping.

Headline API:
    from wavespec_tpu import ExtractConfig, Method, extract_cycles_batch
    from wavespec_tpu.reconstruct import ReconstructConfig, render_final
    from wavespec_tpu.pipeline import run_v757, batch_warmup
    from wavespec_tpu import bridge   # mt-bridge.dll-compatible surface
"""

from wavespec_tpu.extract import (
    DetrendMode,
    ExtractConfig,
    Method,
    extract_cycles,
    extract_cycles_batch,
)

__version__ = "0.1.0"

__all__ = [
    "DetrendMode",
    "ExtractConfig",
    "Method",
    "extract_cycles",
    "extract_cycles_batch",
]
