"""Model presets: the reference's indicator variant lineup, ready to run.

Each factory returns a configured, callable "model" wrapping the
framework's pipelines with that variant's reference-default inputs
(SURVEY §2.1 variant table):

  flagship()      — WaveSpecZZ_1.1.0-gpuopt: MUSIC-first top-K plotter
                    (batch warmup + causal decode, quality weighting).
  v757()          — Legacy 1.0.3-pla-kalman: full CPU-analytics pipeline
                    (trackers, slots, leaks, biquad cycles, ETA, signals,
                    Kalman 4D).
  nodetrend_top8()— the minimal top-8 plotter (no detrend/taper, FFT
                    ridge, single-point reconstruction).
  preproc_core()  — Legacy 1.0.4-core: the preprocessing-pipeline showcase
                    (zero-pad -> resample -> DC -> FFT -> denoise ->
                    upscale -> mask -> conv -> unwrap -> IFFT).
  kalman_wave_model() — Legacy 1.0.4-kalman: per-cycle-weight Kalman
                    regressor over top-K bins.
  wave4ea()       — Legacy gpu_wip: the preset-DSL template job.
"""

from wavespec_tpu.models.presets import (
    flagship,
    kalman_wave_model,
    nodetrend_top8,
    preproc_core,
    v757,
    wave4ea,
)

__all__ = [
    "flagship",
    "kalman_wave_model",
    "nodetrend_top8",
    "preproc_core",
    "v757",
    "wave4ea",
]
