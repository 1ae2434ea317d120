"""wavespec_tpu: TPU-native sliding-window spectral analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
sindlinger/fft-wavespec (WaveSpecZZ): detrend + taper + real FFT + power
spectrum + top-k dominant-cycle extraction (FFT ridge and MUSIC/ESPRIT),
persistent cycle tracking, ETA estimation, sinusoid/band-pass wave
reconstruction, Kalman smoothing, a composable spectral preprocessing
pipeline, segmented long-window FFT, and mesh-sharded multi-series batch
execution. See SURVEY.md for the reference layer map this mirrors.
"""

__version__ = "0.1.0"
