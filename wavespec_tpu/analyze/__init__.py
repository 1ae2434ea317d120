"""Cycle analytics: MUSIC subspace estimation, trackers, ETA, phase learning."""

from wavespec_tpu.analyze.esprit import esprit_frequencies
from wavespec_tpu.analyze.jacobi import jacobi_eigh
from wavespec_tpu.analyze.music import music_extract, music_pseudospectrum

__all__ = ["esprit_frequencies", "jacobi_eigh", "music_extract", "music_pseudospectrum"]
