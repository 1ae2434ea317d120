"""Hot-path kernels: MXU DFT engine and fused STFT extraction."""

from wavespec_tpu.kernels.mxu_fft import dft_factors, irfft_mxu, rfft_mxu

__all__ = ["dft_factors", "irfft_mxu", "rfft_mxu"]
