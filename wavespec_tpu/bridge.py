"""Bridge-compatibility API: the full `mt-bridge.dll` surface, 1:1.

Every function the reference imports (union of all `#import` blocks —
SURVEY.md §2.2; `Include/imports.mqh:5-21`,
`Legacy/WaveSpecZZ_1.0.4-core.mq5:61-75`,
`Legacy/WaveSpecZZ_1.0.4-parallel.mq5:23-38`,
`Legacy/WaveSpecZZ_gpu_wip.mq5:214-260`) has a same-named equivalent here,
with the same status-code discipline, so a user of the reference can port
call sites mechanically. Idiomatic users should prefer the functional API
(`wavespec_tpu.extract`, `.ops`, `.pipeline`) — this module is the
compatibility veneer over it.

Conventions kept from the bridge:
- status ints (`Status`), with `get_last_error()` for the message channel;
- the forward FFT's interleaved re/im layout (`1.1.0:520-531`);
- stride-15 cycle attribute records flattened row-major;
- async job ids from submit/try_get/free.

Dual live/tester binary dispatch (`_Phase.mq5:68-74`) maps to one library
with two execution configs: `init(..., interpret=True)` forces the
CPU/interpret path used by the test suite.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from wavespec_tpu.extract import (
    ExtractConfig,
    Method,
    extract_cycles as _extract,
    extract_cycles_batch as _extract_batch,
)
from wavespec_tpu.feeds.tick import build_tick_series as _build_tick_series
from wavespec_tpu.feeds.zigzag import ZigZagConfig
from wavespec_tpu.kernels.mxu_fft import irfft_mxu, rfft_mxu
from wavespec_tpu.mesh.segmented import MixMode, fft_segmented
from wavespec_tpu.ops import preproc
from wavespec_tpu.ops.detrend import remove_dc as _remove_dc
from wavespec_tpu.ops.phase import unwrap_phase as _unwrap
from wavespec_tpu.ops.spectrum import (
    irfft_from_interleaved,
    rfft_interleaved,
)
from wavespec_tpu.pipeline.session import Session
from wavespec_tpu.pipeline.spec import parse_preset, run_pipeline
from wavespec_tpu.runtime.native import Status
from wavespec_tpu.utils.telemetry import Hud

STRIDE = 15

_session = Session()
_hud = Hud()


def get_hud() -> Hud:
    """Status snapshot with the last bridge call (`gpu_wip.mq5:91,451`)."""
    return _hud


def _track(name: str) -> None:
    _hud.record_call(name)


# ------------------------------------------------------------------ session

def gpu_init(device_index: int = 0, stream_count: int = 64) -> Status:
    """`gpu_init(device_index, stream_count)` (`Include/imports.mqh:6`)."""
    return _session.init(device_index, stream_count)


def gpu_shutdown() -> None:
    """`gpu_shutdown()` (`Include/imports.mqh:7`)."""
    _session.shutdown()


def gpu_get_last_error() -> str:
    """`gpu_get_last_error_w` (`Include/imports.mqh:20`)."""
    return _session.get_last_error()


def _queue():
    if not _session.ready:
        st = gpu_init()
        if st != Status.OK:
            raise RuntimeError(f"session init failed: {st.name}")
    return _session.queue


# --------------------------------------------------------------- FFT family

def _rfft_bins_any(x: jax.Array) -> jax.Array:
    """Complex n//2-bin rFFT with the power-of-two routing shared by
    EVERY bridge FFT entry point (sync, batch, async): MXU DFT for
    power-of-two lengths >= 16, `ops.rfft_bins` (jnp.fft oracle —
    CPU-only; the axon TPU runtime has no jnp.fft lowering) otherwise.
    Keeping the routing here is what makes the async path accept the
    same inputs as the sync one instead of raising at submit."""
    n = x.shape[-1]
    if n & (n - 1) == 0 and n >= 16:
        return rfft_mxu(x)
    from wavespec_tpu.ops.spectrum import rfft_bins

    return rfft_bins(x)


def gpu_fft_real_forward(series) -> np.ndarray:
    """Interleaved-re/im forward rFFT (`Include/imports.mqh:8`).

    len(out) == len(in); bins = len/2. Uses the MXU DFT on TPU backends.
    """
    _track("gpu_fft_real_forward")
    x = jnp.asarray(series, jnp.float32)
    if x.shape[-1] & (x.shape[-1] - 1) == 0 and x.shape[-1] >= 16:
        spec = rfft_mxu(x)
        out = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        return np.asarray(out.reshape(*x.shape[:-1], x.shape[-1]))
    return np.asarray(rfft_interleaved(x))


def gpu_fft_real_inverse(spec_interleaved) -> np.ndarray:
    """Inverse of `gpu_fft_real_forward` (`1.0.4-core.mq5:65`).

    Power-of-two lengths go through the MXU synthesis (`irfft_mxu`) — the
    production TPU runtime has no jnp.fft lowering at all.
    """
    x = jnp.asarray(spec_interleaved, jnp.float32)
    n = x.shape[-1]
    if n & (n - 1) == 0 and n >= 16:
        pairs = x.reshape(*x.shape[:-1], n // 2, 2)
        spec = jax.lax.complex(pairs[..., 0], pairs[..., 1])
        return np.asarray(irfft_mxu(spec, n))
    return np.asarray(irfft_from_interleaved(x))


def gpu_fft_real_forward_batch(series, window_len: int, n_windows: int) -> np.ndarray:
    """Batched contiguous windows in one call (`gpu_cycles.mq5:14`).

    `series` holds n_windows*window_len samples; returns [n_windows,
    window_len] interleaved spectra.
    """
    x = jnp.asarray(series, jnp.float32).reshape(n_windows, window_len)
    spec = _rfft_bins_any(x)
    out = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    return np.asarray(out.reshape(n_windows, window_len))


def gpu_wave_fft_segmented(
    series, segment_len: int, overlap: int, mix_mode: int = 0
) -> np.ndarray:
    """Segmented long-window FFT + mix (`gpu_cycles.mq5:13`).

    mix 0 = energy (Welch power), 1 = coherent, 2 = max."""
    out = fft_segmented(
        jnp.asarray(series, jnp.float32), segment_len, overlap, MixMode(mix_mode)
    )
    return np.asarray(out)


def gpu_submit_fft_real_forward(series) -> int:
    """Async FFT job (`1.0.4-parallel.mq5:28`). Same length routing as
    the sync `gpu_fft_real_forward` (async/sync parity)."""
    return _queue().submit(
        lambda x: _rfft_bins_any(jnp.asarray(x, jnp.float32)),
        np.asarray(series),
    )


def gpu_try_get_result(job_id: int):
    """(ready, interleaved_spectrum_or_None) (`1.0.4-parallel.mq5:29`)."""
    ready, spec = _queue().try_get(job_id)
    if not ready:
        return False, None
    out = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    return True, np.asarray(out.reshape(*spec.shape[:-1], 2 * spec.shape[-1]))


def gpu_free_job(job_id: int) -> None:
    """`gpu_free_job` (`1.0.4-parallel.mq5:30`)."""
    _queue().free(job_id)


# ----------------------------------------------------- preprocessing op set

def gpu_zero_pad_time_series(series, pad_left: int, pad_right: int) -> np.ndarray:
    return np.asarray(preproc.zero_pad(jnp.asarray(series, jnp.float32), pad_left, pad_right))


def gpu_resample_time_series(series, factor: float, cutoff: float = 0.45,
                             method: int = 0) -> np.ndarray:
    x = jnp.asarray(series, jnp.float32)
    out_len = max(4, int(round(x.shape[-1] * max(1e-6, factor))))
    return np.asarray(preproc.resample(x, out_len, cutoff=cutoff, method=method))


def gpu_remove_dc_time_series(series, mode: int = 0, alpha: float = 0.98) -> np.ndarray:
    return np.asarray(_remove_dc(jnp.asarray(series, jnp.float32), mode, alpha))


def _to_bins(spec_interleaved):
    x = jnp.asarray(spec_interleaved, jnp.float32)
    pairs = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    return jax.lax.complex(pairs[..., 0], pairs[..., 1])


def _to_interleaved(bins):
    out = jnp.stack([jnp.real(bins), jnp.imag(bins)], axis=-1)
    return np.asarray(out.reshape(*bins.shape[:-1], 2 * bins.shape[-1]))


def gpu_spectral_denoise(spec_interleaved, method: int = 0, threshold: float = 0.10,
                         beta: float = 0.75, iterations: int = 1) -> np.ndarray:
    return _to_interleaved(
        preproc.spectral_denoise(_to_bins(spec_interleaved), method, threshold,
                                 beta, iterations)
    )


def gpu_spectral_upscale(spec_interleaved, factor: float, mode: int = 0,
                         normalize: int = 1) -> np.ndarray:
    return _to_interleaved(
        preproc.spectral_upscale(_to_bins(spec_interleaved), factor, mode,
                                 bool(normalize))
    )


def gpu_apply_mask(spec_interleaved, mask, mask_is_complex: int = 0,
                   mode: int = 0) -> np.ndarray:
    del mode  # mode 0 (multiplicative) is the only observed mode
    bins = _to_bins(spec_interleaved)
    m = jnp.asarray(mask)
    if mask_is_complex:
        m = _to_bins(m)
    return _to_interleaved(preproc.apply_mask(bins, m))


def gpu_spectral_phase_unwrap(spec_interleaved, method: int = 0) -> np.ndarray:
    del method
    bins = _to_bins(spec_interleaved)
    ph = jnp.arctan2(jnp.imag(bins), jnp.real(bins))
    return np.asarray(_unwrap(ph))


def gpu_spectral_convolution(spec_interleaved, kernel, mode: int = 0) -> np.ndarray:
    del mode
    return _to_interleaved(
        preproc.spectral_convolution(_to_bins(spec_interleaved), jnp.asarray(kernel))
    )


def gpu_spectral_correlation(spec_interleaved, kernel) -> np.ndarray:
    return _to_interleaved(
        preproc.spectral_correlation(_to_bins(spec_interleaved), jnp.asarray(kernel))
    )


# ---------------------------------------------------------- cycle extraction

def _cfg(series_len: int, top_k, min_period, max_period, sample_rate_seconds,
         method, ar_order, window=None) -> ExtractConfig:
    return ExtractConfig(
        window=window or series_len,
        top_k=top_k,
        min_period=min_period,
        max_period=max_period,
        sample_rate_seconds=sample_rate_seconds,
        method=Method(method),
        ar_order=ar_order,
    )


def gpu_extract_cycles(
    series, top_k: int = 4, min_period: float = 9.0, max_period: float = 200.0,
    sample_rate_seconds: float = 60.0, method: int = 1, ar_order: int = 10,
) -> np.ndarray:
    """`gpu_extract_cycles` (`Include/imports.mqh:9-11`): flat stride-15
    record array [top_k * 15].

    `method`: -1 auto, 0 FFT ridge, 1 MUSIC (the reference's
    "MUSIC/ESPRIT", `1.1.0:50`), 2 ESPRIT explicitly (TPU-side extension:
    both subspace estimators exist, records carry method_id=1 either way).
    """
    _track("gpu_extract_cycles")
    x = np.asarray(series, np.float32)
    cfg = _cfg(len(x), top_k, min_period, max_period, sample_rate_seconds,
               method, ar_order)
    attrs = _extract(jnp.asarray(x), cfg)
    return np.asarray(attrs).reshape(-1)


def gpu_submit_extract_cycles(
    series, top_k: int = 4, min_period: float = 9.0, max_period: float = 200.0,
    sample_rate_seconds: float = 60.0, method: int = 1, ar_order: int = 10,
) -> int:
    """Async single-window extraction (`Include/imports.mqh:12-14`)."""
    x = np.asarray(series, np.float32)
    cfg = _cfg(len(x), top_k, min_period, max_period, sample_rate_seconds,
               method, ar_order)
    return _queue().submit(lambda s: _extract(jnp.asarray(s), cfg), x)


def gpu_try_get_cycles(job_id: int):
    """(ready, flat_attrs_or_None)."""
    ready, attrs = _queue().try_get(job_id)
    return (True, np.asarray(attrs).reshape(-1)) if ready else (False, None)


def gpu_submit_extract_cycles_batch(
    series, window_len: int, hop: int = 1, top_k: int = 4,
    min_period: float = 9.0, max_period: float = 200.0,
    sample_rate_seconds: float = 60.0, method: int = 1, ar_order: int = 10,
) -> int:
    """Rolling-STFT batch job (`Include/imports.mqh:15-17`):
    nwin = 1 + (len - window)/hop windows in one fused program."""
    _track("gpu_submit_extract_cycles_batch")
    x = np.asarray(series, np.float32)
    cfg = _cfg(len(x), top_k, min_period, max_period, sample_rate_seconds,
               method, ar_order, window=window_len)
    return _queue().submit(
        lambda s: _extract_batch(jnp.asarray(s), cfg, hop=hop), x
    )


def gpu_try_get_cycles_batch(job_id: int):
    """(ready, attrs [nwin, top_k, 15] or None)."""
    ready, attrs = _queue().try_get(job_id)
    return (True, np.asarray(attrs)) if ready else (False, None)


# ------------------------------------------------------- template / DSL jobs

@dataclasses.dataclass
class _TemplateResult:
    fft: np.ndarray
    phase: np.ndarray
    unwrapped: np.ndarray
    group_delay: np.ndarray
    cycles: np.ndarray
    wave_values: np.ndarray
    wave_periods: np.ndarray
    # Per-slot bull/bear color flags — the reference consumes them as
    # `(flag > 0.5) ? BULL : BEAR` (`gpu_wip.mq5:227,675-679`).
    wave_colors: np.ndarray
    kalman_value: float


def mt_gpu_wave_submit_template_job(preset_text: str, series) -> int:
    """`mt_gpu_wave_submit_template_job` (`gpu_wip.mq5:214-219`): one job
    returns every analysis product (SURVEY §3.5)."""
    _track("mt_gpu_wave_submit_template_job")
    spec = parse_preset(preset_text)
    x = np.asarray(series, np.float32)
    return _queue().submit(lambda s: run_pipeline(jnp.asarray(s), spec), x)


def mt_gpu_wave_try_get_template_job(job_id: int):
    """(ready, _TemplateResult_or_None) (`gpu_wip.mq5:220-231`)."""
    ready, out = _queue().try_get(job_id)
    if not ready:
        return False, None
    # Interleave the complex spectrum on-device before the host transfer:
    # the bridge contract is interleaved doubles, and some TPU runtimes
    # cannot transfer complex64 buffers to the host at all.
    return True, _TemplateResult(
        fft=_to_interleaved(out["fft"]),
        phase=np.asarray(out["phase"]),
        unwrapped=np.asarray(out["unwrapped"]),
        group_delay=np.asarray(out["group_delay"]),
        cycles=np.asarray(out["attrs"]),
        wave_values=np.asarray(out["wave_values"]),
        wave_periods=np.asarray(out["wave_periods"]),
        wave_colors=np.asarray(out["wave_colors"]),
        kalman_value=float(out["kalman_value"]),
    )


def mt_gpu_wave_free_template_job(job_id: int) -> None:
    _queue().free(job_id)


def mt_gpu_wave_build_tick_series(
    tick_prices, tick_times, window_len: int, interval_seconds: float,
    smoothing_window: int = 1, zig_depth: int = 12,
    zig_deviation_points: int = 5, zig_backstep: int = 3, zig_mode: int = -1,
    point_value: float = 1e-5,
) -> np.ndarray:
    """`mt_gpu_wave_build_tick_series` (`gpu_wip.mq5:227-233`)."""
    return _build_tick_series(
        np.asarray(tick_prices), np.asarray(tick_times),
        window_len=window_len, interval_seconds=interval_seconds,
        smoothing_window=smoothing_window, zig_mode=zig_mode,
        zig_cfg=ZigZagConfig(depth=zig_depth,
                             deviation_points=zig_deviation_points,
                             backstep=zig_backstep, point=point_value),
    )
