"""Declarative pipeline spec — the successor of the preset DSL.

The reference's next-gen architecture hands the backend a string-typed
"preset template" describing time-domain and frequency-domain stages plus
the extraction setup, and ONE device job returns everything: FFT, phase,
unwrapped phase, group delay, cycle attrs, per-slot wave values and a
Kalman value (`mt_gpu_wave_submit_template_job`,
`Legacy/WaveSpecZZ_gpu_wip.mq5:214-233`; builder signature `:550-572`;
SURVEY §3.5 calls this the strongest precedent for a single fused kernel).

Here the spec is a frozen dataclass (hashable -> one jit cache entry per
preset) compiled by `compile_pipeline` into a single jitted program. A
`parse_preset` text form keeps string-preset workflows working:

    "time: zero_pad(left=0,right=0) | dc(mode=0,alpha=0.98);
     freq: denoise(threshold=0.1,beta=0.75) | mask(low=0.15,high=0.85);
     extract: window=4096, top_k=4, method=music, min_period=9,
              max_period=200, ar_order=10;
     segment: len=16384, overlap=4096, mix=energy; waves: 2"

The `segment` section is the `BuildWavePresetTemplate` segmentation triple
(`gpu_wip.mq5:550-572`) — see `SegmentSpec` / `build_wave_preset_template`.
"""

from __future__ import annotations

import dataclasses
import re
from functools import partial

import jax
import jax.numpy as jnp

from wavespec_tpu.extract import DetrendMode, ExtractConfig, Method, extract_cycles
from wavespec_tpu.kernels.mxu_fft import irfft_mxu, rfft_mxu
from wavespec_tpu.ops import preproc
from wavespec_tpu.ops.detrend import remove_dc
from wavespec_tpu.ops.phase import fft_phase, group_delay, unwrap_phase
from wavespec_tpu.ops.windows import WindowType
from wavespec_tpu.reconstruct import ReconstructConfig, decode_causal


@dataclasses.dataclass(frozen=True)
class Stage:
    """One pipeline stage: `name(params)`. Params must be hashable."""

    name: str
    params: tuple[tuple[str, float], ...] = ()

    def get(self, key: str, default: float) -> float:
        for k, v in self.params:
            if k == key:
                return v
        return default


@dataclasses.dataclass(frozen=True)
class SegmentSpec:
    """Segmented-FFT preset parameters (`BuildWavePresetTemplate`'s
    segment_len/overlap/mix_mode, `gpu_wip.mq5:550-572`, inputs `:33-38`).

    `overlap < 0` means auto-tune: overlap = `overlap_pct * segment_len`
    (`InpSegmentAutoTune`/`InpSegmentOverlapPct`, `gpu_wip.mq5:35-38`).
    """

    segment_len: int = 16384
    overlap: int = -1
    mix_mode: int = 0  # mesh.MixMode value (0=energy, 1=coherent, 2=max)
    overlap_pct: float = 0.25

    def resolved_overlap(self) -> int:
        if self.overlap >= 0:
            return self.overlap
        from wavespec_tpu.mesh.segmented import auto_overlap

        return auto_overlap(self.segment_len, self.overlap_pct)


@dataclasses.dataclass(frozen=True)
class PipelineSpec:
    """Full template-job specification."""

    time_stages: tuple[Stage, ...] = ()
    freq_stages: tuple[Stage, ...] = ()
    extract: ExtractConfig = ExtractConfig()
    reconstruct: ReconstructConfig = ReconstructConfig()
    wave_slots: int = 2
    emit_filtered: bool = False  # inverse-FFT the processed spectrum
    # Segmented long-window FFT for the spectral products (None = plain
    # full-window rFFT). Extraction always sees the full window.
    segment: SegmentSpec | None = None


_TIME_STAGES = {"zero_pad", "resample", "dc"}
_FREQ_STAGES = {"denoise", "upscale", "mask", "convolution", "correlation", "unwrap"}


def _apply_time_stage(series: jax.Array, st: Stage) -> jax.Array:
    if st.name == "zero_pad":
        return preproc.zero_pad(
            series, int(st.get("left", 0)), int(st.get("right", 0))
        )
    if st.name == "resample":
        n = series.shape[-1]
        factor = st.get("factor", 1.0)
        out_len = int(st.get("target", 0)) or max(4, int(round(n * factor)))
        return preproc.resample(
            series, out_len, cutoff=st.get("cutoff", 0.45),
            method=int(st.get("method", 0)),
        )
    if st.name == "dc":
        return remove_dc(series, int(st.get("mode", 0)), st.get("alpha", 0.98))
    raise ValueError(f"unknown time stage {st.name}")


def _apply_freq_stage(spec_bins: jax.Array, st: Stage) -> jax.Array:
    bins = spec_bins.shape[-1]
    if st.name == "denoise":
        return preproc.spectral_denoise(
            spec_bins, int(st.get("method", 0)), st.get("threshold", 0.10),
            st.get("beta", 0.75), int(st.get("iterations", 1)),
        )
    if st.name == "upscale":
        return preproc.spectral_upscale(
            spec_bins, st.get("factor", 1.0), int(st.get("mode", 0)),
            bool(st.get("normalize", 1)),
        )
    if st.name == "mask":
        mask = preproc.build_band_mask(
            bins, st.get("low", 0.15), st.get("high", 0.85)
        )
        return preproc.apply_mask(spec_bins, mask)
    if st.name in ("convolution", "correlation"):
        kernel = preproc.build_gaussian_kernel(
            bins, st.get("period", 32.0), st.get("bandwidth", 0.04),
            st.get("gain", 1.0),
        )
        fn = (preproc.spectral_convolution if st.name == "convolution"
              else preproc.spectral_correlation)
        return fn(spec_bins, kernel)
    if st.name == "unwrap":
        return spec_bins  # phase products always emitted; stage is a no-op gate
    raise ValueError(f"unknown freq stage {st.name}")


@partial(jax.jit, static_argnames=("spec",))
def run_pipeline(series: jax.Array, spec: PipelineSpec):
    """Execute the full template job on the trailing window of `series`.

    Returns a dict with the template-job outputs
    (`mt_gpu_wave_try_get_template_job` fields): fft (complex bins), phase,
    unwrapped, group_delay, attrs [top_k, 15], wave values/periods per
    slot, kalman_value, and optionally the filtered (inverse-FFT) series.
    """
    x = series.astype(jnp.float32)
    for st in spec.time_stages:
        x = _apply_time_stage(x, st)

    window = x[..., -spec.extract.window:]
    attrs = extract_cycles(window, spec.extract)

    seg_power = None
    if spec.segment is not None:
        # Segmented long-window preset (`gpu_wave_fft_segmented` inside the
        # template job): the per-segment spectra are computed ONCE — the
        # COHERENT complex mix feeds the freq stages and phase products
        # (they need a complex spectrum) while the preset's own mix_mode
        # shapes the `fft_power` product; re-running fft_segmented per mix
        # would double the dominant per-segment DFT cost of the job.
        from wavespec_tpu.mesh.segmented import (
            MixMode, _mix, rfft_mxu as _seg_rfft, split_segments,
        )

        segs = split_segments(
            window, spec.segment.segment_len, spec.segment.resolved_overlap()
        )
        seg_spec = _seg_rfft(segs)
        spec_bins = _mix(seg_spec, MixMode.COHERENT, axis=-2)
        seg_power = _mix(seg_spec, MixMode(spec.segment.mix_mode), axis=-2)
    else:
        spec_bins = rfft_mxu(window)
    for st in spec.freq_stages:
        spec_bins = _apply_freq_stage(spec_bins, st)

    # Freq stages may change the bin count (spectral upscale); derive the
    # effective transform length from the surviving bins so group delay
    # (domega = 2*pi/n_eff) and the inverse synthesis stay consistent.
    n_eff = 2 * spec_bins.shape[-1]
    ph = fft_phase(spec_bins)
    uw = unwrap_phase(ph)
    gd = group_delay(uw, n_eff)

    rcfg = dataclasses.replace(spec.reconstruct, max_waves=spec.wave_slots)
    decoded = decode_causal(attrs[None, ...], rcfg)

    out = {
        "fft": spec_bins,
        "phase": ph,
        "unwrapped": uw,
        "group_delay": gd,
        "attrs": attrs,
        "wave_values": decoded["wave"][0],
        "wave_periods": decoded["period"][0],
        "wave_eta_seconds": decoded["eta_seconds"][0],
        # Per-slot bull/bear flags, consumed as (flag > 0.5) ? BULL : BEAR
        # (`mt_gpu_wave_try_get_template_job`'s wave_colors,
        # `gpu_wip.mq5:227,675-679`).
        "wave_colors": decoded["color"][0],
        "kalman_value": jnp.sum(
            jnp.where(attrs[:, 0] > 0, attrs[:, 12], 0.0)
        ),  # sum of per-cycle one-step predictions (KALMAN_PRED field)
    }
    if seg_power is not None:
        out["fft_power"] = seg_power
    if spec.emit_filtered:
        out["filtered"] = irfft_mxu(spec_bins, n_eff)
    return out


# ------------------------------------------------------------- text preset

_STAGE_RE = re.compile(r"(\w+)\s*(?:\(([^)]*)\))?")


def _parse_stage_list(text: str) -> tuple[Stage, ...]:
    stages = []
    for part in text.split("|"):
        part = part.strip()
        if not part:
            continue
        m = _STAGE_RE.fullmatch(part)
        if not m:
            raise ValueError(f"bad stage syntax: {part!r}")
        name = m.group(1)
        params = []
        if m.group(2):
            for kv in m.group(2).split(","):
                k, _, v = kv.partition("=")
                params.append((k.strip(), float(v.strip())))
        stages.append(Stage(name, tuple(params)))
    return tuple(stages)


_METHODS = {"fft": Method.FFT_RIDGE, "ridge": Method.FFT_RIDGE,
            "music": Method.MUSIC, "esprit": Method.ESPRIT,
            "auto": Method.AUTO}
_MIXES = {"energy": 0, "coherent": 1, "max": 2}
_TAPERS = {"none": WindowType.NONE, "hann": WindowType.HANN,
           "hamming": WindowType.HAMMING, "blackman": WindowType.BLACKMAN,
           "bartlett": WindowType.BARTLETT}
_DETRENDS = {"none": DetrendMode.NONE, "linear": DetrendMode.LINEAR,
             "ehlers": DetrendMode.EHLERS}


def parse_preset(text: str) -> PipelineSpec:
    """Parse the string preset format (successor of `InpPresetTemplate` /
    `InpPresetStageTime` / `InpPresetStageFreq`, `gpu_wip.mq5:43-45`)."""
    sections: dict[str, str] = {}
    for chunk in text.split(";"):
        chunk = chunk.strip()
        if not chunk:
            continue
        key, _, body = chunk.partition(":")
        sections[key.strip().lower()] = body.strip()

    time_stages = _parse_stage_list(sections.get("time", ""))
    freq_stages = _parse_stage_list(sections.get("freq", ""))
    for st in time_stages:
        if st.name not in _TIME_STAGES:
            raise ValueError(f"{st.name!r} is not a time stage")
    for st in freq_stages:
        if st.name not in _FREQ_STAGES:
            raise ValueError(f"{st.name!r} is not a freq stage")

    ekw: dict = {}
    if "extract" in sections:
        for kv in sections["extract"].split(","):
            k, _, v = kv.partition("=")
            k, v = k.strip(), v.strip()
            if k == "method":
                ekw["method"] = _METHODS[v.lower()]
            elif k == "taper":
                ekw["taper"] = _TAPERS[v.lower()]
            elif k == "detrend":
                ekw["detrend"] = _DETRENDS[v.lower()]
            elif k in ("window", "top_k", "ar_order", "trend_period",
                       "music_grid_per_bin", "music_decimation"):
                ekw[k] = int(v)
            else:
                ekw[k] = float(v)

    segment = None
    if "segment" in sections and sections["segment"]:
        skw: dict = {}
        for kv in sections["segment"].split(","):
            k, _, v = kv.partition("=")
            k, v = k.strip().lower(), v.strip()
            if k in ("len", "segment_len", "length"):
                skw["segment_len"] = int(v)
            elif k == "overlap":
                skw["overlap"] = int(v)
            elif k in ("mix", "mix_mode"):
                skw["mix_mode"] = _MIXES[v.lower()] if v.lower() in _MIXES else int(v)
            elif k in ("overlap_pct", "auto_overlap"):
                skw["overlap_pct"] = float(v)
            else:
                raise ValueError(f"unknown segment param {k!r}")
        segment = SegmentSpec(**skw)

    wave_slots = int(sections.get("waves", "2"))
    return PipelineSpec(
        time_stages=time_stages,
        freq_stages=freq_stages,
        extract=ExtractConfig(**ekw),
        wave_slots=wave_slots,
        segment=segment,
    )


_MIX_NAMES = {0: "energy", 1: "coherent", 2: "max"}


def build_wave_preset_template(
    segment_len: int,
    overlap: int,
    mix_mode: int,
    top_cycles: int,
    min_period: float,
    max_period: float,
    wave_slots: int,
    stage_time: str = "",
    stage_freq: str = "",
    *,
    window: int = 0,
) -> str:
    """`BuildWavePresetTemplate` parity (`gpu_wip.mq5:550-572`; the builder
    itself lives in the repo-absent `WavePresetDsl.mqh`).

    Emits the text preset for one segmented template job; `segment_len <= 0`
    disables segmentation (`InpEnableSegmentedFft=false`). `stage_time` /
    `stage_freq` are user-overridable stage strings
    (`InpPresetStageTime/Freq`, `gpu_wip.mq5:43-45`).
    """
    parts = []
    if stage_time:
        parts.append(f"time: {stage_time}")
    if stage_freq:
        parts.append(f"freq: {stage_freq}")
    ex = [f"top_k={int(top_cycles)}", f"min_period={min_period}",
          f"max_period={max_period}"]
    if window:
        ex.insert(0, f"window={int(window)}")
    parts.append("extract: " + ", ".join(ex))
    if segment_len > 0:
        mix = _MIX_NAMES.get(int(mix_mode), str(int(mix_mode)))
        parts.append(f"segment: len={int(segment_len)}, "
                     f"overlap={int(overlap)}, mix={mix}")
    parts.append(f"waves: {int(wave_slots)}")
    return "; ".join(parts)
