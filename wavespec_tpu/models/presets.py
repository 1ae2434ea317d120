"""Variant factories with reference-default configurations."""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.extract import DetrendMode, ExtractConfig, Method, extract_cycles_batch
from wavespec_tpu.filters.kalman_wave import KalmanWaveConfig, kalman_wave
from wavespec_tpu.ops.windows import WindowType
from wavespec_tpu.pipeline.spec import PipelineSpec, Stage, run_pipeline
from wavespec_tpu.pipeline.v757 import V757Config, run_v757
from wavespec_tpu.reconstruct import ReconstructConfig, decode_causal, render_final


@dataclasses.dataclass
class Model:
    """A configured variant: `run(series)` -> dict of output buffers."""

    name: str
    run: Callable
    extract: ExtractConfig | None = None


def flagship(window: int = 4096, hop: int = 1) -> Model:
    """WaveSpecZZ_1.1.0-gpuopt defaults (`1.1.0:21-23,49-77`)."""
    ecfg = ExtractConfig(
        window=window, top_k=4, min_period=9.0, max_period=200.0,
        method=Method.MUSIC, ar_order=10, detrend=DetrendMode.NONE,
        taper=WindowType.NONE,
    )
    rcfg = ReconstructConfig()  # MUSIC-only, quality weights, 2 waves

    def run(series):
        series = jnp.asarray(np.asarray(series, np.float32))
        attrs = extract_cycles_batch(series, ecfg, hop=hop)
        out = dict(decode_causal(attrs, rcfg))
        out["attrs"] = attrs
        out["rendered"] = render_final(
            attrs, n_bars=series.shape[-1], window=window, hop=hop, cfg=rcfg
        )
        return out

    return Model("WaveSpecZZ_1.1.0-gpuopt", run, ecfg)


def v757(window: int = 4096, hop: int = 1, **overrides) -> Model:
    """Legacy 1.0.3-pla-kalman full analytics (`:801-842,884-901`)."""
    cfg = V757Config(window=window, **overrides)
    return Model(
        "WaveSpecZZ_1.0.3-pla-kalman",
        lambda series: run_v757(series, cfg, hop=hop),
    )


def nodetrend_top8(window: int = 4096, hop: int = 1) -> Model:
    """The minimal top-8 plotter (`...gpuopt-nodetrend.mq5:536-580`)."""
    ecfg = ExtractConfig(
        window=window, top_k=8, min_period=18.0, max_period=200.0,
        method=Method.FFT_RIDGE, detrend=DetrendMode.NONE,
        taper=WindowType.NONE,
    )
    rcfg = ReconstructConfig(music_only=False, use_music_weights=False,
                             max_waves=8, draw_sine=True)

    def run(series):
        attrs = extract_cycles_batch(
            jnp.asarray(np.asarray(series, np.float32)), ecfg, hop=hop
        )
        out = dict(decode_causal(attrs, rcfg))
        out["attrs"] = attrs
        return out

    return Model("nodetrend-top8", run, ecfg)


def preproc_core(window: int = 4096) -> Model:
    """Legacy 1.0.4-core preprocessing showcase (`:28-59,505-579`)."""
    spec = PipelineSpec(
        time_stages=(Stage("dc", (("mode", 0.0), ("alpha", 0.98))),),
        freq_stages=(
            Stage("denoise", (("threshold", 0.10), ("beta", 0.75),
                              ("iterations", 1.0))),
            Stage("mask", (("low", 0.15), ("high", 0.85))),
            Stage("convolution", (("period", 32.0), ("bandwidth", 0.04),
                                  ("gain", 1.0))),
        ),
        extract=ExtractConfig(window=window, top_k=4, min_period=9.0,
                              max_period=200.0, method=Method.FFT_RIDGE),
        emit_filtered=True,
    )
    return Model(
        "WaveSpecZZ_1.0.4-core",
        lambda series: run_pipeline(jnp.asarray(np.asarray(series, np.float32)), spec),
    )


def kalman_wave_model(window: int = 4096, hop: int = 1) -> Model:
    """Legacy 1.0.4-kalman regressor (`:26-35`)."""
    cfg = KalmanWaveConfig(window=window, top_k=8, min_period=18.0,
                           max_period=200.0, apply_hann=True)

    def run(series):
        blended, weights, basis = kalman_wave(
            jnp.asarray(np.asarray(series, np.float32)), cfg, hop=hop
        )
        return {"wave_kalman": blended, "weights": weights, "basis": basis}

    return Model("WaveSpecZZ_1.0.4-kalman", run)


def wave4ea(preset_text: str | None = None) -> Model:
    """Legacy gpu_wip template-job prototype (`gpu_wip.mq5:30-55`)."""
    from wavespec_tpu.pipeline.spec import parse_preset

    preset = preset_text or (
        "time: dc(mode=0); "
        "extract: window=32768, top_k=6, method=music, min_period=2, "
        "max_period=4096, ar_order=16; waves: 12"
    )
    spec = parse_preset(preset)
    return Model(
        "wave4ea-template",
        lambda series: run_pipeline(jnp.asarray(np.asarray(series, np.float32)), spec),
    )
