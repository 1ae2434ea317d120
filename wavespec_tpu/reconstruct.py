"""Wave reconstruction & decode of stride-15 cycle attributes.

Rebuild of the flagship's reconstruction/plot stage
(`WaveSpecZZ_1.1.0-gpuopt.mq5:1472-1561`, batch-decode twin `:1066-1099`):

- per-cycle quality weight  w = energy * coherence * score * snr_sigmoid,
  with snr_sigmoid = 1/(1 + 10^(-max(snr_db, min_snr_db)/10)), zeroed when
  coherence < min_coherence or score < min_score (`:1500-1518`);
- MUSIC-only gate: cycles with method_id != 1 are skipped when enabled
  (`:1492-1494`); at most `max_waves` (2) cycles plot per window (`:1474`);
- sine reconstruction theta(k) = phase - omega*k back-propagated over
  recon_span = min(round(max(eta_bars,1)), min(window-1, 512)) bars
  (`:1508-1541`);
- per-bar ETA countdown fill  max(eta_sec - k*bar_seconds, 0)  (`:1529`);
- forecast marker at bar  i + round(eta_bars)  when eta_bars > 1 and
  eta_confidence >= min_eta_conf (`:1543-1561`).

Two decode modes:
- `decode_causal`: each bar's value from its own window at k=0 — the state
  a live consumer (EA) sees at that bar; append-only, never repaints
  (the no-repaint invariant, `Legacy/WaveSpecZZ_1.0.2.mq5:15-17`).
- `render_final`: the reference's *final plotted buffer state*, where each
  newer window back-propagates over its span and overwrites older bars
  (last-writer-wins), reproduced with a `lax.scan` over windows.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from wavespec_tpu.ops.gather import take_last, take_rows

from wavespec_tpu import extract as ex


@partial(jax.jit, static_argnames=("bars", "cfg"))
def project_forward(
    attrs: jax.Array,
    bars: int = 26,
    cfg: "ReconstructConfig | None" = None,
):
    """Ichimoku-style future projection (`InpShowFutureProjection` /
    `InpProjectionBars`, `...pla-kalman.mq5:867-870`): extend each plotted
    cycle `bars` bars past the newest bar as
    ``amp_w * sin(phase + omega * k)``, k = 1..bars.

    attrs ``[..., k, 15]`` -> ``[..., bars, max_waves]`` projected values
    (quality-weighted and slot-gated like `decode_causal`).
    """
    cfg = cfg or ReconstructConfig()
    slot, valid = _select_slots(attrs, cfg)
    w = quality_weight(slot, cfg)
    amp_w = slot[..., ex.AMPLITUDE] * w
    omega = 2.0 * jnp.pi * slot[..., ex.FREQ]
    phase = slot[..., ex.PHASE]
    k = jnp.arange(1, bars + 1, dtype=jnp.float32)
    theta = phase[..., None, :] + omega[..., None, :] * k[:, None]
    proj = amp_w[..., None, :] * jnp.sin(theta)
    return jnp.where(valid[..., None, :], proj, 0.0)


def reconstruct_from_bins(spec: jax.Array, idx: jax.Array, n: int) -> jax.Array:
    """Waveform from selected spectral bins: inverse rFFT of the top-k bins
    with everything else zeroed (the `WaveSpecZZ_Phase`/`_Waves` style
    band-selective reconstruction; BASELINE config #4).

    spec: complex bins ``[..., n//2]``; idx: ``[..., k]`` selected bins.
    Returns the length-n waveform of just those cycles.
    """
    from wavespec_tpu.kernels.mxu_fft import irfft_mxu

    bins = spec.shape[-1]
    one_hot = jax.nn.one_hot(idx, bins, dtype=jnp.float32).sum(axis=-2)
    mask = jnp.clip(one_hot, 0.0, 1.0)
    return irfft_mxu(spec * mask, n)


@dataclasses.dataclass(frozen=True)
class ReconstructConfig:
    """Static decode configuration (defaults = flagship inputs `1.1.0:30,64,72-77`)."""

    max_waves: int = 2
    music_only: bool = True
    use_music_weights: bool = True
    min_coherence: float = 0.05
    min_score: float = 0.01
    min_snr_db: float = -40.0
    min_eta_conf: float = 0.0
    draw_sine: bool = True          # DRAW_SINE_RECON vs DRAW_POINTS
    recon_span_cap: int = 512
    sample_rate_seconds: float = 60.0


def quality_weight(attrs: jax.Array, cfg: ReconstructConfig,
                   floors: bool = True) -> jax.Array:
    """Per-cycle quality weight over attrs ``[..., 15]`` -> ``[...]``.

    `floors=True` is the wave-buffer weight (`amp_w`, `1.1.0:1517` —
    zeroed when coherence/score are below their floors); `floors=False`
    is the raw `weight_total` (`1.1.0:1504-1505`) that the FORECAST
    marker uses — the reference plots a nonzero marker even for cycles
    whose wave value the floors zeroed (`1.1.0:1549-1551`).
    """
    energy = jnp.maximum(attrs[..., ex.ENERGY_RATIO], 0.0)
    coher = jnp.maximum(attrs[..., ex.COHERENCE], 0.0)
    score = jnp.maximum(attrs[..., ex.SCORE], 0.0)
    snr_eff = jnp.maximum(attrs[..., ex.SNR_DB], cfg.min_snr_db)
    w_snr = 1.0 / (1.0 + jnp.power(10.0, -snr_eff / 10.0))
    if not cfg.use_music_weights:
        return jnp.ones_like(energy)
    w = jnp.maximum(energy * coher * score * w_snr, 0.0)
    if not floors:
        return w
    floor_fail = (attrs[..., ex.COHERENCE] < cfg.min_coherence) | (
        attrs[..., ex.SCORE] < cfg.min_score
    )
    return jnp.where(floor_fail, 0.0, w)


def _select_slots(attrs: jax.Array, cfg: ReconstructConfig):
    """Assign the first `max_waves` gate-passing cycles to plot slots.

    attrs ``[..., k, 15]`` -> (slot_attrs ``[..., max_waves, 15]``,
    slot_valid ``[..., max_waves]`` bool). Cycles arrive power-ranked from
    the extractor, matching the reference's in-order scan (`1.1.0:1476`).
    """
    k = attrs.shape[-2]
    eligible = attrs[..., ex.AMPLITUDE] > 0
    if cfg.music_only:
        eligible = eligible & (attrs[..., ex.METHOD_ID] == 1.0)
    # Stable order of eligible indices: argsort on (not eligible, index).
    rank = jnp.argsort(
        jnp.where(eligible, 0, 1) * k + jnp.arange(k), axis=-1
    )[..., : cfg.max_waves]
    slot_attrs = take_rows(attrs, rank)
    slot_valid = take_last(eligible, rank)
    return slot_attrs, slot_valid


@partial(jax.jit, static_argnames=("cfg",))
def decode_causal(attrs: jax.Array, cfg: ReconstructConfig = ReconstructConfig()):
    """Causal per-window decode: k=0 values only (no repaint).

    attrs ``[nwin, k, 15]`` -> dict of ``[nwin, max_waves]`` arrays:
    wave, period, eta_seconds, eta_bars, phase, weight, plus the six
    aux attribute buffers and forecast (value, offset_bars, valid).
    """
    slot, valid = _select_slots(attrs, cfg)
    w = quality_weight(slot, cfg)
    amp_w = slot[..., ex.AMPLITUDE] * w
    phase = slot[..., ex.PHASE]
    period_v = slot[..., ex.PERIOD]
    # Sine rendering requires DRAW_SINE mode AND period > 0
    # (`1.1.0:1518-1520`); otherwise the flat amp_w is plotted.
    if cfg.draw_sine:
        wave = jnp.where(period_v > 0.0, amp_w * jnp.sin(phase), amp_w)
    else:
        wave = amp_w
    vz = lambda x: jnp.where(valid, x, 0.0)

    eta_bars = slot[..., ex.ETA_BARS]
    eta_conf = slot[..., ex.ETA_CONFIDENCE]
    forecast_ok = valid & (eta_bars > 1.0) & (eta_conf >= cfg.min_eta_conf)
    # Marker value: the UN-floored weight_total (`1.1.0:1549-1551`), and
    # sine only in DRAW_SINE mode with period > 0 — not amp_w.
    amp_marker = slot[..., ex.AMPLITUDE] * quality_weight(slot, cfg, floors=False)
    if cfg.draw_sine:
        forecast_val = jnp.where(
            period_v > 0.0, amp_marker * jnp.sin(phase), amp_marker)
    else:
        forecast_val = amp_marker
    # Per-slot bull/bear color flag: the template job returns wave_colors
    # consumed as `(flag > 0.5) ? BULL : BEAR` (`gpu_wip.mq5:675-679`).
    # A cycle A*sin(phase) is rising at the newest bar iff cos(phase) > 0.
    color_flag = jnp.where(valid & (jnp.cos(phase) > 0.0), 1.0, 0.0)
    return {
        "wave": vz(wave),
        "color": color_flag,
        "period": vz(slot[..., ex.PERIOD]),
        "eta_seconds": vz(slot[..., ex.ETA_SECONDS]),
        "eta_bars": vz(eta_bars),
        "phase": vz(phase),
        "weight": vz(w),
        "energy": vz(slot[..., ex.ENERGY_RATIO]),
        "coherence": vz(slot[..., ex.COHERENCE]),
        "snr_db": vz(slot[..., ex.SNR_DB]),
        "score": vz(slot[..., ex.SCORE]),
        "eigen_ratio": vz(slot[..., ex.EIGEN_RATIO]),
        "eta_conf": vz(eta_conf),
        "forecast_value": jnp.where(forecast_ok, forecast_val, 0.0),
        "forecast_offset": jnp.where(forecast_ok, jnp.round(eta_bars), 0.0),
        "forecast_valid": forecast_ok,
        "slot_valid": valid,
    }


@partial(jax.jit, static_argnames=("cfg", "n_bars", "hop", "window"))
def render_final(
    attrs: jax.Array,
    *,
    n_bars: int,
    window: int,
    hop: int = 1,
    cfg: ReconstructConfig = ReconstructConfig(),
):
    """Final plotted buffer state after processing all windows in order.

    attrs ``[nwin, k, 15]``; window w's newest bar is ``w*hop + window - 1``
    (chronological indexing). Returns dict of ``[n_bars, max_waves]``
    buffers (wave, period, eta_seconds, phase) and ``[n_bars, max_waves]``
    forecast markers; bars never covered stay NaN (EMPTY_VALUE analog,
    `1.1.0:1451-1470`).
    """
    nwin = attrs.shape[0]
    span = min(cfg.recon_span_cap, window - 1)
    slot, valid = _select_slots(attrs, cfg)
    w = quality_weight(slot, cfg)
    amp_w = slot[..., ex.AMPLITUDE] * w  # [nwin, s]
    # Forecast markers use the UN-floored weight (`1.1.0:1549-1551`).
    amp_marker = slot[..., ex.AMPLITUDE] * quality_weight(slot, cfg, floors=False)
    omega = 2.0 * jnp.pi * slot[..., ex.FREQ]
    phase = slot[..., ex.PHASE]
    eta_bars = slot[..., ex.ETA_BARS]
    eta_sec = slot[..., ex.ETA_SECONDS]
    period = slot[..., ex.PERIOD]
    span_w = jnp.minimum(
        jnp.round(jnp.maximum(eta_bars, 1.0)), float(span)
    )  # [nwin, s] per-cycle recon span (`1.1.0:1510`)

    s = slot.shape[-2]
    nan = jnp.nan
    init = {
        "wave": jnp.full((n_bars, s), nan, jnp.float32),
        "period": jnp.full((n_bars, s), nan, jnp.float32),
        "eta_seconds": jnp.full((n_bars, s), nan, jnp.float32),
        "phase": jnp.full((n_bars, s), nan, jnp.float32),
        "forecast": jnp.full((n_bars, s), nan, jnp.float32),
    }

    ks = jnp.arange(span, -1, -1, dtype=jnp.float32)  # [span+1] k desc -> bars asc

    def step(bufs, xs):
        (w_amp, w_amp_marker, w_omega, w_phase, w_eta_sec, w_period, w_span,
         w_valid, w_eta_bars, w_eta_conf, bar_end) = xs
        start = jnp.maximum(bar_end - span, 0)
        kk = (bar_end - start) - jnp.arange(span + 1, dtype=jnp.int32)
        kkf = kk.astype(jnp.float32)
        theta = w_phase[None, :] - w_omega[None, :] * kkf[:, None]  # [span+1, s]
        # Sine rendering requires DRAW_SINE AND period > 0 (`1.1.0:1518`).
        if cfg.draw_sine:
            val = jnp.where(w_period[None, :] > 0.0,
                            w_amp[None, :] * jnp.sin(theta), w_amp[None, :])
        else:
            val = jnp.broadcast_to(w_amp[None, :], theta.shape)
        cover = (kkf[:, None] <= w_span[None, :]) & (kk[:, None] >= 0) & w_valid[None, :]
        countdown = jnp.maximum(
            w_eta_sec[None, :] - kkf[:, None] * cfg.sample_rate_seconds, 0.0
        )

        def upd(buf, new):
            old = jax.lax.dynamic_slice(buf, (start, 0), (span + 1, s))
            return jax.lax.dynamic_update_slice(
                buf, jnp.where(cover, new, old), (start, 0)
            )

        bufs = dict(bufs)
        bufs["wave"] = upd(bufs["wave"], val)
        bufs["period"] = upd(bufs["period"], jnp.broadcast_to(w_period[None, :], val.shape))
        bufs["eta_seconds"] = upd(bufs["eta_seconds"], countdown)
        bufs["phase"] = upd(bufs["phase"], theta)

        # Forecast marker at bar_end + round(eta_bars) (may exceed n_bars-1;
        # clamp and mask).
        f_ok = w_valid & (w_eta_bars > 1.0) & (w_eta_conf >= cfg.min_eta_conf)
        f_bar = bar_end + jnp.round(w_eta_bars).astype(jnp.int32)
        if cfg.draw_sine:
            f_val = jnp.where(w_period > 0.0,
                              w_amp_marker * jnp.sin(w_phase), w_amp_marker)
        else:
            f_val = w_amp_marker
        in_range = f_ok & (f_bar < n_bars)
        f_bar_c = jnp.clip(f_bar, 0, n_bars - 1)
        cur = bufs["forecast"][f_bar_c, jnp.arange(s)]
        bufs["forecast"] = bufs["forecast"].at[f_bar_c, jnp.arange(s)].set(
            jnp.where(in_range, f_val, cur)
        )
        return bufs, None

    bar_ends = jnp.arange(nwin, dtype=jnp.int32) * hop + (window - 1)
    eta_conf = slot[..., ex.ETA_CONFIDENCE]
    xs = (amp_w, amp_marker, omega, phase, eta_sec, period, span_w, valid,
          eta_bars, eta_conf, bar_ends)
    bufs, _ = jax.lax.scan(step, init, xs)
    return bufs
