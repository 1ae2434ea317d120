"""Batch and online drivers: warmup, fetcher, chunked history replay.

Rebuilds the reference's orchestration layer (L5):

- `batch_warmup` — the flagship's first-attach path (`1.1.0:996-1122`):
  one rolling-STFT batch over the whole history (hop=1), decode to per-bar
  buffers, persist the cycle cache. Replaces the submit/poll/120s-wait
  loop with one fused device program.
- `BatchFetcher` — `WaveCyclesBatchFetcher.mq5` parity: headless one-shot
  precompute over up to 500k bars that writes the shared cycle cache.
- `OnlineDriver` — the `OnCalculate` contract: incremental recompute from
  `prev_calculated`, chunked history replay with a persistent cursor
  (`InpHistoryChunk`=2000 bars per call bounded by `InpHistoryMaxBars`,
  `...pla-kalman.mq5:3186-3342`), per-bar extraction through the async
  queue, and the no-repaint guarantee (already-emitted bars never change).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.extract import (
    DetrendMode,
    ExtractConfig,
    Method,
    extract_cycles_batch,
)
from wavespec_tpu.ops.windows import WindowType
from wavespec_tpu.pipeline.session import Session
from wavespec_tpu.reconstruct import ReconstructConfig, decode_causal, render_final
from wavespec_tpu.runtime.caches import (
    cycle_cache_filename,
    save_cycle_cache,
)


def extract_cycles_batch_chunked(
    series: np.ndarray,
    ecfg: ExtractConfig,
    hop: int = 1,
    chunk_windows: int = 16_384,
) -> np.ndarray:
    """Rolling-STFT extraction over an arbitrarily long history.

    `extract_cycles_batch` materializes the [nwin, window] frame matrix —
    fine for tens of thousands of windows, but the fetcher contract goes
    to 500k bars at hop=1 (`WaveCyclesBatchFetcher.mq5:36`), where that
    matrix would be terabytes. This driver slices the series into
    overlapping spans of `chunk_windows` windows (each chunk reuses ONE
    compiled program) and concatenates the attrs.

    Chunks carry a WARMUP margin of extra leading bars: the MUSIC batch
    path runs its preconditioning high-passes over the unframed series
    (`extract.py` batch fast path), and an IIR restarted cold at a chunk
    boundary would make the first windows of chunks 2+ differ from the
    unchunked result. The Ehlers pole decays like exp(-2*pi*k/period),
    so 3x the high-pass period leaves < 1e-8 of the transient; the
    warmup windows are computed and discarded. (FFT-ridge preconditions
    per window, where chunking is exact regardless.)
    """
    from wavespec_tpu.analyze.music import music_hp_period

    series = np.asarray(series, np.float32)
    n = len(series)
    w = ecfg.window
    nwin = 1 + (n - w) // hop
    if nwin <= chunk_windows:
        return np.asarray(extract_cycles_batch(jnp.asarray(series), ecfg, hop=hop))
    # The warmup lead only matters when the batch fast path actually runs
    # series-level IIR filters (same predicate as extract.py's fast path);
    # otherwise windows are preconditioned independently and chunking is
    # exact — lead=0 skips the compute-and-discard work entirely.
    fast_path = (
        ecfg.method == Method.MUSIC
        and ecfg.music_highpass
        and ecfg.detrend == DetrendMode.NONE
        and ecfg.taper == WindowType.NONE
    )
    warm_bars = 3 * music_hp_period(ecfg) if fast_path else 0
    warm_windows = -(-warm_bars // hop)  # ceil: discarded per chunk
    parts = []
    for w0 in range(0, nwin, chunk_windows):
        w1 = min(w0 + chunk_windows, nwin)
        lead = 0 if w0 == 0 else min(warm_windows, w0)
        start = (w0 - lead) * hop
        stop = (w1 - 1) * hop + w
        span = series[start:stop]
        # Two compiled shapes total: the leadless first chunk (cold start
        # IS the unchunked behavior there) and the full-lead shape for
        # every later chunk; the tail span is zero-padded to the shared
        # shape and its pad windows discarded.
        lead_shape = 0 if w0 == 0 else warm_windows
        want_len = (lead_shape + chunk_windows - 1) * hop + w
        n_real = w1 - w0
        if len(span) < want_len:
            span = np.pad(span, (0, want_len - len(span)))
        out = np.asarray(extract_cycles_batch(jnp.asarray(span), ecfg, hop=hop))
        parts.append(out[lead : lead + n_real])
    return np.concatenate(parts, axis=0)


def decoded_buffers(
    series: np.ndarray,
    ecfg: ExtractConfig,
    rcfg: ReconstructConfig,
    hop: int = 1,
):
    """Batch extract + full decode to per-bar buffers (cache layout).

    Returns dict with the 20 cycle-cache buffers (wave/period/eta/phase
    from the final rendered state; the six quality attrs placed at each
    window's newest bar) plus the raw attrs.
    """
    n_bars = len(series)
    attrs = jnp.asarray(extract_cycles_batch_chunked(series, ecfg, hop=hop))
    rendered = render_final(
        attrs, n_bars=n_bars, window=ecfg.window, hop=hop, cfg=rcfg
    )
    causal = decode_causal(attrs, rcfg)

    nwin = attrs.shape[0]
    bar_ends = np.arange(nwin) * hop + (ecfg.window - 1)

    def nan_to_zero(x):
        return np.nan_to_num(np.asarray(x), nan=0.0)

    buffers: dict[str, np.ndarray] = {}
    for wi in (0, 1):
        suffix = str(wi + 1)
        buffers["wave" + suffix] = nan_to_zero(rendered["wave"][:, wi])
        buffers["period" + suffix] = nan_to_zero(rendered["period"][:, wi])
        buffers["eta" + suffix] = nan_to_zero(rendered["eta_seconds"][:, wi])
        buffers["phase" + suffix] = nan_to_zero(rendered["phase"][:, wi])
        for field in ("energy", "coherence", "snr_db", "score", "eigen_ratio", "eta_conf"):
            buf = np.zeros(n_bars)
            buf[bar_ends] = np.asarray(causal[field][:, wi])
            key = {"snr_db": "snr", "eigen_ratio": "eigen"}.get(field, field)
            buffers[key + suffix] = buf
    return buffers, np.asarray(attrs)


def batch_warmup(
    series: np.ndarray,
    *,
    symbol: str = "SYM",
    timeframe: str = "M1",
    ecfg: ExtractConfig = ExtractConfig(),
    rcfg: ReconstructConfig = ReconstructConfig(),
    hop: int = 1,
    batch_bars_limit: int = 20_000,
    cache_dir: str | Path | None = None,
) -> dict[str, np.ndarray]:
    """Flagship batch warmup (`1.1.0:996-1122`): bounded history, decode,
    optionally persist the cycle cache."""
    if batch_bars_limit and len(series) > batch_bars_limit:
        series = series[-batch_bars_limit:]
    buffers, _ = decoded_buffers(series, ecfg, rcfg, hop=hop)
    if cache_dir is not None:
        name = cycle_cache_filename(
            symbol, timeframe, ecfg.window, int(ecfg.method), ecfg.ar_order, ecfg.top_k
        )
        save_cycle_cache(Path(cache_dir) / name, buffers)
    return buffers


@dataclasses.dataclass
class BatchFetcher:
    """`WaveCyclesBatchFetcher.mq5` parity: one-shot headless precompute."""

    symbol: str = "SYM"
    timeframe: str = "M1"
    ecfg: ExtractConfig = ExtractConfig()
    rcfg: ReconstructConfig = ReconstructConfig()
    max_bars: int = 500_000  # `WaveCyclesBatchFetcher.mq5:36`
    cache_dir: str | Path = "."

    def run(self, series: np.ndarray, hop: int = 1) -> dict[str, np.ndarray]:
        if len(series) > self.max_bars:
            series = series[-self.max_bars:]
        return batch_warmup(
            series,
            symbol=self.symbol,
            timeframe=self.timeframe,
            ecfg=self.ecfg,
            rcfg=self.rcfg,
            hop=hop,
            batch_bars_limit=0,
            cache_dir=self.cache_dir,
        )


@dataclasses.dataclass
class OnlineDriver:
    """Incremental per-bar driver with chunked history replay.

    The MT5 `OnCalculate(rates_total, prev_calculated)` contract: call
    `update(series)` whenever new bars exist; only new windows are
    computed (chunked to `history_chunk` per call, total replay bounded by
    `history_max_bars`), and previously emitted rows are never rewritten.
    """

    ecfg: ExtractConfig = ExtractConfig()
    rcfg: ReconstructConfig = ReconstructConfig()
    history_chunk: int = 2000        # `InpHistoryChunk`
    history_max_bars: int = 5000     # `InpHistoryMaxBars`
    # First-run backfill: recompute this many trailing windows (0 = whole
    # history) — `InpBackfillWindows` (`1.1.0:57`).
    backfill_windows: int = 0
    # Cap on live bars kept in the rolling computation (0 = unlimited) —
    # `InpMaxLiveBars` (`1.1.0:69`).
    max_live_bars: int = 0
    # Optional session: when set, extraction is routed through the
    # session's async job queue (`1.1.0:1266-1411` submit/drain analog) and
    # the skip-bar-no-fallback policy applies (`1.1.0:1243-1247`,
    # CHANGELOG.md:17-19): a non-ready session skips the chunk — buffers
    # are returned unchanged, never silently computed on a fallback path.
    session: Session | None = None

    prev_calculated: int = 0
    _wave: np.ndarray | None = None

    def _init_buffers(self) -> None:
        slots = self.rcfg.max_waves
        self._wave = np.zeros((0, slots), np.float32)
        self._period = np.zeros((0, slots), np.float32)
        self._eta = np.zeros((0, slots), np.float32)
        self._phase = np.zeros((0, slots), np.float32)
        self._aux = {f: np.zeros((0, slots), np.float32)
                     for f in ("energy", "coherence", "snr_db", "score",
                               "eigen_ratio", "eta_conf")}

    def update(self, series: np.ndarray) -> dict[str, np.ndarray]:
        """Process up to `history_chunk` new bars; returns current buffers.

        Output rows are per bar: wave/period/eta_seconds/phase for each
        wave slot (causal decode — the live, no-repaint state).
        """
        series = np.asarray(series, np.float64)
        n = len(series)
        w = self.ecfg.window
        slots = self.rcfg.max_waves
        if self._wave is None:
            self._init_buffers()

        first_needed = max(self.prev_calculated, w - 1)
        if self.prev_calculated == 0 and self.backfill_windows:
            first_needed = max(first_needed, n - self.backfill_windows)
        if self.max_live_bars and n - first_needed > self.max_live_bars:
            first_needed = n - self.max_live_bars
        if self.history_max_bars and n - first_needed > self.history_max_bars:
            first_needed = n - self.history_max_bars
        end = min(n, first_needed + self.history_chunk)
        if end <= first_needed:
            return self.buffers()

        # windows ending at bars [first_needed, end)
        start_of_first = first_needed - (w - 1)
        chunk = series[start_of_first:end]
        if self.session is not None:
            if not self.session.ready:
                # skip-bar-no-fallback: leave buffers as-is, do not advance.
                return self.buffers()
            jid = self.session.queue.submit(
                lambda s: extract_cycles_batch(
                    jnp.asarray(s, jnp.float32), self.ecfg, hop=1
                ),
                chunk,
            )
            attrs = self.session.queue.result(jid)  # blocking drain
            self.session.queue.free(jid)  # job-leak prevention (`1.1.0:705-709`)
        else:
            attrs = extract_cycles_batch(
                jnp.asarray(chunk, jnp.float32), self.ecfg, hop=1
            )
        decoded = decode_causal(attrs, self.rcfg)

        def app(cur, new):
            return np.concatenate([cur, np.asarray(new, np.float32)], axis=0)

        pad = first_needed - len(self._wave)
        if pad > 0:  # bars before the first full window -> zero rows
            z = np.zeros((pad, slots), np.float32)
            self._wave = app(self._wave, z)
            self._period = app(self._period, z)
            self._eta = app(self._eta, z)
            self._phase = app(self._phase, z)
            for f in self._aux:
                self._aux[f] = app(self._aux[f], z)
        self._wave = app(self._wave, decoded["wave"])
        self._period = app(self._period, decoded["period"])
        self._eta = app(self._eta, decoded["eta_seconds"])
        self._phase = app(self._phase, decoded["phase"])
        for f in self._aux:
            self._aux[f] = app(self._aux[f], decoded[f])
        self.prev_calculated = end
        return self.buffers()

    def buffers(self) -> dict[str, np.ndarray]:
        if self._wave is None:  # polled before any update(): empty state
            self._init_buffers()
        out = {
            "wave": self._wave,
            "period": self._period,
            "eta_seconds": self._eta,
            "phase": self._phase,
            "calculated": np.asarray(self.prev_calculated),
        }
        out.update(self._aux)  # MUSIC attr buffers (`1.1.0` MusEnergy etc.)
        return out
