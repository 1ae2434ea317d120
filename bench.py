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
with a single scalar readback, and report (T(1+K) - T(1)) / K.

Prints THREE JSON lines — the MUSIC flagship line, the v757
full-analytics batch line (guarded: its failure cannot cost the
headline), then the headline ridge line LAST (the driver parses the
final line):
  {"metric": ..., "value": N, "unit": "windows/s/chip", "vs_baseline": R}
vs_baseline is measured against the 10k windows/s/chip north star
(BASELINE.md; the reference publishes no numbers of its own).
"""

import json
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


def _measure(cfg, hop: int, n_windows: int, k: int = 10) -> float:
    """Windows/sec for one extraction config via the dependent-chain trick."""
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

    # compile both programs
    float(np.asarray(chain(x, 1)))
    float(np.asarray(chain(x, 1 + k)))

    def timed(iters):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(chain(x, iters)))
            best = min(best, time.perf_counter() - t0)
        return best

    # The chain-length subtraction can come out non-positive under host
    # contention or tunnel jitter (observed once: t(1+k) <= t(1), which
    # the old 1e-9 floor turned into an absurd 5e11 win/s); re-measure
    # until the long chain is genuinely longer.
    for _ in range(5):
        t1 = timed(1)
        t1k = timed(1 + k)
        if t1k > t1 * 1.02:
            return n_windows / ((t1k - t1) / k)
    raise RuntimeError(
        f"non-monotone chain timing: t1={t1:.4f}s t1k={t1k:.4f}s"
    )


def _measure_v757(n_sym: int, n_frames: int, k: int = 6) -> float:
    """sym*bars/s for the v757 full-analytics multi-symbol batch."""
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

    float(np.asarray(chain(x, 1)))
    float(np.asarray(chain(x, 1 + k)))

    def timed(iters):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(chain(x, iters)))
            best = min(best, time.perf_counter() - t0)
        return best

    for _ in range(5):
        t1 = timed(1)
        t1k = timed(1 + k)
        if t1k > t1 * 1.02:
            return n_sym * n_frames / ((t1k - t1) / k)
    raise RuntimeError(
        f"non-monotone chain timing: t1={t1:.4f}s t1k={t1k:.4f}s"
    )


def _measure_retry(cfg, hop: int, n_windows: int, tries: int = 3) -> float:
    """The remote tunnel occasionally fails a whole program with a
    transient INTERNAL error (observed ~once per session); the driver
    runs this harness exactly once per round, so retry rather than lose
    the round's number."""
    last: Exception | None = None
    for _ in range(tries):
        try:
            return _measure(cfg, hop, n_windows)
        except Exception as exc:  # noqa: BLE001 - transient backend errors
            last = exc
            time.sleep(5.0)
    raise last


def main() -> None:
    from wavespec_tpu.extract import ExtractConfig, Method

    north_star = 10_000.0

    # Flagship: MUSIC at production defaults (`1.1.0:21,49-51`).
    music_cfg = ExtractConfig(
        window=4096, top_k=4, min_period=9.0, max_period=200.0,
        method=Method.MUSIC, ar_order=10,
    )
    music_wps = _measure_retry(music_cfg, hop=64, n_windows=512)
    print(
        json.dumps(
            {
                "metric": "music_flagship_4096pt_windows_per_sec_per_chip",
                "value": round(music_wps, 1),
                "unit": "windows/s/chip",
                "vs_baseline": round(music_wps / north_star, 3),
            }
        ),
        flush=True,
    )

    # v757 full analytics (the reference's complete per-bar pipeline —
    # each frame step is one windowed FFT + trackers/slots/leaks/biquad/
    # ETA/signals/Kalman, `...pla-kalman.mq5` OnCalculate), multi-symbol
    # batch axis at B=64. sym*bars/s is directly comparable to windows/s:
    # the reference does one FFT per bar. Guarded: a failure here must
    # not cost the round's headline (the driver parses the LAST line).
    try:
        # B=128 is the production config-#5 per-chip shape (1024 symbols
        # on a v5e-8 = 128 per chip) and fills the tracker/tail kernels'
        # 128 VPU lanes.
        v757_wps = _measure_v757(n_sym=128, n_frames=512)
        print(
            json.dumps(
                {
                    "metric": "v757_full_analytics_sym_bars_per_sec_per_chip",
                    "value": round(v757_wps, 1),
                    "unit": "sym*bars/s/chip",
                    "vs_baseline": round(v757_wps / north_star, 3),
                }
            ),
            flush=True,
        )
    except Exception as exc:  # noqa: BLE001 - keep the headline alive
        print(f"v757 bench failed: {exc!r}", flush=True)

    # Headline: FFT-ridge batch (BASELINE.json metric). LAST line.
    # The fused Pallas band-DFT (kernels/fused_dft.py) carries the DFT on
    # real devices; CPU falls back to the XLA four-step automatically.
    ridge_cfg = ExtractConfig(
        window=4096, top_k=8, min_period=18.0, max_period=200.0,
        method=Method.FFT_RIDGE, use_pallas_dft=True,
    )
    ridge_wps = _measure_retry(ridge_cfg, hop=16, n_windows=4096)
    print(
        json.dumps(
            {
                "metric": "4096pt_rfft_spectrum_topk_windows_per_sec_per_chip",
                "value": round(ridge_wps, 1),
                "unit": "windows/s/chip",
                "vs_baseline": round(ridge_wps / north_star, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
