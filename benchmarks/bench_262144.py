"""One measured point at the reference's anticipated-max window 262144
(`/root/reference/Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:801` enumerates
InpFFTWindow up to 262144) — VERDICT r4 item 6.

Two workloads, each guarded so a failure cannot hide the other:
  1. Full v7.57 analytics (`pipeline.v757`) at window 262144, single
     series — the sliding band DFT's factored anchor keeps the basis off
     HBM-collapse ([N, K*M] would be 46 GB; the factored route peaks at
     ~1.4 GB for the anchor intermediates at 256 frames).
  2. MUSIC extract_cycles_batch at window 262144 (hopped seed DFT with
     the multi-level row combine, R=2048 -> radix levels (8,8,8,4)).

Timing: bench.py's spread-gated dependent-chain delta.

Usage: bench_262144.py [v757|music|both]
"""

import json
import sys
import traceback
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from bench import _chain_rate

WINDOW = 262144


def _series(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (np.cumsum(0.02 * rng.standard_normal(n))
            + 2.0 * np.sin(2 * np.pi * t / 50)
            + 1.0 * np.sin(2 * np.pi * t / 700)).astype(np.float32)


def bench_v757(n_frames: int = 256, k: int = 8) -> None:
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.pipeline import v757 as V

    cfg = V.V757Config(window=WINDOW, min_period=18.0, max_period=52.0)
    x = jax.device_put(jnp.asarray(_series(WINDOW + n_frames - 1, seed=1)))

    @partial(jax.jit, static_argnames=("iters",))
    def chain(s, iters: int):
        def body(_, carry):
            s, acc = carry
            packed, _ = V._v757_batch_packed(s[None, :], cfg, 1)
            tot = jnp.sum(packed[:, -1, :])
            return s * (1.0 + 0.0 * tot), acc + tot
        _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
        return acc

    rate, spread = _chain_rate(chain, x, float(n_frames), k=k)
    print(json.dumps({
        "metric": "v757_full_analytics_262144pt_bars_per_sec_per_chip",
        "value": round(rate, 1), "unit": "bars/s/chip",
        "spread_pct": round(spread, 1), "n_frames": n_frames,
    }), flush=True)


def bench_music(nwin: int = 32, hop: int = 64, k: int = 32) -> None:
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles_batch

    # music_xla_select: the Pallas select kernel is tuned for production
    # grids (~1.7k points at 4096); at this window the merged grid is
    # ~116k points — route selection through the XLA chain instead of
    # risking an unbounded Mosaic compile for a scale probe.
    cfg = ExtractConfig(window=WINDOW, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10,
                        music_xla_select=True)
    slen = WINDOW + (nwin - 1) * hop
    x = jax.device_put(jnp.asarray(_series(slen)))

    @partial(jax.jit, static_argnames=("iters",))
    def chain(s, iters: int):
        def body(_, carry):
            s, acc = carry
            attrs = extract_cycles_batch(s, cfg, hop=hop)
            tot = jnp.sum(attrs[:, 0, 0])
            return s * (1.0 + 0.0 * tot), acc + tot
        _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
        return acc

    rate, spread = _chain_rate(chain, x, float(nwin), k=k)
    print(json.dumps({
        "metric": "music_262144pt_windows_per_sec_per_chip",
        "value": round(rate, 1), "unit": "windows/s/chip",
        "spread_pct": round(spread, 1), "n_windows": nwin,
    }), flush=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("v757", "both"):
        try:
            bench_v757()
        except Exception:
            traceback.print_exc()
    if which in ("music", "both"):
        try:
            bench_music()
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    main()
