"""Reference-scale runs: window 16384 (v7.57 default, `...pla-kalman.mq5:801`)
and 32768 (gpu_wip default `:32`) through extract_cycles_batch (MUSIC) and
run_v757 on the real chip. Records windows/s (VERDICT r1 item 6).

Round 4: timing goes through bench.py's spread-gated `_chain_rate`
(chains sized for >= ~100 ms deltas, median of three deltas agreeing
within 10%, spread reported) — the round-3 "large run-to-run variance"
at 16384 was the few-ms-delta methodology, not the chip: the same
computation under the gated method reproduces to a few percent.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from bench import _chain_rate


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles_batch
    from wavespec_tpu.pipeline.v757 import V757Config, run_v757

    def series(n, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(n)
        return (np.cumsum(0.02 * rng.standard_normal(n))
                + 2.0 * np.sin(2 * np.pi * t / 50)
                + 1.0 * np.sin(2 * np.pi * t / 700)).astype(np.float32)

    # --- MUSIC batch at 16384 and 32768 ---
    # k sized for >= ~100 ms deltas at the historically observed rates
    # (~90-150k win/s at 16384, ~64k at 32768).
    for window, nwin, hop, k in [(16384, 128, 64, 128), (32768, 64, 64, 128)]:
        cfg = ExtractConfig(window=window, top_k=4, min_period=9.0,
                            max_period=200.0, method=Method.MUSIC,
                            ar_order=10)
        slen = window + (nwin - 1) * hop
        x = jax.device_put(jnp.asarray(series(slen)))

        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int, cfg=cfg, hop=hop):
            def body(_, carry):
                s, acc = carry
                attrs = extract_cycles_batch(s, cfg, hop=hop)
                tot = jnp.sum(attrs[:, 0, 0])
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        rate, spread = _chain_rate(chain, x, float(nwin), k=k)
        print(json.dumps({
            "metric": f"music_{window}pt_windows_per_sec_per_chip",
            "value": round(rate, 1), "unit": "windows/s/chip",
            "spread_pct": round(spread, 1),
        }), flush=True)

    # --- v757 full pipeline at 16384 (throughput incl. scans) ---
    window = 16384
    n_bars = window + 512
    cfg7 = V757Config(window=window, min_period=18.0, max_period=52.0)
    x = series(n_bars, seed=1)
    t0 = time.perf_counter()
    out = run_v757(x, cfg7, hop=1)
    dt = time.perf_counter() - t0  # includes compile
    frames = out["slot_period"].shape[0]
    t0 = time.perf_counter()
    out = run_v757(x, cfg7, hop=1)
    dt2 = time.perf_counter() - t0
    # DEVICE compute via the dependent-chain trick: the wall number above
    # includes the packed host transfer (~310 KB), which on a slow tunnel
    # day dominates by 10-100x — it measures the dev-setup link, not the
    # chip (production consumers keep results on device or stream them).
    from wavespec_tpu.pipeline.v757 import _v757_packed

    xd = jax.device_put(jnp.asarray(x))

    @partial(jax.jit, static_argnames=("iters",))
    def chain7(s, iters: int):
        def body(_, carry):
            s, acc = carry
            packed, _ = _v757_packed(s, cfg7, 1)
            tot = jnp.sum(packed[-1])
            return s * (1.0 + 0.0 * tot), acc + tot
        _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
        return acc

    rate7, spread7 = _chain_rate(chain7, xd, float(frames), k=16)
    print(json.dumps({
        "metric": "v757_16384pt_full_pipeline_bars_per_sec",
        "value": round(rate7, 1), "unit": "bars/s (device)",
        "spread_pct": round(spread7, 1),
        "wall_bars_per_sec": round(frames / dt2, 1),
        "first_call_s": round(dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
