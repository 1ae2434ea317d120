"""hop=1 MUSIC throughput — the reference's warmup/online contract.

The reference's batch warmup and online extraction are hop=1
(`WaveSpecZZ_1.1.0-gpuopt.mq5:1014-1022`: nwin = 1 + (len - window)/hop
with hop=1, InpBatchBarsLimit=20000, InpBatchWaitMs=120000) — i.e. its
only implied perf envelope is "20k hop-1 windows inside 120 s"
(BASELINE.md). Every other MUSIC bench line is hop=64; this one measures
the flagship config AT hop=1, where the phase-decimated preconditioning
sees g = d distinct window alignments, and reports the implied 20k-window
warmup wall time against the reference's 120 s budget.

Also prints the same-session hop=64 rate so the hop=1/hop=64 precond
ratio is a single-session comparison (chip throughput drifts run-to-run).
"""

import json
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from bench import _chain_rate, _series


def measure(hop: int, n_windows: int, k: int):
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles_batch

    cfg = ExtractConfig(window=4096, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)
    slen = cfg.window + (n_windows - 1) * hop
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

    return _chain_rate(chain, x, float(n_windows), k)


def main() -> None:
    # hop=1: 2048 windows/iter; k sized for >= ~100 ms deltas at the
    # expected few-hundred-k win/s.
    wps1, spread1 = measure(hop=1, n_windows=2048, k=48)
    warmup_s = 20_000.0 / wps1
    print(json.dumps({
        "metric": "music_flagship_4096pt_hop1_windows_per_sec_per_chip",
        "value": round(wps1, 1), "unit": "windows/s/chip",
        "spread_pct": round(spread1, 1),
        "warmup_20k_windows_s": round(warmup_s, 3),
        "reference_budget_s": 120.0,
        "budget_ratio": round(120.0 / warmup_s, 1),
    }), flush=True)

    wps64, spread64 = measure(hop=64, n_windows=512, k=64)
    print(json.dumps({
        "metric": "music_flagship_4096pt_hop64_windows_per_sec_per_chip",
        "value": round(wps64, 1), "unit": "windows/s/chip",
        "spread_pct": round(spread64, 1),
        "hop1_over_hop64": round(wps1 / wps64, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
