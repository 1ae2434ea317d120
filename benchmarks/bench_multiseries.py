"""Multi-series batch throughput (BASELINE config #5 shape, single chip).

The fetcher workload: many symbols' rolling extractions in one fused
program. On a v5e-8 the series axis shards 8-way (wavespec_tpu.mesh);
this benchmark measures the per-chip series rate.
"""

import json
import time
from functools import partial

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles_batch

    n_series, window, hop = 128, 4096, 256
    slen = window + 31 * hop  # 32 windows per series
    rng = np.random.default_rng(0)
    periods = rng.uniform(20, 180, n_series)
    t = np.arange(slen)
    batch = np.sin(2 * np.pi * t[None, :] / periods[:, None]).astype(np.float32)
    x = jax.device_put(jnp.asarray(batch))
    import sys as _sys
    use_pallas = "--pallas" in _sys.argv

    def measure(cfg):
        def run(s):
            # batch-native: [S, L] straight in; the Pallas band DFT (when
            # enabled) tiles series x windows in ONE kernel grid.
            return extract_cycles_batch(s, cfg, hop=hop)

        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int):
            def body(_, carry):
                s, acc = carry
                attrs = run(s)
                tot = jnp.sum(attrs[:, 0, 0, 0])
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        float(np.asarray(chain(x, 1)))
        float(np.asarray(chain(x, 6)))
        per = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(np.asarray(chain(x, 1))); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(np.asarray(chain(x, 6))); t6 = time.perf_counter() - t0
            per = min(per, (t6 - t1) / 5)
        return n_series * 32 / per

    ridge_cfg = ExtractConfig(window=window, top_k=4, min_period=9.0,
                              max_period=200.0, method=Method.FFT_RIDGE,
                              use_pallas_dft=use_pallas)
    print(json.dumps({
        "metric": "multiseries_4096pt_windows_per_sec_per_chip",
        "series": n_series,
        "value": round(measure(ridge_cfg), 1),
        "unit": "windows/s/chip",
    }), flush=True)

    music_cfg = ExtractConfig(window=window, top_k=4, min_period=9.0,
                              max_period=200.0, method=Method.MUSIC,
                              ar_order=10)
    print(json.dumps({
        "metric": "multiseries_music_4096pt_windows_per_sec_per_chip",
        "series": n_series,
        "value": round(measure(music_cfg), 1),
        "unit": "windows/s/chip",
    }), flush=True)


if __name__ == "__main__":
    main()
