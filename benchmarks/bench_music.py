"""MUSIC batch extraction throughput (flagship method=1 warmup workload)."""

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

    window, hop, nwin = 4096, 64, 512
    slen = window + (nwin - 1) * hop
    t = np.arange(slen)
    x = jax.device_put(jnp.asarray(
        np.cumsum(0.02 * np.random.default_rng(0).standard_normal(slen))
        + 3 * np.sin(2 * np.pi * t / 50) + 2 * np.sin(2 * np.pi * t / 120),
        jnp.float32))
    cfg = ExtractConfig(window=window, top_k=4, min_period=9.0, max_period=200.0,
                        method=Method.MUSIC, ar_order=10)

    @partial(jax.jit, static_argnames=("iters",))
    def chain(s, iters: int):
        def body(_, carry):
            s, acc = carry
            attrs = extract_cycles_batch(s, cfg, hop=hop)
            tot = jnp.sum(attrs[:, 0, 0])
            return s * (1.0 + 0.0 * tot), acc + tot
        _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
        return acc

    float(np.asarray(chain(x, 1)))
    float(np.asarray(chain(x, 16)))

    # Best-of-4: the remote tunnel adds multi-ms jitter per readback, and a
    # single (t_long - t_short) pair can even go NEGATIVE on a hiccup.
    def timed(iters: int) -> float:
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(chain(x, iters)))
            best = min(best, time.perf_counter() - t0)
        return best

    per = max((timed(16) - timed(1)) / 15, 1e-9)
    print(json.dumps({
        "metric": "music_4096pt_windows_per_sec_per_chip",
        "value": round(nwin / per, 1),
        "unit": "windows/s/chip",
    }))


if __name__ == "__main__":
    main()
