"""Multi-symbol v757 batch-axis throughput on the real chip.

The single-series v757 device path is bounded by ~13.7 us/frame of
spread-out small-op latency in the tracker/ETA scan chain (docs/ROUND2.md
open item 1 — measured dead ends documented in memory); the production
answer is the symbol batch axis (`run_v757_batch`), which advances every
symbol's state machines in one scan step. This bench measures
symbols x bars / sec at several batch widths to show the amortization.

Timing: jitted dependent chain + one scalar readback (remote tunnel —
see bench.py docstring).
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.pipeline import v757 as V

    window, n_frames = 4096, 512
    cfg = V.V757Config(window=window, min_period=18.0, max_period=52.0)
    n_bars = window + n_frames - 1
    t = np.arange(n_bars)

    def batch(n_sym):
        rng = np.random.default_rng(0)
        rows = [
            100.0
            + np.cumsum(0.01 * rng.standard_normal(n_bars))
            + 1.5 * np.sin(2 * np.pi * t / (20 + (b % 5) * 6))
            for b in range(n_sym)
        ]
        return jax.device_put(jnp.asarray(np.asarray(rows, np.float32)))

    @partial(jax.jit, static_argnames=("iters",))
    def chain(x, iters: int):
        def body(_, carry):
            x, acc = carry
            packed, _ = V._v757_batch_packed(x, cfg, 1)
            tot = jnp.sum(packed[:, -1, :])
            return x * (1.0 + 0.0 * tot), acc + tot

        _, acc = jax.lax.fori_loop(0, iters, body, (x, 0.0))
        return acc

    print(f"window={window} frames/sym={n_frames} (v757 full analytics)")
    for n_sym in (1, 64, 128):
        x = batch(n_sym)
        k = 6
        float(chain(x, 1))  # compile both shapes
        float(chain(x, 1 + k))
        t0 = time.perf_counter(); float(chain(x, 1)); t1 = time.perf_counter()
        float(chain(x, 1 + k)); t2 = time.perf_counter()
        per_call = ((t2 - t1) - (t1 - t0)) / k
        sym_bars = n_sym * n_frames / per_call
        print(
            f"  B={n_sym:4d}: {per_call*1e3:8.2f} ms/call  "
            f"{sym_bars/1e3:10.1f}k sym*bars/s  "
            f"({per_call/ (n_sym*n_frames) *1e6:6.2f} us/frame-step)"
        )


if __name__ == "__main__":
    main()
