"""Online per-bar latency: ONE window through extract_cycles on the chip.

The serving path (`OnlineDriver`, the reference's per-bar async loop
`1.1.0:1266-1411`) issues one window per new bar; what matters there is
the latency of a single extraction, not batch throughput. Measured with
the jitted dependent-chain trick (bench.py): per-call device latency =
(T(1+K) - T(1)) / K, immune to the tunnel's enqueue-time
block_until_ready and transfer cost.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles

    n = 4096
    t = np.arange(n)
    x = jax.device_put(jnp.asarray(
        (np.cumsum(0.02 * np.random.default_rng(0).standard_normal(n))
         + 3.0 * np.sin(2 * np.pi * t / 50)
         + 2.0 * np.sin(2 * np.pi * t / 120)).astype(np.float32)))

    def measure(cfg):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int):
            def body(_, carry):
                s, acc = carry
                attrs = extract_cycles(s, cfg)
                tot = jnp.sum(attrs[0])
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        # Single-window programs run in tens of us; the tunnel's ~1 ms
        # readback jitter needs a LONG chain to resolve the delta.
        k = 1000
        float(np.asarray(chain(x, 1)))
        float(np.asarray(chain(x, 1 + k)))
        per = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); float(np.asarray(chain(x, 1)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(np.asarray(chain(x, 1 + k)))
            tk = time.perf_counter() - t0
            per = min(per, (tk - t1) / k)
        return per

    for name, method, kw in [
        ("music", Method.MUSIC, dict(ar_order=10)),
        ("fft_ridge", Method.FFT_RIDGE, {}),
    ]:
        cfg = ExtractConfig(window=n, top_k=4, min_period=9.0,
                            max_period=200.0, method=method, **kw)
        per = measure(cfg)
        print(json.dumps({
            "metric": f"single_window_{name}_latency_us",
            "value": round(per * 1e6, 1),
            "unit": "us/window (device)",
        }), flush=True)


if __name__ == "__main__":
    main()
