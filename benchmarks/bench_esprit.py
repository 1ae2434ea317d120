"""ESPRIT batch extraction throughput (method=1's MUSIC/ESPRIT slot,
`WaveSpecZZ_1.1.0-gpuopt.mq5:50` — `Method.ESPRIT` shares MUSIC's
band-precondition/covariance/eig front end and swaps the pseudospectrum
scan for the rotational-invariance solve, `analyze/esprit.py`).

Same reproducible chain-delta method as bench.py (spread-gated median).
"""

import json
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from bench import _chain_rate


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
    cfg = ExtractConfig(window=window, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.ESPRIT, ar_order=10)

    @partial(jax.jit, static_argnames=("iters",))
    def chain(s, iters: int):
        def body(_, carry):
            s, acc = carry
            attrs = extract_cycles_batch(s, cfg, hop=hop)
            tot = jnp.sum(attrs[:, 0, 0])
            return s * (1.0 + 0.0 * tot), acc + tot
        _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
        return acc

    rate, spread = _chain_rate(chain, x, float(nwin), k=64)
    print(json.dumps({
        "metric": "esprit_4096pt_windows_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "windows/s/chip",
        "spread_pct": round(spread, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
