"""BASELINE config #5 reality check on the real chip (VERDICT r2 #7).

Config #5 is the reference's scale-out ceiling: "1024 symbols x
multi-timeframe spectra sharded over a TPU mesh" (BASELINE.json
configs[4]; `WaveCyclesBatchFetcher.mq5` fetches them one at a time).
The CPU-mesh test (tests/test_mesh.py) proves the sharded program at
1024 symbols; this bench runs the SAME `pipeline_step_sharded` program
on the one real v5e chip (1-device mesh — the per-chip workload of a
v5e-8 running 8x this) to validate memory headroom + throughput at the
production upper end. Windows per symbol are bounded (the fetcher's
per-poll increment is a handful of new bars per symbol).

Prints one JSON line per method: symbols*windows/s on-chip.
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

    from wavespec_tpu.extract import ExtractConfig, Method
    from wavespec_tpu.mesh.mesh import make_mesh, shard_series_batch
    from wavespec_tpu.mesh.mesh import _pipeline_local
    from wavespec_tpu.reconstruct import ReconstructConfig
    import jax.sharding as shd
    from jax.sharding import PartitionSpec as P

    # argv[1] overrides the symbol count (CPU smoke runs use a small one).
    n_sym = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    window, hop = 4096, 64
    mesh = make_mesh({"data": 1})
    rcfg = ReconstructConfig()

    def series(nwin):
        n_bars = window + (nwin - 1) * hop
        t = np.arange(n_bars)
        rng = np.random.default_rng(0)
        # one shared noise draw + per-symbol phase/period variation keeps
        # host-side generation (and the tunnel upload) cheap at 1024 rows
        noise = np.cumsum(0.01 * rng.standard_normal(n_bars))
        b = np.arange(n_sym)[:, None]
        rows = (100.0 + noise[None, :]
                + 1.5 * np.sin(2 * np.pi * t[None, :] / (20 + (b % 5) * 6)
                               + 0.37 * b))
        return shard_series_batch(
            jnp.asarray(rows.astype(np.float32)), mesh)

    for name, method, nwin, kw in [
        ("fft_ridge", Method.FFT_RIDGE, 32, {}),
        ("music", Method.MUSIC, 8, dict(ar_order=10)),
    ]:
        ecfg = ExtractConfig(window=window, top_k=4, min_period=9.0,
                             max_period=200.0, method=method, **kw)
        x = series(nwin)

        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int, ecfg=ecfg):
            def local(block, it):
                def body(_, carry):
                    blk, acc = carry
                    attrs, wave = _pipeline_local(blk, ecfg, rcfg, hop)
                    tot = jnp.sum(attrs[..., -1, :, 1]) + jnp.sum(wave[..., -1, :])
                    return blk * (1.0 + 0.0 * tot), acc + tot
                # init carry must share the block's varying axes or the
                # fori_loop carry types mismatch under shard_map
                acc0 = jnp.sum(block[..., :1]) * 0.0
                _, acc = jax.lax.fori_loop(0, it, body, (block, acc0))
                return acc[None]
            shardf = jax.shard_map(
                partial(local, it=iters), mesh=mesh,
                in_specs=P("data", None), out_specs=P("data"))
            return jnp.sum(shardf(s))

        k = 4
        float(np.asarray(chain(x, 1)))
        float(np.asarray(chain(x, 1 + k)))
        per = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(np.asarray(chain(x, 1)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(np.asarray(chain(x, 1 + k)))
            tk = time.perf_counter() - t0
            per = min(per, (tk - t1) / k)
        print(json.dumps({
            "metric": f"config5_1024sym_{name}",
            "value": round(n_sym * nwin / per / 1e6, 3),
            "unit": "M sym*windows/s/chip",
            "per_call_ms": round(per * 1e3, 2),
            "symbols": n_sym, "windows_per_symbol": nwin,
        }), flush=True)


if __name__ == "__main__":
    main()
