"""Stage-cumulative MUSIC latency profile at batch=1 (the serving path).

VERDICT r2 #5: the online loop (`OnlineDriver`, reference per-bar loop
`1.1.0:1266-1411`) issues ONE window per bar; its cost is the sequential
latency chain of a single extraction, not throughput. This profiler
times truncated prefixes of `extract_cycles`'s MUSIC path at batch=1 on
the real chip, with finer grain than benchmarks/profile_music.py inside
the pseudospectrum stage (covariance vs Jacobi eigh vs grid projection),
since at batch=1 the eigh's sequential rotation rounds are a suspected
latency floor.

Timing: jitted dependent-chain (bench.py trick) — per-call latency =
(T(1+K) - T(1)) / K with a LONG chain (K=400) because single-window
programs run in tens of microseconds under ~1 ms tunnel readback jitter.
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

    from wavespec_tpu.analyze import music as M
    from wavespec_tpu.analyze.jacobi import jacobi_eigh
    from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles

    n = 4096
    t = np.arange(n)
    x = jax.device_put(jnp.asarray(
        (np.cumsum(0.02 * np.random.default_rng(0).standard_normal(n))
         + 3.0 * np.sin(2 * np.pi * t / 50)
         + 2.0 * np.sin(2 * np.pi * t / 120)).astype(np.float32)))
    cfg = ExtractConfig(window=n, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)

    frontier = {
        "pseudo": ("pseudo", "eigvals"),
        "peaks": ("freq", "vals"),
        "ridge": ("freq", "rp"),
        "prerank": ("freq", "vals", "step0"),
        "refine": ("freq", "valid"),
        "fit": ("a", "b", "resid_energy"),
    }

    def hp_windows(s):
        w = s - s[..., :1]
        return M.ehlers_highpass_detrend(w, M.music_hp_period(cfg))

    def stage(s, upto: str):
        if upto == "attrs":
            return jnp.sum(extract_cycles(s, cfg))
        w = hp_windows(s)
        if upto == "hp":
            return jnp.sum(w)
        if upto in ("cov", "eigh"):
            covs = [
                M._autocov_toeplitz(
                    M.ehlers_highpass_detrend(
                        M._decimate_box(w, d), max(4, int(1.5 * hi / d))
                    ),
                    cfg.ar_order,
                )
                for (_, hi, d) in M._band_plan(cfg)
            ]
            r = jnp.stack(covs, axis=-3)
            if upto == "cov":
                return jnp.sum(r)
            ev, evec = jacobi_eigh(r)
            return jnp.sum(ev) + jnp.sum(evec)
        st = M.music_candidates(
            w, cfg, upto=None if upto == "fit" else upto)
        tot = jnp.asarray(0.0, jnp.float32)
        for key in frontier[upto]:
            tot = tot + jnp.sum(st[key].astype(jnp.float32))
        return tot

    def timed(upto):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int):
            def body(_, carry):
                s, acc = carry
                tot = stage(s, upto)
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        k = 400
        float(np.asarray(chain(x, 1)))
        float(np.asarray(chain(x, 1 + k)))
        per = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(np.asarray(chain(x, 1)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(np.asarray(chain(x, 1 + k)))
            tk = time.perf_counter() - t0
            per = min(per, (tk - t1) / k)
        return per

    prev = 0.0
    for upto in ["hp", "cov", "eigh", "pseudo", "peaks", "ridge",
                 "prerank", "refine", "fit", "attrs"]:
        per = timed(upto)
        print(f"{upto:>7}: {per*1e6:7.1f} us cumulative "
              f"(+{(per-prev)*1e6:7.1f} us)", flush=True)
        prev = per


if __name__ == "__main__":
    main()
