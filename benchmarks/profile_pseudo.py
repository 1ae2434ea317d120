"""Sub-profile music_pseudospectrum internals on the real chip."""

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
    from wavespec_tpu.extract import ExtractConfig, Method, frame_series
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend

    window, hop, nwin = 4096, 64, 512
    slen = window + (nwin - 1) * hop
    t = np.arange(slen)
    x = jax.device_put(jnp.asarray(
        np.cumsum(0.02 * np.random.default_rng(0).standard_normal(slen))
        + 3 * np.sin(2 * np.pi * t / 50) + 2 * np.sin(2 * np.pi * t / 120),
        jnp.float32))
    cfg = ExtractConfig(window=window, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)
    n = cfg.window
    m = cfg.ar_order
    bands = M._band_plan(cfg)
    print("bands:", bands, flush=True)

    def stage(s, upto: str, sweeps: int = 6):
        windows = frame_series(s, cfg.window, hop)
        hp_period = min(int(2 * cfg.max_period), n // 2)
        windows = ehlers_highpass_detrend(windows, hp_period)
        covs = [
            M._autocov_toeplitz(
                ehlers_highpass_detrend(
                    M._decimate_box(windows, d), max(4, int(1.5 * hi / d))
                ),
                m,
            )
            for (_, hi, d) in bands
        ]
        r = jnp.stack(covs, axis=-3)
        if upto == "cov":
            return jnp.sum(r)
        eigvals, eigvecs = jacobi_eigh(r, sweeps=sweeps)
        if upto == "eigh":
            return jnp.sum(eigvals) + jnp.sum(eigvecs)
        pseudo, freqs, ev, core, sl = M.music_pseudospectrum(windows, cfg)
        return jnp.sum(pseudo) + jnp.sum(ev)

    def timed(upto, sweeps=6):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int):
            def body(_, carry):
                s, acc = carry
                tot = stage(s, upto, sweeps)
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        float(np.asarray(chain(x, 1)))
        float(np.asarray(chain(x, 6)))
        t0 = time.perf_counter(); float(np.asarray(chain(x, 1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(chain(x, 6)))
        t6 = time.perf_counter() - t0
        return (t6 - t1) / 5

    for name, sweeps in [("cov", 6), ("eigh", 6), ("eigh", 3), ("full", 6)]:
        per = timed(name, sweeps)
        print(f"{name:>6} sweeps={sweeps}: {per*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
