"""Stage-cumulative profile of the bench.py ridge headline on the chip.

The headline leg (4096-pt FFT_RIDGE, hop=16, 4096 windows) measured
~2.0M windows/s while the isolated Pallas band DFT sustains ~13M
windows/s at the same window count — so the non-DFT stages dominate.
This times truncated prefixes of `extract.-fft_ridge` exactly as
benchmarks/profile_music.py does for MUSIC (XLA dead-code-eliminates
past the returned sums; stage cost = row delta; dependent-chain timing
from bench.py).
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

    from wavespec_tpu.extract import ExtractConfig, Method, frame_series, _precondition
    from wavespec_tpu.ops.spectrum import band_indices

    window, hop, nwin = 4096, 16, 4096
    slen = window + (nwin - 1) * hop
    t = np.arange(slen)
    x = jax.device_put(jnp.asarray(
        np.cumsum(0.02 * np.random.default_rng(0).standard_normal(slen))
        + 3 * np.sin(2 * np.pi * t / 50) + 2 * np.sin(2 * np.pi * t / 120),
        jnp.float32))
    cfg = ExtractConfig(window=window, top_k=8, min_period=18.0,
                        max_period=200.0, method=Method.FFT_RIDGE,
                        use_pallas_dft=True)
    k_min, k_max = band_indices(window, cfg.min_period, cfg.max_period)

    def stage(s, upto: str):
        windows = frame_series(s, window, hop)
        if upto == "frame":
            return jnp.sum(windows)
        windows = _precondition(windows, cfg)
        from wavespec_tpu.kernels.fused_dft import rfft_band_fused_any
        spec = rfft_band_fused_any(windows, max_bins=k_max + 3)
        if upto == "dft":
            return jnp.sum(jnp.real(spec)) + jnp.sum(jnp.imag(spec))
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        band_p = power[..., k_min : k_max + 1]
        if upto == "power":
            return jnp.sum(band_p)
        peak_p, band_idx = jax.lax.top_k(band_p, cfg.top_k)
        if upto == "topk":
            return jnp.sum(peak_p) + jnp.sum(band_idx)
        from wavespec_tpu.extract import _fft_ridge
        attrs = _fft_ridge(windows, cfg)
        return jnp.sum(attrs)

    def timed(upto):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int):
            def body(_, carry):
                s, acc = carry
                tot = stage(s, upto)
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        float(np.asarray(chain(x, 1)))
        float(np.asarray(chain(x, 6)))

        def leg(iters):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(chain(x, iters)))
                best = min(best, time.perf_counter() - t0)
            return best

        return (leg(6) - leg(1)) / 5

    prev = 0.0
    for upto in ["frame", "dft", "power", "topk", "attrs"]:
        per = timed(upto)
        print(f"{upto:>6}: {per*1e3:8.2f} ms cumulative "
              f"(+{(per-prev)*1e3:7.2f} ms) -> {nwin/per:9.0f} win/s",
              flush=True)
        prev = per

    # ---- hopped path (the production default after round 3) ----
    from wavespec_tpu.extract import _ridge_attrs_from_spec
    from wavespec_tpu.kernels.hopped_dft import rfft_band_hopped

    def stage_h(s, upto: str):
        spec = rfft_band_hopped(s, window, hop, k_max + 3)
        if upto == "h_spec":
            return jnp.sum(jnp.real(spec)) + jnp.sum(jnp.imag(spec))
        if upto == "h_power":
            power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
            return jnp.sum(power[..., k_min : k_max + 1])
        return jnp.sum(_ridge_attrs_from_spec(spec, cfg))

    def timed_h(upto):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int):
            def body(_, carry):
                s, acc = carry
                tot = stage_h(s, upto)
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        float(np.asarray(chain(x, 1)))
        float(np.asarray(chain(x, 11)))

        def leg(iters):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(chain(x, iters)))
                best = min(best, time.perf_counter() - t0)
            return best

        return (leg(11) - leg(1)) / 10

    prev = 0.0
    for upto in ["h_spec", "h_power", "h_attrs"]:
        per = timed_h(upto)
        print(f"{upto:>7}: {per*1e3:8.2f} ms cumulative "
              f"(+{(per-prev)*1e3:7.2f} ms) -> {nwin/per:9.0f} win/s",
              flush=True)
        prev = per


if __name__ == "__main__":
    main()
