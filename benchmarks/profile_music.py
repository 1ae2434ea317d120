"""Stage-cumulative MUSIC profiling on the real chip.

Times truncated prefixes of the PRODUCTION flagship batch pipeline
(extract_cycles_batch with method=MUSIC) via `music_candidates(upto=...)`
— the same staged function the production path runs, so the profiler can
never diverge from it. XLA dead-code-eliminates everything after the
returned sums, so stage cost = delta between rows. Timing uses the
jitted dependent-chain trick from bench.py (axon's block_until_ready
returns at enqueue); each leg is best-of-3 against tunnel jitter.
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
    from wavespec_tpu.extract import ExtractConfig, Method, frame_series
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu
    from wavespec_tpu.kernels.hopped_dft import hopped_eligible, rfft_band_hopped

    # argv: [window] [hop] [nwin] — e.g. `profile_music.py 16384 64 128`
    # profiles the v7.57-default window (VERDICT r4 item 5). nwin is
    # chosen so the per-iter time stays ~0.8 ms at the observed rates,
    # keeping the per-stage k chain lengths valid across windows.
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    hop = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nwin = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    slen = window + (nwin - 1) * hop
    t = np.arange(slen)
    x = jax.device_put(jnp.asarray(
        np.cumsum(0.02 * np.random.default_rng(0).standard_normal(slen))
        + 3 * np.sin(2 * np.pi * t / 50) + 2 * np.sin(2 * np.pi * t / 120),
        jnp.float32))
    cfg = ExtractConfig(window=window, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)

    # Per-stage frontier arrays: summing ONLY these lets XLA dead-code-
    # eliminate everything the truncated prefix doesn't need (summing the
    # whole stage dict keeps every intermediate alive and overstates the
    # totals by ~2x).
    frontier = {
        "pseudo": ("pseudo", "eigvals"),
        "peaks": ("freq", "vals"),
        "ridge": ("freq", "rp"),
        "prerank": ("freq", "vals", "step0"),
        "refine": ("freq", "valid"),
        "fit": ("a", "b", "resid_energy"),
    }

    def stage(s, upto: str):
        # production extract path: first-sample anchor + MXU-Toeplitz main hp
        s0 = s - s[..., :1]
        hp_series = ehlers_highpass_detrend_mxu(
            s0, (M.music_hp_period(cfg),))[..., 0, :]
        windows = frame_series(hp_series, cfg.window, hop)
        if upto == "hp+frame":
            return jnp.sum(windows)
        band_w = M.band_precondition_windows(hp_series, cfg, hop)
        # Ridge seeds via the hopped DFT, exactly like the production
        # batch fast path (extract_cycles_batch).
        seed_spec = None
        if hopped_eligible(cfg.window, hop):
            from wavespec_tpu.ops.spectrum import band_indices
            _, k_max_fb = band_indices(cfg.window, cfg.min_period,
                                       cfg.max_period)
            seed_spec = rfft_band_hopped(hp_series, cfg.window, hop,
                                         k_max_fb + 1)
        st = M.music_candidates(
            windows, cfg, band_windows=band_w, seed_spec=seed_spec,
            upto=None if upto == "fit" else upto,
        )
        tot = jnp.asarray(0.0, jnp.float32)
        for key in frontier[upto]:
            tot = tot + jnp.sum(st[key].astype(jnp.float32))
        return tot

    def timed(upto, k):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int):
            def body(_, carry):
                s, acc = carry
                tot = stage(s, upto)
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        # spread-gated chain delta (bench._chain_rate): k sized per stage
        # for >= ~100 ms deltas; median of three deltas within 10%.
        from bench import _chain_rate

        rate, spread = _chain_rate(chain, x, float(nwin), k=k)
        return nwin / rate, spread

    # Production stops only: "peaks"/"ridge" stop the XLA selection chain
    # (the CPU/test path) and say nothing about the device pipeline, which
    # routes peaks->ridge->prerank through ONE Pallas launch.
    prev = 0.0
    for upto, k in [("hp+frame", 512), ("pseudo", 160), ("prerank", 72),
                    ("refine", 64), ("fit", 64)]:
        per, spread = timed(upto, k)
        print(f"{upto:>9}: {per*1e3:8.3f} ms cumulative "
              f"(+{(per-prev)*1e3:7.3f} ms, spread {spread:4.1f}%) "
              f"-> {nwin/per:9.0f} win/s",
              flush=True)
        prev = per


if __name__ == "__main__":
    main()
