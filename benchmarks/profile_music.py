"""Stage-cumulative MUSIC profiling on the real chip.

Times truncated prefixes of the MUSIC pipeline (XLA dead-code-eliminates
everything after the returned sums), so stage cost = delta between rows.
Timing uses the jitted dependent-chain trick from bench.py (axon's
block_until_ready returns at enqueue).
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
    from wavespec_tpu.kernels.mxu_fft import rfft_mxu
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend
    from wavespec_tpu.ops.spectrum import band_indices

    window, hop, nwin = 4096, 64, 512
    slen = window + (nwin - 1) * hop
    t = np.arange(slen)
    x = jax.device_put(jnp.asarray(
        np.cumsum(0.02 * np.random.default_rng(0).standard_normal(slen))
        + 3 * np.sin(2 * np.pi * t / 50) + 2 * np.sin(2 * np.pi * t / 120),
        jnp.float32))
    cfg = ExtractConfig(window=window, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)
    n, k = cfg.window, cfg.top_k

    def stage(s, upto: str):
        windows = frame_series(s, cfg.window, hop)
        hp_period = min(int(2 * cfg.max_period), n // 2)
        windows = ehlers_highpass_detrend(windows, hp_period)
        if upto == "hp":
            return jnp.sum(windows)
        pseudo, freqs, eigvals, core, band_slices = M.music_pseudospectrum(
            windows, cfg)
        if upto == "pseudo":
            return jnp.sum(pseudo) + jnp.sum(eigvals)
        cand_vals, cand_gidx = [], []
        for (s0, s1) in band_slices:
            v_b, g_b = M._topk_local_maxima(
                pseudo[..., s0:s1], freqs[s0:s1], k, excl=1.0 / n,
                candidate=core[s0:s1])
            cand_vals.append(v_b)
            cand_gidx.append(g_b + s0)
        vals = jnp.concatenate(cand_vals, axis=-1)
        gidx = jnp.concatenate(cand_gidx, axis=-1)
        freq = freqs[gidx]
        valid = vals > 0
        if upto == "peaks":
            return jnp.sum(freq) + jnp.sum(vals)
        k_min_fb, k_max_fb = band_indices(n, cfg.min_period, cfg.max_period)
        spec_fb = rfft_mxu(windows, max_bins=k_max_fb + 1)
        band_power = (jnp.real(spec_fb) ** 2 + jnp.imag(spec_fb) ** 2)[
            ..., k_min_fb: k_max_fb + 1]
        rp, ridx = jax.lax.top_k(band_power, k)
        ridge_freq = (ridx + k_min_fb).astype(jnp.float32) / n
        freq = jnp.concatenate([freq, ridge_freq], axis=-1)
        valid = jnp.concatenate([valid, rp > 0], axis=-1)
        if upto == "ridge":
            return jnp.sum(freq) + jnp.sum(rp)
        grid_step = 1.0 / (cfg.music_grid_per_bin * n)
        freq, pgram = M._refine_freq(windows, freq, step=grid_step)
        if upto == "refine":
            return jnp.sum(freq) + jnp.sum(pgram)
        keep = min(2 * k, freq.shape[-1])
        pre_key = jnp.where(valid, pgram, -1.0)
        _, keep_idx = jax.lax.top_k(pre_key, keep)
        freq = jnp.take_along_axis(freq, keep_idx, axis=-1)
        valid = jnp.take_along_axis(
            valid.astype(jnp.int32), keep_idx, axis=-1).astype(bool)
        a, b, resid = M._sinusoid_fit(windows, freq,
                                      valid=valid.astype(jnp.float32))
        if upto == "fit":
            return jnp.sum(a) + jnp.sum(b) + jnp.sum(resid)
        raise ValueError(upto)

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
        t0 = time.perf_counter(); float(np.asarray(chain(x, 1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(chain(x, 6)))
        t6 = time.perf_counter() - t0
        return (t6 - t1) / 5

    prev = 0.0
    for upto in ["hp", "pseudo", "peaks", "ridge", "refine", "fit"]:
        per = timed(upto)
        print(f"{upto:>8}: {per*1e3:8.2f} ms cumulative "
              f"(+{(per-prev)*1e3:7.2f} ms) -> {nwin/per:9.0f} win/s",
              flush=True)
        prev = per


if __name__ == "__main__":
    main()
