"""Stage-cumulative MUSIC profiling on the real chip.

Times truncated prefixes of the PRODUCTION flagship batch pipeline
(extract_cycles_batch with method=MUSIC: series-level highpass -> frame
-> pseudospectrum -> batched band peaks -> ridge seed -> pre-rank ->
parabolic refine -> Gram fit), so stage cost = delta between rows. XLA
dead-code-eliminates everything after the returned sums. Timing uses the
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
    cfg = ExtractConfig(window=4096, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)
    n, k = cfg.window, cfg.top_k

    def stage(s, upto: str):
        hp_series = ehlers_highpass_detrend(s, M.music_hp_period(cfg))
        windows = frame_series(hp_series, cfg.window, hop)
        if upto == "hp+frame":
            return jnp.sum(windows)
        pseudo, freqs, eigvals, core, band_slices = M.music_pseudospectrum(
            windows, cfg)
        if upto == "pseudo":
            return jnp.sum(pseudo) + jnp.sum(eigvals)
        vals, gidx = M._topk_local_maxima_bands(
            pseudo, freqs, core, band_slices, k, excl=1.0 / n)
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
        ridge_gidx = jnp.clip(
            jnp.searchsorted(freqs, ridge_freq), 0, freqs.shape[0] - 1)
        freq = jnp.concatenate([freq, ridge_freq], axis=-1)
        gidx = jnp.concatenate([gidx, ridge_gidx], axis=-1)
        vals = jnp.concatenate(
            [vals, jnp.take_along_axis(pseudo, ridge_gidx, axis=-1)], axis=-1)
        valid = jnp.concatenate([valid, rp > 0], axis=-1)
        if upto == "ridge":
            return jnp.sum(freq) + jnp.sum(rp)
        c_count = freq.shape[-1]
        valid = M._dedupe_mask(freq, valid, 0.5 / n)
        k0 = jnp.clip(jnp.round(freq * n).astype(jnp.int32) - k_min_fb,
                      0, k_max_fb - k_min_fb)
        padbp = jnp.pad(
            band_power, [(0, 0)] * (band_power.ndim - 1) + [(1, 1)],
            mode="edge")
        tri = jnp.stack(
            [padbp[..., :-2], padbp[..., 1:-1], padbp[..., 2:]], axis=-1)
        p3 = jnp.take_along_axis(tri, k0[..., None], axis=-2)
        pm, p0, pp = p3[..., 0], p3[..., 1], p3[..., 2]
        denom = pm - 2.0 * p0 + pp
        shift = jnp.clip(
            (pm - pp) / jnp.where(jnp.abs(denom) > 1e-30, 2.0 * denom, 1e-30),
            -1.0, 1.0)
        pgram0 = p0 + 0.5 * (pp - pm) * shift + 0.5 * denom * shift * shift
        keep = min(2 * k, c_count)
        grid_step = 1.0 / (cfg.music_grid_per_bin * n)
        step0 = jnp.concatenate([
            jnp.full(freq.shape[:-1] + (c_count - k,), grid_step, jnp.float32),
            jnp.full(freq.shape[:-1] + (k,), 0.5 / n, jnp.float32)], axis=-1)
        pre_key = jnp.where(valid, pgram0, -1.0)
        _, keep_idx = jax.lax.top_k(pre_key, keep)
        packed = jnp.stack(
            [freq, valid.astype(jnp.float32), gidx.astype(jnp.float32), vals,
             step0],
            axis=-1)
        taken = jnp.take_along_axis(packed, keep_idx[..., None], axis=-2)
        freq = taken[..., 0]
        valid = taken[..., 1] > 0.5
        if upto == "prerank":
            return jnp.sum(freq) + jnp.sum(taken)
        freq, _ = M._refine_freq(windows, freq, step=taken[..., 4])
        valid = M._dedupe_mask(freq, valid, 0.5 / n)
        if upto == "refine":
            return jnp.sum(freq) + jnp.sum(valid)
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

        def leg(iters):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(chain(x, iters)))
                best = min(best, time.perf_counter() - t0)
            return best

        return (leg(6) - leg(1)) / 5

    prev = 0.0
    for upto in ["hp+frame", "pseudo", "peaks", "ridge", "prerank",
                 "refine", "fit"]:
        per = timed(upto)
        print(f"{upto:>9}: {per*1e3:8.2f} ms cumulative "
              f"(+{(per-prev)*1e3:7.2f} ms) -> {nwin/per:9.0f} win/s",
              flush=True)
        prev = per


if __name__ == "__main__":
    main()
