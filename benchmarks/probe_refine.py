"""Chip A/B probe for the MUSIC refine stage's trig-dot formulation.

The refine stage is the largest block of the flagship MUSIC budget
(+520 us of 1228 at 512 windows, benchmarks/profile_music.py). Its cost
is two einsums per periodogram call of shape [B=512 batched] [64,64] @
[64,24] — 4.7% MXU tile utilization, which predicts the measured time
exactly. Variants probed here fill the tiles without changing the math:

  v0  current `_refine_freq` (two einsums, N=24, n2=64)
  v1  merged cos/sin tables: ONE einsum, N=48
  v2  v1 with n2=128 (contraction dim fills the 128 MXU lanes)
  v3  v1 + block-diagonal window pairing: lhs [B/2, 128, 128] block-diag,
      rhs [B/2, 128, 48] — every tile dim full, 2x redundant zeros
  v4  v3 at Precision.HIGH (bf16x3) instead of HIGHEST

Each variant is checked against v0's refined frequencies (max |df|*n
in bins) before timing; timing is the spread-gated chain delta.
"""

import json
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from bench import _chain_rate


def build_variants(jnp, jax, M):
    hp = jax.lax.Precision.HIGHEST

    def merged_tables(freq, n1, n2):
        c1, s1, c2, s2 = M._factored_trig(freq, n1, n2)
        return c1, s1, jnp.concatenate([c2, s2], axis=-2)  # [..., 2K, n2]

    def combine(c1, s1, i_cs, K):
        ic, is_ = i_cs[..., :K, :], i_cs[..., K:, :]
        cos_dot = jnp.einsum("...ku,...ku->...k", c1, ic, precision=hp) - \
            jnp.einsum("...ku,...ku->...k", s1, is_, precision=hp)
        sin_dot = jnp.einsum("...ku,...ku->...k", s1, ic, precision=hp) + \
            jnp.einsum("...ku,...ku->...k", c1, is_, precision=hp)
        return cos_dot, sin_dot

    def dot_v1(xr, freq, n1, n2, prec=hp):
        K = freq.shape[-1]
        c1, s1, ts = merged_tables(freq, n1, n2)
        i_cs = jnp.einsum("...uv,...kv->...ku", xr, ts, precision=prec)
        return combine(c1, s1, i_cs, K)

    def dot_v3(xr, freq, n1, n2, prec=hp):
        # Block-diagonal pairing on the window axis: assumes xr
        # [B, n1, n2] with B even, n1 == n2 == 64.
        K = freq.shape[-1]
        c1, s1, ts = merged_tables(freq, n1, n2)
        x0, x1 = xr[0::2], xr[1::2]
        z = jnp.zeros_like(x0)
        lhs = jnp.concatenate(
            [jnp.concatenate([x0, z], -1), jnp.concatenate([z, x1], -1)], -2
        )  # [B/2, 2*n1, 2*n2]
        tsT = jnp.swapaxes(ts, -1, -2)  # [B, n2, 2K]
        rhs = jnp.concatenate([tsT[0::2], tsT[1::2]], axis=-2)  # [B/2, 2*n2, 2K]
        out = jnp.einsum("buv,bvk->buk", lhs, rhs, precision=prec)
        # un-pair: rows [:n1] are window 2i, rows [n1:] are window 2i+1
        i_cs = jnp.stack([out[:, :n1, :], out[:, n1:, :]], axis=1).reshape(
            -1, n1, 2 * K)  # [B, n1, 2K], original window order
        return combine(c1, s1, jnp.swapaxes(i_cs, -1, -2), K)

    def make_refine(dot_fn, n2, prec=hp):
        def refine(windows, freq, step, iters=2):
            n = windows.shape[-1]
            n1 = n // n2
            xr = windows.reshape(*windows.shape[:-1], n1, n2)

            def periodogram(f):
                kk = f.shape[-2] * f.shape[-1]
                ff = f.reshape(*f.shape[:-2], kk)
                c, s = dot_fn(xr, ff, n1, n2, prec)
                p = c * c + s * s
                return p.reshape(*f.shape)

            offsets = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
            step_ = jnp.asarray(step, jnp.float32)
            for _ in range(iters):
                cand = freq[..., None] + step_[..., None] * offsets
                p = periodogram(cand)
                denom = p[..., 0] - 2.0 * p[..., 1] + p[..., 2]
                vertex = 0.5 * (p[..., 0] - p[..., 2]) / jnp.where(
                    jnp.abs(denom) > 1e-30, denom, 1e-30)
                shift = jnp.where(
                    denom < 0.0, jnp.clip(vertex, -1.0, 1.0),
                    jnp.sign(p[..., 2] - p[..., 0]))
                freq = freq + shift * step_
                step_ = step_ / 4.0
            return freq

        return refine

    def refine_v0(windows, freq, step, iters=2):
        return M._refine_freq(windows, freq, step, iters)[0]

    high = jax.lax.Precision.HIGH
    return {
        "v0_current": refine_v0,
        "v1_merged_n48": make_refine(dot_v1, 64),
        "v2_merged_n2_128": make_refine(dot_v1, 128),
        "v3_pair_blockdiag": make_refine(dot_v3, 64),
        "v4_pair_high_prec": make_refine(dot_v3, 64, high),
    }


def main() -> None:
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.analyze import music as M
    from wavespec_tpu.extract import ExtractConfig, Method, frame_series
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu
    from wavespec_tpu.kernels.hopped_dft import hopped_eligible, rfft_band_hopped
    from wavespec_tpu.ops.spectrum import band_indices

    window, hop, nwin = 4096, 64, (16 if "--cpu" in sys.argv else 512)
    slen = window + (nwin - 1) * hop
    t = np.arange(slen)
    x = jax.device_put(jnp.asarray(
        np.cumsum(0.02 * np.random.default_rng(0).standard_normal(slen))
        + 3 * np.sin(2 * np.pi * t / 50) + 2 * np.sin(2 * np.pi * t / 120),
        jnp.float32))
    cfg = ExtractConfig(window=4096, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)

    @jax.jit
    def prerank(s):
        # production extract path: first-sample anchor + MXU-Toeplitz main hp
        s0 = s - s[..., :1]
        hp_series = ehlers_highpass_detrend_mxu(
            s0, (M.music_hp_period(cfg),))[..., 0, :]
        windows = frame_series(hp_series, cfg.window, hop)
        band_w = M.band_precondition_windows(hp_series, cfg, hop)
        seed_spec = None
        if hopped_eligible(cfg.window, hop):
            _, k_max_fb = band_indices(cfg.window, cfg.min_period,
                                       cfg.max_period)
            seed_spec = rfft_band_hopped(hp_series, cfg.window, hop,
                                         k_max_fb + 1)
        st = M.music_candidates(windows, cfg, band_windows=band_w,
                                seed_spec=seed_spec, upto="prerank")
        return windows, st["freq"], st["step0"]

    windows, freq0, step0 = prerank(x)
    windows = jax.block_until_ready(windows)

    variants = build_variants(jnp, jax, M)

    # correctness vs v0 (refined-frequency delta in FFT bins)
    ref = np.asarray(jax.jit(variants["v0_current"])(windows, freq0, step0))
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(windows, freq0, step0))
        print(f"{name}: max |df|*n = {np.abs(got - ref).max() * window:.3e} bins",
              flush=True)

    for name, fn in variants.items():
        @partial(jax.jit, static_argnames=("iters",))
        def chain(wf, iters: int, fn=fn):
            w, f0, s0 = wf

            def body(_, carry):
                f, acc = carry
                fr = fn(w, f0 + 0.0 * acc, s0)
                tot = jnp.sum(fr)
                return f, acc + tot

            _, acc = jax.lax.fori_loop(0, iters, body, (f0, 0.0))
            return acc

        rate, spread = _chain_rate(chain, (windows, freq0, step0), 1.0, k=512)
        print(json.dumps({"variant": name, "us_per_call": round(1e6 / rate, 1),
                          "spread_pct": round(spread, 1)}), flush=True)


if __name__ == "__main__":
    main()
