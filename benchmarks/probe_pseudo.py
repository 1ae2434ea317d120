"""Chip sub-profile of the MUSIC pseudo stage (cov / eigh / grid).

The stage-level profiler (profile_music.py) reports the pseudo stage as
one +229 us block; this probe times its internals at the exact flagship
shapes by chaining truncated prefixes of `music_pseudospectrum`'s body:

  precond   band_precondition_windows only (framing + band high-pass)
  cov       + per-band Toeplitz autocovariance
  eigh      + stacked Jacobi eigh (kernels/jacobi_pallas on device)
  full      + sum-of-lags grid evaluation (== the whole pseudo stage)

Each prefix is DCE-trimmed by summing only its frontier arrays.
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

    from wavespec_tpu.analyze import music as M
    from wavespec_tpu.analyze.jacobi import jacobi_eigh
    from wavespec_tpu.extract import ExtractConfig, Method
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu

    window, hop, nwin = 4096, 64, 512
    slen = window + (nwin - 1) * hop
    t = np.arange(slen)
    x = jax.device_put(jnp.asarray(
        np.cumsum(0.02 * np.random.default_rng(0).standard_normal(slen))
        + 3 * np.sin(2 * np.pi * t / 50) + 2 * np.sin(2 * np.pi * t / 120),
        jnp.float32))
    cfg = ExtractConfig(window=4096, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)
    m = cfg.ar_order
    p = 2 * min(cfg.music_signals_per_band, cfg.top_k)
    bands = M._band_plan(cfg)

    def prefix(s, upto: str):
        # production extract path: first-sample anchor + MXU-Toeplitz main hp
        s0 = s - s[..., :1]
        hp_series = ehlers_highpass_detrend_mxu(
            s0, (M.music_hp_period(cfg),))[..., 0, :]
        band_w = M.band_precondition_windows(hp_series, cfg, hop)
        if upto == "precond":
            return sum(jnp.sum(bw) for bw in band_w)
        covs = [M._autocov_toeplitz(bw, m) for bw in band_w]
        r = jnp.stack(covs, axis=-3)
        if upto == "cov":
            return jnp.sum(r)
        eigvals, eigvecs = jacobi_eigh(r)
        if upto == "eigh":
            return jnp.sum(eigvals) + jnp.sum(eigvecs)
        tot = jnp.asarray(0.0, jnp.float32)
        for bi, (lo, hi, d) in enumerate(bands):
            freqs_b, _ = M._freq_grid_band(cfg, lo, hi)
            den = M._pseudo_denominator_lags(
                eigvecs[..., bi, :, : m - p], None, freqs_b, m, d)
            pseudo_b = 1.0 / jnp.maximum(den, 1e-12)
            pseudo_b = pseudo_b / jnp.mean(pseudo_b, axis=-1, keepdims=True)
            tot = tot + jnp.sum(pseudo_b)
        return tot

    prev = 0.0
    for upto in ("precond", "cov", "eigh", "full"):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int, upto=upto):
            def body(_, carry):
                s, acc = carry
                tot = prefix(s, upto)
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        rate, spread = _chain_rate(chain, x, 1.0, k=1024)
        us = 1e6 / rate
        print(json.dumps({
            "prefix": upto, "us_cumulative": round(us, 1),
            "us_delta": round(us - prev, 1), "spread_pct": round(spread, 1),
        }), flush=True)
        prev = us


if __name__ == "__main__":
    main()
