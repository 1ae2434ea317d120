"""Chip attribution inside the v757 spectral stage at window 16384, B=1.

profile_v757.py shows the spectral stage at ~7.8 ms per 512 frames (64%
of the @16384 pipeline); its FLOP content (sliding band DFT ~0.25 GMAC)
is worth well under 1 ms, so this probe locates the rest among:

  spec      sliding band DFT + Ehlers rank-1 correction
  power     + per-bin squared magnitude
  cands     + in-band top-k candidates
  full      + group-delay plane (== profile_v757's spectral stage)
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

    from wavespec_tpu.pipeline import v757 as V

    window, n_frames = 16384, 512
    cfg = V.V757Config(window=window, min_period=18.0, max_period=52.0)
    n_bars = window + n_frames - 1
    t = np.arange(n_bars)
    x = jax.device_put(jnp.asarray(
        (100.0 + np.cumsum(
            0.02 * np.random.default_rng(0).standard_normal(n_bars))
         + 2.0 * np.sin(2 * np.pi * t / 32)).astype(np.float32)))

    from wavespec_tpu.kernels.sliding_dft import sliding_band_spec
    from wavespec_tpu.ops.spectrum import band_indices
    from wavespec_tpu.extract import DetrendMode

    n = cfg.window
    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    n_bins = min(k_max + 3, n // 2)

    def spec_of(s):
        import numpy as _np
        from wavespec_tpu.kernels.sliding_dft import tapered_dft_of
        from wavespec_tpu.ops.detrend import ehlers_highpass_detrend

        s = s.astype(jnp.float32)
        assert cfg.detrend == DetrendMode.EHLERS
        wf = 2.0 * _np.pi / cfg.trend_period
        alpha = (1.0 - _np.sin(wf)) / _np.cos(wf)
        c2 = 1.0 - alpha
        hp_s = ehlers_highpass_detrend(s, cfg.trend_period)
        spec = sliding_band_spec(hp_s, n, n_bins, cfg.taper)
        t_frames = spec.shape[-2]
        trend_s = s - hp_s
        delta = (jnp.float32(c2) * s[..., :t_frames]
                 - trend_s[..., :t_frames])
        tg = jnp.asarray(tapered_dft_of(
            alpha ** _np.arange(n, dtype=_np.float64), n_bins, cfg.taper))
        return spec - delta[..., None] * tg

    def prefix(s, upto: str):
        spec = spec_of(s)
        if upto == "spec":
            return jnp.sum(jnp.real(spec)) + jnp.sum(jnp.imag(spec))
        power = jax.lax.optimization_barrier(
            jnp.real(spec) * jnp.real(spec)
        ) + jax.lax.optimization_barrier(jnp.imag(spec) * jnp.imag(spec))
        if upto == "power":
            return jnp.sum(power)
        hi = min(k_max + 1, n // 2)
        inband = power[..., k_min:hi]
        cand_power, cand_idx = jax.lax.top_k(
            inband, min(cfg.n_candidates, hi - k_min))
        if upto == "cands":
            return jnp.sum(cand_power) + jnp.sum(cand_idx)
        out = V._cands_and_gd(spec, cfg)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    prev = 0.0
    for upto in ("spec", "power", "cands", "full"):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int, upto=upto):
            def body(_, carry):
                s, acc = carry
                tot = prefix(s, upto)
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        rate, spread = _chain_rate(chain, x, 1.0, k=64)
        us = 1e6 / rate
        print(json.dumps({
            "prefix": upto, "us_cumulative": round(us, 1),
            "us_delta": round(us - prev, 1), "spread_pct": round(spread, 1),
        }), flush=True)
        prev = us


if __name__ == "__main__":
    main()
