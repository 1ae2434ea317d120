"""Finest-grain chip attribution of the MUSIC precond prefix.

probe_pseudo.py showed the precond prefix (main hp + 3-band hp +
phase-decimated framing) at ~200 us while its pieces were measured at
~10 us in isolation; this probe times cumulative sub-prefixes to find
the real cost.
"""

import json
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import math

import numpy as np

from bench import _chain_rate


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.analyze import music as M
    from wavespec_tpu.extract import ExtractConfig, Method, frame_series
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
    bands = M._band_plan(cfg)
    periods = tuple(max(4, int(1.5 * hi)) for (_, hi, _) in bands)
    n = cfg.window

    def prefix(s, upto: str):
        # production extract path: first-sample anchor + MXU-Toeplitz main hp
        s0 = s - s[..., :1]
        hp_series = ehlers_highpass_detrend_mxu(
            s0, (M.music_hp_period(cfg),))[..., 0, :]
        if upto == "main_hp":
            return jnp.sum(hp_series)
        hp_all = ehlers_highpass_detrend_mxu(hp_series, periods)
        if upto == "band_hp":
            return jnp.sum(hp_all)
        tot = jnp.asarray(0.0, jnp.float32)
        decs = []
        for bi, (_, _, d) in enumerate(bands):
            hp_b = hp_all[..., bi, :]
            n_keep = (n // d) * d
            off = n - n_keep
            ld = n_keep // d
            g = d // math.gcd(d, hop)
            hop_d = g * hop // d
            nw_max = -(-nwin // g)
            need = ld + (nw_max - 1) * hop_d
            lmax = (g - 1) * hop + off + need * d
            pad_amt = max(0, lmax - hp_b.shape[-1])
            hp_p = jnp.pad(hp_b, [(0, pad_amt)]) if pad_amt else hp_b
            stacked = jnp.stack(
                [jax.lax.slice_in_dim(hp_p, r * hop + off,
                                      r * hop + off + need * d, axis=-1)
                 for r in range(g)], axis=-2)
            dec = jnp.mean(stacked.reshape(*stacked.shape[:-1], need, d),
                           axis=-1)
            decs.append((dec, ld, hop_d, g, nw_max))
            tot = tot + jnp.sum(dec)
        if upto == "decimate":
            return tot
        tot = jnp.asarray(0.0, jnp.float32)
        for dec, ld, hop_d, g, nw_max in decs:
            fr = frame_series(dec, ld, hop_d)
            st = jnp.swapaxes(fr, -3, -2)
            out = st.reshape(*st.shape[:-3], nw_max * g, ld)[..., :nwin, :]
            tot = tot + jnp.sum(out)
        return tot

    prev = 0.0
    for upto in ("main_hp", "band_hp", "decimate", "frame"):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int, upto=upto):
            def body(_, carry):
                s, acc = carry
                tot = prefix(s, upto)
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        rate, spread = _chain_rate(chain, x, 1.0, k=2048)
        us = 1e6 / rate
        print(json.dumps({
            "prefix": upto, "us_cumulative": round(us, 1),
            "us_delta": round(us - prev, 1), "spread_pct": round(spread, 1),
        }), flush=True)
        prev = us


if __name__ == "__main__":
    main()
