"""Chip A/B of the MUSIC select kernel's window tile (WT sublanes/step).

The fused peaks+ridge+prerank Pallas kernel is the second-largest block
of the flagship MUSIC budget (+204 us of ~0.9 ms at 512 windows). Its
per-step vector work is fixed; WT trades grid-step count against
per-step operand size. This probe times the production kernel at
WT in {16, 32, 64, 128} on realistic inputs.
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
    from wavespec_tpu.extract import ExtractConfig, Method, frame_series
    from wavespec_tpu.kernels import music_select_pallas as S
    from wavespec_tpu.kernels.hopped_dft import rfft_band_hopped
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu
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

    @jax.jit
    def inputs(s):
        s0 = s - s[..., :1]
        hp_series = ehlers_highpass_detrend_mxu(
            s0, (M.music_hp_period(cfg),))[..., 0, :]
        windows = frame_series(hp_series, cfg.window, hop)
        band_w = M.band_precondition_windows(hp_series, cfg, hop)
        pseudo, _f, _e, _c, _s = M.music_pseudospectrum(
            windows, cfg, band_windows=band_w)
        k_min_fb, k_max_fb = band_indices(
            cfg.window, cfg.min_period, cfg.max_period)
        spec = rfft_band_hopped(hp_series, cfg.window, hop, k_max_fb + 1)
        bp = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)[
            ..., k_min_fb : k_max_fb + 1]
        return pseudo, bp

    pseudo, bp = jax.block_until_ready(inputs(x))
    ref = None
    for wt in (16, 32, 64, 128):
        S.WT = wt

        @partial(jax.jit, static_argnames=("iters",))
        def chain(pb, iters: int):
            ps, b = pb

            def body(_, carry):
                ps, acc = carry
                sel = S.select_candidates_pallas(ps, b, cfg)
                tot = (jnp.sum(sel["freq"]) + jnp.sum(sel["vals"])
                       + jnp.sum(sel["step0"]))
                return ps * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (ps, 0.0))
            return acc

        # correctness across WT (must be bitwise-identical selections)
        got = jax.jit(lambda pb: S.select_candidates_pallas(
            pb[0], pb[1], cfg)["freq"])((pseudo, bp))
        got = np.asarray(got)
        if ref is None:
            ref = got
        else:
            assert np.array_equal(ref, got), f"WT={wt} changed selections"

        rate, spread = _chain_rate(chain, (pseudo, bp), 1.0, k=1024)
        print(json.dumps({"WT": wt, "us_per_call": round(1e6 / rate, 1),
                          "spread_pct": round(spread, 1)}), flush=True)
    S.WT = 32


if __name__ == "__main__":
    main()
