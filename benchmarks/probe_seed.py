"""Split the MUSIC `prerank` profile stage into its two device blocks.

`profile_music.py`'s prerank delta bundles (a) the hopped seed band DFT
(`kernels.hopped_dft.rfft_band_hopped` at bins up to floor(n/min_period),
which grows ~16x from window 4096 to 16384) and (b) the Pallas
peaks->ridge->prerank select launch. This probe times each alone with the
same spread-gated chain harness so the 16384 optimization (VERDICT r4
item 5) lands on the right block.

Usage: probe_seed.py [window] [hop] [nwin]
"""

import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _chain_rate
    from wavespec_tpu.analyze import music as M
    from wavespec_tpu.extract import ExtractConfig, Method
    from wavespec_tpu.kernels.hopped_dft import rfft_band_hopped
    from wavespec_tpu.kernels.music_select_pallas import (
        select_candidates_pallas,
    )
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu
    from wavespec_tpu.ops.spectrum import band_indices

    window = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    hop = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nwin = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    slen = window + (nwin - 1) * hop
    t = np.arange(slen)
    x = jax.device_put(jnp.asarray(
        np.cumsum(0.02 * np.random.default_rng(0).standard_normal(slen))
        + 3 * np.sin(2 * np.pi * t / 50) + 2 * np.sin(2 * np.pi * t / 120),
        jnp.float32))
    cfg = ExtractConfig(window=window, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)
    k_min_fb, k_max_fb = band_indices(window, cfg.min_period, cfg.max_period)

    def hp(s):
        s0 = s - s[..., :1]
        return ehlers_highpass_detrend_mxu(
            s0, (M.music_hp_period(cfg),))[..., 0, :]

    # --- (a) hopped seed DFT alone -------------------------------------
    @partial(jax.jit, static_argnames=("iters",))
    def chain_seed(s, iters: int):
        def body(_, carry):
            s, acc = carry
            spec = rfft_band_hopped(hp(s), window, hop, k_max_fb + 1)
            tot = jnp.sum(jnp.real(spec)) + jnp.sum(jnp.imag(spec))
            return s * (1.0 + 0.0 * tot), acc + tot
        _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
        return acc

    rate, spread = _chain_rate(chain_seed, x, float(nwin), k=96)
    print(f"seed DFT : {nwin/rate*1e3:7.3f} ms (spread {spread:4.1f}%)",
          flush=True)

    # --- (b) select launch alone (pseudo + band_power precomputed) -----
    hp_series = hp(x)
    band_w = M.band_precondition_windows(hp_series, cfg, hop)
    from wavespec_tpu.extract import frame_series
    windows = frame_series(hp_series, window, hop)
    pseudo, _, _, _, _ = M.music_pseudospectrum(
        windows, cfg, band_windows=band_w)
    spec = rfft_band_hopped(hp_series, window, hop, k_max_fb + 1)
    band_power = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)[
        ..., k_min_fb:k_max_fb + 1]
    pseudo, band_power = jax.block_until_ready((pseudo, band_power))

    @partial(jax.jit, static_argnames=("iters",))
    def chain_sel(args, iters: int):
        ps, bp = args
        def body(_, carry):
            ps, acc = carry
            sel = select_candidates_pallas(ps, bp, cfg)
            tot = (jnp.sum(sel["freq"]) + jnp.sum(sel["vals"])
                   + jnp.sum(sel["step0"]))
            return ps * (1.0 + 0.0 * tot), acc + tot
        _, acc = jax.lax.fori_loop(0, iters, body, (ps, 0.0))
        return acc

    rate, spread = _chain_rate(chain_sel, (pseudo, band_power), float(nwin),
                               k=256)
    print(f"select   : {nwin/rate*1e3:7.3f} ms (spread {spread:4.1f}%)",
          flush=True)


if __name__ == "__main__":
    main()
