"""Regenerate the golden extraction fixture (run deliberately, on CPU)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles_batch
from wavespec_tpu.reconstruct import ReconstructConfig, decode_causal


def main() -> None:
    rng = np.random.default_rng(20260816)
    t = np.arange(1600)
    series = (
        np.cumsum(0.02 * rng.standard_normal(1600))
        + 2.5 * np.sin(2 * np.pi * t / 48 + 0.4)
        + 1.2 * np.sin(2 * np.pi * t / 130 + 1.1)
    ).astype(np.float32)

    cfg_fft = ExtractConfig(window=1024, top_k=4, min_period=10.0,
                            max_period=200.0, method=Method.FFT_RIDGE)
    cfg_mus = ExtractConfig(window=1024, top_k=2, min_period=10.0,
                            max_period=200.0, method=Method.MUSIC, ar_order=10)
    attrs_fft = np.asarray(extract_cycles_batch(jnp.asarray(series), cfg_fft, hop=64))
    attrs_mus = np.asarray(extract_cycles_batch(jnp.asarray(series), cfg_mus, hop=64))
    dec = decode_causal(jnp.asarray(attrs_mus), ReconstructConfig())
    out = Path(__file__).parent / "fixtures" / "golden_extract.npz"
    np.savez_compressed(
        out, series=series, attrs_fft=attrs_fft, attrs_mus=attrs_mus,
        wave=np.asarray(dec["wave"]), period=np.asarray(dec["period"]),
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
