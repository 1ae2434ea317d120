"""Fused Pallas band-DFT vs the XLA four-step path on the real chip."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.kernels.fused_dft import rfft_band_fused
    from wavespec_tpu.kernels.mxu_fft import rfft_mxu

    b, n, bins = 4096, 4096, 458
    x = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((b, n)).astype(np.float32)))

    def timed(fn, label):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int):
            def body(_, carry):
                s, acc = carry
                spec = fn(s)
                tot = jnp.sum(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc

        t0 = time.perf_counter()
        float(np.asarray(chain(x, 1)))
        compile_s = time.perf_counter() - t0
        float(np.asarray(chain(x, 6)))
        t0 = time.perf_counter(); float(np.asarray(chain(x, 1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(chain(x, 6)))
        t6 = time.perf_counter() - t0
        per = (t6 - t1) / 5
        print(f"{label}: {per*1e3:.2f} ms/batch ({b/per/1e6:.2f}M win/s), "
              f"compile {compile_s:.0f}s", flush=True)
        return per

    t_xla = timed(lambda s: rfft_mxu(s, max_bins=bins), "xla four-step")
    for tile in (64, 128, 32):
        try:
            t_p = timed(
                lambda s, tile=tile: rfft_band_fused(s, max_bins=bins, tile=tile),
                f"pallas fused tile={tile}",
            )
            print(f"  speedup vs xla: {t_xla / t_p:.2f}x", flush=True)
        except Exception as e:
            print(f"pallas tile={tile} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # numeric agreement on device (complex64 cannot transfer to the host
    # on this runtime — compare via a device-side |diff| reduction)
    @jax.jit
    def relerr(s):
        got = rfft_band_fused(s, max_bins=bins, tile=64)[:, :bins]
        want = rfft_mxu(s, max_bins=bins)[:, :bins]
        return jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want))

    print("device rel err vs mxu path:",
          float(np.asarray(relerr(x[:64]))), flush=True)


if __name__ == "__main__":
    main()
