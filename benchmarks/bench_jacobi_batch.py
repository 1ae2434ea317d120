"""Pallas vs XLA Jacobi eigh across batch sizes on the real chip.

Decides the routing threshold in `analyze.jacobi.jacobi_eigh` (currently
Pallas for device batches <= 64). The flagship MUSIC bench runs B =
n_windows * n_bands = 1536 [10, 10] matrices per call; if the one-launch
Pallas kernel (grid over 128-lane tiles) also wins there, the threshold
should go up.

Timing: jitted dependent chain + one scalar readback (see bench.py).
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

    from wavespec_tpu.analyze.jacobi import jacobi_eigh_xla
    from wavespec_tpu.kernels.jacobi_pallas import jacobi_eigh_pallas

    m = 10
    rng = np.random.default_rng(0)

    def chain_fn(eigh):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(a, iters: int):
            def body(_, carry):
                a, acc = carry
                ev, _ = eigh(a)
                tot = jnp.sum(ev)
                return a * (1.0 + 0.0 * tot), acc + tot

            _, acc = jax.lax.fori_loop(0, iters, body, (a, 0.0))
            return acc

        return chain

    def timed(chain, a, iters):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(chain(a, iters)))
            best = min(best, time.perf_counter() - t0)
        return best

    for b in (3, 128, 384, 1536, 6144):
        a = rng.standard_normal((b, m, m)).astype(np.float32)
        a = a @ a.transpose(0, 2, 1)
        a = jax.device_put(jnp.asarray(a))

        rows = {}
        for name, eigh in (("pallas", jacobi_eigh_pallas), ("xla", jacobi_eigh_xla)):
            chain = chain_fn(eigh)
            k = 16
            float(np.asarray(chain(a, 1)))
            float(np.asarray(chain(a, 1 + k)))
            t1 = timed(chain, a, 1)
            t1k = timed(chain, a, 1 + k)
            rows[name] = max((t1k - t1) / k, 1e-9)
        print(f"B={b:5d}  pallas {rows['pallas']*1e6:9.1f} us   "
              f"xla {rows['xla']*1e6:9.1f} us   "
              f"pallas/xla {rows['pallas']/rows['xla']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
