"""Fused band-limited DFT Pallas kernel.

The hot path of `extract_cycles_batch` is the batched four-step DFT: in
the pure-XLA formulation every stage intermediate (step-1 outputs, twiddle
products) round-trips HBM (~500 MB per 4096-window batch), which measured
~2.5 ms of the 3 ms total. This kernel keeps a TILE of windows and ALL
DFT intermediates resident in VMEM and writes only the band-limited
spectrum back to HBM.

Mosaic layout constraints shape the design:
- factorization n = n1 x 128 (n2 = 128 lanes) so every in-kernel reshape
  either collapses onto or splits off a 128-wide minor dim (arbitrary
  minor splits are "unsupported shape cast");
- the (window, n1) transpose happens OUTSIDE the kernel (XLA transposes at
  HBM bandwidth): input arrives as [n1, B, 128];
- the twiddle stays [n1, 128] and broadcasts over the tile axis via a
  minor-preserving reshape;
- the kernel emits X in its natural [n1*TILE, n_k2] matmul layout; XLA
  reorders to [B, bins] afterwards (tiny).

Numerics: same factor-matrix construction as `mxu_fft`, dots at HIGHEST
precision -> ~1e-7 relative error vs float64 FFT.

STATUS (measured on the axon v5e): correct on device (1.7e-7), but at the
only VMEM-feasible tile (32) it runs 3.2 ms per 4096-window batch vs the
XLA formulation's 2.6 ms; larger tiles exceed scoped VMEM because HIGHEST
matmuls keep bf16 operand copies. The XLA path (`mxu_fft.rfft_mxu` with
`max_bins`) remains the production route; this kernel is kept as the
VMEM-resident starting point for further fusion work.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST
N2 = 128


@lru_cache(maxsize=32)
def _plan128(n: int, n_k2: int):
    """Factor matrices for n = n1 x 128 with pre-tiled twiddles."""
    if n % N2 or (n // N2) < 8:
        raise ValueError(f"fused DFT needs n = n1*128 with n1 >= 8, got {n}")
    n1 = n // N2
    i1 = np.arange(n1)
    f1 = np.exp(-2j * np.pi * np.outer(i1, i1) / n1)          # [n1, n1]
    i2 = np.arange(N2)
    k2 = np.arange(n_k2)
    f2 = np.exp(-2j * np.pi * np.outer(i2, k2) / N2)          # [128, n_k2]
    tw = np.exp(-2j * np.pi * np.outer(i1, i2) / n)           # [n1, 128]
    return (
        f1.real.astype(np.float32), f1.imag.astype(np.float32),
        f2.real.astype(np.float32), f2.imag.astype(np.float32),
        tw.real.astype(np.float32), tw.imag.astype(np.float32),
    )


def _kernel(at_ref, f1r_ref, f1i_ref, f2r_ref, f2i_ref, twr_ref, twi_ref,
            out_re_ref, out_im_ref, *, n1: int, n_k2: int, tile: int):
    # at_ref: [n1, tile, 128] (pre-transposed); collapse to [n1, tile*128]
    a_t = at_ref[:].reshape(n1, tile * N2)

    br = jnp.dot(f1r_ref[:], a_t, preferred_element_type=jnp.float32,
                 precision=HIGHEST)
    bi = jnp.dot(f1i_ref[:], a_t, preferred_element_type=jnp.float32,
                 precision=HIGHEST)

    # twiddle T[k1, b] broadcast over the tile axis (keeps the constant at
    # [n1, 128] instead of a [n1, tile*128] pre-tiled copy)
    twr = twr_ref[:].reshape(n1, 1, N2)
    twi = twi_ref[:].reshape(n1, 1, N2)
    br3 = br.reshape(n1, tile, N2)
    bi3 = bi.reshape(n1, tile, N2)
    cr = (br3 * twr - bi3 * twi).reshape(n1, tile * N2)
    ci = (br3 * twi + bi3 * twr).reshape(n1, tile * N2)

    # contract over b=128: [(k1, w), 128] @ [128, n_k2]
    cr2 = cr.reshape(n1 * tile, N2)
    ci2 = ci.reshape(n1 * tile, N2)
    xr = (jnp.dot(cr2, f2r_ref[:], preferred_element_type=jnp.float32, precision=HIGHEST)
          - jnp.dot(ci2, f2i_ref[:], preferred_element_type=jnp.float32, precision=HIGHEST))
    xi = (jnp.dot(cr2, f2i_ref[:], preferred_element_type=jnp.float32, precision=HIGHEST)
          + jnp.dot(ci2, f2r_ref[:], preferred_element_type=jnp.float32, precision=HIGHEST))

    out_re_ref[:] = xr.reshape(n1, tile, n_k2)
    out_im_ref[:] = xi.reshape(n1, tile, n_k2)


@partial(jax.jit, static_argnames=("max_bins", "tile", "interpret"))
def rfft_band_fused(
    windows: jax.Array,
    max_bins: int,
    tile: int = 128,
    interpret: bool = False,
):
    """Band-limited rFFT of pre-framed windows ``[B, n]`` via one fused
    Pallas kernel. Returns complex bins ``[B, ceil(max_bins/n1)*n1]``
    where bin k = n1*k2 + k1 (same layout as `rfft_mxu(max_bins=...)`).

    B must be a multiple of `tile`; n a power of two >= 1024.
    """
    b, n = windows.shape
    if b % tile:
        raise ValueError(f"batch {b} not divisible by tile {tile}")
    n1 = n // N2
    n_k2 = min((max_bins + n1 - 1) // n1, N2 // 2)
    f1r, f1i, f2r, f2i, twr, twi = _plan128(n, n_k2)
    out_bins = n1 * n_k2

    # pre-transpose in XLA: [B, n] -> [B, n1, 128] -> [n1, B, 128]
    at = jnp.swapaxes(windows.astype(jnp.float32).reshape(b, n1, N2), 0, 1)

    grid = (b // tile,)
    in_spec = pl.BlockSpec((n1, tile, N2), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    const2 = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n1, tile, n_k2), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    kernel = partial(_kernel, n1=n1, n_k2=n_k2, tile=tile)
    out_shape = [
        jax.ShapeDtypeStruct((n1, b, n_k2), jnp.float32),
        jax.ShapeDtypeStruct((n1, b, n_k2), jnp.float32),
    ]
    re, im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec, const2(n1, n1), const2(n1, n1),
                  const2(N2, n_k2), const2(N2, n_k2),
                  const2(n1, N2), const2(n1, N2)],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(at, jnp.asarray(f1r), jnp.asarray(f1i), jnp.asarray(f2r),
      jnp.asarray(f2i), jnp.asarray(twr), jnp.asarray(twi))

    # [n1(k1), B, n_k2(k2)] -> [B, k2, k1] -> [B, n1*k2 + k1]
    re_b = jnp.transpose(re, (1, 2, 0)).reshape(b, out_bins)
    im_b = jnp.transpose(im, (1, 2, 0)).reshape(b, out_bins)
    return jax.lax.complex(re_b, im_b)
