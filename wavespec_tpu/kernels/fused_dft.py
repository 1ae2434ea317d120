"""Fused band-limited DFT Pallas kernel (round-2 variant).

The hot path of `extract_cycles_batch` is the batched four-step DFT: in
the pure-XLA formulation every stage intermediate round-trips HBM. This
kernel keeps a TILE of windows and ALL DFT intermediates resident in VMEM
and writes only the band-limited spectrum back to HBM.

ROUND-1 variant (n = n1 x 128, n2 = 128 lanes): correct on device
(1.7e-7) but step 1 ran [n1, n1] @ [n1, tile*128] with M = n1 = 32 rows —
25% MXU row utilization — and measured 3.2 ms vs the XLA path's 2.6 ms at
the only VMEM-feasible tile. Parked with that analysis.

ROUND-2 variant (this file): the factorization is TRANSPOSED — n = 128 x
n2 with the SIZE-128 DFT first and the i1 axis on the lanes:

    t = i1*n2 + i2,  k = k1 + 128*k2   (i1, k1 in [0,128), i2, k2 in [0,n2))
    X[k1,k2] = sum_i2 [ sum_i1 x[i1,i2] F128[k1,i1] ] U[k1,i2] F2[i2,k2]

- step 1 is [tile*n2, 128] @ [128, 128] — FULL MXU rows and lanes, and it
  carries ~95% of the FLOPs;
- the twiddle U is an elementwise [n2, 128] broadcast over the tile;
- step 2's contraction over i2 has tiny FLOPs (n_k2 <= 8 output columns);
- every in-kernel reshape collapses onto / splits off the 128-lane minor
  (Mosaic-legal), and the output block is [n_k2, tile, 128] — no
  minor-dim padding.

Numerics: same HIGHEST-precision dots as `mxu_fft` (~1e-7 vs float64).

STATUS (measured on the axon v5e, 4096 windows x 4096 pts, max_bins=458,
benchmarks/bench_fused_dft.py): tile=64 runs the band DFT in 0.55 ms vs
1.09 ms for the XLA four-step — a 1.98x kernel win (7.45M windows/s);
tile=32 gives 1.82x; tile=128 exceeds VMEM. Compile is seconds, not the
25-minute pathology of the round-1 layout. `extract._fft_ridge` uses this
kernel when `ExtractConfig(use_pallas_dft=True)` and the backend is a
real device (CPU tests keep the XLA path; interpret mode is only for
correctness tests). Device output agrees with `rfft_mxu` at ~1e-7.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST
N1 = 128  # lane-resident DFT length (step 1)


def out_struct(shape, dtype, like: jax.Array) -> jax.ShapeDtypeStruct:
    """ShapeDtypeStruct carrying `like`'s varying-manual-axes set.

    Under `jax.shard_map(..., check_vma=True)` (the default) a
    pallas_call must declare how its outputs vary across mesh axes, or
    tracing fails with "vma must not be None" — which would crash the
    sharded ridge path (`mesh.extract_batch_sharded`) on any real mesh
    with the Pallas DFT enabled. Outputs vary exactly like the data
    input, so propagate its vma; outside shard_map this is the empty
    set and behaves like a plain ShapeDtypeStruct.
    """
    vma = getattr(jax.typeof(like), "vma", None)
    if vma is None:  # older JAX: no vma concept
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


@lru_cache(maxsize=32)
def _plan_t(n: int, n_k2: int):
    """Constant matrices for the transposed factorization n = 128 x n2."""
    if n % N1 or (n // N1) < 8:
        raise ValueError(f"fused DFT needs n = 128*n2 with n2 >= 8, got {n}")
    n2 = n // N1
    i1 = np.arange(N1)
    f1 = np.exp(-2j * np.pi * np.outer(i1, i1) / N1)       # [128, 128] (sym)
    i2 = np.arange(n2)
    u = np.exp(-2j * np.pi * np.outer(i2, i1) / n)         # [n2, 128] twiddle
    k2 = np.arange(n_k2)
    f2 = np.exp(-2j * np.pi * np.outer(k2, i2) / n2)       # [n_k2, n2]
    return (
        f1.real.astype(np.float32), f1.imag.astype(np.float32),
        u.real.astype(np.float32), u.imag.astype(np.float32),
        f2.real.astype(np.float32), f2.imag.astype(np.float32),
    )


def _kernel(xt_ref, f1r_ref, f1i_ref, ur_ref, ui_ref, f2r_ref, f2i_ref,
            out_re_ref, out_im_ref, *, n2: int, n_k2: int, tile: int):
    # xt_ref: [tile, n2, 128] with x[w, i2, i1] (i1 minor).
    x = xt_ref[:].reshape(tile * n2, N1)

    # step 1: P[w, i2, k1] = sum_i1 x[w, i2, i1] F128[k1, i1]
    # (F128 symmetric, so right-multiplication needs no transpose)
    pr = jnp.dot(x, f1r_ref[:], preferred_element_type=jnp.float32,
                 precision=HIGHEST)
    pi = jnp.dot(x, f1i_ref[:], preferred_element_type=jnp.float32,
                 precision=HIGHEST)

    # step 2: twiddle U[i2, k1], broadcast over the tile axis
    p3r = pr.reshape(tile, n2, N1)
    p3i = pi.reshape(tile, n2, N1)
    ur = ur_ref[:].reshape(1, n2, N1)
    ui = ui_ref[:].reshape(1, n2, N1)
    qr = p3r * ur - p3i * ui
    qi = p3r * ui + p3i * ur

    # step 3: X[k2, w, k1] = sum_i2 F2[k2, i2] Q[w, i2, k1]
    qtr = jnp.swapaxes(qr, 0, 1).reshape(n2, tile * N1)
    qti = jnp.swapaxes(qi, 0, 1).reshape(n2, tile * N1)
    xr = (jnp.dot(f2r_ref[:], qtr, preferred_element_type=jnp.float32, precision=HIGHEST)
          - jnp.dot(f2i_ref[:], qti, preferred_element_type=jnp.float32, precision=HIGHEST))
    xi = (jnp.dot(f2r_ref[:], qti, preferred_element_type=jnp.float32, precision=HIGHEST)
          + jnp.dot(f2i_ref[:], qtr, preferred_element_type=jnp.float32, precision=HIGHEST))

    out_re_ref[:] = xr.reshape(n_k2, tile, N1)
    out_im_ref[:] = xi.reshape(n_k2, tile, N1)


@partial(jax.jit, static_argnames=("max_bins", "tile", "interpret"))
def rfft_band_fused(
    windows: jax.Array,
    max_bins: int,
    tile: int = 64,
    interpret: bool = False,
):
    """Band-limited rFFT of pre-framed windows ``[B, n]`` via one fused
    Pallas kernel. Returns complex bins ``[B, ceil(max_bins/128)*128]`` in
    NATURAL bin order (bin k = k1 + 128*k2).

    B must be a multiple of `tile`; n a power of two >= 1024.
    """
    b, n = windows.shape
    if b % tile:
        raise ValueError(f"batch {b} not divisible by tile {tile}")
    n2 = n // N1
    n_k2 = min((max_bins + N1 - 1) // N1, n2 // 2)
    f1r, f1i, ur, ui, f2r, f2i = _plan_t(n, n_k2)

    # x[w, t] with t = i1*n2 + i2  ->  [w, i2, i1] (i1 minor): one XLA
    # transpose at HBM bandwidth outside the kernel.
    xt = jnp.swapaxes(
        windows.astype(jnp.float32).reshape(b, N1, n2), -1, -2
    )  # [B, n2, 128]

    grid = (b // tile,)
    in_spec = pl.BlockSpec((tile, n2, N1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    const2 = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_k2, tile, N1), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    kernel = partial(_kernel, n2=n2, n_k2=n_k2, tile=tile)
    out_shape = [
        out_struct((n_k2, b, N1), jnp.float32, xt),
        out_struct((n_k2, b, N1), jnp.float32, xt),
    ]
    # Under shard_map the window input varies over mesh axes while the DFT
    # constants don't; promote the constants to the same varying set
    # (a data no-op) so the kernel's dot_generals see matching
    # vma — without this the sharded ridge path fails vma checking (see rfft_band_fused_any for the interpret-mode caveat).
    from wavespec_tpu.utils.vma import pvary_like

    consts = pvary_like([jnp.asarray(c) for c in (f1r, f1i, ur, ui, f2r, f2i)],
                        xt)
    re, im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec, const2(N1, N1), const2(N1, N1),
                  const2(n2, N1), const2(n2, N1),
                  const2(n_k2, n2), const2(n_k2, n2)],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(xt, *consts)

    # [k2, B, k1] -> [B, k2, k1] -> [B, k2*128 + k1] = natural bin order
    re_b = jnp.transpose(re, (1, 0, 2)).reshape(b, n_k2 * N1)
    im_b = jnp.transpose(im, (1, 0, 2)).reshape(b, n_k2 * N1)
    return jax.lax.complex(re_b, im_b)


def rfft_band_fused_any(
    windows: jax.Array,
    max_bins: int,
    tile: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """`rfft_band_fused` for arbitrary leading dims / batch sizes.

    Flattens leading dims, zero-pads the batch to a tile multiple (padded
    rows are discarded), and trims the bin axis to `max_bins` so the
    result is a drop-in for `rfft_mxu(x, max_bins=max_bins)[..., :max_bins]`.
    """
    n = windows.shape[-1]
    # Like rfft_mxu, a real window has only n/2 distinct bins — clamp so
    # max_bins past Nyquist returns n/2 columns instead of crashing the
    # reshape below.
    max_bins = min(max_bins, n // 2)
    # The fused kernel is for NARROW bands (the production extractor's
    # k_max+3 at flagship configs gives n_k2 <= 4 k2-planes). Wide-band
    # requests blow past the kernel's lowered/VMEM envelope — measured on
    # the v5e: n_k2=16 (max_bins near n/2 at n=4096) fails to lower
    # (Mosaic UNIMPLEMENTED) — so anything wider routes to the XLA
    # four-step, which is within 2x of the kernel anyway and handles
    # every shape.
    n_k2 = -(-max_bins // N1)
    # Interpret mode inside shard_map: the Pallas HLO interpreter's grid
    # loop cannot carry varying-manual-axes outputs (its init carry is
    # built unvarying — JAX 0.9 limitation), so that test-only combination
    # routes to the XLA path. The REAL lowering takes the declared output
    # vma (out_struct) and runs sharded fine (verified on-chip via
    # benchmarks/bench_config5.py).
    under_shard_map = bool(getattr(jax.typeof(windows), "vma", None))
    if n_k2 > 4 or (interpret and under_shard_map):
        from wavespec_tpu.kernels.mxu_fft import rfft_mxu

        return rfft_mxu(windows, max_bins=max_bins)[..., :max_bins]
    lead = windows.shape[:-1]
    x = windows.reshape(-1, n)
    b = x.shape[0]
    b_pad = -(-b // tile) * tile
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    spec = rfft_band_fused(x, max_bins=max_bins, tile=tile,
                           interpret=interpret)
    return spec[:b, :max_bins].reshape(*lead, max_bins)
