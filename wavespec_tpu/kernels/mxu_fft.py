"""MXU-native real FFT: four-step (Bailey/Cooley-Tukey) DFT as matmuls.

TPU-native replacement for the bridge's `gpu_fft_real_forward` /
`gpu_fft_real_inverse` / `gpu_fft_real_forward_batch`
(`Include/imports.mqh:8`, `Legacy/WaveSpecZZ_gpu_cycles.mq5:14`).

Why not a radix-2 butterfly kernel (the reference's CPU fallback shape,
`Legacy/WaveSpecZZ_1.0.2.mq5:938-974`)? Butterflies are a scalar/VPU
workload with log2(N) sequential stages and strided access — a poor fit
for the TPU. The systolic MXU wants large dense matmuls. The classic
four-step decomposition N = N1*N2 turns one N-point DFT into

    1. reshape x to A[n1, n2]          (row-major, free)
    2. B = F_{N1} @ A                  (DFT down columns; real matmul x2)
    3. C = B * W_N^{n2*k1}             (twiddle, elementwise)
    4. X_mat = C @ F_{N2}              (DFT along rows; real matmul x4)
    5. X[N1*k2 + k1] = X_mat[k1, k2]   (transpose + flatten)

For the *real* forward transform we only need bins 0..N/2-1 (the bridge
contract emits exactly N/2 bins), i.e. only k2 < N2/2 — so step 4 uses the
half-width matrix F_{N2}[:, :N2/2], halving its FLOPs. Everything batches
over windows as one 3D dot_general, exactly what XLA tiles onto the MXU.

Cost: O(N*(N1+N2)) MACs/window vs O(N log N) for a true FFT — ~8x more
FLOPs at N=4096 — but they run at MXU rates on data already resident in
VMEM, and the batched formulation amortizes all launch overhead. The
streaming bound (16 KiB/window over HBM) dominates (see BASELINE.md).

Precision: f32 inputs with `precision=HIGHEST` (bf16x6 passes on the MXU)
give ~1e-6 relative error at N=4096, meeting the parity gate. A `fast`
mode (bf16x1) is available for throughput scans.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rfft_mxu", "irfft_mxu", "dft_factors"]


def dft_factors(n: int) -> tuple[int, int]:
    """Split N (power of two, >=16) into N1*N2 with N1 <= N2, both powers of 2."""
    if n < 16 or (n & (n - 1)) != 0:
        raise ValueError(f"window length must be a power of two >= 16, got {n}")
    log = n.bit_length() - 1
    n1 = 1 << (log // 2)
    return n1, n // n1


@lru_cache(maxsize=64)
def _plan(n: int, n_k2: int | None = None):
    """Precompute (host, float64) the DFT/twiddle factor matrices for N.

    n_k2 limits the row-DFT to the first n_k2 columns (output bins
    < n1*n_k2); None = full half spectrum (n2//2 columns).
    """
    n1, n2 = dft_factors(n)
    if n_k2 is None:
        n_k2 = n2 // 2
    i1 = np.arange(n1)
    # F1[n1_in, k1] = exp(-2i pi n1_in k1 / N1); symmetric.
    f1 = np.exp(-2j * np.pi * np.outer(i1, i1) / n1)
    # Row DFT: F2[n2_in, k2], k2 < n_k2 covers bins < n1*n_k2.
    i2 = np.arange(n2)
    k2 = np.arange(n_k2)
    f2h = np.exp(-2j * np.pi * np.outer(i2, k2) / n2)
    # Twiddle T[k1, n2_in] = exp(-2i pi k1 n2_in / N).
    tw = np.exp(-2j * np.pi * np.outer(i1, i2) / n)
    return (
        (f1.real.astype(np.float32), f1.imag.astype(np.float32)),
        (f2h.real.astype(np.float32), f2h.imag.astype(np.float32)),
        (tw.real.astype(np.float32), tw.imag.astype(np.float32)),
    )


def _matmul(a, b, precision):
    return jnp.matmul(a, b, precision=precision)


@partial(jax.jit, static_argnames=("precision", "max_bins"))
def rfft_mxu(
    x: jax.Array, precision: str = "highest", max_bins: int | None = None
) -> jax.Array:
    """Forward real DFT -> first n//2 complex bins, batched over leading dims.

    Drop-in for `wavespec_tpu.ops.rfft_bins` on backends without an FFT
    lowering (and faster for large window batches on TPU).

    `max_bins` computes only a low-frequency prefix: the output has
    ``ceil(max_bins/n1)*n1`` bins (>= max_bins). Band-limited consumers
    (the in-band extractor needs ~200 of 2048 bins) skip most of the
    row-DFT FLOPs and all downstream traffic on unused bins.
    """
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    n = x.shape[-1]
    n1, n2 = dft_factors(n)
    n_k2 = None
    if max_bins is not None:
        n_k2 = min((max_bins + n1 - 1) // n1, n2 // 2)
    (f1r, f1i), (f2r, f2i), (twr, twi) = _plan(n, n_k2)
    f1r, f1i, f2r, f2i, twr, twi = (
        jnp.asarray(a) for a in (f1r, f1i, f2r, f2i, twr, twi)
    )
    batch = x.shape[:-1]
    a = x.reshape(-1, n1, n2).astype(jnp.float32)

    # Step 1: column DFT, real input. B[k1, n2] = sum_n1 F1[k1,n1] A[n1,n2].
    br = jnp.einsum("kn,bnm->bkm", f1r, a, precision=prec)
    bi = jnp.einsum("kn,bnm->bkm", f1i, a, precision=prec)

    # Step 2: twiddle (elementwise complex multiply, fused by XLA).
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr

    # Step 3: row DFT with half-width F2 (only bins < n/2 needed).
    xr = _matmul(cr, f2r, prec) - _matmul(ci, f2i, prec)
    xi = _matmul(cr, f2i, prec) + _matmul(ci, f2r, prec)

    # Step 4: X[N1*k2 + k1] = X_mat[k1, k2] -> transpose then flatten.
    out_bins = n1 * (n_k2 if n_k2 is not None else n2 // 2)
    xr = jnp.swapaxes(xr, -1, -2).reshape(*batch, out_bins)
    xi = jnp.swapaxes(xi, -1, -2).reshape(*batch, out_bins)
    return jax.lax.complex(xr, xi)


@lru_cache(maxsize=32)
def _iplan(n: int):
    """Inverse four-step factor matrices (O(n1^2 + n2^2) memory).

    With m = N2*m1 + m2 and k = N1*k2 + k1:
      x[m] = (1/N) sum_k Y[k] W_N^{+mk}
           = (1/N) sum_{k1} F1c[m1,k1] * T[k1,m2] * sum_{k2} Y[N1 k2+k1] F2c[k2,m2]
    where F1c/F2c/Tc are the CONJUGATE DFT/twiddle factors. Y is the
    Hermitian extension of the n/2 input bins (Nyquist = 0), so the
    synthesis stays O(n) memory at any window size — a dense [n/2, n]
    matrix would be 2 GB at n = 32768 and 137 GB at the reference's
    anticipated 262144 maximum.
    """
    n1, n2 = dft_factors(n)
    i1 = np.arange(n1)
    f1c = np.exp(+2j * np.pi * np.outer(i1, i1) / n1)          # [m1, k1]
    i2 = np.arange(n2)
    f2c = np.exp(+2j * np.pi * np.outer(i2, i2) / n2)          # [k2, m2]
    tw = np.exp(+2j * np.pi * np.outer(i1, i2) / n)            # [k1, m2]
    return (
        (f1c.real.astype(np.float32), f1c.imag.astype(np.float32)),
        (f2c.real.astype(np.float32), f2c.imag.astype(np.float32)),
        (tw.real.astype(np.float32), tw.imag.astype(np.float32)),
    )


@partial(jax.jit, static_argnames=("n", "precision"))
def irfft_mxu(spec: jax.Array, n: int, precision: str = "highest") -> jax.Array:
    """Inverse of `rfft_mxu`: n//2 complex bins -> n real samples.

    Four-step inverse DFT on the Hermitian-extended spectrum (Nyquist bin
    treated as 0 per the bridge's n/2-bin contract), all matmul-shaped for
    the MXU and O(n) memory at any window size.
    """
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    n1, n2 = dft_factors(n)
    (f1r, f1i), (f2r, f2i), (twr, twi) = _iplan(n)
    f1r, f1i, f2r, f2i, twr, twi = (
        jnp.asarray(a) for a in (f1r, f1i, f2r, f2i, twr, twi)
    )
    batch = spec.shape[:-1]
    half = n // 2
    re = jnp.real(spec).astype(jnp.float32).reshape(-1, half)
    im = jnp.imag(spec).astype(jnp.float32).reshape(-1, half)

    # Hermitian extension: Y[0]=X[0], Y[k]=X[k] (k<n/2), Y[n/2]=0,
    # Y[n-k]=conj(X[k]).
    zero = jnp.zeros((re.shape[0], 1), jnp.float32)
    yr = jnp.concatenate([re, zero, re[:, 1:][:, ::-1]], axis=-1)   # [b, n]
    yi = jnp.concatenate([im, zero, -im[:, 1:][:, ::-1]], axis=-1)

    # view Y as [n2(k2), n1(k1)] then transpose -> A'[k1, k2]
    ar = jnp.swapaxes(yr.reshape(-1, n2, n1), -1, -2)
    ai = jnp.swapaxes(yi.reshape(-1, n2, n1), -1, -2)

    # inner DFT over k2: B'[k1, m2] = A'[k1, :] @ F2c
    br = _matmul(ar, f2r, prec) - _matmul(ai, f2i, prec)
    bi = _matmul(ar, f2i, prec) + _matmul(ai, f2r, prec)

    # twiddle W^{+k1 m2}
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr

    # outer DFT over k1: x_mat[m1, m2] = F1c[m1, :] @ C'[:, m2]; x real
    xr = (jnp.einsum("mk,bkn->bmn", f1r, cr, precision=prec)
          - jnp.einsum("mk,bkn->bmn", f1i, ci, precision=prec))
    return (xr.reshape(*batch, n1 * n2) / n).astype(jnp.float32)
