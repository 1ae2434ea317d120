"""Eigenvalues of SMALL (p <= 16) dense nonsymmetric matrices in pure JAX.

No TPU runtime we target lowers LAPACK-style `eig` (the axon backend lacks
most linalg lowerings), and ESPRIT's rotation matrix Psi is p x p with
p = 2*top_k <= 16 — far below any size where Schur iteration pays off. So:

1. characteristic polynomial coefficients via the Faddeev-LeVerrier
   recurrence (p batched matmuls + traces — MXU/VPU friendly, no pivoting);
2. all p complex roots simultaneously via Durand-Kerner iteration
   (fixed ~64 sweeps, vectorized over roots AND batch).

Monomial-basis rootfinding is well-conditioned here: ESPRIT eigenvalues
sit near the unit circle, well separated, and degree <= 16 keeps the
coefficients O(1). Verified against numpy.linalg.eigvals in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["charpoly", "eigvals_small"]


def charpoly(a: jax.Array) -> jax.Array:
    """Characteristic polynomial coefficients of ``a`` ``[..., p, p]``.

    Returns ``[..., p+1]`` coefficients c with
    det(xI - A) = c[0] x^p + c[1] x^(p-1) + ... + c[p], c[0] = 1
    (Faddeev-LeVerrier: c_k = -tr(A M_{k-1})/k, M_k = A M_{k-1} + c_k I).
    """
    p = a.shape[-1]
    a = a.astype(jnp.float32)
    eye = jnp.eye(p, dtype=a.dtype)
    m = jnp.broadcast_to(eye, a.shape)
    coeffs = [jnp.ones(a.shape[:-2], a.dtype)]
    hp = jax.lax.Precision.HIGHEST
    for k in range(1, p + 1):
        am = jnp.einsum("...ij,...jk->...ik", a, m, precision=hp)
        ck = -jnp.trace(am, axis1=-2, axis2=-1) / k
        coeffs.append(ck)
        m = am + ck[..., None, None] * eye
    return jnp.stack(coeffs, axis=-1)


@partial(jax.jit, static_argnames=("iters",))
def eigvals_small(a: jax.Array, iters: int = 64) -> jax.Array:
    """All eigenvalues of ``a`` ``[..., p, p]`` as complex ``[..., p]``.

    Durand-Kerner on the characteristic polynomial: every root is iterated
    simultaneously, z_i <- z_i - P(z_i) / prod_{j != i}(z_i - z_j), from
    distinct points on a circle sized by the coefficient bound. Unordered.
    """
    p = a.shape[-1]
    a = a.astype(jnp.float32)
    # Pre-scale to ~unit spectral radius: monomial coefficients of an
    # unscaled matrix grow like r^p and swamp float32 for p >= 12. Use the
    # sqrt(||A||_1 ||A||_inf) spectral-radius bound, then scale roots back.
    norm1 = jnp.max(jnp.sum(jnp.abs(a), axis=-2), axis=-1)
    norminf = jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)
    scale = jnp.maximum(jnp.sqrt(norm1 * norminf), 1e-30)  # [...]
    a = a / scale[..., None, None]
    c = charpoly(a).astype(jnp.complex64)  # [..., p+1], c[0] = 1

    # Cauchy-style radius: 1 + max |c_k| bounds all roots.
    radius = 1.0 + jnp.max(jnp.abs(c[..., 1:]), axis=-1)  # [...]
    k = jnp.arange(p, dtype=jnp.float32)
    # distinct, non-real-axis-symmetric start angles (the classic 0.4+0.9i
    # rotation avoids stalling on real-coefficient symmetry)
    ang = 2.0 * jnp.pi * k / p + 0.4
    z0 = radius[..., None] * jnp.exp(1j * ang).astype(jnp.complex64)

    def horner(z):  # P(z) for all roots at once: [..., p]
        acc = jnp.broadcast_to(c[..., 0:1], z.shape)
        for i in range(1, p + 1):
            acc = acc * z + c[..., i : i + 1]
        return acc

    eye = jnp.eye(p, dtype=bool)

    def body(_, z):
        pz = horner(z)
        diff = z[..., :, None] - z[..., None, :]          # [..., p, p]
        diff = jnp.where(eye, 1.0 + 0.0j, diff)
        denom = jnp.prod(diff, axis=-1)                    # [..., p]
        denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30 + 0.0j, denom)
        return z - pz / denom

    z = jax.lax.fori_loop(0, iters, body, z0)
    return z * scale[..., None].astype(jnp.complex64)
