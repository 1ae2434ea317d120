"""Batched symmetric eigendecomposition via cyclic Jacobi rotations.

The MUSIC path (`gpu_extract_cycles` method=1) needs eigh of small
(ar_order x ar_order, default 10x10) symmetric covariance matrices, batched
over thousands of STFT windows. We implement cyclic Jacobi in pure JAX:

- every rotation is a batched [B, m, m] matmul pair -> MXU-friendly;
- no dependence on an LAPACK-style `eigh` lowering (not all TPU runtimes
  ship one — the axon backend notably lacks several linalg lowerings);
- deterministic fixed sweep count -> static control flow under jit.

For m <= 32 and ~8 sweeps this converges to ~1e-7 off-diagonal mass,
plenty for subspace splitting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(a: jax.Array, sweeps: int = 8):
    """Eigendecomposition of symmetric ``a`` ``[..., m, m]``.

    Returns (eigenvalues ascending ``[..., m]``, eigenvectors ``[..., m, m]``
    with column j the eigenvector of eigenvalue j), matching
    `numpy.linalg.eigh` conventions.
    """
    m = a.shape[-1]
    batch = a.shape[:-2]
    a = a.reshape(-1, m, m).astype(jnp.float32)
    b = a.shape[0]

    pairs = jnp.array(
        [(p, q) for p in range(m - 1) for q in range(p + 1, m)], dtype=jnp.int32
    )
    n_pairs = pairs.shape[0]
    eye = jnp.eye(m, dtype=jnp.float32)

    def rotate(i, state):
        mat, vecs = state
        p = pairs[i, 0]
        q = pairs[i, 1]
        ep = jax.nn.one_hot(p, m, dtype=jnp.float32)
        eq = jax.nn.one_hot(q, m, dtype=jnp.float32)
        app = jnp.einsum("bij,i,j->b", mat, ep, ep)
        aqq = jnp.einsum("bij,i,j->b", mat, eq, eq)
        apq = jnp.einsum("bij,i,j->b", mat, ep, eq)
        theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
        c = jnp.cos(theta)[:, None, None]
        s = jnp.sin(theta)[:, None, None]
        pp = jnp.outer(ep, ep) + jnp.outer(eq, eq)
        pq = jnp.outer(ep, eq) - jnp.outer(eq, ep)
        rot = eye + (c - 1.0) * pp + s * pq  # [b, m, m]
        mat = jnp.einsum("bji,bjk,bkl->bil", rot, mat, rot, precision=jax.lax.Precision.HIGHEST)
        vecs = jnp.einsum("bij,bjk->bik", vecs, rot, precision=jax.lax.Precision.HIGHEST)
        return mat, vecs

    # Derive the identity init from `a` (zeros_like keeps `a`'s varying
    # manual axes, so the fori_loop carry types match under shard_map).
    vecs0 = jnp.zeros_like(a) + eye
    mat, vecs = jax.lax.fori_loop(
        0, sweeps * n_pairs, lambda i, s: rotate(i % n_pairs, s), (a, vecs0)
    )

    eigvals = jnp.diagonal(mat, axis1=-2, axis2=-1)
    order = jnp.argsort(eigvals, axis=-1)
    eigvals = jnp.take_along_axis(eigvals, order, axis=-1)
    vecs = jnp.take_along_axis(vecs, order[:, None, :], axis=-1)
    return eigvals.reshape(*batch, m), vecs.reshape(*batch, m, m)
