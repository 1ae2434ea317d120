"""Single-launch Pallas Jacobi eigh for tiny symmetric matrices.

The MUSIC serving path (batch=1 window, reference online loop
`1.1.0:1266-1411`) needs eigh of n_bands (=3) 10x10 covariance matrices.
The math is latency-trivial but the XLA formulation executes ~50 small
fused kernels (54 sequential rotation rounds), and even fully unrolled
measures ~94-165 us at B=3 on the v5e — nearly all launch/boundary
overhead. This kernel runs the SAME parallel-ordering cyclic Jacobi
(wavespec_tpu.analyze.jacobi) with every sweep unrolled INSIDE one
Pallas program: one launch, all rotations on VMEM-resident
[m, m, 8, 128] tiles with the batch tiled over full (8, 128) vregs
(sublanes x lanes — a [1, B] lanes-only layout wastes 7/8 of every
vector op), gridded over 1024-matrix batch tiles.

It is the device eigh at EVERY batch size, not just serving
(benchmarks/bench_jacobi_batch.py on the v5e: B=3 56 us vs 252 us XLA,
B=1536 — the flagship MUSIC bench shape — 358 vs 517, B=6144 1213 vs
2057), so `analyze.jacobi.jacobi_eigh` routes here unconditionally on
non-CPU backends.

Differences vs the XLA path (documented, test-gated):
- rotation angles use the half-angle closed form (c = sqrt((1+x/r)/2),
  s = sign(y) * sqrt((1-x/r)/2) for cos/sin of 0.5*atan2(y, x)) instead
  of arctan2+cos+sin — same rotation to f32 rounding, no dependence on
  a Mosaic atan2 lowering. The exact y==0 corner is forced to the
  IDENTITY rotation (see `_rotation_cs`): the pair is already diagonal
  there, and for x<0 the raw formulas would degenerate to c=s=0 and
  zero out both rows — which real Toeplitz covariances DO hit (exact
  mirror-symmetric cancellations). atan2's pi/2 swap at that corner is
  instead replaced by no-op + the final eigenvalue SORT (outside the
  kernel), so results still match the XLA path.
- eigenvalue/vector ordering is sorted outside the kernel in XLA,
  exactly like the fori path.

CPU/tests keep the pure-XLA path (this kernel is device-only routing,
see `analyze.jacobi.jacobi_eigh`); interpret mode is only for tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from wavespec_tpu.ops.gather import take_last
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavespec_tpu.kernels.fused_dft import out_struct

LANES = 128
SUBLANES = 8


def _rotation_cs(a_pq, a_qq_minus_pp):
    """cos/sin of 0.5*atan2(2*a_pq, a_qq - a_pp), closed form ([1, B])."""
    y = 2.0 * a_pq
    x = a_qq_minus_pp
    r = jnp.sqrt(x * x + y * y)
    safe = r > 1e-30
    xr = jnp.where(safe, x / jnp.where(safe, r, 1.0), 1.0)
    # Exact y == 0 must emit the IDENTITY rotation. The generic formulas
    # give s = sign(0)*sqrt((1-xr)/2) = 0 but, for x < 0 (xr = -1), also
    # c = sqrt(0) = 0 — and a c = s = 0 "rotation" ANNIHILATES both
    # rows/columns instead of leaving them alone. Bisymmetric inputs
    # (symmetric Toeplitz — every _autocov_toeplitz covariance) keep
    # exact mirror symmetry on the deterministic VPU lanes, so mid-sweep
    # off-diagonals cancel to exact zeros and, without this guard, the
    # matrix progressively collapses to zero (observed on the v5e for
    # the ESPRIT full-band covariance: 7 of 10 eigenvalues returned as
    # exactly 0.0 and the trace was lost). Host/Jacobi-XLA replays never
    # trigger it — matmul rounding leaves ~1e-9 residues, and atan2(0,
    # x<0) = pi yields a valid (c, s) = (0, 1) swap — which is why
    # interpret-mode tests alone missed this.
    xr = jnp.where(y == 0.0, 1.0, xr)
    c = jnp.sqrt(jnp.maximum(0.5 * (1.0 + xr), 0.0))
    s = jnp.sign(y) * jnp.sqrt(jnp.maximum(0.5 * (1.0 - xr), 0.0))
    return c, s


def _kernel(a_ref, vals_ref, vecs_ref, *, m: int, sweeps: int, rounds):
    mat = a_ref[:]  # [m, m, SUBLANES, LANES]
    # Identity at full tile shape via two iotas (Mosaic rejects the
    # vector<m x m> -> vector<m x m x 1 x 1> shape cast a broadcasted
    # jnp.eye would need).
    ii = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 1)
    vecs = jnp.where(ii == jj, 1.0, 0.0).astype(jnp.float32)

    def apply_round(mat, vecs, pairs):
        cs = {}
        for p, q in pairs:
            # [1, B] slices keep everything 2D for Mosaic.
            cs[(p, q)] = _rotation_cs(
                mat[p, q : q + 1, :], mat[q, q : q + 1, :] - mat[p, p : p + 1, :]
            )

        def rot_rows(x, row):  # R^T X on axis `row` of [m, m, B]
            xs = [x[i] for i in range(m)] if row == 0 else \
                 [x[:, i] for i in range(m)]
            new = list(xs)
            for p, q in pairs:
                c, s = cs[(p, q)]
                new[p] = c * xs[p] - s * xs[q]
                new[q] = s * xs[p] + c * xs[q]
            return jnp.stack(new, axis=row)

        mat = rot_rows(rot_rows(mat, 0), 1)
        vecs = rot_rows(vecs, 1)
        return mat, vecs

    for _ in range(sweeps):
        for pairs in rounds:
            mat, vecs = apply_round(mat, vecs, pairs)

    vals_ref[:] = jnp.stack([mat[i, i] for i in range(m)], axis=0)  # [m, B]
    vecs_ref[:] = vecs


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def jacobi_eigh_pallas(a: jax.Array, sweeps: int = 6, interpret: bool = False):
    """Drop-in for `analyze.jacobi.jacobi_eigh` on a real device.

    a: symmetric [..., m, m] float32. Returns (eigvals ascending [..., m],
    eigvecs [..., m, m], column j <-> eigenvalue j).
    """
    from wavespec_tpu.analyze.jacobi import _round_robin_pairs

    m = a.shape[-1]
    batch = a.shape[:-2]
    mat = jnp.moveaxis(a.reshape(-1, m, m).astype(jnp.float32), 0, -1)
    b = mat.shape[-1]
    # Tile the batch as [..., SUBLANES, LANES]: every rotation op then
    # fills a whole (8, 128) vreg instead of one sublane of it — 8x the
    # batch per grid step at the same unrolled op count (B=1536 went
    # 12 -> 2 grid steps). Latency at tiny batches is unchanged (the
    # VPU runs full vregs either way).
    b_tile = SUBLANES * LANES
    b_pad = -(-b // b_tile) * b_tile
    if b_pad != b:
        # Diagonal padding keeps the rotations harmlessly trivial there.
        pad = jnp.zeros((m, m, b_pad - b), jnp.float32) + \
            jnp.eye(m, dtype=jnp.float32)[:, :, None]
        mat = jnp.concatenate([mat, pad], axis=-1)
    mat = mat.reshape(m, m, b_pad // LANES, LANES)

    rounds = _round_robin_pairs(m)
    kernel = partial(_kernel, m=m, sweeps=sweeps, rounds=rounds)
    grid = (b_pad // b_tile,)
    spec4 = pl.BlockSpec((m, m, SUBLANES, LANES), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((m, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    vals, vecs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec4],
        out_specs=[spec3, spec4],
        out_shape=[
            out_struct((m, b_pad // LANES, LANES), jnp.float32, mat),
            out_struct((m, m, b_pad // LANES, LANES), jnp.float32, mat),
        ],
        interpret=interpret,
    )(mat)

    eigvals = jnp.moveaxis(vals.reshape(m, b_pad)[:, :b], -1, 0)   # [B, m]
    vecs = jnp.moveaxis(vecs.reshape(m, m, b_pad)[:, :, :b], -1, 0)
    order = jnp.argsort(eigvals, axis=-1)
    eigvals = take_last(eigvals, order)
    vecs = take_last(vecs, order[:, None, :])
    return eigvals.reshape(*batch, m), vecs.reshape(*batch, m, m)
