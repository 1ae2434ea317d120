"""Small-index gathers as one-hot contractions.

`jnp.take_along_axis` lowers to a general gather on TPU, which
serializes: chip-measured 4.99 ms for a [64, 512, 230] -> [64, 512, 12]
last-axis pick vs 0.063 ms (79x) for the equivalent one-hot
multiply-reduce, bitwise identical for in-range indices. These helpers
are for HOT paths where the picked axis is small enough that the
(virtual, fusion-resident) one-hot product [..., S, K] is cheap VPU
work — a few hundred entries per row, not thousands.

Indices must be pre-clipped to range (the callers all clip): an
out-of-range index yields 0 here where take_along_axis would clamp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_last(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """``jnp.take_along_axis(arr, idx, axis=-1)`` via one-hot reduce.

    arr: [..., K]; idx: [..., S] integer in [0, K). Returns [..., S].
    """
    k = arr.shape[-1]
    inexact = jnp.issubdtype(arr.dtype, jnp.inexact)  # float or complex
    oh = (idx[..., :, None] == jnp.arange(k, dtype=idx.dtype)).astype(
        jnp.float32 if inexact else jnp.int32
    )
    if inexact:
        return jnp.sum(arr[..., None, :] * oh, axis=-1)
    out = jnp.sum(arr[..., None, :].astype(jnp.int32) * oh, axis=-1)
    return out.astype(arr.dtype)


def take_rows(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """``jnp.take_along_axis(arr, idx[..., None], axis=-2)`` via one-hot.

    arr: [..., R, F]; idx: [..., S] integer in [0, R). Returns [..., S, F].
    """
    r = arr.shape[-2]
    inexact = jnp.issubdtype(arr.dtype, jnp.inexact)
    oh = (idx[..., :, None] == jnp.arange(r, dtype=idx.dtype)).astype(
        jnp.float32 if inexact else jnp.int32
    )  # [..., S, R]
    if inexact:
        return jnp.sum(oh[..., :, :, None] * arr[..., None, :, :], axis=-2)
    out = jnp.sum(
        oh[..., :, :, None] * arr[..., None, :, :].astype(jnp.int32), axis=-2
    )
    return out.astype(arr.dtype)
