"""Varying-manual-axes (vma) helpers for `jax.shard_map(check_vma=True)`.

Under JAX 0.9's vma checker, a `lax.scan` carry must enter with the same
varying-axes set it leaves with. The v757 state machines seed their
carries with replicated constants (`jnp.zeros` inits, `jnp.diag`
covariances) while the data flowing through them is shard-varying, so
one scan step promotes the carry and the checker rejects the mismatch.
`jax.lax.pcast(..., to='varying')` is the sanctioned data-no-op
promotion (the JAX 0.9 successor of the deprecated `jax.lax.pvary`);
`pvary_like` applies it tree-wide using a data operand as the vma donor
— the same treatment `kernels.fused_dft.out_struct` gives pallas
outputs. Outside `shard_map` the donor's vma is empty and everything is
a no-op.
"""

from __future__ import annotations

import jax


def _vma(x) -> frozenset:
    return getattr(jax.typeof(x), "vma", None) or frozenset()


def _promote_leaf(a, missing: tuple[str, ...]):
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(a, missing, to="varying")
    return jax.lax.pvary(a, missing)  # pre-0.9 fallback


def pvary_like(tree, like):
    """Promote every leaf of `tree` to carry (at least) `like`'s
    varying-manual-axes; a no-op outside shard_map or on older JAX."""
    want = _vma(like)
    if not want:
        return tree

    def promote(a):
        missing = tuple(sorted(want - _vma(a)))
        return _promote_leaf(a, missing) if missing else a

    return jax.tree.map(promote, tree)
