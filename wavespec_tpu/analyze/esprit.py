"""ESPRIT frequency estimation (least-squares rotational invariance).

The reference names method 1 "MUSIC/ESPRIT" (`1.1.0:50`); the device path
implements MUSIC (`analyze.music`). This module provides the ESPRIT
estimator as an alternative/cross-check, FULLY ON DEVICE:

1. signal subspace S [m, p] from the covariance eigendecomposition
   (shared batched Jacobi, device-side);
2. rotational invariance: S1 Psi ~= S2 where S1/S2 drop the last/first
   row; least-squares Psi via the normal equations
   Psi = (S1^T S1)^{-1} S1^T S2, the SPD inverse solved with the same
   batched Jacobi eigh (no LAPACK lowering needed);
3. eigenvalues of Psi (near e^{+-i w D}, D = covariance decimation) via
   `analyze.eig_small` (Faddeev-LeVerrier characteristic polynomial +
   Durand-Kerner roots — pure JAX); frequencies = |angle(eig)| / (2 pi D).

`esprit_frequencies` is jittable end to end; `esprit_frequencies_host`
keeps the original NumPy `eigvals` path as a cross-check oracle (tests
gate device/host agreement).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from wavespec_tpu.analyze.eig_small import eigvals_small
from wavespec_tpu.analyze.jacobi import jacobi_eigh
from wavespec_tpu.analyze.music import _auto_decimation, _autocov_toeplitz, _decimate_box


def _signal_subspace_rotation(windows: jax.Array, cfg):
    """Shared steps 1-2: returns (Psi [..., p, p], decimation D)."""
    m = cfg.ar_order
    p = 2 * cfg.top_k
    if m < p + 2:
        raise ValueError(
            f"ar_order={m} too small for top_k={cfg.top_k}: need ar_order >= 2*top_k+2"
        )
    d = _auto_decimation(cfg)
    xd = _decimate_box(windows.astype(jnp.float32), d)
    r = _autocov_toeplitz(xd, m)
    _, eigvecs = jacobi_eigh(r)
    # signal subspace: last p columns (eigvals ascending)
    s = eigvecs[..., m - p :]

    s1 = s[..., :-1, :]
    s2 = s[..., 1:, :]
    hp = jax.lax.Precision.HIGHEST
    # normal equations: Psi = (S1^T S1)^{-1} (S1^T S2); the p x p SPD
    # inverse goes through jacobi_eigh (V diag(1/lam) V^T), eigenvalues
    # floored relative to the largest for pinv-like robustness.
    ata = jnp.einsum("...ji,...jk->...ik", s1, s1, precision=hp)
    atb = jnp.einsum("...ji,...jk->...ik", s1, s2, precision=hp)
    lam, v = jacobi_eigh(ata)
    floor = 1e-6 * jnp.max(lam, axis=-1, keepdims=True)
    inv_lam = jnp.where(lam > floor, 1.0 / jnp.maximum(lam, 1e-30), 0.0)
    vt_atb = jnp.einsum("...ji,...jk->...ik", v, atb, precision=hp)
    psi = jnp.einsum(
        "...ij,...jk->...ik", v, inv_lam[..., None] * vt_atb, precision=hp
    )
    return psi, d


def _fold_frequencies(lam_angle_abs: jax.Array, d: int, cfg):
    """Pair (+w, -w) conjugate folds and band-gate, shared device/host."""
    freq = lam_angle_abs / (2.0 * jnp.pi * d)
    freq_sorted = jnp.sort(freq, axis=-1)
    paired = 0.5 * (freq_sorted[..., 0::2] + freq_sorted[..., 1::2])
    paired = paired[..., : cfg.top_k]
    lo, hi = 1.0 / cfg.max_period, 1.0 / cfg.min_period
    return jnp.where((paired >= lo) & (paired <= hi), paired, 0.0)


@partial(jax.jit, static_argnames=("cfg",))
def esprit_frequencies(windows: jax.Array, cfg) -> jax.Array:
    """Estimate up to top_k cycle frequencies (cycles/bar) per window —
    fully on device (jittable).

    windows: [..., n] (same preconditioning expectations as music_extract:
    callers should high-pass drifting feeds first). Returns
    ``[..., top_k]`` frequencies (unordered; 0 where no in-band estimate).
    """
    psi, d = _signal_subspace_rotation(jnp.asarray(windows), cfg)
    lam = eigvals_small(psi)                 # complex [..., p]
    ang = jnp.abs(jnp.arctan2(jnp.imag(lam), jnp.real(lam)))
    return _fold_frequencies(ang, d, cfg)


def esprit_frequencies_host(windows: np.ndarray, cfg) -> np.ndarray:
    """Host cross-check: identical pipeline but step 3 uses
    numpy.linalg.eigvals. Tests gate device/host agreement."""
    psi, d = _signal_subspace_rotation(jnp.asarray(np.asarray(windows)), cfg)
    lam = np.linalg.eigvals(np.asarray(psi))
    ang = np.abs(np.angle(lam))
    return np.asarray(_fold_frequencies(jnp.asarray(ang), d, cfg))
