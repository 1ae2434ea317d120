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
   Durand-Kerner roots — pure JAX); one frequency per conjugate pair via
   positive-angle selection ranked by unit-circle proximity
   (`_select_frequencies`).

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


def _select_frequencies(lam: jax.Array, d: int, cfg):
    """One frequency per conjugate pair, shared device/host.

    Keep eigenvalues with angle in (eps, pi - eps): each real sinusoid
    contributes exactly ONE such (+w) root, so conjugate partners never
    double-count and UNPAIRED REAL eigenvalues (angle 0 or pi — common
    when top_k exceeds the true sinusoid count) never enter. The
    previous fold sorted all |angles| and averaged fixed adjacent pairs,
    and a single real eigenvalue shifted that adjacency by one —
    destroying every estimate and emitting phantom mid-band frequencies
    (e.g. the average of two true frequencies). Candidates are ranked by
    closeness of |lam| to the unit circle (signal roots lie on it, noise
    roots inside), top_k taken, then band-gated; slots with no valid
    candidate return 0.
    """
    ang = jnp.arctan2(jnp.imag(lam), jnp.real(lam))
    mod = jnp.abs(lam)
    eps = 1e-5
    ok = (ang > eps) & (ang < jnp.pi - eps)
    score = jnp.where(ok, -jnp.abs(mod - 1.0), -jnp.inf)
    top_score, idx = jax.lax.top_k(score, cfg.top_k)
    freq = jnp.take_along_axis(ang, idx, axis=-1) / (2.0 * jnp.pi * d)
    valid = jnp.isfinite(top_score)
    lo, hi = 1.0 / cfg.max_period, 1.0 / cfg.min_period
    return jnp.where(valid & (freq >= lo) & (freq <= hi), freq, 0.0)


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
    return _select_frequencies(lam, d, cfg)


def esprit_frequencies_host(windows: np.ndarray, cfg) -> np.ndarray:
    """Host cross-check: identical pipeline but step 3 uses
    numpy.linalg.eigvals. Tests gate device/host agreement."""
    psi, d = _signal_subspace_rotation(jnp.asarray(np.asarray(windows)), cfg)
    lam = np.linalg.eigvals(np.asarray(psi))
    return np.asarray(_select_frequencies(jnp.asarray(lam), d, cfg))
