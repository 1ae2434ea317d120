"""ESPRIT frequency estimation (least-squares rotational invariance).

The reference names method 1 "MUSIC/ESPRIT" (`1.1.0:50`); the device path
implements MUSIC (`analyze.music`). This module provides the ESPRIT
estimator as an alternative/cross-check:

1. signal subspace S [m, p] from the covariance eigendecomposition
   (shared batched Jacobi, device-side);
2. rotational invariance: S1 Psi ~= S2 where S1/S2 drop the last/first
   row; least-squares Psi = pinv(S1) S2 (p x p);
3. the eigenvalues of Psi lie near e^{+-i w D} (D = covariance
   decimation); frequencies = |angle(eig)| / (2 pi D).

Step 3 needs a small nonsymmetric eigendecomposition; no TPU runtime we
target lowers `eig`, and p <= 16, so that one step runs host-side in
NumPy — this estimator is therefore a *host* API (batch: [B, p, p] eig is
microseconds). Use `analyze.music` for the fully on-device path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.analyze.jacobi import jacobi_eigh
from wavespec_tpu.analyze.music import _auto_decimation, _autocov_toeplitz, _decimate_box


def esprit_frequencies(
    windows: np.ndarray,
    cfg,
) -> np.ndarray:
    """Estimate up to top_k cycle frequencies (cycles/bar) per window.

    windows: [..., n] (same preconditioning expectations as music_extract:
    callers should high-pass drifting feeds first). Returns
    ``[..., top_k]`` frequencies (unordered; 0 where no in-band estimate).
    """
    m = cfg.ar_order
    p = 2 * cfg.top_k
    if m < p + 2:
        raise ValueError(
            f"ar_order={m} too small for top_k={cfg.top_k}: need ar_order >= 2*top_k+2"
        )
    d = _auto_decimation(cfg)
    x = jnp.asarray(np.asarray(windows, np.float32))
    xd = _decimate_box(x, d)
    r = _autocov_toeplitz(xd, m)
    _, eigvecs = jacobi_eigh(r)
    # signal subspace: last p columns (eigvals ascending)
    s = np.asarray(eigvecs)[..., m - p :]

    s1 = s[..., :-1, :]
    s2 = s[..., 1:, :]
    psi = np.linalg.pinv(s1) @ s2                    # [..., p, p]
    lam = np.linalg.eigvals(psi)                     # complex [..., p]
    ang = np.abs(np.angle(lam))                      # [0, pi]
    freq = ang / (2.0 * np.pi * d)

    # each real cycle contributes a conjugate pair (+w, -w): after the
    # abs-angle fold the pair members are adjacent in sorted order; average
    # them for a slightly more robust estimate
    freq_sorted = np.sort(freq, axis=-1)
    paired = 0.5 * (freq_sorted[..., 0::2] + freq_sorted[..., 1::2])
    paired = paired[..., : cfg.top_k]
    lo, hi = 1.0 / cfg.max_period, 1.0 / cfg.min_period
    return np.where((paired >= lo) & (paired <= hi), paired, 0.0)
