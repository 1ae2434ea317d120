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
from wavespec_tpu.ops.gather import take_last, take_rows

from wavespec_tpu.analyze.eig_small import eigvals_small
from wavespec_tpu.analyze.jacobi import jacobi_eigh
from wavespec_tpu.analyze.music import _auto_decimation, _autocov_toeplitz, _decimate_box


def _signal_subspace_rotation(windows: jax.Array, cfg):
    """Shared steps 1-2: returns (Psi [..., p, p], decimation D,
    covariance eigenvalues [..., m] ascending)."""
    m = cfg.ar_order
    p = 2 * cfg.top_k
    if m < p + 2:
        raise ValueError(
            f"ar_order={m} too small for top_k={cfg.top_k}: need ar_order >= 2*top_k+2"
        )
    d = _auto_decimation(cfg)
    xd = _decimate_box(windows.astype(jnp.float32), d)
    r = _autocov_toeplitz(xd, m)
    cov_eigvals, eigvecs = jacobi_eigh(r)
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
    return psi, d, cov_eigvals


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
    freq = take_last(ang, idx) / (2.0 * jnp.pi * d)
    mod_sel = take_last(mod, idx)
    valid = jnp.isfinite(top_score)
    lo, hi = 1.0 / cfg.max_period, 1.0 / cfg.min_period
    freq = jnp.where(valid & (freq >= lo) & (freq <= hi), freq, 0.0)
    return freq, mod_sel


@partial(jax.jit, static_argnames=("cfg",))
def esprit_frequencies(windows: jax.Array, cfg) -> jax.Array:
    """Estimate up to top_k cycle frequencies (cycles/bar) per window —
    fully on device (jittable).

    windows: [..., n] (same preconditioning expectations as music_extract:
    callers should high-pass drifting feeds first). Returns
    ``[..., top_k]`` frequencies (unordered; 0 where no in-band estimate).
    """
    psi, d, _ = _signal_subspace_rotation(jnp.asarray(windows), cfg)
    lam = eigvals_small(psi)                 # complex [..., p]
    return _select_frequencies(lam, d, cfg)[0]


def esprit_frequencies_host(windows: np.ndarray, cfg) -> np.ndarray:
    """Host cross-check: identical pipeline but step 3 uses
    numpy.linalg.eigvals. Tests gate device/host agreement."""
    psi, d, _ = _signal_subspace_rotation(jnp.asarray(np.asarray(windows)), cfg)
    lam = np.linalg.eigvals(np.asarray(psi))
    return np.asarray(_select_frequencies(jnp.asarray(lam), d, cfg)[0])


def esprit_extract(windows: jax.Array, cfg, pre_highpassed: bool = False
                   ) -> jax.Array:
    """Full ESPRIT extraction: stride-15 attrs through the same
    precondition/fit/rank tail as `music_extract`.

    Wired to the public surface as `Method.ESPRIT` (`extract.py`): the
    reference's `method=1` is named "MUSIC/ESPRIT" (`1.1.0:50`), so both
    subspace estimators emit `method_id=1` in the stride-15 record — the
    decode-site MusicOnly gate (`1.1.0:1492-1494`) accepts either.

    Differences from MUSIC, by construction of the estimator:
    - frequencies come from the rotation operator's eigenvalues (no grid,
      no pseudospectrum) and get one parabolic refinement at the
      subspace-grid fine step;
    - coherence is the unit-circle proximity of the selected rotation
      eigenvalue (signal roots lie ON the circle, noise roots inside) —
      the subspace-concentration analog of the pseudospectrum peak ratio;
    - eigen_ratio is the covariance signal/noise eigenvalue ratio, same
      definition as MUSIC's but on the single full-band covariance.
    """
    from wavespec_tpu.extract import Method, _attrs_from_peaks  # circular-safe
    from wavespec_tpu.analyze.music import (
        _dedupe_mask,
        _refine_freq,
        _sinusoid_fit,
        hp_gain_compensate,
        music_hp_period,
    )
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu
    from wavespec_tpu.ops.spectrum import band_indices

    n = cfg.window
    m = cfg.ar_order
    p = 2 * cfg.top_k

    hp_period = music_hp_period(cfg)
    if cfg.music_highpass and not pre_highpassed:
        # First-sample anchor before the cold-start filter, exactly as
        # music_extract (a price-level init step otherwise dominates the
        # covariance).
        windows = windows - windows[..., :1]
        windows = ehlers_highpass_detrend_mxu(
            windows, (hp_period,)
        )[..., 0, :]

    psi, d, cov_eigvals = _signal_subspace_rotation(windows, cfg)
    lam = eigvals_small(psi)
    freq, mod_sel = _select_frequencies(lam, d, cfg)
    valid = freq > 0.0

    # Parabolic refinement at the subspace fine step (ESPRIT frequencies
    # are continuous already; one pass tightens the LS fit's phase).
    fine_step = 1.0 / (n * max(cfg.music_grid_per_bin, 1))
    freq, _ = _refine_freq(windows, freq, step=fine_step)
    valid = _dedupe_mask(freq, valid, 0.5 / n)
    freq = jnp.where(valid, freq, 0.0)

    a, b, resid_energy = _sinusoid_fit(
        windows, freq, valid=valid.astype(jnp.float32))
    amp = jnp.sqrt(a * a + b * b)
    psi_ph = jnp.arctan2(a, b)
    if cfg.music_highpass:
        amp, psi_ph = hp_gain_compensate(amp, psi_ph, freq, hp_period)
    omega = 2.0 * jnp.pi * freq
    phase_end = omega * (n - 1) + psi_ph

    power = (amp * n / 2.0) ** 2
    noise_floor = jnp.maximum(resid_energy, 1e-30)
    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    n_band = float(k_max - k_min + 1)
    total_inband = (
        jnp.sum(jnp.where(valid, power, 0.0), axis=-1) + noise_floor * n_band
    )

    # Unit-circle proximity -> 0..1 concentration (exact root: coh = 1).
    coherence = jnp.clip(1.0 - 2.0 * jnp.abs(mod_sel - 1.0), 0.0, 1.0)

    sig_mean = jnp.mean(cov_eigvals[..., m - p :], axis=-1)
    noi_mean = jnp.maximum(jnp.mean(cov_eigvals[..., : m - p], axis=-1), 1e-30)
    ratio = jnp.clip(sig_mean / noi_mean, 0.0, 1e6)
    eigen_ratio = jnp.broadcast_to(ratio[..., None], amp.shape)

    # Rank by fitted power (same final ordering rule as music_extract).
    rank_key = jnp.where(valid, power, -1.0)
    _, top_idx = jax.lax.top_k(rank_key, cfg.top_k)
    packed = jnp.stack(
        [freq, amp, phase_end, power, coherence,
         valid.astype(jnp.float32), eigen_ratio], axis=-1,
    )
    taken = take_rows(packed, top_idx)
    freq, amp, phase_end = taken[..., 0], taken[..., 1], taken[..., 2]
    power, coherence = taken[..., 3], taken[..., 4]
    valid = taken[..., 5] > 0.5
    eigen_ratio = taken[..., 6]

    return _attrs_from_peaks(
        freq, amp, phase_end, power, valid, total_inband, noise_floor,
        coherence, eigen_ratio, int(Method.MUSIC), cfg,
    )
