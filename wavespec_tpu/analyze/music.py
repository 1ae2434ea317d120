"""MUSIC subspace dominant-cycle estimation (`gpu_extract_cycles` method=1).

The reference's MUSIC/ESPRIT implementation lives in the closed
`mt-bridge.dll`; only its interface is observable (`method=1`,
`ar_order`, and the stride-15 attribute fields — `1.1.0:49-51,1477-1490`,
SURVEY.md §2.2). This is a principled re-implementation, validated
property-wise (recovers planted sinusoids in the `ar_order=10, top_k=2`
"perfect cycles" regime noted in the reference CHANGELOG).

Pipeline (one jitted program, batched over windows):

1. Toeplitz autocovariance of order m=ar_order via lag matmuls.
2. Batched Jacobi eigh (wavespec_tpu.analyze.jacobi) -> signal/noise split:
   signal dim p = min(2*top_k, m-2) (a real sinusoid spans 2 complex
   exponentials).
3. Noise-subspace pseudospectrum P(w) = 1 / ||a(w)^H E_n||^2 evaluated on a
   dense in-band frequency grid — two [G, m] @ [m, m-p] matmuls.
4. Top-k local maxima of P -> cycle frequencies (super-resolution: the grid
   is `music_grid_per_bin` times finer than the FFT bin spacing).
5. Amplitude/phase per cycle by least-squares sinusoid fit to the window,
   solved matrix-free: sinusoid columns over N>=4096 samples are nearly
   orthogonal, so c = (2/N) H^T x plus two residual-refinement passes
   converges without a linear solver (no LAPACK lowering needed).
6. Attribute assembly shared with the FFT-ridge path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wavespec_tpu.analyze.jacobi import jacobi_eigh
from wavespec_tpu.ops.detrend import ehlers_highpass_detrend
from wavespec_tpu.ops.spectrum import band_indices

__all__ = ["music_extract", "music_pseudospectrum"]


def _autocov_toeplitz(windows: jax.Array, m: int) -> jax.Array:
    """Symmetric Toeplitz autocovariance ``[..., m, m]`` from ``[..., n]``.

    r[lag] = (1/n) sum_t x[t] x[t+lag]; Toeplitz structure equals
    forward-backward averaging for a stationary estimate.
    """
    n = windows.shape[-1]
    x0 = windows
    lags = []
    for lag in range(m):
        prod = x0[..., : n - lag] * x0[..., lag:]
        lags.append(jnp.sum(prod, axis=-1) / (n - lag))
    r = jnp.stack(lags, axis=-1)  # [..., m]
    i = jnp.arange(m)
    toep_idx = jnp.abs(i[:, None] - i[None, :])  # [m, m]
    return r[..., toep_idx]


def _auto_decimation(cfg) -> int:
    """Decimation factor D for the subspace stage.

    Adjacent-tap covariance of order m cannot resolve periods >> m in
    float32: for a period P the steering vectors advance only 2*pi*m/P rad
    across the aperture, so distinct long periods become numerically
    collinear (4th eigenvalue underflows f32). Subsampling by D stretches
    the aperture to m*D bars. We target the geometric band center at ~m
    decimated samples/period while keeping min_period >= 2.2*D (above
    decimated Nyquist with margin):

        D = clip(round(sqrt(minP*maxP)/m), 1, floor(minP/2.2))

    The decimated series only feeds the covariance/pseudospectrum;
    amplitude and phase are always fit on the full-rate window.
    """
    if cfg.music_decimation:
        return int(cfg.music_decimation)
    import math

    gm = math.sqrt(cfg.min_period * cfg.max_period)
    d = max(1, round(gm / cfg.ar_order))
    d_max = max(1, int(cfg.min_period / 2.2))
    return max(1, min(d, d_max))


def _decimate_box(windows: jax.Array, d: int) -> jax.Array:
    """Box-prefiltered decimation by d (anti-alias + subsample in one
    reshape-mean — no convolution kernel needed)."""
    if d == 1:
        return windows
    n = windows.shape[-1]
    n_keep = (n // d) * d
    x = windows[..., n - n_keep :]
    return jnp.mean(x.reshape(*x.shape[:-1], n_keep // d, d), axis=-1)


def _freq_grid(cfg) -> jnp.ndarray:
    """Static in-band frequency grid (cycles/bar), music_grid_per_bin x finer
    than the FFT bin spacing."""
    n = cfg.window
    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    g = cfg.music_grid_per_bin
    # grid bins k_min .. k_max step 1/g (inclusive band edges)
    kg = k_min + jnp.arange((k_max - k_min) * g + 1) / g
    return kg / n  # cycles/bar


def music_pseudospectrum(windows: jax.Array, cfg):
    """Noise-subspace pseudospectrum over the in-band grid.

    Returns (pseudo [..., G], freqs [G] cycles/bar, eigvals [..., m]).
    The covariance is taken on a box-decimated copy of the window (see
    `_auto_decimation`); the steering vectors absorb the factor D so the
    grid stays in full-rate cycles/bar.
    """
    m = cfg.ar_order
    p = 2 * cfg.top_k
    if m < p + 2:
        raise ValueError(
            f"ar_order={m} too small for top_k={cfg.top_k}: need ar_order >= 2*top_k+2"
        )
    d = _auto_decimation(cfg)
    xd = _decimate_box(windows, d)
    r = _autocov_toeplitz(xd, m)
    eigvals, eigvecs = jacobi_eigh(r)
    # ascending order -> noise subspace = first m-p columns
    noise = eigvecs[..., : m - p]  # [..., m, m-p]

    freqs = _freq_grid(cfg)
    taps = jnp.arange(m, dtype=jnp.float32) * d
    ang = 2.0 * jnp.pi * freqs[:, None] * taps[None, :]  # [G, m]
    cos_g, sin_g = jnp.cos(ang), jnp.sin(ang)
    # ||a(w)^H E_n||^2 = ||C E_n||^2 + ||S E_n||^2 rowwise
    cn = jnp.einsum("gm,...mp->...gp", cos_g, noise, precision=jax.lax.Precision.HIGHEST)
    sn = jnp.einsum("gm,...mp->...gp", sin_g, noise, precision=jax.lax.Precision.HIGHEST)
    den = jnp.sum(cn * cn + sn * sn, axis=-1)  # [..., G]
    pseudo = 1.0 / jnp.maximum(den, 1e-12)
    return pseudo, freqs, eigvals


def _topk_local_maxima(pseudo: jax.Array, k: int, excl: int):
    """Top-k local maxima with a +/-`excl`-point exclusion zone per pick.

    Noise makes the pseudospectrum jagged: adjacent grid points can both be
    strict local maxima of the same physical peak, so a plain top-k returns
    near-duplicate frequencies (and the downstream sinusoid fit then sees
    nearly collinear columns). We pick greedily, masking +/-excl grid
    points (one FFT bin's worth) around each accepted peak.
    """
    left = jnp.concatenate([pseudo[..., :1], pseudo[..., :-1]], axis=-1)
    right = jnp.concatenate([pseudo[..., 1:], pseudo[..., -1:]], axis=-1)
    is_peak = (pseudo >= left) & (pseudo > right)
    masked = jnp.where(is_peak, pseudo, jnp.zeros_like(pseudo))

    g = pseudo.shape[-1]
    grid_pos = jnp.arange(g)
    vals, idxs = [], []
    for _ in range(k):
        v = jnp.max(masked, axis=-1)
        i = jnp.argmax(masked, axis=-1)
        vals.append(v)
        idxs.append(i)
        far = jnp.abs(grid_pos - i[..., None]) > excl
        masked = jnp.where(far, masked, 0.0)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1).astype(jnp.int32)


def _refine_freq(
    windows: jax.Array, freq: jax.Array, step: float, iters: int = 2
) -> jax.Array:
    """Parabolically refine frequencies against the window periodogram.

    A frequency error df costs the downstream LS fit a sinc(pi*df*n)
    amplitude loss (2.4 rad of phase drift across a 4096 window for half an
    FFT bin), so grid-resolution peaks are not enough. Each iteration
    evaluates the exact periodogram |sum_t x e^{-2pi i f t}|^2 at f-step,
    f, f+step (three thin matvecs) and moves to the parabola vertex.
    """
    n = windows.shape[-1]
    t = jnp.arange(n, dtype=jnp.float32)

    def periodogram(f):  # f [..., k, 3] -> [..., k, 3]
        ang = 2.0 * jnp.pi * f[..., None] * t  # [..., k, 3, n]
        c = jnp.einsum("...n,...kjn->...kj", windows, jnp.cos(ang), precision=jax.lax.Precision.HIGHEST)
        s = jnp.einsum("...n,...kjn->...kj", windows, jnp.sin(ang), precision=jax.lax.Precision.HIGHEST)
        return c * c + s * s

    offsets = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    for _ in range(iters):
        cand = freq[..., None] + step * offsets  # [..., k, 3]
        p = periodogram(cand)
        # parabola vertex through (-1, p0), (0, p1), (1, p2)
        denom = p[..., 0] - 2.0 * p[..., 1] + p[..., 2]
        shift = 0.5 * (p[..., 0] - p[..., 2]) / jnp.where(
            jnp.abs(denom) > 1e-30, denom, 1e-30
        )
        shift = jnp.clip(shift, -1.0, 1.0)
        freq = freq + shift * step
        step = step / 4.0
    return freq


def _sinusoid_fit(windows: jax.Array, freq: jax.Array, refine: int = 2,
                  valid: jax.Array | None = None):
    """LS fit of k sinusoids: x[t] ~ sum_j a_j cos(w_j t) + b_j sin(w_j t).

    windows [..., n], freq [..., k] (cycles/bar). Matrix-free normal
    equations: c0 = (2/n) H^T x, then `refine` residual passes
    c <- c + (2/n) H^T (x - H c). Near-orthogonal columns (distinct
    frequencies over n >> period) make this converge geometrically.

    `valid` masks out columns for windows with fewer than k genuine peaks:
    invalid picks all collapse to the same argmax-of-zeros frequency, and
    duplicated columns make the refinement iteration DIVERGE (the update
    has per-pass error multiplier (1 - m) for m duplicates), which would
    pollute resid_energy — and hence snr/score — of the valid cycles.

    Returns (a [..., k], b [..., k], residual_energy [...]).
    """
    n = windows.shape[-1]
    t = jnp.arange(n, dtype=jnp.float32)
    ang = 2.0 * jnp.pi * freq[..., None] * t  # [..., k, n]
    cos_t, sin_t = jnp.cos(ang), jnp.sin(ang)
    if valid is not None:
        cos_t = cos_t * valid[..., None]
        sin_t = sin_t * valid[..., None]

    def ht_x(v):  # H^T v: [..., n] -> [..., 2k]
        return (
            jnp.einsum("...kn,...n->...k", cos_t, v, precision=jax.lax.Precision.HIGHEST),
            jnp.einsum("...kn,...n->...k", sin_t, v, precision=jax.lax.Precision.HIGHEST),
        )

    def h_c(a, b):  # H c: [..., k] -> [..., n]
        return jnp.einsum(
            "...k,...kn->...n", a, cos_t, precision=jax.lax.Precision.HIGHEST
        ) + jnp.einsum(
            "...k,...kn->...n", b, sin_t, precision=jax.lax.Precision.HIGHEST
        )

    scale = 2.0 / n
    a, b = ht_x(windows)
    a, b = scale * a, scale * b
    for _ in range(refine):
        resid = windows - h_c(a, b)
        da, db = ht_x(resid)
        a, b = a + scale * da, b + scale * db
    resid = windows - h_c(a, b)
    return a, b, jnp.sum(resid * resid, axis=-1)


def music_extract(windows: jax.Array, cfg) -> jax.Array:
    """MUSIC extraction over preconditioned windows ``[..., n]``.

    Returns ``[..., top_k, 15]`` stride-15 attrs with method_id=1.
    Power scale is FFT-compatible: a fitted amplitude A maps to
    ``(A*n/2)^2`` (the exact-bin |X_k|^2 of that sinusoid), and the noise
    floor is the per-bin residual power (Parseval), so snr_db/energy_ratio
    are directly comparable with the FFT-ridge method's.
    """
    from wavespec_tpu.extract import Method, _attrs_from_peaks  # circular-safe

    n = cfg.window
    k = cfg.top_k
    m = cfg.ar_order
    p = 2 * k

    # Subspace preconditioning: MUSIC models sinusoids in white-ish noise;
    # raw price is a random walk whose low-frequency power swamps the
    # covariance. High-pass above the analysis band before both the
    # covariance and the amplitude fit, then undo the filter's (exactly
    # known) complex gain at each fitted frequency.
    hp_period = min(int(2 * cfg.max_period), n // 2)
    if cfg.music_highpass:
        windows = ehlers_highpass_detrend(windows, hp_period)

    pseudo, freqs, eigvals = music_pseudospectrum(windows, cfg)
    vals, gidx = _topk_local_maxima(pseudo, k, excl=cfg.music_grid_per_bin)
    freq = freqs[gidx]  # [..., k]
    valid = vals > 0

    grid_step = 1.0 / (cfg.music_grid_per_bin * n)
    freq = _refine_freq(windows, freq, step=grid_step)

    a, b, resid_energy = _sinusoid_fit(windows, freq, valid=valid.astype(jnp.float32))
    amp = jnp.sqrt(a * a + b * b)
    # x = a cos + b sin = amp * sin(w t + psi), psi = atan2(a, b)
    psi = jnp.arctan2(a, b)

    if cfg.music_highpass:
        # Ehlers HP: trend T(z) = c(1+z^-1)/(1-alpha z^-1), H = 1 - T.
        # An input A sin(wt+psi0) emerges as A|H| sin(wt+psi0+argH), so the
        # true parameters are amp/|H| and psi - argH.
        import math

        w_hp = 2.0 * math.pi / hp_period
        alpha = (1.0 - math.sin(w_hp)) / math.cos(w_hp)
        c = (1.0 - alpha) / 2.0
        wrad = 2.0 * jnp.pi * freq
        z_re, z_im = jnp.cos(-wrad), jnp.sin(-wrad)  # z^-1 on unit circle
        num_re, num_im = c * (1.0 + z_re), c * z_im
        den_re, den_im = 1.0 - alpha * z_re, -alpha * z_im
        den2 = den_re * den_re + den_im * den_im
        t_re = (num_re * den_re + num_im * den_im) / den2
        t_im = (num_im * den_re - num_re * den_im) / den2
        h_re, h_im = 1.0 - t_re, -t_im
        h_mag = jnp.sqrt(h_re * h_re + h_im * h_im)
        amp = amp / jnp.maximum(h_mag, 0.05)
        psi = psi - jnp.arctan2(h_im, h_re)
    omega = 2.0 * jnp.pi * freq
    phase_end = omega * (n - 1) + psi

    power = (amp * n / 2.0) ** 2
    noise_floor = jnp.maximum(resid_energy, 1e-30)  # per-bin (Parseval)

    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    n_band = float(k_max - k_min + 1)
    total_inband = jnp.sum(jnp.where(valid, power, 0.0), axis=-1) + noise_floor * n_band

    # Coherence: pseudospectrum concentration at the peak (same +/-2
    # neighborhood definition as the FFT path, on the refined grid).
    g_len = pseudo.shape[-1]
    nb_sum = jnp.zeros_like(vals)
    for off in range(-2, 3):
        nb_sum = nb_sum + jnp.take_along_axis(
            pseudo, jnp.clip(gidx + off, 0, g_len - 1), axis=-1
        )
    coherence = vals / jnp.maximum(nb_sum, 1e-30)

    # Eigen ratio: mean signal eigenvalue / mean noise eigenvalue.
    sig_mean = jnp.mean(eigvals[..., m - p :], axis=-1)
    noi_mean = jnp.maximum(jnp.mean(eigvals[..., : m - p], axis=-1), 1e-30)
    # Cap: noiseless windows drive the noise eigenvalues to f32 underflow.
    ratio = jnp.clip(sig_mean / noi_mean, 0.0, 1e6)
    eigen_ratio = jnp.broadcast_to(ratio[..., None], amp.shape)

    return _attrs_from_peaks(
        freq, amp, phase_end, power, valid, total_inband, noise_floor,
        coherence, eigen_ratio, int(Method.MUSIC), cfg,
    )
