"""Dominant-cycle extraction: the TPU rebuild of `gpu_extract_cycles`.

Reference contract (`Include/imports.mqh:9-18`, decode at
`WaveSpecZZ_1.1.0-gpuopt.mq5:1477-1490`): one call fuses
detrend + taper + rFFT + power spectrum + in-band top-k + per-cycle
attribute computation, and emits a **stride-15 record per cycle**:

    [0] amplitude          price units
    [1] freq               cycles/bar
    [2] period             bars
    [3] phase              rad, instantaneous phase at the newest bar
    [4] eta_bars           bars to next extremum of the cycle
    [5] eta_seconds        eta_bars * sample_rate_seconds
    [6] energy_ratio       0..1, cycle power / total in-band power
    [7] coherence          0..1, spectral concentration at the peak
    [8] snr_db             peak power vs in-band noise floor, dB
    [9] residual_power     0..1, in-band power not captured by top-k
    [10] eigen_ratio       subspace signal/noise eigenvalue ratio (MUSIC);
                           peak-to-runner-up power ratio (FFT ridge)
    [11] score             composite quality in 0..1
    [12] kalman_pred       one-step-ahead predicted cycle value
    [13] eta_confidence    0..1
    [14] method_id         0 = FFT ridge, 1 = MUSIC/ESPRIT

`method`: 0 = FFT ridge, 1 = MUSIC/ESPRIT, -1 = auto (MUSIC with FFT seed,
per `1.1.0:50`). The implementation of the closed DLL is unobservable, so
fields the reference only names (coherence, score, eta_confidence,
kalman_pred) follow the principled definitions documented on
`_attrs_from_peaks` below; the fields with decode-site semantics
(amplitude/freq/period/phase/eta/energy/method) match the reference's
reconstruction math (`1.1.0:1472-1541`) exactly: a cycle is
``amp * sin(phase - omega * k)`` back-propagated k bars.

TPU-first design: the whole extractor is one jitted program; the batch
variant (`gpu_submit_extract_cycles_batch` parity) evaluates all rolling
STFT windows as a single batched MXU DFT — no per-window dispatch.
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial

import jax
import jax.numpy as jnp

from wavespec_tpu.kernels.mxu_fft import rfft_mxu
from wavespec_tpu.ops.detrend import ehlers_highpass_detrend, linear_detrend
from wavespec_tpu.ops.spectrum import band_indices
from wavespec_tpu.ops.windows import WindowType, coherent_gain, window_coefficients

STRIDE = 15

# Attribute field indices (stride-15 record).
AMPLITUDE = 0
FREQ = 1
PERIOD = 2
PHASE = 3
ETA_BARS = 4
ETA_SECONDS = 5
ENERGY_RATIO = 6
COHERENCE = 7
SNR_DB = 8
RESIDUAL_POWER = 9
EIGEN_RATIO = 10
SCORE = 11
KALMAN_PRED = 12
ETA_CONFIDENCE = 13
METHOD_ID = 14


class Method(enum.IntEnum):
    """`method` parameter of gpu_extract_cycles (`1.1.0:50`).

    The reference names method 1 "MUSIC/ESPRIT"; ESPRIT is exposed here
    as its own selector (2) since both subspace estimators exist — their
    stride-15 records all carry method_id=1 (the subspace family) so the
    decode-site MusicOnly gate (`1.1.0:1492-1494`) treats them alike.
    """

    AUTO = -1
    FFT_RIDGE = 0
    MUSIC = 1
    ESPRIT = 2


class DetrendMode(enum.IntEnum):
    """Feed preconditioning before the FFT.

    NONE matches the 1.1.0 nodetrend flagship (`1.1.0:1239-1241`); EHLERS
    is the v7.57 trend high-pass (`...pla-kalman.mq5:3422-3435`); LINEAR is
    the least-squares detrend (BASELINE config #1).
    """

    NONE = 0
    LINEAR = 1
    EHLERS = 2


@dataclasses.dataclass(frozen=True)
class ExtractConfig:
    """Static extraction configuration (hashable -> usable as jit static arg).

    Defaults mirror the flagship inputs (`1.1.0:21-23,49-54`).
    """

    window: int = 4096
    top_k: int = 4
    min_period: float = 9.0
    max_period: float = 200.0
    sample_rate_seconds: float = 60.0
    method: Method = Method.MUSIC
    ar_order: int = 10
    detrend: DetrendMode = DetrendMode.NONE
    taper: WindowType = WindowType.NONE
    trend_period: int = 1024
    # MUSIC frequency-grid refinement factor (grid points per FFT bin).
    music_grid_per_bin: int = 4
    # Covariance decimation for the subspace stage; 0 = auto (see
    # analyze.music._auto_decimation).
    music_decimation: int = 0
    # Internal high-pass above the analysis band before the subspace stage
    # (MUSIC assumes sinusoids + white-ish noise; a raw price random walk
    # does not satisfy that).
    music_highpass: bool = True
    # method=AUTO: keep MUSIC records when the window's signal/noise
    # eigenvalue ratio is at least this; fall back to FFT ridge otherwise.
    auto_eigen_threshold: float = 10.0
    # Optional eigenvalue gate for the MUSIC noise subspace (0 = off; see
    # analyze.music.music_pseudospectrum for why off is the safe default).
    music_signal_gate: float = 0.0
    # Multi-resolution MUSIC sub-band count: 0 = auto (~3x period ratio
    # per band), 1 = single legacy band, n = force n bands.
    music_bands: int = 0
    # Assumed sinusoids per sub-band (signal subspace dim = 2x this, capped
    # by top_k). Small values keep a deep noise projector per band; the
    # cross-band ranking is by fitted power, so top_k total cycles still
    # emerge.
    music_signals_per_band: int = 2
    # Route the ridge path's band DFT through the fused Pallas kernel
    # (kernels.fused_dft). Default ON: measured on the v5e it is 1.98x
    # the XLA four-step single-series and 2.85x multi-series (13.4M vs
    # 4.7M windows/s at 128 series x 4096 pts, benchmarks/
    # bench_multiseries.py) — `extract_cycles_batch` accepts [S, L]
    # directly and flattens series x windows into the kernel grid (do
    # NOT wrap it in jax.vmap instead — a vmapped pallas_call batches
    # poorly). Only takes effect on a non-CPU backend with window >=
    # 1024 and a narrow band (wide bands fall back to the XLA path
    # inside rfft_band_fused_any); CPU/tests always use XLA.
    use_pallas_dft: bool = True
    # Batch ridge path: compute the band spectra of overlapping windows
    # via the overlap-shared hopped DFT (kernels.hopped_dft) — identical
    # spectra (~2e-7 vs float64) with ~window/hop fewer FLOPs and NO
    # [nwin, window] frame materialization (the measured bottleneck of
    # the rolling-STFT workload, benchmarks/profile_ridge.py). Applies in
    # `extract_cycles_batch` when the method is FFT_RIDGE with no
    # per-window preconditioning and `hopped_eligible(window, hop)`;
    # per-window attrs are bitwise append-invariant like the framed path.
    use_hopped_dft: bool = True
    # A/B knob: force the XLA candidate-selection chain for MUSIC on
    # device instead of the fused Pallas selection kernel
    # (kernels.music_select_pallas; bitwise-equal outputs). A config
    # field, not a module global: the config is a static jit argument,
    # so flipping it retraces — no silently-stale compiled programs.
    music_xla_select: bool = False

    def __post_init__(self):
        if self.window & (self.window - 1) or self.window < 16:
            raise ValueError(f"window must be a power of two >= 16, got {self.window}")
        if not 1 <= self.top_k <= 8:
            raise ValueError(f"top_k must be in [1, 8], got {self.top_k}")
        if not 0 < self.min_period < self.max_period:
            raise ValueError(
                f"need 0 < min_period < max_period, got "
                f"[{self.min_period}, {self.max_period}]"
            )
        # The candidate band [ceil(n/maxP), floor(n/minP)] must hold at
        # least top_k bins, or lax.top_k / the MUSIC grids crash deep in
        # tracing with obscure shape errors.
        import math

        k_lo = max(1, math.ceil(self.window / self.max_period))
        k_hi = min(self.window // 2 - 1, math.floor(self.window / self.min_period))
        n_band = k_hi - k_lo + 1
        if n_band < self.top_k:
            raise ValueError(
                f"period band [{self.min_period}, {self.max_period}] holds "
                f"{max(0, n_band)} FFT bins at window {self.window}; "
                f"need >= top_k = {self.top_k}"
            )
        if self.method == Method.ESPRIT and self.ar_order < 2 * self.top_k + 2:
            raise ValueError(
                f"ESPRIT needs ar_order >= 2*top_k+2 = {2 * self.top_k + 2} "
                f"(signal subspace dim 2k plus 2 rows for the rotation), "
                f"got ar_order={self.ar_order}"
            )


def _precondition(windows: jax.Array, cfg: ExtractConfig) -> jax.Array:
    """Detrend + taper a batch of windows ``[..., n]``."""
    if cfg.detrend == DetrendMode.LINEAR:
        windows = linear_detrend(windows)
    elif cfg.detrend == DetrendMode.EHLERS:
        windows = ehlers_highpass_detrend(windows, cfg.trend_period)
    if cfg.taper != WindowType.NONE:
        windows = windows * window_coefficients(cfg.window, cfg.taper, windows.dtype)
    return windows


def _wrap_pi(theta: jax.Array) -> jax.Array:
    """Wrap angle to (-pi, pi]."""
    return theta - 2.0 * jnp.pi * jnp.round(theta / (2.0 * jnp.pi))


def _attrs_from_peaks(
    freq: jax.Array,       # [..., k] cycles/bar
    amp: jax.Array,        # [..., k] price units
    phase_end: jax.Array,  # [..., k] instantaneous phase at newest bar (rad)
    power: jax.Array,      # [..., k] peak power (for ranking/energy)
    valid: jax.Array,      # [..., k] bool
    total_inband: jax.Array,   # [...] total in-band power
    noise_floor: jax.Array,    # [...] per-bin noise power estimate
    coherence: jax.Array,  # [..., k] 0..1 spectral/subspace concentration
    eigen_ratio: jax.Array,  # [..., k]
    method_id: int,
    cfg: ExtractConfig,
) -> jax.Array:
    """Assemble the stride-15 record from per-peak estimates.

    Definitions for fields the reference names but never defines:
    - snr_db        = 10*log10(peak_power / noise_floor)
    - residual      = 1 - sum(top-k power)/total_inband (shared per window)
    - score         = energy_ratio * coherence * snr_lin/(1+snr_lin)
    - eta_confidence= coherence * snr_lin/(1+snr_lin)
    - kalman_pred   = amp * sin(phase + omega)  (one-step-ahead cycle value)
    ETA: sin extrema lie at phase pi/2 + m*pi, so
    eta_bars = ((pi/2 - phase) mod pi) / omega.
    """
    eps = 1e-30
    omega = 2.0 * jnp.pi * freq
    period = jnp.where(freq > 0, 1.0 / jnp.maximum(freq, eps), 0.0)

    total = jnp.maximum(total_inband[..., None], eps)
    energy_ratio = jnp.clip(power / total, 0.0, 1.0)
    residual = jnp.clip(
        1.0
        - _stable_row_sum(jnp.where(valid, power, 0.0)) / jnp.squeeze(total, -1),
        0.0,
        1.0,
    )[..., None] * jnp.ones_like(power)

    snr_lin = power / jnp.maximum(noise_floor[..., None], eps)
    snr_db = 10.0 * jnp.log10(jnp.maximum(snr_lin, eps))
    snr_sig = snr_lin / (1.0 + snr_lin)

    score = jnp.clip(energy_ratio * coherence * snr_sig, 0.0, 1.0)
    eta_conf = jnp.clip(coherence * snr_sig, 0.0, 1.0)

    delta = jnp.mod(jnp.pi / 2.0 - phase_end, jnp.pi)
    eta_bars = jnp.where(omega > 0, delta / jnp.maximum(omega, eps), 0.0)
    eta_seconds = eta_bars * cfg.sample_rate_seconds

    kalman_pred = amp * jnp.sin(phase_end + omega)

    fields = [
        amp,
        freq,
        period,
        _wrap_pi(phase_end),
        eta_bars,
        eta_seconds,
        energy_ratio,
        coherence,
        snr_db,
        residual,
        eigen_ratio,
        score,
        kalman_pred,
        eta_conf,
        jnp.full_like(amp, float(method_id)),
    ]
    attrs = jnp.stack(fields, axis=-1)  # [..., k, 15]
    return jnp.where(valid[..., None], attrs, jnp.zeros_like(attrs))


def _fft_ridge(windows: jax.Array, cfg: ExtractConfig) -> jax.Array:
    """FFT-ridge extraction over a batch of preconditioned windows [..., n].

    Returns [..., top_k, 15].
    """
    n = cfg.window
    # Band-limited DFT: only the low-frequency block covering the candidate
    # band (+2 neighborhood bins) is computed — at the flagship band
    # [9, 200] that is 256 of 2048 bins, an 8x cut in row-DFT FLOPs.
    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    if cfg.use_pallas_dft and n >= 1024 and jax.default_backend() != "cpu":
        from wavespec_tpu.kernels.fused_dft import rfft_band_fused_any

        spec = rfft_band_fused_any(windows, max_bins=k_max + 3)
    else:
        spec = rfft_mxu(windows, max_bins=k_max + 3)
    return _ridge_attrs_from_spec(spec, cfg)


def _stable_row_sum(a: jax.Array) -> jax.Array:
    """Append-invariant sum over the last axis.

    ``jnp.sum``'s reduce emitter changes per-row rounding when the
    leading (row-count) dimension crosses size thresholds, which would
    let appending bars perturb earlier windows' noise-floor-derived
    attrs by ~1 ulp and break the bitwise no-repaint invariant on the
    hopped-DFT ridge path. A fixed-order pairwise halving tree uses only
    elementwise adds — each correctly rounded with an order fixed by the
    graph — so every row's sum is independent of the batch shape by
    construction (a dot-against-ones is NOT safe: the algebraic
    simplifier rewrites it back into a reduce).
    """
    nb = a.shape[-1]
    size = 1 << max(nb - 1, 0).bit_length()
    x = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, size - nb)])
    while size > 1:
        size //= 2
        x = x[..., :size] + x[..., size:]
    return x[..., 0]


def _ridge_attrs_from_spec(spec: jax.Array, cfg: ExtractConfig) -> jax.Array:
    """Ridge attrs from an already-computed band spectrum [..., >=k_max+3]
    (bins 0..k_max+2 of the window rFFT). Shared by the framed path above
    and the overlap-shared hopped DFT in `extract_cycles_batch`."""
    n = cfg.window
    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2

    # Static band slice: the top-k/sum run over the ~200 in-band bins.
    band_p = power[..., k_min : k_max + 1]
    total_inband = _stable_row_sum(band_p)
    n_band = float(k_max - k_min + 1)

    peak_p, band_idx = jax.lax.top_k(band_p, cfg.top_k)  # [..., k]
    idx = band_idx + k_min
    valid = peak_p > 0

    # Noise floor: mean in-band power excluding the top-k peaks.
    picked = _stable_row_sum(peak_p)
    denom = max(n_band - cfg.top_k, 1.0)
    noise_floor = jnp.maximum(total_inband - picked, 0.0) / denom

    kf = idx.astype(power.dtype)
    freq = kf / n

    # Per-peak values via ONE-HOT MATMULS instead of gathers: TPU gathers
    # serialize, while a [.., k, n_band] one-hot contraction rides the MXU.
    # We gather 4 quantities at once (re, im, power, 5-bin neighborhood
    # power) as a single [n_band, 4] stack.
    pad = 2
    band_re = jnp.real(spec)[..., k_min : k_max + 1]
    band_im = jnp.imag(spec)[..., k_min : k_max + 1]
    # 5-bin neighborhood sum over the FULL spectrum then band-sliced, so
    # band-edge neighborhoods see their true out-of-band neighbors.
    padp = jnp.pad(power, [(0, 0)] * (power.ndim - 1) + [(pad, pad)])
    nb_full = sum(
        padp[..., off : off + power.shape[-1]] for off in range(2 * pad + 1)
    )
    band_nb = nb_full[..., k_min : k_max + 1]

    gathered = jnp.stack([band_re, band_im, band_nb], axis=-1)  # [.., nb, 3]
    one_hot = jax.nn.one_hot(band_idx, band_p.shape[-1], dtype=power.dtype)
    vals = jnp.einsum(
        "...kn,...nc->...kc", one_hot, gathered,
        precision=jax.lax.Precision.HIGHEST,
    )
    re_k, im_k, nb_sum = vals[..., 0], vals[..., 1], vals[..., 2]

    # Amplitude: |X_k| scaled by 2/N and the taper's coherent gain.
    cg = coherent_gain(n, cfg.taper)
    amp = 2.0 * jnp.sqrt(re_k * re_k + im_k * im_k) / (n * cg)

    # Phase at the newest bar: x[t] = A sin(omega t + psi) has
    # angle(X_k) = psi - pi/2 at an exact bin, so
    # theta_end = omega*(n-1) + angle(X_k) + pi/2.
    ang = jnp.arctan2(im_k, re_k)
    omega = 2.0 * jnp.pi * freq
    phase_end = _wrap_pi(omega * (n - 1) + ang + jnp.pi / 2.0)

    # Coherence: concentration of power at the peak vs its +/-2-bin
    # neighborhood (1 = isolated line).
    coherence = peak_p / jnp.maximum(nb_sum, 1e-30)

    # Peak-to-runner-up ratio stands in for the eigen ratio on this method.
    runner = jnp.maximum(
        jnp.concatenate([peak_p[..., 1:], noise_floor[..., None]], axis=-1), 1e-30
    )
    eigen_ratio = peak_p / runner

    return _attrs_from_peaks(
        freq, amp, phase_end, peak_p, valid, total_inband, noise_floor,
        coherence, eigen_ratio, int(Method.FFT_RIDGE), cfg,
    )


def _frame_block(series: jax.Array, length: int, stride: int, n_frames: int) -> jax.Array:
    """Frames at multiples of `stride`: ``F[m] = series[m*stride : m*stride+length]``.

    Views the (zero-padded) series as ``B[q, stride]`` blocks; frame m is
    the concatenation of rows ``B[m : m+ceil(length/stride)]``, so the
    whole matrix is ``ceil(length/stride)`` CONTIGUOUS row-block slices
    concatenated along the column axis — pure HBM-bandwidth copies, no
    gather, and no divisibility requirement between length and stride.
    Padding can only land in trimmed columns (>= length) of the last rows.
    """
    n_parts = -(-length // stride)
    total = (n_frames - 1 + n_parts) * stride
    n = series.shape[-1]
    if total > n:
        series = jnp.pad(series, (0, total - n))
    b = series[:total].reshape(-1, stride)
    parts = [b[c : c + n_frames] for c in range(n_parts)]
    return jnp.concatenate(parts, axis=1)[:, :length]


def frame_series(series: jax.Array, window: int, hop: int) -> jax.Array:
    """Strided window matrix ``[..., nwin, window]`` from a ``[..., n]``
    series (leading dims are vmapped — slices, so the batch lowering is
    exact).

    TPU note: a naive ``series[idx]`` lowers to a general gather that costs
    ~100x the rest of the extraction pipeline (144 ms vs ~0 at the hop=1
    warmup scale). Every hop in [1, len] instead lowers to static slices:

    - hop >= 64: direct block framing with block size = hop
      (``ceil(window/hop)`` contiguous row slices, see `_frame_block`);
    - hop < 64: two-level — coarse frames of length
      ``window + (per-1)*hop`` at stride ``H = per*hop`` (per = ceil(64/hop),
      so H is in [64, 127]) via `_frame_block`, then each fine offset o is a
      static column slice ``coarse[:, o*hop : o*hop+window]``.

    Neither level needs any divisibility between window and hop, so the
    gather fallback of the arbitrary-hop batch contract
    (`Include/imports.mqh:15-17`) is gone entirely.
    """
    if series.ndim > 1:
        fn = lambda s: frame_series(s, window, hop)
        for _ in range(series.ndim - 1):
            fn = jax.vmap(fn)
        return fn(series)
    n = series.shape[-1]
    nwin = 1 + (n - window) // hop
    series = series.astype(jnp.float32)
    if hop >= 64:
        return _frame_block(series, window, hop, nwin)

    per = -(-64 // hop)
    coarse_len = window + (per - 1) * hop
    m_max = (nwin - 1) // per
    coarse = _frame_block(series, coarse_len, per * hop, m_max + 1)
    offs = [coarse[:, o * hop : o * hop + window] for o in range(per)]
    stacked = jnp.stack(offs, axis=1)  # [m, per, window]
    return stacked.reshape(-1, window)[:nwin]


@partial(jax.jit, static_argnames=("window", "hop", "trend_period"))
def frame_highpassed(
    series: jax.Array, window: int, hop: int, trend_period: int
) -> jax.Array:
    """Per-window COLD-START Ehlers high-pass of every rolling window —
    exactly, from ONE series-level filter plus a rank-1 correction.

    The reference detrends each window's copy independently
    (`...pla-kalman.mq5:3422-3435`), so the one-pole filter cold-starts
    at every window: naively that is an associative scan over
    [nwin, window] (chip-measured 17.3 ms of the 37 ms v757 spectral
    stage at B=64 x 512 frames, hop=1 — pure HBM passes). But the
    recursion differs from the series-level filter ONLY in its first
    step, and a one-pole filter propagates a single-sample difference as
    a geometric decay:

        trend_w[j] = trend_s[s0+j] + alpha^j * (c*2*p[s0] - trend_s[s0])
        detr_w[j]  = hp_s[s0+j]    - alpha^j * (c*2*p[s0] - trend_s[s0])

    so every window is the framed series-level output minus an outer
    product delta_w * alpha^j — one length-L scan + one fused FMA pass,
    identical to the per-window recursion up to f32 rounding (~1e-6
    relative; window 0 has delta exactly 0). `alpha^j` is tabulated in
    float64 at trace time.
    """
    import numpy as _np

    wf = 2.0 * _np.pi / trend_period
    alpha = (1.0 - _np.sin(wf)) / _np.cos(wf)
    c = (1.0 - alpha) / 2.0
    aj = jnp.asarray((alpha ** _np.arange(window)).astype(_np.float32))

    series = series.astype(jnp.float32)
    hp_s = ehlers_highpass_detrend(series, trend_period)
    trend_s = series - hp_s
    f = frame_series(hp_s, window, hop)                   # [..., nwin, n]
    nwin = f.shape[-2]
    p0 = series[..., ::hop][..., :nwin]
    t0 = trend_s[..., ::hop][..., :nwin]
    delta = jnp.float32(2.0 * c) * p0 - t0                # [..., nwin]
    return f - delta[..., None] * aj


def _extract_windows(windows: jax.Array, cfg: ExtractConfig) -> jax.Array:
    """Dispatch preconditioned windows to the configured method.

    AUTO (`method=-1`, `1.1.0:50`): run both estimators; per cycle, keep
    the MUSIC record when the subspace is confident (window eigen_ratio
    >= `auto_eigen_threshold`), else the FFT-ridge record — each row keeps
    its true method_id so the decode-site MusicOnly gate still applies.
    """
    if cfg.method == Method.FFT_RIDGE:
        return _fft_ridge(windows, cfg)
    if cfg.method == Method.ESPRIT:
        from wavespec_tpu.analyze.esprit import esprit_extract

        return esprit_extract(windows, cfg)
    from wavespec_tpu.analyze.music import music_extract

    if cfg.method == Method.MUSIC:
        return music_extract(windows, cfg)
    music = music_extract(windows, cfg)
    ridge = _fft_ridge(windows, cfg)
    confident = music[..., :, EIGEN_RATIO] >= cfg.auto_eigen_threshold
    return jnp.where(confident[..., None], music, ridge)


@partial(jax.jit, static_argnames=("cfg",))
def extract_cycles(series: jax.Array, cfg: ExtractConfig = ExtractConfig()) -> jax.Array:
    """Single-window extraction: last `cfg.window` samples of `series`.

    Parity: `gpu_extract_cycles` (`Include/imports.mqh:9-11`) — series is
    chronological (oldest first), the window is the trailing slice.
    Returns `[top_k, 15]` float32 attrs.
    """
    win = series[..., -cfg.window:].astype(jnp.float32)
    win = _precondition(win, cfg)
    return _extract_windows(win, cfg)


@partial(jax.jit, static_argnames=("cfg", "hop"))
def extract_cycles_batch(
    series: jax.Array, cfg: ExtractConfig = ExtractConfig(), hop: int = 1
) -> jax.Array:
    """Rolling-STFT batch extraction over one series — or many.

    Parity: `gpu_submit_extract_cycles_batch` (`Include/imports.mqh:15-17`);
    ``nwin = 1 + (len - window)/hop`` windows (`1.1.0:1014-1022`), window w
    covering ``series[w*hop : w*hop + window]``. All windows are evaluated
    by ONE batched MXU DFT — the per-window job queue of the reference
    collapses into a single fused device program.

    `series` may carry leading batch dims (``[S, L]`` multi-symbol): the
    series axis rides through framing/preconditioning as a plain batch
    dim and the spectral core sees a flat series x windows batch — in
    particular the Pallas band DFT tiles its grid over ALL windows of
    all series (batch-native, unlike a vmapped pallas_call).

    Returns `[..., nwin, top_k, 15]`.
    """
    if (
        cfg.method == Method.FFT_RIDGE
        and cfg.use_hopped_dft
        and cfg.detrend == DetrendMode.NONE
        and cfg.taper == WindowType.NONE
    ):
        from wavespec_tpu.kernels.hopped_dft import hopped_eligible, rfft_band_hopped

        if hopped_eligible(cfg.window, hop):
            # Overlap-shared ridge fast path: the band spectra of all
            # rolling windows come from per-128-sample-row partial
            # transforms shared across overlapping windows — no frame
            # matrix, ~window/hop fewer FLOPs, same spectra to ~2e-7.
            _, k_max = band_indices(cfg.window, cfg.min_period, cfg.max_period)
            spec = rfft_band_hopped(
                series.astype(jnp.float32), cfg.window, hop, k_max + 3
            )
            return _ridge_attrs_from_spec(spec, cfg)
    if (
        cfg.method == Method.ESPRIT
        and cfg.music_highpass
        and cfg.detrend == DetrendMode.NONE
        and cfg.taper == WindowType.NONE
    ):
        # Same series-level warm-filter amortization as the MUSIC fast
        # path below (ESPRIT shares the preconditioning contract).
        from wavespec_tpu.analyze.esprit import esprit_extract
        from wavespec_tpu.analyze.music import music_hp_period
        from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu

        series = series.astype(jnp.float32)
        series = series - series[..., :1]
        hp_series = ehlers_highpass_detrend_mxu(
            series, (music_hp_period(cfg),)
        )[..., 0, :]
        windows = frame_series(hp_series, cfg.window, hop)
        return esprit_extract(windows, cfg, pre_highpassed=True)
    if (
        cfg.method == Method.MUSIC
        and cfg.music_highpass
        and cfg.detrend == DetrendMode.NONE
        and cfg.taper == WindowType.NONE
    ):
        # Flagship fast path: the MUSIC preconditioning high-pass runs
        # ONCE over the unframed series instead of once per overlapping
        # window — one length-L scan replaces nwin length-n scans (a
        # ~0.45 ms cut at the 512-window warmup scale), and every window
        # starts with a warm filter state instead of a cold transient.
        # Only valid when no per-window preconditioning (detrend/taper)
        # would otherwise run between the filter and the window.
        from wavespec_tpu.analyze.music import (
            band_precondition_windows,
            music_extract,
            music_hp_period,
        )

        # Anchor on the first sample BEFORE the series-level filter, exactly
        # as music_extract's pre_highpassed=False branch does per window: a
        # ~100-level price seeds the cold-start one-pole HP with a
        # level-sized decaying exponential that dominates the covariance of
        # every window overlapping the first ~3*hp_period bars (and
        # OnlineDriver cold-starts the filter at every update() span start).
        from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu

        series = series.astype(jnp.float32)
        series = series - series[..., :1]
        # MXU-Toeplitz form of the one-pole filter: the associative-scan
        # lowering is launch-bound on the v5e (74.6 us vs 4.0 us for the
        # flagship 37k-sample series; tolerance-gated path only).
        hp_series = ehlers_highpass_detrend_mxu(
            series, (music_hp_period(cfg),)
        )[..., 0, :]
        windows = frame_series(hp_series, cfg.window, hop)
        band_w = band_precondition_windows(hp_series, cfg, hop)
        # Ridge-seed spectra via the overlap-shared hopped DFT when the
        # hop allows it: same band spectra as the framed MXU DFT to
        # ~2e-7 at ~window/hop fewer FLOPs and no frame re-read — the
        # framed DFT was ~26% of the flagship batch budget on-chip.
        seed_spec = None
        if cfg.use_hopped_dft:
            from wavespec_tpu.kernels.hopped_dft import (
                hopped_eligible,
                rfft_band_hopped,
            )

            if hopped_eligible(cfg.window, hop):
                _, k_max_fb = band_indices(
                    cfg.window, cfg.min_period, cfg.max_period
                )
                seed_spec = rfft_band_hopped(
                    hp_series, cfg.window, hop, k_max_fb + 1
                )
        return music_extract(
            windows, cfg, pre_highpassed=True, band_windows=band_w,
            seed_spec=seed_spec,
        )
    if cfg.detrend == DetrendMode.EHLERS:
        # Rank-1 identity: per-window cold-start filtering without the
        # [nwin, window] associative scan (see frame_highpassed).
        windows = frame_highpassed(series, cfg.window, hop, cfg.trend_period)
        if cfg.taper != WindowType.NONE:
            windows = windows * window_coefficients(
                cfg.window, cfg.taper, windows.dtype
            )
    else:
        windows = frame_series(series, cfg.window, hop)
        windows = _precondition(windows, cfg)
    return _extract_windows(windows, cfg)
