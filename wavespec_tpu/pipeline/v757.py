"""The v7.57 full analytics pipeline (the `1.0.3-pla-kalman` variant).

Rebuild of the most complete CPU analytics path in the reference
(`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5` OnCalculate, SURVEY §3.3),
end to end:

  per bar: price source -> Kalman 4D -> trend high-pass -> taper ->
  rFFT -> power spectrum -> candidate band scan -> tracker matching ->
  stable slots -> leakage detection -> per-slot biquad band-pass
  reconstruction -> ETA blend/state -> FollowFirst signals -> states/CSV.

TPU formulation: the per-bar spectral work for ALL bars runs as one
batched MXU program (`extract`-style framing); the sequential state
machines (trackers, ETA, signals) run as `lax.scan`s over the frame axis;
the biquad reconstruction is an associative scan vmapped over the 12
slots. One call analyzes an entire history.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from wavespec_tpu.analyze.eta import EtaConfig, EtaMode, eta_state_machine, leak_eta_bars
from wavespec_tpu.analyze.trackers import TrackerConfig, track_frames
from wavespec_tpu.extract import DetrendMode, frame_highpassed, frame_series
from wavespec_tpu.filters.biquad import bandpass_cycle
from wavespec_tpu.filters.kalman4d import Kalman4DConfig, kalman4d_filter
from wavespec_tpu.kernels.mxu_fft import rfft_mxu
from wavespec_tpu.ops.detrend import (
    ehlers_highpass_blocked,
    ehlers_highpass_detrend,
)
from wavespec_tpu.ops.gather import take_last
from wavespec_tpu.ops.phase import GROUP_DELAY_CLAMP, fft_phase
from wavespec_tpu.ops.spectrum import band_indices
from wavespec_tpu.ops.windows import WindowType, window_coefficients
from wavespec_tpu.signals.followfirst import FollowFirstConfig, followfirst_signals


@dataclasses.dataclass(frozen=True)
class V757Config:
    """Defaults = `...pla-kalman.mq5` inputs (`:801-842`, `:884-901`)."""

    window: int = 4096            # InpFFTWindow (v7.57 default 16384; 4096 practical)
    min_period: float = 18.0
    max_period: float = 52.0
    trend_period: int = 1024
    bandwidth: float = 0.5        # biquad band-pass octaves
    taper: WindowType = WindowType.BLACKMAN
    detrend: DetrendMode = DetrendMode.EHLERS
    # Candidates fed to the trackers per frame. 0 = reference-exact: ALL
    # in-band bins in ascending-bin order (`:3505-3516` scans every j in
    # [ceil(N/maxP), floor(N/minP)] — no top-k pre-selection); n > 0 =
    # strongest n bins (a documented deviation that keeps the tracker
    # candidate set spectrally meaningful at large windows).
    n_candidates: int = 24
    # hop=1 band spectra via the chunked sliding DFT (one anchor DFT per
    # 128 frames + causal-conv matmuls, `kernels/sliding_dft.py`) instead
    # of per-window DFTs — ~14x fewer MACs, no [T, window] frame matrix.
    # None = auto: sliding on real devices, framed on CPU — CPU XLA's dot
    # reduction order is batch-shape-dependent at these contraction sizes
    # (measured ~2e-5 drift between [64,·]@ and [8,·]@ the same rows),
    # which breaks the bitwise sharded-vs-single parity the CPU tests
    # gate. True forces sliding everywhere (the oracle gates this config
    # on CPU); False forces framed. Ineligible shapes (hop > 1, Bartlett
    # taper, LINEAR detrend) always use the framed path.
    sliding_spectral: bool | None = None
    # Bitwise chunk/resume-invariant arithmetic (the v757 online driver's
    # contract, `pipeline.online.V757OnlineDriver`): the spectral stage
    # computes hop-1 band spectra in canonical 128-frame blocks (each
    # block's DFT/conv shapes are FIXED, so recomputing one block in a
    # live tick reproduces the one-shot value bit-for-bit on every
    # backend), the Ehlers detrend runs block-sequentially
    # (`ops.detrend.ehlers_highpass_blocked` — resumable at 128-sample
    # boundaries), and the CPU biquad uses the sequential recursion
    # (`filters.biquad sequential=True`). Outputs match resumable=False
    # to f32 rounding (same math, different summation grouping); discrete
    # outputs can differ where near-tie candidate ranks flip (same class
    # of divergence the oracle gates measure). hop must be 1.
    resumable: bool = False
    tracker: TrackerConfig = TrackerConfig()
    eta_mode: EtaMode = EtaMode.PHASE_NEXT_EXTREMUM
    seconds_per_bar: float = 60.0
    enable_kalman: bool = True
    kalman: Kalman4DConfig = Kalman4DConfig()
    followfirst: FollowFirstConfig = FollowFirstConfig()


def _gd_lo(cfg: V757Config) -> int:
    """First absolute bin of the band-sliced gd/gd_idx arrays returned
    by `_spectral_frames` (slice [k_min-1, min(k_max+2, n_bins-1)]);
    picks subtract this offset."""
    k_min, _ = band_indices(cfg.window, cfg.min_period, cfg.max_period)
    return max(k_min - 1, 0)


# Canonical resumable spectral block: hop-1 frames per fixed-shape DFT
# program (`V757Config.resumable`). 128 matches `sliding_band_spec`'s
# internal chunk, so one block is exactly one anchor DFT + one causal-conv
# slab — and the online driver recomputes at most one block per tick.
FRAME_BLOCK = 128


def _use_sliding(cfg: V757Config, hop: int) -> bool:
    from wavespec_tpu.kernels.sliding_dft import taper_harmonics

    want = (
        cfg.sliding_spectral
        if cfg.sliding_spectral is not None
        else jax.default_backend() != "cpu"
    )
    return (
        want
        and hop == 1
        and cfg.detrend in (DetrendMode.NONE, DetrendMode.EHLERS)
        and taper_harmonics(cfg.taper) is not None
    )


def _ehlers_consts(trend_period: int) -> tuple[float, float]:
    """(alpha, c2 = 1 - alpha = 2c) of the reference's one-pole trend
    filter, in float64 (`...pla-kalman.mq5:3422-3435`)."""
    import numpy as _np

    wf = 2.0 * _np.pi / trend_period
    alpha = (1.0 - _np.sin(wf)) / _np.cos(wf)
    return alpha, 1.0 - alpha


def _resumable_block_spec(seg, hp_seg, trend_seg, cfg: V757Config):
    """Band spectrum of the FRAME_BLOCK hop-1 frames starting at
    ``seg[..., 0]`` — the canonical fixed-shape arithmetic of the
    `resumable` mode.

    ``seg``/``hp_seg``/``trend_seg``: [..., window + FRAME_BLOCK - 1]
    raw samples, block-resumable Ehlers output, and its trend
    (``trend_seg`` is only read for EHLERS detrend; pass ``seg`` as a
    placeholder otherwise). Every DFT/conv in here sees the same operand
    shapes no matter where the block sits in the stream or how long the
    history is, so a live tick recomputing its current block reproduces
    the one-shot values bit-for-bit — matmul tiling/reduction order is a
    function of operand shape, which this pins (prefix-invariance of the
    per-row contraction alone is backend-dependent; fixed shapes are not).
    """
    n = cfg.window
    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    n_bins = min(k_max + 3, n // 2)
    fb = FRAME_BLOCK
    from wavespec_tpu.kernels.sliding_dft import (
        sliding_band_spec, tapered_dft_of,
    )

    # Context-pinning: CPU XLA forms (or doesn't form) FMAs for
    # mul-then-add patterns depending on the surrounding fusion — the
    # SAME `spec - delta*tg` correction measured 1e-7-relative different
    # inside a lax.map body vs standalone. optimization_barrier pins the
    # product to its own rounding so every context computes the block
    # identically (the whole point of this function).
    barrier = jax.lax.optimization_barrier

    if _use_sliding(cfg, 1):
        # k_lo: every downstream read sits in [k_min-1, k_max+2]
        # (`_cands_and_gd`), so the sub-band bins are never computed —
        # they come back as exact zeros (~1/3 of the anchor FLOPs at the
        # flagship band). Same k_lo on every v757 spectral site keeps the
        # chunked==one-shot bitwise contract comparing identical programs.
        spec = sliding_band_spec(
            hp_seg, n, n_bins, cfg.taper, chunk=fb, pin=True,
            k_lo=_gd_lo(cfg),
        )
        # pin the raw sliding output FIRST: its internal add chain fused
        # with the correction subtract rounds context-dependently
        spec_re = barrier(jnp.real(spec))
        spec_im = barrier(jnp.imag(spec))
        if cfg.detrend == DetrendMode.EHLERS:
            import numpy as _np

            alpha, c2 = _ehlers_consts(cfg.trend_period)
            delta = barrier(
                jnp.float32(c2) * seg[..., :fb] - trend_seg[..., :fb]
            )
            tg = jnp.asarray(tapered_dft_of(
                alpha ** _np.arange(n, dtype=_np.float64), n_bins, cfg.taper
            ))
            spec_re = spec_re - barrier(delta[..., None] * jnp.real(tg))
            spec_im = spec_im - barrier(delta[..., None] * jnp.imag(tg))
        return jax.lax.complex(barrier(spec_re), barrier(spec_im))

    # framed branch: per-window DFT of the block's 128 windows
    windows = frame_series(hp_seg, n, 1)[..., :fb, :]
    if cfg.detrend == DetrendMode.EHLERS:
        import numpy as _np

        alpha, c2 = _ehlers_consts(cfg.trend_period)
        aj = jnp.asarray((alpha ** _np.arange(n)).astype(_np.float32))
        delta = barrier(
            jnp.float32(c2) * seg[..., :fb] - trend_seg[..., :fb]
        )
        windows = windows - barrier(delta[..., None] * aj)
    if cfg.taper != WindowType.NONE:
        windows = barrier(
            windows * window_coefficients(n, cfg.taper, windows.dtype)
        )
    if jax.default_backend() != "cpu":
        from wavespec_tpu.kernels.fused_dft import rfft_band_fused_any

        spec = rfft_band_fused_any(windows, n_bins)
    else:
        spec = rfft_mxu(windows, max_bins=n_bins)[..., :n_bins]
    return jax.lax.complex(
        barrier(jnp.real(spec)), barrier(jnp.imag(spec))
    )


def _resumable_hp(series: jax.Array, cfg: V757Config):
    """(hp, trend) of the resumable pipeline: block-sequential Ehlers
    (bitwise-resumable at FRAME_BLOCK boundaries) or passthrough."""
    if cfg.detrend == DetrendMode.EHLERS:
        hp_s = ehlers_highpass_blocked(
            series, cfg.trend_period, block=FRAME_BLOCK
        )
        return hp_s, series - hp_s
    if cfg.detrend == DetrendMode.NONE:
        return series, series
    raise ValueError(
        f"resumable v757 supports EHLERS/NONE detrend, got {cfg.detrend}"
    )


def _band_spec_resumable(series: jax.Array, cfg: V757Config) -> jax.Array:
    """One-shot spectra through the canonical block arithmetic: what the
    online driver's chunked recomputation must (and does, bitwise) equal."""
    n = cfg.window
    fb = FRAME_BLOCK
    hp_s, trend_s = _resumable_hp(series, cfg)
    lead = series.shape[:-1]
    t_frames = series.shape[-1] - n + 1
    nblk = -(-t_frames // fb)
    seg_len = n + fb - 1
    want = (nblk - 1) * fb + seg_len

    def segs(x):
        short = want - x.shape[-1]
        if short > 0:
            x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, short)])
        f = frame_series(x[..., :want], seg_len, fb)
        return jnp.moveaxis(f, -2, 0)                 # [nblk, ..., seg_len]

    xs = (segs(series), segs(hp_s), segs(trend_s))

    def block(t):
        s = _resumable_block_spec(t[0], t[1], t[2], cfg)
        return jnp.real(s), jnp.imag(s)  # axon: no complex transpose

    re, im = jax.lax.map(block, xs)                    # [nblk, ..., fb, K]

    def flat(x):
        x = jnp.moveaxis(x, 0, -3)
        return x.reshape(*lead, nblk * fb, x.shape[-1])[..., :t_frames, :]

    return jax.lax.complex(flat(re), flat(im))


@partial(jax.jit, static_argnames=("cfg", "hop"))
def _spectral_frames(series: jax.Array, cfg: V757Config, hop: int):
    """Batched per-frame spectrum work: candidates + group delay at bins.

    `series` may carry leading batch dims ([B, L] multi-symbol): framing,
    filtering, and the fused band DFT are all batch-native, so the batch
    path calls this ONCE instead of vmapping it (a vmapped pallas_call
    serializes the symbol axis into the kernel grid).

    Band-limited: only bins [0, k_max+2] are computed (`rfft_mxu
    max_bins`) — every downstream read (candidates in [k_min, k_max],
    group delay at slot/leak bins <= k_max, whose central differences
    need one neighbor) lives there, and at the flagship band the cut is
    ~9x of the DFT + phase/unwrap work. Absolute bin indexing is
    preserved (the array is a prefix of the full spectrum), and the
    REALFFT delta_omega constant still uses the FULL n/2 length per the
    reference's convention.
    """
    n = cfg.window
    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    n_bins = min(k_max + 3, n // 2)
    from wavespec_tpu.kernels.sliding_dft import (
        sliding_band_spec, taper_harmonics, tapered_dft_of,
    )

    if cfg.resumable:
        if hop != 1:
            raise ValueError("resumable v757 requires hop=1")
        spec = _band_spec_resumable(series.astype(jnp.float32), cfg)
        return _cands_and_gd(spec, cfg)

    want_sliding = (
        cfg.sliding_spectral
        if cfg.sliding_spectral is not None
        else jax.default_backend() != "cpu"
    )
    sliding = (
        want_sliding
        and hop == 1
        and cfg.detrend in (DetrendMode.NONE, DetrendMode.EHLERS)
        and taper_harmonics(cfg.taper) is not None
    )
    if sliding:
        # Chunked sliding band DFT (kernels/sliding_dft.py): per-frame cost
        # N*K*M/C + C*K MACs vs the framed path's N*K, and the [T, window]
        # frame matrix never exists. The Ehlers per-window cold-start
        # filter rides the same rank-1 identity as `frame_highpassed`:
        # tapered_spec(window_n) = tapered_spec(framed hp series)
        #                        - delta_n * DFT(taper * alpha^j).
        series = series.astype(jnp.float32)
        if cfg.detrend == DetrendMode.EHLERS:
            import numpy as _np

            wf = 2.0 * _np.pi / cfg.trend_period
            alpha = (1.0 - _np.sin(wf)) / _np.cos(wf)
            c2 = 1.0 - alpha  # = 2*c
            hp_s = ehlers_highpass_detrend(series, cfg.trend_period)
            spec = sliding_band_spec(hp_s, n, n_bins, cfg.taper,
                                     k_lo=_gd_lo(cfg))
            t_frames = spec.shape[-2]
            trend_s = series - hp_s
            delta = (
                jnp.float32(c2) * series[..., :t_frames]
                - trend_s[..., :t_frames]
            )
            tg = jnp.asarray(tapered_dft_of(
                alpha ** _np.arange(n, dtype=_np.float64), n_bins, cfg.taper
            ))
            spec = spec - delta[..., None] * tg
        else:
            spec = sliding_band_spec(series, n, n_bins, cfg.taper,
                                     k_lo=_gd_lo(cfg))
    else:
        if cfg.detrend == DetrendMode.EHLERS:
            # Rank-1 identity (extract.frame_highpassed): the per-window
            # cold-start filter as one series-level scan + an alpha^j
            # correction — the [nwin, n] associative scan was 17.3 ms of
            # the 37 ms B=64 spectral stage on-chip.
            windows = frame_highpassed(series, n, hop, cfg.trend_period)
        else:
            windows = frame_series(series, n, hop)
        if cfg.taper != WindowType.NONE:
            windows = windows * window_coefficients(n, cfg.taper, windows.dtype)
        if jax.default_backend() != "cpu":
            # Fused Pallas band DFT: the four-step materializes full-width
            # complex intermediates (HBM-bound, 17 ms of the B=64 spectral
            # stage); the band kernel computes just the n_bins prefix.
            from wavespec_tpu.kernels.fused_dft import rfft_band_fused_any

            spec = rfft_band_fused_any(windows, n_bins)
        else:
            spec = rfft_mxu(windows, max_bins=n_bins)[..., :n_bins]
    return _cands_and_gd(spec, cfg)


def _cands_and_gd(spec: jax.Array, cfg: V757Config):
    """Candidates + group delay from band spectra ``[..., T, n_bins]``.

    Strictly per-frame (row top-k, elementwise phase, bin-axis diffs), so
    slicing frame rows out of a longer run and feeding them here yields
    bitwise-identical values — the online driver leans on this to share
    the code with the one-shot path.
    """
    n = cfg.window
    k_min, k_max = band_indices(n, cfg.min_period, cfg.max_period)
    n_bins = spec.shape[-1]
    # Each square pinned to its own rounding (optimization_barrier): CPU
    # XLA otherwise forms re*re + im*im into an FMA or not depending on
    # the surrounding fusion, which broke the online driver's bitwise
    # slot_power parity between [r, K] and [T, K] program shapes.
    power = jax.lax.optimization_barrier(
        jnp.real(spec) * jnp.real(spec)
    ) + jax.lax.optimization_barrier(jnp.imag(spec) * jnp.imag(spec))

    if cfg.n_candidates == 0:
        # Reference-exact: every in-band bin, ascending index (`:3505-3516`).
        idx = jnp.arange(k_min, min(k_max + 1, n // 2), dtype=jnp.int32)
        cand_idx = jnp.broadcast_to(idx, (*power.shape[:-1], idx.shape[0]))
        cand_power = power[..., k_min : min(k_max + 1, n // 2)]
        cand_valid = jnp.ones_like(cand_power, bool)
        cand_period = n / cand_idx.astype(jnp.float32)
    else:
        # top_k over the SLICED band, not a zero-masked full prefix: the
        # sort pays per column, and [k_min, k_max] is ~2/3 of n_bins at
        # the flagship band (chip: 2.66 ms -> ~1.7 ms at B=64 x 512).
        hi = min(k_max + 1, n // 2)
        inband = power[..., k_min:hi]
        # Clamp to the bin count: requesting more candidates than bins
        # previously just yielded zero-power (invalid) rows — identical
        # tracker behavior, smaller J.
        cand_power, cand_idx = jax.lax.top_k(
            inband, min(cfg.n_candidates, hi - k_min)
        )
        cand_idx = cand_idx + k_min
        cand_valid = cand_power > 0
        cand_period = jnp.where(
            cand_valid, n / jnp.maximum(cand_idx.astype(jnp.float32), 1.0), 0.0
        )

    # Group delay via wrapped phase DIFFS — unwrap corrections telescope
    # (uw[k+1]-uw[k] is exactly the principal-folded raw difference), so
    # the unwrap cumsum and the uw materialization are skipped.
    # Evaluating ONLY at the <= 24 slot/leak bins instead was measured
    # catastrophically WORSE on-chip: a take_along_axis on the complex
    # spec is a general gather (+31 ms at B=64 vs ~1.4 ms for the plane
    # + two real-array gathers). The plane IS band-sliced though: every
    # downstream pick reads bins in [k_min, k_max] (slot/leak fft
    # indices), which are INTERIOR to a [k_min-1, k_max+1] slice, so the
    # arctan2/diff work shrinks ~1/3 with bitwise-identical picks; the
    # returned gd/gd_idx arrays are indexed by (bin - gd_lo), see
    # `_gd_lo` (used by `_v757_tail`).
    from wavespec_tpu.ops.phase import _wrap_principal

    lo = _gd_lo(cfg)
    hi_p = min(k_max + 2, n_bins - 1)       # last phase bin (inclusive)
    ph = fft_phase(spec[..., lo : hi_p + 1])
    d = _wrap_principal(jnp.diff(ph, axis=-1))          # uw[k+1]-uw[k]
    interior = 0.5 * (d[..., 1:] + d[..., :-1])
    g = jnp.concatenate(
        [d[..., :1], interior, d[..., -1:]], axis=-1
    )  # rows 1..w-2 == jnp.gradient(unwrap_phase(full ph))[lo+1 : hi_p]
    gd_idx = jnp.clip(-g, -GROUP_DELAY_CLAMP, GROUP_DELAY_CLAMP)
    # Two reference conventions (see ops.phase):
    # - `fft_group_delay` (indexed by CalculateScientificETASeconds in
    #   HYBRID mode) is the INDEX-space gradient clamped +/-100;
    # - ComputeETA_RealFFT recomputes tau_g = -dphi/delta_omega with
    #   delta_omega = 2*pi/(N/2) — the array LENGTH, not the FFT size —
    #   and no +/-100 clamp (`...pla-kalman.mq5:1366-1406`).
    if cfg.eta_mode == EtaMode.REALFFT:
        gd = -g / (2.0 * jnp.pi / (n // 2))  # FULL length per `:1387`
    elif cfg.eta_mode == EtaMode.HYBRID:
        gd = gd_idx
    else:
        gd = jnp.zeros_like(gd_idx)  # PHASE mode never reads it
    return cand_period, cand_power, cand_idx, cand_valid, gd, gd_idx


def _v757_device(
    series: jax.Array,
    cfg: V757Config = V757Config(),
    hop: int = 1,
) -> dict[str, jax.Array]:
    """Device-pure v7.57 core over one 1-D series: all outputs on device.

    The batch axis rides on top of this via `jax.vmap` (`run_v757_batch`)
    and `shard_map` over the mesh data axis (`run_v757_batch_sharded`) —
    the per-frame state machines are pure `lax.scan`s, so the symbol axis
    vectorizes with no cross-symbol interaction.
    """
    # 1) batched spectral frames + candidates
    spectral = _spectral_frames(series, cfg, hop)

    # 2) trackers / stable slots / leaks (one Pallas launch on device;
    # scan over frames on CPU — see `track_frames`)
    slots, _state = track_frames(
        spectral[0], spectral[1], spectral[2], spectral[3], cfg=cfg.tracker
    )
    return _v757_tail(series, spectral, slots, cfg, hop)


def _v757_tail(
    series: jax.Array, spectral, slots, cfg: V757Config, hop: int
) -> dict[str, jax.Array]:
    """Stages 3-6 (biquad, ETA, signals, Kalman), batch-native.

    `series` may carry leading symbol dims. On a real device the four
    per-frame state machines run as ONE Pallas launch
    (`kernels.v757_tail_pallas` — chip-measured at B=64 x 512 frames the
    XLA scans cost biquad +3.8 / eta +6.0 / kalman +1.5 ms of pure
    per-step dispatch latency); CPU keeps the XLA scan stack. The two
    paths agree to f32 noise on float outputs and exactly on discrete
    ones (tests/test_v757_tail_pallas.py) — the kernel's sequential
    biquad recurrence is, if anything, closer to the reference's per-bar
    loop than the associative-scan formulation."""
    cand_period = spectral[0]
    t_frames = cand_period.shape[-2]
    lead = series.shape[:-1]

    # frame-aligned price track + the two REAL prices before frame 0
    # (`CalculateCycle` runs over the global close array)
    newest = series[..., cfg.window - 1 :: hop][..., :t_frames]
    start = cfg.window - 1
    prev = [
        series[..., start - k * hop : start - k * hop + 1]
        if start - k * hop >= 0
        else jnp.zeros((*lead, 1), jnp.float32)
        for k in (2, 1)
    ]
    price_prev = jnp.concatenate(prev, axis=-1)  # [..., 2]
    out, _ = _v757_tail_core(
        newest, price_prev, spectral, slots, cfg, hop
    )
    return out


def _v757_tail_core(
    newest: jax.Array,        # [..., T] frame-aligned price
    price_prev: jax.Array,    # [..., 2] the two prices before frame 0
    spectral, slots, cfg: V757Config, hop: int,
    init: dict | None = None,
    return_state: bool = False,
):
    """`_v757_tail` body with resumable state plumbing.

    `init` resumes every tail machine from a prior call's returned state
    (second element when `return_state=True`) — the reference keeps all
    of this in persistent globals across `OnCalculate` ticks
    (`pla-kalman.mq5:966-986,1415-1530`). The state dict is
    backend-specific (the driver lives on one backend): CPU carries the
    XLA primitives' states (`biquad`/`eta`/`ff`/`kalman` + `price_hist`),
    a real device carries the tail kernel's packed state (`pallas` +
    `price_hist`). Chunked == one-shot bitwise on each backend (the
    primitives' own pinned standard). Leading dims are a symbol batch:
    resume states carry the same leading dims (fleet serving — every
    machine is batch-native, the device kernels put symbols on their
    VPU lanes), with all symbols advancing in lockstep on one frame
    clock (the batch analog of `WaveCyclesBatchFetcher.mq5:91-143`
    fleet precompute composed with the `pla-kalman.mq5:3186-3342`
    persistent replay).
    """
    n_slots = cfg.tracker.n_slots
    cand_period, cand_power, cand_idx, cand_valid, gd, gd_idx = spectral
    t_frames = cand_period.shape[-2]
    lead = newest.shape[:-1]
    # one-hot pick, NOT take_along_axis: the general gather this lowers
    # to on TPU measured 4.99 ms at [64, 512, 230] -> [.., 12] vs 63 us
    # for the one-hot reduce (ops/gather.py), bitwise identical. gd is
    # band-sliced (indexed by bin - gd_lo); invalid slots (fft_index 0)
    # clip to row 0, whose garbage is gated by slot_valid downstream
    # exactly as the full-plane bin-0 pick was.
    gd_lo = _gd_lo(cfg)
    gd_at_slot = take_last(
        gd, jnp.clip(slots["slot_fft_index"] - gd_lo, 0, gd.shape[-1] - 1)
    )

    state: dict | None = None
    if jax.default_backend() != "cpu":
        from wavespec_tpu.kernels.v757_tail_pallas import v757_tail_pallas

        tail = v757_tail_pallas(
            newest, price_prev, slots["slot_period"], slots["slot_valid"],
            gd_at_slot, cfg, hop,
            init=None if init is None else init["pallas"],
            return_state=return_state,
        )
        if return_state:
            tail, kstate = tail
            state = {"pallas": kstate}
        cycle_vals = tail["cycle_values"]
        color = tail["color"]
        eta_raw = tail["eta_raw"]
        eta_display = tail["eta_display"]
        states = tail["states"]
        ff = {"sig": tail["sig"], "confluence": tail["confluence"]}
        kalman_out = tail.get("kalman")
    else:
        # 3) per-slot biquad reconstruction with the slot's CURRENT
        # per-frame period (time-varying recursion, exactly like
        # `CalculateCycle` re-invoked each bar); inactive-slot frames
        # write 0 while y[i-1] passes through (`:3578-3588` else branch).
        periods_ts = jnp.swapaxes(slots["slot_period"], -1, -2)  # [.., S, T]
        valid_ts = jnp.swapaxes(slots["slot_valid"], -1, -2)
        bq = bandpass_cycle(
            jnp.broadcast_to(
                newest[..., None, :], (*lead, n_slots, t_frames)
            ),
            periods_ts, cfg.bandwidth, valid=valid_ts,
            price_prev=price_prev[..., None, :], zero_first=0,
            # The sequential recursion is the bitwise-resumable form
            # (the associative scan regroups with length; see
            # filters.biquad); the driver and the resumable one-shot
            # must use the same one.
            sequential=cfg.resumable,
            y_prev=None if init is None else init["biquad"],
            return_state=return_state,
        )  # [..., S, T]
        if return_state:
            cycle_vals, bq_state = bq
        else:
            cycle_vals, bq_state = bq, None
        cycle_vals = jnp.swapaxes(cycle_vals, -1, -2)  # [..., T, S]
        cycle_vals = jnp.where(slots["slot_valid"], cycle_vals, 0.0)

        # 4) ETA machine per slot
        eta = eta_state_machine(
            jnp.swapaxes(cycle_vals, -1, -2),
            periods_ts,
            jnp.swapaxes(gd_at_slot, -1, -2),
            EtaConfig(mode=cfg.eta_mode, seconds_per_bar=cfg.seconds_per_bar,
                      fft_window=cfg.window,
                      prior_bars=(cfg.window - 1) // hop,
                      # The ring must hold a quarter of the LONGEST slot
                      # period: the default 64 silently clips the lag (and
                      # therefore the phase-extremum ETA) for periods > ~252.
                      lag_buffer=max(64, int(cfg.max_period / 4.0) + 2)),
            valid=valid_ts,
            init=None if init is None else init["eta"],
            return_state=return_state,
        )
        if return_state:
            eta, eta_state = eta
        else:
            eta_state = None
        color = jnp.swapaxes(eta["color"], -1, -2)         # [..., T, S]
        eta_raw = jnp.swapaxes(eta["eta_raw"], -1, -2)
        eta_display = jnp.swapaxes(eta["eta_display"], -1, -2)

        # 5) states + FollowFirst signals
        states = jnp.where(
            slots["slot_valid"], jnp.where(color > 0.5, 1.0, -1.0), 0.0
        )
        # FollowFirst: the resume state must ride THROUGH the vmap (a
        # closure-captured batched init would be a shape error; a
        # closure-captured None is fine). Fleet resume (leading symbol
        # dims + init) threads init["ff"] as a mapped argument.
        if init is None:
            ff_fn = lambda st, er, pp, vv: followfirst_signals(
                st, er, pp, vv, cfg.followfirst, init=None,
                return_state=return_state,
            )
            ff_args = (
                states, eta_raw, slots["slot_period"], slots["slot_valid"]
            )
        else:
            ff_fn = lambda st, er, pp, vv, fst: followfirst_signals(
                st, er, pp, vv, cfg.followfirst, init=fst,
                return_state=return_state,
            )
            ff_args = (
                states, eta_raw, slots["slot_period"], slots["slot_valid"],
                init["ff"],
            )
        for _ in range(len(lead)):
            ff_fn = jax.vmap(ff_fn)
        ff = ff_fn(*ff_args)
        if return_state:
            ff, ff_state = ff
        else:
            ff_state = None
        if cfg.enable_kalman:
            kalman_out, k_tail = kalman4d_filter(
                newest, cfg.kalman,
                init=None if init is None else init["kalman"],
                return_state=return_state,
            )
        else:
            kalman_out, k_tail = None, None
        if return_state:
            state = {
                "biquad": bq_state,
                "eta": eta_state,
                "ff": ff_state,
                "kalman": k_tail,
            }

    # leak ETA buffers (`PopulateLeakBuffers`, `:2290-2357`)
    # leak buffers go through CalculateScientificETASeconds, which indexes
    # the INDEX-convention fft_group_delay array (`:2290-2357`)
    leak_gd = take_last(
        gd_idx,
        jnp.clip(slots["leak_fft_index"] - gd_lo, 0, gd_idx.shape[-1] - 1),
    )
    leak_eta = leak_eta_bars(
        slots["leak_active"], slots["leak_period"], slots["leak_bars"],
        leak_gd, eta_display, cfg.seconds_per_bar,
    )

    out = {
        "slot_period": slots["slot_period"],
        "slot_power": slots["slot_power"],
        "slot_valid": slots["slot_valid"],
        "slot_uid": slots["slot_uid"],
        "leak_active": slots["leak_active"],
        "leak_period": slots["leak_period"],
        "leak_eta": leak_eta,
        "cycle_values": cycle_vals,
        "color": color,
        "eta_raw": eta_raw,
        "eta_display": eta_display,
        "states": states,
        "sig": ff["sig"],
        "confluence": ff["confluence"],
    }

    # 6) Kalman 4D over the frame-aligned price
    if cfg.enable_kalman:
        out["kalman"] = kalman_out
    if return_state:
        state["price_hist"] = jnp.concatenate(
            [price_prev, newest], axis=-1
        )[..., -2:]
    return out, state


@partial(jax.jit, static_argnames=("cfg", "hop"))
def _v757_packed(series: jax.Array, cfg: V757Config, hop: int):
    return _pack_transfer(_v757_device(series, cfg, hop))


def run_v757(
    series: np.ndarray,
    cfg: V757Config = V757Config(),
    hop: int = 1,
) -> dict[str, np.ndarray]:
    """Full-history analytics. Frame f covers bars [f*hop, f*hop+window).

    Note: the sequential state machines (trackers, ETA, signals) advance
    once per FRAME; with hop > 1 a frame step spans `hop` bars, so set
    `seconds_per_bar` to the per-frame wall time (hop * bar seconds) when
    ETAs must stay in wall-clock units.

    Returns per-frame arrays (T = number of frames, S = 12 slots):
      slot_period/slot_power/slot_valid [T, S], leak flags, cycle
      waveforms [T, S] (biquad), color/eta buffers [T, S], signals
      sig [T, S] / confluence [T], kalman [T] (filtered price at each
      frame's newest bar), states [T, S].

    ONE host transfer: the remote tunnel makes per-array device->host
    copies the wall-clock bottleneck (~15 small transfers cost more than
    the whole device computation), so everything rides in a single
    [T, F] f32 buffer split host-side.
    """
    series = jnp.asarray(np.asarray(series, np.float32))
    packed, spans = _v757_packed(series, cfg, hop)
    return _unpack_transfer(np.asarray(packed), spans)


@partial(jax.jit, static_argnames=("cfg", "hop"))
def _v757_batch_packed(series_batch: jax.Array, cfg: V757Config, hop: int):
    # Every stage is batch-native (a vmapped pallas_call would serialize
    # the symbol batch into the kernel grid): the spectral stage frames /
    # filters / DFTs with leading dims, and the tracker + tail kernels
    # take the whole [B, ...] batch on their VPU lanes.
    spectral = _spectral_frames(series_batch, cfg, hop)
    slots, _state = track_frames(
        spectral[0], spectral[1], spectral[2], spectral[3], cfg=cfg.tracker
    )
    out = _v757_tail(series_batch, spectral, slots, cfg, hop)
    return _pack_transfer(out)


def run_v757_batch(
    series_batch: np.ndarray,
    cfg: V757Config = V757Config(),
    hop: int = 1,
    symbol_chunk: int | None = None,
) -> dict[str, np.ndarray]:
    """Multi-symbol v7.57: the FULL analytics pipeline over a [B, L] batch.

    The reference's scale-out workload is many symbols x timeframes
    (`WaveCyclesBatchFetcher.mq5:91-143`, multi-TF pool
    `Legacy/WaveSpecZZ_1.0.2.mq5:50-130`) run one at a time; here the
    whole symbol axis advances per frame step through the batch-native
    spectral stage and the tracker/tail Pallas kernels (symbols ride the
    VPU lanes) — amortizing the per-step latency that bounds the
    single-series path.

    `symbol_chunk`: process the batch `symbol_chunk` symbols per device
    program. The frame matrix is [B, T, window] f32 — at the BASELINE
    config-#5 upper end (1024 symbols x 4096-pt windows x 512 frames) it
    alone is 8.6 GB, past the single chip's 16 GB HBM with the DFT's
    transposed copy (measured: XLA asks 24 G). 256 fits comfortably;
    equal chunks reuse one compiled program. (On a v5e-8 mesh,
    `run_v757_batch_sharded` splits 128 symbols/chip and needs no
    chunking.)

    Returns the `run_v757` dict with a leading batch axis: [B, T, S] slot
    buffers, [B, T] confluence/kalman.
    """
    series_batch = jnp.asarray(np.asarray(series_batch, np.float32))
    if series_batch.ndim != 2:
        raise ValueError(f"series_batch must be [B, L], got {series_batch.shape}")
    b = series_batch.shape[0]
    if symbol_chunk and b > symbol_chunk:
        parts = []
        spans = None
        for lo in range(0, b, symbol_chunk):
            packed, spans = _v757_batch_packed(
                series_batch[lo : lo + symbol_chunk], cfg, hop
            )
            parts.append(np.asarray(packed))
        return _unpack_transfer(np.concatenate(parts, axis=0), spans)
    packed, spans = _v757_batch_packed(series_batch, cfg, hop)
    return _unpack_transfer(np.asarray(packed), spans)


def run_v757_batch_sharded(
    series_batch,
    cfg: V757Config = V757Config(),
    hop: int = 1,
    *,
    mesh,
    axis: str = "data",
    transfer: bool = True,
):
    """`run_v757_batch` sharded over the mesh `axis` (SURVEY §2.4 row 5).

    Pure data parallelism: each chip runs the full analytics pipeline on
    its local shard of the symbol batch — zero steady-state collectives,
    the direct TPU analog of the fetcher running per-symbol jobs. The
    batch size must divide the mesh axis.

    With `transfer=False` the packed [B, T, F] device buffer + spans are
    returned instead of host arrays (bench path: keeps results on device).
    """
    import jax.sharding as shd

    series_batch = jnp.asarray(series_batch, jnp.float32)
    n_shards = mesh.shape[axis]
    if series_batch.shape[0] % n_shards:
        raise ValueError(
            f"batch {series_batch.shape[0]} not divisible by mesh axis "
            f"'{axis}' = {n_shards}"
        )
    spec = shd.PartitionSpec(axis, None)
    series_batch = jax.device_put(
        series_batch, shd.NamedSharding(mesh, spec)
    )

    def local(block):
        return _v757_batch_packed(block, cfg, hop)

    out_spec = shd.PartitionSpec(axis, None, None)
    # spans are static python metadata — compute once from shapes.
    # check_vma stays ON (the default): the tracker/ETA/Kalman scans
    # pvary-promote their replicated zero-init carries to the data's
    # varying-manual-axes set (utils.vma.pvary_like), the same treatment
    # `fused_dft.out_struct` gives pallas outputs — round 3 found a latent
    # production crash that only this checker would have caught
    # (docs/ROUND3.md), so the flagship batch path must not opt out.
    packed = jax.shard_map(
        lambda b: local(b)[0], mesh=mesh, in_specs=spec, out_specs=out_spec,
    )(series_batch)
    spans = _v757_spans(cfg, hop)
    if not transfer:
        return packed, spans
    return _unpack_transfer(np.asarray(packed), spans)


def _v757_spans(cfg: V757Config, hop: int) -> dict:
    """Static pack layout (field -> row-block span) via shape-only tracing.
    Must mirror `_pack_transfer`'s walk exactly (sorted keys, int columns
    occupy two blocks)."""
    shapes = jax.eval_shape(
        lambda s: _v757_device(s, cfg, hop),
        jax.ShapeDtypeStruct((cfg.window + 7 * hop,), jnp.float32),
    )
    spans = {}
    blk = 0
    for k in sorted(shapes):
        width = 2 if k in _INT_COLS else 1
        spans[k] = (blk, blk + width, k in _SCALAR_COLS)
        blk += width
    return spans


_INT_COLS = frozenset({"slot_uid"})
_BOOL_COLS = frozenset({"slot_valid", "leak_active"})
_SCALAR_COLS = frozenset({"confluence", "kalman"})


def _pack_transfer(out: dict):
    """Pack a dict of [..., T]/[..., T, S] device arrays into one
    [..., n_fields * T, S] f32 buffer.

    The concat runs along the T axis (sublane-tiled, a pure tile copy on
    TPU) — concatenating along the 12-wide minor instead forces lane
    shuffles at non-128 offsets on every field (chip-measured +5.1 ms of
    the 20 ms B=64 call). Scalar fields broadcast across the S minor so
    every block shares one shape; the waste is 2 of ~15 blocks.

    Integer columns (slot_uid) ride as TWO exact value-cast f32 rows,
    (v >> 12) and (v & 0xFFF) — both < 2^20, exactly representable. A
    single value cast would round values above 2^24 (f32 spacing is 2
    there, and next_uid grows unboundedly: n_candidates=0 mode can
    allocate up to `capacity` trackers per frame). A BITCAST lane is NOT
    safe: small ints are denormal f32 bit patterns, and whenever XLA
    fuses the bitcast'd rows with arithmetic-producing rows the TPU
    flushes them to exact zeros — chip-reproduced: a standalone bitcast
    round-trips 1..15, the same bitcast concatenated with `y * 2.0` in
    one program returns all zeros. The one-shot path merely got lucky
    with fusion; the online driver's resumed-step program did not (its
    slot_uid rows came back 0). Non-negative int32 only (slot_uid >= 1).
    """
    n_slots = next(
        v.shape[-1] for k, v in out.items() if k not in _SCALAR_COLS
    )
    rows = []
    spans = {}
    blk = 0
    # SORTED keys: the layout must be key-deterministic — `_v757_spans`
    # recomputes it independently for the sharded path, and a pytree
    # round-trip (vmap/jit) sorts dict keys anyway, so insertion order
    # is not stable across call paths.
    for k, v in sorted(out.items()):
        if k in _SCALAR_COLS:
            v2 = jnp.broadcast_to(v[..., None], (*v.shape, n_slots))
        else:
            v2 = v
        if k in _INT_COLS:
            vi = v2.astype(jnp.int32)
            rows.append((vi >> 12).astype(jnp.float32))
            rows.append((vi & 0xFFF).astype(jnp.float32))
            spans[k] = (blk, blk + 2, k in _SCALAR_COLS)
            blk += 2
        else:
            rows.append(v2.astype(jnp.float32))
            spans[k] = (blk, blk + 1, k in _SCALAR_COLS)
            blk += 1
    return jnp.concatenate(rows, axis=-2), spans


def _unpack_transfer(packed: np.ndarray, spans: dict) -> dict[str, np.ndarray]:
    """Host-side split of `_pack_transfer`'s buffer; exact dtype restore."""
    n_blocks = max(hi for (_lo, hi, _s) in spans.values())
    t_frames = packed.shape[-2] // n_blocks
    result = {}
    for k, (lo, hi, scalar) in spans.items():
        arr = packed[..., lo * t_frames : hi * t_frames, :]
        if k in _BOOL_COLS:
            arr = arr > 0.5
        elif k in _INT_COLS:
            hi_part = arr[..., :t_frames, :].astype(np.int64)
            lo_part = arr[..., t_frames:, :].astype(np.int64)
            arr = ((hi_part << 12) | lo_part).astype(np.int32)
        else:
            arr = np.ascontiguousarray(arr)
        if scalar:
            arr = arr[..., 0]
        result[k] = arr
    return result
