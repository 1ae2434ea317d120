"""Segmented long-window FFT (`gpu_wave_fft_segmented` rebuild).

Reference contract (`Legacy/WaveSpecZZ_gpu_cycles.mq5:13,34`,
`Legacy/WaveSpecZZ_gpu_wip.mq5:32-38`): a long analysis window (up to
262144 samples) is split into `segment_len` chunks overlapped by `overlap`
samples, each segment gets its own rFFT, and the per-segment spectra are
mixed — mix_mode 0 = ENERGY (the Welch average of power spectra). The
closed DLL supports auto-tuned overlap (25% default).

This is the reference's only long-context/sequence-parallel axis
(SURVEY §2.4/§5): the TPU-native mapping shards the *segment* axis across
chips with `shard_map`, computes local MXU rFFTs, and combines with a
`psum` over the mesh axis — ICI traffic is one [segment_len/2] vector per
chip instead of the raw window.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from wavespec_tpu.kernels.mxu_fft import rfft_mxu


class MixMode(enum.IntEnum):
    """Segment mix modes (0 = energy, `gpu_cycles.mq5:34`)."""

    ENERGY = 0     # Welch: mean of per-segment power spectra
    COHERENT = 1   # mean of complex spectra (phase-aligned content survives)
    MAX = 2        # per-bin max power across segments


def num_segments(n: int, segment_len: int, overlap: int) -> int:
    hop = segment_len - overlap
    if hop <= 0:
        raise ValueError(f"overlap {overlap} must be < segment_len {segment_len}")
    if n < segment_len:
        # floor division would yield <= 0 segments and a silent all-NaN
        # mean downstream
        raise ValueError(
            f"series length {n} shorter than segment_len {segment_len}"
        )
    return 1 + (n - segment_len) // hop


def split_segments(series: jax.Array, segment_len: int, overlap: int) -> jax.Array:
    """``[..., n]`` -> ``[..., nseg, segment_len]`` strided windows.

    Uses the slice-based framing from `extract.frame_series` (a fancy-index
    gather costs ~100x on TPU); batch dims are vmapped.
    """
    from wavespec_tpu.extract import frame_series

    num_segments(series.shape[-1], segment_len, overlap)  # validate overlap
    hop = segment_len - overlap
    fn = lambda s: frame_series(s, segment_len, hop)
    for _ in range(series.ndim - 1):
        fn = jax.vmap(fn)
    return fn(series)


def _mix(spec: jax.Array, mode: MixMode, axis: int):
    if mode == MixMode.ENERGY:
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        return jnp.mean(power, axis=axis)
    if mode == MixMode.COHERENT:
        return jnp.mean(spec, axis=axis)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.max(power, axis=axis)


@partial(jax.jit, static_argnames=("segment_len", "overlap", "mix_mode"))
def fft_segmented(
    series: jax.Array,
    segment_len: int = 16384,
    overlap: int = 4096,
    mix_mode: MixMode = MixMode.ENERGY,
) -> jax.Array:
    """Single-device segmented rFFT + mix over the last axis.

    Returns ``[..., segment_len//2]`` — power for ENERGY/MAX, complex for
    COHERENT (the bridge's `out_len` analog is the bin count).
    """
    segs = split_segments(series.astype(jnp.float32), segment_len, overlap)
    spec = rfft_mxu(segs)
    return _mix(spec, MixMode(mix_mode), axis=-2)


def auto_overlap(segment_len: int, overlap_pct: float = 0.25) -> int:
    """`InpSegmentAutoTune` behavior: overlap = pct * segment_len
    (`gpu_wip.mq5:35-38`)."""
    return int(segment_len * overlap_pct)


def solve_overlap(
    n: int, segment_len: int, n_chips: int, overlap: int
) -> int:
    """Closest overlap to `overlap` whose segment count divides `n_chips`.

    The reference auto-tunes overlap from a percentage rather than
    requiring exact divisibility (`InpSegmentAutoTune`/`InpSegmentOverlapPct`,
    `gpu_wip.mq5:35-38`); the mesh analog re-solves the overlap so the
    segment axis splits evenly across chips. Host-side O(segment_len)
    search — exact, and trivial next to a single segment FFT.
    """
    if n < segment_len:
        raise ValueError(f"series length {n} shorter than segment_len {segment_len}")
    best = None
    for hop in range(1, segment_len + 1):
        nseg = 1 + (n - segment_len) // hop
        if nseg % n_chips:
            continue
        cand = segment_len - hop
        dist = abs(cand - overlap)
        if best is None or dist < best[0]:
            best = (dist, cand)
    if best is None:
        raise ValueError(
            f"no overlap in [0, {segment_len - 1}] yields a segment count "
            f"divisible by {n_chips} (n={n}, segment_len={segment_len})"
        )
    return best[1]


def fft_segmented_sharded(
    series: jax.Array,
    mesh: jax.sharding.Mesh,
    *,
    axis: str = "window",
    segment_len: int = 16384,
    overlap: int = 4096,
    mix_mode: MixMode = MixMode.ENERGY,
    auto_tune: bool = True,
) -> jax.Array:
    """Mesh-sharded segmented rFFT: segments split across `axis` chips.

    Each chip runs its local MXU rFFTs and the ENERGY/COHERENT mix is
    completed with a `psum` mean over ICI; MAX uses `pmax`. When the
    segment count does not divide the mesh axis, the overlap is re-solved
    to the nearest value that does (`auto_tune`, the reference's
    `InpSegmentAutoTune` behavior — `gpu_wip.mq5:35-38`); exact requested
    overlap is always kept when it already divides. `auto_tune=False`
    restores the strict raise.
    """
    mode = MixMode(mix_mode)
    n_chips = mesh.shape[axis]
    series = series.astype(jnp.float32)
    nseg = num_segments(series.shape[-1], segment_len, overlap)
    if nseg % n_chips:
        if not auto_tune:
            raise ValueError(
                f"nseg {nseg} not divisible by mesh axis {axis}={n_chips}"
            )
        overlap = solve_overlap(series.shape[-1], segment_len, n_chips, overlap)
    segs = split_segments(series, segment_len, overlap)

    def local(seg_block):
        spec = rfft_mxu(seg_block)
        if mode == MixMode.MAX:
            power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
            return jax.lax.pmax(jnp.max(power, axis=-2), axis)
        local_mix = _mix(spec, mode, axis=-2)
        return jax.lax.pmean(local_mix, axis)

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(*([None] * (segs.ndim - 2)), axis, None),
        out_specs=P(*([None] * (segs.ndim - 2)), None),
    )
    return shard(segs)
