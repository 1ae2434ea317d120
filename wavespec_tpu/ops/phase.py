"""FFT phase analysis: phase, unwrap, group delay.

Rebuild of `CalculateFFTPhase` / `UnwrapPhase` / `CalculateGroupDelay`
(`Legacy/WaveSpecZZ_1.0.2.mq5:980-1059`):
- phase = atan2(im, re) per bin;
- numpy-style unwrap (fold jumps into (-pi, pi]);
- group delay = -dphi/domega via central differences with
  domega = 2*pi/N per bin step, clamped to +/-100 bars.

The unwrap cumulative sum is a parallel prefix (cumsum) rather than the
reference's sequential loop, so it vectorizes over batches of windows.
Also hosts `gpu_spectral_phase_unwrap` parity
(`Legacy/WaveSpecZZ_1.0.4-core.mq5:413-423`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GROUP_DELAY_CLAMP = 100.0


def fft_phase(spec: jax.Array) -> jax.Array:
    """Per-bin phase atan2(im, re) for complex bins ``[..., n//2]``."""
    return jnp.arctan2(jnp.imag(spec), jnp.real(spec))


def unwrap_phase(phase: jax.Array, axis: int = -1) -> jax.Array:
    """Numpy-style phase unwrap along ``axis`` (jump threshold pi)."""
    diff = jnp.diff(phase, axis=axis)
    # Map each first difference into (-pi, pi]; mod semantics match numpy.
    wrapped = jnp.mod(diff + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    wrapped = jnp.where((wrapped == -jnp.pi) & (diff > 0), jnp.pi, wrapped)
    correction = jnp.cumsum(wrapped - diff, axis=axis)
    first = jnp.take(phase, jnp.array([0]), axis=axis)
    rest = jnp.take(phase, jnp.arange(1, phase.shape[axis]), axis=axis) + correction
    return jnp.concatenate([first, rest], axis=axis)


def group_delay(unwrapped: jax.Array, n: int) -> jax.Array:
    """Group delay in bars: ``-dphi/domega``, central differences.

    ``omega_k = 2*pi*k/n`` so one bin step is ``domega = 2*pi/n``. Edges use
    one-sided differences. Clamped to +/-100 bars like the reference.
    """
    domega = 2.0 * jnp.pi / n
    dphi = jnp.gradient(unwrapped, axis=-1)
    gd = -dphi / domega
    return jnp.clip(gd, -GROUP_DELAY_CLAMP, GROUP_DELAY_CLAMP)


def group_delay_index(unwrapped: jax.Array) -> jax.Array:
    """The reference's `fft_group_delay` EXACTLY (`1.0.2.mq5:1027-1059`):
    ``-dphi/dk`` per FFT-bin step — deliberately NOT divided by domega
    ("gradiente diretamente em termos de INDICE FFT") — clamped +/-100.
    This is the array `CalculateScientificETASeconds` indexes; the
    physically-scaled `group_delay` above is the general-purpose op.
    """
    dphi = jnp.gradient(unwrapped, axis=-1)
    return jnp.clip(-dphi, -GROUP_DELAY_CLAMP, GROUP_DELAY_CLAMP)


def _wrap_principal(diff: jax.Array) -> jax.Array:
    """Fold a phase first-difference into (-pi, pi] — the exact unwrap
    step of `unwrap_phase` (numpy mod semantics + the +pi boundary fix)."""
    wrapped = jnp.mod(diff + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return jnp.where((wrapped == -jnp.pi) & (diff > 0), jnp.pi, wrapped)


def unwrapped_gradient_at(spec: jax.Array, idx: jax.Array) -> jax.Array:
    """``jnp.gradient(unwrap_phase(fft_phase(spec)))`` evaluated ONLY at
    bins ``idx`` ([..., S] int32 into spec's last axis).

    Unwrap corrections telescope — ``uw[b+1] - uw[b]`` is exactly the
    principal-folded raw difference — so the central/one-sided gradient
    at a bin needs only the three neighboring phases, not the full
    unwrap cumsum. The v757 tail reads group delay at <= 24 slot/leak
    bins per frame; computing phase/unwrap/gradient over all ~230 bins
    of every frame was pure waste (atan2 is VPU-expensive).
    """
    from wavespec_tpu.ops.gather import take_last

    nb = spec.shape[-1]
    b = jnp.clip(idx, 0, nb - 1)
    gather = lambda i: take_last(spec, i)
    ph0 = fft_phase(gather(b))
    phm = fft_phase(gather(jnp.maximum(b - 1, 0)))
    php = fft_phase(gather(jnp.minimum(b + 1, nb - 1)))
    d1 = _wrap_principal(php - ph0)   # uw[b+1] - uw[b]
    d0 = _wrap_principal(ph0 - phm)   # uw[b] - uw[b-1]
    return jnp.where(
        b == 0, d1, jnp.where(b == nb - 1, d0, 0.5 * (d1 + d0))
    )


def group_delay_index_at(spec: jax.Array, idx: jax.Array) -> jax.Array:
    """`group_delay_index` at selected bins (clamped +/-100, index units)."""
    return jnp.clip(
        -unwrapped_gradient_at(spec, idx),
        -GROUP_DELAY_CLAMP, GROUP_DELAY_CLAMP,
    )


@jax.jit
def phase_analysis(spec: jax.Array):
    """Convenience: (phase, unwrapped, group_delay) from complex bins."""
    n = 2 * spec.shape[-1]
    ph = fft_phase(spec)
    uw = unwrap_phase(ph)
    gd = group_delay(uw, n)
    return ph, uw, gd
