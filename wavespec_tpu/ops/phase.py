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


@jax.jit
def phase_analysis(spec: jax.Array):
    """Convenience: (phase, unwrapped, group_delay) from complex bins."""
    n = 2 * spec.shape[-1]
    ph = fft_phase(spec)
    uw = unwrap_phase(ph)
    gd = group_delay(uw, n)
    return ph, uw, gd
