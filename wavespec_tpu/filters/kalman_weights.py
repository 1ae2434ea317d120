"""Per-cycle-weight Kalman/RLS regressor over top-k FFT basis functions.

Rebuild of `UpdateKalman` / `ComputeContribution` / `ResetKalmanState`
(`Legacy/WaveSpecZZ_1.0.4-kalman.mq5:96-231`, params `:33-35`; integrated
form `Legacy/WaveSpecZZ_1.0.4-old.mq5:2562-2770`): the top-k spectral bins
act as basis functions H_i; a scalar-innovation Kalman filter recursively
updates per-cycle weights w_i and variances P_i against the measured close:

    P_i += Q
    residual   = z - sum_i H_i w_i
    innovation = R + sum_i H_i^2 P_i
    K_i  = P_i H_i / innovation
    w_i += K_i * residual ;  P_i = max((1 - K_i H_i) P_i, 1e-9)
    output = sum_i w_i H_i          (post-update blend)

The contribution of bin k at the window's newest sample n0 = N-1 is
``(2/N) (re_k cos(2 pi k n0 / N) - im_k sin(...))`` (`:196-206`).

TPU formulation: `lax.scan` over bars (the K_i <- P_i dependency is
inherently sequential), vectorized over the k cycles inside the step and
`vmap`-able over independent series.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from wavespec_tpu.ops.gather import take_last


@dataclasses.dataclass(frozen=True)
class KalmanWeightsConfig:
    """Defaults = reference inputs (`1.0.4-kalman.mq5:33-35`)."""

    q: float = 0.25
    r: float = 9.0
    init_variance: float = 25.0


def bin_contribution(spec: jax.Array, idx: jax.Array, n: int) -> jax.Array:
    """Contribution H of bins ``idx`` at the window's newest sample.

    spec: complex bins ``[..., n//2]`` from the forward rFFT; idx ``[..., k]``.
    """
    spec_k = take_last(spec, idx)
    n0 = float(n - 1)
    angle = 2.0 * jnp.pi * idx.astype(jnp.float32) * n0 / n
    return (2.0 / n) * (
        jnp.real(spec_k) * jnp.cos(angle) - jnp.imag(spec_k) * jnp.sin(angle)
    )


@partial(jax.jit, static_argnames=("cfg",))
def kalman_weights_filter(
    basis: jax.Array,
    measurements: jax.Array,
    cfg: KalmanWeightsConfig = KalmanWeightsConfig(),
):
    """Run the regressor over frames.

    Args:
      basis: ``[..., t, k]`` per-frame cycle contributions H.
      measurements: ``[..., t]`` measured price per frame.

    Returns (blended ``[..., t]``, final_weights ``[..., k]``).
    """
    q = max(1e-9, cfg.q)
    r = max(1e-9, cfg.r)
    p0 = max(1e-6, cfg.init_variance)
    k = basis.shape[-1]

    def single(h_t, z_t):
        def step(carry, xs):
            w, p = carry
            h, z = xs
            p = p + q
            residual = z - jnp.sum(h * w)
            innovation = r + jnp.sum(h * h * p)
            innovation = jnp.where(innovation < 1e-9, r, innovation)
            gain = p * h / innovation
            w = w + gain * residual
            p = jnp.maximum((1.0 - gain * h) * p, 1e-9)
            return (w, p), jnp.sum(w * h)

        init = (jnp.zeros((k,), jnp.float32), jnp.full((k,), p0, jnp.float32))
        (w_f, _), out = jax.lax.scan(step, init, (h_t, z_t))
        return out, w_f

    fn = single
    for _ in range(measurements.ndim - 1):
        fn = jax.vmap(fn)
    return fn(basis.astype(jnp.float32), measurements.astype(jnp.float32))
