"""Adaptive 4-state (pos/vel/acc/jerk) Kalman filter on the applied price.

Rebuild of `StepKalman4D` / `ResetKalmanState`
(`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:2015-2125`, defaults `:884-901`):
constant-jerk transition, innovation-adaptive Q boost
(boost-1 = min(5, |y|/sigma) * adapt_gain), innovation clipping at
clip_std * sigma, optional EMA output blend, and per-element covariance
floors at 1e-12.

TPU formulation: the adaptive gain and clipping make each step depend
nonlinearly on the previous covariance, so the recursion is a `lax.scan`
over bars (the reference's own sequential semantics); throughput comes
from `vmap` over independent series — thousands of symbols advance one
scan step together, which is exactly the v5e batch axis (BASELINE
config #5). The matrices are hand-specialized 4x4 like the reference, but
expressed as dense jnp ops so XLA fuses the whole step into one kernel.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Kalman4DConfig:
    """Defaults = reference inputs (`...pla-kalman.mq5:884-901`)."""

    follow_strength: float = 1.0
    q_pos: float = 0.01
    q_vel: float = 0.003
    q_acc: float = 0.0008
    q_jerk: float = 0.0002
    adapt_gain: float = 0.8
    r: float = 1.0
    init_var_pos: float = 16.0
    init_var_vel: float = 9.0
    init_var_acc: float = 4.0
    init_var_jerk: float = 1.0
    init_vel: float = 0.0
    init_acc: float = 0.0
    init_jerk: float = 0.0
    clip_std: float = 6.0
    ema_blend_period: float = 0.0


def _transition() -> np.ndarray:
    """Constant-jerk transition (dt=1 bar), Taylor factors 1, 1/2, 1/6."""
    return np.array(
        [
            [1.0, 1.0, 0.5, 1.0 / 6.0],
            [0.0, 1.0, 1.0, 0.5],
            [0.0, 0.0, 1.0, 1.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )


class Kalman4DState(NamedTuple):
    """Full filter state for chunked/online resume (`init=`): feeding
    chunk N's state into chunk N+1 reproduces the one-shot scan bitwise
    (the reference keeps these in globals across `OnCalculate` ticks)."""

    x: jax.Array          # [..., 4] state vector
    p: jax.Array          # [..., 4, 4] covariance
    ema: jax.Array        # [...] EMA blend memory
    ema_ready: jax.Array  # [...] bool


@partial(jax.jit, static_argnames=("cfg", "return_state"))
def kalman4d_filter(
    measurements: jax.Array,
    cfg: Kalman4DConfig = Kalman4DConfig(),
    init: Kalman4DState | None = None,
    return_state: bool = False,
):
    """Run the filter over a series (last axis = time; batch dims vmapped).

    Returns (filtered ``[..., t]``, final_state ``[..., 4]``). The state is
    seeded from the first measurement exactly like `ResetKalmanState`,
    or resumed from `init` (a prior call's `Kalman4DState`). With
    `return_state=True` the second element is the full `Kalman4DState`
    instead of the bare ``x`` vector.
    """
    f = jnp.asarray(_transition())
    q_scale = max(0.05, cfg.follow_strength)
    q_diag = jnp.asarray(
        [
            max(1e-9, cfg.q_pos * q_scale),
            max(1e-9, cfg.q_vel * q_scale),
            max(1e-9, cfg.q_acc * q_scale),
            max(1e-9, cfg.q_jerk * q_scale),
        ],
        jnp.float32,
    )
    r = max(1e-9, cfg.r)

    def single(series, st):
        if st is None:
            z0 = series[0]
            x0 = jnp.array(
                [0.0, cfg.init_vel, cfg.init_acc, cfg.init_jerk], jnp.float32
            )
            x0 = x0.at[0].set(z0)
            p0 = jnp.diag(
                jnp.asarray(
                    [
                        max(1e-9, cfg.init_var_pos),
                        max(1e-9, cfg.init_var_vel),
                        max(1e-9, cfg.init_var_acc),
                        max(1e-9, cfg.init_var_jerk),
                    ],
                    jnp.float32,
                )
            )
            ema0 = z0
            ready0 = jnp.asarray(False)
        else:
            x0, p0, ema0, ready0 = st

        hp = jax.lax.Precision.HIGHEST

        def step(carry, z):
            x, p, ema, ema_ready = carry
            # HIGHEST precision: the covariance recursion is numerically
            # sensitive and TPU matmuls default to bf16 (CLAUDE.md).
            xp = jnp.matmul(f, x, precision=hp)
            pp = jnp.matmul(
                jnp.matmul(f, p, precision=hp), f.T, precision=hp
            ) + jnp.diag(q_diag)

            y = z - xp[0]
            s = pp[0, 0] + r

            if cfg.adapt_gain > 0.0:
                sigma = jnp.sqrt(s)
                boost = jnp.minimum(5.0, jnp.abs(y) / sigma) * cfg.adapt_gain
                pp = pp + jnp.diag(boost * q_diag)
                s = pp[0, 0] + r

            if cfg.clip_std > 0.0:
                lim = cfg.clip_std * jnp.sqrt(s)
                y = jnp.clip(y, -lim, lim)

            k = pp[:, 0] / s
            x = xp + k * y
            p = pp - jnp.outer(k, pp[0, :])
            # reference floors the diagonal at 1e-12
            p = jnp.where(jnp.eye(4, dtype=bool), jnp.maximum(p, 1e-12), p)

            out = x[0]
            if cfg.ema_blend_period > 0.0:
                alpha = 2.0 / (cfg.ema_blend_period + 1.0)
                # Reference seeds ema_prev with the FIRST FILTERED output
                # (`:2117-2120` — not the raw measurement), so the first
                # blended step passes `out` through unchanged.
                ema = jnp.where(
                    ema_ready, alpha * out + (1.0 - alpha) * ema, out
                )
                out = ema
            return (x, p, ema, jnp.asarray(True)), out

        (x_f, p_f, ema_f, ready_f), outs = jax.lax.scan(
            step, (x0, p0, ema0, ready0), series
        )
        if return_state:
            return outs, Kalman4DState(x_f, p_f, ema_f, ready_f)
        return outs, x_f

    fn = single
    for _ in range(measurements.ndim - 1):
        fn = jax.vmap(fn)
    if init is not None:
        init = Kalman4DState(
            jnp.asarray(init.x, jnp.float32),
            jnp.asarray(init.p, jnp.float32),
            jnp.asarray(init.ema, jnp.float32),
            jnp.asarray(init.ema_ready, bool),
        )
    return fn(measurements.astype(jnp.float32), init)
