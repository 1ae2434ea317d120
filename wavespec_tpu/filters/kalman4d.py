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
    q_scale = max(0.05, cfg.follow_strength)
    q_list = [
        float(np.float32(max(1e-9, q * q_scale)))
        for q in (cfg.q_pos, cfg.q_vel, cfg.q_acc, cfg.q_jerk)
    ]
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

        # Hand-unrolled 4x4 algebra with every multiply-feeding-an-add
        # pinned by optimization_barrier: XLA's emission of tiny dots and
        # FMA formation is fusion-context-dependent on CPU (a length-1
        # scan inlined into the online driver's step rounded ~1e-6
        # differently from the same step inside a long scan body), and
        # the bitwise chunked==one-shot contract needs the step's
        # arithmetic identical in every context. Mirrors the constant
        # structure the device tail kernel uses
        # (`kernels/v757_tail_pallas.py` Kalman section).
        pin = jax.lax.optimization_barrier
        f_mat = _transition().tolist()

        def dot_row(coeffs, vals):
            """sum_k coeffs[k] * vals[k] with literal-zero terms dropped
            and EVERY product and partial sum individually pinned — LLVM
            reassociates float chains under the fast-math flags XLA CPU
            fusions compile with, so even a bare left-assoc add chain
            rounds context-dependently."""
            acc = None
            for cf, v in zip(coeffs, vals):
                if cf == 0.0:
                    continue
                term = v if cf == 1.0 else pin(cf * v)
                acc = term if acc is None else pin(acc + term)
            return acc

        def step(carry, z):
            x, p, ema, ema_ready = carry
            xv = [x[..., i] for i in range(4)]
            pv = [[p[..., i, j] for j in range(4)] for i in range(4)]

            xp = [dot_row(f_mat[i], xv) for i in range(4)]
            fp = [[dot_row(f_mat[i], [pv[k][j] for k in range(4)])
                   for j in range(4)] for i in range(4)]
            pp = [[dot_row(f_mat[j], fp[i]) for j in range(4)]
                  for i in range(4)]
            for i in range(4):
                pp[i][i] = pin(pp[i][i] + q_list[i])

            # sqrt/div also pinned: XLA CPU's fusion emitter compiles
            # them with fast-math inside large fusions (approximate
            # reciprocal/rsqrt), rounding differently from the same op
            # standing alone — pinning makes each its own single-op
            # fusion in every context.
            y = pin(z - xp[0])
            s = pin(pp[0][0] + r)

            if cfg.adapt_gain > 0.0:
                sigma = pin(jnp.sqrt(s))
                boost = pin(
                    jnp.minimum(5.0, pin(jnp.abs(y) / sigma))
                    * cfg.adapt_gain
                )
                for i in range(4):
                    pp[i][i] = pin(pp[i][i] + pin(boost * q_list[i]))
                s = pin(pp[0][0] + r)

            if cfg.clip_std > 0.0:
                lim = pin(cfg.clip_std * pin(jnp.sqrt(s)))
                y = jnp.clip(y, -lim, lim)

            k = [pin(pp[i][0] / s) for i in range(4)]
            xn = [pin(xp[i] + pin(k[i] * y)) for i in range(4)]
            pn = [[pin(pp[i][j] - pin(k[i] * pp[0][j])) for j in range(4)]
                  for i in range(4)]
            # reference floors the diagonal at 1e-12
            for i in range(4):
                pn[i][i] = jnp.maximum(pn[i][i], 1e-12)
            x = jnp.stack(xn, axis=-1)
            p = jnp.stack(
                [jnp.stack(row, axis=-1) for row in pn], axis=-2
            )

            out = xn[0]
            if cfg.ema_blend_period > 0.0:
                alpha = 2.0 / (cfg.ema_blend_period + 1.0)
                # Reference seeds ema_prev with the FIRST FILTERED output
                # (`:2117-2120` — not the raw measurement), so the first
                # blended step passes `out` through unchanged.
                ema = jnp.where(
                    ema_ready,
                    pin(alpha * out) + pin((1.0 - alpha) * ema),
                    out,
                )
                out = ema
            # `ema_ready | True` (not a fresh constant): keeps the carry's
            # varying-axes set under shard_map(check_vma=True).
            return (x, p, ema, ema_ready | True), out

        from wavespec_tpu.utils.vma import pvary_like

        # shard_map(check_vma=True): p0/x0 are built from replicated
        # constants — promote the carry to the data's varying axes
        # (utils.vma; no-op outside shard_map).
        carry0 = pvary_like((x0, p0, ema0, ready0), series)
        (x_f, p_f, ema_f, ready_f), outs = jax.lax.scan(step, carry0, series)
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
