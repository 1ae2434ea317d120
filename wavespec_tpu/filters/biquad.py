"""Constant-Q biquad band-pass cycle reconstruction.

Rebuild of `CalculateCycle` (`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:
2888-2913`, bandwidth input `:805`): an RBJ-style band-pass at each
dominant period, run recursively over the price series to produce that
cycle's waveform:

    omega = 2 pi / period,  bw in [0.01, 0.49] octaves
    alpha = sin(omega) * sinh(ln2/2 * bw * omega / sin(omega))
    b0 = alpha/a0, b1 = 0, b2 = -alpha/a0
    a0 = 1 + alpha, a1 = -2 cos(omega)/a0, a2 = (1 - alpha)/a0
    y[i] = b0 x[i] + b2 x[i-2] - a1 y[i-1] - a2 y[i-2]

TPU formulation: the 2nd-order recurrence is expressed with 2x2 companion
matrices and evaluated by `jax.lax.associative_scan` — O(log n) depth
instead of an n-step sequential loop, batched over (series x periods).
The reference zeroes y for i < 2; we match that boundary.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def biquad_coeffs(period: jax.Array, bandwidth: float = 0.5):
    """RBJ band-pass coefficients for (possibly batched) periods."""
    bw = min(0.49, max(0.01, float(bandwidth)))
    omega = 2.0 * jnp.pi / period
    sin_w = jnp.sin(omega)
    alpha = sin_w * jnp.sinh(math.log(2.0) / 2.0 * bw * omega / sin_w)
    a0 = 1.0 + alpha
    return (
        alpha / a0,            # b0
        -alpha / a0,           # b2 (b1 = 0)
        -2.0 * jnp.cos(omega) / a0,  # a1
        (1.0 - alpha) / a0,    # a2
    )


@partial(
    jax.jit,
    static_argnames=("bandwidth", "zero_first", "return_state", "sequential"),
)
def bandpass_cycle(
    price: jax.Array,
    period: jax.Array,
    bandwidth: float = 0.5,
    *,
    valid: jax.Array | None = None,
    price_prev: jax.Array | None = None,
    zero_first: int = 2,
    y_prev: jax.Array | None = None,
    return_state: bool = False,
    sequential: bool = False,
) -> jax.Array:
    """Band-pass `price` ``[..., t]`` at `period`.

    `period` may be a scalar, per-series ``[...]``, or **per-timestep**
    ``[..., t]`` — the reference recomputes the coefficients every bar
    with the slot's current dominant period (`CalculateCycle` is called
    per bar), i.e. a time-varying recursion; the associative-scan
    formulation handles that for free since each step carries its own
    companion matrix. Returns the cycle waveform ``[..., t]``.

    Reference-exact boundary semantics (`CalculateCycle`,
    `...pla-kalman.mq5:2888-2913` + the inactive-slot else branch
    `:3578-3588`):
    - a frame with `period <= 0`, `valid == False`, or index < `zero_first`
      writes 0 to the buffer while y[i-1] PASSES THROUGH the state (the
      reference writes 0 and later bars still read the older history two
      back), i.e. step matrix [[0,0],[1,0]] with zero forcing;
    - `price_prev` ``[..., 2]`` = (x[-2], x[-1]), the two price samples
      before frame 0 — the reference's filter runs over the global price
      array, so the first analyzed bars see real earlier prices
      (`zero_first=0` + `price_prev` gives the exact v7.57 alignment;
      the default `zero_first=2` keeps the standalone-filter convention
      of y[0] = y[1] = 0);
    - `y_prev` ``[..., 2]`` = (y[-2], y[-1]), the filter OUTPUT history
      before frame 0 — resumes a chunked run: feeding chunk N's final
      state (returned with `return_state=True` as the same (y[-2], y[-1])
      layout) into chunk N+1 reproduces the one-shot recursion bitwise
      (the reference's filter state lives in persistent per-slot buffers
      across `OnCalculate` ticks). With `return_state=True` the return
      value is ``(waveform, y_state [..., 2])``.
    """
    price = price.astype(jnp.float32)
    t = price.shape[-1]
    period = jnp.asarray(period, jnp.float32)
    if period.ndim == price.ndim - 1:
        period = period[..., None]  # per-series -> broadcast over time
    period_b = jnp.broadcast_to(period, price.shape)
    b0, b2, a1, a2 = biquad_coeffs(jnp.maximum(period_b, 2.01), bandwidth)

    # forcing term u[i] = b0 x[i] + b2 x[i-2]
    if price_prev is None:
        x_pre = jnp.zeros_like(price[..., :2])
    else:
        x_pre = jnp.broadcast_to(
            jnp.asarray(price_prev, jnp.float32), (*price.shape[:-1], 2)
        )
    # x[i-2] for every i — concat-then-slice (not price[..., :-2]) so
    # chunks shorter than 2 frames (the online driver's r=1 ticks) work.
    x_m2 = jnp.concatenate([x_pre, price], axis=-1)[..., :t]
    u = b0 * price + b2 * x_m2

    live = (jnp.arange(t) >= zero_first) & (period_b > 0)
    if valid is not None:
        live = live & valid
    u = u * live

    if sequential:
        # Plain per-step recursion (`lax.scan`): BITWISE-resumable across
        # chunk boundaries (the carried (y[-2], y[-1]) reproduces the
        # one-shot step-for-step), unlike the associative-scan form whose
        # combine tree regroups with length (resume there agrees only to
        # ~1e-5). The v757 online driver / `V757Config(resumable=True)`
        # route here on CPU; the device tail kernel is already sequential
        # in-kernel (`kernels/v757_tail_pallas.py`). Dead frames write 0
        # while y[i-1] passes through, exactly like the matrix form.
        a1m = a1 * live
        a2m = a2 * live
        if y_prev is None:
            y1_0 = jnp.zeros(price.shape[:-1], jnp.float32)
            y2_0 = y1_0
        else:
            yp = jnp.broadcast_to(
                jnp.asarray(y_prev, jnp.float32), (*price.shape[:-1], 2)
            )
            y2_0, y1_0 = yp[..., 0], yp[..., 1]

        def stepf(carry, xs):
            y1, y2 = carry
            u_t, a1_t, a2_t = xs
            y = u_t - a1_t * y1 - a2_t * y2
            return (y, y1), y

        xs = tuple(jnp.moveaxis(v, -1, 0) for v in (u, a1m, a2m))
        from wavespec_tpu.utils.vma import pvary_like

        (y1_f, y2_f), ys = jax.lax.scan(
            stepf, pvary_like((y1_0, y2_0), price), xs
        )
        out = jnp.moveaxis(ys, 0, -1)
        if not return_state:
            return out
        return out, jnp.stack([y2_f, y1_f], axis=-1)

    # state s_i = [y_i, y_{i-1}] = A_i s_{i-1} + [u_i, 0],
    # A_i = [[-a1_i, -a2_i], [1, 0]] on live frames,
    # A_i = [[0, 0], [1, 0]] on zeroed frames (y_i = 0, y_{i-1} carries).
    zeros = jnp.zeros_like(u)
    ones = jnp.ones_like(u)
    m = jnp.stack(
        [
            jnp.stack([-a1 * live, -a2 * live], axis=-1),
            jnp.stack([ones, zeros], axis=-1),
        ],
        axis=-2,
    )  # [..., t, 2, 2]
    v = jnp.stack([u, zeros], axis=-1)  # [..., t, 2]

    def combine(left, right):
        m_l, v_l = left
        m_r, v_r = right
        return (
            jnp.einsum("...ij,...jk->...ik", m_r, m_l),
            jnp.einsum("...ij,...j->...i", m_r, v_l) + v_r,
        )

    mm, s = jax.lax.associative_scan(combine, (m, v), axis=-3)
    if y_prev is not None:
        # s_{-1} = [y[-1], y[-2]]; the affine recursion gives
        # s_i = (A_i...A_0) s_{-1} + (zero-state response), and the scan's
        # first element IS the cumulative matrix product M_i...M_0.
        s_init = jnp.broadcast_to(
            jnp.asarray(y_prev, jnp.float32)[..., ::-1],
            (*price.shape[:-1], 2),
        )
        s = s + jnp.einsum("...tij,...j->...ti", mm, s_init)
    if not return_state:
        return s[..., 0]
    # final (y[-2], y[-1]) for the next chunk = reversed s at the last step
    return s[..., 0], s[..., -1, ::-1]
