"""Parity: the single-launch v757 tail kernel vs the XLA scan stack.

The kernel (kernels/v757_tail_pallas.py) reimplements biquad + ETA +
FollowFirst + Kalman4D per-frame; these tests pin it in interpret mode
against the exact XLA functions the CPU path runs. The biquad is the one
deliberate rounding difference: the kernel runs the true sequential
recurrence while the XLA path uses an associative scan (reassociated
FMAs), so cycle values agree to f32 noise rather than bitwise — the
sequential kernel is, if anything, CLOSER to the reference's per-bar
loop. Discrete outputs (color, states, sig, confluence) must match
exactly on the test streams.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.analyze.eta import EtaConfig, eta_state_machine
from wavespec_tpu.filters.biquad import bandpass_cycle
from wavespec_tpu.filters.kalman4d import kalman4d_filter
from wavespec_tpu.kernels.v757_tail_pallas import v757_tail_pallas
from wavespec_tpu.pipeline.v757 import V757Config
from wavespec_tpu.signals.followfirst import followfirst_signals


def _inputs(t=160, s=12, seed=0, batch=()):
    rng = np.random.default_rng(seed)
    tt = np.arange(t)
    shape = (*batch, t)
    newest = (100.0 + np.cumsum(0.05 * rng.standard_normal(shape), axis=-1)
              + 2.0 * np.sin(2 * np.pi * tt / 24)).astype(np.float32)
    base = rng.choice([20.0, 25.0, 32.0, 40.0, 48.0], size=(*batch, 1, s))
    drift = 1.0 + 0.01 * np.cumsum(
        rng.standard_normal((*batch, t, s)), axis=-2) / np.sqrt(t)
    periods = (base * drift).astype(np.float32)
    valid = rng.random((*batch, t, s)) > 0.15
    # invalid frames carry period 0 like the tracker's slot outputs
    periods = np.where(valid, periods, 0.0).astype(np.float32)
    gd = rng.standard_normal((*batch, t, s)).astype(np.float32) * 5.0
    price_prev = newest[..., :2] * 0.999
    return newest, price_prev.astype(np.float32), periods, valid, gd


def _xla_tail(newest, price_prev, periods, valid, gd, cfg, hop):
    s = periods.shape[-1]
    t = periods.shape[-2]
    periods_ts = np.swapaxes(periods, -1, -2)
    valid_ts = np.swapaxes(valid, -1, -2)
    cyc = bandpass_cycle(
        jnp.broadcast_to(jnp.asarray(newest)[..., None, :],
                         (*periods.shape[:-2], s, t)),
        jnp.asarray(periods_ts), cfg.bandwidth,
        valid=jnp.asarray(valid_ts),
        price_prev=jnp.asarray(price_prev)[..., None, :], zero_first=0)
    cyc_sv = np.swapaxes(np.asarray(cyc), -1, -2)
    cyc_sv = np.where(valid, cyc_sv, 0.0)
    eta = eta_state_machine(
        jnp.asarray(np.swapaxes(cyc_sv, -1, -2)),
        jnp.asarray(periods_ts),
        jnp.asarray(np.swapaxes(gd, -1, -2)),
        EtaConfig(mode=cfg.eta_mode, seconds_per_bar=cfg.seconds_per_bar,
                  fft_window=cfg.window,
                  prior_bars=(cfg.window - 1) // hop,
                  lag_buffer=max(64, int(cfg.max_period / 4.0) + 2)),
        valid=jnp.asarray(valid_ts))
    color = np.swapaxes(np.asarray(eta["color"]), -1, -2)
    eta_raw = np.swapaxes(np.asarray(eta["eta_raw"]), -1, -2)
    eta_disp = np.swapaxes(np.asarray(eta["eta_display"]), -1, -2)
    states = np.where(valid, np.where(color > 0.5, 1.0, -1.0), 0.0)

    def ff_one(st, er, per, act):
        out = followfirst_signals(
            jnp.asarray(st), jnp.asarray(er), jnp.asarray(per),
            jnp.asarray(act), cfg.followfirst)
        return np.asarray(out["sig"]), np.asarray(out["confluence"])

    if periods.ndim == 2:
        sig, conf = ff_one(states, eta_raw, periods, valid)
    else:
        outs = [ff_one(states[b], eta_raw[b], periods[b], valid[b])
                for b in range(periods.shape[0])]
        sig = np.stack([o[0] for o in outs])
        conf = np.stack([o[1] for o in outs])
    kal, _ = kalman4d_filter(jnp.asarray(newest), cfg.kalman)
    return {
        "cycle_values": cyc_sv, "color": color, "eta_raw": eta_raw,
        "eta_display": eta_disp, "states": states, "sig": sig,
        "confluence": conf, "kalman": np.asarray(kal),
    }


def _compare(got, want, spb):
    scale = max(1.0, np.abs(want["cycle_values"]).max())
    np.testing.assert_allclose(
        got["cycle_values"], want["cycle_values"], atol=2e-4 * scale,
        err_msg="cycle_values")
    np.testing.assert_array_equal(got["color"], want["color"])
    np.testing.assert_array_equal(got["states"], want["states"])
    # raw/display ETAs: the phase estimator runs atan2 on biquad outputs
    # that differ at f32 noise; compare in bars with a loose-but-tight
    # absolute band
    np.testing.assert_allclose(
        got["eta_raw"], want["eta_raw"], atol=5e-3, err_msg="eta_raw")
    np.testing.assert_allclose(
        got["eta_display"], want["eta_display"], atol=5e-3,
        err_msg="eta_display")
    np.testing.assert_array_equal(got["sig"], want["sig"])
    np.testing.assert_array_equal(got["confluence"], want["confluence"])
    if "kalman" in want:
        kscale = max(1.0, np.abs(want["kalman"]).max())
        np.testing.assert_allclose(
            got["kalman"], want["kalman"], atol=1e-4 * kscale,
            err_msg="kalman")


def test_tail_kernel_interpret_phase_mode():
    cfg = V757Config(window=256, min_period=18.0, max_period=52.0)
    hop = 4
    newest, pv, periods, valid, gd = _inputs(seed=1)
    got = v757_tail_pallas(
        jnp.asarray(newest), jnp.asarray(pv), jnp.asarray(periods),
        jnp.asarray(valid), jnp.asarray(gd), cfg, hop, interpret=True)
    got = {k: np.asarray(v) for k, v in got.items()}
    want = _xla_tail(newest, pv, periods, valid, gd, cfg, hop)
    _compare(got, want, cfg.seconds_per_bar)


def test_tail_kernel_interpret_hybrid_ff_single():
    from wavespec_tpu.analyze.eta import EtaMode
    from wavespec_tpu.signals.followfirst import FollowFirstConfig

    cfg = V757Config(
        window=256, min_period=18.0, max_period=52.0,
        eta_mode=EtaMode.HYBRID,
        followfirst=FollowFirstConfig(
            allow_multiple_signals=False, entry_bars_before_end=2,
        ),
    )
    hop = 4
    newest, pv, periods, valid, gd = _inputs(seed=2)
    got = v757_tail_pallas(
        jnp.asarray(newest), jnp.asarray(pv), jnp.asarray(periods),
        jnp.asarray(valid), jnp.asarray(gd), cfg, hop, interpret=True)
    got = {k: np.asarray(v) for k, v in got.items()}
    want = _xla_tail(newest, pv, periods, valid, gd, cfg, hop)
    _compare(got, want, cfg.seconds_per_bar)


def test_tail_kernel_interpret_batched():
    cfg = V757Config(window=256, min_period=18.0, max_period=52.0,
                     enable_kalman=False)
    hop = 4
    newest, pv, periods, valid, gd = _inputs(t=96, seed=3, batch=(3,))
    got = v757_tail_pallas(
        jnp.asarray(newest), jnp.asarray(pv), jnp.asarray(periods),
        jnp.asarray(valid), jnp.asarray(gd), cfg, hop, interpret=True)
    got = {k: np.asarray(v) for k, v in got.items()}
    want = _xla_tail(newest, pv, periods, valid, gd, cfg, hop)
    assert "kalman" not in got
    want.pop("kalman")
    _compare(got, want, cfg.seconds_per_bar)


def test_tail_kernel_interpret_resume_batched():
    """Chunked resume (init=) == one-shot, BITWISE, with a symbol batch —
    the fleet online driver's device tail path (V757OnlineDriver(batch=B)
    routes here on a real chip). The kernel's per-frame arithmetic is
    identical whether the scratch was zero-initialized or loaded from the
    19 init blocks, so every output field and every packed state row must
    match exactly."""
    cfg = V757Config(window=256, min_period=18.0, max_period=52.0)
    hop = 1
    newest, pv, periods, valid, gd = _inputs(t=96, seed=5, batch=(3,))
    args = (jnp.asarray(newest), jnp.asarray(pv), jnp.asarray(periods),
            jnp.asarray(valid), jnp.asarray(gd))
    want, wstate = v757_tail_pallas(
        *args, cfg, hop, interpret=True, return_state=True)

    cuts = [0, 1, 18, 64, 96]   # includes a single-frame serving tick
    outs = []
    st = None
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        # price_prev is only read by the FIRST (init=None) chunk; resumed
        # chunks carry their own xh history in the state, so passing the
        # same (stale) pv proves it is ignored.
        o, st = v757_tail_pallas(
            jnp.asarray(newest[..., lo:hi]), jnp.asarray(pv),
            jnp.asarray(periods[..., lo:hi, :]),
            jnp.asarray(valid[..., lo:hi, :]),
            jnp.asarray(gd[..., lo:hi, :]),
            cfg, hop, interpret=True, init=st, return_state=True)
        outs.append({k: np.asarray(v) for k, v in o.items()})
    for k in want:
        ax = -2 if np.asarray(want[k]).ndim == 3 else -1
        got = np.concatenate([o[k] for o in outs], axis=ax)
        np.testing.assert_array_equal(got, np.asarray(want[k]), err_msg=k)
    for f in wstate._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(st, f)), np.asarray(getattr(wstate, f)),
            err_msg=f)
