"""Filter-layer tests vs sequential NumPy oracles of the reference math."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.filters import (
    Kalman4DConfig,
    KalmanWeightsConfig,
    bandpass_cycle,
    bin_contribution,
    kalman4d_filter,
    kalman_weights_filter,
)


def rng(seed=0):
    return np.random.default_rng(seed)


# --------------------------------------------------------------- kalman4d


def kalman4d_oracle(z, cfg: Kalman4DConfig):
    """Direct sequential port of the reference StepKalman4D semantics."""
    f = np.array(
        [[1, 1, 0.5, 1 / 6], [0, 1, 1, 0.5], [0, 0, 1, 1], [0, 0, 0, 1]],
        dtype=np.float64,
    )
    qs = max(0.05, cfg.follow_strength)
    q = np.diag(
        [max(1e-9, cfg.q_pos * qs), max(1e-9, cfg.q_vel * qs),
         max(1e-9, cfg.q_acc * qs), max(1e-9, cfg.q_jerk * qs)]
    )
    r = max(1e-9, cfg.r)
    x = np.array([z[0], cfg.init_vel, cfg.init_acc, cfg.init_jerk])
    p = np.diag([cfg.init_var_pos, cfg.init_var_vel, cfg.init_var_acc, cfg.init_var_jerk])
    out = []
    for zi in z:
        xp = f @ x
        pp = f @ p @ f.T + q
        y = zi - xp[0]
        s = pp[0, 0] + r
        if cfg.adapt_gain > 0:
            boost = min(5.0, abs(y) / np.sqrt(s)) * cfg.adapt_gain
            pp = pp + boost * q
            s = pp[0, 0] + r
        if cfg.clip_std > 0:
            lim = cfg.clip_std * np.sqrt(s)
            y = np.clip(y, -lim, lim)
        k = pp[:, 0] / s
        x = xp + k * y
        p = pp - np.outer(k, pp[0, :])
        np.fill_diagonal(p, np.maximum(np.diag(p), 1e-12))
        out.append(x[0])
    return np.array(out)


def test_kalman4d_matches_oracle():
    cfg = Kalman4DConfig()
    z = np.cumsum(rng(0).standard_normal(300)).astype(np.float32) + 100.0
    got, xf = kalman4d_filter(jnp.asarray(z), cfg)
    want = kalman4d_oracle(z.astype(np.float64), cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-3)


def test_kalman4d_tracks_smooth_signal():
    t = np.arange(500)
    z = np.sin(2 * np.pi * t / 100).astype(np.float32)
    got, _ = kalman4d_filter(jnp.asarray(z), Kalman4DConfig())
    err = np.abs(np.asarray(got)[100:] - z[100:])
    assert err.mean() < 0.05


def test_kalman4d_batched():
    z = rng(1).standard_normal((3, 100)).astype(np.float32)
    got, xf = kalman4d_filter(jnp.asarray(z), Kalman4DConfig())
    assert got.shape == (3, 100) and xf.shape == (3, 4)
    one, _ = kalman4d_filter(jnp.asarray(z[1]), Kalman4DConfig())
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(one), rtol=1e-4, atol=1e-6)


def test_kalman4d_ema_blend():
    cfg = Kalman4DConfig(ema_blend_period=10.0)
    z = rng(2).standard_normal(50).astype(np.float32)
    got, _ = kalman4d_filter(jnp.asarray(z), cfg)
    base, _ = kalman4d_filter(jnp.asarray(z), Kalman4DConfig())
    assert not np.allclose(np.asarray(got), np.asarray(base))


# ---------------------------------------------------------- kalman weights


def kalman_weights_oracle(h, z, cfg):
    k = h.shape[1]
    w = np.zeros(k)
    p = np.full(k, max(1e-6, cfg.init_variance))
    out = []
    for t in range(len(z)):
        p = p + max(1e-9, cfg.q)
        residual = z[t] - np.sum(h[t] * w)
        innovation = max(1e-9, cfg.r) + np.sum(h[t] ** 2 * p)
        if innovation < 1e-9:
            innovation = cfg.r
        gain = p * h[t] / innovation
        w = w + gain * residual
        p = np.maximum((1 - gain * h[t]) * p, 1e-9)
        out.append(np.sum(w * h[t]))
    return np.array(out), w


def test_kalman_weights_matches_oracle():
    cfg = KalmanWeightsConfig()
    h = rng(3).standard_normal((200, 4))
    z = rng(4).standard_normal(200)
    got, wf = kalman_weights_filter(jnp.asarray(h, jnp.float32), jnp.asarray(z, jnp.float32), cfg)
    want, w_want = kalman_weights_oracle(h, z, cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(wf), w_want, rtol=1e-3, atol=1e-4)


def test_kalman_weights_learns_stationary_mix():
    """With persistent basis functions the weights converge to the mix."""
    t = np.arange(600)
    h = np.stack([np.sin(2 * np.pi * t / 50), np.sin(2 * np.pi * t / 121 + 1.0)], -1)
    z = 2.0 * h[:, 0] + 0.5 * h[:, 1]
    got, wf = kalman_weights_filter(
        jnp.asarray(h, jnp.float32), jnp.asarray(z, jnp.float32), KalmanWeightsConfig()
    )
    np.testing.assert_allclose(np.asarray(wf), [2.0, 0.5], atol=0.05)
    np.testing.assert_allclose(np.asarray(got)[-100:], z[-100:], atol=0.05)


def test_bin_contribution_formula():
    n = 256
    x = rng(5).standard_normal(n).astype(np.float32)
    spec = np.fft.rfft(x.astype(np.float64))[: n // 2]
    idx = np.array([5, 17])
    h = bin_contribution(jnp.asarray(spec.astype(np.complex64)), jnp.asarray(idx), n)
    n0 = n - 1
    ang = 2 * np.pi * idx * n0 / n
    want = (2 / n) * (spec[idx].real * np.cos(ang) - spec[idx].imag * np.sin(ang))
    np.testing.assert_allclose(np.asarray(h), want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ biquad


def biquad_oracle(x, period, bw=0.5):
    import math

    omega = 2 * np.pi / period
    bw = min(0.49, max(0.01, bw))
    alpha = np.sin(omega) * np.sinh(math.log(2) / 2 * bw * omega / np.sin(omega))
    a0 = 1 + alpha
    b0, b2 = alpha / a0, -alpha / a0
    a1, a2 = -2 * np.cos(omega) / a0, (1 - alpha) / a0
    y = np.zeros_like(x)
    for i in range(2, len(x)):
        y[i] = b0 * x[i] + b2 * x[i - 2] - a1 * y[i - 1] - a2 * y[i - 2]
    return y


def test_biquad_matches_sequential_oracle():
    x = rng(6).standard_normal(400).astype(np.float64)
    want = biquad_oracle(x, 32.0)
    got = np.asarray(bandpass_cycle(jnp.asarray(x, jnp.float32), 32.0))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    assert got[0] == 0.0 and got[1] == 0.0


def test_biquad_passes_target_period_attenuates_others():
    t = np.arange(2048)
    x_in = np.sin(2 * np.pi * t / 64).astype(np.float32)
    x_out = np.sin(2 * np.pi * t / 16).astype(np.float32)
    y_in = np.asarray(bandpass_cycle(jnp.asarray(x_in), 64.0))
    y_out = np.asarray(bandpass_cycle(jnp.asarray(x_out), 64.0))
    assert np.abs(y_in[500:]).max() > 0.7
    assert np.abs(y_out[500:]).max() < 0.2


def test_biquad_batched_periods():
    x = rng(7).standard_normal((3, 300)).astype(np.float32)
    periods = jnp.asarray([20.0, 40.0, 64.0])
    y = bandpass_cycle(jnp.asarray(x), periods)
    assert y.shape == (3, 300)
    one = bandpass_cycle(jnp.asarray(x[1]), 40.0)
    np.testing.assert_allclose(np.asarray(y[1]), np.asarray(one), rtol=2e-3, atol=1e-4)


# ------------------------------------------------------------ kalman wave


def test_kalman_wave_blend_converges_to_signal():
    from wavespec_tpu.filters import KalmanWaveConfig, kalman_wave

    n = 1024
    t = np.arange(n + 600)
    series = (2.0 * np.sin(2 * np.pi * t / 64)
              + 1.0 * np.sin(2 * np.pi * t / 32 + 0.7)).astype(np.float32)
    cfg = KalmanWaveConfig(window=n, top_k=4, min_period=10.0, max_period=200.0)
    blended, w_final, basis = kalman_wave(jnp.asarray(series), cfg, hop=1)
    blended = np.asarray(blended)
    measured = series[n - 1 :]
    # after the regressor settles, the blend tracks the measured close
    err = np.abs(blended[300:] - measured[300 : len(blended)])
    assert err.mean() < 0.2
    assert basis.shape == (len(blended), 4)


def test_kalman_wave_detrend_level_is_level_robust():
    """ROUND1 item 4: the reference regressor inflates weights to express a
    price LEVEL through a near-zero oscillatory basis; detrend_level=True
    regresses deviations and adds the mean back."""
    from wavespec_tpu.filters import KalmanWaveConfig, kalman_wave

    n = 1024
    t = np.arange(n + 600)
    wave = (2.0 * np.sin(2 * np.pi * t / 64)
            + 1.0 * np.sin(2 * np.pi * t / 32 + 0.7))
    series = (10_000.0 + wave).astype(np.float32)  # large level offset
    cfg = KalmanWaveConfig(window=n, top_k=4, min_period=10.0,
                           max_period=200.0, detrend_level=True)
    blended, _, _ = kalman_wave(jnp.asarray(series), cfg, hop=1)
    blended = np.asarray(blended)
    measured = series[n - 1 :]
    err = np.abs(blended[300:] - measured[300 : len(blended)])
    assert err.mean() < 0.3  # tracks at the 10k level

    # the faithful default degrades at this level (documents the quirk)
    cfg_raw = KalmanWaveConfig(window=n, top_k=4, min_period=10.0,
                               max_period=200.0)
    blended_raw = np.asarray(kalman_wave(jnp.asarray(series), cfg_raw, hop=1)[0])
    err_raw = np.abs(blended_raw[300:] - measured[300 : len(blended_raw)])
    assert err_raw.mean() > err.mean()


# ------------------------------------------------------------- resume


def test_kalman4d_resume_bitwise():
    """Chunked runs with state handoff == one-shot (the reference keeps
    the Kalman state in globals across OnCalculate ticks)."""
    z = np.cumsum(rng(3).normal(size=400)).astype(np.float32) + 50
    cfg = Kalman4DConfig(ema_blend_period=5.0)
    full, xf = kalman4d_filter(jnp.asarray(z), cfg)
    o1, st = kalman4d_filter(jnp.asarray(z[:170]), cfg, return_state=True)
    o2, st2 = kalman4d_filter(jnp.asarray(z[170:]), cfg, init=st,
                              return_state=True)
    chunked = np.concatenate([np.asarray(o1), np.asarray(o2)])
    np.testing.assert_array_equal(chunked, np.asarray(full))
    np.testing.assert_array_equal(np.asarray(st2.x), np.asarray(xf))


def test_kalman4d_resume_batched():
    z = rng(4).normal(size=(3, 200)).astype(np.float32)
    full, _ = kalman4d_filter(jnp.asarray(z))
    o1, st = kalman4d_filter(jnp.asarray(z[:, :90]), return_state=True)
    o2, _ = kalman4d_filter(jnp.asarray(z[:, 90:]), init=st,
                            return_state=True)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(o1), np.asarray(o2)], axis=1),
        np.asarray(full),
    )


def test_biquad_resume_continues_recursion():
    """y_prev + price_prev continue the filter across chunks: the
    associative-scan tree differs between lengths, so agreement is at
    f32 reassociation noise (the Pallas tail kernel's sequential
    recursion is bitwise; tests/test_v757_tail_pallas.py)."""
    r = rng(5)
    t, s = 300, 4
    price = np.cumsum(r.normal(size=t)).astype(np.float32) + 100
    p2 = np.broadcast_to(price[None, :], (s, t))
    periods = np.stack([np.full(t, 16.0 + 7 * k) for k in range(s)]).astype(
        np.float32
    )
    valid = r.random((s, t)) > 0.15
    full = np.asarray(
        bandpass_cycle(jnp.asarray(p2), jnp.asarray(periods),
                       valid=jnp.asarray(valid), zero_first=0)
    )
    cut = 157
    y1, st = bandpass_cycle(
        jnp.asarray(p2[:, :cut]), jnp.asarray(periods[:, :cut]),
        valid=jnp.asarray(valid[:, :cut]), zero_first=0, return_state=True,
    )
    y2 = bandpass_cycle(
        jnp.asarray(p2[:, cut:]), jnp.asarray(periods[:, cut:]),
        valid=jnp.asarray(valid[:, cut:]), zero_first=0, y_prev=st,
        price_prev=jnp.asarray(p2[:, cut - 2 : cut]),
    )
    chunked = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
    scale = np.abs(full).max()
    assert np.abs(chunked - full).max() <= 1e-5 * scale
    # state layout: (y[-2], y[-1]) of the first chunk
    np.testing.assert_array_equal(np.asarray(st)[:, 1], np.asarray(y1)[:, -1])
    np.testing.assert_array_equal(np.asarray(st)[:, 0], np.asarray(y1)[:, -2])
