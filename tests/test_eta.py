"""ETA estimator and state-machine tests."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.analyze.eta import (
    EtaConfig,
    EtaMode,
    eta_phase_next_extremum,
    eta_realfft,
    eta_scientific,
    eta_state_machine,
)


def test_eta_phase_formula():
    # pure cycle: v(t) = sin(wt); lag q ~ period/4 -> Q = sin(w(t-q)) ~ -cos(wt)
    period, spb = 40.0, 60.0
    t = 10.0
    w = 2 * np.pi / period
    v_now = np.sin(w * t)
    v_lag = np.sin(w * (t - 10.0))
    eta = float(eta_phase_next_extremum(jnp.float32(v_now), jnp.float32(v_lag), period, spb))
    phi = np.arctan2(v_lag, v_now) % (2 * np.pi)
    want = (np.ceil(phi / np.pi) * np.pi - phi) / (2 * np.pi) * period * spb
    np.testing.assert_allclose(eta, min(want, 1.5 * period * spb), rtol=1e-5)


def test_eta_realfft_clamped():
    assert float(eta_realfft(jnp.float32(1000.0), 40.0, 60.0)) == 1.5 * 40 * 60
    np.testing.assert_allclose(float(eta_realfft(jnp.float32(-10.0), 40.0, 60.0)), 600.0)
    assert float(eta_realfft(jnp.float32(10.0), 0.0, 60.0)) == 0.0


def test_eta_scientific_blend():
    got = float(eta_scientific(jnp.float32(4.0), 2400.0, 0.5, 60.0))
    # base 1200 + 0.25 * gd_sec(240) = 1260
    np.testing.assert_allclose(got, 1200.0 + 0.25 * 240.0, rtol=1e-6)
    # adjustment clamp: gd seconds capped at 25% of phase length
    got = float(eta_scientific(jnp.float32(1e6), 2400.0, 0.5, 60.0))
    np.testing.assert_allclose(got, 1200.0 + 0.25 * 600.0, rtol=1e-6)


def machine(vals, period=32.0, mode=EtaMode.PHASE_NEXT_EXTREMUM, gd=0.0):
    t = len(vals)
    cfg = EtaConfig(mode=mode, seconds_per_bar=60.0)
    out = eta_state_machine(
        jnp.asarray(vals, jnp.float32),
        jnp.full(t, period, jnp.float32),
        jnp.full(t, gd, jnp.float32),
        cfg,
    )
    return {k: np.asarray(v) for k, v in out.items()}


def test_color_follows_slope():
    t = np.arange(200)
    vals = np.sin(2 * np.pi * t / 32)
    out = machine(vals)
    rising = np.diff(vals) >= 0
    np.testing.assert_array_equal(out["color"][1:], rising.astype(np.float32))


def test_eta_countdown_monotonic_within_phase():
    t = np.arange(200)
    vals = np.sin(2 * np.pi * t / 32)
    out = machine(vals)
    eta = out["eta_seconds"]
    color = out["color"]
    for i in range(50, 190):
        if color[i] == color[i - 1] and eta[i - 1] > 0:
            assert eta[i] <= eta[i - 1] - 60.0 + 1e-3 or eta[i] == 0.0


def test_eta_sign_and_display_floor():
    t = np.arange(120)
    vals = np.sin(2 * np.pi * t / 32)
    out = machine(vals)
    color = out["color"]
    disp = out["eta_display"]
    # bearish bars have non-positive display, bullish >= +1
    bull = (color > 0.5) & (np.arange(120) > 5)
    bear = (color <= 0.5) & (np.arange(120) > 5)
    assert (disp[bull] >= 1.0 - 1e-6).all()
    assert (disp[bear] <= 0.0 + 1e-6).all()


def test_eta_phase_predicts_extremum_on_pure_cycle():
    """On a clean sinusoid the phase ETA at each bar should roughly equal
    the true bars until the next peak/trough."""
    period = 32
    t = np.arange(300)
    vals = np.sin(2 * np.pi * t / period)
    out = machine(vals, period=float(period))
    eta_bars = np.abs(out["eta_raw"])
    # find true extrema positions
    for i in range(100, 260):
        if eta_bars[i] > 0:
            # next extremum of sin at phase pi/2 + m*pi
            phase = 2 * np.pi * i / period
            dist = ((np.pi / 2 - phase) % np.pi) / (2 * np.pi) * period
            # countdown constraint may pull estimates down; allow slack
            assert eta_bars[i] <= dist + 2.5


def test_hybrid_mode_learns_phase_durations():
    period = 32
    t = np.arange(400)
    vals = np.sin(2 * np.pi * t / period)
    out = machine(vals, period=float(period), mode=EtaMode.HYBRID)
    # after several phase changes, hybrid ETA is positive and bounded
    eta = out["eta_seconds"][200:]
    assert (eta >= 0).all()
    assert (eta <= 1.5 * 2 * period * 60).all()
    assert (eta > 0).any()


def test_zero_period_gives_zero_eta():
    vals = np.sin(2 * np.pi * np.arange(50) / 16)
    out = machine(vals, period=0.0)
    assert (out["eta_seconds"] == 0).all()
    assert (out["eta_display"] == 0).all()


def test_batched_slots():
    t = np.arange(100)
    vals = np.stack([np.sin(2 * np.pi * t / 16), np.cos(2 * np.pi * t / 32)])
    cfg = EtaConfig()
    out = eta_state_machine(
        jnp.asarray(vals, jnp.float32),
        jnp.full((2, 100), 16.0, jnp.float32),
        jnp.zeros((2, 100), jnp.float32),
        cfg,
    )
    assert out["color"].shape == (2, 100)


def test_leak_eta_bars():
    import jax.numpy as jnp
    from wavespec_tpu.analyze.eta import leak_eta_bars

    active = jnp.asarray([True, True, False])
    period = jnp.asarray([10.0, 10.0, 10.0])
    bars = jnp.asarray([2, 2, 2])
    gd = jnp.asarray([0.0, 0.0, 0.0])
    main_eta = jnp.asarray([5.0, -5.0, 5.0])  # bull, bear, inactive
    out = np.asarray(leak_eta_bars(active, period, bars, gd, main_eta, 60.0))
    # target = max(1, 10, 2) = 10 bars; progress = 0.2;
    # scientific eta = (1-0.2)*600s = 480s = 8 bars
    np.testing.assert_allclose(out[0], 8.0, rtol=1e-5)
    np.testing.assert_allclose(out[1], -8.0, rtol=1e-5)  # signed by main
    assert out[2] == 0.0  # inactive


def test_machine_realfft_mode():
    t = np.arange(150)
    vals = np.sin(2 * np.pi * t / 32)
    out = eta_state_machine(
        jnp.asarray(vals, jnp.float32),
        jnp.full(150, 32.0, jnp.float32),
        jnp.full(150, 8.0, jnp.float32),  # group delay 8 bars
        EtaConfig(mode=EtaMode.REALFFT, seconds_per_bar=60.0),
    )
    eta = out["eta_seconds"]
    # group-delay mode: eta ~ |tau_g| * spb at phase starts, monotone within
    assert (eta[1:] <= 8.0 * 60.0 + 1e-3).all()
    assert (eta >= 0).all()


def test_eta_machine_resume_bitwise():
    """Chunked runs with EtaMachineState handoff == one-shot, including
    the lag ring's absolute positions and the phase-duration histories."""
    r = np.random.default_rng(11)
    t, s = 320, 6
    vals = np.cumsum(r.normal(size=(s, t)), axis=1).astype(np.float32)
    periods = (24 + 8 * np.sin(np.arange(t) / 40))[None, :].repeat(s, 0)
    periods = periods.astype(np.float32)
    gd = r.normal(size=(s, t)).astype(np.float32)
    valid = r.random((s, t)) > 0.2
    for mode in (EtaMode.PHASE_NEXT_EXTREMUM, EtaMode.REALFFT, EtaMode.HYBRID):
        for prior in (0, 9):
            cfg = EtaConfig(mode=mode, prior_bars=prior)
            full = eta_state_machine(
                jnp.asarray(vals), jnp.asarray(periods), jnp.asarray(gd),
                cfg, valid=jnp.asarray(valid),
            )
            cut = 137
            o1, st = eta_state_machine(
                jnp.asarray(vals[:, :cut]), jnp.asarray(periods[:, :cut]),
                jnp.asarray(gd[:, :cut]), cfg,
                valid=jnp.asarray(valid[:, :cut]), return_state=True,
            )
            o2 = eta_state_machine(
                jnp.asarray(vals[:, cut:]), jnp.asarray(periods[:, cut:]),
                jnp.asarray(gd[:, cut:]), cfg,
                valid=jnp.asarray(valid[:, cut:]), init=st,
            )
            for k in full:
                np.testing.assert_array_equal(
                    np.concatenate([np.asarray(o1[k]), np.asarray(o2[k])],
                                   axis=1),
                    np.asarray(full[k]),
                    err_msg=f"{k} mode={mode} prior={prior}",
                )
