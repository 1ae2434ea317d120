"""FollowFirst signal engine tests."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.signals import FollowFirstConfig, followfirst_signals


def run(states, eta=None, periods=50.0, active=None, **cfg_kw):
    states = np.asarray(states, np.float32)
    t, s = states.shape
    if eta is None:
        eta = 10.0 * states
    eta = np.asarray(eta, np.float32)
    per = np.full((t, s), periods, np.float32) if np.isscalar(periods) else np.asarray(periods)
    act = np.ones((t, s), bool) if active is None else np.asarray(active)
    out = followfirst_signals(
        jnp.asarray(states), jnp.asarray(eta), jnp.asarray(per), jnp.asarray(act),
        FollowFirstConfig(**cfg_kw),
    )
    return {k: np.asarray(v) for k, v in out.items()}


def col(x, s=12):
    """Build a [t, 12] state array from a single-cycle column."""
    t = len(x)
    a = np.zeros((t, s), np.float32)
    a[:, 0] = x
    return a


def test_buy_signal_on_bull_turn():
    out = run(col([-1, -1, 1, 1]))
    np.testing.assert_allclose(out["sig"][:, 0], [0, 0, 100, 0])


def test_sell_signal_on_bear_turn():
    out = run(col([1, 1, -1, -1]))
    np.testing.assert_allclose(out["sig"][:, 0], [0, 0, -100, 0])


def test_same_direction_suppression():
    # bull turn; the intervening bear turn is filtered out of band, so the
    # second bull turn is a consecutive same-direction signal -> suppressed
    states = col([-1, 1, -1, 1])
    periods = np.full((4, 12), 50.0, np.float32)
    periods[2, 0] = 10.0  # bear turn filtered (below min_period)
    out = run(states, periods=periods, ignore_same_direction=True)
    sig = out["sig"][:, 0]
    assert sig[1] == 100
    assert sig[2] == 0
    assert sig[3] == 0  # suppressed: same direction as last signal
    out2 = run(states, periods=periods, ignore_same_direction=False)
    assert out2["sig"][3, 0] == 100


def test_period_band_filter():
    out = run(col([-1, -1, 1]), periods=10.0)  # below min 15
    assert (out["sig"] == 0).all()
    out = run(col([-1, -1, 1]), periods=150.0)  # above max 100
    assert (out["sig"] == 0).all()


def test_no_history_no_signal():
    # first bar has prev_state == 0 -> never signals at bar 1
    out = run(col([1, 1]))
    assert (out["sig"] == 0).all()


def test_pre_signal_eta_crossing():
    t = 6
    states = np.ones((t, 12), np.float32) * 0
    states[:, 0] = 1.0
    eta = np.zeros((t, 12), np.float32)
    eta[:, 0] = [9, 8, 7, 3, 2, 1]  # crosses threshold 3 at bar 3
    out = run(states, eta=eta, entry_bars_before_end=3)
    sig = out["sig"][:, 0]
    assert sig[3] == -60.0  # bullish phase ending -> pre-sell
    assert (sig[[0, 1, 2, 4, 5]] == 0).all()


def test_follow_first_single_position_mode():
    # two cycles turn on different bars; single mode claims the first,
    # blocks the second until exit
    states = np.zeros((6, 12), np.float32)
    states[:, 0] = [-1, -1, 1, 1, 1, 1]   # turns at bar 2
    states[:, 1] = [-1, -1, -1, 1, 1, 1]  # turns at bar 3
    eta = 20.0 * states  # |eta| 20 >> exit threshold -> no release
    out = run(states, eta=eta, allow_multiple_signals=False)
    assert out["sig"][2, 0] == 100
    assert out["sig"][3, 1] == 0  # blocked by open position
    assert out["position_cycle"][2] == 0


def test_position_released_when_eta_small():
    states = np.zeros((6, 12), np.float32)
    states[:, 0] = [-1, -1, 1, 1, 1, 1]
    states[:, 1] = [-1, -1, -1, -1, 1, 1]
    eta = 20.0 * states
    eta[3:, 0] = 2.0  # |eta| <= exit 3 -> release at bar 3
    out = run(states, eta=eta, allow_multiple_signals=False)
    assert out["position_cycle"][2] == 0
    assert out["sig"][4, 1] == 100  # slot 1 can claim after release
    assert out["position_cycle"][4] == 1


def test_confluence():
    # 2 active cycles, both turn bullish same bar -> 100% >= 80%
    states = np.zeros((3, 12), np.float32)
    states[:, 0] = [-1, -1, 1]
    states[:, 1] = [-1, -1, 1]
    active = np.zeros((3, 12), bool)
    active[:, :2] = True
    out = run(states, active=active)
    assert out["confluence"][2] == 3.0
    # only one of three turns -> 33% < 80%
    active2 = np.zeros((3, 12), bool)
    active2[:, :3] = True
    out2 = run(states[:, :], active=active2)
    states2 = states.copy()
    states2[:, 1] = [-1, -1, -1]
    out3 = run(states2, active=active2)
    assert out3["confluence"][2] == 0.0


def test_disabled():
    out = run(col([-1, 1]), enable=False)
    assert (out["sig"] == 0).all()


def test_followfirst_resume_bitwise():
    """Chunked runs with FollowFirstState handoff == one-shot: absolute
    bar indices keep suppression and position bookkeeping consistent."""
    r = np.random.default_rng(7)
    t, s = 260, 12
    vals = np.cumsum(r.normal(size=(t, s)), axis=0)
    states = np.where(
        r.random((t, s)) > 0.1, np.where(vals >= 0, 1.0, -1.0), 0.0
    ).astype(np.float32)
    eta_raw = (r.random((t, s)) * 10 - 5).astype(np.float32)
    periods = np.full((t, s), 30.0, np.float32)
    active = states != 0
    for ams in (True, False):
        cfg = FollowFirstConfig(
            entry_bars_before_end=2, allow_multiple_signals=ams
        )
        full = followfirst_signals(
            jnp.asarray(states), jnp.asarray(eta_raw), jnp.asarray(periods),
            jnp.asarray(active), cfg,
        )
        cut = 101
        o1, st = followfirst_signals(
            jnp.asarray(states[:cut]), jnp.asarray(eta_raw[:cut]),
            jnp.asarray(periods[:cut]), jnp.asarray(active[:cut]), cfg,
            return_state=True,
        )
        o2 = followfirst_signals(
            jnp.asarray(states[cut:]), jnp.asarray(eta_raw[cut:]),
            jnp.asarray(periods[cut:]), jnp.asarray(active[cut:]), cfg,
            init=st,
        )
        for k in full:
            np.testing.assert_array_equal(
                np.concatenate([np.asarray(o1[k]), np.asarray(o2[k])]),
                np.asarray(full[k]),
                err_msg=f"{k} multi={ams}",
            )
