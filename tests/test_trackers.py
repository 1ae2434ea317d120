"""Tracker / stable-slot / leakage state machine tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from wavespec_tpu.analyze.trackers import TrackerConfig, track_frames


def frames_from_lists(frames, j=8):
    """frames: list of lists of (period, power) tuples."""
    t = len(frames)
    periods = np.zeros((t, j), np.float32)
    powers = np.zeros((t, j), np.float32)
    fft = np.zeros((t, j), np.int32)
    valid = np.zeros((t, j), bool)
    for ti, cands in enumerate(frames):
        for ji, (p, w) in enumerate(cands):
            periods[ti, ji] = p
            powers[ti, ji] = w
            fft[ti, ji] = int(4096 / max(p, 1))
            valid[ti, ji] = True
    return jnp.asarray(periods), jnp.asarray(powers), jnp.asarray(fft), jnp.asarray(valid)


def run(frames, **cfg_kw):
    cfg = TrackerConfig(**cfg_kw)
    out, state = track_frames(*frames_from_lists(frames), cfg=cfg)
    return {k: np.asarray(v) for k, v in out.items()}, state


def test_tracker_persistence_and_slot_stability():
    # two cycles persist over frames with slight period drift
    frames = [
        [(64.0, 10.0), (30.0, 5.0)],
        [(64.5, 11.0), (30.2, 6.0)],
        [(63.8, 12.0), (29.9, 7.0)],
    ]
    out, _ = run(frames)
    # slot 0 holds the strongest (64-period) tracker every frame, same uid
    assert out["slot_valid"][:, 0].all() and out["slot_valid"][:, 1].all()
    np.testing.assert_allclose(out["slot_period"][:, 0], [64.0, 64.5, 63.8])
    np.testing.assert_allclose(out["slot_period"][:, 1], [30.0, 30.2, 29.9])
    assert len(set(out["slot_uid"][:, 0])) == 1  # identity preserved
    assert len(set(out["slot_uid"][:, 1])) == 1


def test_tolerance_split_creates_new_tracker():
    # 30 -> 40 exceeds 5% tolerance: the 30-tracker stays in slot 0 (alive
    # until max_inactive) and 40 becomes a NEW tracker in the next slot.
    frames = [[(30.0, 5.0)], [(40.0, 5.0)]]
    out, _ = run(frames)
    np.testing.assert_allclose(out["slot_period"][1, 0], 30.0)
    np.testing.assert_allclose(out["slot_period"][1, 1], 40.0)
    assert out["slot_uid"][1, 1] != out["slot_uid"][0, 0]


def test_absent_tracker_is_not_rematched():
    """Reference semantics: FindClosestTracker skips trackers with
    bars_inactive > 0, so a cycle that misses one frame re-enters as a NEW
    tracker; the old one holds its slot until max_inactive kills it."""
    frames = [[(64.0, 10.0)], [], [(64.0, 10.0)]]
    out, _ = run(frames)
    # old tracker still holds slot 0 at frame 1-2 (alive, inactive)
    assert out["slot_uid"][1, 0] == out["slot_uid"][0, 0]
    # returning candidate created a second tracker in slot 1
    assert out["slot_valid"][2, 1]
    assert out["slot_uid"][2, 1] != out["slot_uid"][0, 0]


def test_tracker_dies_after_max_inactive():
    frames = [[(64.0, 10.0)], [], [], [], [(64.0, 10.0)]]
    out, _ = run(frames)
    assert not out["slot_valid"][3, 0]  # dead by frame 3
    assert out["slot_uid"][0, 0] != out["slot_uid"][4, 0]  # re-added = new id


def test_slot_no_reorder_on_power_flip():
    """No-repaint policy: a slot keeps its tracker even when another
    becomes stronger (`UpdateStableSlots` keeps existing mappings)."""
    frames = [
        [(64.0, 10.0), (30.0, 5.0)],
        [(64.0, 4.0), (30.0, 20.0)],  # power flips
    ]
    out, _ = run(frames)
    np.testing.assert_allclose(out["slot_period"][:, 0], [64.0, 64.0])
    np.testing.assert_allclose(out["slot_period"][:, 1], [30.0, 30.0])


def test_leak_detection_and_expiry():
    # main cycle period 100; intruder period 20 (< 30%) with power 90 (>= 70%)
    frames = [[(100.0, 10.0)]] * 2 + [[(100.0, 10.0), (20.0, 9.5)]] * 3 \
        + [[(100.0, 10.0)]] * 2
    out, _ = run(frames)
    assert not out["leak_active"][1, 0]
    assert out["leak_active"][2, 0]
    np.testing.assert_allclose(out["leak_period"][2, 0], 20.0)
    assert out["leak_active"][4, 0]
    assert not out["leak_active"][5, 0]  # intruder gone -> leak cleared


def test_leak_requires_power_ratio():
    frames = [[(100.0, 10.0), (20.0, 2.0)]] * 3  # power 20% < 70% ratio
    out, _ = run(frames)
    assert not out["leak_active"].any()


def test_leak_persistent_intruder_stays_flagged():
    """Reference `DetectLeakages`: an expired leak is immediately
    re-triggered in the same bar while the intruder persists, so a
    continuous intruder keeps the flag set (only the bar counter resets)."""
    frames = [[(100.0, 10.0), (20.0, 9.5)]] * 12
    out, _ = run(frames, leak_max_bars=8)
    assert out["leak_active"][2:, 0].all()


def test_capacity_overflow_drops_extra():
    frames = [[(20.0 + i, 1.0 + i) for i in range(6)]]
    out, state = run(frames, capacity=4)
    assert int(np.asarray(state.alive).sum()) == 4


def test_conflict_loser_does_not_spawn_duplicate_tracker():
    """Two candidates both within tolerance of ONE tracker each frame:
    the conflict loser must neither update nor allocate (the reference's
    sequential scan would have it update the SAME tracker), so exactly
    one tracker stays alive — not a growing family of near-duplicates."""
    frames = [[(100.0, 5.0)]] + [[(100.0, 5.0), (101.0, 4.0)]] * 6
    out, state = run(frames)
    alive = np.asarray(state.alive)
    assert alive.sum() == 1, np.asarray(state.period)[alive]
    # the one tracker carries the winning (closest) candidate's period
    assert abs(np.asarray(state.period)[alive][0] - 100.0) < 1e-6


def test_valid_zero_period_candidate_does_not_allocate():
    """A cand_valid=True row with period 0 (padding) must not allocate —
    the sequential path's can_alloc has the same period>0 guard."""
    j = 4
    periods = jnp.asarray([[100.0, 0.0, 0.0, 0.0]], jnp.float32)
    powers = jnp.asarray([[5.0, 3.0, 2.0, 1.0]], jnp.float32)
    fft = jnp.zeros((1, j), jnp.int32)
    valid = jnp.ones((1, j), bool)
    _, state = track_frames(periods, powers, fft, valid, cfg=TrackerConfig())
    assert np.asarray(state.alive).sum() == 1


def _random_candidate_stream(t=40, j=6, seed=0, batch=()):
    """Adversarial candidate stream: clustered periods (tolerance
    collisions), dropouts (inactive kills), power inversions (slot
    churn), and tiny leak periods (leak machinery)."""
    rng = np.random.default_rng(seed)
    shape = (*batch, t, j)
    base = rng.choice([20.0, 21.0, 35.0, 36.5, 60.0, 9.0], size=shape)
    periods = (base * (1 + 0.02 * rng.standard_normal(shape))).astype(np.float32)
    powers = rng.gamma(2.0, 2.0, size=shape).astype(np.float32)
    valid = rng.random(shape) > 0.25
    fft = (4096 / np.maximum(periods, 1.0)).astype(np.int32)
    periods = np.where(valid, periods, 0.0).astype(np.float32)
    powers = np.where(valid, powers, 0.0).astype(np.float32)
    return (jnp.asarray(periods), jnp.asarray(powers), jnp.asarray(fft),
            jnp.asarray(valid))


@pytest.mark.parametrize("frames_per_step", [1, 3, 4])
def test_tracker_pallas_interpret_matches_xla_scan(frames_per_step):
    """The single-launch Pallas tracker (kernels.tracker_pallas) must
    reproduce the XLA scan bit-for-bit on every output and the final
    state — same matcher semantics, same tie-breaks, same uid order —
    at every frames-per-grid-step unroll (t=50 is divisible by none of
    the >1 unrolls, so the padded-tail state freeze is exercised)."""
    from wavespec_tpu.kernels.tracker_pallas import track_frames_pallas

    cfg = TrackerConfig(capacity=16, leak_min_bars=2)
    frames = _random_candidate_stream(t=50, j=6, seed=3)
    want, wstate = track_frames(*frames, cfg=cfg)
    got, gstate = track_frames_pallas(
        *frames, cfg, interpret=True, frames_per_step=frames_per_step)
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k
        )
    for f in wstate._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(gstate, f)), np.asarray(getattr(wstate, f)),
            err_msg=f,
        )


def test_track_frames_resume_matches_full_run():
    """Chunked runs with `init=` (the reference's persistent tracker
    globals across OnCalculate ticks) reproduce the one-shot run
    bitwise — XLA scan path."""
    cfg = TrackerConfig(capacity=16, leak_min_bars=2)
    frames = _random_candidate_stream(t=50, j=6, seed=9)
    want, wstate = track_frames(*frames, cfg=cfg)
    cut = 23
    head = tuple(f[:cut] for f in frames)
    tail = tuple(f[cut:] for f in frames)
    o1, s1 = track_frames(*head, cfg=cfg)
    o2, s2 = track_frames(*tail, cfg=cfg, init=s1)
    for k in want:
        got = np.concatenate([np.asarray(o1[k]), np.asarray(o2[k])])
        np.testing.assert_array_equal(got, np.asarray(want[k]), err_msg=k)
    for f in wstate._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(s2, f)), np.asarray(getattr(wstate, f)),
            err_msg=f,
        )


def test_tracker_pallas_resume_matches_full_run():
    """Same resume contract through the Pallas kernel (interpret),
    including a batched symbol axis."""
    from wavespec_tpu.kernels.tracker_pallas import track_frames_pallas

    cfg = TrackerConfig(capacity=16)
    frames = _random_candidate_stream(t=40, j=5, seed=13, batch=(3,))
    want, wstate = track_frames_pallas(*frames, cfg, interpret=True)
    cut = 17
    head = tuple(f[:, :cut] for f in frames)
    tail = tuple(f[:, cut:] for f in frames)
    o1, s1 = track_frames_pallas(*head, cfg, interpret=True)
    o2, s2 = track_frames_pallas(*tail, cfg, interpret=True, init=s1)
    for k in want:
        got = np.concatenate(
            [np.asarray(o1[k]), np.asarray(o2[k])], axis=1)
        np.testing.assert_array_equal(got, np.asarray(want[k]), err_msg=k)
    for f in wstate._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(s2, f)), np.asarray(getattr(wstate, f)),
            err_msg=f,
        )


def test_tracker_pallas_interpret_many_candidates():
    """J above J_CHUNK (the reference-exact all-bins candidate counts)
    exercises the multi-slab matching/alloc merge — still bitwise."""
    from wavespec_tpu.kernels import tracker_pallas as TP

    cfg = TrackerConfig(capacity=16, leak_min_bars=2)
    frames = _random_candidate_stream(t=24, j=TP.J_CHUNK + 9, seed=5)
    want, wstate = track_frames(*frames, cfg=cfg)
    got, gstate = TP.track_frames_pallas(*frames, cfg, interpret=True)
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(gstate.uid), np.asarray(wstate.uid))
    np.testing.assert_array_equal(
        np.asarray(gstate.next_uid), np.asarray(wstate.next_uid))


def test_tracker_pallas_interpret_batched():
    """Leading batch dims ride the lanes; every symbol matches its own
    single-series run exactly."""
    from wavespec_tpu.kernels.tracker_pallas import track_frames_pallas

    cfg = TrackerConfig(capacity=16)
    frames = _random_candidate_stream(t=30, j=5, seed=7, batch=(3,))
    got, gstate = track_frames_pallas(*frames, cfg, interpret=True)
    for bidx in range(3):
        single = tuple(f[bidx] for f in frames)
        want, wstate = track_frames(*single, cfg=cfg)
        for k in want:
            np.testing.assert_array_equal(
                np.asarray(got[k][bidx]), np.asarray(want[k]),
                err_msg=f"{k}[{bidx}]",
            )
        np.testing.assert_array_equal(
            np.asarray(gstate.uid[bidx]), np.asarray(wstate.uid))
        assert int(gstate.next_uid[bidx]) == int(wstate.next_uid)
