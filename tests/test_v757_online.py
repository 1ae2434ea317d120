"""V757OnlineDriver: bitwise chunked == one-shot parity (VERDICT r3 #1).

The reference's production mode is incremental — persistent tracker/ETA/
signal/Kalman globals survive `OnCalculate` ticks and only new bars are
processed (`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:3186-3342`, state at
`:966-986,1415-1530`). The driver must reproduce the one-shot
`run_v757` BITWISE for any chunking of the same history, on every
backend — the same standard the resumable primitives are pinned to.
"""

import dataclasses

import numpy as np
import pytest

from wavespec_tpu.analyze.eta import EtaMode
from wavespec_tpu.extract import DetrendMode
from wavespec_tpu.ops.windows import WindowType
from wavespec_tpu.pipeline import V757Config, run_v757
from wavespec_tpu.pipeline.online import V757OnlineDriver

W = 256
BASE = dict(window=W, min_period=18.0, max_period=52.0, trend_period=128,
            n_candidates=8, resumable=True)


def series(n_bars, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n_bars)
    return (100 + np.cumsum(0.01 * rng.standard_normal(n_bars))
            + 1.5 * np.sin(2 * np.pi * t / 26)
            + 0.8 * np.sin(2 * np.pi * t / 40)).astype(np.float32)


def drive(cfg, s, chunks):
    drv = V757OnlineDriver(cfg)
    lo = 0
    for c in chunks:
        drv.update(s[lo : lo + c])
        lo += c
    assert lo == len(s)
    return drv


def assert_bitwise(got: dict, want: dict):
    """Every field bitwise — except `kalman` on CPU, allowed <= 2 ulp.

    The 4D Kalman display buffer (reference plot buffer WaveKalman,
    `pla-kalman.mq5:3409-3420` — feeds NOTHING downstream) is the one
    field whose chunked CPU recursion can drift: XLA CPU's LLVM codegen
    of a scan body is length-dependent (fast-math FMA/reassociation on
    loop-carried values), and with every product, sum, sqrt and division
    individually pinned by optimization_barrier (filters/kalman4d.py)
    the residual is 1 ulp per rare near-tie; randomized chunkings (more
    scan-length contexts along one history) accumulate at most 2 ulps
    on isolated bars. On a real device the Kalman runs inside the tail
    Pallas kernel, where chunked == one-shot IS bitwise (chip-verified).
    """
    assert set(got) == set(want)
    for k in want:
        assert got[k].dtype == want[k].dtype, k
        if k == "kalman":
            a, b = want[k], got[k]
            ulp = np.spacing(np.maximum(np.abs(a), np.abs(b)).astype(np.float32))
            assert np.all(np.abs(a - b) <= 2 * ulp), (
                f"kalman drift beyond 2 ulp: {np.abs(a - b).max()}"
            )
        else:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


# Chunk pattern mixing every interesting boundary: sub-window warmup,
# single bars (the serving tick), exact 128-frame blocks, block-crossing
# chunks, and a straggler tail.
CHUNKS = [100, W - 100 + 67, 1, 1, 59, 128, 3, 97]


@pytest.mark.slow
def test_online_matches_oneshot_default():
    cfg = V757Config(**BASE)
    s = series(W + sum(CHUNKS) - W)
    s = series(sum(CHUNKS))
    drv = drive(cfg, s, CHUNKS)
    want = run_v757(s, cfg)
    assert drv.frames_done == len(s) - W + 1
    assert_bitwise(drv.buffers(), want)


@pytest.mark.slow
def test_online_matches_oneshot_sliding():
    """Force the sliding block path on CPU — the exact structure the
    real-chip driver uses (chip parity is checked by the verify drive)."""
    cfg = V757Config(**{**BASE, "sliding_spectral": True})
    s = series(sum(CHUNKS), seed=9)
    drv = drive(cfg, s, CHUNKS)
    assert_bitwise(drv.buffers(), run_v757(s, cfg))


def test_online_one_bar_at_a_time():
    """Strict serving cadence: one bar per update()."""
    cfg = V757Config(**BASE)
    n = W + 150
    s = series(n, seed=11)
    drv = V757OnlineDriver(cfg)
    drv.update(s[: W - 1])          # warmup: no frame yet
    assert drv.frames_done == 0
    for i in range(W - 1, n):
        rows = drv.update(s[i : i + 1])
        assert rows["slot_period"].shape[0] == 1
    assert_bitwise(drv.buffers(), run_v757(s, cfg))


@pytest.mark.slow
def test_online_all_bins_reference_mode():
    """n_candidates=0 (reference-exact all-bins candidate scan)."""
    cfg = V757Config(**{**BASE, "n_candidates": 0})
    s = series(W + 200, seed=5)
    drv = drive(cfg, s, [W + 20, 40, 140])
    assert_bitwise(drv.buffers(), run_v757(s, cfg))


@pytest.mark.slow
def test_online_hybrid_eta_no_kalman_nodetrend():
    cfg = V757Config(**{**BASE, "eta_mode": EtaMode.HYBRID,
                        "enable_kalman": False,
                        "detrend": DetrendMode.NONE,
                        "taper": WindowType.HANN})
    s = series(W + 170, seed=7)
    drv = drive(cfg, s, [W + 1, 1, 167, 1])
    out = drv.buffers()
    assert "kalman" not in out
    assert_bitwise(out, run_v757(s, cfg))


@pytest.mark.slow
def test_online_no_repaint():
    """Emitted rows never change when more bars arrive."""
    cfg = V757Config(**BASE)
    s = series(W + 300, seed=13)
    drv = V757OnlineDriver(cfg)
    drv.update(s[: W + 100])
    snap = {k: v.copy() for k, v in drv.buffers().items()}
    drv.update(s[W + 100 :])
    out = drv.buffers()
    for k, v in snap.items():
        np.testing.assert_array_equal(out[k][: len(v)], v, err_msg=k)


def test_online_autopromotes_resumable():
    cfg = V757Config(**{**BASE, "resumable": False})
    drv = V757OnlineDriver(cfg)
    assert drv.cfg.resumable


def test_resumable_oneshot_close_to_default():
    """`resumable=True` is the same math with block-fixed summation
    grouping — floats agree to f32 noise on this gate series and the
    discrete outputs (slots, uids, signals) agree exactly."""
    s = series(W + 300, seed=3)
    cfg_d = V757Config(**{**BASE, "resumable": False})
    cfg_r = V757Config(**BASE)
    a = run_v757(s, cfg_d)
    b = run_v757(s, cfg_r)
    for k in a:
        if a[k].dtype.kind in "bi":
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        else:
            sc = np.abs(a[k]).max() + 1e-9
            assert np.abs(a[k] - b[k]).max() / sc < 1e-4, k


def test_online_rejects_hop_detrend():
    with pytest.raises(ValueError, match="EHLERS/NONE"):
        V757OnlineDriver(V757Config(**{**BASE, "detrend": DetrendMode.LINEAR}))


# ---------------------------------------------------------------- fleet


def batch_series(n_bars, n_sym, seed0=3):
    return np.stack([series(n_bars, seed0 + 2 * b) for b in range(n_sym)])


@pytest.mark.slow
def test_online_fleet_matches_batch_oneshot():
    """V757OnlineDriver(batch=B) == run_v757_batch bitwise under the
    standard mixed chunking — the composition of the reference's fleet
    precompute (`WaveCyclesBatchFetcher.mq5:91-143`) and persistent
    replay (`pla-kalman.mq5:3186-3342`) as ONE lockstep driver."""
    from wavespec_tpu.pipeline import run_v757_batch

    cfg = V757Config(**BASE)
    n = sum(CHUNKS)
    batch = batch_series(n, 3)
    want = run_v757_batch(batch, cfg)
    drv = V757OnlineDriver(cfg, batch=3)
    lo = 0
    for c in CHUNKS:
        drv.update(batch[:, lo : lo + c])
        lo += c
    assert drv.frames_done == n - W + 1
    assert_bitwise(drv.buffers(), want)


def test_online_fleet_one_bar_ticks():
    """Fleet serving cadence: one lockstep bar per update()."""
    from wavespec_tpu.pipeline import run_v757_batch

    cfg = V757Config(**BASE)
    n = W + 80
    batch = batch_series(n, 2, seed0=21)
    drv = V757OnlineDriver(cfg, batch=2)
    drv.update(batch[:, : W - 1])
    assert drv.frames_done == 0
    for i in range(W - 1, n):
        rows = drv.update(batch[:, i : i + 1])
        assert rows["slot_period"].shape == (2, 1, cfg.tracker.n_slots)
    assert_bitwise(drv.buffers(), run_v757_batch(batch, cfg))


def test_online_fleet_shape_guard():
    drv = V757OnlineDriver(V757Config(**BASE), batch=4)
    with pytest.raises(ValueError, match=r"\[batch=4"):
        drv.update(np.zeros((3, 10), np.float32))
    with pytest.raises(ValueError, match="batch must be"):
        V757OnlineDriver(V757Config(**BASE), batch=0)


# ------------------------------------------ randomized chunking + compiles


@pytest.mark.slow
def test_online_randomized_chunking_fuzz_and_program_count():
    """Seeded random splits of the history reproduce the one-shot
    bitwise, AND the canonical power-of-two step decomposition bounds
    jit compilation: at most len(_CANONICAL_STEPS) + 1 programs (one per
    canonical size plus the very first step, whose resume states are
    still None) no matter the cadence."""
    from wavespec_tpu.pipeline import online as O

    cfg = V757Config(**BASE)
    n = W + 500
    s = series(n, seed=42)
    want = run_v757(s, cfg)
    O._online_step._clear_cache()
    for fuzz_seed in (7, 19):
        drv = V757OnlineDriver(cfg)
        rng = np.random.default_rng(fuzz_seed)
        lo = 0
        while lo < n:
            c = min(int(rng.integers(1, 97)), n - lo)
            drv.update(s[lo : lo + c])
            lo += c
        assert_bitwise(drv.buffers(), want)
    assert (
        O._online_step._cache_size() <= len(O._CANONICAL_STEPS) + 1
    ), O._online_step._cache_size()


# ------------------------------------------------------- fast spectral


def assert_fast_close(got: dict, want: dict, rel=2e-4):
    """Fast-path gate: discrete fields exact on the gate series, floats
    within the tolerance-gated fast-path standard (the recurrence +
    re-anchor agree with the block recompute to f32 noise; slot_power
    carries the largest relative wobble)."""
    assert set(got) == set(want)
    for k in want:
        a, b = want[k], got[k]
        assert b.dtype == a.dtype, k
        if a.dtype.kind in "bi":
            np.testing.assert_array_equal(b, a, err_msg=k)
        else:
            sc = np.abs(a).max() + 1e-9
            assert np.abs(a - b).max() / sc < rel, (
                k, np.abs(a - b).max() / sc)


@pytest.mark.slow
def test_online_fast_spectral_matches_oneshot():
    """fast_spectral=True: the O(r) incremental sliding-DFT serving path
    reproduces the one-shot run to f32 noise under mixed chunking
    (VERDICT r4 item 4 — the opt-in non-bitwise fast path)."""
    cfg = V757Config(**BASE)
    s = series(sum(CHUNKS), seed=3)
    drv = V757OnlineDriver(cfg, fast_spectral=True)
    lo = 0
    for c in CHUNKS:
        drv.update(s[lo : lo + c])
        lo += c
    assert_fast_close(drv.buffers(), run_v757(s, cfg))


@pytest.mark.slow
def test_online_fast_spectral_fleet_one_bar_ticks():
    """Fast path + fleet batch, strict one-bar cadence (crosses a
    re-anchor boundary)."""
    from wavespec_tpu.pipeline import run_v757_batch

    cfg = V757Config(**BASE)
    n = W + 140
    batch = batch_series(n, 2, seed0=31)
    drv = V757OnlineDriver(cfg, batch=2, fast_spectral=True)
    drv.update(batch[:, : W + 100])
    for i in range(W + 100, n):
        drv.update(batch[:, i : i + 1])
    assert_fast_close(drv.buffers(), run_v757_batch(batch, cfg))


def test_online_fast_spectral_nodetrend():
    cfg = V757Config(**{**BASE, "detrend": DetrendMode.NONE,
                        "taper": WindowType.HANN})
    n = W + 135
    s = series(n, seed=23)
    drv = V757OnlineDriver(cfg, fast_spectral=True)
    drv.update(s[: W + 3])
    drv.update(s[W + 3 :])
    assert_fast_close(drv.buffers(), run_v757(s, cfg))


def test_online_fast_spectral_rejects_bartlett():
    with pytest.raises(ValueError, match="harmonic taper"):
        V757OnlineDriver(
            V757Config(**{**BASE, "taper": WindowType.BARTLETT}),
            fast_spectral=True,
        )
