"""Native runtime, cache IO, and async job queue tests."""

import struct
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavespec_tpu.runtime import (
    FeedCache,
    JobQueue,
    cycle_cache_filename,
    ensure_feed_cache,
    feed_cache_filename,
    load_cycle_cache,
    load_feed_cache,
    native_available,
    save_cycle_cache,
    save_feed_cache,
)


def test_native_library_builds():
    assert native_available(), "g++ build of native/wavespec_rt.cpp failed"


def test_filenames_match_reference_convention():
    assert feed_cache_filename("WaveSpecZZ", "EURUSD", "PERIOD_M1") == \
        "WaveSpecZZ_cache_EURUSD_PERIOD_M1.bin"
    assert cycle_cache_filename("EURUSD", "PERIOD_M1", 4096, 1, 10, 4) == \
        "WaveSpecZZ_cycles_EURUSD_PERIOD_M1_w4096_m1_ar10_k4.bin"


def test_feed_cache_roundtrip(tmp_path):
    data = np.random.default_rng(0).standard_normal(1000)
    p = tmp_path / "feed.bin"
    save_feed_cache(p, data)
    back = load_feed_cache(p)
    np.testing.assert_array_equal(back, data)
    # byte-level format: int32 count + doubles (MT5 FileWriteInteger/Array)
    raw = p.read_bytes()
    assert struct.unpack("<i", raw[:4])[0] == 1000
    np.testing.assert_array_equal(np.frombuffer(raw[4:], np.float64), data)


def test_feed_cache_reads_mt5_written_file(tmp_path):
    """A file produced by MT5's FileWriteInteger+FileWriteArray loads."""
    vals = np.arange(10, dtype=np.float64)
    p = tmp_path / "mt5.bin"
    p.write_bytes(struct.pack("<i", 10) + vals.tobytes())
    np.testing.assert_array_equal(load_feed_cache(p), vals)


def test_ensure_feed_cache_incremental(tmp_path):
    history = np.arange(500, dtype=np.float64)  # newest-first source

    calls = []

    def fetch(start, count):
        calls.append((start, count))
        return history[start : start + count]

    cache = FeedCache()
    ok, delta, from_file = ensure_feed_cache(
        cache, "EURUSD", "M1", 200, fetch, directory=tmp_path
    )
    assert ok and delta == 200 and not from_file
    # second ensure with more bars: loads file, fetches only the delta
    cache2 = FeedCache()
    calls.clear()
    ok, delta, from_file = ensure_feed_cache(
        cache2, "EURUSD", "M1", 300, fetch, directory=tmp_path
    )
    assert ok and from_file and delta == 100
    assert calls == [(200, 100)]
    np.testing.assert_array_equal(cache2.close, history[:300])


def test_ensure_feed_cache_symbol_change_resets(tmp_path):
    fetch = lambda start, count: np.ones(count)
    cache = FeedCache()
    ensure_feed_cache(cache, "EURUSD", "M1", 50, fetch, directory=tmp_path)
    ok, delta, _ = ensure_feed_cache(cache, "GBPUSD", "M1", 50, fetch, directory=tmp_path)
    assert ok and delta == 50  # full refetch


def test_cycle_cache_roundtrip(tmp_path):
    bars = 64
    rng = np.random.default_rng(1)
    buffers = {}
    from wavespec_tpu.runtime.caches import CYCLE_FIELDS
    for f in CYCLE_FIELDS:
        buffers[f"{f}1"] = rng.standard_normal(bars)
        buffers[f"{f}2"] = rng.standard_normal(bars)
    p = tmp_path / "cycles.bin"
    save_cycle_cache(p, buffers)
    back = load_cycle_cache(p)
    for k, v in buffers.items():
        np.testing.assert_array_equal(back[k], v)
    # header: version=1, bars, topk=2
    hdr = np.fromfile(p, np.int32, 3)
    np.testing.assert_array_equal(hdr, [1, bars, 2])


def test_cycle_cache_max_bars(tmp_path):
    from wavespec_tpu.runtime.caches import CYCLE_FIELDS
    buffers = {f"{f}{w}": np.arange(100, dtype=np.float64)
               for f in CYCLE_FIELDS for w in (1, 2)}
    p = tmp_path / "cycles.bin"
    save_cycle_cache(p, buffers)
    back = load_cycle_cache(p, max_bars=10)
    assert len(back["wave1"]) == 10


# -------------------------------------------------------------------- jobs


def test_device_job_submit_poll():
    q = JobQueue(depth=4)
    f = jax.jit(lambda x: x * 2.0)
    jid = q.submit(f, jnp.ones(128))
    res = q.result(jid)
    np.testing.assert_allclose(np.asarray(res), 2.0)
    ready, res2 = q.try_get(jid)
    assert ready
    q.free(jid)
    assert q.pending() == 0


def test_job_depth_limit():
    q = JobQueue(depth=2)
    f = jax.jit(lambda x: x + 1)
    q.submit(f, jnp.zeros(4))
    q.submit(f, jnp.zeros(4))
    with pytest.raises(RuntimeError, match="full"):
        q.submit(f, jnp.zeros(4))


def test_host_job_on_native_pool():
    q = JobQueue(depth=8, host_workers=2)
    jid = q.submit_host(lambda a, b: a + b, 20, 22)
    deadline = time.time() + 10
    while time.time() < deadline:
        ready, res = q.try_get(jid)
        if ready:
            break
        time.sleep(0.005)
    assert ready and res == 42
    q.free(jid)


def test_host_job_error_propagates():
    q = JobQueue(depth=8)

    def boom():
        raise ValueError("boom")

    jid = q.submit_host(boom)
    deadline = time.time() + 10
    with pytest.raises(ValueError, match="boom"):
        while time.time() < deadline:
            ready, _ = q.try_get(jid)
            if ready:
                break
            time.sleep(0.005)


def test_cycle_cache_rejects_bad_header(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(np.asarray([99, 10, 2], np.int32).tobytes() + b"\0" * 1600)
    with pytest.raises(RuntimeError):
        load_cycle_cache(p)


def test_feed_cache_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_feed_cache(tmp_path / "absent.bin")


def test_feed_cache_truncated(tmp_path):
    p = tmp_path / "trunc.bin"
    p.write_bytes(struct.pack("<i", 100) + b"\0" * 64)  # claims 100 doubles
    with pytest.raises(RuntimeError):
        load_feed_cache(p)


def test_concurrent_async_jobs():
    q = JobQueue(depth=16)
    f = jax.jit(lambda x, c: x * c)
    jids = [q.submit(f, jnp.ones(64), float(i)) for i in range(8)]
    for i, jid in enumerate(jids):
        res = q.result(jid)
        np.testing.assert_allclose(np.asarray(res), float(i))
        q.free(jid)
    assert q.pending() == 0


def test_cycle_cache_truncated_raises(tmp_path, monkeypatch):
    """A file whose header claims more bars than the payload holds must
    raise (matching the native loader's 'cycle cache truncated'), in BOTH
    the native and the NumPy-fallback paths — a silent short read would
    render incomplete buffers through the cache short-circuit."""
    p = tmp_path / "trunc.bin"
    # header says 10 bars; payload holds only 3 rows
    p.write_bytes(np.asarray([1, 10, 2], np.int32).tobytes() + b"\0" * (3 * 160))
    with pytest.raises(RuntimeError):
        load_cycle_cache(p)
    # force the NumPy fallback
    from wavespec_tpu.runtime import caches as C
    monkeypatch.setattr(C.native, "load", lambda: None)
    with pytest.raises(RuntimeError, match="truncated"):
        load_cycle_cache(p)
    # sub-header file
    p2 = tmp_path / "tiny.bin"
    p2.write_bytes(b"\1\0")
    with pytest.raises((RuntimeError, FileNotFoundError)):
        load_cycle_cache(p2)


def test_shutdown_with_queued_host_jobs_executes_them():
    """shutdown() must free pending native jobs (blocking until the pool
    has run them) BEFORE dropping the ctypes trampoline references — a
    queued job whose trampoline was garbage-collected would segfault the
    C worker. Slow jobs queued behind each other exercise the wait."""
    q = JobQueue(depth=16, host_workers=1)
    hits = []

    def slow(i):
        time.sleep(0.05)
        hits.append(i)
        return i

    ids = [q.submit_host(slow, i) for i in range(5)]
    q.shutdown()  # must not crash; blocks until all five ran
    assert sorted(hits) == [0, 1, 2, 3, 4], hits


def test_native_free_waits_for_running_job():
    """ws_free_job on a not-yet-finished job blocks until it executed
    (cv wait, id re-lookup) and returns cleanly under submit churn."""
    q = JobQueue(depth=32, host_workers=1)
    slow_id = q.submit_host(lambda: time.sleep(0.2) or 7)
    # churn the job table while the slow job runs (rehash pressure)
    others = [q.submit_host(lambda k=k: k) for k in range(10)]
    q.free(slow_id)  # blocks until the slow job has executed
    for jid in others:
        deadline = time.time() + 10
        while time.time() < deadline:
            ready, _ = q.try_get(jid)
            if ready:
                break
            time.sleep(0.005)
        assert ready
        q.free(jid)
    q.shutdown()
