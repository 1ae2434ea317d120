"""Pipeline layer tests: session, preset spec, drivers."""

import numpy as np
import jax.numpy as jnp
import pytest

from wavespec_tpu.extract import ExtractConfig, Method
from wavespec_tpu.pipeline import (
    BatchFetcher,
    OnlineDriver,
    PipelineSpec,
    Session,
    batch_warmup,
    parse_preset,
    run_pipeline,
)
from wavespec_tpu.reconstruct import ReconstructConfig
from wavespec_tpu.runtime import Status, load_cycle_cache


def planted(n=1536, period=64.0, amp=2.0, seed=0):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * t / period)
            + 0.05 * np.random.default_rng(seed).standard_normal(n)).astype(np.float32)


def small_ecfg(method=Method.FFT_RIDGE, **kw):
    d = dict(window=1024, top_k=2, min_period=10.0, max_period=200.0, method=method)
    d.update(kw)
    return ExtractConfig(**d)


# ---------------------------------------------------------------- session


def test_session_init_shutdown():
    s = Session()
    assert s.init(0, 64) == Status.OK
    assert s.ready
    assert s.init(0, 64) == Status.OK  # idempotent
    s.shutdown()
    assert not s.ready


def test_session_bad_device_index():
    s = Session()
    st = s.init(999, 64)
    assert st == Status.BAD_ARGS
    assert "out of range" in s.get_last_error()


# -------------------------------------------------------------- preset DSL


def test_parse_preset_roundtrip():
    spec = parse_preset(
        "time: dc(mode=0) | zero_pad(left=0,right=0);"
        "freq: denoise(threshold=0.1,beta=0.75) | mask(low=0.1,high=0.9);"
        "extract: window=1024, top_k=2, method=music, min_period=10,"
        " max_period=200, ar_order=10; waves: 2"
    )
    assert [s.name for s in spec.time_stages] == ["dc", "zero_pad"]
    assert [s.name for s in spec.freq_stages] == ["denoise", "mask"]
    assert spec.extract.window == 1024
    assert spec.extract.method == Method.MUSIC
    assert spec.wave_slots == 2


def test_parse_preset_esprit_runs():
    """`method=esprit` is expressible in the DSL (VERDICT r3 item 7) and
    runs end-to-end: `Method.ESPRIT` matches the MUSIC/ESPRIT method slot
    (`WaveSpecZZ_1.1.0-gpuopt.mq5:50`)."""
    spec = parse_preset(
        "extract: window=1024, top_k=2, method=esprit, min_period=10,"
        " max_period=200, ar_order=10; waves: 2"
    )
    assert spec.extract.method == Method.ESPRIT
    out = run_pipeline(jnp.asarray(planted()), spec)
    assert out["attrs"].shape == (2, 15)
    periods = np.asarray(out["attrs"][:, 2])
    assert any(abs(p - 64.0) / 64.0 < 0.05 for p in periods if p > 0)


def test_parse_preset_rejects_bad_stage():
    with pytest.raises(ValueError):
        parse_preset("time: denoise(threshold=0.1)")  # freq stage in time slot


def test_run_pipeline_template_job_outputs():
    spec = parse_preset(
        "time: dc(mode=0); extract: window=1024, top_k=2, method=music,"
        " min_period=10, max_period=200, ar_order=10; waves: 2"
    )
    x = planted()
    out = run_pipeline(jnp.asarray(x), spec)
    assert out["attrs"].shape == (2, 15)
    assert out["fft"].shape == (512,)
    assert out["phase"].shape == (512,)
    assert out["group_delay"].shape == (512,)
    assert out["wave_values"].shape == (2,)
    periods = np.asarray(out["attrs"][:, 2])
    assert any(abs(p - 64.0) / 64.0 < 0.05 for p in periods if p > 0)
    assert np.isfinite(float(out["kalman_value"]))


def test_run_pipeline_filtered_output():
    spec = PipelineSpec(extract=small_ecfg(), emit_filtered=True)
    out = run_pipeline(jnp.asarray(planted()), spec)
    assert out["filtered"].shape == (1024,)


def test_segmented_preset_roundtrip_colored_slots():
    """VERDICT r1 item 4: parse -> run -> decode of a SEGMENTED preset must
    produce colored wave slots (`BuildWavePresetTemplate` grammar,
    `gpu_wip.mq5:550-572`; wave_colors `gpu_wip.mq5:227,675-679`)."""
    from wavespec_tpu.pipeline import build_wave_preset_template

    text = build_wave_preset_template(
        segment_len=256, overlap=64, mix_mode=0, top_cycles=2,
        min_period=10.0, max_period=200.0, wave_slots=2,
        stage_time="dc(mode=0)", window=1024,
    )
    spec = parse_preset(text)
    assert spec.segment is not None
    assert spec.segment.segment_len == 256
    assert spec.segment.resolved_overlap() == 64
    assert spec.extract.window == 1024
    assert [s.name for s in spec.time_stages] == ["dc"]

    out = run_pipeline(jnp.asarray(planted()), spec)
    # Segmented spectral products: segment_len/2 bins, not window/2.
    assert out["fft"].shape == (128,)
    assert out["phase"].shape == (128,)
    assert out["fft_power"].shape == (128,)
    assert np.all(np.asarray(out["fft_power"]) >= 0)  # ENERGY mix is power
    # Colored slots: bull/bear flags for the valid slots, in {0, 1}.
    colors = np.asarray(out["wave_colors"])
    assert colors.shape == (2,)
    assert set(np.unique(colors)).issubset({0.0, 1.0})
    # The planted 64-bar cycle must land in a slot with a color matching
    # its rising/falling state (cos(phase) sign).
    phases = np.asarray(out["attrs"][:, 3])
    periods = np.asarray(out["attrs"][:, 2])
    slot = int(np.argmin(np.abs(periods - 64.0)))
    assert colors[slot] == (1.0 if np.cos(phases[slot]) > 0 else 0.0)


def test_segmented_preset_auto_overlap():
    spec = parse_preset(
        "extract: window=1024, top_k=2, min_period=10, max_period=200;"
        " segment: len=256, auto_overlap=0.25; waves: 2"
    )
    assert spec.segment.resolved_overlap() == 64


# ----------------------------------------------------------------- drivers


@pytest.mark.slow
def test_batch_warmup_writes_cache(tmp_path):
    ecfg = small_ecfg(method=Method.MUSIC, ar_order=10)
    rcfg = ReconstructConfig()
    x = planted(2048)
    bufs = batch_warmup(
        x, symbol="EURUSD", timeframe="M1", ecfg=ecfg, rcfg=rcfg,
        hop=64, cache_dir=tmp_path,
    )
    assert bufs["wave1"].shape == (2048,)
    files = list(tmp_path.glob("WaveSpecZZ_cycles_*.bin"))
    assert len(files) == 1
    assert files[0].name == "WaveSpecZZ_cycles_EURUSD_M1_w1024_m1_ar10_k2.bin"
    back = load_cycle_cache(files[0])
    np.testing.assert_allclose(back["wave1"], bufs["wave1"], rtol=1e-6)


def test_batch_fetcher(tmp_path):
    fetcher = BatchFetcher(symbol="GBPUSD", timeframe="H1",
                           ecfg=small_ecfg(), cache_dir=tmp_path)
    bufs = fetcher.run(planted(1600), hop=32)
    assert (tmp_path / "WaveSpecZZ_cycles_GBPUSD_H1_w1024_m0_ar10_k2.bin").exists()
    assert np.isfinite(bufs["period1"]).all()


def test_online_driver_incremental_no_repaint():
    ecfg = small_ecfg()
    rcfg = ReconstructConfig(music_only=False)
    x = planted(1400)

    drv = OnlineDriver(ecfg=ecfg, rcfg=rcfg, history_chunk=100)
    out1 = drv.update(x[:1200])
    calc1 = int(out1["calculated"])
    assert calc1 > 1023
    wave_snapshot = out1["wave"][:calc1].copy()

    # more bars arrive; previously computed rows must be byte-identical
    out2 = drv.update(x)
    np.testing.assert_array_equal(out2["wave"][:calc1], wave_snapshot)
    assert int(out2["calculated"]) > calc1


def test_online_driver_session_routing():
    """OnlineDriver.session routes extraction through the async job queue
    (`1.1.0:1266-1411`) and skips chunks when the session is not ready
    (skip-bar-no-fallback, `1.1.0:1243-1247`)."""
    x = planted(1400)
    plain = OnlineDriver(ecfg=small_ecfg(), history_chunk=400)
    out_plain = plain.update(x)

    s = Session()
    assert s.init(0, 64) == Status.OK
    sess_driver = OnlineDriver(ecfg=small_ecfg(), history_chunk=400, session=s)
    out_sess = sess_driver.update(x)
    np.testing.assert_allclose(out_sess["wave"], out_plain["wave"], rtol=1e-6)
    assert sess_driver.prev_calculated == plain.prev_calculated
    assert s.queue.pending() == 0  # job freed after drain

    # Not-ready session: chunk skipped, buffers unchanged, no advance.
    s2 = Session()  # never init'ed
    skip_driver = OnlineDriver(ecfg=small_ecfg(), history_chunk=400, session=s2)
    out_skip = skip_driver.update(x)
    assert skip_driver.prev_calculated == 0
    assert out_skip["wave"].shape[0] == 0


def test_online_driver_chunk_bound():
    ecfg = small_ecfg()
    drv = OnlineDriver(ecfg=ecfg, rcfg=ReconstructConfig(music_only=False),
                       history_chunk=50, history_max_bars=200)
    x = planted(2000)
    out = drv.update(x)
    # bounded: at most history_chunk new bars processed in one call
    assert int(out["calculated"]) <= 2000
    first = int(out["calculated"])
    out = drv.update(x)
    assert int(out["calculated"]) - first <= 50


def test_online_driver_matches_batch():
    """Causal online rows equal the batch causal decode for the same bars."""
    ecfg = small_ecfg()
    rcfg = ReconstructConfig(music_only=False)
    x = planted(1300)
    drv = OnlineDriver(ecfg=ecfg, rcfg=rcfg, history_chunk=10_000,
                       history_max_bars=0)
    out = drv.update(x)
    from wavespec_tpu.extract import extract_cycles_batch
    from wavespec_tpu.reconstruct import decode_causal
    attrs = extract_cycles_batch(jnp.asarray(x), ecfg, hop=1)
    dec = decode_causal(attrs, rcfg)
    got = out["wave"][1023:]
    np.testing.assert_allclose(got, np.asarray(dec["wave"]), rtol=1e-4, atol=1e-5)


def test_online_driver_backfill_and_live_caps():
    ecfg = small_ecfg()
    drv = OnlineDriver(ecfg=ecfg, rcfg=ReconstructConfig(music_only=False),
                       history_chunk=10_000, history_max_bars=0,
                       backfill_windows=50)
    x = planted(3000)
    out = drv.update(x)
    # first run only backfills the trailing 50 windows
    assert int(out["calculated"]) == 3000
    wave = out["wave"]
    assert (wave[: 3000 - 50] == 0).all()
    assert np.abs(wave[2990:]).sum() > 0


def test_session_queue_depth_follows_streams():
    s = Session()
    s.init(0, 16)
    assert s.queue.depth == 16
    s.shutdown()


def test_batch_warmup_respects_bars_limit(tmp_path):
    ecfg = small_ecfg()
    x = planted(4000)
    bufs = batch_warmup(x, ecfg=ecfg, rcfg=ReconstructConfig(music_only=False),
                        hop=128, batch_bars_limit=2000, cache_dir=None)
    # limited to the trailing 2000 bars
    assert bufs["wave1"].shape == (2000,)


def test_online_driver_aux_buffers():
    ecfg = small_ecfg()
    drv = OnlineDriver(ecfg=ecfg, rcfg=ReconstructConfig(music_only=False),
                       history_chunk=10_000, history_max_bars=0)
    out = drv.update(planted(1200))
    for f in ("energy", "coherence", "snr_db", "score", "eigen_ratio", "eta_conf"):
        assert out[f].shape == out["wave"].shape
    assert (out["coherence"][1100:] > 0).any()


def test_chunked_batch_matches_unchunked():
    from wavespec_tpu.pipeline import extract_cycles_batch_chunked
    from wavespec_tpu.extract import extract_cycles_batch

    ecfg = small_ecfg()
    x = planted(1024 + 997, seed=11)
    want = np.asarray(extract_cycles_batch(jnp.asarray(x), ecfg, hop=1))
    got = extract_cycles_batch_chunked(x, ecfg, hop=1, chunk_windows=200)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_chunked_batch_hop_and_tail():
    from wavespec_tpu.pipeline import extract_cycles_batch_chunked
    from wavespec_tpu.extract import extract_cycles_batch

    ecfg = small_ecfg()
    x = planted(1024 + 1000, seed=12)
    want = np.asarray(extract_cycles_batch(jnp.asarray(x), ecfg, hop=8))
    got = extract_cycles_batch_chunked(x, ecfg, hop=8, chunk_windows=37)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fetcher_long_history_chunked(tmp_path):
    """Fetcher-scale run (hop=1 over tens of thousands of bars) exercises
    the chunked extraction path end to end."""
    fetcher = BatchFetcher(symbol="XAUUSD", timeframe="M5",
                           ecfg=small_ecfg(), rcfg=ReconstructConfig(music_only=False),
                           cache_dir=tmp_path)
    x = planted(20_000, period=80.0, seed=13)
    bufs = fetcher.run(x, hop=1)
    assert bufs["wave1"].shape == (20_000,)
    # planted cycle visible in the persisted periods
    per = bufs["period1"][5000:]
    per = per[per > 0]
    assert np.abs(np.median(per) - 1024 / round(1024 / 80)) < 2.0


@pytest.mark.slow
def test_chunked_batch_matches_unchunked_music_on_random_walk():
    """MUSIC's batch fast path runs its preconditioning high-passes over
    the UNFRAMED series; without the warmup lead, chunks 2+ restarted
    the IIR cold and the first windows of every chunk diverged from the
    unchunked result on a drifting feed. Core attr fields (amp, freq,
    period, phase) must match to float noise."""
    from wavespec_tpu.pipeline import extract_cycles_batch_chunked
    from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles_batch

    ecfg = ExtractConfig(window=512, top_k=2, min_period=10.0,
                         max_period=100.0, method=Method.MUSIC, ar_order=10)
    rng = np.random.default_rng(21)
    t = np.arange(512 + 1200)
    x = (np.cumsum(0.05 * rng.standard_normal(len(t)))
         + 2.0 * np.sin(2 * np.pi * t / 48)).astype(np.float32)
    want = np.asarray(extract_cycles_batch(jnp.asarray(x), ecfg, hop=4))
    got = extract_cycles_batch_chunked(x, ecfg, hop=4, chunk_windows=64)
    assert got.shape == want.shape
    np.testing.assert_allclose(got[..., :4], want[..., :4], rtol=1e-3, atol=1e-3)
