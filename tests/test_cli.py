"""CLI tests (headless fetcher equivalent)."""

import json
import struct

import numpy as np

from wavespec_tpu.cli import main


def make_feed_bin(path, series_chrono):
    newest_first = np.asarray(series_chrono, np.float64)[::-1]
    path.write_bytes(struct.pack("<i", len(newest_first)) + newest_first.tobytes())


def test_cli_extract_and_inspect(tmp_path, capsys):
    t = np.arange(1400)
    series = 2.0 * np.sin(2 * np.pi * t / 64) + 0.05 * np.random.default_rng(0).standard_normal(1400)
    feed = tmp_path / "WaveSpecZZ_cache_EURUSD_M1.bin"
    make_feed_bin(feed, series)

    rc = main([
        "extract", str(feed), "--out-dir", str(tmp_path), "--symbol", "EURUSD",
        "--window", "1024", "--hop", "32", "--top-k", "2",
        "--min-period", "10", "--method", "fft_ridge", "--csv", "waves.csv",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["bars"] == 1400 and out["bars_with_cycles"] > 0

    cache = tmp_path / "WaveSpecZZ_cycles_EURUSD_M1_w1024_m0_ar10_k2.bin"
    assert cache.exists()
    csv = (tmp_path / "waves.csv").read_text().splitlines()
    assert csv[0].startswith("bar,wave1")
    assert len(csv) == 1401

    rc = main(["inspect", str(cache)])
    info = json.loads(capsys.readouterr().out.strip())
    assert info["kind"] == "cycle_cache" and info["bars"] == 1400

    rc = main(["inspect", str(feed)])
    info = json.loads(capsys.readouterr().out.strip())
    assert info["kind"] == "feed_cache" and info["bars"] == 1400


def test_cli_v757_states_csv(tmp_path, capsys):
    t = np.arange(700)
    series = (100.0 + 2.0 * np.sin(2 * np.pi * t / 32)
              + 0.05 * np.random.default_rng(1).standard_normal(700))
    feed = tmp_path / "WaveSpecZZ_cache_EURUSD_M1.bin"
    make_feed_bin(feed, series)

    rc = main([
        "v757", str(feed), "--out-dir", str(tmp_path), "--window", "256",
        "--csv", "states.csv",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["bars"] == 700
    assert out["frames"] == 700 - 256 + 1
    assert out["frames_with_cycles"] > 0

    csv = (tmp_path / "states.csv").read_text().splitlines()
    assert csv[0].startswith("Time,BarIndex,C1_State,C1_Period,C1_ETA,C1_Leak")
    assert len(csv) == out["frames"] + 1
    # the planted 32-bar cycle appears in some slot's period column
    row = csv[-1].split(",")
    periods = [float(row[3 + 4 * c]) for c in range(12)]
    assert any(abs(p - 32.0) < 2.0 for p in periods if p > 0)
