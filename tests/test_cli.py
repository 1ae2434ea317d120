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
