"""Presentation layer tests: palettes, views, CSV export."""

import numpy as np

from wavespec_tpu import extract as ex
from wavespec_tpu.presentation import (
    ColorPreset,
    CsvExporter,
    collect_cycle_states,
    detect_state_changes,
    encode_srgb,
    preset_colors,
    rank_cycle_views,
    slot_colors,
    spectral_mix_to_color,
    spectral_palette,
    wavelength_to_linear_rgb,
)


def test_preset_values_match_reference():
    viridis = preset_colors(ColorPreset.VIRIDIS)
    assert viridis[0] == (68, 1, 84)
    assert viridis[11] == (241, 229, 103)
    mono = preset_colors(ColorPreset.MONO)
    assert mono[0] == (60, 60, 60) and mono[11] == (170, 170, 170)
    assert preset_colors(ColorPreset.ELEGANT)[0] == (72, 61, 139)  # DarkSlateBlue
    assert len(spectral_palette()) == 12


def test_wavelength_regions():
    # 650 nm = pure red region
    r, g, b = wavelength_to_linear_rgb(650.0)
    assert r == 1.0 and g == 0.0 and b == 0.0
    # 460 nm = blue with rising green
    r, g, b = wavelength_to_linear_rgb(460.0)
    assert b == 1.0 and 0 < g < 1 and r == 0.0
    # outside visible = black
    assert wavelength_to_linear_rgb(300.0) == (0.0, 0.0, 0.0)
    # edge falloff
    r, _, b = wavelength_to_linear_rgb(390.0)
    assert 0 < b < 1


def test_srgb_encoding():
    assert encode_srgb(0.0) == 0.0
    assert encode_srgb(1.0) == 1.0
    np.testing.assert_allclose(encode_srgb(0.002), 12.92 * 0.002)
    np.testing.assert_allclose(encode_srgb(0.5), 1.055 * 0.5 ** (1 / 2.4) - 0.055)


def test_spectral_mix():
    c = spectral_mix_to_color(650.0, 610.0, 0.7, 0.3)
    assert c[0] > 200 and c[2] == 0  # strongly red
    # zero weights -> black
    assert spectral_mix_to_color(650.0, 610.0, 0.0, 0.0) == (0, 0, 0)


def test_slot_colors_adjustments():
    base = slot_colors(ColorPreset.VIRIDIS)
    brighter = slot_colors(ColorPreset.VIRIDIS, brightness=0.2)
    assert (brighter.astype(int) >= base.astype(int)).all()
    assert base.shape == (12, 3)
    spectral = slot_colors("spectral")
    assert spectral.shape == (12, 3)


def test_rank_cycle_views():
    attrs = np.zeros((4, 15), np.float32)
    attrs[:, ex.AMPLITUDE] = [1, 1, 1, 0]  # last invalid
    attrs[:, ex.SCORE] = [0.5, 0.9, 0.5, 1.0]
    attrs[:, ex.ETA_SECONDS] = [100, 50, 30, 0]
    attrs[:, ex.SNR_DB] = [10, 20, 30, 0]
    order = rank_cycle_views(attrs)
    # best: idx1 (score .9); then idx2 (same score as 0 but smaller eta);
    # then idx0; invalid idx3 last
    assert list(order) == [1, 2, 0, 3]


def test_states_and_changes():
    colors = np.array([[1, 0], [1, 1], [0, 1]], np.float32)
    active = np.array([[True, True], [True, False], [True, True]])
    states = collect_cycle_states(colors, active)
    np.testing.assert_array_equal(states, [[1, -1], [1, 0], [-1, 1]])
    changes = detect_state_changes(states)
    assert changes[2, 0]  # slot0 flipped at bar 2
    assert not changes[1, 1]  # inactive transition ignored
    assert not changes[0].any()


def test_csv_exporter(tmp_path):
    path = tmp_path / "out.csv"
    exp = CsvExporter(filename=path, update_bars=2, n_slots=2)
    s = np.array([1.0, -1.0])
    p = np.array([64.0, 32.0])
    e = np.array([5.0, -3.0])
    assert exp.export_bar("2026.01.01 00:00", 0, s, p, e)
    assert not exp.export_bar("2026.01.01 00:01", 1, s, p, e)  # cadence
    assert exp.export_bar("2026.01.01 00:02", 2, s, p, e)
    assert not exp.export_bar("2026.01.01 00:02", 2, s, p, e)  # dup bar
    lines = path.read_text().strip().splitlines()
    assert lines[0].startswith("Time,BarIndex,C1_State,C1_Period,C1_ETA,C1_Leak,C2_State")
    assert len(lines) == 3
    assert lines[1].split(",")[1] == "0"


def test_csv_export_from_v757_outputs(tmp_path):
    """The CSV exporter consumes v7.57 pipeline outputs end-to-end."""
    from wavespec_tpu.extract import DetrendMode
    from wavespec_tpu.ops.windows import WindowType
    from wavespec_tpu.pipeline import V757Config, run_v757

    t = np.arange(1024 + 60)
    series = 100 + 1.5 * np.sin(2 * np.pi * t / 36)
    cfg = V757Config(window=1024, min_period=18.0, max_period=52.0,
                     trend_period=256, taper=WindowType.BLACKMAN,
                     detrend=DetrendMode.EHLERS, n_candidates=8)
    out = run_v757(series, cfg, hop=4)
    exp = CsvExporter(filename=tmp_path / "v757.csv", update_bars=1)
    rows = 0
    for bar in range(out["states"].shape[0]):
        if exp.export_bar(f"t{bar}", bar, out["states"][bar],
                          out["slot_period"][bar], out["eta_raw"][bar],
                          out["leak_eta"][bar]):
            rows += 1
    text = (tmp_path / "v757.csv").read_text().splitlines()
    assert len(text) == rows + 1
    assert text[0].count(",") == 1 + 12 * 4
