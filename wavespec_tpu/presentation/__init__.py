"""Presentation layer: palettes, spectral colors, cycle views, CSV export."""

from wavespec_tpu.presentation.export import CsvExporter
from wavespec_tpu.presentation.palettes import (
    ColorPreset,
    SPECTRAL_MIXES,
    adjust_color,
    encode_srgb,
    preset_colors,
    slot_colors,
    spectral_mix_to_color,
    spectral_palette,
    wavelength_to_linear_rgb,
)
from wavespec_tpu.presentation.views import (
    collect_cycle_states,
    detect_state_changes,
    rank_cycle_views,
)

__all__ = [
    "ColorPreset",
    "CsvExporter",
    "SPECTRAL_MIXES",
    "adjust_color",
    "collect_cycle_states",
    "detect_state_changes",
    "encode_srgb",
    "preset_colors",
    "rank_cycle_views",
    "slot_colors",
    "spectral_mix_to_color",
    "spectral_palette",
    "wavelength_to_linear_rgb",
]
