"""Feed construction: applied price, ZigZag, PLA, tick resampling, caches."""

from wavespec_tpu.feeds.applied_price import AppliedPrice, applied_price_series
from wavespec_tpu.feeds.pla import PlaConfig, build_pla_series, pla_passthrough, pla_segments
from wavespec_tpu.feeds.pool import FeedPool
from wavespec_tpu.feeds.tick import build_tick_series, resample_ticks
from wavespec_tpu.feeds.zigzag import (
    ZigMode,
    ZigZagConfig,
    build_zigzag_feed,
    zigzag_extrema,
)

__all__ = [
    "AppliedPrice",
    "FeedPool",
    "PlaConfig",
    "ZigMode",
    "ZigZagConfig",
    "applied_price_series",
    "build_pla_series",
    "build_tick_series",
    "build_zigzag_feed",
    "pla_passthrough",
    "pla_segments",
    "resample_ticks",
    "zigzag_extrema",
]
