"""Mesh scale-out: multi-series data parallelism and segmented-FFT sharding."""

from wavespec_tpu.mesh.mesh import (
    extract_batch_sharded,
    make_mesh,
    pipeline_step_sharded,
    shard_series_batch,
)
from wavespec_tpu.mesh.segmented import (
    MixMode,
    auto_overlap,
    solve_overlap,
    fft_segmented,
    fft_segmented_sharded,
    num_segments,
    split_segments,
)

__all__ = [
    "MixMode",
    "auto_overlap",
    "solve_overlap",
    "extract_batch_sharded",
    "fft_segmented",
    "fft_segmented_sharded",
    "make_mesh",
    "num_segments",
    "pipeline_step_sharded",
    "shard_series_batch",
    "split_segments",
]
