"""Device-mesh scale-out for multi-series batch workloads.

The reference's parallelism inventory (SURVEY §2.4) maps onto a 2D
`jax.sharding.Mesh`:

- `data` axis — the multi-symbol / multi-timeframe batch
  (`WaveCyclesBatchFetcher.mq5` whole-file; BASELINE config #5: 1024
  symbols on a v5e-8). Series are independent, so the only collectives
  are at the edges (none in steady state) and the axis stays host-shardable.
- `window` axis — the segmented long-window FFT
  (`gpu_wave_fft_segmented`), where per-chip segment FFTs are combined by
  a psum-style mix over ICI (see wavespec_tpu.mesh.segmented).

GPU streams / async jobs (`gpu_init(dev, streams)`, depth-64 queue) have
no mesh analog: XLA's async dispatch plus one fused batched program
replaces the entire client-side job queue.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from wavespec_tpu.extract import ExtractConfig, extract_cycles_batch
from wavespec_tpu.reconstruct import ReconstructConfig, decode_causal


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Create a named mesh; default = all devices on one 'data' axis."""
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh wants {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, names)


def shard_series_batch(batch: jax.Array, mesh: Mesh, axis: str = "data"):
    """Place a ``[series, time]`` batch with the series dim sharded."""
    spec = P(axis, *([None] * (batch.ndim - 1)))
    return jax.device_put(batch, NamedSharding(mesh, spec))


def extract_batch_sharded(
    series_batch: jax.Array,
    cfg: ExtractConfig,
    *,
    hop: int = 1,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """Rolling-STFT extraction for a multi-series batch sharded over `axis`.

    series_batch ``[s, t]`` -> attrs ``[s, nwin, top_k, 15]``, with `s`
    sharded. Pure data parallelism: one fused program per chip, zero
    steady-state collectives (the TPU replacement for the fetcher's
    one-symbol-at-a-time batch jobs).
    """

    def local(block):  # [s_local, t]
        return _extract_local(block, cfg, hop)

    shard = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis, None), out_specs=P(axis, None, None, None)
    )
    return shard(series_batch)


@partial(jax.jit, static_argnames=("cfg", "hop"))
def _extract_local(block, cfg: ExtractConfig, hop: int):
    # Jitted so repeat calls to extract_batch_sharded re-trace only the
    # thin shard wrapper, not the whole extraction pipeline (tracing the
    # full jaxpr per call costs seconds of host time). The [s_local, t]
    # block goes to extract_cycles_batch DIRECTLY — its series axis is a
    # native batch dim, so the Pallas band DFT grid tiles over
    # series x windows instead of a (slow) vmapped pallas_call.
    return extract_cycles_batch(block, cfg, hop=hop)


@partial(jax.jit, static_argnames=("ecfg", "rcfg", "hop"))
def _pipeline_local(block, ecfg: ExtractConfig, rcfg: ReconstructConfig, hop: int):
    attrs = extract_cycles_batch(block, ecfg, hop=hop)
    decoded = decode_causal(attrs.reshape(-1, *attrs.shape[-2:]), rcfg)
    nwin = attrs.shape[-3]
    wave = decoded["wave"].reshape(*block.shape[:-1], nwin, -1)
    return attrs, wave


def pipeline_step_sharded(
    series_batch: jax.Array,
    *,
    mesh: Mesh,
    ecfg: ExtractConfig,
    rcfg: ReconstructConfig = ReconstructConfig(),
    hop: int = 1,
    axis: str = "data",
):
    """Full per-step pipeline (extract -> decode) sharded over the data axis.

    Returns (attrs ``[s, nwin, k, 15]``, waves ``[s, nwin, max_waves]``).
    """

    def local(block):
        return _pipeline_local(block, ecfg, rcfg, hop)

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None, None, None), P(axis, None, None)),
    )
    return shard(series_batch)
