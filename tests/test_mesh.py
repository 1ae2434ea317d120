"""Mesh sharding tests on the 8-virtual-CPU-device mesh (v5e-8 stand-in)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles_batch
from wavespec_tpu.mesh import (
    MixMode,
    auto_overlap,
    extract_batch_sharded,
    fft_segmented,
    fft_segmented_sharded,
    make_mesh,
    num_segments,
    pipeline_step_sharded,
    shard_series_batch,
)
from wavespec_tpu.reconstruct import ReconstructConfig


def make_batch(s=8, t=1280, seed=0):
    r = np.random.default_rng(seed)
    tt = np.arange(t)
    periods = r.uniform(20, 180, size=s)
    x = np.sin(2 * np.pi * tt[None, :] / periods[:, None])
    x = x + 0.05 * r.standard_normal((s, t))
    return x.astype(np.float32), periods


def test_make_mesh_shapes():
    mesh = make_mesh({"data": 4, "window": 2})
    assert mesh.shape == {"data": 4, "window": 2}
    assert len(jax.devices()) == 8


def test_extract_batch_sharded_matches_local():
    cfg = ExtractConfig(window=1024, top_k=2, min_period=10.0, max_period=200.0,
                        method=Method.FFT_RIDGE)
    x, _ = make_batch(s=8, t=1280)
    mesh = make_mesh({"data": 8})
    xb = shard_series_batch(jnp.asarray(x), mesh)
    out = np.asarray(extract_batch_sharded(xb, cfg, hop=64, mesh=mesh))
    # local reference
    local = np.stack(
        [np.asarray(extract_cycles_batch(jnp.asarray(x[i]), cfg, hop=64)) for i in range(8)]
    )
    np.testing.assert_allclose(out, local, rtol=2e-3, atol=1e-3)


def test_pipeline_step_sharded_runs():
    ecfg = ExtractConfig(window=1024, top_k=2, min_period=10.0, max_period=200.0,
                         method=Method.FFT_RIDGE)
    rcfg = ReconstructConfig(music_only=False)
    x, _ = make_batch(s=8, t=1152)
    mesh = make_mesh({"data": 8})
    attrs, waves = pipeline_step_sharded(
        shard_series_batch(jnp.asarray(x), mesh), mesh=mesh, ecfg=ecfg, rcfg=rcfg, hop=64
    )
    nwin = 1 + (1152 - 1024) // 64
    assert attrs.shape == (8, nwin, 2, 15)
    assert waves.shape == (8, nwin, 2)
    assert np.isfinite(np.asarray(waves)).all()


# ------------------------------------------------------------- segmented


def test_num_segments_formula():
    assert num_segments(32768, 16384, 4096) == 1 + (32768 - 16384) // (16384 - 4096)
    assert auto_overlap(16384, 0.25) == 4096
    with pytest.raises(ValueError):
        num_segments(1024, 512, 512)


def test_segmented_energy_is_welch_mean():
    n, seg, ov = 4096, 1024, 256
    x = np.random.default_rng(1).standard_normal(n).astype(np.float32)
    got = np.asarray(fft_segmented(jnp.asarray(x), seg, ov, MixMode.ENERGY))
    hop = seg - ov
    nseg = 1 + (n - seg) // hop
    specs = np.stack(
        [np.abs(np.fft.rfft(x[i * hop : i * hop + seg].astype(np.float64))[: seg // 2]) ** 2
         for i in range(nseg)]
    )
    np.testing.assert_allclose(got, specs.mean(0), rtol=1e-3, atol=1e-2)


def test_segmented_finds_long_cycle():
    n, seg = 32768, 8192
    t = np.arange(n)
    x = np.sin(2 * np.pi * t / 1000).astype(np.float32)
    power = np.asarray(fft_segmented(jnp.asarray(x), seg, auto_overlap(seg), MixMode.ENERGY))
    assert power.argmax() == round(seg / 1000)


def test_segmented_sharded_matches_single_device():
    n, seg, ov = 8192, 1024, 0   # 8 segments over 8 chips
    x = np.random.default_rng(2).standard_normal(n).astype(np.float32)
    mesh = make_mesh({"window": 8})
    got = np.asarray(
        fft_segmented_sharded(jnp.asarray(x), mesh, axis="window",
                              segment_len=seg, overlap=ov, mix_mode=MixMode.ENERGY)
    )
    want = np.asarray(fft_segmented(jnp.asarray(x), seg, ov, MixMode.ENERGY))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_segmented_sharded_max_mode():
    n, seg = 8192, 1024
    x = np.random.default_rng(3).standard_normal(n).astype(np.float32)
    mesh = make_mesh({"window": 4})
    got = np.asarray(
        fft_segmented_sharded(jnp.asarray(x), mesh, axis="window",
                              segment_len=seg, overlap=0, mix_mode=MixMode.MAX)
    )
    want = np.asarray(fft_segmented(jnp.asarray(x), seg, 0, MixMode.MAX))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_segmented_sharded_auto_tunes_overlap():
    """Odd series length on an 8-way axis: instead of raising, the overlap
    is re-solved (the reference's `InpSegmentAutoTune`, `gpu_wip.mq5:35-38`)
    and the sharded result equals the single-device result at the SOLVED
    overlap exactly; vs the requested overlap it agrees to Welch-retune
    tolerance (same spectral support, different segment averaging)."""
    from wavespec_tpu.mesh import solve_overlap

    n, seg, req = 9473, 1024, 256  # nseg @ 256 = 12, not divisible by 8
    t = np.arange(n)
    x = (np.sin(2 * np.pi * t / 100) + 0.3 * np.sin(2 * np.pi * t / 17)
         ).astype(np.float32)
    mesh = make_mesh({"window": 8})
    got = np.asarray(
        fft_segmented_sharded(jnp.asarray(x), mesh, axis="window",
                              segment_len=seg, overlap=req,
                              mix_mode=MixMode.ENERGY)
    )
    solved = solve_overlap(n, seg, 8, req)
    assert (1 + (n - seg) // (seg - solved)) % 8 == 0
    want = np.asarray(fft_segmented(jnp.asarray(x), seg, solved, MixMode.ENERGY))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
    # same dominant structure as the requested-overlap single-device run
    ref = np.asarray(fft_segmented(jnp.asarray(x), seg, req, MixMode.ENERGY))
    assert got.argmax() == ref.argmax()
    # exact divisibility keeps the requested overlap untouched
    n2 = 8192  # nseg @ overlap 0 = 8
    x2 = x[:n2]
    got2 = np.asarray(
        fft_segmented_sharded(jnp.asarray(x2), mesh, axis="window",
                              segment_len=seg, overlap=0,
                              mix_mode=MixMode.ENERGY)
    )
    want2 = np.asarray(fft_segmented(jnp.asarray(x2), seg, 0, MixMode.ENERGY))
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-3)
    # strict mode still raises
    with pytest.raises(ValueError, match="not divisible"):
        fft_segmented_sharded(jnp.asarray(x), mesh, axis="window",
                              segment_len=seg, overlap=req,
                              mix_mode=MixMode.ENERGY, auto_tune=False)


def test_pipeline_step_sharded_music():
    """MUSIC (jacobi scan) under shard_map on the 8-device mesh."""
    from wavespec_tpu.extract import Method

    ecfg = ExtractConfig(window=512, top_k=2, min_period=8.0, max_period=64.0,
                         method=Method.MUSIC, ar_order=8)
    rcfg = ReconstructConfig()
    x, _ = make_batch(s=8, t=640)
    mesh = make_mesh({"data": 8})
    attrs, waves = pipeline_step_sharded(
        shard_series_batch(jnp.asarray(x), mesh), mesh=mesh, ecfg=ecfg,
        rcfg=rcfg, hop=64,
    )
    assert attrs.shape[-1] == 15
    assert np.isfinite(np.asarray(attrs)).all()


def test_long_window_extract():
    """Next-gen window sizes (gpu_wip defaults 32768) run through the
    MXU DFT (factors 128x256)."""
    from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles

    n = 32768
    t = np.arange(n)
    x = (np.sin(2 * np.pi * t / 1000) + 0.5 * np.sin(2 * np.pi * t / 3000)).astype(np.float32)
    cfg = ExtractConfig(window=n, top_k=2, min_period=500.0, max_period=5000.0,
                        method=Method.FFT_RIDGE)
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    periods = sorted(attrs[:, 2])
    np.testing.assert_allclose(periods, [1000.0, 3000.0], rtol=0.05)


def test_extract_batch_sharded_1024_symbols():
    """BASELINE config #5 scale: 1024 symbols sharded over the 8-device
    mesh (128 per chip) in one fused program — the WaveCyclesBatchFetcher
    scale-out analog. Small windows keep the CPU run fast; the contract
    under test is the sharded batch axis at full symbol count."""
    cfg = ExtractConfig(window=256, top_k=2, min_period=10.0,
                        max_period=60.0, method=Method.FFT_RIDGE)
    s, hop = 1024, 64
    t = 256 + 2 * hop  # 3 windows per symbol
    r = np.random.default_rng(5)
    periods = r.uniform(12, 55, size=s)
    tt = np.arange(t)
    x = (np.sin(2 * np.pi * tt[None, :] / periods[:, None])
         + 0.02 * r.standard_normal((s, t))).astype(np.float32)
    mesh = make_mesh({"data": 8})
    xb = shard_series_batch(jnp.asarray(x), mesh)
    out = np.asarray(extract_batch_sharded(xb, cfg, hop=hop, mesh=mesh))
    assert out.shape == (1024, 3, 2, 15)
    # every symbol's strongest pick recovers its planted period
    got = out[:, -1, 0, 2]  # newest window, top pick, PERIOD field
    rel = np.abs(got - periods) / periods
    assert (rel < 0.08).mean() > 0.97, rel.max()
