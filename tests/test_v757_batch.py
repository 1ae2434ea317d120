"""Multi-symbol v7.57 batch axis: vmap + mesh-sharded full analytics.

The reference's scale-out workload runs many symbols x timeframes one
at a time (`WaveCyclesBatchFetcher.mq5:91-143`, multi-TF handle pool
`Legacy/WaveSpecZZ_1.0.2.mq5:50-130`); `run_v757_batch` carries the
symbol axis through the ENTIRE analytics pipeline (trackers, ETA,
biquad, signals, Kalman), and `run_v757_batch_sharded` shards it over
the mesh data axis (SURVEY §2.4 row 5). Parity standard: discrete
outputs (uids, validity, states, signals) must match the single-series
path bitwise; float buffers to vmap-fusion tolerance.
"""

import numpy as np
import pytest

from wavespec_tpu.analyze.eta import EtaMode
from wavespec_tpu.extract import DetrendMode
from wavespec_tpu.mesh.mesh import make_mesh
from wavespec_tpu.ops.windows import WindowType
from wavespec_tpu.pipeline import V757Config, run_v757
from wavespec_tpu.pipeline.v757 import run_v757_batch, run_v757_batch_sharded

EXACT = {"slot_uid", "slot_valid", "leak_active", "states", "sig"}


def make_batch(n_sym, n_bars, seed=1):
    """Per-symbol random walks with distinct planted cycle pairs."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_bars)
    rows = []
    for b in range(n_sym):
        p1 = 20 + (b % 5) * 6   # 20..44 bars
        p2 = 24 + (b % 7) * 4   # 24..48 bars
        rows.append(
            100.0
            + np.cumsum(0.01 * rng.standard_normal(n_bars))
            + 1.5 * np.sin(2 * np.pi * t / p1 + b)
            + 0.8 * np.sin(2 * np.pi * t / p2)
        )
    return np.asarray(rows, np.float32)


def assert_batch_matches_single(outb, batch, cfg, hop, symbols):
    for b in symbols:
        out1 = run_v757(batch[b], cfg, hop=hop)
        for k in out1:
            if k in EXACT:
                np.testing.assert_array_equal(
                    outb[k][b], out1[k], err_msg=f"{k} sym {b}"
                )
            else:
                np.testing.assert_allclose(
                    outb[k][b], out1[k], rtol=2e-5, atol=1e-5,
                    err_msg=f"{k} sym {b}",
                )


def test_v757_batch_matches_single_series():
    cfg = V757Config(window=256, min_period=18.0, max_period=52.0,
                     trend_period=128, n_candidates=12)
    batch = make_batch(6, 256 + 60)
    outb = run_v757_batch(batch, cfg, hop=1)
    assert outb["slot_period"].shape == (6, 61, 12)
    assert outb["kalman"].shape == (6, 61)
    assert_batch_matches_single(outb, batch, cfg, hop=1, symbols=range(6))


def test_v757_batch_hop_and_modes():
    """hop > 1 and the non-default ETA/detrend paths survive the vmap."""
    cfg = V757Config(window=256, min_period=18.0, max_period=52.0,
                     trend_period=128, n_candidates=8,
                     eta_mode=EtaMode.HYBRID, taper=WindowType.NONE,
                     detrend=DetrendMode.NONE, enable_kalman=False)
    batch = make_batch(3, 256 + 90, seed=5)
    outb = run_v757_batch(batch, cfg, hop=3)
    assert outb["slot_period"].shape[1] == 1 + 90 // 3
    assert "kalman" not in outb
    assert_batch_matches_single(outb, batch, cfg, hop=3, symbols=range(3))


@pytest.mark.slow
def test_v757_batch_sharded_64_symbols():
    """VERDICT round-2 'done' bar: CPU-8-device-mesh parity at >= 64
    symbols — every symbol's sharded outputs equal its run_v757."""
    cfg = V757Config(window=256, min_period=18.0, max_period=52.0,
                     trend_period=128, n_candidates=12)
    batch = make_batch(64, 256 + 60, seed=2)
    mesh = make_mesh({"data": 8})
    outs = run_v757_batch_sharded(batch, cfg, hop=1, mesh=mesh)

    # sharded == vmapped on every field...
    outb = run_v757_batch(batch, cfg, hop=1)
    for k in outb:
        if k in EXACT:
            np.testing.assert_array_equal(outs[k], outb[k], err_msg=k)
        else:
            np.testing.assert_allclose(
                outs[k], outb[k], rtol=2e-5, atol=1e-5, err_msg=k
            )
    # ...and spot-parity against the true single-series path.
    assert_batch_matches_single(outs, batch, cfg, hop=1, symbols=[0, 31, 63])


def test_v757_batch_sharded_requires_divisible_batch():
    cfg = V757Config(window=256, min_period=18.0, max_period=52.0,
                     trend_period=128, n_candidates=8)
    mesh = make_mesh({"data": 8})
    with pytest.raises(ValueError, match="not divisible"):
        run_v757_batch_sharded(make_batch(6, 300), cfg, mesh=mesh)


def test_v757_batch_rejects_1d():
    with pytest.raises(ValueError, match=r"\[B, L\]"):
        run_v757_batch(np.zeros(512, np.float32),
                       V757Config(window=256, trend_period=128))


def test_v757_batch_symbol_chunking_matches_unchunked():
    """`symbol_chunk` splits the device program (the config-#5 1024-symbol
    frame matrix alone is 8.6 GB — past one chip's HBM); chunked output
    must equal the single-program result exactly."""
    cfg = V757Config(window=256, min_period=18.0, max_period=52.0,
                     trend_period=128, n_candidates=8)
    batch = make_batch(6, 256 + 40, seed=5)
    want = run_v757_batch(batch, cfg, hop=2)
    got = run_v757_batch(batch, cfg, hop=2, symbol_chunk=2)
    for k in want:
        if want[k].dtype.kind in "bi" or k in ("states", "color", "sig",
                                               "confluence"):
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
        else:
            # CPU XLA's fusion-dependent contraction order shifts float
            # fields ~1 ulp between batch shapes (see hopped_dft notes)
            np.testing.assert_allclose(
                got[k], want[k], rtol=1e-6, atol=1e-6, err_msg=k
            )


def test_v757_batch_public_wrapper_matches_private_packed():
    """bench.py's chain drives `_v757_batch_packed` on-device (the public
    `run_v757_batch` is host-level numpy I/O and cannot ride inside a
    jitted dependent chain); this gate pins the wrapper — packing layout,
    span bookkeeping, dtype/bool/int restore — to the private path, so a
    wrapper regression cannot hide from the benchmark (VERDICT r3 #8)."""
    import jax.numpy as jnp

    from wavespec_tpu.pipeline.v757 import (
        _unpack_transfer, _v757_batch_packed, _v757_spans,
    )

    cfg = V757Config(window=256, min_period=18.0, max_period=52.0,
                     trend_period=128, n_candidates=8)
    batch = make_batch(4, 256 + 50, seed=7)
    public = run_v757_batch(batch, cfg, hop=1)
    packed, spans = _v757_batch_packed(jnp.asarray(batch), cfg, 1)
    private = _unpack_transfer(np.asarray(packed), spans)
    assert set(public) == set(private)
    for k in public:
        assert public[k].dtype == private[k].dtype, k
        np.testing.assert_array_equal(public[k], private[k], err_msg=k)
    # the sharded path's independently-computed spans agree with the
    # pack's own layout (they must: one is static metadata, one is traced)
    assert spans == _v757_spans(cfg, 1)
