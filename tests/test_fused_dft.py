"""Fused Pallas band-DFT: interpret-mode parity with the XLA path."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.kernels.fused_dft import rfft_band_fused, rfft_band_fused_any
from wavespec_tpu.kernels.mxu_fft import rfft_mxu


def test_fused_dft_matches_numpy_rfft():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 1024)).astype(np.float32)
    got = np.asarray(rfft_band_fused(jnp.asarray(x), max_bins=200, tile=4,
                                     interpret=True))
    want = np.fft.rfft(x.astype(np.float64), axis=-1)[:, : got.shape[1]]
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-6


def test_fused_dft_any_pads_and_trims():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 5, 1024)).astype(np.float32)  # 15 rows, tile 4
    got = np.asarray(rfft_band_fused_any(jnp.asarray(x), max_bins=130,
                                         tile=4, interpret=True))
    assert got.shape == (3, 5, 130)
    want = np.asarray(rfft_mxu(jnp.asarray(x), max_bins=130))[..., :130]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_fused_dft_multiseries_grid_agreement():
    """The multi-series extraction path flattens [S, nwin] into the
    kernel's window grid (VERDICT r2 #2 — batch-native, not vmapped
    pallas_call): agreement with the XLA four-step <= 1e-6 relative on a
    series x windows batch at the flagship band width."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((6, 11, 4096)).astype(np.float32)  # 66 rows
    got = np.asarray(rfft_band_fused_any(jnp.asarray(x), max_bins=230,
                                         tile=8, interpret=True))
    assert got.shape == (6, 11, 230)
    want = np.fft.rfft(x.astype(np.float64), axis=-1)[..., :230]
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-6, rel


def test_fused_dft_under_shard_map_vma():
    """pallas_call inside jax.shard_map must declare output vma or tracing
    fails with check_vma=True (the default) — which would crash the
    sharded ridge path (`mesh.extract_batch_sharded`) on a real mesh with
    the Pallas DFT on. `out_struct` propagates the input's varying set."""
    import jax
    from jax.sharding import PartitionSpec as P

    from wavespec_tpu.mesh.mesh import make_mesh

    mesh = make_mesh({"data": 2})
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 1024)).astype(np.float32)

    def local(block):  # [4, 1024] per device
        return rfft_band_fused_any(block, max_bins=130, tile=4,
                                   interpret=True)

    got = jax.shard_map(local, mesh=mesh, in_specs=P("data", None),
                        out_specs=P("data", None))(jnp.asarray(x))
    want = np.fft.rfft(x.astype(np.float64), axis=-1)[..., :130]
    rel = np.abs(np.asarray(got) - want).max() / np.abs(want).max()
    assert rel < 1e-6, rel
