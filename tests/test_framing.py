"""frame_series: correctness + gather-free lowering for EVERY hop.

The reference batch contract takes an arbitrary hop
(`gpu_submit_extract_cycles_batch`, `Include/imports.mqh:15-17`), and a
fancy-index gather costs ~100x slices on TPU, so framing must lower to
static slices for all hops — including odd ones with gcd(window, hop)=1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavespec_tpu.extract import frame_series


def _oracle(series: np.ndarray, window: int, hop: int) -> np.ndarray:
    nwin = 1 + (len(series) - window) // hop
    return np.stack([series[w * hop : w * hop + window] for w in range(nwin)])


@pytest.mark.parametrize("window,hop", [
    (4096, 1), (4096, 3), (4096, 5), (4096, 7), (4096, 16), (4096, 48),
    (4096, 63), (4096, 64), (4096, 100), (4096, 512), (4096, 4096),
    (4096, 5000),
    (256, 1), (256, 3), (256, 17), (256, 300),
    (16, 1), (16, 5),
])
def test_frame_series_matches_oracle(window, hop):
    rng = np.random.default_rng(window * 31 + hop)
    n = window + 7 * hop + (hop // 3)  # non-multiple tail on purpose
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(frame_series(jnp.asarray(x), window, hop))
    want = _oracle(x, window, hop)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("hop", [1, 3, 5, 7, 48, 100, 512])
def test_frame_series_is_gather_free(hop):
    """VERDICT r1 item 3: the gather branch must be unreachable for any hop."""
    window = 4096
    n = window + 13 * hop
    x = jnp.zeros(n, jnp.float32)
    jaxpr = jax.make_jaxpr(lambda s: frame_series(s, window, hop))(x)
    prims = {eqn.primitive.name for eqn in jaxpr.jaxpr.eqns}
    assert "gather" not in prims, f"hop={hop} lowered to a gather: {prims}"
