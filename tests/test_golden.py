"""Golden-fixture regression gate (SURVEY §4 test plan).

The reference has no fixtures of its own (closed DLL), so the fixtures are
recorded from this implementation at a pinned revision and gate future
refactors (e.g. swapping the batched path for a fused Pallas kernel) at
1e-4 relative tolerance. Regenerate deliberately with
`python tests/regen_golden.py` only when the numerics are *supposed* to
change, and say why in the commit.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles_batch
from wavespec_tpu.reconstruct import ReconstructConfig, decode_causal
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "golden_extract.npz"


@pytest.mark.slow
def test_golden_extract_parity():
    data = np.load(FIXTURE)
    series = jnp.asarray(data["series"])

    cfg_fft = ExtractConfig(window=1024, top_k=4, min_period=10.0,
                            max_period=200.0, method=Method.FFT_RIDGE)
    attrs_fft = np.asarray(extract_cycles_batch(series, cfg_fft, hop=64))
    np.testing.assert_allclose(attrs_fft, data["attrs_fft"], rtol=1e-4, atol=1e-4)

    cfg_mus = ExtractConfig(window=1024, top_k=2, min_period=10.0,
                            max_period=200.0, method=Method.MUSIC, ar_order=10)
    attrs_mus = np.asarray(extract_cycles_batch(series, cfg_mus, hop=64))
    np.testing.assert_allclose(attrs_mus, data["attrs_mus"], rtol=1e-4, atol=1e-4)

    dec = decode_causal(jnp.asarray(attrs_mus), ReconstructConfig())
    np.testing.assert_allclose(np.asarray(dec["wave"]), data["wave"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dec["period"]), data["period"], rtol=1e-4, atol=1e-4)
