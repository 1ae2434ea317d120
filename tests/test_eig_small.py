"""eig_small (charpoly + Durand-Kerner) and the device-side ESPRIT path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavespec_tpu.analyze.eig_small import charpoly, eigvals_small


def _sorted_complex(z):
    z = np.asarray(z)
    idx = np.lexsort((z.imag.round(5), z.real.round(5)))
    return z[idx]


@pytest.mark.parametrize("p,seed", [(4, 0), (8, 1), (12, 2), (16, 3)])
def test_eigvals_match_numpy_random(p, seed):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((5, p, p)).astype(np.float32)
    got = np.asarray(eigvals_small(jnp.asarray(a)))
    want = np.linalg.eigvals(a.astype(np.float64))
    for b in range(a.shape[0]):
        g, w = _sorted_complex(got[b]), _sorted_complex(want[b])
        scale = max(1.0, np.abs(w).max())
        np.testing.assert_allclose(g, w, atol=5e-4 * scale)


def test_eigvals_unit_circle_rotation_blocks():
    """ESPRIT-shaped spectrum: conjugate pairs e^{+-i w} on the unit circle."""
    thetas = [0.3, 0.9, 1.7, 2.4]
    blocks = []
    for th in thetas:
        c, s = np.cos(th), np.sin(th)
        blocks.append(np.array([[c, -s], [s, c]]))
    a = np.zeros((8, 8), np.float32)
    for i, b in enumerate(blocks):
        a[2 * i : 2 * i + 2, 2 * i : 2 * i + 2] = b
    q, _ = np.linalg.qr(np.random.default_rng(0).standard_normal((8, 8)))
    a = (q @ a @ q.T).astype(np.float32)  # similarity: same eigenvalues
    lam = np.asarray(eigvals_small(jnp.asarray(a[None])))[0]
    got = np.sort(np.abs(np.angle(lam)))
    want = np.sort(np.repeat(thetas, 2))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_charpoly_matches_numpy():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((3, 6, 6)).astype(np.float32)
    got = np.asarray(charpoly(jnp.asarray(a)))
    for b in range(3):
        want = np.poly(a[b].astype(np.float64))
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-4)


def test_esprit_device_matches_host():
    """VERDICT r1 item 7: the pure-JAX eigensolve must agree with the host
    NumPy eigvals path over noisy planted windows."""
    from wavespec_tpu.analyze.esprit import (
        esprit_frequencies,
        esprit_frequencies_host,
    )
    from wavespec_tpu.extract import ExtractConfig, Method
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend

    cfg = ExtractConfig(window=2048, top_k=2, min_period=10.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=12)
    t = np.arange(2048)
    rng = np.random.default_rng(5)
    batch = np.stack([
        2.0 * np.sin(2 * np.pi * t / 64 + 0.3)
        + 1.0 * np.sin(2 * np.pi * t / 30 + 1.2)
        + 0.1 * rng.standard_normal(2048)
        for _ in range(4)
    ]).astype(np.float32)
    xw = np.asarray(ehlers_highpass_detrend(jnp.asarray(batch), 400))

    dev = np.asarray(esprit_frequencies(jnp.asarray(xw), cfg))
    host = esprit_frequencies_host(xw, cfg)
    np.testing.assert_allclose(np.sort(dev, -1), np.sort(host, -1), atol=2e-5)
    # and both recover the planted periods
    for row in dev:
        periods = sorted(1.0 / f for f in row if f > 0)
        np.testing.assert_allclose(periods, [30.0, 64.0], rtol=0.05)


def test_esprit_is_jittable():
    from wavespec_tpu.analyze.esprit import esprit_frequencies
    from wavespec_tpu.extract import ExtractConfig, Method

    cfg = ExtractConfig(window=512, top_k=2, min_period=10.0,
                        max_period=100.0, method=Method.MUSIC, ar_order=10)
    x = jnp.asarray(np.sin(2 * np.pi * np.arange(512) / 32), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda w: esprit_frequencies(w, cfg))(x[None])
    assert jaxpr is not None  # traces without host round-trips
