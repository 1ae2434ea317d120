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


@pytest.mark.slow
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


@pytest.mark.slow
def test_jacobi_pallas_interpret_matches_numpy_and_xla():
    """The single-launch Pallas Jacobi (the MUSIC batch=1 latency path,
    VERDICT r2 #5) must produce the same eigensystem as numpy and the XLA
    fori path. Interpret mode — the kernel itself is device-only routing."""
    from wavespec_tpu.analyze.jacobi import jacobi_eigh
    from wavespec_tpu.kernels.jacobi_pallas import jacobi_eigh_pallas

    # m=6 keeps interpret mode affordable (~1 min; m=10 runs minutes) —
    # the m=10 serving shape is verified on the real device (ROUND3).
    rng = np.random.default_rng(7)
    a = rng.standard_normal((3, 6, 6)).astype(np.float32)
    a = a @ a.transpose(0, 2, 1)

    ev_p, evec_p = jacobi_eigh_pallas(jnp.asarray(a), interpret=True)
    ev_p, evec_p = np.asarray(ev_p), np.asarray(evec_p)

    ev_n = np.linalg.eigvalsh(a.astype(np.float64))
    scale = np.abs(ev_n).max()
    np.testing.assert_allclose(ev_p, ev_n, atol=5e-5 * scale)
    # eigenvector residual + orthonormality (sign-invariant checks)
    res = np.einsum("bij,bjk->bik", a, evec_p) - ev_p[:, None, :] * evec_p
    assert np.abs(res).max() < 5e-4 * scale
    g = np.einsum("bji,bjk->bik", evec_p, evec_p)
    np.testing.assert_allclose(g, np.broadcast_to(np.eye(6), g.shape),
                               atol=5e-6)
    # same eigenvalues as the XLA fori path (vector signs may differ)
    ev_x, _ = jacobi_eigh(jnp.asarray(a))
    np.testing.assert_allclose(ev_p, np.asarray(ev_x), atol=5e-5 * scale)


def test_jacobi_pallas_rotation_exact_zero_offdiag():
    """Regression: exact y==0 with a_qq < a_pp must be the IDENTITY
    rotation. The raw half-angle formulas give c = s = 0 there (xr = -1,
    sign(0) = 0) — a zero map that annihilates both rows/columns. Real
    Toeplitz autocovariances hit this on device (exact mirror-symmetric
    cancellations): observed on the v5e as 7 of 10 ESPRIT covariance
    eigenvalues returning exactly 0.0."""
    from wavespec_tpu.kernels.jacobi_pallas import _rotation_cs

    # already-diagonal pair, decreasing order: a_pq = 0, a_qq - a_pp < 0
    c, s = _rotation_cs(jnp.zeros((1, 4)), jnp.full((1, 4), -2.5))
    np.testing.assert_array_equal(np.asarray(c), np.ones((1, 4), np.float32))
    np.testing.assert_array_equal(np.asarray(s), np.zeros((1, 4), np.float32))
    # negative zero off-diagonal takes the same guard
    c, s = _rotation_cs(jnp.full((1, 4), -0.0), jnp.full((1, 4), -2.5))
    np.testing.assert_array_equal(np.asarray(c), np.ones((1, 4), np.float32))
    # generic entries are untouched by the guard
    c, s = _rotation_cs(jnp.full((1, 1), 1.0), jnp.full((1, 1), 0.0))
    np.testing.assert_allclose(np.asarray(c)[0, 0], np.sqrt(0.5), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s)[0, 0], np.sqrt(0.5), rtol=1e-6)


@pytest.mark.slow
def test_jacobi_pallas_interpret_decreasing_diagonal():
    """A diagonal matrix in DECREASING order is the minimal end-to-end
    trigger of the y==0/x<0 corner: every round-1 pair hits it, so the
    un-guarded kernel returns all-zero eigenvalues. Must return the
    diagonal, sorted ascending, with identity-up-to-permutation vectors."""
    from wavespec_tpu.kernels.jacobi_pallas import jacobi_eigh_pallas

    a = np.zeros((1, 4, 4), np.float32)
    np.fill_diagonal(a[0], [4.0, 3.0, 2.0, 1.0])
    ev, vec = jacobi_eigh_pallas(jnp.asarray(a), interpret=True)
    np.testing.assert_array_equal(np.asarray(ev)[0], [1.0, 2.0, 3.0, 4.0])
    res = a[0] @ np.asarray(vec)[0] - np.asarray(ev)[0][None, :] * np.asarray(vec)[0]
    assert np.abs(res).max() < 1e-6


def test_jacobi_pallas_interpret_toeplitz_bisymmetric():
    """Symmetric Toeplitz (every _autocov_toeplitz covariance) is the
    production shape of the y==0 corner: bisymmetry keeps exact equalities
    through the deterministic lane arithmetic, so off-diagonals cancel to
    exact zeros mid-sweep. m=4 keeps interpret mode fast."""
    from wavespec_tpu.kernels.jacobi_pallas import jacobi_eigh_pallas

    r0 = np.array([3.0, 2.6, 1.9, 1.0], np.float32)
    a = np.empty((1, 4, 4), np.float32)
    for i in range(4):
        for j in range(4):
            a[0, i, j] = r0[abs(i - j)]
    ev, _ = jacobi_eigh_pallas(jnp.asarray(a), interpret=True)
    ev_n = np.linalg.eigvalsh(a.astype(np.float64))
    np.testing.assert_allclose(np.asarray(ev), ev_n,
                               atol=5e-6 * np.abs(ev_n).max())


@pytest.mark.slow
def test_jacobi_pallas_interpret_batch_padding():
    """Batch sizes off the 128-lane tile pad with identity blocks; the
    padded lanes must not perturb real results (B=130 spans two tiles)."""
    from wavespec_tpu.kernels.jacobi_pallas import jacobi_eigh_pallas

    rng = np.random.default_rng(8)
    a = rng.standard_normal((130, 4, 4)).astype(np.float32)
    a = a @ a.transpose(0, 2, 1)
    ev, _ = jacobi_eigh_pallas(jnp.asarray(a), interpret=True)
    ev_n = np.linalg.eigvalsh(a.astype(np.float64))
    np.testing.assert_allclose(np.asarray(ev), ev_n,
                               atol=5e-5 * np.abs(ev_n).max())
