"""Oracle tests for the numerical substrate (SURVEY.md §7 step 1).

Oracles: NumPy/SciPy. The reference has no tests; its formulas are cited in
each op's docstring, and these tests pin our implementations to independent
reimplementations of those formulas.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.signal

from wavespec_tpu import ops


def rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- windows


@pytest.mark.parametrize(
    "wt,scipy_name",
    [
        (ops.WindowType.HANN, "hann"),
        (ops.WindowType.HAMMING, "hamming"),
        (ops.WindowType.BLACKMAN, "blackman"),
        (ops.WindowType.BARTLETT, "bartlett"),
    ],
)
def test_window_matches_scipy(wt, scipy_name):
    n = 256
    ours = np.asarray(ops.window_coefficients(n, wt, dtype=jnp.float64))
    theirs = scipy.signal.get_window(scipy_name, n, fftbins=False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_window_none_identity():
    x = rng().standard_normal((3, 128)).astype(np.float32)
    out = np.asarray(ops.apply_window(jnp.asarray(x), ops.WindowType.NONE))
    np.testing.assert_array_equal(out, x)


def test_apply_window_batched():
    x = rng(1).standard_normal((4, 64)).astype(np.float32)
    w = np.asarray(ops.window_coefficients(64, ops.WindowType.BLACKMAN))
    out = np.asarray(ops.apply_window(jnp.asarray(x), ops.WindowType.BLACKMAN))
    np.testing.assert_allclose(out, x * w, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- detrend


def ehlers_oracle(price, period):
    """Sequential reimplementation of the reference trend filter."""
    w = 2.0 * np.pi / period
    alpha = (1.0 - np.sin(w)) / np.cos(w)
    c = (1.0 - alpha) / 2.0
    trend = np.zeros_like(price)
    trend[0] = c * (price[0] + price[0])
    for j in range(1, len(price)):
        trend[j] = c * (price[j] + price[j - 1]) + alpha * trend[j - 1]
    return price - trend


def test_ehlers_highpass_matches_sequential_oracle():
    x = np.cumsum(rng(2).standard_normal(512)).astype(np.float64)
    want = ehlers_oracle(x, 128)
    got = np.asarray(ops.ehlers_highpass_detrend(jnp.asarray(x, jnp.float32), 128))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ehlers_kills_linear_trend():
    t = np.arange(2048, dtype=np.float64)
    x = 0.5 * t + 100.0
    out = np.asarray(
        ops.ehlers_highpass_detrend(jnp.asarray(x, jnp.float32), 256)
    )
    # After warm-up the HP output of a pure line decays toward a constant
    # small residual, far below the trend magnitude.
    assert np.abs(out[500:]).max() < np.abs(x[500:]).min() * 0.2


def test_linear_detrend_exact_on_line():
    t = np.arange(256, dtype=np.float32)
    x = 3.0 * t - 7.0
    out = np.asarray(ops.linear_detrend(jnp.asarray(x)))
    np.testing.assert_allclose(out, np.zeros_like(x), atol=1e-3)


def test_linear_detrend_matches_scipy():
    x = rng(3).standard_normal((2, 300)).astype(np.float32)
    want = scipy.signal.detrend(x.astype(np.float64), axis=-1, type="linear")
    got = np.asarray(ops.linear_detrend(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_remove_dc_mean():
    x = rng(4).standard_normal((2, 128)).astype(np.float32) + 5.0
    out = np.asarray(ops.remove_dc(jnp.asarray(x), ops.DcMode.MEAN))
    np.testing.assert_allclose(out.mean(axis=-1), 0.0, atol=1e-5)


def test_remove_dc_leaky_matches_sequential():
    x = rng(5).standard_normal(200).astype(np.float64) + 2.0
    alpha = 0.98
    dc = np.zeros_like(x)
    acc = 0.0
    for i in range(len(x)):
        acc = alpha * acc + (1 - alpha) * x[i]
        dc[i] = acc
    want = x - dc
    got = np.asarray(ops.remove_dc(jnp.asarray(x, jnp.float32), ops.DcMode.LEAKY, 0.98))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- spectrum


def test_rfft_bins_matches_numpy():
    x = rng(6).standard_normal((3, 512)).astype(np.float32)
    want = np.fft.rfft(x.astype(np.float64))[:, :256]
    got = np.asarray(ops.rfft_bins(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_interleaved_layout_parity():
    """Bridge layout: out[2k]=re_k, out[2k+1]=im_k, len(out)=n."""
    x = rng(7).standard_normal(256).astype(np.float32)
    inter = np.asarray(ops.rfft_interleaved(jnp.asarray(x)))
    assert inter.shape == (256,)
    full = np.fft.rfft(x.astype(np.float64))
    np.testing.assert_allclose(inter[0::2], full[:128].real, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(inter[1::2], full[:128].imag, rtol=1e-4, atol=1e-3)


def bandlimited(seed, shape, n):
    """Random series with zero Nyquist energy (the N/2-bin contract drops
    the Nyquist bin, so roundtrips are only exact on band-limited input)."""
    spec = rng(seed).standard_normal((*shape, n // 2 + 1, 2))
    spec[..., -1, :] = 0.0
    return np.fft.irfft(spec[..., 0] + 1j * spec[..., 1], n=n).astype(np.float32)


def test_irfft_roundtrip():
    x = bandlimited(8, (2,), 512)
    spec = ops.rfft_bins(jnp.asarray(x))
    back = np.asarray(ops.irfft_from_bins(spec, 512))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-3)


def test_irfft_from_interleaved_roundtrip():
    x = bandlimited(9, (), 128)
    inter = ops.rfft_interleaved(jnp.asarray(x))
    back = np.asarray(ops.irfft_from_interleaved(inter))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-3)


def test_power_spectrum():
    x = rng(10).standard_normal(256).astype(np.float32)
    spec = ops.rfft_bins(jnp.asarray(x))
    ps = np.asarray(ops.power_spectrum(spec))
    want = np.abs(np.fft.rfft(x.astype(np.float64))[:128]) ** 2
    np.testing.assert_allclose(ps, want, rtol=1e-3, atol=1e-2)


def test_band_indices_match_reference_formula():
    # N=4096, band [18, 200] bars -> k in [ceil(4096/200), floor(4096/18)]
    k_min, k_max = ops.band_indices(4096, 18.0, 200.0)
    assert k_min == int(np.ceil(4096 / 200.0)) == 21
    assert k_max == int(np.floor(4096 / 18.0)) == 227


def test_topk_finds_planted_sinusoids():
    n = 4096
    t = np.arange(n)
    periods = [50.0, 120.0, 33.0]
    amps = [3.0, 2.0, 1.0]
    x = sum(a * np.sin(2 * np.pi * t / p) for a, p in zip(amps, periods))
    x = x.astype(np.float32)
    spec = ops.rfft_bins(jnp.asarray(x))
    ps = ops.power_spectrum(spec)
    idx, powers, per = ops.topk_cycles(
        ps, n=n, top_k=3, min_period=18.0, max_period=200.0
    )
    got_periods = sorted(np.asarray(per).tolist())
    # bin quantization: period = n/round(n/p)
    want = sorted(n / round(n / p) for p in periods)
    np.testing.assert_allclose(got_periods, want, rtol=0.02)
    # strongest first
    assert np.asarray(powers)[0] >= np.asarray(powers)[1] >= np.asarray(powers)[2]


def test_topk_excludes_out_of_band():
    n = 1024
    t = np.arange(n)
    # One in-band (p=40), one out-of-band (p=8 < min_period 18).
    x = (np.sin(2 * np.pi * t / 40) + 10 * np.sin(2 * np.pi * t / 8)).astype(np.float32)
    ps = ops.power_spectrum(ops.rfft_bins(jnp.asarray(x)))
    idx, powers, per = ops.topk_cycles(ps, n=n, top_k=1, min_period=18.0, max_period=200.0)
    np.testing.assert_allclose(float(per[0]), 1024 / round(1024 / 40), rtol=0.02)


# ---------------------------------------------------------------- phase


def test_unwrap_matches_numpy():
    x = rng(11).standard_normal((2, 300)).astype(np.float32)
    ph = np.asarray(ops.fft_phase(ops.rfft_bins(jnp.asarray(x)))).astype(np.float64)
    want = np.unwrap(ph, axis=-1)
    got = np.asarray(ops.unwrap_phase(jnp.asarray(ph, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_group_delay_clamped():
    n = 512
    x = rng(12).standard_normal(n).astype(np.float32)
    _, uw, gd = ops.phase_analysis(ops.rfft_bins(jnp.asarray(x)))
    assert np.all(np.abs(np.asarray(gd)) <= 100.0 + 1e-5)


def test_group_delay_of_delayed_impulse():
    """delta(t-d) has X_k = e^{-2*pi*i*k*d/n} -> group delay d at all bins."""
    n = 1024
    d = 10
    x = np.zeros(n, np.float32)
    x[d] = 1.0
    spec = ops.rfft_bins(jnp.asarray(x))
    _, uw, gd = ops.phase_analysis(spec)
    np.testing.assert_allclose(np.asarray(gd[1:-1]), d, atol=0.5)


def test_ehlers_highpass_stacked_matches_scalar():
    """One stacked scan over R cutoff periods == R scalar filter calls
    (the MUSIC per-band preconditioning relies on exact per-row parity)."""
    x = jnp.asarray(np.cumsum(rng(7).standard_normal(777)), jnp.float32)
    periods = (38, 107, 300)
    stacked = np.asarray(ops.ehlers_highpass_detrend_stacked(x, periods))
    assert stacked.shape == (3, 777)
    for r, p in enumerate(periods):
        want = np.asarray(ops.ehlers_highpass_detrend(x, p))
        np.testing.assert_allclose(stacked[r], want, rtol=1e-6, atol=1e-6)


def test_ehlers_highpass_stacked_batched():
    x = jnp.asarray(rng(8).standard_normal((2, 4, 256)), jnp.float32)
    periods = (32, 64)
    stacked = np.asarray(ops.ehlers_highpass_detrend_stacked(x, periods))
    assert stacked.shape == (2, 4, 2, 256)
    want = np.asarray(ops.ehlers_highpass_detrend(x[1, 2], 64))
    np.testing.assert_allclose(stacked[1, 2, 1], want, rtol=1e-6, atol=1e-6)


def test_ehlers_highpass_mxu_matches_scan():
    """The blocked MXU-Toeplitz evaluation of the one-pole high-pass
    (`ehlers_highpass_detrend_mxu` — the MUSIC preconditioning hot path)
    must match the associative-scan form to float tolerance at every
    length class (sub-block, block-multiple, ragged multi-block) and
    under batch dims. Against a float64 sequential oracle, the MXU form
    must be at least as accurate as the scan form."""
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend_mxu

    periods = (38, 107, 300)
    for n in (100, 256, 777, 4096):
        x = jnp.asarray(np.cumsum(rng(7).standard_normal(n)), jnp.float32)
        got = np.asarray(ehlers_highpass_detrend_mxu(x, periods))
        assert got.shape == (3, n)
        want = np.asarray(ops.ehlers_highpass_detrend_stacked(x, periods))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 2e-5 * scale, n
    # float64 sequential oracle: the matmul grouping must not LOSE accuracy
    xn = np.cumsum(rng(9).standard_normal(1000))
    x = jnp.asarray(xn, jnp.float32)
    x32 = np.asarray(x, np.float64)
    w = 2 * np.pi / 107
    alpha = (1 - np.sin(w)) / np.cos(w)
    c = (1 - alpha) / 2
    trend = np.zeros(1000)
    prev_t = 0.0
    for t in range(1000):
        prev_t = c * (x32[t] + x32[t - 1 if t else 0]) + alpha * prev_t
        trend[t] = prev_t
    want64 = x32 - trend
    got = np.asarray(ehlers_highpass_detrend_mxu(x, (107,)))[0]
    scan = np.asarray(ops.ehlers_highpass_detrend(x, 107))
    err_mxu = np.abs(got - want64).max()
    err_scan = np.abs(scan - want64).max()
    assert err_mxu <= max(err_scan * 1.5, 1e-5), (err_mxu, err_scan)
    # batch dims
    xb = jnp.asarray(rng(8).standard_normal((2, 4, 256)), jnp.float32)
    got = np.asarray(ehlers_highpass_detrend_mxu(xb, (32, 64)))
    assert got.shape == (2, 4, 2, 256)
    want = np.asarray(ops.ehlers_highpass_detrend_stacked(xb, (32, 64)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_frame_highpassed_rank1_identity_matches_per_window_scan():
    """`extract.frame_highpassed` (series-level filter + alpha^j rank-1
    correction) must equal cold-starting the Ehlers filter inside every
    rolling window — the reference detrends each window's copy
    independently (`...pla-kalman.mq5:3422-3435`)."""
    from wavespec_tpu.extract import frame_highpassed, frame_series

    x = jnp.asarray(
        100.0 + np.cumsum(0.05 * rng(3).standard_normal(1500)), jnp.float32
    )
    for window, hop, period in [(1024, 16, 256), (256, 7, 64)]:
        want = np.asarray(ops.ehlers_highpass_detrend(
            frame_series(x, window, hop), period))
        got = np.asarray(frame_highpassed(x, window, hop, period))
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-6 * max(scale, 1.0))
        # window 0's correction is (near-)zero by construction
        np.testing.assert_allclose(got[0], want[0], atol=2e-7 * max(scale, 1.0))


def test_group_delay_index_at_matches_full_path():
    """`group_delay_index_at` (3-bin local evaluation, what the v757 tail
    uses) equals the full phase->unwrap->gradient chain gathered at the
    same bins — interior, edge-0, and last-bin conventions included."""
    from wavespec_tpu.ops.phase import (
        fft_phase, group_delay_index, group_delay_index_at, unwrap_phase,
        unwrapped_gradient_at,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    spec = jnp.asarray(np.fft.rfft(x)[:, :40].astype(np.complex64))
    full = np.asarray(group_delay_index(unwrap_phase(fft_phase(spec))))
    idx = jnp.asarray(
        np.stack([[0, 1, 5, 17, 38, 39]] * 4).astype(np.int32))
    local = np.asarray(group_delay_index_at(spec, idx))
    want = np.take_along_axis(full, np.asarray(idx), axis=-1)
    np.testing.assert_allclose(local, want, rtol=1e-5, atol=1e-5)

    # un-clamped gradient flavor (the REALFFT ETA convention)
    uw = unwrap_phase(fft_phase(spec))
    g_full = np.gradient(np.asarray(uw), axis=-1)
    g_local = np.asarray(unwrapped_gradient_at(spec, idx))
    np.testing.assert_allclose(
        g_local, np.take_along_axis(g_full, np.asarray(idx), -1),
        rtol=1e-4, atol=1e-5,
    )


def test_onehot_gather_helpers_match_take_along_axis():
    """ops.gather one-hot picks == take_along_axis for in-range indices
    (f32 and int32, last-axis and row flavors)."""
    from wavespec_tpu.ops.gather import take_last, take_rows

    rng = np.random.default_rng(1)
    arr = rng.standard_normal((3, 7, 23)).astype(np.float32)
    idx = rng.integers(0, 23, (3, 7, 5)).astype(np.int32)
    want = np.take_along_axis(arr, idx, axis=-1)
    np.testing.assert_array_equal(
        np.asarray(take_last(jnp.asarray(arr), jnp.asarray(idx))), want)
    arri = (arr * 100).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(take_last(jnp.asarray(arri), jnp.asarray(idx))),
        np.take_along_axis(arri, idx, axis=-1))

    rows = rng.standard_normal((4, 11, 6)).astype(np.float32)
    ridx = rng.integers(0, 11, (4, 3)).astype(np.int32)
    want_r = np.take_along_axis(rows, ridx[..., None], axis=-2)
    np.testing.assert_array_equal(
        np.asarray(take_rows(jnp.asarray(rows), jnp.asarray(ridx))), want_r)
