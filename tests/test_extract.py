"""End-to-end extract_cycles tests: FFT ridge and MUSIC (SURVEY §7 steps 2+4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wavespec_tpu import extract
from wavespec_tpu.analyze.jacobi import jacobi_eigh
from wavespec_tpu.extract import (
    AMPLITUDE, COHERENCE, EIGEN_RATIO, ETA_BARS, ETA_CONFIDENCE, ENERGY_RATIO,
    FREQ, METHOD_ID,
    PERIOD, PHASE, SCORE, SNR_DB, ExtractConfig, Method, DetrendMode,
    extract_cycles, extract_cycles_batch,
)


def planted_series(n, cycles, noise=0.0, seed=0, trend=0.0):
    t = np.arange(n)
    x = np.zeros(n)
    for amp, period, psi in cycles:
        x += amp * np.sin(2 * np.pi * t / period + psi)
    if noise:
        x += noise * np.random.default_rng(seed).standard_normal(n)
    if trend:
        x += trend * t
    return x.astype(np.float32)


# ------------------------------------------------------------ jacobi eigh


def test_jacobi_eigh_matches_numpy():
    r = np.random.default_rng(0)
    a = r.standard_normal((5, 10, 10)).astype(np.float32)
    a = a + np.swapaxes(a, -1, -2)
    vals, vecs = jacobi_eigh(jnp.asarray(a))
    want_vals = np.linalg.eigvalsh(a.astype(np.float64))
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-4, atol=1e-4)
    # eigenvector property: A v = lambda v
    av = np.einsum("bij,bjk->bik", a, np.asarray(vecs))
    lv = np.asarray(vals)[:, None, :] * np.asarray(vecs)
    np.testing.assert_allclose(av, lv, atol=1e-3)


# --------------------------------------------------------- FFT ridge path


def fft_cfg(**kw):
    d = dict(window=1024, top_k=3, min_period=10.0, max_period=200.0,
             sample_rate_seconds=60.0, method=Method.FFT_RIDGE)
    d.update(kw)
    return ExtractConfig(**d)


def test_fft_ridge_recovers_periods_amplitudes():
    cfg = fft_cfg()
    # exact-bin periods: 1024/16=64, 1024/32=32
    x = planted_series(1024, [(2.0, 64.0, 0.3), (1.0, 32.0, 1.0)])
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    assert attrs.shape == (3, 15)
    np.testing.assert_allclose(attrs[0, PERIOD], 64.0, rtol=1e-5)
    np.testing.assert_allclose(attrs[1, PERIOD], 32.0, rtol=1e-5)
    np.testing.assert_allclose(attrs[0, AMPLITUDE], 2.0, rtol=1e-3)
    np.testing.assert_allclose(attrs[1, AMPLITUDE], 1.0, rtol=1e-3)
    assert attrs[0, METHOD_ID] == 0.0


def test_fft_ridge_phase_reconstructs_signal():
    """amp*sin(phase - omega*k) at bar (n-1-k) must match the planted wave."""
    cfg = fft_cfg(top_k=1)
    x = planted_series(1024, [(1.5, 64.0, 0.7)])
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))[0]
    amp, freq, phase = attrs[AMPLITUDE], attrs[FREQ], attrs[PHASE]
    omega = 2 * np.pi * freq
    for k in range(0, 200, 17):
        want = x[1023 - k]
        got = amp * np.sin(phase - omega * k)
        np.testing.assert_allclose(got, want, atol=2e-2)


def test_fft_ridge_eta_is_bars_to_next_extremum():
    cfg = fft_cfg(top_k=1)
    x = planted_series(1024, [(1.0, 64.0, 0.2)])
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))[0]
    eta = attrs[ETA_BARS]
    omega = 2 * np.pi * attrs[FREQ]
    theta_future = attrs[PHASE] + omega * eta
    # next extremum: theta = pi/2 (mod pi)
    assert abs(((theta_future - np.pi / 2) + np.pi / 2) % np.pi - np.pi / 2) < 1e-3
    assert 0 <= eta <= 32.5
    np.testing.assert_allclose(attrs[5], eta * 60.0, rtol=1e-5)  # eta_seconds


def test_fft_ridge_quality_fields_sane():
    cfg = fft_cfg(top_k=2)
    x = planted_series(1024, [(2.0, 64.0, 0.0)], noise=0.1, seed=1)
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    assert attrs[0, SNR_DB] > 10.0
    assert 0.0 <= attrs[0, ENERGY_RATIO] <= 1.0
    assert 0.0 <= attrs[0, SCORE] <= 1.0
    assert 0.0 <= attrs[0, ETA_CONFIDENCE] <= 1.0
    assert attrs[0, ENERGY_RATIO] > attrs[1, ENERGY_RATIO]


def test_linear_detrend_mode_removes_trend_bias():
    cfg_nd = fft_cfg(top_k=1)
    cfg_lin = fft_cfg(top_k=1, detrend=DetrendMode.LINEAR)
    x = planted_series(1024, [(1.0, 64.0, 0.0)], trend=0.02)
    a_nd = np.asarray(extract_cycles(jnp.asarray(x), cfg_nd))[0]
    a_lin = np.asarray(extract_cycles(jnp.asarray(x), cfg_lin))[0]
    # with detrend the amplitude estimate is closer to truth
    assert abs(a_lin[AMPLITUDE] - 1.0) <= abs(a_nd[AMPLITUDE] - 1.0) + 1e-6
    np.testing.assert_allclose(a_lin[PERIOD], 64.0, rtol=1e-5)


def test_batch_matches_single_window():
    cfg = fft_cfg(top_k=2)
    series = planted_series(1024 + 64, [(1.0, 64.0, 0.0), (0.5, 32.0, 0.5)],
                            noise=0.05, seed=2)
    hop = 16
    batch = np.asarray(extract_cycles_batch(jnp.asarray(series), cfg, hop=hop))
    nwin = 1 + (len(series) - 1024) // hop
    assert batch.shape == (nwin, 2, 15)
    for w in [0, nwin // 2, nwin - 1]:
        window = series[w * hop : w * hop + 1024]
        single = np.asarray(extract_cycles(jnp.asarray(window), cfg))
        np.testing.assert_allclose(batch[w], single, rtol=1e-3, atol=1e-4)


def test_no_repaint_invariant():
    """Appending bars never changes an already-computed window's attrs.

    This is the reference's one stated correctness invariant
    (`Legacy/WaveSpecZZ_1.0.2.mq5:15-17`). The framed path is gated
    bitwise. The default (hopped-DFT) path produces bitwise-stable
    SPECTRA (kernels.hopped_dft, tested there) but CPU XLA's
    fusion-dependent FMA contraction can shift the attr tail's
    noise-floor fields by ~1 ulp between batch shapes, so the default
    path is gated at float-noise tolerance instead (amp/freq/period/
    phase/ETA are exact; in production nothing ever recomputes an old
    window — caches append).
    """
    import dataclasses

    series = planted_series(1200, [(1.0, 50.0, 0.1)], noise=0.05, seed=3)
    cfg = fft_cfg(top_k=2, use_hopped_dft=False)
    a = np.asarray(extract_cycles_batch(jnp.asarray(series[:1100]), cfg, hop=16))
    b = np.asarray(extract_cycles_batch(jnp.asarray(series), cfg, hop=16))
    np.testing.assert_array_equal(a, b[: a.shape[0]])

    cfg_h = dataclasses.replace(cfg, use_hopped_dft=True)
    ah = np.asarray(extract_cycles_batch(jnp.asarray(series[:1100]), cfg_h, hop=16))
    bh = np.asarray(extract_cycles_batch(jnp.asarray(series), cfg_h, hop=16))
    np.testing.assert_array_equal(ah[..., :6], bh[: ah.shape[0], ..., :6])
    np.testing.assert_allclose(ah, bh[: ah.shape[0]], rtol=2e-6, atol=1e-6)


# -------------------------------------------------------------- MUSIC path


def music_cfg(**kw):
    d = dict(window=1024, top_k=2, min_period=10.0, max_period=200.0,
             method=Method.MUSIC, ar_order=10)
    d.update(kw)
    return ExtractConfig(**d)


@pytest.mark.slow
def test_music_perfect_cycles_regime():
    """CHANGELOG 'perfect cycles' regime: ar_order=10, top_k=2."""
    cfg = music_cfg()
    x = planted_series(1024, [(2.0, 64.0, 0.3), (1.0, 30.0, 1.2)])
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    assert attrs.shape == (2, 15)
    periods = sorted(attrs[:, PERIOD])
    np.testing.assert_allclose(periods, [30.0, 64.0], rtol=0.03)
    assert np.all(attrs[:, METHOD_ID] == 1.0)
    # amplitudes from the LS fit should be accurate
    amps = sorted(attrs[:, AMPLITUDE])
    np.testing.assert_allclose(amps, [1.0, 2.0], rtol=0.05)


def test_music_off_bin_superresolution():
    """MUSIC resolves a period that is NOT an integer FFT bin."""
    cfg = music_cfg(top_k=1, music_grid_per_bin=8)
    x = planted_series(1024, [(1.0, 47.3, 0.5)])
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    np.testing.assert_allclose(attrs[0, PERIOD], 47.3, rtol=0.02)


def test_music_phase_reconstruction():
    cfg = music_cfg(top_k=1)
    x = planted_series(1024, [(1.5, 64.0, 0.7)])
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))[0]
    amp, freq, phase = attrs[AMPLITUDE], attrs[FREQ], attrs[PHASE]
    omega = 2 * np.pi * freq
    for k in range(0, 400, 31):
        want = x[1023 - k]
        got = amp * np.sin(phase - omega * k)
        np.testing.assert_allclose(got, want, atol=5e-2)


def test_music_with_noise():
    cfg = music_cfg()
    x = planted_series(1024, [(2.0, 64.0, 0.3), (1.0, 30.0, 1.2)], noise=0.3, seed=4)
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    periods = sorted(attrs[:, PERIOD])
    np.testing.assert_allclose(periods, [30.0, 64.0], rtol=0.05)
    assert np.all(attrs[:, SNR_DB] > 0.0)


@pytest.mark.slow
def test_music_random_walk_background():
    """The realistic feed: cycles on a random-walk price. The internal
    high-pass must keep the drift out of the covariance, and the peak
    exclusion zone must prevent near-duplicate picks."""
    cfg = music_cfg(window=4096, ar_order=12, min_period=9.0)
    t = np.arange(4096)
    rw = np.cumsum(0.02 * np.random.default_rng(0).standard_normal(4096))
    x = (rw + 3.0 * np.sin(2 * np.pi * t / 50) + 2.0 * np.sin(2 * np.pi * t / 120)).astype(np.float32)
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    periods = sorted(attrs[:, PERIOD])
    np.testing.assert_allclose(periods, [50.0, 120.0], rtol=0.05)
    amps = sorted(attrs[:, AMPLITUDE])
    np.testing.assert_allclose(amps, [2.0, 3.0], rtol=0.15)
    # picks must be distinct (no near-duplicate ridge shoulders)
    assert abs(periods[1] - periods[0]) > 5.0


@pytest.mark.slow
def test_music_batch_shape():
    cfg = music_cfg()
    series = planted_series(1024 + 128, [(1.0, 64.0, 0.0)], noise=0.1, seed=5)
    out = np.asarray(extract_cycles_batch(jnp.asarray(series), cfg, hop=64))
    assert out.shape == (3, 2, 15)


def test_ar_order_too_small_raises():
    with pytest.raises(ValueError):
        cfg = music_cfg(ar_order=4, top_k=2)
        extract_cycles(jnp.zeros(1024), cfg)


def test_invalid_config_raises():
    with pytest.raises(ValueError):
        ExtractConfig(window=1000)
    with pytest.raises(ValueError):
        ExtractConfig(top_k=9)


@pytest.mark.slow
def test_auto_method_selects_music_when_confident():
    """AUTO: strong sinusoids -> MUSIC records; pure noise -> FFT ridge."""
    cfg = ExtractConfig(window=1024, top_k=2, min_period=10.0, max_period=200.0,
                        method=Method.AUTO, ar_order=10)
    clean = planted_series(1024, [(2.0, 64.0, 0.3), (1.0, 30.0, 1.2)], noise=0.05)
    attrs = np.asarray(extract_cycles(jnp.asarray(clean), cfg))
    assert np.all(attrs[:, METHOD_ID] == 1.0)  # confident subspace -> MUSIC
    periods = sorted(attrs[:, PERIOD])
    np.testing.assert_allclose(periods, [30.0, 64.0], rtol=0.05)

    noise = planted_series(1024, [], noise=1.0, seed=9)
    attrs_n = np.asarray(extract_cycles(jnp.asarray(noise), cfg))
    assert np.all(attrs_n[:, METHOD_ID] == 0.0)  # no structure -> FFT ridge


def test_esprit_frequencies_match_planted():
    from wavespec_tpu.analyze.esprit import esprit_frequencies
    from wavespec_tpu.ops.detrend import ehlers_highpass_detrend

    cfg = music_cfg(window=2048, ar_order=12, min_period=10.0)
    x = planted_series(2048, [(2.0, 64.0, 0.3), (1.0, 30.0, 1.2)], noise=0.1)
    xw = np.asarray(ehlers_highpass_detrend(jnp.asarray(x), 400))
    freqs = esprit_frequencies(xw[None, :], cfg)[0]
    got = sorted(1.0 / f for f in freqs if f > 0)
    assert len(got) == 2
    np.testing.assert_allclose(got, [30.0, 64.0], rtol=0.05)


@pytest.mark.slow
def test_music_flagship_defaults_on_drifting_feed():
    """Flagship regime (top_k=4, ar_order=10 -> tiny fixed noise subspace)
    on a drifting feed: the eigenvalue-gated noise subspace must prevent
    band-edge super-peaks and still find the true cycles."""
    cfg = ExtractConfig(window=4096, top_k=4, min_period=9.0, max_period=200.0,
                        method=Method.MUSIC, ar_order=10)
    t = np.arange(6000)
    x = (100.0 + np.cumsum(0.02 * np.random.default_rng(7).standard_normal(6000))
         + 2.5 * np.sin(2 * np.pi * t / 48 + 0.4)
         + 1.2 * np.sin(2 * np.pi * t / 130 + 1.1)).astype(np.float32)
    attrs = np.asarray(extract_cycles(jnp.asarray(x[-4096:]), cfg))
    periods = attrs[:, PERIOD]
    amps = attrs[:, AMPLITUDE]
    # both planted cycles present with sane amplitudes
    i48 = int(np.argmin(np.abs(periods - 48)))
    i130 = int(np.argmin(np.abs(periods - 130)))
    assert abs(periods[i48] - 48) / 48 < 0.05, periods
    assert abs(periods[i130] - 130) / 130 < 0.08, periods
    assert abs(amps[i48] - 2.5) / 2.5 < 0.25, amps
    # the strongest pick is a planted cycle, not a band-edge drift peak
    top = periods[np.argmax(amps)]
    assert abs(top - 48) < 5 or abs(top - 130) < 12, periods


def test_music_off_grid_weakest_cycle_survives_prerank():
    """The pre-refinement ranking reads FFT band power through a parabola
    interpolation of the three bins around each candidate. A weak cycle
    sitting exactly HALF an FFT bin off-grid (worst sinc rolloff: its
    nearest-bin power is only ~0.41x) must not be crowded out of the
    keep=2k refinement set by stronger on-grid cycles and noise picks."""
    cfg = ExtractConfig(window=4096, top_k=4, min_period=9.0, max_period=200.0,
                        method=Method.MUSIC, ar_order=10)
    n = 4096
    # bins 40, 60.5 (half-bin off-grid, WEAKEST), 90, 130
    bins = [40.0, 60.5, 90.0, 130.0]
    amps = [3.0, 0.5, 2.0, 1.5]
    t = np.arange(n)
    x = sum(a * np.sin(2 * np.pi * (b / n) * t + 0.3 * i)
            for i, (a, b) in enumerate(zip(amps, bins)))
    x = (x + 0.2 * np.random.default_rng(3).standard_normal(n)).astype(np.float32)
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    got_periods = attrs[:, PERIOD]
    for b, a in zip(bins, amps):
        want = n / b
        i = int(np.argmin(np.abs(got_periods - want)))
        assert abs(got_periods[i] - want) / want < 0.02, (b, got_periods)
        assert abs(attrs[i, AMPLITUDE] - a) / a < 0.2, (b, attrs[:, AMPLITUDE])


@pytest.mark.slow
def test_bin_to_gidx_table_matches_bruteforce():
    """The merged multi-band grid is NOT globally sorted (frequency
    descends block to block); the static bin->grid-index table used for
    ridge seeds must return the globally nearest grid point for EVERY
    in-band FFT bin (a plain searchsorted on the merged array returns
    unrelated indices — the round-2 ridge-seed bug)."""
    import wavespec_tpu.analyze.music as M
    from wavespec_tpu.ops.spectrum import band_indices

    cfg = ExtractConfig(window=4096, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)
    w = jnp.zeros((1, 4096), jnp.float32)
    _, freqs, _, _, _ = M.music_pseudospectrum(w, cfg)
    f_np = np.asarray(freqs)
    assert not np.all(np.diff(f_np) >= 0)  # the premise: merged grid unsorted

    k_min, k_max = band_indices(cfg.window, cfg.min_period, cfg.max_period)
    table = M._bin_to_gidx_table(cfg, k_min, k_max)
    k_vals = np.arange(k_min, k_max + 1) / cfg.window
    brute = np.abs(f_np[None, :] - k_vals[:, None]).argmin(axis=1)
    # exact index equality: the per-band searchsorted implementation
    # (round 5 — the dense argmin was ~27 GB of host f64 at window
    # 262144) reproduces the dense argmin's first-occurrence tie rules
    np.testing.assert_array_equal(table, brute)


def test_music_single_window_price_level():
    """Single-window MUSIC on a realistic PRICE-LEVEL input: the internal
    high-pass is cold-started per window, and its init transient used to
    scale with the absolute level (~100), drowning real cycles and
    emitting spurious low-frequency picks. First-sample anchoring zeroes
    the init step; both planted cycles must be recovered."""
    cfg = ExtractConfig(window=1024, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)
    t = np.arange(1024)
    x = (100.0 + np.sin(2 * np.pi * t / 20.0)
         + 0.8 * np.sin(2 * np.pi * t / 120.0)
         + 0.05 * np.random.default_rng(2).standard_normal(1024)
         ).astype(np.float32)
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    per = attrs[attrs[:, AMPLITUDE] > 0.1][:, PERIOD]
    assert any(abs(p - 20.0) / 20.0 < 0.03 for p in per), per
    assert any(abs(p - 120.0) / 120.0 < 0.05 for p in per), per


@pytest.mark.slow
def test_music_batch_fast_path_price_level():
    """Batch-path analog of the price-level test: the rolling-STFT fast
    path runs ONE series-level high-pass, which must be first-sample
    anchored too — otherwise window 0 (and every window overlapping the
    first ~3*hp_period bars, i.e. every OnlineDriver update span start)
    sees a level-sized cold-start transient and loses the real cycles."""
    cfg = ExtractConfig(window=1024, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=10)
    t = np.arange(1024 + 3 * 256)
    x = (100.0 + np.sin(2 * np.pi * t / 20.0)
         + 0.8 * np.sin(2 * np.pi * t / 120.0)
         + 0.05 * np.random.default_rng(2).standard_normal(t.size)
         ).astype(np.float32)
    attrs = np.asarray(extract_cycles_batch(jnp.asarray(x), cfg, hop=256))
    w0 = attrs[0]  # the window fully inside the cold-start span
    per = w0[w0[:, AMPLITUDE] > 0.1][:, PERIOD]
    assert any(abs(p - 20.0) / 20.0 < 0.03 for p in per), per
    assert any(abs(p - 120.0) / 120.0 < 0.05 for p in per), per
    # And the fast path must agree with the per-window reference path on
    # the recovered periods for the FIRST window.
    ref = np.asarray(extract_cycles(jnp.asarray(x[:1024]), cfg))
    ref_per = sorted(ref[ref[:, AMPLITUDE] > 0.1][:, PERIOD])
    got_per = sorted(per)
    assert len(ref_per) == len(got_per)
    np.testing.assert_allclose(got_per, ref_per, rtol=0.02)


def test_esprit_method_flagship_planted_sinusoids():
    """Method.ESPRIT through the PUBLIC surface at the flagship config
    (window 4096, ar_order 10, top_k 4, band [9, 200] — `1.1.0:21,49-51`):
    planted cycles recovered with amplitude/phase through the shared
    fit/rank tail, records carrying method_id=1 (subspace family)."""
    cfg = ExtractConfig(window=4096, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.ESPRIT, ar_order=10)
    t = np.arange(4096)
    x = (100.0 + 1.2 * np.sin(2 * np.pi * t / 50.0 + 0.7)
         + 0.6 * np.sin(2 * np.pi * t / 150.0)
         + 0.05 * np.random.default_rng(4).standard_normal(4096)
         ).astype(np.float32)
    attrs = np.asarray(extract_cycles(jnp.asarray(x), cfg))
    live = attrs[attrs[:, AMPLITUDE] > 0.1]
    per = live[:, PERIOD]
    assert any(abs(p - 50.0) / 50.0 < 0.02 for p in per), per
    assert any(abs(p - 150.0) / 150.0 < 0.05 for p in per), per
    # amplitudes recovered through the HP gain compensation
    a50 = live[np.argmin(np.abs(per - 50.0)), AMPLITUDE]
    assert abs(a50 - 1.2) / 1.2 < 0.1, a50
    assert (live[:, METHOD_ID] == 1.0).all()  # subspace family id
    # quality fields populated and sane
    assert (live[:, COHERENCE] > 0.3).all()
    assert (live[:, EIGEN_RATIO] > 1.0).all()


@pytest.mark.slow
def test_esprit_method_batch_fast_path_matches_single():
    """The ESPRIT batch fast path (series-level warm high-pass) must agree
    with the per-window path on window 0 (identical cold start there)."""
    cfg = ExtractConfig(window=1024, top_k=3, min_period=9.0,
                        max_period=200.0, method=Method.ESPRIT, ar_order=10)
    t = np.arange(1024 + 300)
    x = (100.0 + np.sin(2 * np.pi * t / 20.0)
         + 0.8 * np.sin(2 * np.pi * t / 120.0)
         + 0.02 * np.random.default_rng(6).standard_normal(t.size)
         ).astype(np.float32)
    batch = np.asarray(extract_cycles_batch(jnp.asarray(x), cfg, hop=150))
    single = np.asarray(extract_cycles(jnp.asarray(x[:1024]), cfg))
    np.testing.assert_allclose(batch[0], single, rtol=2e-3, atol=2e-3)
    # later (warm-filter) windows still recover the planted cycles
    for w in range(1, batch.shape[0]):
        per = batch[w][batch[w][:, AMPLITUDE] > 0.1][:, PERIOD]
        assert any(abs(p - 20.0) / 20.0 < 0.03 for p in per), (w, per)


def test_esprit_method_ar_order_validation():
    with pytest.raises(ValueError, match="ar_order >= 2\\*top_k\\+2"):
        ExtractConfig(window=1024, top_k=4, method=Method.ESPRIT, ar_order=8)


@pytest.mark.slow
def test_esprit_topk_exceeding_true_count():
    """ESPRIT with top_k above the true sinusoid count: the rotation
    operator then has UNPAIRED REAL eigenvalues, which shifted the old
    sort-adjacency conjugate fold by one — every estimate destroyed and a
    phantom mid-band frequency (the average of the two true ones)
    emitted. Positive-angle selection must recover both true frequencies
    and no phantom near their average."""
    from wavespec_tpu.analyze.esprit import (
        esprit_frequencies, esprit_frequencies_host)

    cfg = ExtractConfig(window=1024, top_k=4, min_period=9.0,
                        max_period=200.0, method=Method.MUSIC, ar_order=12)
    t = np.arange(1024)
    x = (np.sin(2 * np.pi * t / 20.0) + np.sin(2 * np.pi * t / 50.0)
         + 0.01 * np.random.default_rng(3).standard_normal(1024)
         ).astype(np.float32)
    for fn in (esprit_frequencies, esprit_frequencies_host):
        f = np.asarray(fn(jnp.asarray(x), cfg))
        f = f[f > 0]
        assert any(abs(v - 1 / 20.0) / (1 / 20.0) < 0.02 for v in f), (fn, f)
        assert any(abs(v - 1 / 50.0) / (1 / 50.0) < 0.02 for v in f), (fn, f)
        mid = 0.5 * (1 / 20.0 + 1 / 50.0)
        assert not any(abs(v - mid) / mid < 0.05 for v in f), (fn, f)


@pytest.mark.slow
def test_music_batch_hopped_seeds_match_framed_seeds():
    """The MUSIC batch fast path's ridge seeds may come from the
    overlap-shared hopped DFT (kernels.hopped_dft) instead of a framed
    MXU DFT; the two spectra agree to ~2e-7, so the extracted attrs must
    agree to float noise on the estimator core."""
    import dataclasses

    cfg = music_cfg(top_k=3, use_hopped_dft=True)
    series = planted_series(1024 + 4 * 128, [(1.0, 50.0, 0.1), (0.5, 121.3, 0.8)],
                            noise=0.05, seed=11)
    a = np.asarray(extract_cycles_batch(jnp.asarray(series), cfg, hop=128))
    cfg_f = dataclasses.replace(cfg, use_hopped_dft=False)
    b = np.asarray(extract_cycles_batch(jnp.asarray(series), cfg_f, hop=128))
    assert a.shape == b.shape
    # amplitude/freq/period/phase/eta of every valid pick
    np.testing.assert_allclose(a[..., :6], b[..., :6], rtol=1e-4, atol=1e-5)


def test_band_precondition_phase_decimated_matches_framed():
    """`band_precondition_windows` (phase-decimated series framing) must
    be BITWISE equal to the frame-then-decimate oracle
    (`_band_precondition_windows_framed`): same box sample sets, same
    per-box mean, framing is slices. Sweeps decimations (incl. d=1 and
    d>hop), hops with every gcd relationship, tiny nwin < g, and a
    leading batch dim."""
    import dataclasses

    from wavespec_tpu.analyze.music import (
        _band_precondition_windows_framed,
        band_precondition_windows,
    )

    rng = np.random.default_rng(7)
    base = music_cfg(window=256, min_period=9.0, max_period=60.0)
    cases = [
        (None, 0, 64, 17),   # auto band plan, flagship-style hop
        (None, 0, 1, 9),     # hop=1 (g = d)
        (None, 0, 15, 5),    # hop sharing partial gcd with d
        (3, 1, 64, 12),      # forced single band, d=3
        (20, 1, 64, 3),      # d=20, g=5 > nwin=3 (empty phases)
        (1, 1, 33, 4),       # d=1 passthrough
        (8, 1, 12, 7),       # d > hop, gcd=4
    ]
    for dec, bands, hop, nwin in cases:
        cfg = dataclasses.replace(
            base, music_decimation=dec or 0, music_bands=bands
        )
        n_bars = cfg.window + (nwin - 1) * hop + 3  # +3: nwin from length
        x = jnp.asarray(rng.standard_normal(n_bars), jnp.float32)
        got = band_precondition_windows(x, cfg, hop)
        want = _band_precondition_windows_framed(x, cfg, hop)
        assert len(got) == len(want)
        for gb, wb in zip(got, want):
            assert gb.shape == wb.shape, (dec, bands, hop, nwin)
            np.testing.assert_array_equal(
                np.asarray(gb), np.asarray(wb),
                err_msg=f"case {(dec, bands, hop, nwin)}",
            )
    # leading batch dim
    cfg = dataclasses.replace(base, music_decimation=0, music_bands=0)
    xb = jnp.asarray(rng.standard_normal((3, 256 + 6 * 64)), jnp.float32)
    got = band_precondition_windows(xb, cfg, 64)
    want = _band_precondition_windows_framed(xb, cfg, 64)
    for gb, wb in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gb), np.asarray(wb))


def test_pseudo_denominator_lags_matches_projected():
    """The hot-path sum-of-lags pseudospectrum denominator
    (`_pseudo_denominator_lags` — one real [G, m] @ [m, batch] matmul)
    equals the dense-projection oracle ||a(w)^H E_n||^2
    (`_pseudo_denominator_projected`) for both the static noise-block
    split and the weighted (gated) projector, to f32 summation-order
    tolerance."""
    import wavespec_tpu.analyze.music as M

    rng = np.random.default_rng(11)
    m, p_keep, g_pts, batch = 10, 6, 57, 12
    # orthonormal-ish eigenvector blocks (orthonormality not required by
    # the identity — use raw random matrices to exercise the general case)
    vecs = jnp.asarray(rng.standard_normal((batch, m, p_keep)), jnp.float32)
    freqs = jnp.asarray(
        np.linspace(1 / 200.0, 1 / 9.0, g_pts), jnp.float32)
    for d in (1, 3, 20):
        for w in (None,
                  jnp.asarray(rng.integers(0, 2, (batch, 1, p_keep)),
                              jnp.float32)):
            got = np.asarray(M._pseudo_denominator_lags(vecs, w, freqs, m, d))
            want = np.asarray(
                M._pseudo_denominator_projected(vecs, w, freqs, m, d))
            np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_trig_dot_matches_dense_basis():
    """`_trig_dot` over the factored tables (merged cos/sin fine tables,
    128-lane n2 split) equals the dense sum_t x[t] cos/sin(2 pi f t)
    evaluated in float64."""
    import wavespec_tpu.analyze.music as M

    rng = np.random.default_rng(7)
    for n in (256, 4096):
        n2 = M._split_n2(n)
        x = rng.standard_normal((5, n)).astype(np.float32)
        f = rng.uniform(1 / 200.0, 1 / 9.0, (5, 9)).astype(np.float32)
        xr = jnp.asarray(x.reshape(5, n // n2, n2))
        c1, s1, c2, s2 = M._factored_trig(jnp.asarray(f), n // n2, n2)
        gc, gs = M._trig_dot(xr, c1, s1, c2, s2)
        t = np.arange(n, dtype=np.float64)
        ang = 2 * np.pi * f[..., None].astype(np.float64) * t
        want_c = np.sum(x[:, None, :] * np.cos(ang), axis=-1)
        want_s = np.sum(x[:, None, :] * np.sin(ang), axis=-1)
        scale = np.sqrt(n) * np.abs(x).max()
        np.testing.assert_allclose(np.asarray(gc), want_c,
                                   atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(gs), want_s,
                                   atol=2e-4 * scale)


def test_refine_moments_matches_exact():
    """The moment-expansion refine (`_refine_freq_moments` — one data
    pass via 4 block moments + Taylor stencil evaluation) agrees with
    the exact 6-pass `_refine_freq` to well under the refine target
    accuracy, for both subspace-style fine steps and ridge-style
    half-bin steps, at the window sizes the router sends to it."""
    import wavespec_tpu.analyze.music as M

    rng = np.random.default_rng(13)
    for n in (2048, 4096):
        t = np.arange(n)
        x = np.stack([
            (np.sin(2 * np.pi * t / p0) + 0.5 * np.sin(2 * np.pi * t / p1)
             + 0.2 * rng.standard_normal(n))
            for (p0, p1) in [(50.0, 120.0), (23.7, 87.3), (11.2, 190.0)]
        ]).astype(np.float32)
        w = jnp.asarray(x)
        # candidates: near-truth fine-step picks + integer-bin ridge seeds
        truths = np.array([[1/50.0, 1/120.0], [1/23.7, 1/87.3],
                           [1/11.2, 1/190.0]], np.float32)
        fine = truths + rng.uniform(-0.25, 0.25, truths.shape) / n
        ridge = np.round(truths * n) / n
        freq = jnp.asarray(np.concatenate([fine, ridge], axis=1))
        step = jnp.asarray(np.concatenate(
            [np.full_like(fine, 1.0 / (8 * n)),
             np.full_like(ridge, 0.5 / n)], axis=1))
        assert n >= 16 * M._split_n2(n)  # router premise
        exact, _ = M._refine_freq(w, freq, step)
        fast, _ = M._refine_freq_moments(w, freq, step)
        dbins = np.abs(np.asarray(exact) - np.asarray(fast)) * n
        assert dbins.max() < 5e-3, (n, dbins.max())
