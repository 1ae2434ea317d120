"""Online (incremental) serving driver for the v7.57 FULL analytics.

The reference's production mode is incremental: persistent tracker/ETA/
signal/Kalman globals survive `OnCalculate` ticks and only NEW bars are
processed — chunked history replay over persistent state
(`Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:3186-3342`, the state arrays at
`:966-986,1415-1530`). `pipeline.drivers.OnlineDriver` covers the
flagship extract+decode path; this driver covers the complete v757
pipeline: spectral stage -> trackers/slots/leaks -> biquad -> ETA ->
FollowFirst -> Kalman, every machine resumed from carried state so a
live tick pays only for its new frames.

Parity contract (pinned by tests/test_v757_online.py): feeding the same
history through `update()` in ANY chunking — including one bar at a
time — produces outputs BITWISE equal to the one-shot
`run_v757(series, cfg)` with the same (resumable) config, on every
backend. The enablers:

- the spectral stage is recomputed per canonical 128-frame block with
  FIXED operand shapes (`pipeline.v757._resumable_block_spec`), so the
  driver's recomputation of its current block performs literally the
  same arithmetic the one-shot did;
- the Ehlers detrend is block-sequential and carries its (trend, price)
  state across 128-sample boundaries
  (`ops.detrend.ehlers_highpass_blocked`);
- the tracker resumes via `track_frames(init=)` (XLA scan on CPU, the
  single-launch Pallas kernel on device);
- the tail machines resume via `_v757_tail_core(init=)` — the XLA
  primitives' states on CPU, the tail kernel's packed `V757TailState`
  on a real device.

Shapes & compiles: each `update()` advances in steps of `r` new frames
(`r` <= the remainder of the current 128-frame block); `r` is a static
shape. With `canonical_steps=True` (default) every advance is decomposed
into power-of-two sub-steps, so ANY cadence compiles at most 8 programs
(`_CANONICAL_STEPS`); a steady cadence (one bar per tick -> r=1, whole
blocks -> r=128) compiles exactly one.

Fleet serving: `V757OnlineDriver(cfg, batch=B)` carries every machine's
state with a leading [B] symbol axis (lockstep ticks) and is bitwise
equal to `run_v757_batch` under any chunking — one device program per
step serves the whole fleet.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from wavespec_tpu.analyze.trackers import track_frames
from wavespec_tpu.extract import DetrendMode
from wavespec_tpu.ops.detrend import ehlers_highpass_blocked
from wavespec_tpu.pipeline.v757 import (
    FRAME_BLOCK,
    V757Config,
    _cands_and_gd,
    _pack_transfer,
    _resumable_block_spec,
    _unpack_transfer,
    _v757_tail_core,
)


@partial(jax.jit, static_argnames=("cfg", "r"))
def _online_step(seg, hp_carry, lead, tracker_state, tail_state,
                 cfg: V757Config, r: int):
    """Advance `r` new frames of the current 128-frame block.

    seg: [..., window + FRAME_BLOCK - 1] raw samples starting at the
    block's first frame (zero-padded past the live edge — pad samples
    are never read by the first `lead + r` frames); leading dims are a
    lockstep symbol batch (fleet serving). `lead` (traced i32): the
    first new frame's offset within the block; `hp_carry`: Ehlers state
    at the block start (None fresh / non-EHLERS); `tracker_state`/
    `tail_state`: None on the very first step, then the previous step's
    returns.

    Returns (packed outputs for the r frames, spans, tracker', tail').
    """
    seg = seg.astype(jnp.float32)
    if cfg.detrend == DetrendMode.EHLERS:
        hp_seg = ehlers_highpass_blocked(
            seg, cfg.trend_period, block=FRAME_BLOCK, carry=hp_carry
        )
        tr_seg = seg - hp_seg
    else:
        hp_seg, tr_seg = seg, seg
    spec = _resumable_block_spec(seg, hp_seg, tr_seg, cfg)  # [..., FB, K]
    spec_r = jax.lax.dynamic_slice_in_dim(spec, lead, r, axis=-2)
    spectral = _cands_and_gd(spec_r, cfg)

    slots, tracker_state = track_frames(
        spectral[0], spectral[1], spectral[2], spectral[3],
        cfg=cfg.tracker, init=tracker_state,
    )
    newest = jax.lax.dynamic_slice_in_dim(
        seg, cfg.window - 1 + lead, r, axis=-1
    )
    # the two prices before the step's first frame — only read on the
    # very first step (fresh tail); resumed tails carry their own
    # price history (window >= 3, so both indices are real samples,
    # matching `_v757_tail`'s one-shot alignment).
    price_prev = jax.lax.dynamic_slice_in_dim(
        seg, cfg.window - 3 + lead, 2, axis=-1
    )
    out, tail_state = _v757_tail_core(
        newest, price_prev, spectral, slots, cfg, 1,
        init=tail_state, return_state=True,
    )
    packed, spans = _pack_transfer(out)
    return packed, spans, tracker_state, tail_state


@partial(jax.jit, static_argnames=("trend_period",))
def _advance_hp_carry(block_samples, hp_carry, trend_period: int):
    """Ehlers carry across one completed 128-sample block (the same
    per-block arithmetic the one-shot blocked filter chains through)."""
    _, carry = ehlers_highpass_blocked(
        block_samples.astype(jnp.float32), trend_period,
        block=FRAME_BLOCK, carry=hp_carry, return_carry=True,
    )
    return carry


# ================= opt-in O(r) fast spectral serving path =================
#
# The bitwise driver's per-tick cost is ~100% the canonical 128-frame
# block recompute (docs/ROUND4.md) — N*K*M-scale work to emit ONE new
# frame. The window transform obeys an exact one-step recurrence
# (kernels/sliding_dft.py docstring):
#
#     Y_{f} = e^{if} (Y_{f-1} - sh[f-1] + sh[f+N-1] e^{-ifN})
#
# so a serving tick only needs O(r * K * M) work: carry Y of the last
# frame, the high-passed-sample ring of the current window, and the
# Ehlers scalar state; re-anchor with one exact window DFT every
# FRAME_BLOCK frames to stop f32 recurrence drift. This is the
# tolerance-gated fast-path precedent (`ops.detrend` MXU-Toeplitz, the
# repo's ~7e-6-rel standard) applied to online serving: outputs match
# the bitwise driver to f32 noise (gated by tests/test_v757_online.py),
# the default stays bitwise.


class FastSpectralState(NamedTuple):
    """Carried spectral state of the fast path. Leading dims = the
    symbol batch; `hp_ring`/`d_ring` hold the last `window` ingested
    samples' high-passed values and Ehlers rank-1 deltas at slot
    (p mod window)."""

    y_re: jax.Array    # [..., K, M] window transform at the last frame
    y_im: jax.Array
    hp_ring: jax.Array # [..., window]
    d_ring: jax.Array  # [..., window]
    trend: jax.Array   # [...] Ehlers trend after the last sample
    price: jax.Array   # [...] the last sample


@lru_cache(maxsize=None)
def _fast_tables(window: int, n_bins: int, taper: int):
    """Host f64 phase tables (mod-1 folded) for the incremental update.

    phi[k, m] = k/N - m/(N-1) cycles/sample — the taper-shifted
    frequencies of `kernels.sliding_dft` (the symmetric-taper harmonic
    fold). rot[t] = e^{+2pi i phi t} for t in [0, FRAME_BLOCK];
    tail = e^{-2pi i phi N}; basis[j] = e^{-2pi i phi j} (anchor DFT).
    """
    from wavespec_tpu.kernels.sliding_dft import taper_harmonics

    harmonics = taper_harmonics(taper)
    if harmonics is None:
        raise ValueError(f"taper {taper} has no harmonic form (Bartlett)")
    m_vals = np.array([m for m, _ in harmonics], np.float64)
    a_vals = np.array([a for _, a in harmonics], np.float64)
    k = np.arange(n_bins, dtype=np.float64)
    phi = k[:, None] / window - m_vals[None, :] / (window - 1)   # [K, M]

    def cis(x):
        x = x - np.round(x)
        return np.cos(2 * np.pi * x) + 1j * np.sin(2 * np.pi * x)

    t = np.arange(FRAME_BLOCK + 1, dtype=np.float64)[:, None, None]
    rotpow = cis(t * phi[None])
    tailrot = cis(-float(window) * phi)
    j = np.arange(window, dtype=np.float64)[:, None]
    basis = cis(-j * phi.reshape(1, -1))                          # [N, K*M]
    f32 = lambda x: np.ascontiguousarray(x, np.float32)
    return {
        "rot_re": f32(rotpow.real), "rot_im": f32(rotpow.imag),
        "tail_re": f32(tailrot.real), "tail_im": f32(tailrot.imag),
        "basis_re": f32(basis.real), "basis_im": f32(basis.imag),
        "a_vals": f32(a_vals),
        "phi": phi,
    }


def _fast_nbins(cfg: V757Config) -> int:
    from wavespec_tpu.ops.spectrum import band_indices

    _, k_max = band_indices(cfg.window, cfg.min_period, cfg.max_period)
    return min(k_max + 3, cfg.window // 2)


def _fast_bootstrap(samples: np.ndarray, cfg: V757Config) -> FastSpectralState:
    """Host-side warmup over the first window-1 samples (one-time O(N)).

    Builds the ring over samples p in [-1, N-1) (slot N-1 holds the
    VIRTUAL sample -1 = 0) and the transform of the virtual frame -1,
    Y_{-1} = sum_{u<N-1} hp[u] e^{-2pi i phi (u+1)} (f64), so the first
    fast step's recurrence lands exactly on frame 0."""
    n = cfg.window
    tabs = _fast_tables(n, _fast_nbins(cfg), int(cfg.taper))
    s = np.asarray(samples, np.float32)
    assert s.shape[-1] == n - 1, s.shape
    lead = s.shape[:-1]
    if cfg.detrend == DetrendMode.EHLERS:
        alpha, c2 = _ehlers_consts_np(cfg.trend_period)
        a32 = np.float32(alpha)
        c32 = np.float32(c2 / 2.0)
        c2f = np.float32(c2)
        trend = np.zeros(lead, np.float32)
        price_prev = s[..., 0]
        hp = np.empty_like(s)
        delta = np.empty_like(s)
        for j in range(n - 1):
            x = s[..., j]
            trend = c32 * (x + price_prev) + a32 * trend
            hp[..., j] = x - trend
            delta[..., j] = c2f * x - trend
            price_prev = x
    else:
        hp, delta = s, np.zeros_like(s)
        trend = np.zeros(lead, np.float32)
        price_prev = s[..., -1]
    hp_ring = np.zeros((*lead, n), np.float32)
    hp_ring[..., : n - 1] = hp
    d_ring = np.zeros((*lead, n), np.float32)
    d_ring[..., : n - 1] = delta
    phi = tabs["phi"]
    j = np.arange(1, n, dtype=np.float64)[:, None]
    ang = j * phi.reshape(1, -1)
    ang -= np.round(ang)
    basis = np.exp(-2j * np.pi * ang)                    # [N-1, K*M]
    y = hp.astype(np.float64).reshape(-1, n - 1) @ basis
    y = y.reshape(*lead, *phi.shape)
    return FastSpectralState(
        y_re=jnp.asarray(y.real.astype(np.float32)),
        y_im=jnp.asarray(y.imag.astype(np.float32)),
        hp_ring=jnp.asarray(hp_ring),
        d_ring=jnp.asarray(d_ring),
        trend=jnp.asarray(trend),
        price=jnp.asarray(price_prev),
    )


def _ehlers_consts_np(trend_period: int) -> tuple[float, float]:
    from wavespec_tpu.pipeline.v757 import _ehlers_consts

    return _ehlers_consts(trend_period)


@partial(jax.jit, static_argnames=("cfg", "r"))
def _fast_step(new_bars, price_prev, fstate: FastSpectralState, f0,
               tracker_state, tail_state, cfg: V757Config, r: int):
    """Advance r frames [f0, f0+r) from r new bars (bar t completes
    frame f0+t). O(r*K*M) spectral work + the tracker/tail resumes.

    The r recurrence steps are vectorized via unit-modulus rotation
    splitting: Y[i] = rot^{i+1} (Y_A + prefix[i]), prefix[i] =
    sum_{t<=i} conj(rot^t) d_t — one cumsum instead of a sequential
    scan over frames."""
    n = cfg.window
    n_bins = _fast_nbins(cfg)
    tabs = _fast_tables(n, n_bins, int(cfg.taper))
    s_new = new_bars.astype(jnp.float32)                 # [..., r]

    if cfg.detrend == DetrendMode.EHLERS:
        alpha, c2 = _ehlers_consts_np(cfg.trend_period)
        cst = jnp.float32(c2 / 2.0)
        a32 = jnp.float32(alpha)
        c2f = jnp.float32(c2)

        def estep(carry, x):
            trend_p, price_p = carry
            trend = cst * (x + price_p) + a32 * trend_p
            return (trend, x), (x - trend, c2f * x - trend)

        (trend_f, price_f), (hp_new, d_new) = jax.lax.scan(
            estep, (fstate.trend, fstate.price), jnp.moveaxis(s_new, -1, 0)
        )
        hp_new = jnp.moveaxis(hp_new, 0, -1)
        d_new = jnp.moveaxis(d_new, 0, -1)
    else:
        hp_new, d_new = s_new, jnp.zeros_like(s_new)
        trend_f, price_f = fstate.trend, s_new[..., -1]

    # circular reads: leaving heads at slots (f0-1+t) mod N; the frame
    # deltas at (f0+t) mod N (sample f0+t is each frame's START).
    start = jnp.mod(f0 - 1, n)
    hp2 = jnp.concatenate([fstate.hp_ring, fstate.hp_ring], axis=-1)
    heads = jax.lax.dynamic_slice_in_dim(hp2, start, r, axis=-1)
    d2 = jnp.concatenate([fstate.d_ring, fstate.d_ring], axis=-1)
    deltas = jax.lax.dynamic_slice_in_dim(d2, jnp.mod(f0, n), r, axis=-1)

    # d_t = hp[f0+t+N-1] e^{-2pi i phi N} - hp[f0+t-1]   [..., r, K, M]
    tail_re = jnp.asarray(tabs["tail_re"])
    tail_im = jnp.asarray(tabs["tail_im"])
    dr = hp_new[..., None, None] * tail_re - heads[..., None, None]
    di = hp_new[..., None, None] * tail_im
    cr = jnp.asarray(tabs["rot_re"][:r])                 # conj(rot^t)
    ci = jnp.asarray(-tabs["rot_im"][:r])
    pr = jnp.cumsum(dr * cr - di * ci, axis=-3)
    pi = jnp.cumsum(dr * ci + di * cr, axis=-3)
    tr_ = fstate.y_re[..., None, :, :] + pr
    ti_ = fstate.y_im[..., None, :, :] + pi
    rr = jnp.asarray(tabs["rot_re"][1 : r + 1])
    ri = jnp.asarray(tabs["rot_im"][1 : r + 1])
    yr = tr_ * rr - ti_ * ri                             # [..., r, K, M]
    yi = tr_ * ri + ti_ * rr

    # tapered spectrum: sum_m a_m Y[k, m], minus the Ehlers per-window
    # cold-start rank-1 correction delta_f * DFT(taper * alpha^j)
    # (the same identity `extract.frame_highpassed` rides).
    a_vals = jnp.asarray(tabs["a_vals"])
    spec_re = jnp.sum(yr * a_vals, axis=-1)              # [..., r, K]
    spec_im = jnp.sum(yi * a_vals, axis=-1)
    if cfg.detrend == DetrendMode.EHLERS:
        from wavespec_tpu.kernels.sliding_dft import tapered_dft_of

        alpha, _ = _ehlers_consts_np(cfg.trend_period)
        tg = np.asarray(tapered_dft_of(
            alpha ** np.arange(n, dtype=np.float64), n_bins, cfg.taper
        ))
        spec_re = spec_re - deltas[..., None] * jnp.asarray(
            tg.real.astype(np.float32))
        spec_im = spec_im - deltas[..., None] * jnp.asarray(
            tg.imag.astype(np.float32))
    spec_r = jax.lax.complex(spec_re, spec_im)

    # ring write-back: the new samples land at the same slots the heads
    # left, [start, start+r) mod N — doubled-buffer update + wrap fold.
    def ring_update(ring2, new):
        upd = jax.lax.dynamic_update_slice_in_dim(ring2, new, start, axis=-1)
        wrap = jnp.arange(n) < (start + r - n)
        return jnp.where(wrap, upd[..., n:], upd[..., :n])

    fstate_new = FastSpectralState(
        y_re=yr[..., -1, :, :], y_im=yi[..., -1, :, :],
        hp_ring=ring_update(hp2, hp_new),
        d_ring=ring_update(d2, d_new),
        trend=trend_f, price=price_f,
    )

    spectral = _cands_and_gd(spec_r, cfg)
    slots, tracker_state = track_frames(
        spectral[0], spectral[1], spectral[2], spectral[3],
        cfg=cfg.tracker, init=tracker_state,
    )
    out, tail_state = _v757_tail_core(
        s_new, price_prev.astype(jnp.float32), spectral, slots, cfg, 1,
        init=tail_state, return_state=True,
    )
    packed, spans = _pack_transfer(out)
    return packed, spans, fstate_new, tracker_state, tail_state


@partial(jax.jit, static_argnames=("cfg",))
def _fast_anchor(fstate: FastSpectralState, f_a, cfg: V757Config):
    """Exact re-anchor: one window DFT at frame f_a (whose window
    [f_a, f_a+N) is exactly the ring's content) replaces the carried Y,
    bounding recurrence drift to FRAME_BLOCK steps."""
    n = cfg.window
    n_bins = _fast_nbins(cfg)
    tabs = _fast_tables(n, n_bins, int(cfg.taper))
    hp2 = jnp.concatenate([fstate.hp_ring, fstate.hp_ring], axis=-1)
    win = jax.lax.dynamic_slice_in_dim(hp2, jnp.mod(f_a, n), n, axis=-1)
    hi = jax.lax.Precision.HIGHEST
    yr = jnp.einsum("...j,jk->...k", win, jnp.asarray(tabs["basis_re"]),
                    precision=hi)
    yi = jnp.einsum("...j,jk->...k", win, jnp.asarray(tabs["basis_im"]),
                    precision=hi)
    km = tabs["phi"].shape
    return fstate._replace(
        y_re=yr.reshape(*win.shape[:-1], *km),
        y_im=yi.reshape(*win.shape[:-1], *km),
    )


# Canonical step sizes: every `update()` advance is decomposed into
# power-of-two sub-steps (greedy largest-first, never crossing a
# 128-frame block boundary), so ANY tick/backfill cadence compiles at
# most len(_CANONICAL_STEPS) programs instead of one per distinct step
# size (a bursty feed could otherwise spend its first hour compiling —
# each distinct r is a 30-120 s axon compile). Decomposing a step is
# just a finer chunking, which the bitwise chunked==one-shot contract
# already covers, so no masking/padding machinery is needed.
_CANONICAL_STEPS = (128, 64, 32, 16, 8, 4, 2, 1)


@dataclasses.dataclass
class V757OnlineDriver:
    """Per-tick incremental v757 serving (`OnCalculate` contract).

    Call `update(new_bars)` with each batch of new closes (any size,
    including a single bar); returns the newly computed per-frame rows
    (same fields as `run_v757`). `buffers()` returns everything emitted
    so far. Emitted rows are never rewritten (no-repaint), and the
    concatenated rows are bitwise equal to `run_v757(full_series, cfg)`.

    `batch=B` serves a FLEET of B symbols from one driver (the
    reference's batch-fetcher workload, `WaveCyclesBatchFetcher.mq5:
    91-143`, composed with its persistent-replay production mode,
    `Legacy/WaveSpecZZ_1.0.3-pla-kalman.mq5:3186-3342`): `update` takes
    [B, n_new] closes (all symbols tick in lockstep), outputs gain a
    leading [B] axis, and the concatenated rows are bitwise equal to
    `run_v757_batch(full_batch, cfg)` — one block recompute and one
    tracker/tail advance serve all B symbols (on device the kernels put
    the fleet on their 128 VPU lanes).

    `canonical_steps=True` (default) bounds jit compilation: steps are
    decomposed into power-of-two sub-steps so at most 8 distinct
    programs ever compile, whatever the tick cadence. False advances in
    one maximal step per block (one program per distinct step size —
    only sensible for a fixed known cadence).

    `fast_spectral=True` (opt-in) swaps the canonical block recompute
    for the O(r) incremental sliding-DFT update (`_fast_step` above):
    per-tick spectral work drops from N*K*M to r*K*M with an exact
    re-anchor every 128 frames. Outputs match the bitwise driver to f32
    noise (a tolerance-gated fast path like `ops.detrend`'s MXU-Toeplitz
    variant, NOT bitwise — near-tie candidate ranks can differ); the
    tracker/tail machinery is identical. Needs a harmonic taper
    (not Bartlett) and window >= 128.
    """

    cfg: V757Config = V757Config(resumable=True)
    batch: int | None = None
    canonical_steps: bool = True
    fast_spectral: bool = False

    def __post_init__(self) -> None:
        if not self.cfg.resumable:
            self.cfg = dataclasses.replace(self.cfg, resumable=True)
        if self.cfg.detrend not in (DetrendMode.EHLERS, DetrendMode.NONE):
            raise ValueError("online v757 supports EHLERS/NONE detrend")
        if self.batch is not None and self.batch < 1:
            raise ValueError(f"batch must be >= 1, got {self.batch}")
        if self.fast_spectral:
            from wavespec_tpu.kernels.sliding_dft import taper_harmonics

            if taper_harmonics(self.cfg.taper) is None:
                raise ValueError(
                    "fast_spectral needs a harmonic taper (not Bartlett)"
                )
            if self.cfg.window < FRAME_BLOCK:
                raise ValueError(
                    f"fast_spectral needs window >= {FRAME_BLOCK}"
                )
        self._n_total = 0          # bars consumed
        self._t_done = 0           # frames emitted
        self._a0 = 0               # absolute sample index of _buf[..., 0]
        lead = () if self.batch is None else (self.batch,)
        self._buf = np.zeros((*lead, 0), np.float32)  # samples [a0, n_total)
        self._hp_carry = None      # Ehlers (trend, price) state at a0
        self._tracker = None
        self._tail = None
        self._fast: FastSpectralState | None = None
        self._rows: dict[str, np.ndarray] | None = None

    # ------------------------------------------------------------- API

    def update(self, new_bars: np.ndarray) -> dict[str, np.ndarray]:
        """Ingest new bars; compute and return all newly available frames
        (frame f covers bars [f, f + window); empty dict-of-empties if no
        new frame completed). Single-series drivers take [n_new] bars;
        fleet drivers (`batch=B`) take [B, n_new]."""
        new_bars = np.asarray(new_bars, np.float32)
        if self.batch is None:
            new_bars = new_bars.ravel()
        elif new_bars.ndim != 2 or new_bars.shape[0] != self.batch:
            raise ValueError(
                f"fleet update expects [batch={self.batch}, n_new] bars, "
                f"got shape {new_bars.shape}"
            )
        if new_bars.shape[-1]:
            self._buf = np.concatenate([self._buf, new_bars], axis=-1)
            self._n_total += new_bars.shape[-1]
        if (
            self._hp_carry is None
            and self.cfg.detrend == DetrendMode.EHLERS
            and self._n_total > 0
        ):
            # Eager fresh-start carry: `ehlers_highpass_blocked(carry=None)`
            # seeds (trend=0, price=price[..., 0]) — passing that explicitly
            # is bitwise identical and keeps `_online_step`'s pytree
            # structure CONSTANT across the first block (one compiled
            # program per canonical r instead of hp-None/hp-set doubles).
            first = jnp.asarray(self._buf[..., 0])
            self._hp_carry = (jnp.zeros_like(first), first)
        if self.fast_spectral:
            return self._merge(self._drain_fast())
        w = self.cfg.window
        fb = FRAME_BLOCK
        seg_len = w + fb - 1
        new_parts = []  # (packed, spans) per step — r varies, so each
        # step's [..., n_fields * r, S] buffer must be unpacked separately
        while True:
            t_avail = self._n_total - w + 1
            if t_avail <= self._t_done:
                break
            base = fb * (self._t_done // fb)
            lead = self._t_done - base
            r = min(fb - lead, t_avail - self._t_done)
            if self.canonical_steps:
                r = next(c for c in _CANONICAL_STEPS if c <= r)
            seg = self._buf[..., base - self._a0 : base - self._a0 + seg_len]
            if seg.shape[-1] < seg_len:
                seg = np.pad(
                    seg,
                    [(0, 0)] * (seg.ndim - 1)
                    + [(0, seg_len - seg.shape[-1])],
                )
            packed, spans, self._tracker, self._tail = _online_step(
                jnp.asarray(seg), self._hp_carry,
                jnp.asarray(lead, jnp.int32), self._tracker, self._tail,
                self.cfg, r,
            )
            new_parts.append((np.asarray(packed), spans))
            self._t_done += r
            if self._t_done % fb == 0:
                # block complete: advance the Ehlers carry one block and
                # drop the samples the next block can no longer read.
                if self.cfg.detrend == DetrendMode.EHLERS:
                    blk = self._buf[
                        ..., base - self._a0 : base - self._a0 + fb
                    ]
                    self._hp_carry = _advance_hp_carry(
                        jnp.asarray(blk), self._hp_carry,
                        self.cfg.trend_period,
                    )
                self._buf = self._buf[..., base + fb - self._a0 :]
                self._a0 = base + fb
        return self._merge(new_parts)

    def _drain_fast(self) -> list:
        """Fast-path advance loop: O(r) incremental steps + block-
        boundary re-anchors (see `_fast_step`/`_fast_anchor`)."""
        cfg = self.cfg
        w = cfg.window
        fb = FRAME_BLOCK
        new_parts = []
        while True:
            t_avail = self._n_total - w + 1
            if t_avail <= self._t_done:
                break
            if self._fast is None:
                # one-time host warmup over the first window-1 samples
                assert self._a0 == 0
                self._fast = _fast_bootstrap(self._buf[..., : w - 1], cfg)
            room = fb - (self._t_done % fb)   # cap at the anchor boundary
            r = min(room, t_avail - self._t_done)
            if self.canonical_steps:
                r = next(c for c in _CANONICAL_STEPS if c <= r)
            f0 = self._t_done
            lo = f0 + w - 1 - self._a0
            bars = self._buf[..., lo : lo + r]
            price_prev = self._buf[..., lo - 2 : lo]
            packed, spans, self._fast, self._tracker, self._tail = (
                _fast_step(
                    jnp.asarray(bars), jnp.asarray(price_prev), self._fast,
                    jnp.asarray(f0, jnp.int32), self._tracker, self._tail,
                    cfg, r,
                )
            )
            new_parts.append((np.asarray(packed), spans))
            self._t_done += r
            if self._t_done % fb == 0:
                self._fast = _fast_anchor(
                    self._fast, jnp.asarray(self._t_done - 1, jnp.int32), cfg
                )
                # drop samples no future step can read (the next step's
                # price_prev starts at t_done + w - 3)
                keep_from = self._t_done + w - 3
                self._buf = self._buf[..., keep_from - self._a0 :]
                self._a0 = keep_from
        return new_parts

    def _merge(self, new_parts: list) -> dict[str, np.ndarray]:
        if not new_parts:
            return {}
        ax = 0 if self.batch is None else 1   # the frame axis
        parts = [_unpack_transfer(p, sp) for p, sp in new_parts]
        rows = {
            k: np.concatenate([p[k] for p in parts], axis=ax)
            for k in parts[0]
        }
        if self._rows is None:
            self._rows = {k: v.copy() for k, v in rows.items()}
        else:
            for k, v in rows.items():
                self._rows[k] = np.concatenate(
                    [self._rows[k], v], axis=ax
                )
        return rows

    def buffers(self) -> dict[str, np.ndarray]:
        """All rows emitted so far ([T_done, S] / [T_done] per field,
        with a leading [B] axis for fleet drivers)."""
        return {} if self._rows is None else dict(self._rows)

    @property
    def frames_done(self) -> int:
        return self._t_done

    @property
    def bars_consumed(self) -> int:
        return self._n_total
