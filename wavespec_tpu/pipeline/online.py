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
from functools import partial

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
    """

    cfg: V757Config = V757Config(resumable=True)
    batch: int | None = None
    canonical_steps: bool = True

    def __post_init__(self) -> None:
        if not self.cfg.resumable:
            self.cfg = dataclasses.replace(self.cfg, resumable=True)
        if self.cfg.detrend not in (DetrendMode.EHLERS, DetrendMode.NONE):
            raise ValueError("online v757 supports EHLERS/NONE detrend")
        if self.batch is not None and self.batch < 1:
            raise ValueError(f"batch must be >= 1, got {self.batch}")
        self._n_total = 0          # bars consumed
        self._t_done = 0           # frames emitted
        self._a0 = 0               # absolute sample index of _buf[..., 0]
        lead = () if self.batch is None else (self.batch,)
        self._buf = np.zeros((*lead, 0), np.float32)  # samples [a0, n_total)
        self._hp_carry = None      # Ehlers (trend, price) state at a0
        self._tracker = None
        self._tail = None
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
