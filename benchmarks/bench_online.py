"""Per-tick DEVICE latency of the v757 online driver's serving step.

Wall-clock per `V757OnlineDriver.update([bar])` on axon is tunnel-bound
(~0.5-1.5 s of remote dispatch + host transfers per call — an artifact
of the remote test rig, not of the computation). This harness measures
what production serving would pay on a locally-attached TPU: K
single-bar ticks CHAINED inside one jitted `lax.scan` (state threaded
through the carry, one scalar readback), reported as
(t(K_long) - t(K_short)) / (K_long - K_short).

Each tick is the full serving step: ingest the bar into the block
buffer, recompute the current 128-frame sliding-DFT block (canonical
fixed-shape arithmetic), candidates + group delay for the new frame,
tracker resume (Pallas, T=1), and the whole tail machine resume
(biquad/ETA/FollowFirst/Kalman — Pallas, T=1).

Two lines: the single-symbol driver and the FLEET driver
(`V757OnlineDriver(batch=128)` — the production config-#5 per-chip
shape, 128 symbols riding the tracker/tail kernels' VPU lanes in one
lockstep step), reported as us/tick and us/(symbol*tick).
"""

import json
import statistics
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from wavespec_tpu.pipeline.online import V757OnlineDriver, _online_step
from wavespec_tpu.pipeline.v757 import FRAME_BLOCK, V757Config


def make_series(n, seed=5, batch=None):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    shape = (n,) if batch is None else (batch, n)
    return (100 + np.cumsum(0.01 * rng.standard_normal(shape), axis=-1)
            + 1.5 * np.sin(2 * np.pi * t / 26)
            + 0.8 * np.sin(2 * np.pi * t / 40)).astype(np.float32)


def measure(cfg: V757Config, batch: int | None,
            k_long: int = 100, k_short: int = 4,
            fast: bool = False) -> float:
    """Median per-tick device latency (seconds) of the serving step.

    `fast=True` measures the opt-in O(r) incremental path
    (`fast_spectral=True`, `pipeline.online._fast_step`) instead of the
    bitwise canonical block recompute."""
    w = cfg.window
    seg_len = w + FRAME_BLOCK - 1
    series = make_series(w + FRAME_BLOCK + k_long + 8, batch=batch)

    # Drive the real driver to a block boundary (lead=0) and lift its
    # state: the chain below continues EXACTLY where serving would.
    drv = V757OnlineDriver(cfg, batch=batch, fast_spectral=fast)
    drv.update(series[..., : w + FRAME_BLOCK - 1])  # frames [0, 128)
    drv.update(series[..., w + FRAME_BLOCK - 1 : w + FRAME_BLOCK])
    assert drv.frames_done == FRAME_BLOCK + 1
    trk0, tail0 = drv._tracker, drv._tail
    next_bars = np.moveaxis(
        series[..., drv.bars_consumed : drv.bars_consumed + k_long], -1, 0
    )  # [K] or [K, B]

    if fast:
        from wavespec_tpu.pipeline.online import _fast_step

        fst0 = drv._fast
        f0 = drv.frames_done

        @partial(jax.jit, static_argnames=("k",))
        def chain(fst, trk, tail, bars, k: int):
            def body(carry, bar):
                fst, fpos, trk, tail = carry
                price_prev = fst.hp_ring[..., :2] * 0 + bar[..., None]
                packed, _, fst, trk, tail = _fast_step(
                    bar[..., None], price_prev, fst, fpos, trk, tail,
                    cfg, 1,
                )
                return (fst, fpos + 1, trk, tail), jnp.sum(packed)

            (_, _, _, _), tot = jax.lax.scan(
                body,
                (fst, jnp.asarray(f0, jnp.int32), trk, tail),
                bars[:k],
            )
            return jnp.sum(tot)

        seg0 = fst0
        bars = jnp.asarray(next_bars)
        float(np.asarray(chain(seg0, trk0, tail0, bars, k_short)))
        float(np.asarray(chain(seg0, trk0, tail0, bars, k_long)))
        return _timed_delta(chain, seg0, trk0, tail0, bars, k_short, k_long)

    assert drv._a0 == FRAME_BLOCK
    base = FRAME_BLOCK
    seg0 = drv._buf[..., :seg_len]
    if seg0.shape[-1] < seg_len:
        seg0 = np.pad(
            seg0,
            [(0, 0)] * (seg0.ndim - 1) + [(0, seg_len - seg0.shape[-1])],
        )
    hp_carry = drv._hp_carry
    lead0 = drv.frames_done - base              # = 1

    @partial(jax.jit, static_argnames=("k",))
    def chain(seg, trk, tail, bars, k: int):
        def body(carry, bar):
            seg, lead, trk, tail = carry
            upd = bar[..., None]                 # [..., 1]
            start = (0,) * (seg.ndim - 1) + (0,)
            seg = jax.lax.dynamic_update_slice(
                seg, upd, (*start[:-1], w - 1 + lead)
            )
            packed, _, trk, tail = _online_step(
                seg, hp_carry, lead, trk, tail, cfg, 1
            )
            return (seg, lead + 1, trk, tail), jnp.sum(packed)

        (_, _, _, _), tot = jax.lax.scan(
            body,
            (seg, jnp.asarray(lead0, jnp.int32), trk, tail),
            bars[:k],
        )
        return jnp.sum(tot)

    seg0 = jnp.asarray(seg0)
    bars = jnp.asarray(next_bars)
    # compile both chain lengths
    float(np.asarray(chain(seg0, trk0, tail0, bars, k_short)))
    float(np.asarray(chain(seg0, trk0, tail0, bars, k_long)))
    return _timed_delta(chain, seg0, trk0, tail0, bars, k_short, k_long)


def _timed_delta(chain, st, trk, tail, bars, k_short, k_long) -> float:
    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(chain(st, trk, tail, bars, k)))
            best = min(best, time.perf_counter() - t0)
        return best

    deltas = []
    for _ in range(5):
        t_s = timed(k_short)
        t_l = timed(k_long)
        if t_l > t_s * 1.02:
            deltas.append((t_l - t_s) / (k_long - k_short))
        if len(deltas) >= 3:
            last3 = deltas[-3:]
            med = statistics.median(last3)
            if (max(last3) - min(last3)) / med <= 0.15:
                break
    return statistics.median(deltas[-3:] if len(deltas) >= 3 else deltas)


def main() -> None:
    cfg = V757Config(window=4096, min_period=18.0, max_period=52.0,
                     resumable=True)

    med = measure(cfg, batch=None)
    print(json.dumps({
        "metric": "v757_online_tick_device_latency_us",
        "value": round(med * 1e6, 1),
        "unit": "us/tick",
        "window": cfg.window,
    }), flush=True)

    b = 128
    med_b = measure(cfg, batch=b)
    print(json.dumps({
        "metric": "v757_online_fleet128_tick_device_latency_us",
        "value": round(med_b * 1e6, 1),
        "unit": "us/tick",
        "us_per_symbol_tick": round(med_b * 1e6 / b, 2),
        "window": cfg.window,
        "batch": b,
    }), flush=True)

    med_f = measure(cfg, batch=None, fast=True)
    print(json.dumps({
        "metric": "v757_online_fast_tick_device_latency_us",
        "value": round(med_f * 1e6, 1),
        "unit": "us/tick",
        "window": cfg.window,
        "note": "opt-in O(r) incremental sliding-DFT path (fast_spectral)",
    }), flush=True)

    med_fb = measure(cfg, batch=b, fast=True)
    print(json.dumps({
        "metric": "v757_online_fast_fleet128_tick_device_latency_us",
        "value": round(med_fb * 1e6, 1),
        "unit": "us/tick",
        "us_per_symbol_tick": round(med_fb * 1e6 / b, 2),
        "window": cfg.window,
        "batch": b,
    }), flush=True)


if __name__ == "__main__":
    main()
