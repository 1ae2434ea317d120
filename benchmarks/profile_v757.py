"""Stage-cumulative v757 profiling on the real chip (device-side timing).

run_v757's wall time includes host transfers over the remote tunnel; this
isolates pure device compute per stage with the dependent-chain trick.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wavespec_tpu.analyze.eta import EtaConfig, eta_state_machine
    from wavespec_tpu.analyze.trackers import track_frames
    from wavespec_tpu.filters.biquad import bandpass_cycle
    from wavespec_tpu.pipeline import v757 as V
    from wavespec_tpu.signals.followfirst import followfirst_signals

    window, n_frames = 16384, 512
    cfg = V.V757Config(window=window, min_period=18.0, max_period=52.0)
    n_bars = window + n_frames - 1
    t = np.arange(n_bars)
    x = jax.device_put(jnp.asarray(
        (100.0 + np.cumsum(0.02 * np.random.default_rng(0).standard_normal(n_bars))
         + 2.0 * np.sin(2 * np.pi * t / 32)).astype(np.float32)))

    def stage(s, upto):
        out = V._spectral_frames(s, cfg, 1)
        cand_period, cand_power, cand_idx, cand_valid, gd, gd_idx = out
        if upto == "spectral":
            return jnp.sum(cand_power) + jnp.sum(gd_idx)
        slots, _ = track_frames(cand_period, cand_power, cand_idx,
                                cand_valid, cfg=cfg.tracker)
        if upto == "trackers":
            return jnp.sum(slots["slot_period"])
        newest = s[cfg.window - 1 :]
        periods_ts = jnp.swapaxes(slots["slot_period"], 0, 1)
        valid_ts = jnp.swapaxes(slots["slot_valid"], 0, 1)
        cyc = bandpass_cycle(
            jnp.broadcast_to(newest, (12, periods_ts.shape[1])), periods_ts,
            cfg.bandwidth, valid=valid_ts, zero_first=0)
        if upto == "biquad":
            return jnp.sum(cyc)
        gd_at = jnp.take_along_axis(
            gd, jnp.clip(slots["slot_fft_index"], 0, gd.shape[-1] - 1), -1)
        eta = eta_state_machine(
            cyc, periods_ts, jnp.swapaxes(gd_at, 0, 1),
            EtaConfig(seconds_per_bar=60.0, fft_window=window,
                      prior_bars=window - 1),
            valid=valid_ts)
        if upto == "eta":
            return jnp.sum(eta["eta_raw"])
        states = jnp.where(slots["slot_valid"],
                           jnp.where(jnp.swapaxes(eta["color"], 0, 1) > 0.5,
                                     1.0, -1.0), 0.0)
        ff = followfirst_signals(states, jnp.swapaxes(eta["eta_raw"], 0, 1),
                                 slots["slot_period"], slots["slot_valid"],
                                 cfg.followfirst)
        return jnp.sum(ff["sig"]) + jnp.sum(ff["confluence"])

    def timed(upto):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(s, iters: int):
            def body(_, carry):
                s, acc = carry
                tot = stage(s, upto)
                return s * (1.0 + 0.0 * tot), acc + tot
            _, acc = jax.lax.fori_loop(0, iters, body, (s, 0.0))
            return acc
        float(np.asarray(chain(x, 1)))
        float(np.asarray(chain(x, 4)))
        t0 = time.perf_counter(); float(np.asarray(chain(x, 1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(chain(x, 4)))
        t4 = time.perf_counter() - t0
        return (t4 - t1) / 3

    prev = 0.0
    for upto in ["spectral", "trackers", "biquad", "eta", "signals"]:
        per = timed(upto)
        print(f"{upto:>9}: {per*1e3:8.2f} ms cumulative "
              f"(+{(per-prev)*1e3:7.2f} ms) -> {n_frames/per:8.0f} bars/s",
              flush=True)
        prev = per


if __name__ == "__main__":
    main()
