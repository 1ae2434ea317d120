"""CHIP parity drive: V757OnlineDriver == one-shot run_v757[_batch],
bitwise, on the real axon TPU.

The CPU test suite pins the bitwise chunked==one-shot contract on the
XLA paths; this drive pins the DEVICE paths (sliding block spec with
MXU-dot pinned matmuls, Pallas tracker + tail kernels) that only exist
on a real chip. Run whenever the resumable spectral arithmetic or the
kernels' resume plumbing changes:

    PYTHONPATH=. python benchmarks/verify_online_chip.py

Budget: a handful of 30-120 s program compiles on first run (r=1 and
r=128 online steps, single + fleet, plus the two one-shots).
"""

import numpy as np

from wavespec_tpu.pipeline import V757Config, run_v757, run_v757_batch
from wavespec_tpu.pipeline.online import V757OnlineDriver


def make_series(n, seed, batch=None):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    shape = (n,) if batch is None else (batch, n)
    return (100 + np.cumsum(0.01 * rng.standard_normal(shape), axis=-1)
            + 1.5 * np.sin(2 * np.pi * t / 26)
            + 0.8 * np.sin(2 * np.pi * t / 40)).astype(np.float32)


def check(got: dict, want: dict, tag: str) -> None:
    assert set(got) == set(want), (tag, set(got) ^ set(want))
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=f"{tag}:{k}")
    print(f"[verify-online-chip] {tag}: {len(want)} fields bitwise OK",
          flush=True)


def main() -> None:
    cfg = V757Config(window=4096, min_period=18.0, max_period=52.0,
                     resumable=True)
    w = cfg.window
    # chunk pattern hitting r=128 (whole blocks) and r=1 (serving ticks):
    # warmup to one bar short of the first frame, then 128-blocks, then
    # single ticks.
    chunks = [w - 1, 1, 128, 128, 1, 1, 1]
    n = sum(chunks)

    s = make_series(n, seed=3)
    want = run_v757(s, cfg)
    drv = V757OnlineDriver(cfg)
    lo = 0
    for c in chunks:
        drv.update(s[lo : lo + c])
        lo += c
    check(drv.buffers(), want, "single")

    b = 4
    sb = make_series(n, seed=17, batch=b)
    want_b = run_v757_batch(sb, cfg)
    drv_b = V757OnlineDriver(cfg, batch=b)
    lo = 0
    for c in chunks:
        drv_b.update(sb[:, lo : lo + c])
        lo += c
    check(drv_b.buffers(), want_b, f"fleet(b={b})")

    # opt-in fast path: tolerance-gated (not bitwise) — discrete fields
    # exact on the gate series, floats to f32 noise.
    drv_f = V757OnlineDriver(cfg, fast_spectral=True)
    lo = 0
    for c in chunks:
        drv_f.update(s[lo : lo + c])
        lo += c
    got = drv_f.buffers()
    for k in want:
        a, g = want[k], got[k]
        if a.dtype.kind in "bi":
            np.testing.assert_array_equal(g, a, err_msg=f"fast:{k}")
        else:
            sc = np.abs(a).max() + 1e-9
            rel = np.abs(a - g).max() / sc
            assert rel < 2e-4, (k, rel)
    print("[verify-online-chip] fast_spectral: discrete exact, "
          "floats <= 2e-4 rel OK", flush=True)


if __name__ == "__main__":
    main()
