"""End-to-end demo: synthetic feed -> flagship + v757 analytics.

Run: python examples/demo.py   (CPU or TPU; first TPU compile is slow)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    from wavespec_tpu import models
    from wavespec_tpu.testing import planted_cycles

    series, cycles = planted_cycles(
        6000, [(2.5, 48.0, 0.4), (1.2, 130.0, 1.1)],
        noise=0.05, drift=0.02, level=100.0, seed=7,
    )
    print(f"series: {len(series)} bars; planted periods "
          f"{[c.period for c in cycles]}")

    flag = models.flagship(window=4096, hop=8)
    out = flag.run(series)
    attrs = np.asarray(out["attrs"])
    last = attrs[-1]
    print("\nflagship (1.1.0, MUSIC) newest-window cycles:")
    for row in last:
        if row[0] > 0:
            print(f"  period {row[2]:7.2f} bars  amp {row[0]:6.3f}  "
                  f"eta {row[4]:5.1f} bars  snr {row[8]:5.1f} dB")

    v = models.v757(window=4096, hop=8, min_period=18.0, max_period=200.0)
    vout = v.run(series)
    periods = vout["slot_period"][-1]
    active = vout["slot_valid"][-1]
    sig_count = int((np.abs(vout["sig"]) > 0).sum())
    print(f"\nv7.57 slots (newest frame): "
          f"{[round(float(p), 1) for p, a in zip(periods, active) if a]}")
    print(f"v7.57 FollowFirst signals fired: {sig_count}")
    print(f"v7.57 Kalman price estimate: {vout['kalman'][-1]:.3f} "
          f"(actual {series[-1]:.3f})")


if __name__ == "__main__":
    main()
