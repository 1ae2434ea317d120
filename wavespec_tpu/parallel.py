"""Parallelism namespace: alias of `wavespec_tpu.mesh`.

The mesh module owns the device-mesh scale-out (data-parallel multi-series
batches, segmented-window sharding with ICI collectives); this alias keeps
the conventional `parallel` import path working.
"""

from wavespec_tpu.mesh import *  # noqa: F401,F403
from wavespec_tpu.mesh import __all__  # noqa: F401
