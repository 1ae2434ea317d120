"""Testing utilities: synthetic feeds and oracle helpers.

SURVEY §4: the reference has no automated tests, so the rebuild defines
its own strategy — synthetic planted-cycle series with exactly known
ground truth, NumPy/SciPy oracles, and golden fixtures. These helpers are
public so downstream users can validate their own configurations.
"""

from wavespec_tpu.testing.synthetic import (
    planted_cycles,
    random_walk_price,
    verify_extraction,
)

__all__ = ["planted_cycles", "random_walk_price", "verify_extraction"]
