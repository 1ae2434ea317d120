"""Trading signals: FollowFirst alternation engine, confluence."""

from wavespec_tpu.signals.followfirst import FollowFirstConfig, followfirst_signals

__all__ = ["FollowFirstConfig", "followfirst_signals"]
