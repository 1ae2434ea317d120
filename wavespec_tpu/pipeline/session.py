"""Session management: the `gpu_init` / `gpu_shutdown` surface.

Rebuild of the bridge session API (`Include/imports.mqh:6-7`, retry with
throttled logging `1.1.0:722-757`): `Session.init(device_index, streams)`
binds a JAX device and sizes the async job queue; `streams` maps to the
queue depth budget (the reference clamps 16..512, `1.1.0:729`); errors are
surfaced on a UTF-8 error channel (`gpu_get_last_error_w` parity).

The skip-bar-no-fallback policy (CHANGELOG.md:17-19) is preserved: if the
configured device is unavailable, `init` fails with a status — it never
silently substitutes another backend.
"""

from __future__ import annotations

import dataclasses
import logging

import jax

from wavespec_tpu.runtime.jobs import JobQueue
from wavespec_tpu.runtime.native import Status

log = logging.getLogger("wavespec_tpu")


@dataclasses.dataclass
class Session:
    device_index: int = 0
    streams: int = 64
    device: object | None = None
    queue: JobQueue | None = None
    last_error: str = ""
    _init_fail_count: int = 0

    def init(self, device_index: int = 0, streams: int = 64) -> Status:
        """`gpu_init` parity. Idempotent; returns a Status code."""
        if self.device is not None:
            return Status.OK
        streams = max(16, min(512, streams))  # clamp per `1.1.0:729`
        try:
            devices = jax.devices()
        except RuntimeError as exc:
            self.last_error = str(exc)
            self._init_fail_count += 1
            if self._init_fail_count % 50 == 1:  # throttle like `1.1.0:736-748`
                log.warning("[wavespec][GPU] init failed: %s", exc)
            return Status.BACKEND_UNAVAILABLE
        if not 0 <= device_index < len(devices):
            # negative indices would silently bind via Python indexing —
            # the gpu_init contract is BAD_ARGS, never a substitute device
            self.last_error = (
                f"device_index {device_index} out of range ({len(devices)} devices)"
            )
            return Status.BAD_ARGS
        self.device_index = device_index
        self.streams = streams
        self.device = devices[device_index]
        self.queue = JobQueue(depth=min(streams, 64))
        return Status.OK

    def shutdown(self) -> None:
        """`gpu_shutdown` parity: drain and release job state
        (job-leak prevention on deinit, `1.1.0:705-709`)."""
        if self.queue is not None:
            self.queue.shutdown()
        self.queue = None
        self.device = None

    def get_last_error(self) -> str:
        """`gpu_get_last_error_w` parity."""
        return self.last_error

    @property
    def ready(self) -> bool:
        return self.device is not None
