"""ctypes bindings for the native runtime (native/wavespec_rt.cpp).

Builds the shared library on first use with the system g++ (no pybind11 in
this environment; plain C ABI + ctypes per the build constraints). All
entry points return the reference's ALGLIB_STATUS codes
(`WaveCyclesBatchFetcher.mq5:14-22`); `Status.raise_for` maps them to
Python exceptions. A pure-Python fallback exists for every capability in
`wavespec_tpu.runtime.caches` / `jobs`, so the framework degrades
gracefully where no compiler is available.
"""

from __future__ import annotations

import ctypes
import enum
import subprocess
import threading
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "wavespec_rt.cpp"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB = _BUILD_DIR / "_wavespec_rt.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed: str | None = None

JOB_FN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)


class Status(enum.IntEnum):
    """`ALGLIB_STATUS_*` (`WaveCyclesBatchFetcher.mq5:14-22`)."""

    OK = 0
    BAD_ARGS = -1
    BACKEND_UNAVAILABLE = -2
    TIMEOUT = -3
    INTERNAL_ERROR = -4
    NOT_READY = -5
    NO_MEM = -6

    @staticmethod
    def raise_for(code: int, context: str = "") -> None:
        if code == Status.OK or code == Status.NOT_READY:
            return
        raise RuntimeError(f"wavespec_rt {Status(code).name} {context}".strip())


def _build() -> None:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-std=c++17", "-O2", "-shared", "-fPIC",
        "-o", str(_LIB), str(_SRC), "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed is not None:
            return None
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_LIB))
        except (OSError, subprocess.CalledProcessError) as exc:  # pragma: no cover
            _load_failed = str(exc)
            return None

        lib.ws_get_last_error.argtypes = [ctypes.c_char_p, ctypes.c_int32]
        lib.ws_get_last_error.restype = ctypes.c_int32
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.ws_feed_cache_count.argtypes = [ctypes.c_char_p, ip]
        lib.ws_feed_cache_count.restype = ctypes.c_int32
        lib.ws_feed_cache_load.argtypes = [ctypes.c_char_p, dp, ctypes.c_int32, ip]
        lib.ws_feed_cache_load.restype = ctypes.c_int32
        lib.ws_feed_cache_save.argtypes = [ctypes.c_char_p, dp, ctypes.c_int32]
        lib.ws_feed_cache_save.restype = ctypes.c_int32
        lib.ws_cycle_cache_load.argtypes = [ctypes.c_char_p, dp, ctypes.c_int32, ip, ip]
        lib.ws_cycle_cache_load.restype = ctypes.c_int32
        lib.ws_cycle_cache_save.argtypes = [ctypes.c_char_p, dp, ctypes.c_int32]
        lib.ws_cycle_cache_save.restype = ctypes.c_int32
        lib.ws_init.argtypes = [ctypes.c_int32]
        lib.ws_init.restype = ctypes.c_int32
        lib.ws_shutdown.argtypes = []
        lib.ws_shutdown.restype = None
        lib.ws_submit_job.argtypes = [JOB_FN, ctypes.c_void_p, ip]
        lib.ws_submit_job.restype = ctypes.c_int32
        lib.ws_try_get_job.argtypes = [ctypes.c_int32, ip]
        lib.ws_try_get_job.restype = ctypes.c_int32
        lib.ws_free_job.argtypes = [ctypes.c_int32]
        lib.ws_free_job.restype = ctypes.c_int32
        lib.ws_pending_jobs.argtypes = []
        lib.ws_pending_jobs.restype = ctypes.c_int32

        # join worker threads before interpreter teardown (blocked threads
        # being destructed would std::terminate the process)
        import atexit

        atexit.register(lib.ws_shutdown)
        _lib = lib
        return lib


def last_error() -> str:
    lib = load()
    if lib is None:
        return _load_failed or ""
    buf = ctypes.create_string_buffer(512)
    lib.ws_get_last_error(buf, 512)
    return buf.value.decode(errors="replace")


def available() -> bool:
    return load() is not None
