"""Async job API: submit / try_get / free parity over host + device work.

Rebuilds the bridge's async job surface (`gpu_submit_extract_cycles` /
`gpu_try_get_cycles` / `gpu_free_job`, `Include/imports.mqh:12-18`; client
queue `1.1.0:344-356,1266-1411`) for the TPU world:

- **Device jobs** need no thread pool at all: JAX dispatch is already
  async, so `submit` just launches the jitted call and keeps the
  un-materialized `jax.Array`s; `try_get` polls readiness without
  blocking; `result` materializes. This is the TPU replacement for the
  reference's 64-deep GPU job queue.
- **Host jobs** (file IO, staging, decode) run on the native C++ worker
  pool (`native/wavespec_rt.cpp`) when available, else a Python
  ThreadPoolExecutor.

The depth cap mirrors `InpAsyncDepth` (64): submissions beyond it raise,
like the reference frees-and-skips on overflow (`1.1.0:1333-1337`).
"""

from __future__ import annotations

import ctypes
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable

import jax

from wavespec_tpu.runtime import native


class JobQueue:
    """Bridge-style job table over async JAX dispatch + host workers."""

    def __init__(self, depth: int = 64, host_workers: int = 2):
        self.depth = depth
        self._lock = threading.Lock()
        self._next_id = 1
        self._jobs: dict[int, Any] = {}
        self._host_pool: ThreadPoolExecutor | None = None
        self._host_workers = host_workers
        self._native = native.load()
        self._native_refs: dict[int, tuple[Any, Any]] = {}
        self._native_results: dict[int, Any] = {}
        if self._native is not None:
            self._native.ws_init(host_workers)

    # ------------------------------------------------------------- device

    def submit(self, fn: Callable, *args) -> int:
        """Launch a jitted computation; returns a job id immediately."""
        with self._lock:
            if len(self._jobs) >= self.depth:
                raise RuntimeError(f"job queue full (depth={self.depth})")
            job_id = self._next_id
            self._next_id += 1
        out = fn(*args)  # async dispatch: returns unfinished jax.Arrays
        with self._lock:
            self._jobs[job_id] = out
        return job_id

    def try_get(self, job_id: int):
        """(ready, result_or_None) without blocking."""
        with self._lock:
            if job_id in self._native_results:
                return True, self._native_results[job_id]
            out = self._jobs.get(job_id)
        if out is None:
            if job_id in self._native_refs:
                return self._native_try_get(job_id)
            raise KeyError(f"unknown job {job_id}")
        if isinstance(out, Future):
            return (True, out.result()) if out.done() else (False, None)
        leaves = jax.tree.leaves(out)
        ready = all(
            getattr(leaf, "is_ready", lambda: True)() for leaf in leaves
        )
        return (ready, out if ready else None)

    def result(self, job_id: int):
        """Blocking fetch (the reference's Sleep(1) drain, `1.1.0:1342`)."""
        with self._lock:
            out = self._jobs.get(job_id)
        if out is None and job_id in self._native_refs:
            while True:
                ready, res = self._native_try_get(job_id)
                if ready:
                    return res
                time.sleep(0.001)  # the reference's Sleep(1) drain cadence
        if isinstance(out, Future):
            return out.result()
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
        return out

    def free(self, job_id: int) -> None:
        with self._lock:
            self._jobs.pop(job_id, None)
            self._native_results.pop(job_id, None)
            ref = self._native_refs.pop(job_id, None)
        if ref is not None and self._native is not None:
            self._native.ws_free_job(ref[0])

    def pending(self) -> int:
        with self._lock:
            return len(self._jobs) + len(self._native_refs)

    # --------------------------------------------------------------- host

    def submit_host(self, fn: Callable, *args) -> int:
        """Run host-side work on the native worker pool (or a thread pool)."""
        with self._lock:
            if len(self._jobs) + len(self._native_refs) >= self.depth:
                raise RuntimeError(f"job queue full (depth={self.depth})")
            job_id = self._next_id
            self._next_id += 1

        if self._native is not None:
            holder: dict[str, Any] = {}

            @native.JOB_FN
            def trampoline(_):
                try:
                    holder["result"] = fn(*args)
                except Exception as exc:  # noqa: BLE001 - marshalled to caller
                    holder["error"] = exc

            nid = ctypes.c_int32(0)
            st = self._native.ws_submit_job(trampoline, None, ctypes.byref(nid))
            native.Status.raise_for(st, native.last_error())
            with self._lock:
                # keep the trampoline alive until freed
                self._native_refs[job_id] = (nid.value, (trampoline, holder))
            return job_id

        if self._host_pool is None:
            self._host_pool = ThreadPoolExecutor(max_workers=self._host_workers)
        fut = self._host_pool.submit(fn, *args)
        with self._lock:
            self._jobs[job_id] = fut
        return job_id

    def _native_try_get(self, job_id: int):
        with self._lock:
            nid, (_tramp, holder) = self._native_refs[job_id]
        ready = ctypes.c_int32(0)
        self._native.ws_try_get_job(nid, ctypes.byref(ready))
        if not ready.value:
            return False, None
        if "error" in holder:
            raise holder["error"]
        res = holder.get("result")
        with self._lock:
            self._native_results[job_id] = res
        return True, res

    def shutdown(self) -> None:
        if self._host_pool is not None:
            self._host_pool.shutdown(wait=True)
        with self._lock:
            refs = list(self._native_refs.values())
        if self._native is not None:
            for nid, _keepalive in refs:
                # ws_free_job BLOCKS until the pool has executed the job
                # (workers drain the queue), so the ctypes trampoline in
                # _keepalive stays referenced for as long as C code can
                # still call it — clearing the refs first would let GC
                # free the trampoline under a queued job (segfault), and
                # never freeing would leak the pool's Job entries.
                self._native.ws_free_job(nid)
        with self._lock:
            self._jobs.clear()
            self._native_refs.clear()
            self._native_results.clear()
