"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference verifies behavior operationally inside MT5's strategy tester
(SURVEY.md §4); we instead use pytest with NumPy/SciPy oracles. Multi-chip
sharding paths are exercised on 8 virtual CPU devices, emulating a v5e-8,
so the suite runs anywhere (`/root/reference` has zero automated tests).
"""

import os

# Force CPU even if the environment pre-imports JAX with a TPU platform
# (some images register a PJRT plugin from sitecustomize, so env vars set
# here are too late — use jax.config instead). The suite must run
# hermetically, and notably jnp.fft is not implemented on all TPU runtimes
# (the TPU compute path uses our own MXU DFT kernels instead — see
# wavespec_tpu/kernels/).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402

_last_module = [None]


@pytest.fixture(autouse=True)
def _bounded_compile_cache(request):
    """Clear XLA executables at every test-MODULE boundary.

    With the whole suite's compiled programs accumulated in one process,
    the XLA CPU compiler segfaults non-deterministically inside
    backend_compile (reproduced twice at different tests — whichever
    module happens to push total compilation state past the cliff; 3-4 GB
    RSS, not OOM). Per-module cache clears bound that state; the cost is
    re-compiling the handful of small programs shared across modules.
    """
    mod = request.node.nodeid.split("::", 1)[0]
    if _last_module[0] is not None and mod != _last_module[0]:
        jax.clear_caches()
    _last_module[0] = mod
    yield
