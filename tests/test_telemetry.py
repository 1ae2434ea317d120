"""Telemetry utilities tests."""

import time

import jax.numpy as jnp

from wavespec_tpu.utils import Hud, ThroughputCounter, tagged_logger, trace


def test_tagged_logger_name():
    assert tagged_logger("batch").name == "wavespec.BATCH"


def test_trace_context_runs():
    with trace("extract"):
        x = jnp.ones(8) * 2
    with trace("step", step=3):
        pass
    assert float(x.sum()) == 16.0


def test_throughput_counter():
    c = ThroughputCounter()
    c.start()
    time.sleep(0.01)
    rate = c.stop(100)
    assert rate > 0
    assert c.total_items == 100
    assert c.rate > 0


def test_hud_render():
    hud = Hud()
    hud.record_call("gpu_submit_extract_cycles_batch")
    hud.update_progress(500, 1000)
    hud.windows_per_sec = 440000
    text = hud.render()
    assert "50.0%" in text and "440,000" in text and "batch" in text
