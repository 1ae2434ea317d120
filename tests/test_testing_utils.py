"""Tests for the public testing utilities."""

import numpy as np
import jax.numpy as jnp

from wavespec_tpu.extract import ExtractConfig, Method, extract_cycles
from wavespec_tpu.testing import planted_cycles, random_walk_price, verify_extraction
import pytest


@pytest.mark.slow
def test_planted_and_verify_roundtrip():
    series, cycles = planted_cycles(2048, [(2.0, 64.0, 0.3), (1.0, 30.0, 1.0)],
                                    noise=0.05, seed=1)
    cfg = ExtractConfig(window=2048, top_k=4, min_period=10.0, max_period=200.0,
                        method=Method.MUSIC, ar_order=12)
    attrs = np.asarray(extract_cycles(jnp.asarray(series), cfg))
    problems = verify_extraction(attrs, cycles)
    assert problems == [], problems


def test_verify_reports_missing():
    attrs = np.zeros((2, 15), np.float32)
    attrs[:, 2] = [50.0, 20.0]
    attrs[:, 0] = [1.0, 1.0]
    problems = verify_extraction(attrs, [(1.0, 100.0, 0.0)])
    assert len(problems) == 1 and "not found" in problems[0]


def test_random_walk_price_shape():
    s = random_walk_price(1000)
    assert s.shape == (1000,) and abs(float(s[0]) - 1.10) < 0.01
