"""Driver entry-point contract tests."""

import importlib.util
from pathlib import Path

import jax
import numpy as np
import jax.numpy as jnp
import pytest

spec = importlib.util.spec_from_file_location(
    "__graft_entry__", Path(__file__).resolve().parents[1] / "__graft_entry__.py"
)
graft = importlib.util.module_from_spec(spec)
spec.loader.exec_module(graft)


@pytest.mark.slow
def test_entry_is_jittable():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    attrs, wave, eta = out
    assert attrs.shape[-1] == 15
    assert np.isfinite(np.asarray(wave)).all()


@pytest.mark.slow
def test_dryrun_various_device_counts():
    graft.dryrun_multichip(2)
    graft.dryrun_multichip(4)
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_odd_device_counts():
    graft.dryrun_multichip(3)
    graft.dryrun_multichip(6)
