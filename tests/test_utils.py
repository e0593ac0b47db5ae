"""Aux subsystem smoke tests (SURVEY.md §5 rows)."""

import time

import jax.numpy as jnp

from sse_tpu.utils import StepTimer, trace


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        t.step(jnp.ones((4,)) * 2)
    assert t.rate() > 0
    t.reset()
    assert t.rate() == 0.0


def test_trace_context(tmp_path):
    with trace(str(tmp_path / "tr")):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        x.block_until_ready()
    # profiler wrote something
    assert any((tmp_path / "tr").rglob("*")), "no trace output"
