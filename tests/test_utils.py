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


def test_roofline_fields_and_chip_spec_prefixes():
    """Roofline math and the longest-prefix chip table ('TPU v5' must not
    shadow 'TPU v5 lite')."""
    from sse_tpu.bench import _CHIP_SPECS, _roofline_fields

    out = _roofline_fields(per_iter=0.001, flops=1e9, hbm_bytes=1e8)
    assert out["achieved_gflops"] == 1000.0
    assert out["achieved_hbm_gbps"] == 100.0
    # v5e row precedes the broader v5 prefixes
    kinds = [k for k, _ in _CHIP_SPECS]
    assert kinds.index("TPU v5 lite") < kinds.index("TPU v5")
    lite = dict(_CHIP_SPECS)["TPU v5 lite"]
    assert lite == (197.0, 819.0)
