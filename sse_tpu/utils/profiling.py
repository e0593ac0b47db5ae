"""Tracing / profiling harness (SURVEY.md §5 tracing row: jax.profiler
trace + Perfetto; block_until_ready timing in the bench CLI)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto:

        with sse_tpu.utils.trace("/tmp/trace"):
            train_step(...)
            jax.block_until_ready(state)
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_profiler_server(port: int = 9999) -> None:
    """Live profiler endpoint (`tensorboard --logdir ...` can attach)."""
    jax.profiler.start_server(port)


class StepTimer:
    """Wall-clock steps/sec with an explicit completion barrier — on
    proxied runtimes only a host readback is a true barrier, so callers
    pass the step output and we block on it."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, out=None) -> None:
        if out is not None:
            jax.block_until_ready(out)
        self._steps += 1

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0
