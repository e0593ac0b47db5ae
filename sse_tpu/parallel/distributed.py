"""Multi-host SPMD bring-up (SURVEY.md §2.3: controller-less, one process
per host; collectives compiled by XLA over ICI/DCN — the reference had no
distributed story at all)."""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. On TPU pods with standard env vars
    (TPU_WORKER_HOSTNAMES etc.) all arguments auto-detect; pass them
    explicitly elsewhere. No-op on single-process runs.

    After this, `jax.devices()` spans the whole slice; meshes built by
    sse_tpu.parallel.make_mesh are global, and data loading must use
    BatchIterator(process_index=jax.process_index(),
    process_count=jax.process_count()).
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
