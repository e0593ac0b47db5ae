"""L2 model layer: encoder towers + the SSE dual-encoder model.

Rebuilds the reference's ``sse_model.py`` capability (SURVEY.md §2.1 model
row): word-embedding tables, multi-layer LSTM/GRU encoders, final-state →
linear+tanh projection into the shared encoding space, L2 normalization,
scaled-cosine similarity, and the three network modes
(source-encoder-only / shared-encoder / dual-encoder) — plus a transformer
tower (the north star's stretch swap).

Architecture is TPU-first, not a port: params are plain pytrees (explicit
for pjit sharding annotations and optax), compute is bfloat16 with float32
accumulation on the MXU, recurrence is a masked `lax.scan` (swappable for
the Pallas fused-gate kernel in sse_tpu.ops).
"""

from sse_tpu.models.towers import TowerConfig, init_tower, encode as encode_tower
from sse_tpu.models.sse import (
    SSEConfig,
    NetworkMode,
    init_params,
    encode_source,
    encode_target,
    target_embeddings,
)

__all__ = [
    "TowerConfig",
    "init_tower",
    "encode_tower",
    "SSEConfig",
    "NetworkMode",
    "init_params",
    "encode_source",
    "encode_target",
    "target_embeddings",
]
