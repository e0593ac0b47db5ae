"""The SSE dual-encoder model: three network modes, one embedding space.

Reference parity (SURVEY.md §2.1 model row; §0 network-mode description):

  * ``source-encoder-only``: only the source tower is an encoder; target
    embeddings are a learned [num_targets, D] lookup table → the model is a
    large-scale classifier over the fixed target space.
  * ``shared-encoder``: one tower's parameters encode both sides.
  * ``dual-encoder``: separate source and target towers.

All three expose the same interface: ``encode_source`` (queries) and
``target_embeddings`` (the full target side, or a gathered subset), both
returning L2-normalized float32 vectors in the shared ``encoding_dim``
space; similarity is scaled cosine (the scale lives in the loss config —
see sse_tpu/train/losses.py).

The target table / target-tower outputs are the arrays the index and
parallel layers shard over the mesh's 'model' axis (SURVEY.md §2.2 TP row).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from sse_tpu.models import towers
from sse_tpu.models.towers import TowerConfig

Params = Dict[str, Any]


class NetworkMode(str, enum.Enum):
    SOURCE_ENCODER_ONLY = "source-encoder-only"
    SHARED_ENCODER = "shared-encoder"
    DUAL_ENCODER = "dual-encoder"


@dataclasses.dataclass(frozen=True)
class SSEConfig:
    mode: NetworkMode
    src_tower: TowerConfig
    # Target side (ignored for SOURCE_ENCODER_ONLY):
    tgt_tower: Optional[TowerConfig] = None
    # SOURCE_ENCODER_ONLY only: size of the learned target table.
    num_targets: int = 0

    def __post_init__(self):
        if self.mode == NetworkMode.SOURCE_ENCODER_ONLY:
            if self.num_targets <= 0:
                raise ValueError("source-encoder-only needs num_targets > 0")
        elif self.mode == NetworkMode.DUAL_ENCODER:
            if self.tgt_tower is None:
                raise ValueError("dual-encoder needs tgt_tower")
            if self.tgt_tower.encoding_dim != self.src_tower.encoding_dim:
                raise ValueError("towers must share encoding_dim")

    @property
    def encoding_dim(self) -> int:
        return self.src_tower.encoding_dim


def init_params(key: jax.Array, cfg: SSEConfig) -> Params:
    k_src, k_tgt = jax.random.split(key)
    params: Params = {"src_tower": towers.init_tower(k_src, cfg.src_tower)}
    if cfg.mode == NetworkMode.SOURCE_ENCODER_ONLY:
        params["target_table"] = (
            jax.random.normal(k_tgt, (cfg.num_targets, cfg.encoding_dim))
            * 0.05
        )
    elif cfg.mode == NetworkMode.DUAL_ENCODER:
        params["tgt_tower"] = towers.init_tower(k_tgt, cfg.tgt_tower)
    # SHARED_ENCODER: src_tower params serve both sides.
    return params


def encode_source(
    params: Params,
    cfg: SSEConfig,
    tokens: jax.Array,
    lengths: jax.Array,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Source text → [B, D] normalized embeddings (un-jitted body; callers
    own the jit/pjit boundary so serving can fuse encode+score+topk).
    `dropout_rng` enables the tower's train-time dropout; eval/serving
    callers pass none and stay deterministic."""
    return towers.encode_raw(
        params["src_tower"], cfg.src_tower, tokens, lengths,
        dropout_rng=dropout_rng,
    )


def encode_target(
    params: Params,
    cfg: SSEConfig,
    tokens: jax.Array,
    lengths: jax.Array,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Target text → [B, D] normalized embeddings (tower modes only)."""
    if cfg.mode == NetworkMode.SOURCE_ENCODER_ONLY:
        raise ValueError(
            "source-encoder-only mode has no target tower; use "
            "target_embeddings(rows=...) on the learned table"
        )
    if cfg.mode == NetworkMode.SHARED_ENCODER:
        return towers.encode_raw(
            params["src_tower"], cfg.src_tower, tokens, lengths,
            dropout_rng=dropout_rng,
        )
    return towers.encode_raw(
        params["tgt_tower"], cfg.tgt_tower, tokens, lengths,
        dropout_rng=dropout_rng,
    )


def target_embeddings(
    params: Params,
    cfg: SSEConfig,
    tokens: Optional[jax.Array] = None,
    lengths: Optional[jax.Array] = None,
    rows: Optional[jax.Array] = None,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Normalized target-side embeddings.

    SOURCE_ENCODER_ONLY: rows of the learned table (all rows if `rows` is
    None). Tower modes: encodes the given target token batch.
    """
    if cfg.mode == NetworkMode.SOURCE_ENCODER_ONLY:
        table = params["target_table"]
        if rows is not None:
            table = jnp.take(table, rows, axis=0)
        return table / jnp.maximum(
            jnp.linalg.norm(table, axis=-1, keepdims=True), 1e-6
        )
    if tokens is None or lengths is None:
        raise ValueError("tower modes need target tokens + lengths")
    emb = encode_target(params, cfg, tokens, lengths, dropout_rng=dropout_rng)
    if rows is not None:
        emb = jnp.take(emb, rows, axis=0)
    return emb
