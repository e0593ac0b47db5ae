"""Sequence/context parallelism for the transformer tower (SURVEY.md
§2.2 SP/CP row — the designed extension point, built in r4).

The flagship towers are RNNs over ≤50-token queries, where CP has
nothing to shard (the recurrence is sequential in L and the whole
sequence fits one chip thousands of times over). The transformer tower
is the one place long-context encoding could outgrow a chip, so this
module provides gather-based sequence parallelism for it:

  * tokens are sharded [B, L/n] over a mesh axis (`P(None, axis)`);
  * embeddings, QKV/MLP projections, layer norms — all per-token —
    run on local chunks with zero communication;
  * each attention layer all_gathers K and V (2 collectives/layer over
    ICI) so local queries attend to the GLOBAL key space;
  * the masked-mean readout psums local partial sums.

Numerics match the unsharded tower (the gathers reconstruct K/V in
global order; only the pooling reduction reorders, a ~1e-6 effect).
A ring/flash variant (stream K/V chunks via ppermute, online softmax)
is the scale-out refinement if contexts ever exceed gathered-KV VMEM;
at this framework's sequence lengths the gather is strictly better
(one hop, no per-step latency chain).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sse_tpu.models import towers
from sse_tpu.models.towers import Params, TowerConfig, _COMPUTE_DTYPE


def encode_context_parallel(
    params: Params,
    cfg: TowerConfig,
    tokens: jax.Array,  # [B, L] int32, L % mesh.shape[axis] == 0
    lengths: jax.Array,  # [B] int32
    mesh: Mesh,
    axis: str = "model",
):
    """L2-normalized [B, encoding_dim] embeddings with the SEQUENCE dim
    sharded over `mesh.shape[axis]` devices. Transformer towers with the
    mean readout only (the tower default); RNN cells are sequential in L
    and reject CP by construction."""
    if cfg.cell != "transformer":
        raise ValueError(
            f"context parallelism shards attention; cell={cfg.cell!r} "
            "has no sharding dimension in L (RNNs are sequential, bow "
            "pools locally)"
        )
    if cfg.readout not in ("mean",):
        raise ValueError(
            "context-parallel readout supports 'mean' (psum-poolable); "
            f"got {cfg.readout!r}"
        )
    n = mesh.shape[axis]
    b, l = tokens.shape
    if l % n:
        raise ValueError(f"sequence length {l} not divisible by {n} shards")

    def body(params, tokens, lengths):
        bb, lc = tokens.shape
        off = jax.lax.axis_index(axis) * lc
        emb = jnp.take(params["embed"], tokens, axis=0)  # [B, Lc, E]
        pos = off + jnp.arange(lc)[None, :]
        valid = (pos < lengths[:, None]).astype(jnp.float32)  # [B, Lc]
        states = towers._transformer_encode(
            params, cfg, emb, valid, cp_axis=axis
        )  # [B, Lc, H] local
        s = jax.lax.psum(jnp.sum(states * valid[:, :, None], axis=1), axis)
        c = jax.lax.psum(jnp.sum(valid, axis=1, keepdims=True), axis)
        feats = s / jnp.maximum(c, 1.0)
        out = jnp.tanh(
            jnp.dot(
                feats.astype(_COMPUTE_DTYPE),
                params["proj_w"].astype(_COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            + params["proj_b"]
        )
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6
        )

    mapped = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(None, axis), P()),
            out_specs=P(),
            check_vma=False,  # psum/all_gather make outputs replicated
        )
    )
    return mapped(params, tokens, lengths)
