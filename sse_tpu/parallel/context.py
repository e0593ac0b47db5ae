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

Axis contract (r4 verdict item 3): CP runs on its OWN mesh axis,
conventionally a dedicated single-axis {'seq': n} mesh (`cp_mesh`) —
never the 'model' axis an index program is sharded over at the same
time. The index builder (sse_tpu.index.build_index cp_shards=...)
follows this: the CP encode is one program on the 'seq' mesh, the
encoded rows are then placed onto the 'model'-sharded index buffer by a
separate program — composition is tested in tests/test_parallel.py and
the driver dryrun. The path is INFERENCE-FIRST (index build / long-doc
encode); gradients flow through it correctly (shard_map transposes the
gathers/psums — pinned by test_context_parallel_grads_match), but the
train loop does not use it: training sequences are ≤ max_seq_length
(pad-trimmed) where CP's per-layer collectives only add latency.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sse_tpu.models import towers
from sse_tpu.models.towers import Params, TowerConfig, _COMPUTE_DTYPE


def cp_mesh(n: int, devices=None) -> Mesh:
    """A dedicated single-axis {'seq': n} mesh for context parallelism
    (see the axis contract in the module docstring)."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())[:n]
    if len(devices) < n:
        raise ValueError(f"need {n} devices for CP, have {len(devices)}")
    return Mesh(np.asarray(devices), ("seq",))


def check_cp_config(cfg: TowerConfig) -> None:
    """Raise unless the tower supports context parallelism."""
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


def make_cp_encoder(cfg: TowerConfig, mesh: Mesh, axis: str = "seq"):
    """Build ONCE, call many times: a jitted
    ``fn(params, tokens, lengths) -> [B, encoding_dim]`` with the
    sequence dim sharded over ``mesh.shape[axis]``. Token width must be
    a multiple of the shard count (pad with 0s past `lengths`). Callers
    that loop (the index builder) must reuse the returned fn — the
    closure-per-call form would re-trace every invocation."""
    check_cp_config(cfg)
    n = mesh.shape[axis]

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

    # NOTE: the replication check stays ON (default). With
    # check_vma=False, shard_map's transpose does NOT know the params
    # are replicated over 'seq' and drops the cross-shard psum of their
    # cotangents — gradients come out per-shard-partial (caught by
    # test_context_parallel_grads_match when this briefly shipped off).
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(None, axis), P()),
            out_specs=P(),
        )
    )


def encode_context_parallel(
    params: Params,
    cfg: TowerConfig,
    tokens: jax.Array,  # [B, L] int32, L % mesh.shape[axis] == 0
    lengths: jax.Array,  # [B] int32
    mesh: Mesh,
    axis: str = "seq",
):
    """L2-normalized [B, encoding_dim] embeddings with the SEQUENCE dim
    sharded (one-shot convenience wrapper over make_cp_encoder — loops
    must build the encoder once instead)."""
    check_cp_config(cfg)  # guard rails fire before the mesh-axis lookup
    n = mesh.shape[axis]
    b, l = tokens.shape
    if l % n:
        raise ValueError(f"sequence length {l} not divisible by {n} shards")
    return make_cp_encoder(cfg, mesh, axis)(params, tokens, lengths)
