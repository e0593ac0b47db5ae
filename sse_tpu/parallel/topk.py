"""Distributed EXACT top-k over a row-sharded score/index matrix.

SURVEY.md §2.2 "index/shard parallelism" row — the component the reference
never had (its index was one CPU numpy matrix). Algorithm (provably exact):

  1. each shard computes a LOCAL top-k over its rows (lax.top_k — O(T/S)
     work, stays on-device);
  2. local winners' indices are lifted to global row space
     (+ shard row offset);
  3. an all_gather over the shard axis collects S·k candidates per query —
     tiny (k floats + ints per shard) so the collective rides ICI at
     negligible cost;
  4. a final top-k over the S·k candidates yields the global result.

Exactness: every true global top-k row is, a fortiori, in its own shard's
local top-k, hence among the gathered candidates. Asserted equal to a
single-device argsort in tests/test_parallel.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = jnp.float32(-jnp.inf)


def local_topk_merge_body(
    scores: jax.Array, k: int, axis: str
) -> Tuple[jax.Array, jax.Array]:
    """shard_map body: `scores` is this shard's [B, T_local] block of a
    [B, T] matrix row-sharded over mesh axis `axis`. Returns replicated
    ([B, k] values, [B, k] global row indices), exactly the global top-k."""
    t_local = scores.shape[-1]
    if k > t_local:  # tiny shards: pad so every shard still offers k rows
        pad = k - t_local
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
    vals, idx = jax.lax.top_k(scores, k)  # [B, k] local winners
    idx = jnp.minimum(idx, t_local - 1)  # clamp pad positions (−inf anyway)
    offset = jax.lax.axis_index(axis) * t_local
    gidx = idx + offset
    # [B, S*k] candidates on every shard (concat along the k axis).
    all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
    all_gidx = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
    mvals, mpos = jax.lax.top_k(all_vals, k)
    mgidx = jnp.take_along_axis(all_gidx, mpos, axis=1)
    return mvals, mgidx


def distributed_topk(
    scores: jax.Array,  # [B, T], T sharded over `axis`
    k: int,
    mesh: Mesh,
    axis: str = "model",
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k of a column-sharded score matrix, without ever
    materializing the full [B, T] row on one device."""
    body = functools.partial(local_topk_merge_body, k=k, axis=axis)
    # check_vma=False: the trailing all_gather makes outputs bit-identical
    # on every shard, which the static replication checker can't infer.
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=(P(), P()),
        check_vma=False,
    )(scores)
