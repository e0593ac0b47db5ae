"""The fused query path: tokenize (host) → ONE device program → top-N ids.

North-star stack (SURVEY.md §3.3 build mapping): no host round-trips
between encode and top-k. With a mesh, the index matmul runs shard-local
inside shard_map and only S·k candidates cross ICI (exact merge,
sse_tpu.parallel.topk); single-device falls back to plain matmul + top_k
in the same jit program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sse_tpu.index.sharded_index import ShardedIndex
from sse_tpu.models import sse
from sse_tpu.models.sse import SSEConfig
from sse_tpu.parallel.topk import NEG_INF
from sse_tpu.text.subword import EOS_ID, SubwordVocab


class QueryEngine:
    """Live query serving over a (possibly sharded) index.

    Queries are padded to a static `max_batch` so the program compiles
    once; `k` is static too.
    """

    def __init__(
        self,
        params,
        model_cfg: SSEConfig,
        vocab: SubwordVocab,
        index: ShardedIndex,
        max_seq_length: int = 50,
        max_batch: int = 8,
        k: int = 10,
    ):
        if index.mesh is not None:
            # index rows live across the mesh; params ride along replicated
            params = jax.device_put(params, NamedSharding(index.mesh, P()))
        self.params = params
        self.model_cfg = model_cfg
        self.vocab = vocab
        self.index = index
        self.max_seq_length = max_seq_length
        self.max_batch = max_batch
        self.k = min(k, index.num_real)
        self._fused = self._build_fused()

    # ------------------------------------------------------------- device
    def _build_fused(self):
        cfg = self.model_cfg
        k = self.k
        mesh = self.index.mesh
        num_real = self.index.num_real

        if mesh is not None and mesh.shape["model"] > 1:
            axis = "model"

            def body(params, emb_block, tokens, lengths):
                # emb_block: this shard's [T_local, D] rows (closed over
                # sharding via in_specs). Encode runs replicated per shard —
                # it is tiny next to the index matmul.
                q = sse.encode_source(params, cfg, tokens, lengths)
                scores = jnp.dot(
                    q, emb_block.T, preferred_element_type=jnp.float32
                )  # [B, T_local] — shard-local MXU work
                t_local = scores.shape[-1]
                row0 = jax.lax.axis_index(axis) * t_local
                gids = row0 + jax.lax.broadcasted_iota(
                    jnp.int32, scores.shape, 1
                )
                scores = jnp.where(gids < num_real, scores, NEG_INF)
                if k > t_local:
                    pad = k - t_local
                    scores = jnp.pad(
                        scores, ((0, 0), (0, pad)), constant_values=NEG_INF
                    )
                vals, idx = jax.lax.top_k(scores, k)
                idx = jnp.minimum(idx, t_local - 1) + row0
                all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
                all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
                mvals, mpos = jax.lax.top_k(all_vals, k)
                midx = jnp.take_along_axis(all_idx, mpos, axis=1)
                return mvals, midx

            fused = jax.jit(
                jax.shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(P(), P(axis, None), P(), P()),
                    out_specs=(P(), P()),
                    check_vma=False,  # outputs identical post-all_gather
                )
            )
        else:

            @jax.jit
            def fused(params, emb, tokens, lengths):
                q = sse.encode_source(params, cfg, tokens, lengths)
                scores = jnp.dot(
                    q, emb.T, preferred_element_type=jnp.float32
                )
                t_pad = scores.shape[-1]
                gids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                scores = jnp.where(gids < num_real, scores, NEG_INF)
                return jax.lax.top_k(scores, k)

        return fused

    # --------------------------------------------------------------- host
    def encode_queries(self, texts: Sequence[str]):
        """Tokenize + pad a query batch to static shape (host side)."""
        b = self.max_batch
        tokens = np.zeros((b, self.max_seq_length), np.int32)
        lengths = np.ones((b,), np.int32)
        for i, text in enumerate(texts[:b]):
            ids = self.vocab.encode(text)[: self.max_seq_length - 1] + [EOS_ID]
            tokens[i, : len(ids)] = ids
            lengths[i] = len(ids)
        return jnp.asarray(tokens), jnp.asarray(lengths)

    def query(self, texts: Sequence[str]) -> List[List[Dict[str, Any]]]:
        """Batch of query strings → per-query top-k
        [{'targetId', 'targetText', 'score', 'row'}, ...] best-first."""
        if len(texts) > self.max_batch:
            out: List[List[Dict[str, Any]]] = []
            for lo in range(0, len(texts), self.max_batch):
                out.extend(self.query(texts[lo : lo + self.max_batch]))
            return out
        tokens, lengths = self.encode_queries(texts)
        vals, rows = self._fused(self.params, self.index.emb, tokens, lengths)
        vals = np.asarray(vals)
        rows = np.asarray(rows)
        results = []
        for i in range(len(texts)):
            hits = []
            for j in range(self.k):
                r = int(rows[i, j])
                tid, ttext = self.index.ids[r], self.index.texts[r]
                hits.append(
                    {
                        "targetId": tid,
                        "targetText": ttext,
                        "score": float(vals[i, j]),
                        "row": r,
                    }
                )
            results.append(hits)
        return results
