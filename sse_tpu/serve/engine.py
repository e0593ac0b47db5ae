"""The fused query path: tokenize (host) → ONE device program → top-N ids.

North-star stack (SURVEY.md §3.3 build mapping): no host round-trips
between encode and top-k. Scoring backend selection:

  * on TPU, the Pallas streaming kernel (sse_tpu.ops.fused_topk) scores
    index blocks in VMEM so the [B, T] score matrix never touches HBM;
  * otherwise (CPU tests / tiny indexes) the plain XLA matmul + top_k;
  * with a mesh, either backend runs per-shard inside shard_map and only
    S·k candidates cross ICI (exact merge — sse_tpu.parallel.topk).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sse_tpu.index.sharded_index import ShardedIndex
from sse_tpu.models import sse
from sse_tpu.models.sse import SSEConfig
from sse_tpu.ops.fused_topk import (
    fused_score_topk,
    fused_score_topk_twophase,
    pick_kernel_config,
    pick_twophase_block_t,
)

# Max emb chunks streamed per kernel grid step (per-transfer DMA issue
# amortization — sse_tpu.ops.fused_topk dma_span). Raised only on
# measured wins; 1 = r2 behavior (span 2/4 measured 2x SLOWER on v5e).
MAX_DMA_SPAN = 1

# Query batches larger than this are scored in chunks WITHIN the jitted
# program (each chunk re-reads the index): measured on v5e (r3 bisect,
# docs/kernels.md), B=512 at its optimal tile runs 5.3 ms = 96k QPS
# while every B=1024 single-dispatch shape collapses to 23+ ms — two
# 512-chunks score 1024 queries in ~10.7 ms. The kernel is not
# HBM-bandwidth-bound, so the extra index read is cheap.
MAX_KERNEL_BATCH = 512


def _pick_span(t_pad_local: int, block_t: Optional[int]) -> int:
    if not block_t:
        return 1
    for s in (4, 2, 1):
        if s <= MAX_DMA_SPAN and t_pad_local % (block_t * s) == 0:
            return s
    return 1
from sse_tpu.parallel.topk import NEG_INF
from sse_tpu.text.subword import SubwordVocab


def _shard_topk(q, emb_block, k, num_real, axis, use_pallas, block_t,
                interpret, variant, group=None):
    """Per-shard scoring + local top-k with GLOBAL row indices."""
    t_local = emb_block.shape[0]
    row0 = jax.lax.axis_index(axis) * t_local if axis else 0
    nr_local = (
        jnp.clip(jnp.asarray(num_real, jnp.int32) - row0, 0, t_local)
        if axis
        else num_real
    )
    if use_pallas:
        vals, idx = fused_score_topk(
            q, emb_block, k, nr_local, block_t, interpret=interpret,
            variant=variant, group=group,
            dma_span=_pick_span(t_local, block_t),
        )
        return vals, idx + row0
    if emb_block.dtype == jnp.int8:
        # int8 index: 127-scale quantized queries, EXACT int32 MXU
        # accumulation, scores rescaled to cosine range (matches the
        # Pallas path — sse_tpu.ops.fused_topk._block_scores)
        from sse_tpu.ops.fused_topk import _INT8_INV, quantize_queries_int8

        scores = jax.lax.dot_general(
            quantize_queries_int8(q), emb_block,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * _INT8_INV
    else:
        scores = jnp.dot(
            q, emb_block.T, preferred_element_type=jnp.float32
        )
    lids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(lids < nr_local, scores, NEG_INF)
    if k > t_local:
        scores = jnp.pad(
            scores, ((0, 0), (0, k - t_local)), constant_values=NEG_INF
        )
    vals, idx = jax.lax.top_k(scores, k)
    return vals, jnp.minimum(idx, t_local - 1) + row0


def build_fused_query_fn(
    model_cfg: SSEConfig,
    k: int,
    num_real: Optional[int] = None,  # baked default; pass dynamically below
    mesh: Optional[Mesh] = None,
    batch: Optional[int] = None,
    t_pad: Optional[int] = None,
    emb_dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
    pallas_variant: str = "packed",
) -> Callable:
    """Compile-ready fused(params, emb, tokens, lengths[, num_real])
    → (vals, rows).

    `num_real` is a RUNTIME int32 operand (rows ≥ num_real are padding),
    so a growing index (sse_tpu.index add()) never recompiles; the
    constructor arg only sets the default when the call omits it.

    `use_pallas=None` auto-selects: Pallas on TPU backends when a
    VMEM-fitting block size divides the (per-shard) index length.
    `pallas_variant`: 'packed' (default — ~1.4x faster; selection on
    11-mantissa-bit quantized scores for float indexes — quality-neutral
    next to the matmul's bf16 operand rounding — and on EXACT integer
    keys for int8 indexes, bit-identical to lax.top_k) or 'exact'
    (full-precision fp32 selection keys).

    2D meshes (the north-star 8-chip serving topology, e.g.
    {data: 2, model: 4}): queries are sharded over 'data' (each data
    replica serves its slice of the batch) while index rows stay over
    'model' — the cross-shard candidate merge all_gathers only within
    each data replica's model group. The call-time batch must divide
    the 'data' axis size. Asserted equal to the single-device program
    in tests/test_parallel.py and the driver dryrun.
    """
    axes = dict(mesh.shape) if mesh is not None else {}
    tp = axes.get("model", 1) > 1
    dp = axes.get("data", 1) > 1
    sharded = tp or dp
    n_shards = axes.get("model", 1) if sharded else 1

    def resolve_backend(t_pad_local, b):
        bt, grp = pick_kernel_config(
            t_pad_local, b, model_cfg.encoding_dim,
            jnp.dtype(emb_dtype).itemsize,
            packed=(pallas_variant == "packed"),
        )
        if use_pallas is None:
            on_tpu = jax.devices()[0].platform not in ("cpu",)
            return (on_tpu and bt is not None and k <= 128), bt, grp
        if use_pallas and bt is None:
            raise ValueError(
                f"no valid pallas block size for per-shard T={t_pad_local}"
            )
        return use_pallas, bt, grp

    def chunked_topk(q, emb_arr, nr, axis):
        """Score q in ≤MAX_KERNEL_BATCH chunks (see the constant's note);
        each chunk resolves its own (block_t, group) config. Large
        batches (r5, measured on v5e: B≥1024 at the headline shape) go
        to the branch-free two-phase block-max kernel in ONE dispatch
        instead — 26.4 ms vs 28.1 ms chunked at B=4096/T=1.25M, with
        bit-identical selection (docs/kernels.md r5 two-phase section)."""
        b = q.shape[0]
        pallas_wanted = (
            use_pallas
            if use_pallas is not None
            else jax.devices()[0].platform not in ("cpu",)
        )
        if pallas_wanted and k <= 128:
            bt2 = pick_twophase_block_t(
                emb_arr.shape[0], b, k, model_cfg.encoding_dim,
                jnp.dtype(emb_dtype).itemsize, pallas_variant,
            )
            if bt2 is not None:
                t_local = emb_arr.shape[0]
                row0 = jax.lax.axis_index(axis) * t_local if axis else 0
                nr_local = (
                    jnp.clip(
                        jnp.asarray(nr, jnp.int32) - row0, 0, t_local
                    )
                    if axis
                    else nr
                )
                vals, idx = fused_score_topk_twophase(
                    q, emb_arr, k, nr_local, block_t=bt2,
                    interpret=interpret,
                )
                return vals, idx + row0
        parts = []
        for lo in range(0, b, MAX_KERNEL_BATCH):
            qc = q[lo : lo + MAX_KERNEL_BATCH]
            pallas_on, bt, grp = resolve_backend(
                emb_arr.shape[0], qc.shape[0]
            )
            parts.append(
                _shard_topk(
                    qc, emb_arr, k, nr, axis, pallas_on, bt, interpret,
                    pallas_variant, group=grp,
                )
            )
        if len(parts) == 1:
            return parts[0]
        return (
            jnp.concatenate([p[0] for p in parts]),
            jnp.concatenate([p[1] for p in parts]),
        )

    if sharded:
        axis = "model" if tp else None
        # queries ride 'data' (each replica serves its batch slice); the
        # index rides 'model' (replicated across 'data' by the spec)
        qspec = P("data") if dp else P()
        espec = P("model", None) if tp else P()

        def body(params, emb_block, tokens, lengths, nr):
            q = sse.encode_source(params, model_cfg, tokens, lengths)
            vals, gidx = chunked_topk(q, emb_block, nr, axis)
            if not tp:
                return vals, gidx
            all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
            all_idx = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
            mvals, mpos = jax.lax.top_k(all_vals, k)
            midx = jnp.take_along_axis(all_idx, mpos, axis=1)
            return mvals, midx

        mapped = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), espec, qspec, qspec, P()),
                out_specs=(qspec, qspec),
                check_vma=False,  # outputs identical post-all_gather
            )
        )

        def fused_sharded(params, emb, tokens, lengths, nr=None):
            nr = jnp.asarray(
                num_real if nr is None else nr, jnp.int32
            )
            return mapped(params, emb, tokens, lengths, nr)

        return fused_sharded

    @jax.jit
    def fused_jit(params, emb, tokens, lengths, nr):
        q = sse.encode_source(params, model_cfg, tokens, lengths)
        return chunked_topk(q, emb, nr, None)

    def fused(params, emb, tokens, lengths, nr=None):
        nr = jnp.asarray(num_real if nr is None else nr, jnp.int32)
        return fused_jit(params, emb, tokens, lengths, nr)

    return fused


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
        use_pallas: Optional[bool] = None,
        pallas_variant: str = "packed",
        bulk_batch: Optional[int] = None,
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
        # Optional second batch tier for BULK traffic: a 256-row program
        # amortizes the per-dispatch link latency that dominates 8-row
        # dispatches on tunneled runtimes (measured: bulk POST of 256
        # queries over a 10M-row index = 84 QPS in 8-row chunks vs
        # thousands through one 256-row program). Latency traffic keeps
        # riding the small tier — query() pads each call to the SMALLEST
        # warmed tier that fits.
        self.bulk_batch = (
            None
            if (bulk_batch is None or bulk_batch <= max_batch)
            else bulk_batch
        )
        # remember what the caller ASKED for: an engine started on a small
        # index re-raises k toward requested_k as add_documents() grows it
        self.requested_k = k
        self.k = min(k, index.num_real)
        self._use_pallas = use_pallas
        self._pallas_variant = pallas_variant
        self._fused = self._build_fused()

    def _build_fused(self) -> Callable:
        return build_fused_query_fn(
            self.model_cfg,
            k=self.k,
            num_real=self.index.num_real,
            mesh=self.index.mesh,
            t_pad=self.index.padded_size,
            emb_dtype=self.index.emb.dtype,
            use_pallas=self._use_pallas,
            pallas_variant=self._pallas_variant,
        )

    # --------------------------------------------------------------- host
    #
    # Length bucketing: queries are padded to the smallest bucket ≥ the
    # batch's longest query instead of always max_seq_length, so short
    # queries (the common case) skip most of the recurrent encode steps.
    # jit compiles one program per bucket shape — bounded by len(buckets).
    _BUCKETS = (8, 16, 32)

    def _bucket_widths(self) -> List[int]:
        """The exact set of token widths serving programs compile for —
        the SINGLE source of truth shared by encode_queries (bucket
        selection) and warmup (pre-compilation), so a width that can be
        queried is always a width that was warmed."""
        return [b for b in self._BUCKETS if b < self.max_seq_length] + [
            self.max_seq_length
        ]

    def _batch_tiers(self) -> List[int]:
        """Warmed device batch sizes, ascending (see bulk_batch)."""
        tiers = [self.max_batch]
        if self.bulk_batch is not None:
            tiers.append(self.bulk_batch)
        return tiers

    @property
    def max_dispatch(self) -> int:
        """Largest warmed batch — the most queries one device call takes."""
        return self._batch_tiers()[-1]

    def warmup(self, fused: Optional[Callable] = None) -> float:
        """Compile and execute every serving program (one per length
        bucket) with dummy queries; returns elapsed seconds. Serving
        entry points call this BEFORE accepting traffic — on tunneled/
        remote-compile runtimes a cold serving program can take minutes
        (measured 151 s on the axon link), which would otherwise be paid
        by (and time out) the first user query. `fused` warms a
        not-yet-published program (see add_documents' k rebuild)."""
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        fn = self._fused if fused is None else fused
        t0 = _time.perf_counter()
        shapes = [
            (b, w)
            for b in self._batch_tiers()
            for w in self._bucket_widths()
        ]

        def one(shape):
            b, w = shape
            toks = jnp.zeros((b, w), jnp.int32)
            lengths = jnp.ones((b,), jnp.int32)
            out = fn(self.params, self.index.emb, toks, lengths)
            jax.tree.map(np.asarray, out)  # completion barrier

        # bucket programs compile independently; XLA releases the GIL
        # during compilation, so threads overlap the (dominant) compile
        # time — execution afterwards serializes on the device anyway
        with ThreadPoolExecutor(max_workers=len(shapes)) as pool:
            list(pool.map(one, shapes))
        return _time.perf_counter() - t0

    def encode_queries(self, texts: Sequence[str]):
        """Tokenize + pad a query batch to a bucketed static shape (host
        side; C++ native encoder when available — sse_tpu.native)."""
        from sse_tpu.data.corpus import batch_encode

        # smallest warmed batch tier that fits this call
        b = next(
            (t for t in self._batch_tiers() if t >= len(texts)),
            self.max_dispatch,
        )
        padded = list(texts[:b]) + [""] * (b - min(len(texts), b))
        tokens, lengths = batch_encode(self.vocab, padded, self.max_seq_length)
        longest = int(lengths.max()) if len(texts) else 1
        # smallest warmed width that fits (lengths are clamped to
        # max_seq_length, so one always exists)
        width = next(w for w in self._bucket_widths() if w >= longest)
        return jnp.asarray(tokens[:, :width]), jnp.asarray(lengths)

    def add_documents(self, ids: Sequence[str], texts: Sequence[str]) -> int:
        """Live index growth: encode + append new targets (tower modes).
        Returns the new num_real. No recompilation — the serving program
        takes num_real as a runtime operand."""
        from sse_tpu.models.sse import NetworkMode

        if self.model_cfg.mode == NetworkMode.SOURCE_ENCODER_ONLY:
            raise ValueError(
                "source-encoder-only targets are learned table rows; "
                "adding documents requires a tower mode"
            )
        from sse_tpu.data.corpus import batch_encode

        tokens, lengths = batch_encode(self.vocab, list(texts), self.max_seq_length)
        emb = sse.target_embeddings(
            self.params,
            self.model_cfg,
            tokens=jnp.asarray(tokens),
            lengths=jnp.asarray(lengths),
        )
        self.index.add(np.asarray(emb), list(ids), list(texts))
        new_k = min(self.requested_k, self.index.num_real)
        if new_k != self.k:
            # the index grew past the startup clamp: rebuild the fused fn
            # at the larger k. The new program is WARMED before being
            # published — concurrent queries keep running the old (warm)
            # program during the compile, instead of the first
            # post-growth query paying a cold compile (minutes on
            # remote-compile runtimes) and timing out.
            old_k = self.k
            self.k = new_k
            new_fused = self._build_fused()
            try:
                self.warmup(fused=new_fused)
            except Exception:
                self.k = old_k  # keep serving the old program
                raise
            self._fused = new_fused
        return self.index.num_real

    def delete_documents(self, ids: Sequence[str]) -> int:
        """Live document removal (swap-with-last in the sharded index —
        no recompile, O(1) device work per id). Returns the new num_real.
        Concurrent queries see the fully-old or fully-new index via the
        atomic snapshot (see ShardedIndex.delete concurrency note); a
        deleted document can never resurface or tear a row lookup."""
        return self.index.delete(list(ids))

    def query(self, texts: Sequence[str]) -> List[List[Dict[str, Any]]]:
        """Batch of query strings → per-query top-k
        [{'targetId', 'targetText', 'score', 'row'}, ...] best-first."""
        if len(texts) > self.max_dispatch:
            out: List[List[Dict[str, Any]]] = []
            for lo in range(0, len(texts), self.max_dispatch):
                out.extend(self.query(texts[lo : lo + self.max_dispatch]))
            return out
        tokens, lengths = self.encode_queries(texts)
        # Atomic snapshot: mutators (add/delete) publish the whole
        # (emb, num_real, ids, texts) tuple as ONE attribute assignment,
        # so a concurrent mutation can only make this query see the
        # fully-old or fully-new index — never a new num_real paired with
        # an old emb (padding rows would score) or a shrunken ids list
        # against an old num_real (row lookup would crash after delete).
        emb, nr, ids, texts_side = self.index.pub
        fused = self._fused
        vals, rows = fused(self.params, emb, tokens, lengths, nr)
        vals = np.asarray(vals)
        rows = np.asarray(rows)
        results = []
        for i in range(len(texts)):
            hits = []
            # k from the program's own output width: immune to a torn read
            # of (self.k, self._fused) during a concurrent rebuild
            for j in range(min(rows.shape[1], nr)):
                r = int(rows[i, j])
                tid, ttext = ids[r], texts_side[r]
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
