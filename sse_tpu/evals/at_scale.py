"""Eval at index scale: recall@k scored through the SAME fused
encode+score+top-k program that serves queries (sharded index, Pallas
kernel, distributed exact merge) — so large-target-space evaluation costs
what serving costs, and eval exercises the production path.

(The classic Evaluator in sse_tpu/evals/recall.py re-encodes targets per
call, which is right DURING training when params change; this one takes a
built ShardedIndex — right AFTER indexing, and at 10M-target scale.)
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from sse_tpu.data.corpus import EncodedPairs
from sse_tpu.evals.recall import recall_at_k
from sse_tpu.index.sharded_index import ShardedIndex
from sse_tpu.models.sse import SSEConfig
from sse_tpu.serve.engine import build_fused_query_fn


def evaluate_against_index(
    params,
    model_cfg: SSEConfig,
    eval_pairs: EncodedPairs,
    index: ShardedIndex,
    ks: Sequence[int] = (1, 10),
    batch_size: int = 256,
    use_pallas=None,
) -> Dict[str, float]:
    ks = [k for k in ks if k <= index.num_real]
    max_k = max(ks)
    if index.mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = jax.device_put(params, NamedSharding(index.mesh, P()))
    fused = build_fused_query_fn(
        model_cfg,
        k=max_k,
        num_real=index.num_real,
        mesh=index.mesh,
        emb_dtype=index.emb.dtype,
        use_pallas=use_pallas,
    )
    n = eval_pairs.num_examples
    tops = []
    for lo in range(0, n, batch_size):
        src = eval_pairs.src[lo : lo + batch_size]
        sl = eval_pairs.src_len[lo : lo + batch_size]
        if src.shape[0] < batch_size:
            pad = batch_size - src.shape[0]
            src = np.concatenate([src, np.zeros((pad, src.shape[1]), src.dtype)])
            sl = np.concatenate([sl, np.ones((pad,), sl.dtype)])
        _, rows = fused(
            params, index.emb, jnp.asarray(src), jnp.asarray(sl)
        )
        tops.append(rows)  # stay on device; one fetch at the end
    top = np.asarray(jnp.concatenate(tops))[:n]
    return recall_at_k(top, eval_pairs.label_sets, ks)
