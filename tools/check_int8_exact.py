"""Hard exactness check of the int8 packed fused top-k at ≥1M rows.

Runs the COMPILED kernel on the real device (TPU; works on CPU too but
slowly) against an on-device lax.top_k reference over the exact int32
scores. Since r4 the int8 packed path selects on unquantized integer
keys, so agreement must be 100% of rows, bit-for-bit — this tool is the
promotion of the old "99.4% agreement" footnote into a hard check
(VERDICT r3 item 5; SURVEY.md §2.2 "distributed EXACT top-N").

Usage: python tools/check_int8_exact.py [T] [B] [k]   (defaults 1.25M/256/10)
Exits nonzero on any disagreement.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from sse_tpu.index.sharded_index import quantize_rows
from sse_tpu.ops.fused_topk import (
    fused_score_topk,
    pick_kernel_config,
    quantize_queries_int8,
)


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 1_249_280
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    d = 128
    rng = np.random.default_rng(0)

    def rows(n):
        x = rng.normal(size=(n, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    emb = jax.device_put(quantize_rows(jnp.asarray(rows(t)), jnp.int8))
    bt, grp = pick_kernel_config(t, b, d, 1, packed=True)
    assert bt is not None, "no feasible block size at this shape"

    @jax.jit
    def kern(q):
        return fused_score_topk(q, emb, k, t, block_t=bt, group=grp)

    @jax.jit
    def ref(qi):
        s = jax.lax.dot_general(
            qi, emb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        rv, ri = jax.lax.top_k(s, k)
        return rv.astype(jnp.float32) * (1.0 / (127 * 127)), ri

    bad = 0
    nbatches = 8
    for i in range(nbatches):
        q = jnp.asarray(rows(b))
        kv, ki = jax.tree.map(np.asarray, kern(q))
        rv, ri = jax.tree.map(np.asarray, ref(quantize_queries_int8(q)))
        row_bad = (ki != ri).any(axis=1) | (kv != rv).any(axis=1)
        bad += int(row_bad.sum())
        print(f"batch {i}: {int(row_bad.sum())}/{b} rows disagree")
    total = nbatches * b
    pct = 100.0 * (total - bad) / total
    print(
        f"int8 packed exactness: {total - bad}/{total} rows bit-identical "
        f"to lax.top_k ({pct:.4f}%) at T={t}, B={b}, k={k}, D={d}, "
        f"block_t={bt}, platform={jax.devices()[0].platform}"
    )
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main()
