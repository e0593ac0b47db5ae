"""Streaming fused score + exact top-k Pallas kernel.

The serving matmul's XLA form materializes the [B, T] score matrix in HBM
(write + read-back by top_k ≈ 2.5 GB at B=256, T=1.25M) — measured
~14 ms/batch on v5e. This kernel streams index blocks HBM→VMEM (Pallas
auto-pipelines the grid with double buffering), scores them on the MXU,
and folds each block into a running top-k held in VMEM scratch, so HBM
traffic is just the index itself (one read): ~4× less traffic.

Exact selection, same tie-breaking as lax.top_k (lowest index wins).
Rows >= num_real (padding) are masked to -inf in-kernel; num_real is a
runtime scalar so shard_map can pass per-shard values.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # python scalar: jnp constants get captured by pallas tracing


def _topk_passes(scores, gidx, k):
    """Exact top-k of [B, C] by k (max, select-index, mask) passes.
    Returns ([B, k] values, [B, k] indices). Ties → lowest index."""
    vals = []
    idxs = []
    big = jnp.int32(2**30)
    for _ in range(k):
        m = jnp.max(scores, axis=1, keepdims=True)  # [B, 1]
        hit = scores == m
        # lowest global index among the argmax columns
        cand = jnp.where(hit, gidx, big)
        mi = jnp.min(cand, axis=1, keepdims=True)  # [B, 1]
        vals.append(m)
        idxs.append(mi)
        scores = jnp.where(cand == mi, NEG, scores)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


# ----------------------------------------------------- packed-key variant
#
# (score, index) packed into ONE sortable int32: the float's bits are made
# order-preserving under signed-int compare (sign-flip trick), the low 12
# mantissa bits are replaced by (4095 - block_local_col). One max-reduce
# then extracts value AND index together — ~2x less VPU work per
# extraction pass than the exact variant's (max, index-min, mask) trio,
# and every key is unique so equality-masking can never kill two
# candidates at once. Cost: scores are quantized to 11 mantissa bits
# (≤ ~1.2e-4 relative) — far below the bf16 operand noise already in the
# matmul; selection is exact w.r.t. the quantized scores and ties break
# deterministically toward the lower index. Callers needing exact VALUES
# re-score the k winners (k·D flops — nothing).

_INT_MIN = -(2**31)
_IDX_MASK = 4095  # 12 low bits ↔ block_t ≤ 4096

# Padding rows and running-top-k init sink to the sortable key of NEG
# (low bits cleared) rather than INT_MIN: decoded it's a large-negative
# FINITE float (never NaN) that loses every merge, and init indices are 0
# (always in range) — so even a fully-padded shard / num_real < k can
# never surface an out-of-range row id. (_INT_MIN remains the in-pass
# masking value only; masked keys never win while a sink key exists.)
import numpy as _np

_b = _np.asarray(NEG, _np.float32).view(_np.int32)
_NEG_SINK = int(
    (_b ^ ((_b >> 31) & _np.int32(0x7FFFFFFF))) & ~_np.int32(_IDX_MASK)
)


def _to_sortable(f32):
    bits = jax.lax.bitcast_convert_type(f32, jnp.int32)
    return bits ^ jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(bits, 31), 1
    )  # bits ^ ((bits>>31) & 0x7FFFFFFF)


def _from_sortable(key):
    bits = key ^ jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(key, 31), 1
    )
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _packed_extract(keys, k):
    """k passes of (max, decode, mask) over unique packed keys [B, C].
    Returns ([B,k] value-keys low-bits-cleared, [B,k] decoded low bits)."""
    vals = []
    lows = []
    for _ in range(k):
        m = jnp.max(keys, axis=1, keepdims=True)  # [B, 1]
        vals.append(m & ~jnp.int32(_IDX_MASK))
        lows.append(_IDX_MASK - (m & _IDX_MASK))
        keys = jnp.where(keys == m, _INT_MIN, keys)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(lows, axis=1)


def _packed_kernel(
    nr_ref, q_ref, emb_ref, vals_ref, idx_ref,
    rv, ri, keys_scr, bv_scr, bi_scr, done_scr, *, k, block_t,
):
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        rv[:] = jnp.full_like(rv, _NEG_SINK)
        ri[:] = jnp.zeros_like(ri)

    num_real = nr_ref[0]
    scores = jax.lax.dot_general(
        q_ref[:],
        emb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, BT]
    row0 = i * block_t
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    key = _to_sortable(scores) & ~jnp.int32(_IDX_MASK)
    # padding rows sink to the finite NEG key (unique via the col bits)
    key = jnp.where(row0 + col < num_real, key, _NEG_SINK)
    keys_scr[:] = key | (_IDX_MASK - col)
    # candidate slots must start inert: passes skipped by the early exit
    # would otherwise leak the PREVIOUS block's candidates into the merge
    bv_scr[:] = jnp.full_like(bv_scr, _INT_MIN)
    bi_scr[:] = jnp.zeros_like(bi_scr)

    # Early-exit extraction, predicated per ROW GROUP: once a group's
    # remaining block max is ≤ each of its rows' running k-th value, no
    # remaining element can enter any of its top-ks (the max bounds them
    # all) — the group's later passes are skipped. Finer groups exit far
    # sooner than the whole batch would (one straggler row no longer keeps
    # all 256 rows extracting); late blocks typically pay 1 max-reduce per
    # group instead of k full passes.
    b_rows = keys_scr.shape[0]
    # Fine-grained groups only pay off when blocks far outnumber the
    # expected per-row extractions (long tails of skippable passes);
    # measured crossover ≈ 512 blocks on v5e.
    group = (
        32
        if nblocks >= 512 and b_rows % 32 == 0 and b_rows > 32
        else b_rows
    )
    ngroups = b_rows // group
    for g in range(ngroups):
        done_scr[g] = 0
    for g in range(ngroups):
        lo, hi = g * group, (g + 1) * group
        thr = rv[lo:hi, k - 1 : k]  # running k-th (pre-block: conservative)
        for j in range(k):

            @pl.when(done_scr[g] == 0)
            def _(j=j, g=g, lo=lo, hi=hi, thr=thr):
                keys = keys_scr[lo:hi]
                m = jnp.max(keys, axis=1, keepdims=True)  # [group, 1]
                useless = m <= thr
                bv_scr[lo:hi, j : j + 1] = jnp.where(
                    useless, _INT_MIN, m & ~jnp.int32(_IDX_MASK)
                )
                bi_scr[lo:hi, j : j + 1] = row0 + (_IDX_MASK - (m & _IDX_MASK))

                @pl.when(jnp.all(useless))
                def _():
                    done_scr[g] = 1

                @pl.when(jnp.logical_not(jnp.all(useless)))
                def _():
                    keys_scr[lo:hi] = jnp.where(keys == m, _INT_MIN, keys)

    # merge into running top-k: slot bits keep the 2k candidates unique
    cat_v = jnp.concatenate([rv[:], bv_scr[:]], axis=1)  # [B, 2k]
    cat_i = jnp.concatenate([ri[:], bi_scr[:]], axis=1)
    slot = jax.lax.broadcasted_iota(jnp.int32, cat_v.shape, 1)
    mkey = cat_v | (_IDX_MASK - slot)
    mv, mslot = _packed_extract(mkey, k)
    # winner slot → its global row (2k-wide compare+select per slot)
    gsel = jnp.stack(
        [
            jnp.sum(
                jnp.where(slot == mslot[:, j : j + 1], cat_i, 0), axis=1
            )
            for j in range(k)
        ],
        axis=1,
    )
    rv[:] = mv
    ri[:] = gsel

    @pl.when(i == nblocks - 1)
    def _():
        vals_ref[:] = _from_sortable(rv[:])
        idx_ref[:] = ri[:]


def _kernel(nr_ref, q_ref, emb_ref, vals_ref, idx_ref, rv, ri, *, k, block_t):
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        rv[:] = jnp.full_like(rv, NEG)
        ri[:] = jnp.full_like(ri, 2**30)

    num_real = nr_ref[0]
    q = q_ref[:]  # [B, D]
    blk = emb_ref[:]  # [BT, D]
    scores = jax.lax.dot_general(
        q,
        blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, BT]
    row0 = i * block_t
    gidx = row0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    # Only blocks straddling the real/padding boundary pay the mask pass.
    scores = jax.lax.cond(
        row0 + block_t > num_real,
        lambda s: jnp.where(gidx < num_real, s, NEG),
        lambda s: s,
        scores,
    )

    bv, bi = _topk_passes(scores, gidx, k)  # block-local top-k [B, k]
    # fold into running top-k: 2k-wide merge
    cat_v = jnp.concatenate([rv[:], bv], axis=1)
    cat_i = jnp.concatenate([ri[:], bi], axis=1)
    mv, mi = _topk_passes(cat_v, cat_i, k)
    rv[:] = mv
    ri[:] = mi

    @pl.when(i == nblocks - 1)
    def _():
        vals_ref[:] = rv[:]
        idx_ref[:] = ri[:]


def pick_block_t(
    t_pad: int, batch: int, d: int, itemsize: int, packed: bool = True
) -> Optional[int]:
    """Largest block_t dividing t_pad that fits the VMEM budget; None if
    no worthwhile block size exists (tiny index → XLA path is fine).

    Footprint: fp32 scores intermediate [B, BT] (+ the packed variant's
    mutable key scratch, same size) + 2 pipelined emb blocks [BT, D].
    The 10 MB model budget leaves ~5-6 MB for compiler workspace under the
    16 MB scoped-vmem limit (validated on v5e). 4096 cap keeps the packed
    variant's 12 index bits sufficient."""
    budget = 11 * 1024 * 1024
    score_bufs = 2 if packed else 1
    for bt in (4096, 2048, 1024, 512):
        if t_pad % bt:
            continue
        if score_bufs * batch * bt * 4 + 2 * bt * d * itemsize <= budget:
            return bt
    return None


def fused_score_topk(
    q: jax.Array,  # [B, D] queries
    emb: jax.Array,  # [T_pad, D] index rows (T_pad % block_t == 0)
    k: int,
    num_real,  # int or traced int32 scalar: rows >= num_real are padding
    block_t: int = 4096,
    interpret: bool = False,
    variant: str = "packed",  # packed (fast, 11-bit score quantization in
    #                           the selector) | exact (full-precision keys)
) -> Tuple[jax.Array, jax.Array]:
    """Top-k (values, row indices) of q @ emb.T without materializing the
    score matrix.

    `emb` may be bfloat16 (halves HBM traffic; scores still accumulate in
    float32 on the MXU). See the packed-variant comment above for the
    selection-precision trade.
    """
    b, d = q.shape
    t_pad = emb.shape[0]
    if t_pad % block_t:
        raise ValueError(f"T_pad {t_pad} not a multiple of block_t {block_t}")
    if variant == "packed" and block_t > _IDX_MASK + 1:
        raise ValueError(f"packed variant needs block_t <= {_IDX_MASK + 1}")
    nblocks = t_pad // block_t
    kernel = functools.partial(
        _packed_kernel if variant == "packed" else _kernel,
        k=k,
        block_t=block_t,
    )
    q = q.astype(emb.dtype)
    nr = jnp.asarray(num_real, jnp.int32).reshape((1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        # index maps take (grid idx, scalar-prefetch ref)
        in_specs=[
            pl.BlockSpec((b, d), lambda i, nr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_t, d), lambda i, nr: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda i, nr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i, nr: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            [
                pltpu.VMEM((b, k), jnp.int32),  # rv: running packed keys
                pltpu.VMEM((b, k), jnp.int32),  # ri: running global rows
                pltpu.VMEM((b, block_t), jnp.int32),  # mutable block keys
                pltpu.VMEM((b, k), jnp.int32),  # bv: block candidates
                pltpu.VMEM((b, k), jnp.int32),  # bi: block candidate rows
                pltpu.SMEM((max(b // 32, 1),), jnp.int32),  # per-group exit flags
            ]
            if variant == "packed"
            else [
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.int32),
            ]
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * t_pad,
            bytes_accessed=t_pad * d * emb.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nr, q, emb)
