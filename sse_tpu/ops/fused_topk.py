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
_INT8_INV = 1.0 / (127 * 127)  # int8-index scores → cosine range


def _block_scores(q, blk, raw_int=False):
    """q @ blk.T with fp32 output. float operands accumulate in fp32 on
    the MXU; int8 operands accumulate EXACTLY in int32 (|score| <= 127^2
    * D < 2^24, so the fp32 conversion is exact too) and are rescaled to
    cosine range — downstream selection is identical for both. With
    ``raw_int`` (the packed kernel's int8 path) the exact int32 scores
    are returned unconverted so selection runs on integers."""
    if blk.dtype == jnp.int8:
        s = jax.lax.dot_general(
            q, blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if raw_int:
            return s
        return s.astype(jnp.float32) * _INT8_INV
    return jax.lax.dot_general(
        q, blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def quantize_queries_int8(q):
    """Symmetric 127-scale int8 quantization of L2-normalized query
    embeddings (matches sse_tpu.index.sharded_index.quantize_rows)."""
    return jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)


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

# ---- int8 EXACT keys (r4). int8-index scores are exact int32 integers,
# and for 127-scale-quantized L2-normalized rows Cauchy-Schwarz bounds
# them: |score| <= (127 + sqrt(D)/2)^2 < 2^18 for every D < 590k. So the
# UNQUANTIZED score fits the key's high 19 bits: key = (score << 12) |
# (4095 - col) — two's-complement shift keeps integer order, low bits
# break ties toward the lower column, and selection is bit-exact w.r.t.
# the true int32 scores (the 11-mantissa-bit quantization that costs the
# float paths ~1.2e-4 relative simply does not exist here). Out-of-
# contract inputs (unnormalized int8 rows) are clamped at encode time to
# saturate instead of wrapping.
_INT_SCORE_CLIP = (1 << 18) - 1
_INT_SINK = -(1 << 30)  # low 12 bits zero; > INT_MIN, < any clipped key
_INT_THR_INIT = -(1 << 20)  # below any real int8 score


def _enc_key(scores, int_exact):
    """Sortable int32 key with the low 12 (column) bits CLEARED."""
    if int_exact:
        s = jnp.clip(scores, -_INT_SCORE_CLIP, _INT_SCORE_CLIP)
        return jax.lax.shift_left(s, 12)
    return _to_sortable(scores) & ~jnp.int32(_IDX_MASK)


def _dec_val(key, int_exact):
    """Cosine-range fp32 value of a cleared key; sinks decode to NEG."""
    if int_exact:
        v = jax.lax.shift_right_arithmetic(key, 12).astype(jnp.float32)
        return jnp.where(key == _INT_SINK, NEG, v * _INT8_INV)
    return _from_sortable(key)


def _thr_of_kth(kth_key, int_exact):
    """Score-space gate threshold from the k-th cleared key. Float path:
    the TOP of the k-th value's quantization bucket (in-bucket ties lose
    to the earlier slot, so excluding them is exact). Int path: the exact
    k-th score itself (equal scores tie and lose to the earlier slot)."""
    if int_exact:
        return jax.lax.shift_right_arithmetic(kth_key, 12)
    return _from_sortable(kth_key | jnp.int32(_IDX_MASK))


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
    nr_ref, q_ref, emb_ref, out_ref,
    rv, ri, thr_scr, keys_scr, kbuf, gbuf, sm,
    *, k, block_t, slots, group, dma_span, int_exact,
):
    """Candidate-HARVEST streaming top-k (r2 roofline redesign; r3 adds
    ROW-GROUP processing; r4 hoists the harvest reductions full-batch
    and merges the two outputs — the B=4096 single-dispatch redesign).

    Measured structure (r4 probes, v5e, B=4096 / T=1.25M / bt=2048):
      * the matmul runs at ~105 TFLOP/s when M is the FULL batch
        (12.5 ms) vs ~41 TFLOP/s at M=512 — large-M amortizes the
        systolic fill, so the kernel must score the whole batch per
        block, not ≤512-row chunks;
      * elementwise reductions FUSE into the matmul's output walk: a
        compare+select+sum pass costs ~0 next to the dot (measured
        12.51 → 12.63 ms adding BOTH harvest sums) — but each extra
        VMEM-materialized [B, BT] pass does not, so the common path
        must be reduction-only;
      * a SECOND kernel output forces a per-grid-step block write-back
        (two [B,k] outputs measured +9.2 ms at B=4096 — more than the
        harvest itself); vals+rows therefore pack into ONE [B, 2k]
        int32 output, decoded by the caller.

    Per-block common path (every block, fused with the matmul):
      * hsum: every crosser (score > thr) contributes (2^19 + column)
        to a per-row int32 sum — ONE reduction yields the candidate
        COUNT (sum >> 19) and, when the count is 1 (the common case),
        the exact COLUMN (low bits);
      * vsum: the crossers' score sum — for a single crosser this IS
        its exact score (one nonzero fp32/int32 addend), so the append
        needs NO row-max pass.
    Everything else is per row-GROUP of ≤``group`` rows (own slot
    counter, own fallback scratch) and gated on that group's counts:
      * TWO-crosser rows resolve analytically (exact-max column via a
        min-reduce, second value via a masked max — the group row-max
        is computed only inside this branch);
      * 3+ crossers / int32-wrapped counts / padding-boundary blocks
        take the k-pass packed-extraction fallback (masks locally);
      * merges happen only at CONSOLIDATIONS (buffer full / last
        block): total merge work is O(candidates) ≈ B·k·ln(nblocks).

    Tie semantics stay lax.top_k-like on the 11-bit-quantized scores
    (EXACT integer keys on the int8 path): slot order IS (block, col)
    order, consolidation re-packs slot ids into the low key bits, and
    consolidated survivors occupy slots [0, k) — equal quantized scores
    always resolve to the earliest block / lowest column, exactly like
    a sequential per-block merge."""
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)
    b = rv.shape[0]
    ngroups = -(-b // group)
    cap = slots + k  # buffer width; [0, k) holds the consolidated top-k

    sink = _INT_SINK if int_exact else _NEG_SINK

    @pl.when(i == 0)
    def _():
        rv[:] = jnp.full_like(rv, sink)
        ri[:] = jnp.zeros_like(ri)
        thr_scr[:] = jnp.full_like(
            thr_scr, _INT_THR_INIT if int_exact else NEG
        )
        kbuf[:] = jnp.full_like(kbuf, _INT_MIN)
        gbuf[:] = jnp.zeros_like(gbuf)
        kbuf[:, :k] = jnp.full((b, k), sink, jnp.int32)
        for g in range(ngroups):
            sm[g, 0] = k  # next free slot (per group)
            sm[g, 1] = 0  # fallback-extraction done flag (per group)

    num_real = nr_ref[0]
    # DMA SPAN (r3): the emb block streamed per grid step is
    # [block_t * dma_span, D] — per-transfer issue cost is paid
    # dma_span× less often. The harvest still walks block_t-column
    # chunks so the packed keys' 12 index bits stay sufficient.
    for s in range(dma_span):
        scores_all = _block_scores(
            q_ref[:], emb_ref[s * block_t : (s + 1) * block_t],
            raw_int=int_exact,
        )  # [B, BT] fp32 (or exact int32 on the int8 path)
        row0 = (i * dma_span + s) * block_t
        # Padding is NOT masked here: index padding rows are zero
        # vectors, so only blocks past the num_real boundary can contain
        # them, and those blocks are forced into the fallback path
        # below, which masks locally. (Padding can only ADD crossers,
        # so the count gate below never skips a real candidate.)
        boundary = row0 + block_t > num_real

        # ---- full-batch fused harvest reductions (the ONLY per-score
        # work in the common path; measured free next to the matmul)
        thr = thr_scr[:]
        cross = scores_all > thr
        _SHIFT = 19
        colp = (1 << _SHIFT) + jax.lax.broadcasted_iota(
            jnp.int32, scores_all.shape, 1
        )
        hsum = jnp.sum(
            jnp.where(cross, colp, 0), axis=1, keepdims=True
        )  # [B, 1]: count<<19 | column-sum
        zero = (
            jnp.int32(0) if int_exact else jnp.float32(0.0)
        )
        vsum = jnp.sum(
            jnp.where(cross, scores_all, zero), axis=1, keepdims=True
        )  # [B, 1]: exact crosser value when the count is 1
        cnt_all = jax.lax.shift_right_arithmetic(hsum, _SHIFT)
        col_all = hsum & ((1 << _SHIFT) - 1)

        for g in range(ngroups):
            _packed_group_body(
                g, scores_all, cnt_all, col_all, vsum,
                row0, boundary, num_real,
                rv, ri, thr_scr, keys_scr, kbuf, gbuf, sm,
                k=k, cap=cap, group=group, b=b, int_exact=int_exact,
            )

    @pl.when(i == nblocks - 1)
    def _():
        for g in range(ngroups):
            lo, gb = g * group, min(group, b - g * group)
            _consolidate_group(
                lo, gb, rv, ri, thr_scr, kbuf, gbuf, sm, g,
                k=k, cap=cap, int_exact=int_exact,
            )
        # ONE output: [:, :k] packed value keys, [:, k:] global rows
        # (a second output block measured +9.2 ms/batch at B=4096)
        out_ref[:, :k] = rv[:]
        out_ref[:, k:] = ri[:]


def _consolidate_group(
    lo, gb, rv, ri, thr_scr, kbuf, gbuf, sm, g, *, k, cap, int_exact
):
    """Merge group g's candidate buffer into its running top-k and reset
    its slot counter. `lo`/`gb` are the group's static row offset/size."""
    sl = slice(lo, lo + gb)
    slotv = jax.lax.broadcasted_iota(jnp.int32, (gb, cap), 1)
    keys = kbuf[sl] | (_IDX_MASK - slotv)  # stored keys are cleared
    mv, mslot = _packed_extract(keys, k)
    gsel = jnp.stack(
        [
            jnp.sum(
                jnp.where(slotv == mslot[:, j : j + 1], gbuf[sl], 0),
                axis=1,
            )
            for j in range(k)
        ],
        axis=1,
    )
    rv[sl] = mv
    ri[sl] = gsel
    # threshold at the TOP of the k-th value's quantization bucket (float
    # paths) / the exact k-th score (int8 path): a later score tying it
    # loses to the earlier slot anyway, so excluding it is exact — and it
    # cuts borderline crossers that would otherwise trigger appends or
    # the multi-candidate fallback
    thr_scr[sl] = _thr_of_kth(mv[:, k - 1 : k], int_exact)
    kbuf[sl] = jnp.full((gb, cap), _INT_MIN, jnp.int32)
    kbuf[sl, :k] = mv
    gbuf[sl, :k] = gsel
    sm[g, 0] = k


def _packed_group_body(
    g, scores_all, cnt_all, col_all, vsum, row0, boundary, num_real,
    rv, ri, thr_scr, keys_scr, kbuf, gbuf, sm,
    *, k, cap, group, b, int_exact,
):
    """One row-group's candidate bookkeeping for one index block (see
    _packed_kernel). The per-score reductions (cnt/col/value sums) are
    computed ONCE full-batch by the caller, fused with the matmul; this
    body only reads their [gb, 1] slices in the common path — [gb, BT]
    passes happen solely inside the rare pair/fallback branches."""
    lo = g * group
    gb = min(group, b - lo)
    sl = slice(lo, lo + gb)
    sink = _INT_SINK if int_exact else _NEG_SINK
    masked = -_INT_SCORE_CLIP if int_exact else NEG
    cnt_row = cnt_all[sl]  # [gb, 1]
    col_row = col_all[sl]

    # Gate on the crosser count: thr is the TOP of the k-th key's
    # quantization bucket (float) / the exact k-th score (int8), so a
    # score crossing it is exactly a score whose key beats the k-th key
    # — the gate can never skip a candidate the harvest would keep.
    # int32-overflow note: worst case all columns qualify → hsum wraps
    # NEGATIVE; the count can never alias to 0, so the gate still opens
    # and the fallback below handles it.
    @pl.when(jnp.any(cnt_row != 0))
    def _():
        @pl.when(sm[g, 0] > cap - k)  # room for k more appends
        def _():
            _consolidate_group(
                lo, gb, rv, ri, thr_scr, kbuf, gbuf, sm, g,
                k=k, cap=cap, int_exact=int_exact,
            )

        # rows with exactly TWO crossers are resolved analytically below
        # (second-max + col algebra); only 3+ crossers (or the int32
        # wrap, or a padding boundary) need the k-pass fallback
        multi = jnp.logical_or(
            jnp.any(jnp.logical_or(cnt_row >= 3, cnt_row < 0)),
            boundary,  # padding rows only exist past the boundary
        )

        @pl.when(multi)
        def _():
            # warm-up / tie path: full packed extraction, per-row
            # thresholds, one buffer slot per executed pass
            scores = scores_all[lo : lo + gb]  # [gb, BT] — branch-only
            colg = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            key = _enc_key(scores, int_exact)
            kslice = slice(0, gb)  # scratch is [group, BT]; use gb rows
            keys_scr[kslice] = key | (_IDX_MASK - colg)

            # local padding mask: only boundary blocks pay it (they are
            # routed into this fallback by construction)
            @pl.when(boundary)
            def _(colg=colg):
                keys_scr[kslice] = jnp.where(
                    row0 + colg < num_real,
                    keys_scr[kslice],
                    sink | (_IDX_MASK - colg),
                )
            sm[g, 1] = 0
            thr = rv[sl, k - 1 : k]
            for j in range(k):

                @pl.when(sm[g, 1] == 0)
                def _(j=j, thr=thr):
                    keys = keys_scr[kslice]
                    m = jnp.max(keys, axis=1, keepdims=True)  # [gb, 1]
                    useless = m <= thr

                    @pl.when(jnp.all(useless))
                    def _():
                        sm[g, 1] = 1

                    @pl.when(jnp.logical_not(jnp.all(useless)))
                    def _(m=m, useless=useless, keys=keys):
                        slot = sm[g, 0]
                        slotv = jax.lax.broadcasted_iota(
                            jnp.int32, (gb, cap), 1
                        )
                        hit = slotv == slot
                        kbuf[sl] = jnp.where(
                            hit,
                            jnp.where(
                                useless, _INT_MIN,
                                m & ~jnp.int32(_IDX_MASK),
                            ),
                            kbuf[sl],
                        )
                        gbuf[sl] = jnp.where(
                            hit,
                            row0 + (_IDX_MASK - (m & _IDX_MASK)),
                            gbuf[sl],
                        )
                        sm[g, 0] = slot + 1
                        keys_scr[kslice] = jnp.where(
                            keys == m, _INT_MIN, keys
                        )

        @pl.when(jnp.logical_not(multi))
        def _():
            def append(vals_col, gidx_col):
                slot = sm[g, 0]
                slotv = jax.lax.broadcasted_iota(jnp.int32, (gb, cap), 1)
                hit = slotv == slot
                kbuf[sl] = jnp.where(hit, vals_col, kbuf[sl])
                gbuf[sl] = jnp.where(hit, gidx_col, gbuf[sl])
                sm[g, 0] = slot + 1

            pair = jnp.any(cnt_row == 2)

            @pl.when(pair)
            def _():
                # two-crosser rows, no extraction loop: every element
                # equal to the row max IS a crosser (max > thr), so the
                # max's column is the MIN column among exact-max hits
                # (exact under fp32 ties), the other crosser's column is
                # the harvest sum minus it, and its value is the max of
                # the scores with the max value masked out. If that
                # second max fell to ≤ thr, BOTH crossers were fp32-equal
                # to the row max (tie) and both append with its key —
                # lower column first, preserving the packed tie order.
                # The group row-max is computed HERE only — the common
                # path gets single-crosser values from the fused vsum.
                scores = scores_all[lo : lo + gb]  # [gb, BT]
                m_f = jnp.max(scores, axis=1, keepdims=True)
                m_key = _enc_key(m_f, int_exact)
                ismax = scores == m_f
                colg = jax.lax.broadcasted_iota(
                    jnp.int32, scores.shape, 1
                )
                colmin = jnp.min(
                    jnp.where(ismax, colg, 1 << 20), axis=1, keepdims=True
                )
                v2 = jnp.max(
                    jnp.where(ismax, masked, scores), axis=1, keepdims=True
                )
                val2 = jnp.where(
                    v2 > thr_scr[sl], _enc_key(v2, int_exact), m_key
                )
                col_a = jnp.where(cnt_row == 2, colmin, col_row)
                append(
                    jnp.where(cnt_row >= 1, m_key, _INT_MIN),
                    row0 + col_a,
                )
                append(
                    jnp.where(cnt_row == 2, val2, _INT_MIN),
                    row0 + (col_row - colmin),
                )

            @pl.when(jnp.logical_not(pair))
            def _():
                @pl.when(jnp.any(cnt_row == 1))
                def _():
                    # at most one crosser per row — its exact value is
                    # the fused value-sum (one nonzero addend), its
                    # column the harvest sum itself: NO [gb, BT] pass
                    append(
                        jnp.where(
                            cnt_row == 1,
                            _enc_key(vsum[sl], int_exact),
                            _INT_MIN,
                        ),
                        row0 + col_row,
                    )


def _kernel(
    nr_ref, q_ref, emb_ref, out_ref, rv, ri,
    *, k, block_t, dma_span,
):
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        rv[:] = jnp.full_like(rv, NEG)
        ri[:] = jnp.full_like(ri, 2**30)

    num_real = nr_ref[0]
    for s in range(dma_span):  # see the packed kernel's DMA-span note
        scores = _block_scores(
            q_ref[:], emb_ref[s * block_t : (s + 1) * block_t]
        )  # [B, BT] fp32
        row0 = (i * dma_span + s) * block_t
        gidx = row0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        # Only blocks straddling the real/padding boundary pay the mask.
        scores = jax.lax.cond(
            row0 + block_t > num_real,
            lambda sc, gi=gidx: jnp.where(gi < num_real, sc, NEG),
            lambda sc: sc,
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
        # single packed output (see _packed_kernel): fp32 values are
        # stored bit-cast so both halves share one int32 block
        out_ref[:, :k] = jax.lax.bitcast_convert_type(rv[:], jnp.int32)
        out_ref[:, k:] = ri[:]


# ------------------------------------------------ two-phase block-max (r5)
#
# The r5 bisect (docs/kernels.md) proved the streaming-harvest
# architecture floor-bound at the large-batch headline shape: its
# matmul runs at the XLA floor, but the exactness machinery
# (consolidation + the k-pass fallback) costs ~81 ms of PRESENCE at
# B=4096 — Mosaic serializes the conditional bodies into every block's
# pipeline whether or not they execute. This variant has NO
# data-dependent branches at all. Two kernels + plain-XLA glue, all in
# one jit:
#
#   phase 1  streams the index once and keeps, per query row, the
#            top-k BLOCKS by packed block max (matmul + one fused
#            reduce + an O(k) running-buffer update — nothing else);
#   mid      lays the B·k (row, block) pairs out block-sorted in
#            pair_tile-sized tiles (argsort/cumsum/scatter — ~40k
#            elements, noise);
#   phase 2  re-scores ONLY those pairs' blocks (gathered q tile vs
#            one emb block per grid step — B·k·bt·D MACs, ~1/60th of
#            phase 1 at the headline shape) and extracts each pair's
#            block-local top-k with unconditional packed passes;
#   merge    per row, sorts the k·k candidates by (key desc, global
#            row asc) — bit-identical tie semantics to the streaming
#            packed kernel (earliest block, lowest column).
#
# EXACTNESS. For any row, order elements by the packed key (quantized
# score; exact integers on int8), ties to earlier block / lower
# column. Claim: every top-k element's block is among the row's top-k
# blocks ordered by (packed block max, earlier block). Proof: let e be
# an element and A any block ranked strictly above e's block B. Then
# either max(A) has a strictly greater quantized score than max(B) >=
# q(e), or equal score and A earlier than B — in both cases the
# element attaining max(A) precedes e in the element order, and those
# elements are distinct across distinct A. So if B ranked below k-th,
# at least k elements precede e, i.e. e is not in the top-k. Hence
# phase 2's union of per-pair top-k contains the true top-k, and the
# merge selects them in contract order.

_TWOPHASE_MIN_BATCH = 1024  # measured crossover vs 512-row chunking


def pick_twophase_block_t(
    t_pad: int, batch: int, k: int, d: int, itemsize: int,
    variant: str = "packed",
) -> Optional[int]:
    """block_t for the two-phase kernel, or None if the streaming kernel
    should serve this shape. Policy (r5, measured on v5e at the B=4096
    headline shape — docs/kernels.md):
      * two-phase pays only at large batches (26.4 vs 28.1 ms at
        B=4096; at B<=512 the chunked streaming kernel wins);
      * the LARGEST feasible block wins for phase 1 (bt=4096: 305 grid
        steps = 26.4 ms; bt=2048: 610 steps = 38.7 ms — per-step fixed
        costs, not tile size, bind a branch-free kernel);
      * phase-1 fp32 scores tile B*bt*4 must fit the 100 MiB VMEM
        ceiling next to q + 2 pipelined emb blocks;
      * k <= nblocks <= 4096 (phase-2 packs block ids in 12 bits)."""
    if variant != "packed" or batch < _TWOPHASE_MIN_BATCH or k > 128:
        return None
    budget = 72 * 1024 * 1024
    for bt in (4096, 2048, 1024, 512):
        if t_pad % bt:
            continue
        nb = t_pad // bt
        if not (k <= nb <= _IDX_MASK + 1):
            continue
        if batch * bt * 4 + 2 * bt * d * itemsize > budget:
            continue
        return bt
    return None


def _blockmax_kernel(
    nr_ref, q_ref, emb_ref, out_ref, rbk, *, k, block_t, span, int_exact
):
    """Phase 1: running top-k of packed block maxes, `span` blocks per
    grid step (one emb DMA of span*block_t rows — amortizes per-step
    fixed costs the same way the streaming kernel's dma_span does).
    Branch-free except the first/last-step init/copy."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    b = out_ref.shape[0]

    @pl.when(i == 0)
    def _():
        # distinct sub-sink init keys: uniqueness keeps the min-slot
        # replacement one-hot; the caller's validity mask filters them
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
        rbk[:] = _INT_MIN + lane0

    num_real = nr_ref[0]
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, block_t), 1)
    low = (
        jnp.int32(-_INT_SCORE_CLIP) if int_exact else jnp.float32(NEG)
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    for s in range(span):
        blk = i * span + s
        scores = _block_scores(
            q_ref[:],
            emb_ref[s * block_t : (s + 1) * block_t, :],
            raw_int=int_exact,
        )
        row0 = blk * block_t
        # max FIRST, encode the [B, 1] result AFTER: key quantization
        # is monotone, so enc(max(scores)) == max(enc(scores)) — the
        # full-tile encode walks (+~8 ms/batch at B=4096, r5 phase
        # bisect) never happen. Padding masks in raw score space with
        # a [1, BT] broadcast iota (a full-tile [B, BT] iota is a
        # materialized walk; the broadcast compare rides the reduce).
        masked = jnp.where(row0 + col1 < num_real, scores, low)
        bmax = jnp.max(masked, axis=1, keepdims=True)  # [B, 1] raw max
        p1 = _enc_key(bmax, int_exact) | (_IDX_MASK - blk)
        # (a fully padded block yields the sink key on float paths /
        # the clip-floor key on int8 — either loses to every real
        # block, and phase 2's own column masking sinks its candidates
        # regardless)
        cur = rbk[:]
        minv = jnp.min(cur, axis=1, keepdims=True)
        # first slot holding the min (stored keys are unique, but the
        # iota-min form stays one-hot even if that invariant ever broke)
        slot = jnp.min(
            jnp.where(cur == minv, lane, k), axis=1, keepdims=True
        )
        rbk[:] = jnp.where((lane == slot) & (p1 > minv), p1, cur)

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[:] = rbk[:]


def _pair_topk_kernel(
    nr_ref, sb_ref, qg_ref, emb_ref, out_ref, *, k, block_t, int_exact
):
    """Phase 2: one (query-tile, block) pair tile per grid step — the
    step's emb block is chosen by the prefetched schedule, so Mosaic
    skips the re-DMA when consecutive steps share a block (the mid-pass
    sorts pairs by block to maximize that). Unconditional k-pass packed
    extraction; no thresholds, no branches."""
    num_real = nr_ref[0]
    i = pl.program_id(0)
    row0 = sb_ref[i] * block_t
    scores = _block_scores(qg_ref[:], emb_ref[:], raw_int=int_exact)
    # [1, BT] broadcast iota: the column bits and the padding mask ride
    # the key walk instead of materializing a [P, BT] iota
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, block_t), 1)
    sink = _INT_SINK if int_exact else _NEG_SINK
    keys = jnp.where(
        row0 + col1 < num_real,
        _enc_key(scores, int_exact) | (_IDX_MASK - col1),
        sink | (_IDX_MASK - col1),  # in-range ids, never-winning keys
    )
    kv, cols = _packed_extract(keys, k)
    out_ref[:, :k] = kv
    out_ref[:, k:] = row0 + cols


def fused_score_topk_twophase(
    q: jax.Array,  # [B, D] queries
    emb: jax.Array,  # [T_pad, D] index rows (T_pad % block_t == 0)
    k: int,
    num_real,  # int or traced int32 scalar
    block_t: int = 2048,
    pair_tile: int = 128,
    span: int = 1,  # phase-1 blocks per grid step (one DMA of
    #                 span*block_t rows) — amortizes per-step fixed
    #                 costs; enable only on measured wins
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k (values, row indices) of q @ emb.T — the r5 two-phase
    block-max architecture (see the section comment above). Selection
    semantics are IDENTICAL to ``fused_score_topk(variant='packed')``:
    11-mantissa-bit quantized keys on float paths, unconditionally
    exact integer keys on int8, ties to the earliest block then the
    lowest column. Requires k <= nblocks = T_pad/block_t <= 4096."""
    b, d = q.shape
    t_pad = emb.shape[0]
    if t_pad % (block_t * span):
        raise ValueError(
            f"T_pad {t_pad} not a multiple of block_t*span "
            f"{block_t}*{span}"
        )
    nblocks = t_pad // block_t
    if block_t > _IDX_MASK + 1 or nblocks > _IDX_MASK + 1:
        raise ValueError(
            f"twophase needs block_t and nblocks <= {_IDX_MASK + 1}"
        )
    if k > nblocks:
        raise ValueError(f"twophase needs k <= nblocks ({k} > {nblocks})")
    int_exact = emb.dtype == jnp.int8
    if int_exact:
        if q.dtype != jnp.int8:
            q = quantize_queries_int8(q)
    else:
        q = q.astype(emb.dtype)
    nr = jnp.asarray(num_real, jnp.int32).reshape((1,))

    # ---- phase 1
    p1_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks // span,),
        in_specs=[
            pl.BlockSpec(
                (b, d), lambda i, nr: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_t * span, d), lambda i, nr: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, k), lambda i, nr: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((b, k), jnp.int32)],
    )
    rbk = pl.pallas_call(
        functools.partial(
            _blockmax_kernel, k=k, block_t=block_t, span=span,
            int_exact=int_exact,
        ),
        grid_spec=p1_spec,
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * t_pad,
            bytes_accessed=t_pad * d * emb.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(nr, q, emb)

    # ---- mid-pass: block-sorted pair tiles (plain XLA, ~B*k elements)
    sink_base = _INT_SINK if int_exact else _NEG_SINK
    cleared = rbk & ~jnp.int32(_IDX_MASK)
    blk = _IDX_MASK - (rbk & _IDX_MASK)
    valid = (cleared != sink_base) & (cleared != _INT_MIN)
    npairs = b * k
    blk_flat = jnp.where(valid, blk, nblocks).reshape(npairs)
    row_flat = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, k)
    ).reshape(npairs)
    perm = jnp.argsort(blk_flat)  # stable
    sblk = blk_flat[perm]
    srow = row_flat[perm]
    pidx = jnp.arange(npairs, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sblk[1:] != sblk[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, pidx, 0))
    rank = pidx - run_start
    counts = jnp.bincount(sblk, length=nblocks + 1)
    steps_per_block = (counts[:nblocks] + pair_tile - 1) // pair_tile
    base_step = jnp.concatenate(
        [
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(steps_per_block).astype(jnp.int32),
        ]
    )
    # static step bound: every nonempty block costs <= 1 partial tile
    # beyond its exact pair_tile quota
    nstep = min(nblocks, npairs) + -(-npairs // pair_tile)
    in_range = sblk < nblocks
    step_of = jnp.where(
        in_range,
        base_step[jnp.minimum(sblk, nblocks - 1)] + rank // pair_tile,
        nstep,  # dropped by the scatters below
    )
    pos = jnp.where(
        in_range, step_of * pair_tile + rank % pair_tile,
        nstep * pair_tile,
    )
    rows_padded = (
        jnp.zeros((nstep * pair_tile,), jnp.int32)
        .at[pos].set(srow, mode="drop")
    )
    sb = (
        jnp.zeros((nstep,), jnp.int32)
        .at[step_of].set(jnp.minimum(sblk, nblocks - 1), mode="drop")
    )
    qg = q[rows_padded]  # [nstep * pair_tile, D]

    # ---- phase 2
    p2_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec(
                (pair_tile, d), lambda i, nr, sb: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_t, d), lambda i, nr, sb: (sb[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (pair_tile, 2 * k), lambda i, nr, sb: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[],
    )
    out2 = pl.pallas_call(
        functools.partial(
            _pair_topk_kernel, k=k, block_t=block_t, int_exact=int_exact
        ),
        grid_spec=p2_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nstep * pair_tile, 2 * k), jnp.int32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nstep * pair_tile * d * block_t,
            bytes_accessed=nstep * block_t * d * emb.dtype.itemsize
            + nstep * pair_tile * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(nr, sb, qg, emb)

    # ---- merge: k*k candidates per row, contract tie order
    safe_pos = jnp.minimum(pos, nstep * pair_tile - 1)
    cand = out2[safe_pos]  # [npairs, 2k], sorted-pair order
    ck = jnp.where(in_range[:, None], cand[:, :k], sink_base)
    cr = jnp.where(in_range[:, None], cand[:, k:], 0)
    inv = jnp.zeros((npairs,), jnp.int32).at[perm].set(pidx)
    ck = ck[inv].reshape(b, k * k)
    cr = cr[inv].reshape(b, k * k)
    # ascending (key, -row) == reversed (key desc, row asc): equal
    # quantized keys resolve to the smallest global row — i.e. the
    # earliest block then the lowest column, exactly like the
    # streaming kernel's slot order
    skey, _, srows = jax.lax.sort(
        (ck, -cr, cr), num_keys=2, dimension=1, is_stable=False
    )
    top_keys = skey[:, ::-1][:, :k]
    top_rows = srows[:, ::-1][:, :k]
    return _dec_val(top_keys, int_exact), top_rows


DEFAULT_GROUP = 256  # harvest row-group size (see _packed_kernel)

# Largest fp32 scores tile [B, BT] that still pipelines well on v5e —
# MEASURED (r3 bisect, docs/kernels.md): B=256/bt=4096 (1M elems) runs
# 3.45 ms at T=1.25M; B=512/bt=4096 (2M elems) collapses to 7-12.8 ms
# while B=512/bt=2048 (1M) runs 5.17 ms = 99k QPS. The binding resource
# at large B is the scores-tile working set, NOT per-block DMA issue.
_SCORE_TILE_ELEMS = 1 << 20


def pick_kernel_config(
    t_pad: int, batch: int, d: int, itemsize: int, packed: bool = True
) -> "tuple[Optional[int], int]":
    """(block_t, group) for the streaming kernel; (None, _) if no
    worthwhile block size exists (tiny index → XLA path is fine).

    Policy, measured on v5e (r3 bisect table in docs/kernels.md):
      * block_t = largest of (4096…512) dividing t_pad whose fp32
        scores tile batch*block_t stays ≤ 1M elements (the measured
        pipelining knee) and fits the VMEM model;
      * at block_t=4096 the batch must NOT be split into row groups
        (B=512 split into 2×256 measured 12.8 ms vs 7.0 unsplit), so
        group = min(batch, 512); at block_t ≤ 2048 two groups of ≤256
        are fine and slightly better (5.17 ms vs 6.28 single-group).

    VMEM model (kernel runs with vmem_limit_bytes=64 MiB; v5e/v5p carry
    128 MiB physical): fp32 scores [B, BT] + fallback key scratch
    [G, BT] + ~2 [G, BT] harvest temporaries + 2 pipelined emb blocks
    [BT, D]. The exact variant skips the key/harvest buffers. 4096 cap
    keeps the packed variant's 12 index bits sufficient."""
    budget = 40 * 1024 * 1024
    chosen = None
    for bt in (4096, 2048, 1024, 512):
        if t_pad % bt:
            continue
        g = min(batch, 512 if bt == 4096 else DEFAULT_GROUP)
        per_bt = (batch + 3 * g) * 4 if packed else 2 * batch * 4
        if per_bt * bt + 2 * bt * d * itemsize > budget:
            continue
        if chosen is None:
            chosen = (bt, g)  # largest feasible — the fallback
        if batch * bt <= _SCORE_TILE_ELEMS:
            return bt, g
    if chosen is None:
        return None, min(batch, DEFAULT_GROUP)
    return chosen


def pick_block_t(
    t_pad: int, batch: int, d: int, itemsize: int, packed: bool = True,
    group: Optional[int] = None,
) -> Optional[int]:
    """Back-compat wrapper: the block_t of pick_kernel_config."""
    del group
    return pick_kernel_config(t_pad, batch, d, itemsize, packed)[0]


def fused_score_topk(
    q: jax.Array,  # [B, D] queries
    emb: jax.Array,  # [T_pad, D] index rows (T_pad % block_t == 0)
    k: int,
    num_real,  # int or traced int32 scalar: rows >= num_real are padding
    block_t: int = 4096,
    interpret: bool = False,
    variant: str = "packed",  # packed (fast; 11-bit selector keys for
    #                           float indexes, EXACT integer keys for
    #                           int8) | exact (full-precision fp32 keys)
    group: Optional[int] = None,  # rows per gated extraction group
    slots: int = 64,  # deferred-merge candidate buffer slots per group
    dma_span: int = 1,  # emb chunks of block_t streamed per grid step —
    #                     amortizes per-transfer DMA issue cost; the
    #                     harvest still walks block_t-column chunks
) -> Tuple[jax.Array, jax.Array]:
    """Top-k (values, row indices) of q @ emb.T without materializing the
    score matrix.

    `emb` may be bfloat16 (halves HBM traffic; scores still accumulate in
    float32 on the MXU) or int8 (quarters it vs float32 — 4x index rows
    per chip; EXACT int32 MXU accumulation rescaled to cosine range, and
    float queries are 127-scale quantized here automatically). Selection
    precision: the int8 packed path is UNCONDITIONALLY exact (integer
    keys — agrees bit-for-bit with lax.top_k over the dequantized
    scores); float packed paths select on 11-mantissa-bit keys (see the
    packed-variant comment for the trade; `variant='exact'` escapes it).
    """
    b, d = q.shape
    t_pad = emb.shape[0]
    if t_pad % (block_t * dma_span):
        raise ValueError(
            f"T_pad {t_pad} not a multiple of block_t*dma_span "
            f"{block_t}*{dma_span}"
        )
    if variant == "packed" and block_t > _IDX_MASK + 1:
        raise ValueError(f"packed variant needs block_t <= {_IDX_MASK + 1}")
    nblocks = t_pad // (block_t * dma_span)
    # default group follows the measured policy (pick_kernel_config):
    # never split the batch at block_t=4096
    group = min(b, group or (512 if block_t >= 4096 else DEFAULT_GROUP))
    ngroups = -(-b // group)
    # the consolidation schedule guarantees >= k free buffer entries
    # between merges ONLY when slots >= k; smaller buffers would silently
    # drop candidates appended past `cap` (one-hot slot writes miss)
    slots = max(slots, k)
    cap = slots + k
    # int8 + packed selects on EXACT integer keys (see the r4 note above
    # _enc_key): zero quantization, bit-identical to lax.top_k over the
    # dequantized scores. Float operands keep the 11-bit key trade.
    int_exact = variant == "packed" and emb.dtype == jnp.int8
    kernel = functools.partial(
        _packed_kernel if variant == "packed" else _kernel,
        k=k,
        block_t=block_t,
        dma_span=dma_span,
    )
    if variant == "packed":
        kernel = functools.partial(
            kernel, slots=slots, group=group, int_exact=int_exact
        )
    if emb.dtype == jnp.int8:
        if q.dtype != jnp.int8:
            q = quantize_queries_int8(q)
    else:
        q = q.astype(emb.dtype)
    nr = jnp.asarray(num_real, jnp.int32).reshape((1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        # index maps take (grid idx, scalar-prefetch ref)
        in_specs=[
            pl.BlockSpec((b, d), lambda i, nr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_t * dma_span, d),
                lambda i, nr: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        # ONE output block: a second constant-index output forces a
        # per-grid-step write-back (measured +9.2 ms/batch at B=4096)
        out_specs=pl.BlockSpec(
            (b, 2 * k), lambda i, nr: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=(
            [
                pltpu.VMEM((b, k), jnp.int32),  # rv: running packed keys
                pltpu.VMEM((b, k), jnp.int32),  # ri: running global rows
                # thr: running k-th in score space (int32 on the int8
                # exact path, fp32 otherwise)
                pltpu.VMEM(
                    (b, 1), jnp.int32 if int_exact else jnp.float32
                ),
                # fallback keys: ONE row-group wide (groups run
                # sequentially, so the scratch is reused — this is what
                # keeps block_t at 4096 for large B)
                pltpu.VMEM((group, block_t), jnp.int32),
                pltpu.VMEM((b, cap), jnp.int32),  # candidate keys buffer
                pltpu.VMEM((b, cap), jnp.int32),  # candidate global rows
                # per-group [next slot, fallback done]
                pltpu.SMEM((ngroups, 2), jnp.int32),
            ]
            if variant == "packed"
            else [
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.int32),
            ]
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 2 * k), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * t_pad,
            bytes_accessed=t_pad * d * emb.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        # The harvest's fused compare+encode keeps [B, BT]-sized
        # temporaries on the compiler's stack alongside the scores and the
        # (rare-path) fallback key scratch; v5e/v5p have 128 MiB of
        # physical VMEM, so lift the conservative 16 MiB default rather
        # than shrink block_t (smaller blocks cost real throughput).
        # 100 MiB admits the full-batch B=4096 scores tile (33.5 MiB) —
        # the single-dispatch headline shape (r4).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(nr, q, emb)
    keys, rows = out[:, :k], out[:, k:]
    if variant == "packed":
        return _dec_val(keys, int_exact), rows
    return jax.lax.bitcast_convert_type(keys, jnp.float32), rows
