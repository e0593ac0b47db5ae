"""Pallas fused RNN kernels — the native-tier encoder kernels
(SURVEY.md §2.4 item (a): replaces the reference's tf.nn.dynamic_rnn).

Two generations:

* `scan_layer`/`rnn_encode` (r3): forward-only scan over PRE-COMPUTED
  x-side pre-activations (the hoisted form in towers.py), W_h + carry
  pinned in VMEM. Ties lax.scan — kept for the fwd-only consumers and
  the multichip dryrun.
* `rnn_layer` (r4): the TRAINING path — a fused full layer
  (x-projection + recurrence) with a custom VJP whose backward is a
  second fused reverse-time kernel. See the design block above
  `_fwd_core` for the cost model; measured impact in BASELINE.md's r4
  training roofline (the four XLA scan while-loops were 59% of the
  train step's device time; 2.6-2.9x steps/s end to end).

Numerics: identical update rule to the lax.scan path (bfloat16 matmul
operands, float32 accumulation and carry); forward asserted EQUAL in
tests/test_ops_rnn.py, gradients within ~1e-2 relative (bf16-operand
gradient matmuls where XLA autodiff upcasts to fp32).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPUTE_DTYPE = jnp.bfloat16


def _gru_kernel(ax_ref, m_ref, wh_ref, ys_ref, fin_ref, h_scr):
    from sse_tpu.models.towers import gru_cell

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    gates = ax_ref[0] + jnp.dot(
        h.astype(_COMPUTE_DTYPE), wh_ref[:], preferred_element_type=jnp.float32
    )
    h_new = gru_cell(gates, h)
    m = jnp.swapaxes(m_ref[0], 0, 1)  # [1, B] -> [B, 1]
    h = m * h_new + (1.0 - m) * h
    h_scr[:] = h
    ys_ref[0] = h.astype(_COMPUTE_DTYPE)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        fin_ref[:] = h


def _lstm_kernel(ax_ref, m_ref, wh_ref, ys_ref, fin_ref, h_scr, c_scr):
    from sse_tpu.models.towers import lstm_cell

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h, c = h_scr[:], c_scr[:]
    gates = ax_ref[0] + jnp.dot(
        h.astype(_COMPUTE_DTYPE), wh_ref[:], preferred_element_type=jnp.float32
    )
    h_new, c_new = lstm_cell(gates, h, c)
    m = jnp.swapaxes(m_ref[0], 0, 1)  # [1, B] -> [B, 1]
    h = m * h_new + (1.0 - m) * h
    c = m * c_new + (1.0 - m) * c
    h_scr[:] = h
    c_scr[:] = c
    ys_ref[0] = h.astype(_COMPUTE_DTYPE)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        fin_ref[:] = h


def scan_layer(
    ax: jax.Array,  # [L, B, G*H] float32 combined x-side pre-activations
    mask: jax.Array,  # [L, 1, B] float32 1/0 validity (lane-major for tiling)
    wh: jax.Array,  # [H, G*H]
    cell: str,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One recurrent layer. Returns (ys [L, B, H] compute dtype,
    final h [B, H] float32)."""
    l, b, gh = ax.shape
    h = wh.shape[0]
    kernel = _gru_kernel if cell == "gru" else _lstm_kernel
    scratch = [pltpu.VMEM((b, h), jnp.float32)]
    if cell == "lstm":
        scratch.append(pltpu.VMEM((b, h), jnp.float32))
    ys, fin = pl.pallas_call(
        kernel,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((1, b, gh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, gh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((l, b, h), _COMPUTE_DTYPE),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * l * b * h * gh,
            bytes_accessed=ax.size * 4 + wh.size * wh.dtype.itemsize,
            transcendentals=4 * l * b * h,
        ),
        interpret=interpret,
    )(ax, mask, wh.astype(_COMPUTE_DTYPE))
    return ys, fin


# ===================================================================
# Fused-layer kernels with a custom VJP (r4) — the TRAINING path.
#
# The r3 kernels above only replace the forward h-recurrence and tie
# lax.scan. Profiling the real train step (BASELINE.md r4 roofline) put
# 59% of device time in the four scan while-loops (src/tgt fwd + bwd),
# split between per-iteration loop overhead and HBM traffic: XLA
# materializes the [T, B, G·H] fp32 pre-activations, re-reads them every
# step, and saves several per-step residual blocks for the backward
# pass. These kernels fuse the ENTIRE layer — x-projection, recurrence,
# and (in the VJP) the full backward — so HBM touches only xs/ys/dxs
# (bf16) and the weights once:
#
#   fwd:  gates_t = xs_t @ Wx + b + h_{t-1} @ Wh computed in-kernel;
#         Wx, Wh, b pinned in VMEM for all T steps; ys is the ONLY
#         residual the backward needs (gates are recomputed).
#   bwd:  reverse grid; gate recomputation (2 matmuls) depends only on
#         xs/ys — OFF the serialized dh chain, so it pipelines ahead;
#         the critical path is the elementwise cell-backward plus ONE
#         [B, G·H] x [G·H, H] matmul; dWx/dWh/db accumulate in VMEM and
#         are written once at t=0.
#
# Numerics: forward is bit-identical to the lax.scan path (same update
# rule, same bf16 operand / fp32 accumulation policy). Backward
# recomputes gates from the bf16 ys stream — exactly the value the
# forward matmul consumed (it casts h to bf16 too) — so recomputed
# gates match the forward bit-for-bit; gradient matmuls run bf16-operand
# /fp32-accum where XLA's autodiff upcasts to fp32 (measured ~1e-3
# relative on grads, below the step's own bf16 operand noise;
# tests/test_ops_rnn.py pins tolerances).
# ===================================================================


def _mask_col(m_ref):
    """[1, 1, B] mask block -> [B, 1] column."""
    return jnp.swapaxes(m_ref[0], 0, 1)


def _fwd_core(
    xs_ref, m_ref, wx_ref, wh_ref, b_ref, ys_ref, fin_ref, cs_ref,
    h_scr, c_scr, cell,
):
    from sse_tpu.models.towers import gru_cell, lstm_cell

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        if cell == "lstm":
            c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    gates = (
        jnp.dot(xs_ref[0], wx_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
        + jnp.dot(
            h.astype(_COMPUTE_DTYPE), wh_ref[:],
            preferred_element_type=jnp.float32,
        )
    )
    m = _mask_col(m_ref)
    if cell == "gru":
        h_new = gru_cell(gates, h)
        h = m * h_new + (1.0 - m) * h
    else:
        c = c_scr[:]
        h_new, c_new = lstm_cell(gates, h, c)
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        c_scr[:] = c
        cs_ref[0] = c.astype(_COMPUTE_DTYPE)
    h_scr[:] = h
    ys_ref[0] = h.astype(_COMPUTE_DTYPE)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        fin_ref[:] = h


def _fwd_gru_kernel(xs, m, wx, wh, b, ys, fin, h_scr):
    _fwd_core(xs, m, wx, wh, b, ys, fin, None, h_scr, None, "gru")


def _fwd_lstm_kernel(xs, m, wx, wh, b, ys, fin, cs, h_scr, c_scr):
    _fwd_core(xs, m, wx, wh, b, ys, fin, cs, h_scr, c_scr, "lstm")


def _bwd_kernel(
    xs_ref, ys_ref, cs_ref, m_ref, wx_ref, wh_ref, b_ref, wxt_ref, wht_ref,
    dys_ref, dfin_ref,
    dxs_ref, dwx_ref, dwh_ref, db_ref,
    dh_scr, dc_scr, dwx_scr, dwh_scr, db_scr, *, cell,
):
    """Reverse-time fused backward. Grid step i processes t = T-1-i.
    ys_ref/cs_ref blocks are indexed at t-1 (clamped): the PREVIOUS
    step's state, i.e. the h the forward matmul consumed (bf16)."""
    i = pl.program_id(0)
    t_is_last = i == 0  # t == T-1
    t_is_first = i == pl.num_programs(0) - 1  # t == 0

    @pl.when(i == 0)
    def _():
        dh_scr[:] = dfin_ref[:]
        if cell == "lstm":
            dc_scr[:] = jnp.zeros_like(dc_scr)
        dwx_scr[:] = jnp.zeros_like(dwx_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    zero_prev = t_is_first  # h_{-1} = c_{-1} = 0
    h_prev_b = jnp.where(zero_prev, 0, 1).astype(_COMPUTE_DTYPE) * ys_ref[0]
    gates = (
        jnp.dot(xs_ref[0], wx_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
        + jnp.dot(h_prev_b, wh_ref[:], preferred_element_type=jnp.float32)
    )
    m = _mask_col(m_ref)
    h_prev = h_prev_b.astype(jnp.float32)
    dh_t = dh_scr[:] + dys_ref[0].astype(jnp.float32)
    g = m * dh_t  # d h_new
    H = dh_scr.shape[1]
    if cell == "gru":
        z_pre, r_pre, n_pre = (
            gates[:, :H], gates[:, H : 2 * H], gates[:, 2 * H :]
        )
        z = jax.nn.sigmoid(z_pre)
        r = jax.nn.sigmoid(r_pre)
        n = jnp.tanh(n_pre * r)
        # h_new = (1-z)·n + z·h_prev
        dn = g * (1.0 - z)
        dz_pre = g * (h_prev - n) * z * (1.0 - z)
        dtanh = dn * (1.0 - n * n)
        dn_pre = dtanh * r
        dr_pre = dtanh * n_pre * r * (1.0 - r)
        dgates = jnp.concatenate([dz_pre, dr_pre, dn_pre], axis=1)
        dh_prev = (1.0 - m) * dh_t + g * z
    else:
        c_prev_b = (
            jnp.where(zero_prev, 0, 1).astype(_COMPUTE_DTYPE) * cs_ref[0]
        )
        c_prev = c_prev_b.astype(jnp.float32)
        i_pre, f_pre, g_pre, o_pre = (
            gates[:, :H], gates[:, H : 2 * H],
            gates[:, 2 * H : 3 * H], gates[:, 3 * H :],
        )
        si = jax.nn.sigmoid(i_pre)
        sf = jax.nn.sigmoid(f_pre + 1.0)
        tg = jnp.tanh(g_pre)
        so = jax.nn.sigmoid(o_pre)
        c_new = sf * c_prev + si * tg
        tc = jnp.tanh(c_new)
        dc_t = dc_scr[:]
        dc_new = m * dc_t + g * so * (1.0 - tc * tc)
        do_pre = g * tc * so * (1.0 - so)
        df_pre = dc_new * c_prev * sf * (1.0 - sf)
        di_pre = dc_new * tg * si * (1.0 - si)
        dg_pre = dc_new * si * (1.0 - tg * tg)
        dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=1)
        dh_prev = (1.0 - m) * dh_t
        dc_scr[:] = (1.0 - m) * dc_t + dc_new * sf
    dgates_b = dgates.astype(_COMPUTE_DTYPE)
    dh_scr[:] = dh_prev + jnp.dot(
        dgates_b, wht_ref[:], preferred_element_type=jnp.float32
    )
    dxs_ref[0] = jnp.dot(
        dgates_b, wxt_ref[:], preferred_element_type=jnp.float32
    ).astype(_COMPUTE_DTYPE)
    # weight-gradient accumulation — off the dh critical path
    dwx_scr[:] += jax.lax.dot_general(
        xs_ref[0], dgates_b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwh_scr[:] += jax.lax.dot_general(
        h_prev_b, dgates_b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_scr[:] += jnp.sum(dgates, axis=0, keepdims=True)

    @pl.when(t_is_first)
    def _():
        dwx_ref[:] = dwx_scr[:]
        dwh_ref[:] = dwh_scr[:]
        db_ref[:] = db_scr[:]


def _layer_fwd_pallas(xs, mask, wx, wh, b, cell, interpret=False):
    """(ys bf16 [T,B,H], fin f32 [B,H], cs bf16 [T,B,H] | None)."""
    t, bsz, e = xs.shape
    h = wh.shape[0]
    gh = wh.shape[1]
    n_out = 3 if cell == "lstm" else 2
    kernel = _fwd_lstm_kernel if cell == "lstm" else _fwd_gru_kernel
    scratch = [pltpu.VMEM((bsz, h), jnp.float32)]
    if cell == "lstm":
        scratch.append(pltpu.VMEM((bsz, h), jnp.float32))
    out_specs = [
        pl.BlockSpec((1, bsz, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bsz, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bsz, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, bsz, h), _COMPUTE_DTYPE),
        jax.ShapeDtypeStruct((bsz, h), jnp.float32),
        jax.ShapeDtypeStruct((t, bsz, h), _COMPUTE_DTYPE),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, bsz, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bsz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, gh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, gh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs[:n_out],
        out_shape=out_shape[:n_out],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * bsz * (e + h) * gh,
            bytes_accessed=xs.size * 2 + 2 * t * bsz * h * 2,
            transcendentals=4 * t * bsz * h,
        ),
        interpret=interpret,
    )(
        xs.astype(_COMPUTE_DTYPE),
        mask,
        wx.astype(_COMPUTE_DTYPE),
        wh.astype(_COMPUTE_DTYPE),
        b.reshape(1, -1).astype(jnp.float32),
    )
    if cell == "lstm":
        ys, fin, cs = outs
    else:
        (ys, fin), cs = outs, None
    return ys, fin, cs


def _layer_bwd_pallas(
    xs, ys, cs, mask, wx, wh, b, dys, dfin, cell, interpret=False
):
    t, bsz, e = xs.shape
    h = wh.shape[0]
    gh = wh.shape[1]
    kernel = functools.partial(_bwd_kernel, cell=cell)
    wx_c = wx.astype(_COMPUTE_DTYPE)
    wh_c = wh.astype(_COMPUTE_DTYPE)
    if cs is None:
        cs = ys  # placeholder block stream (GRU kernel never reads it)
    tm1 = lambda i: (jnp.maximum(t - 2 - i, 0), 0, 0)  # noqa: E731
    rev = lambda i: (t - 1 - i, 0, 0)  # noqa: E731
    full = lambda i: (0, 0)  # noqa: E731
    dxs, dwx, dwh, db = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, bsz, e), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, h), tm1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, h), tm1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bsz), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((e, gh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, gh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, e), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, h), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, h), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bsz, e), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((e, gh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, gh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gh), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, bsz, e), _COMPUTE_DTYPE),
            jax.ShapeDtypeStruct((e, gh), jnp.float32),
            jax.ShapeDtypeStruct((h, gh), jnp.float32),
            jax.ShapeDtypeStruct((1, gh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, h), jnp.float32),  # dh carry
            pltpu.VMEM((bsz, h), jnp.float32),  # dc carry (lstm)
            pltpu.VMEM((e, gh), jnp.float32),  # dwx accumulator
            pltpu.VMEM((h, gh), jnp.float32),  # dwh accumulator
            pltpu.VMEM((1, gh), jnp.float32),  # db accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * t * bsz * (e + h) * gh,
            bytes_accessed=xs.size * 2 * 3,
            transcendentals=4 * t * bsz * h,
        ),
        interpret=interpret,
    )(
        xs.astype(_COMPUTE_DTYPE),
        ys,
        cs,
        mask,
        wx_c,
        wh_c,
        b.reshape(1, -1).astype(jnp.float32),
        wx_c.T,
        wh_c.T,
        dys.astype(_COMPUTE_DTYPE),
        dfin.astype(jnp.float32),
    )
    return dxs, dwx, dwh, db.reshape(b.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def rnn_layer(xs, mask, wx, wh, b, cell, interpret=False):
    """One fused recurrent layer, differentiable. xs [T, B, E] (any float
    dtype; consumed as bf16 exactly like the lax.scan path), mask
    [T, 1, B] fp32. Returns (ys [T, B, H] bf16, fin [B, H] fp32) — ys
    feeds stacked layers and mean/attention readouts, fin the final
    readout. Forward is bit-identical to towers._rnn_layer."""
    ys, fin, _ = _layer_fwd_pallas(xs, mask, wx, wh, b, cell, interpret)
    return ys, fin


def _rnn_layer_fwd(xs, mask, wx, wh, b, cell, interpret):
    ys, fin, cs = _layer_fwd_pallas(xs, mask, wx, wh, b, cell, interpret)
    return (ys, fin), (xs, ys, cs, mask, wx, wh, b)


def _rnn_layer_bwd(cell, interpret, res, cts):
    xs, ys, cs, mask, wx, wh, b = res
    dys, dfin = cts
    dxs, dwx, dwh, db = _layer_bwd_pallas(
        xs, ys, cs, mask, wx, wh, b, dys, dfin, cell, interpret
    )
    return dxs.astype(xs.dtype), jnp.zeros_like(mask), dwx, dwh, db


rnn_layer.defvjp(_rnn_layer_fwd, _rnn_layer_bwd)


def supported(cfg, batch: int) -> bool:
    """Kernel preconditions: lane/sublane-aligned shapes. (Permanent by
    design, not a TODO: VMEM tiles are (8, 128); ragged edges would force
    masked partial tiles through every matmul in the recurrence for
    shapes the MXU-friendly defaults never produce.)"""
    g = 3 if cfg.cell == "gru" else 4
    return (
        cfg.cell in ("gru", "lstm")
        and cfg.hidden % 128 == 0
        and cfg.embed_dim % 128 == 0
        and (g * cfg.hidden) % 128 == 0
        and batch % 8 == 0
    )


def rnn_encode(
    params,
    cfg,
    emb: jax.Array,  # [B, L, E] float32 embeddings
    valid: jax.Array,  # [B, L] float32 validity
    interpret: bool = False,
) -> jax.Array:
    """Full multi-layer recurrent encode → final hidden [B, H] float32.
    Drop-in for the lax.scan path in towers.encode_raw."""
    from sse_tpu.models.towers import _split_weights

    xs = emb.transpose(1, 0, 2).astype(_COMPUTE_DTYPE)  # [L, B, E]
    mask = valid.T[:, None, :]  # [L, 1, B]
    fin = None
    for li, layer in enumerate(params["layers"]):
        wx, wh, b = _split_weights(layer, cfg.cell)
        ax = (
            jnp.dot(
                xs.reshape(-1, xs.shape[-1]),
                wx.astype(_COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            + b
        ).reshape(xs.shape[0], xs.shape[1], -1)
        ys, f = scan_layer(ax, mask, wh, cfg.cell, interpret=interpret)
        if cfg.residual and li > 0:
            # identity skip between stacked layers — mirrors the lax.scan
            # path in towers.encode_raw (carry-freezing makes stream[-1]
            # the value at each row's own length, so fin composes exactly)
            fin = f + xs[-1].astype(jnp.float32)
            xs = xs + ys
        else:
            fin, xs = f, ys
    return fin
