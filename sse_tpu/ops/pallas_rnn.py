"""Pallas fused RNN scan — the native-tier encoder kernel
(SURVEY.md §2.4 item (a): replaces the reference's tf.nn.dynamic_rnn).

Works on the hoisted-recurrence form (see sse_tpu/models/towers.py): the
x-side gate projection of all timesteps is one big XLA matmul; this kernel
runs only the sequential part, with W_h and the carry pinned in VMEM for
the entire sequence — no per-step HBM round trips for weights or state.
Grid = (L,): Pallas streams each timestep's pre-activation block in and
(for stacked layers) each hidden state out, double-buffered.

Numerics: identical update rule to the lax.scan path (bfloat16 matmul
operands, float32 accumulation and carry); asserted equal in
tests/test_ops_rnn.py.
"""

from __future__ import annotations

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


def supported(cfg, batch: int) -> bool:
    """Kernel preconditions: lane/sublane-aligned shapes."""
    g = 3 if cfg.cell == "gru" else 4
    return (
        cfg.cell in ("gru", "lstm")
        and cfg.hidden % 128 == 0
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
