"""Encoder towers: GRU / LSTM / transformer → fixed-size normalized vector.

Reference parity: sse_model.py's ``dynamic_rnn`` LSTM/GRU encoders with
final-state → linear+tanh → L2-normalize readout (SURVEY.md §2.1 model row).
TPU-native design choices:

  * fused gate matmuls — one [B, E+H] x [E+H, kH] product per step keeps the
    MXU busy instead of 2k small products;
  * bfloat16 operands, float32 accumulation (preferred_element_type), float32
    carry for recurrent stability;
  * time-major masked `lax.scan`: params are loop-invariant (stay in VMEM /
    registers across steps under XLA), padding steps freeze the carry so the
    final carry IS the state at each row's own length — no gather;
  * static shapes everywhere ([B, L] fixed) → single compilation.

The scan recurrence has a drop-in Pallas replacement in
sse_tpu/ops/pallas_rnn.py (SURVEY.md §2.4 native-tier item (a)).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_COMPUTE_DTYPE = jnp.bfloat16


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    vocab_size: int
    embed_dim: int = 128  # reference: word embedding_size
    hidden: int = 128  # reference: src_cell_size / tgt_cell_size
    num_layers: int = 1  # reference: num_layers
    encoding_dim: int = 64  # reference: encoding_size (shared space)
    cell: str = "gru"  # gru | lstm | transformer | bow (bag-of-subwords
    #                     mean — SURVEY.md §6's self-relative baseline)
    # readout of the state sequence into one vector:
    #   final     — state at each row's own length (rnn default; the
    #               reference's dynamic_rnn final-state behavior)
    #   mean      — masked mean pool (transformer default)
    #   attention — self-attentive pooling (qna config's "attention
    #               readout over encoder states", BASELINE.json configs[3])
    readout: str = "final"
    # transformer-only:
    num_heads: int = 4
    mlp_ratio: int = 4
    max_len: int = 512
    # transformer position encoding: 'rope' (rotary q/k rotation,
    # relative offsets — arXiv:2104.09864; the DEFAULT since r5),
    # 'learned' (a trained [max_len, d] table, no √d input scaling — the
    # BERT-style recipe), or 'sinusoid' (parameter-free). The r4
    # compositional-collapse probe measured sinusoid strictly worst at
    # every tested shape (at L≤16 most sinusoid dims are ~constant
    # across positions and the √d input scaling drowns the 0.05-std
    # embeddings) and RoPE best (0.8198 vs 0.3157 — BASELINE.md r4),
    # so the default follows the measurement.
    pos_encoding: str = "rope"
    # Pallas fused-layer recurrence (sse_tpu/ops/pallas_rnn.py): fwd is
    # bit-identical to the lax.scan path; training additionally uses the
    # fused backward kernel (custom VJP — grads within ~1e-2 relative of
    # XLA autodiff, bf16-operand matmuls). None = auto: ON for TPU
    # backends when the shape qualifies (pallas_rnn.supported), OFF on
    # CPU. Explicit True/False overrides.
    use_pallas_scan: Optional[bool] = None
    # Train-time regularization (reference has none — beyond-reference
    # quality lever, measured on the hard benchmark): inverted dropout on
    # the embedded inputs and on the pooled features, active ONLY when
    # the caller passes a dropout rng (training); eval/serving paths pass
    # none and are untouched.
    dropout: float = 0.0
    # Identity skip connections between stacked RNN layers (l≥1, where
    # in/out dims match). Measured necessity, not decoration: without
    # them a 3-layer GRU on the compositional benchmark collapses to
    # 0.31 recall@1 vs the 2-layer's 0.84 (BASELINE.md r3 negative
    # results) — the classic deep-RNN signal-degradation failure.
    # Transformer towers are residual by construction; this flag only
    # affects gru/lstm stacks and is a no-op at num_layers == 1.
    residual: bool = False
    # Backward implementation for the [V, E] embedding-table gradient —
    # the r4 roofline's scatter-add (223 µs of the 666 µs device step,
    # 33%). Forward is jnp.take in every case (bit-identical); only the
    # cotangent computation differs:
    #   'take'         — XLA autodiff's scatter-add (the r4 behavior)
    #   'segment'      — segment_sum over the flat token stream
    #   'sort_segment' — argsort tokens, then indices_are_sorted
    #                    segment_sum (contiguous-run adds)
    #   'onehot'       — one_hot(tokens)^T @ dy on the MXU (bf16
    #                    operands, fp32 accumulation — same precision
    #                    trade as the fused RNN VJP, quality-gated)
    # All four are numerically the sum of the same per-token cotangent
    # rows; 'onehot' rounds dy to bf16 first (~1e-2 relative, the
    # precision the training stack already accepts elsewhere). Default
    # follows the r5 measurement (BASELINE.md r5 roofline).
    embed_grad: str = "take"


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _embed_lookup(table: jax.Array, tokens: jax.Array, impl: str):
    """jnp.take(table, tokens, 0) with a configurable cotangent path
    (TowerConfig.embed_grad). The forward — and therefore every eval /
    serving / index program — is identical for all impls."""
    return jnp.take(table, tokens, axis=0)


def _embed_lookup_fwd(table, tokens, impl):
    return jnp.take(table, tokens, axis=0), (tokens, table.shape[0])


def _embed_lookup_bwd(impl, res, dy):
    tokens, vocab = res
    tok = tokens.reshape(-1)
    dy2 = dy.reshape(-1, dy.shape[-1])
    if impl == "segment":
        dt = jax.ops.segment_sum(dy2, tok, num_segments=vocab)
    elif impl == "sort_segment":
        order = jnp.argsort(tok)
        dt = jax.ops.segment_sum(
            dy2[order], tok[order], num_segments=vocab,
            indices_are_sorted=True,
        )
    elif impl == "onehot":
        oh = jax.nn.one_hot(tok, vocab, dtype=_COMPUTE_DTYPE)  # [P, V]
        dt = jax.lax.dot_general(
            oh, dy2.astype(_COMPUTE_DTYPE),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    elif impl == "take_bf16":
        # scatter-add in bfloat16: halves the dy-read + table-RMW HBM
        # traffic if the scatter is bandwidth-bound (same ~1e-2-relative
        # rounding the training stack accepts in its gradient matmuls)
        dt = (
            jnp.zeros((vocab, dy2.shape[-1]), jnp.bfloat16)
            .at[tok]
            .add(dy2.astype(jnp.bfloat16))
            .astype(dy2.dtype)
        )
    elif impl == "spread8":
        # collision-spread scatter: 8 interleaved sub-tables make
        # duplicate vocab ids (uniform tokens: ~14 collisions/row at the
        # bench shapes) mostly unique per sub-table, then a dense [8,V,E]
        # sum folds them — trades 8x table traffic for collision-free
        # scatter lanes. Exact (fp32 adds reassociated only).
        n = 8
        pos = jax.lax.iota(jnp.int32, tok.shape[0])
        dt = (
            jnp.zeros((n * vocab, dy2.shape[-1]), dy2.dtype)
            .at[tok * n + (pos % n)]
            .add(dy2)
            .reshape(vocab, n, dy2.shape[-1])
            .sum(axis=1)
        )
    elif impl == "presorted_cost":
        # measurement-only: models a HOST-presorted order operand riding
        # with the batch (tokens are known host-side, so the argsort that
        # makes 'sort_segment' lose could be free). The baked permutation
        # makes the RESULT wrong — never a training config; exists to
        # bound the win of gather + indices_are_sorted segment_sum with
        # the device-side sort removed.
        perm = jax.random.permutation(
            jax.random.PRNGKey(0), tok.shape[0]
        )
        dt = jax.ops.segment_sum(
            dy2[perm], tok[perm], num_segments=vocab,
            indices_are_sorted=True,
        )
    elif impl == "zero_debug":
        # measurement-only floor (roofline attribution): the table
        # cotangent is dropped entirely. NEVER a training config — it
        # freezes the embedding table.
        dt = jnp.zeros((vocab, dy2.shape[-1]), dy2.dtype)
    else:
        raise ValueError(f"unknown embed_grad impl {impl!r}")
    return dt, None


_embed_lookup.defvjp(_embed_lookup_fwd, _embed_lookup_bwd)


def _glorot(key, shape):
    fan_in, fan_out = shape[-2], shape[-1]
    scale = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


# ----------------------------------------------------------------- init
def init_tower(key: jax.Array, cfg: TowerConfig) -> Params:
    keys = jax.random.split(key, 4 + cfg.num_layers)
    p: Params = {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, cfg.embed_dim))
        * 0.05,
        "proj_w": _glorot(keys[1], (cfg.hidden, cfg.encoding_dim)),
        "proj_b": jnp.zeros((cfg.encoding_dim,)),
    }
    if cfg.readout == "attention":
        ka, kv = jax.random.split(keys[2 + cfg.num_layers])
        p["attn_w"] = _glorot(ka, (cfg.hidden, cfg.hidden))
        p["attn_b"] = jnp.zeros((cfg.hidden,))
        p["attn_v"] = jax.random.normal(kv, (cfg.hidden,)) * 0.05
    if cfg.cell in ("gru", "lstm"):
        n_gates = 3 if cfg.cell == "gru" else 4
        layers = []
        for l in range(cfg.num_layers):
            in_dim = cfg.embed_dim if l == 0 else cfg.hidden
            k1, k2 = jax.random.split(keys[2 + l])
            layers.append(
                {
                    # single fused kernel over [x; h] for one MXU call/step
                    "w": jnp.concatenate(
                        [
                            _glorot(k1, (in_dim, n_gates * cfg.hidden)),
                            _glorot(k2, (cfg.hidden, n_gates * cfg.hidden)),
                        ],
                        axis=0,
                    ),
                    "b": jnp.zeros((n_gates * cfg.hidden,)),
                }
            )
        p["layers"] = layers
    elif cfg.cell == "bow":
        if cfg.embed_dim != cfg.hidden:
            raise ValueError("bow tower requires embed_dim == hidden")
        # no sequence parameters: embed → masked mean → projection
    elif cfg.cell == "transformer":
        d = cfg.embed_dim
        if d != cfg.hidden:
            raise ValueError("transformer tower requires embed_dim == hidden")
        blocks = []
        for l in range(cfg.num_layers):
            ks = jax.random.split(keys[2 + l], 6)
            blocks.append(
                {
                    "ln1_scale": jnp.ones((d,)),
                    "ln1_bias": jnp.zeros((d,)),
                    "qkv_w": _glorot(ks[0], (d, 3 * d)),
                    "qkv_b": jnp.zeros((3 * d,)),
                    "attn_out_w": _glorot(ks[1], (d, d)),
                    "attn_out_b": jnp.zeros((d,)),
                    "ln2_scale": jnp.ones((d,)),
                    "ln2_bias": jnp.zeros((d,)),
                    "mlp_in_w": _glorot(ks[2], (d, cfg.mlp_ratio * d)),
                    "mlp_in_b": jnp.zeros((cfg.mlp_ratio * d,)),
                    "mlp_out_w": _glorot(ks[3], (cfg.mlp_ratio * d, d)),
                    "mlp_out_b": jnp.zeros((d,)),
                }
            )
        p["blocks"] = blocks
        p["ln_f_scale"] = jnp.ones((d,))
        p["ln_f_bias"] = jnp.zeros((d,))
        if cfg.pos_encoding == "learned":
            p["pos_embed"] = (
                jax.random.normal(keys[2 + cfg.num_layers], (cfg.max_len, d))
                * 0.02
            )
        elif cfg.pos_encoding not in ("sinusoid", "rope"):
            raise ValueError(f"unknown pos_encoding {cfg.pos_encoding!r}")
    else:
        raise ValueError(f"unknown cell {cfg.cell!r}")
    return p


# ------------------------------------------------------------ rnn towers
#
# TPU decomposition: gate pre-activations are linear in [x; h], so the
# x-side projection of EVERY timestep is hoisted out of the recurrence as
# ONE large MXU matmul ([L·B, E] x [E, G·H]); the sequential scan then only
# does the small h-recurrence ([B, H] x [H, G·H] per step) — half the
# sequential FLOPs and the hoisted half runs at full MXU efficiency.
# The scan itself has a Pallas drop-in (sse_tpu/ops/pallas_rnn.py) that
# keeps W_h and the carry in VMEM across all timesteps.


def gru_cell(gates, h):
    """Elementwise GRU update from combined pre-activations [B, 3H].
    Fused variant: reset gate scales the whole candidate pre-activation
    (h' = z·h + (1−z)·tanh(r ⊙ n_pre)) so the recurrence needs exactly one
    matmul per step instead of textbook-GRU's two sequential ones."""
    z, r, n_pre = jnp.split(gates, 3, axis=-1)
    z = jax.nn.sigmoid(z)
    r = jax.nn.sigmoid(r)
    n = jnp.tanh(n_pre * r)
    return (1.0 - z) * n + z * h


def lstm_cell(gates, h, c):
    """Elementwise LSTM update from combined pre-activations [B, 4H]."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _split_weights(layer: Params, cell: str):
    """The checkpoint layout keeps one fused [(in+H), G·H] kernel; split it
    into the hoistable x-part and the recurrent h-part."""
    n_gates = 3 if cell == "gru" else 4
    h = layer["w"].shape[1] // n_gates
    in_dim = layer["w"].shape[0] - h
    return layer["w"][:in_dim], layer["w"][in_dim:], layer["b"]


def _rnn_layer(
    layer: Params, xs: jax.Array, mask: jax.Array, cell: str
) -> Tuple[jax.Array, jax.Array]:
    """Run one RNN layer. xs [L,B,E] (compute dtype), mask [L,B,1] fp32.
    Returns (outputs [L,B,H] compute dtype, final hidden [B,H] fp32)."""
    B = xs.shape[1]
    wx, wh, b = _split_weights(layer, cell)
    H = wh.shape[0]
    wh_c = wh.astype(_COMPUTE_DTYPE)

    # Hoisted x-projection for all timesteps: one big MXU matmul.
    ax = (
        jnp.dot(
            xs.reshape(-1, xs.shape[-1]),
            wx.astype(_COMPUTE_DTYPE),
            preferred_element_type=jnp.float32,
        )
        + b
    ).reshape(xs.shape[0], B, -1)  # [L, B, G*H] fp32

    if cell == "gru":
        h0 = jnp.zeros((B, H), jnp.float32)

        def step(h, inp):
            a_t, m_t = inp
            gates = a_t + jnp.dot(
                h.astype(_COMPUTE_DTYPE), wh_c,
                preferred_element_type=jnp.float32,
            )
            h_new = gru_cell(gates, h)
            h = m_t * h_new + (1.0 - m_t) * h  # freeze carry past length
            return h, h.astype(_COMPUTE_DTYPE)

        h_fin, ys = jax.lax.scan(step, h0, (ax, mask))
        return ys, h_fin
    else:
        state0 = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))

        def step(state, inp):
            a_t, m_t = inp
            h, c = state
            gates = a_t + jnp.dot(
                h.astype(_COMPUTE_DTYPE), wh_c,
                preferred_element_type=jnp.float32,
            )
            h_new, c_new = lstm_cell(gates, h, c)
            h = m_t * h_new + (1.0 - m_t) * h
            c = m_t * c_new + (1.0 - m_t) * c
            return (h, c), h.astype(_COMPUTE_DTYPE)

        (h_fin, _), ys = jax.lax.scan(step, state0, (ax, mask))
        return ys, h_fin


# ------------------------------------------------------ transformer tower
def _layer_norm(x, scale, bias, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _sinusoid_table(max_len: int, dim: int) -> np.ndarray:
    pos = np.arange(max_len)[:, None]
    i = np.arange(dim // 2)[None, :]
    ang = pos / np.power(10000.0, 2.0 * i / dim)
    table = np.zeros((max_len, dim), np.float32)
    table[:, 0::2] = np.sin(ang)
    table[:, 1::2] = np.cos(ang)
    return table


def _rope_tables(positions: jax.Array, hd: int):
    """RoPE cos/sin tables for int32 ``positions`` [L] → two [L, hd/2]
    fp32 arrays (Su et al., arXiv:2104.09864). Standard 10000-base
    frequencies over PAIRED head dims."""
    i = jnp.arange(hd // 2, dtype=jnp.float32)
    inv_freq = jnp.power(10000.0, -2.0 * i / hd)  # [hd/2]
    ang = positions.astype(jnp.float32)[:, None] * inv_freq[None]  # [L,hd/2]
    return jnp.cos(ang), jnp.sin(ang)


def _rope_rotate(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate head vectors x [B, nh, L, hd] by per-position angles.
    Pairs (x[..., :hd/2], x[..., hd/2:]) — the 'rotate-half' layout, an
    orthogonal change of pair basis that preserves the relative-offset
    property q·k = f(m - n)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[None, None]  # [1, 1, L, hd/2]
    s = sin[None, None]
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)


def _transformer_encode(
    p: Params, cfg: TowerConfig, x: jax.Array, valid: jax.Array,
    cp_axis: Optional[str] = None,
) -> jax.Array:
    """x [B,L,E] fp32 embeddings, valid [B,L] float 0/1 → states [B,L,H].

    ``cp_axis`` (SURVEY.md §2.2 SP/CP row — the transformer extension
    point): when set, this body is running INSIDE shard_map with the
    SEQUENCE dim sharded over that mesh axis. Per-token work (QKV/MLP/
    layer norms) stays local; only K and V (and the key-side mask)
    all_gather, so each device attends its local queries against the
    global keys — gather-based sequence parallelism. Positions offset by
    the shard index so sinusoids match the unsharded run exactly. Entry
    point: sse_tpu.parallel.context.encode_context_parallel."""
    B, L, d = x.shape  # L = LOCAL chunk length under cp_axis
    nh, hd = cfg.num_heads, d // cfg.num_heads
    rope = cfg.pos_encoding == "rope"
    if rope:
        # position enters through q/k rotation only (relative offsets —
        # the right inductive bias when the signal is local word ORDER,
        # e.g. the compositional benchmark whose ceiling is the bigram
        # oracle); nothing is added to the residual stream
        table, in_scale = jnp.zeros((L, d), jnp.float32), 1.0
        off = jax.lax.axis_index(cp_axis) * L if cp_axis else 0
        cos_t, sin_t = _rope_tables(off + jnp.arange(L, dtype=jnp.int32), hd)
    elif cfg.pos_encoding == "learned":
        # BERT-style: trained position table, no input scaling (both
        # summands are learned, so relative magnitude is absorbed)
        table, in_scale = p["pos_embed"], 1.0
    else:
        # scale embeddings by √d (standard transformer input scaling) so
        # the unit-magnitude sinusoids don't drown the 0.05-std token
        # embeddings
        table, in_scale = jnp.asarray(_sinusoid_table(cfg.max_len, d)), (
            math.sqrt(d)
        )
    if cp_axis is None:
        table = table[:L]
        valid_g = valid
    else:
        if not rope:
            off = jax.lax.axis_index(cp_axis) * L
            table = jax.lax.dynamic_slice_in_dim(table, off, L)
        valid_g = jax.lax.all_gather(valid, cp_axis, axis=1, tiled=True)
    Lg = valid_g.shape[1]
    if not rope:
        x = x * in_scale + table[None]
    neg_inf = jnp.finfo(jnp.float32).min
    attn_bias = jnp.where(valid_g[:, None, None, :] > 0, 0.0, neg_inf)  # [B,1,1,Lg]
    for blk in p["blocks"]:
        y = _layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
        qkv = (
            jnp.dot(
                y.astype(_COMPUTE_DTYPE),
                blk["qkv_w"].astype(_COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            + blk["qkv_b"]
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if cp_axis is not None:
            # keys/values go global; queries stay local — the one
            # communication step of gather-based CP (2 gathers/layer)
            k = jax.lax.all_gather(k, cp_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, cp_axis, axis=1, tiled=True)
        q = q.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lg, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lg, nh, hd).transpose(0, 2, 1, 3)
        if rope:
            # queries rotate by their GLOBAL positions (off+i); gathered
            # keys span [0, Lg) so they take the full-range table
            q = _rope_rotate(q, cos_t, sin_t)
            if cp_axis is not None:
                cos_g, sin_g = _rope_tables(
                    jnp.arange(Lg, dtype=jnp.int32), hd
                )
            else:
                cos_g, sin_g = cos_t, sin_t
            k = _rope_rotate(k, cos_g, sin_g)
        logits = (
            jnp.einsum(
                "bhqd,bhkd->bhqk",
                q.astype(_COMPUTE_DTYPE),
                k.astype(_COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            / math.sqrt(hd)
            + attn_bias
        )
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bhkd->bhqd",
            attn.astype(_COMPUTE_DTYPE),
            v.astype(_COMPUTE_DTYPE),
            preferred_element_type=jnp.float32,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, d)
        x = x + (
            jnp.dot(
                ctx.astype(_COMPUTE_DTYPE),
                blk["attn_out_w"].astype(_COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            + blk["attn_out_b"]
        )
        y = _layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
        h = jax.nn.gelu(
            jnp.dot(
                y.astype(_COMPUTE_DTYPE),
                blk["mlp_in_w"].astype(_COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            + blk["mlp_in_b"]
        )
        x = x + (
            jnp.dot(
                h.astype(_COMPUTE_DTYPE),
                blk["mlp_out_w"].astype(_COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            + blk["mlp_out_b"]
        )
    return _layer_norm(x, p["ln_f_scale"], p["ln_f_bias"])  # [B, L, H]


# ---------------------------------------------------------------- readout
def _masked_mean(states: jax.Array, valid: jax.Array) -> jax.Array:
    """states [B, L, H], valid [B, L] → [B, H]."""
    denom = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1.0)
    return jnp.sum(states * valid[:, :, None], axis=1) / denom


def _attention_readout(
    p: Params, states: jax.Array, valid: jax.Array, residual: jax.Array
) -> jax.Array:
    """Self-attentive pooling over encoder states (the qna config's
    'attention readout over encoder states' — BASELINE.json configs[3]):
    score_t = v · tanh(W·h_t + b), masked softmax, weighted sum, PLUS a
    pooled-summary residual.

    The residual is a measured fix, not decoration: trained bare on the
    hard-profile qna corpus the target tower's softmax collapses onto
    token 0 (alpha=[1,0,...], ‖attn_v‖→4.5), reducing each passage to its
    first-token prefix state — recall@1 0.077 vs 0.28–0.67 for final-state
    readouts (r2 sweep). Anchoring the output on the sequence summary
    removes the collapse incentive and lower-bounds quality at the
    summary readout's level while attention adds per-token detail."""
    proj = jnp.tanh(
        jnp.dot(
            states.astype(_COMPUTE_DTYPE),
            p["attn_w"].astype(_COMPUTE_DTYPE),
            preferred_element_type=jnp.float32,
        )
        + p["attn_b"]
    )  # [B, L, H]
    scores = jnp.einsum("blh,h->bl", proj, p["attn_v"])
    scores = jnp.where(valid > 0, scores, jnp.finfo(jnp.float32).min)
    alpha = jax.nn.softmax(scores, axis=-1)  # [B, L]
    return jnp.einsum("bl,blh->bh", alpha, states) + residual


# ----------------------------------------------------------------- encode
@partial(jax.jit, static_argnames=("cfg",))
def encode(
    params: Params,
    cfg: TowerConfig,
    tokens: jax.Array,  # [B, L] int32
    lengths: jax.Array,  # [B] int32
) -> jax.Array:
    """Token ids → L2-normalized [B, encoding_dim] float32 embeddings."""
    return encode_raw(params, cfg, tokens, lengths)


def _dropout(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Inverted dropout (scale-at-train, identity-at-eval)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def encode_raw(
    params: Params,
    cfg: TowerConfig,
    tokens: jax.Array,
    lengths: jax.Array,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Un-jitted body (so callers can fuse it into larger programs).

    `dropout_rng`: pass a PRNG key to enable cfg.dropout (training only);
    None (the default, and what every eval/serving path passes) keeps the
    forward fully deterministic."""
    train = dropout_rng is not None and cfg.dropout > 0.0
    B, L = tokens.shape
    if cfg.embed_grad == "take":
        emb = jnp.take(params["embed"], tokens, axis=0)  # [B,L,E] fp32
    else:
        emb = _embed_lookup(params["embed"], tokens, cfg.embed_grad)
    if train:
        k_in, k_out = jax.random.split(dropout_rng)
        emb = _dropout(emb, cfg.dropout, k_in)
    pos = jnp.arange(L)[None, :]
    valid = (pos < lengths[:, None]).astype(jnp.float32)  # [B,L]

    if cfg.cell in ("gru", "lstm"):
        from sse_tpu.ops import pallas_rnn  # lazy: optional fast path

        use_fused = cfg.use_pallas_scan
        if use_fused is None:  # auto: Pallas needs a real TPU backend
            use_fused = jax.devices()[0].platform not in ("cpu",)
        use_fused = use_fused and pallas_rnn.supported(cfg, B)
        xs = emb.transpose(1, 0, 2).astype(_COMPUTE_DTYPE)  # [L,B,E]
        if use_fused:
            maskT = valid.T[:, None, :]  # [L,1,B] lane-major for tiling
            run_layer = lambda layer, xs: pallas_rnn.rnn_layer(  # noqa: E731
                xs, maskT, *_split_weights(layer, cfg.cell), cfg.cell
            )
        else:
            mask = valid.T[:, :, None]  # [L,B,1]
            run_layer = lambda layer, xs: _rnn_layer(  # noqa: E731
                layer, xs, mask, cfg.cell
            )
        final = None
        for li, layer in enumerate(params["layers"]):
            ys, fin = run_layer(layer, xs)
            if cfg.residual and li > 0:
                # identity skip (H == H for l ≥ 1). Carry-freezing makes
                # every layer's outputs constant past each row's own
                # length, so the stream's LAST timestep is exactly its
                # value at the row's length — the residual `final` is
                # fin + stream[-1] with no gather.
                final = fin + xs[-1].astype(jnp.float32)
                xs = xs + ys
            else:
                final, xs = fin, ys
        states = xs.transpose(1, 0, 2).astype(jnp.float32)  # [B,L,H]
        if cfg.readout == "final":
            feats = final  # [B,H] fp32 — state at each row's own length
        elif cfg.readout == "mean":
            feats = _masked_mean(states, valid)
        elif cfg.readout == "attention":
            feats = _attention_readout(params, states, valid, final)
        else:
            raise ValueError(f"unknown readout {cfg.readout!r}")
    elif cfg.cell == "bow":
        # bag-of-subwords: the embeddings ARE the states
        if cfg.readout == "attention":
            feats = _attention_readout(
                params, emb, valid, _masked_mean(emb, valid)
            )
        else:
            feats = _masked_mean(emb, valid)
    else:
        states = _transformer_encode(params, cfg, emb, valid)
        if cfg.readout == "attention":
            feats = _attention_readout(
                params, states, valid, _masked_mean(states, valid)
            )
        else:  # transformers default to masked mean pooling
            feats = _masked_mean(states, valid)

    if train:
        feats = _dropout(feats, cfg.dropout, k_out)
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
