"""Similarity losses: softmax cross-entropy over negatives.

Reference parity (SURVEY.md §2.1 model row; BASELINE.json north_star:
"cosine-similarity training with sampled-softmax negatives"):
logits are scaled cosine similarities; the negative set is one of

  * ``full``     — every target (source-encoder-only classification; exact
                   softmax, shardable over the 'model' mesh axis),
  * ``inbatch``  — the other examples' targets in the batch,
  * ``sampled``  — in-batch positives ∪ K uniformly sampled extra targets
                   (the reference's sampled-softmax analog), encoded by the
                   target tower on-device (no host-side candidate prep).

False negatives (a candidate that IS example i's labeled target but is not
its designated positive column) are masked to -inf — the reference's TF1
sampled softmax handled the analogous "accidental hit" removal.
All losses honor per-example weights (0-weight = batch padding row).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    kind: str = "inbatch"  # full | inbatch | sampled
    scale: float = 20.0  # cosine logit scale (temperature⁻¹)
    num_negatives: int = 128  # sampled mode: extra uniform negatives
    # Additive margin softmax (Yang et al. 2019, arXiv:1902.08564 — see
    # PAPERS.md): subtract `margin` from the positive's cosine before
    # scaling, pushing positives `margin` above the decision boundary.
    margin: float = 0.0
    # Bidirectional dual-encoder loss (same paper): average the
    # source→target loss with the target→source direction over the
    # in-batch square. Tower modes only.
    bidirectional: bool = False
    # Dynamic hard-negative mining (arXiv:2303.15311 — see PAPERS.md):
    # per example, the top-`num_hard_negatives` scoring wrong targets
    # against a periodically refreshed target-embedding cache join the
    # candidate set (stop-gradient mining; cache refresh cadence is the
    # train loop's hard_negative_refresh).
    num_hard_negatives: int = 0


def _weighted_ce(
    logits: jax.Array, label_col: jax.Array, weight: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Mean weighted CE + accuracy. logits [B,C], label_col [B]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, label_col[:, None], axis=1)[:, 0]
    denom = jnp.maximum(jnp.sum(weight), 1.0)
    loss = -jnp.sum(ll * weight) / denom
    acc = (
        jnp.sum((jnp.argmax(logits, axis=-1) == label_col) * weight) / denom
    )
    return loss, acc


def full_softmax_loss(
    src_emb: jax.Array,  # [B, D] normalized
    tgt_all: jax.Array,  # [T, D] normalized (may be 'model'-sharded)
    labels: jax.Array,  # [B] rows into tgt_all
    weight: jax.Array,  # [B]
    scale: float,
    margin: float = 0.0,
    labels_multi: Optional[jax.Array] = None,  # [B, M] -1-padded
) -> Tuple[jax.Array, jax.Array]:
    cos = jnp.dot(src_emb, tgt_all.T, preferred_element_type=jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1)
    if margin:
        cos = cos - margin * (cols == labels[:, None]).astype(cos.dtype)
    logits = scale * cos
    if labels_multi is not None and labels_multi.shape[1] > 1:
        # label-set-aware masking: a multi-label example's OTHER correct
        # targets are not negatives — mask them out of the softmax (the
        # designated positive stays column labels[:, 0])
        extra = labels_multi[:, 1:]  # [B, M-1]; -1 never matches a col
        false_neg = jnp.any(
            cols[:, :, None] == extra[:, None, :], axis=2
        )
        logits = jnp.where(false_neg, jnp.finfo(logits.dtype).min, logits)
    return _weighted_ce(logits, labels, weight)


def candidate_softmax_loss(
    src_emb: jax.Array,  # [B, D]
    cand_emb: jax.Array,  # [C, D] candidate targets; col i is example i's
    cand_rows: jax.Array,  # [C] global target rows of the candidates
    labels: jax.Array,  # [B] global target rows of the positives
    weight: jax.Array,  # [B]
    scale: float,
    margin: float = 0.0,
    bidirectional: bool = False,
    labels_multi: Optional[jax.Array] = None,  # [B, M] -1-padded
) -> Tuple[jax.Array, jax.Array]:
    """In-batch / sampled softmax. Candidate column i (< B) is example i's
    positive; any other column holding the same global target row is a
    false negative and gets masked. With ``labels_multi`` ([B, M]
    -1-padded label SETS) a candidate matching ANY of the example's
    labels is a false negative — multi-label train rows stop pushing
    their sibling labels away (r2 verdict quality item). Optional
    additive margin on the positive and bidirectional (t→s over the
    in-batch square) averaging."""
    B = src_emb.shape[0]
    cos = jnp.dot(src_emb, cand_emb.T, preferred_element_type=jnp.float32)
    if labels_multi is not None and labels_multi.shape[1] > 1:
        same_target = jnp.any(
            labels_multi[:, :, None] == cand_rows[None, None, :], axis=1
        )  # [B, C]; -1 padding never matches a real row
    else:
        same_target = labels[:, None] == cand_rows[None, :]  # [B, C]
    own_col = (
        jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1)
        == jax.lax.broadcasted_iota(jnp.int32, cos.shape, 0)
    )
    if margin:
        cos = cos - margin * own_col.astype(cos.dtype)
    logits = scale * cos
    false_neg = same_target & ~own_col
    logits = jnp.where(false_neg, jnp.finfo(logits.dtype).min, logits)
    label_col = jnp.arange(B, dtype=jnp.int32)
    loss, acc = _weighted_ce(logits, label_col, weight)
    if bidirectional:
        # target→source over the in-batch square: candidate i's positive
        # source is row i. Same margin/masking, transposed.
        sq = logits[:, :B].T  # [B(cand), B(src)] — masks/margin carry over
        loss_ts, _ = _weighted_ce(sq, label_col, weight)
        loss = 0.5 * (loss + loss_ts)
    return loss, acc


def sample_negative_rows(
    key: jax.Array, num_targets: int, num_negatives: int
) -> jax.Array:
    """Uniform negative rows (collisions with positives are masked in the
    loss, so uniform-with-replacement is exact enough and O(1))."""
    return jax.random.randint(key, (num_negatives,), 0, num_targets)


def mine_hard_negative_rows(
    src_emb: jax.Array,  # [B, D] (will be stop-gradiented)
    tgt_emb_cache: jax.Array,  # [T, D] periodically refreshed target embs
    labels: jax.Array,  # [B]
    num_hard: int,
    labels_multi: Optional[jax.Array] = None,  # [B, M] -1-padded
) -> jax.Array:
    """Top-scoring WRONG targets per example against the cached index
    (dynamic negative mining, arXiv:2303.15311). Returns [B*num_hard].
    With labels_multi, ALL of an example's labels are excluded from its
    mined negatives (not just the designated first)."""
    sims = jnp.dot(
        jax.lax.stop_gradient(src_emb),
        tgt_emb_cache.T,
        preferred_element_type=jnp.float32,
    )  # [B, T]
    cols = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    if labels_multi is not None and labels_multi.shape[1] > 1:
        own = jnp.any(
            cols[:, :, None] == labels_multi[:, None, :], axis=2
        )
    else:
        own = cols == labels[:, None]
    sims = jnp.where(own, -jnp.inf, sims)
    _, hard = jax.lax.top_k(sims, num_hard)  # [B, num_hard]
    return hard.reshape(-1)


def similarity_loss(
    cfg: LossConfig,
    src_emb: jax.Array,
    labels: jax.Array,
    weight: jax.Array,
    *,
    tgt_all: Optional[jax.Array] = None,  # full mode
    cand_emb: Optional[jax.Array] = None,  # inbatch/sampled modes
    cand_rows: Optional[jax.Array] = None,
    labels_multi: Optional[jax.Array] = None,  # [B, M] label sets
) -> Tuple[jax.Array, jax.Array]:
    """Dispatch on cfg.kind → (loss, train_accuracy)."""
    if cfg.kind == "full":
        assert tgt_all is not None
        return full_softmax_loss(
            src_emb, tgt_all, labels, weight, cfg.scale,
            margin=cfg.margin, labels_multi=labels_multi,
        )
    assert cand_emb is not None and cand_rows is not None
    return candidate_softmax_loss(
        src_emb,
        cand_emb,
        cand_rows,
        labels,
        weight,
        cfg.scale,
        margin=cfg.margin,
        bidirectional=cfg.bidirectional,
        labels_multi=labels_multi,
    )
