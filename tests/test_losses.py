"""Loss math vs hand-computed small cases (SURVEY.md §4 unit tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from sse_tpu.train.losses import (
    LossConfig,
    candidate_softmax_loss,
    full_softmax_loss,
    sample_negative_rows,
    similarity_loss,
)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_full_softmax_matches_numpy():
    rng = np.random.default_rng(0)
    src = _norm(rng.normal(size=(3, 8))).astype(np.float32)
    tgt = _norm(rng.normal(size=(5, 8))).astype(np.float32)
    labels = np.array([0, 3, 2], np.int32)
    weight = np.array([1.0, 1.0, 0.0], np.float32)  # last row = padding
    scale = 10.0
    loss, acc = full_softmax_loss(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(labels),
        jnp.asarray(weight), scale,
    )
    logits = scale * src @ tgt.T
    logp = logits - scipy.special.logsumexp(logits, axis=1, keepdims=True)
    expected = -(logp[0, 0] + logp[1, 3]) / 2.0
    # rtol matches the framework's matmul policy: bf16 operands, fp32 accum
    # (MXU-native; ranking/recall is insensitive to operand rounding).
    np.testing.assert_allclose(float(loss), expected, rtol=5e-3)


def test_candidate_loss_masks_false_negatives():
    """Two examples with the SAME target: each other's column must be
    masked, so loss ≈ log(1) when embeddings are perfectly aligned."""
    d = 4
    e = np.eye(d, dtype=np.float32)
    src = jnp.asarray(e[:2])  # examples 0,1 point at axes 0,1
    cand = jnp.asarray(e[:2])
    labels = jnp.asarray(np.array([7, 7], np.int32))  # same global target!
    cand_rows = labels
    weight = jnp.ones((2,), jnp.float32)
    loss, acc = candidate_softmax_loss(src, cand, cand_rows, labels, weight, 100.0)
    # with the duplicate column masked, each row's softmax has 1 candidate
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)
    assert float(acc) == 1.0


def test_candidate_loss_decreases_with_alignment():
    rng = np.random.default_rng(1)
    d, b = 8, 4
    tgt = _norm(rng.normal(size=(b, d))).astype(np.float32)
    labels = jnp.arange(b, dtype=jnp.int32)
    w = jnp.ones((b,), jnp.float32)
    aligned, _ = candidate_softmax_loss(
        jnp.asarray(tgt), jnp.asarray(tgt), labels, labels, w, 20.0
    )
    random_src = _norm(rng.normal(size=(b, d))).astype(np.float32)
    misaligned, _ = candidate_softmax_loss(
        jnp.asarray(random_src), jnp.asarray(tgt), labels, labels, w, 20.0
    )
    assert float(aligned) < float(misaligned)


def test_sample_negative_rows_in_range():
    rows = sample_negative_rows(jax.random.PRNGKey(0), 50, 200)
    assert rows.shape == (200,)
    assert int(rows.min()) >= 0 and int(rows.max()) < 50


def test_similarity_loss_dispatch():
    d = 4
    e = jnp.asarray(np.eye(d, dtype=np.float32))
    labels = jnp.arange(4, dtype=jnp.int32)
    w = jnp.ones((4,), jnp.float32)
    l1, _ = similarity_loss(
        LossConfig(kind="full"), e, labels, w, tgt_all=e
    )
    l2, _ = similarity_loss(
        LossConfig(kind="inbatch"), e, labels, w, cand_emb=e, cand_rows=labels
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_additive_margin_increases_loss_on_positives():
    """Margin penalizes the positive logit → loss strictly higher for a
    perfectly-aligned batch, gradient keeps pushing past alignment."""
    d = 8
    e = jnp.asarray(np.eye(d, dtype=np.float32)[:4])
    labels = jnp.arange(4, dtype=jnp.int32)
    w = jnp.ones((4,), jnp.float32)
    plain, _ = candidate_softmax_loss(e, e, labels, labels, w, 10.0)
    with_margin, _ = candidate_softmax_loss(
        e, e, labels, labels, w, 10.0, margin=0.3
    )
    assert float(with_margin) > float(plain)


def test_bidirectional_symmetric_case_matches():
    """For a symmetric in-batch square (src == cand), s→t and t→s losses
    coincide, so bidirectional averaging changes nothing."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, 8)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    labels = jnp.arange(5, dtype=jnp.int32)
    w = jnp.ones((5,), jnp.float32)
    uni, _ = candidate_softmax_loss(
        jnp.asarray(x), jnp.asarray(x), labels, labels, w, 20.0
    )
    bi, _ = candidate_softmax_loss(
        jnp.asarray(x), jnp.asarray(x), labels, labels, w, 20.0,
        bidirectional=True,
    )
    np.testing.assert_allclose(float(uni), float(bi), rtol=1e-5)


def test_bidirectional_differs_on_asymmetric_square():
    rng = np.random.default_rng(4)
    src = rng.normal(size=(5, 8)).astype(np.float32)
    cand = rng.normal(size=(7, 8)).astype(np.float32)  # 5 positives + 2 negs
    labels = jnp.arange(5, dtype=jnp.int32)
    w = jnp.asarray(np.array([1, 1, 1, 1, 0], np.float32))
    uni, _ = candidate_softmax_loss(
        jnp.asarray(src), jnp.asarray(cand),
        jnp.arange(7, dtype=jnp.int32), labels, w, 20.0,
    )
    bi, _ = candidate_softmax_loss(
        jnp.asarray(src), jnp.asarray(cand),
        jnp.arange(7, dtype=jnp.int32), labels, w, 20.0, bidirectional=True,
    )
    assert abs(float(uni) - float(bi)) > 1e-4


def test_mine_hard_negatives_excludes_label_and_finds_closest():
    from sse_tpu.train.losses import mine_hard_negative_rows

    d = 4
    cache = np.zeros((6, d), np.float32)
    cache[0] = [1, 0, 0, 0]      # the label — must be excluded
    cache[1] = [0.9, 0.1, 0, 0]  # hardest wrong target
    cache[2] = [0.5, 0.5, 0, 0]
    cache[3] = [-1, 0, 0, 0]
    src = jnp.asarray(np.array([[1, 0, 0, 0]], np.float32))
    labels = jnp.asarray(np.array([0], np.int32))
    rows = mine_hard_negative_rows(src, jnp.asarray(cache), labels, 2)
    assert list(np.asarray(rows)) == [1, 2]


def test_candidate_loss_label_set_masking():
    """Multi-label rows: a candidate matching ANY of the example's labels
    must be masked out of its negatives (r2 verdict quality item — train
    labels previously used rows[0] only). Example 0 has labels {7, 9};
    candidate column 2 is target 9 and would otherwise be a (false)
    negative pushing the sibling away."""
    d = 4
    e = np.eye(d, dtype=np.float32)
    src = jnp.asarray(e[:2])
    cand = jnp.asarray(np.concatenate([e[:2], e[0:1]]))  # col2 ≈ example 0
    labels = jnp.asarray(np.array([7, 8], np.int32))
    cand_rows = jnp.asarray(np.array([7, 8, 9], np.int32))
    weight = jnp.ones((2,), jnp.float32)
    labels_multi = jnp.asarray(np.array([[7, 9], [8, -1]], np.int32))
    # without label sets: col 2 scores 1.0 for example 0 → real loss
    loss_no, _ = candidate_softmax_loss(
        src, cand, cand_rows, labels, weight, 100.0
    )
    assert float(loss_no) > 0.1
    # with label sets: col 2 is masked → perfect alignment, ~zero loss
    loss_ls, acc = candidate_softmax_loss(
        src, cand, cand_rows, labels, weight, 100.0,
        labels_multi=labels_multi,
    )
    np.testing.assert_allclose(float(loss_ls), 0.0, atol=1e-5)
    assert float(acc) == 1.0
    # single-label rows (-1 padding) behave exactly as before
    lm_single = jnp.asarray(np.array([[7, -1], [8, -1]], np.int32))
    loss_pad, _ = candidate_softmax_loss(
        src, cand, cand_rows, labels, weight, 100.0, labels_multi=lm_single
    )
    np.testing.assert_allclose(float(loss_pad), float(loss_no), atol=1e-6)


def test_full_softmax_label_set_masking():
    """full (classification) mode: the OTHER true labels of a multi-label
    row are masked out of the softmax denominator."""
    from sse_tpu.train.losses import full_softmax_loss

    d, t = 4, 6
    e = np.eye(d, dtype=np.float32)
    src = jnp.asarray(e[:1])
    tgt_all = np.zeros((t, d), np.float32)
    tgt_all[0] = e[0]  # designated positive
    tgt_all[3] = e[0]  # sibling label, identical score
    tgt_all = jnp.asarray(tgt_all)
    labels = jnp.asarray(np.array([0], np.int32))
    weight = jnp.ones((1,), jnp.float32)
    loss_no, _ = full_softmax_loss(src, tgt_all, labels, weight, 100.0)
    assert float(loss_no) > 0.1  # sibling competes in the denominator
    lm = jnp.asarray(np.array([[0, 3]], np.int32))
    loss_ls, _ = full_softmax_loss(
        src, tgt_all, labels, weight, 100.0, labels_multi=lm
    )
    assert float(loss_ls) < float(loss_no) - 0.1


def test_mine_hard_negatives_excludes_all_labels():
    from sse_tpu.train.losses import mine_hard_negative_rows

    rng = np.random.default_rng(5)
    d, t, b = 8, 32, 2
    tgt = rng.normal(size=(t, d)).astype(np.float32)
    tgt /= np.linalg.norm(tgt, axis=1, keepdims=True)
    src = jnp.asarray(tgt[[3, 10]])  # each example sits ON a target
    labels = jnp.asarray(np.array([3, 10], np.int32))
    # give example 0 a second label at its SECOND-closest target
    sims = tgt[3] @ tgt.T
    sims[3] = -np.inf
    second = int(np.argmax(sims))
    lm = jnp.asarray(np.array([[3, second], [10, -1]], np.int32))
    hard = np.asarray(
        mine_hard_negative_rows(
            src, jnp.asarray(tgt), labels, 4, labels_multi=lm
        )
    ).reshape(b, 4)
    assert 3 not in hard[0] and second not in hard[0]
    assert 10 not in hard[1]
