"""Readout variants: final / mean / attention (BASELINE.json configs[3]),
padding invariance, and qna attention end-to-end learning."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig, encode_source, init_params

V, L, B, D = 64, 12, 8, 16


def tower(readout, cell="gru"):
    return TowerConfig(
        vocab_size=V, embed_dim=24, hidden=24, num_layers=1,
        encoding_dim=D, cell=cell, readout=readout,
    )


def rand_batch(key):
    k1, k2 = jax.random.split(key)
    tokens = jax.random.randint(k1, (B, L), 2, V)
    lengths = jax.random.randint(k2, (B,), 2, L + 1)
    pos = jnp.arange(L)[None, :]
    return (
        jnp.where(pos < lengths[:, None], tokens, 0).astype(jnp.int32),
        lengths.astype(jnp.int32),
    )


@pytest.mark.parametrize("cell", ["gru", "lstm", "transformer"])
@pytest.mark.parametrize("readout", ["final", "mean", "attention"])
def test_readout_shapes_and_padding_invariance(cell, readout):
    if cell == "transformer" and readout == "final":
        readout = "mean"  # transformer treats final as mean
    cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER, src_tower=tower(readout, cell)
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    if readout == "attention":
        assert "attn_v" in params["src_tower"]
    tokens, lengths = rand_batch(jax.random.PRNGKey(1))
    e1 = encode_source(params, cfg, tokens, lengths)
    assert e1.shape == (B, D)
    # scribble garbage past each row's length
    pos = jnp.arange(L)[None, :]
    garbage = jnp.where(pos < lengths[:, None], tokens, V - 1)
    e2 = encode_source(params, cfg, garbage, lengths)
    np.testing.assert_allclose(
        np.asarray(e1), np.asarray(e2),
        atol=2e-2 if cell == "transformer" else 1e-4,
    )


def test_readouts_differ():
    tokens, lengths = rand_batch(jax.random.PRNGKey(2))
    outs = {}
    for r in ("final", "mean", "attention"):
        cfg = SSEConfig(mode=NetworkMode.SHARED_ENCODER, src_tower=tower(r))
        params = init_params(jax.random.PRNGKey(0), cfg)
        outs[r] = np.asarray(encode_source(params, cfg, tokens, lengths))
    assert np.abs(outs["final"] - outs["mean"]).max() > 1e-3
    assert np.abs(outs["mean"] - outs["attention"]).max() > 1e-3


def test_qna_attention_learns():
    from sse_tpu.data import synthetic
    from sse_tpu.data.corpus import encode_pairs, encode_target_space
    from sse_tpu.evals import Evaluator
    from sse_tpu.text.subword import SubwordVocab, token_counts_from_lines
    from sse_tpu.train import LossConfig, TrainConfig, train

    tr, ev, tg = synthetic.make_corpus(
        task="qna", num_targets=8, train_per_target=16, eval_per_target=3
    )
    vocab = SubwordVocab.build_to_target_size(
        300, token_counts_from_lines([s for s, _ in tr] + [t for _, t in tg])
    )
    tspace = encode_target_space(vocab, tg, 16)
    trp = encode_pairs(vocab, tr, tspace, 16)
    evp = encode_pairs(vocab, ev, tspace, 16)
    t = dataclasses.replace(tower("attention", "lstm"), vocab_size=vocab.vocab_size)
    cfg = SSEConfig(mode=NetworkMode.DUAL_ENCODER, src_tower=t, tgt_tower=t)
    state = train(
        cfg,
        TrainConfig(
            batch_size=32, learning_rate=0.05,
            loss=LossConfig(kind="sampled", num_negatives=8), max_epochs=20,
        ),
        trp,
        tspace,
    )
    result = Evaluator(cfg, evp, tspace, batch_size=32, ks=(1,)).evaluate(
        state.params
    )
    assert result["recall@1"] > 0.6, result
