"""L2 model tests: shapes, normalization, padding/masking invariance
(SURVEY.md §4 property tests), all three network modes, all tower cells."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sse_tpu.models import (
    NetworkMode,
    SSEConfig,
    TowerConfig,
    encode_source,
    encode_target,
    init_params,
    target_embeddings,
)

V, L, B, D = 64, 12, 4, 16


def tower(cell="gru", **kw):
    base = dict(
        vocab_size=V, embed_dim=24, hidden=24, num_layers=2, encoding_dim=D,
        cell=cell,
    )
    base.update(kw)
    return TowerConfig(**base)


def rand_batch(key, max_len=L):
    k1, k2 = jax.random.split(key)
    tokens = jax.random.randint(k1, (B, max_len), 2, V)
    lengths = jax.random.randint(k2, (B,), 2, max_len + 1)
    pos = jnp.arange(max_len)[None, :]
    tokens = jnp.where(pos < lengths[:, None], tokens, 0)
    return tokens.astype(jnp.int32), lengths.astype(jnp.int32)


@pytest.mark.parametrize("cell", ["gru", "lstm", "transformer"])
def test_tower_shapes_and_norm(cell):
    cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER, src_tower=tower(cell)
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens, lengths = rand_batch(jax.random.PRNGKey(1))
    emb = encode_source(params, cfg, tokens, lengths)
    assert emb.shape == (B, D)
    assert emb.dtype == jnp.float32
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-3
    )


@pytest.mark.parametrize("cell", ["gru", "lstm", "transformer", "bow"])
def test_pad_width_invariance(cell):
    """Encoding at a WIDER all-padding width must give the same
    embeddings — the property corpus-level pad trimming
    (data/corpus.py::trimmed_width) relies on: columns past the batch
    max length are masked in every tower, so slicing them off is
    numerics-neutral while cutting the scan's sequential chain."""
    cfg = SSEConfig(mode=NetworkMode.SHARED_ENCODER, src_tower=tower(cell))
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens, lengths = rand_batch(jax.random.PRNGKey(5))
    wide = jnp.concatenate(
        [tokens, jnp.zeros((B, 7), jnp.int32)], axis=1
    )
    emb_trim = encode_source(params, cfg, tokens, lengths)
    emb_wide = encode_source(params, cfg, wide, lengths)
    np.testing.assert_allclose(
        np.asarray(emb_trim), np.asarray(emb_wide),
        atol=2e-2 if cell == "transformer" else 1e-5,
    )


@pytest.mark.parametrize("cell", ["gru", "lstm", "transformer"])
def test_padding_invariance(cell):
    """Tokens past each row's length must not affect the embedding."""
    cfg = SSEConfig(mode=NetworkMode.SHARED_ENCODER, src_tower=tower(cell))
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens, lengths = rand_batch(jax.random.PRNGKey(2))
    emb1 = encode_source(params, cfg, tokens, lengths)
    # scribble garbage into the padding region
    pos = jnp.arange(L)[None, :]
    garbage = jnp.where(
        pos < lengths[:, None], tokens, jnp.full_like(tokens, V - 1)
    )
    emb2 = encode_source(params, cfg, garbage, lengths)
    np.testing.assert_allclose(
        np.asarray(emb1), np.asarray(emb2), atol=2e-2 if cell == "transformer" else 1e-5
    )


def test_source_encoder_only_mode():
    cfg = SSEConfig(
        mode=NetworkMode.SOURCE_ENCODER_ONLY,
        src_tower=tower(),
        num_targets=10,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert params["target_table"].shape == (10, D)
    all_t = target_embeddings(params, cfg)
    assert all_t.shape == (10, D)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(all_t), axis=-1), 1.0, atol=1e-5
    )
    some = target_embeddings(params, cfg, rows=jnp.array([3, 7]))
    np.testing.assert_allclose(np.asarray(some), np.asarray(all_t)[[3, 7]], atol=1e-6)
    with pytest.raises(ValueError):
        encode_target(params, cfg, *rand_batch(jax.random.PRNGKey(3)))


def test_shared_vs_dual_param_structure():
    shared = SSEConfig(mode=NetworkMode.SHARED_ENCODER, src_tower=tower())
    dual = SSEConfig(
        mode=NetworkMode.DUAL_ENCODER, src_tower=tower(), tgt_tower=tower("lstm")
    )
    ps = init_params(jax.random.PRNGKey(0), shared)
    pd = init_params(jax.random.PRNGKey(0), dual)
    assert "tgt_tower" not in ps
    assert "tgt_tower" in pd
    tokens, lengths = rand_batch(jax.random.PRNGKey(4))
    # shared mode: target side == source side encoding
    np.testing.assert_allclose(
        np.asarray(encode_target(ps, shared, tokens, lengths)),
        np.asarray(encode_source(ps, shared, tokens, lengths)),
        atol=1e-6,
    )
    # dual mode: towers differ
    a = np.asarray(encode_target(pd, dual, tokens, lengths))
    b = np.asarray(encode_source(pd, dual, tokens, lengths))
    assert np.abs(a - b).max() > 1e-3


def test_config_validation():
    with pytest.raises(ValueError):
        SSEConfig(mode=NetworkMode.SOURCE_ENCODER_ONLY, src_tower=tower())
    with pytest.raises(ValueError):
        SSEConfig(mode=NetworkMode.DUAL_ENCODER, src_tower=tower())
    with pytest.raises(ValueError):
        SSEConfig(
            mode=NetworkMode.DUAL_ENCODER,
            src_tower=tower(),
            tgt_tower=tower(encoding_dim=D + 1),
        )


def test_bow_tower_baseline():
    """Bag-of-subwords tower (SURVEY.md §6 self-relative baseline):
    shapes, padding invariance, order invariance."""
    cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER, src_tower=tower("bow")
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "layers" not in params["src_tower"]
    tokens, lengths = rand_batch(jax.random.PRNGKey(5))
    e1 = encode_source(params, cfg, tokens, lengths)
    assert e1.shape == (B, D)
    # padding invariance
    pos = jnp.arange(L)[None, :]
    garbage = jnp.where(pos < lengths[:, None], tokens, V - 1)
    np.testing.assert_allclose(
        np.asarray(e1),
        np.asarray(encode_source(params, cfg, garbage, lengths)),
        atol=1e-5,
    )
    # bow is order-invariant (unlike rnn): reverse each row's valid prefix
    rev = np.asarray(tokens).copy()
    for i in range(B):
        n = int(lengths[i])
        rev[i, :n] = rev[i, :n][::-1]
    np.testing.assert_allclose(
        np.asarray(e1),
        np.asarray(encode_source(params, cfg, jnp.asarray(rev), lengths)),
        atol=1e-4,
    )


@pytest.mark.parametrize("cell", ["gru", "transformer"])
def test_dropout_train_vs_eval(cell):
    """dropout: rng-gated (None → deterministic, identical to a
    dropout=0 config), different keys → different outputs, same key →
    reproducible. Eval/serving paths never pass an rng, so a dropout>0
    config must not change them."""
    cfg_d = tower(cell=cell, dropout=0.3)
    cfg_0 = tower(cell=cell, dropout=0.0)
    params = init_params(
        jax.random.PRNGKey(0),
        SSEConfig(mode=NetworkMode.SHARED_ENCODER, src_tower=cfg_d),
    )
    tokens, lengths = rand_batch(jax.random.PRNGKey(1))
    cfg = SSEConfig(mode=NetworkMode.SHARED_ENCODER, src_tower=cfg_d)
    cfg0 = SSEConfig(mode=NetworkMode.SHARED_ENCODER, src_tower=cfg_0)
    # no rng: identical to the dropout-free config (serving invariance)
    a = encode_source(params, cfg, tokens, lengths)
    b = encode_source(params, cfg0, tokens, lengths)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # rng given: stochastic but reproducible per key
    r1 = encode_source(
        params, cfg, tokens, lengths, dropout_rng=jax.random.PRNGKey(7)
    )
    r1b = encode_source(
        params, cfg, tokens, lengths, dropout_rng=jax.random.PRNGKey(7)
    )
    r2 = encode_source(
        params, cfg, tokens, lengths, dropout_rng=jax.random.PRNGKey(8)
    )
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r1b))
    assert not np.allclose(np.asarray(r1), np.asarray(a))
    assert not np.allclose(np.asarray(r1), np.asarray(r2))
    # outputs stay L2-normalized under dropout
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r1), axis=-1), 1.0, atol=1e-3
    )


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_residual_rnn_stack(cell):
    """Residual RNN stacking (TowerConfig.residual): identity skips
    between layers l>=1. Properties: (a) no-op at num_layers=1;
    (b) changes the encoding at num_layers>=2; (c) padding invariance
    holds (the skip stream freezes past each row's length too);
    (d) the residual `final` readout equals the residual stream at each
    row's own length, computed independently via the mean readout's
    states on an unpadded batch."""
    params1 = init_params(
        jax.random.PRNGKey(0),
        SSEConfig(
            mode=NetworkMode.SHARED_ENCODER,
            src_tower=tower(cell, num_layers=1, residual=True),
        ),
    )
    tokens, lengths = rand_batch(jax.random.PRNGKey(3))
    c1r = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=tower(cell, num_layers=1, residual=True),
    )
    c1 = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=tower(cell, num_layers=1, residual=False),
    )
    np.testing.assert_array_equal(
        np.asarray(encode_source(params1, c1r, tokens, lengths)),
        np.asarray(encode_source(params1, c1, tokens, lengths)),
    )

    c3r = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=tower(cell, num_layers=3, residual=True),
    )
    c3 = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=tower(cell, num_layers=3, residual=False),
    )
    params3 = init_params(jax.random.PRNGKey(0), c3r)
    er = encode_source(params3, c3r, tokens, lengths)
    e0 = encode_source(params3, c3, tokens, lengths)
    assert er.shape == (B, D)
    assert not np.allclose(np.asarray(er), np.asarray(e0))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(er), axis=-1), 1.0, atol=1e-3
    )

    # padding invariance
    pos = jnp.arange(L)[None, :]
    garbage = jnp.where(
        pos < lengths[:, None], tokens, jnp.full_like(tokens, V - 1)
    )
    np.testing.assert_allclose(
        np.asarray(er),
        np.asarray(encode_source(params3, c3r, garbage, lengths)),
        atol=1e-5,
    )

    # final == residual stream at the row's own length: on a LENGTH-1
    # batch the mean readout averages exactly one state, so it must equal
    # the final readout — this isolates stream[0] == final carry.
    c3r_mean = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=tower(cell, num_layers=3, residual=True, readout="mean"),
    )
    one = jnp.ones((B,), jnp.int32)
    # encode a length-1 batch both ways: final state == mean over 1 state
    # (atol: the final path keeps the fp32 scan carry, the mean path reads
    # the bf16 stream — an expected one-rounding gap, not a logic gap)
    tok1 = tokens[:, :1]
    np.testing.assert_allclose(
        np.asarray(encode_source(params3, c3r, tok1, one)),
        np.asarray(encode_source(params3, c3r_mean, tok1, one)),
        atol=3e-3,
    )


def test_transformer_learned_positions():
    """pos_encoding='learned' (r4 compositional probe): a trained
    [max_len, d] table replaces the sinusoids, no √d input scaling;
    params gain pos_embed, encodes differ from the sinusoid tower, and
    position actually matters (token swap changes the encoding)."""
    import jax
    import jax.numpy as jnp

    from sse_tpu.models.towers import TowerConfig, init_tower, encode_raw

    base = dict(
        vocab_size=40, embed_dim=16, hidden=16, encoding_dim=8,
        cell="transformer", num_layers=2, num_heads=2, readout="mean",
        max_len=32,
    )
    cfg_s = TowerConfig(**base, pos_encoding="sinusoid")
    cfg_l = TowerConfig(**base, pos_encoding="learned")
    p_l = init_tower(jax.random.PRNGKey(0), cfg_l)
    assert "pos_embed" in p_l and p_l["pos_embed"].shape == (32, 16)
    assert "pos_embed" not in init_tower(jax.random.PRNGKey(0), cfg_s)

    toks = jnp.asarray(
        np.random.default_rng(0).integers(2, 40, (3, 8)), jnp.int32
    )
    lens = jnp.asarray([8, 5, 2], jnp.int32)
    out = encode_raw(p_l, cfg_l, toks, lens)
    assert out.shape == (3, 8)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=-1)), 1.0, rtol=1e-5
    )
    # order sensitivity: swapping two tokens must move the encoding
    swapped = toks.at[0, 0].set(toks[0, 1]).at[0, 1].set(toks[0, 0])
    out2 = encode_raw(p_l, cfg_l, swapped, lens)
    assert float(jnp.abs(out[0] - out2[0]).max()) > 1e-4

    with pytest.raises(ValueError, match="pos_encoding"):
        init_tower(
            jax.random.PRNGKey(0),
            TowerConfig(**base, pos_encoding="rotary"),
        )


def test_transformer_rope():
    """pos_encoding='rope' (r4 compositional probe): rotary q/k rotation
    (arXiv:2104.09864) — no additive table, no extra params; encodes are
    order-sensitive, and the rotation preserves the relative-offset
    property (q·k depends on m−n only, checked directly on the rotate
    helper)."""
    import jax
    import jax.numpy as jnp

    from sse_tpu.models.towers import (
        TowerConfig, init_tower, encode_raw, _rope_rotate, _rope_tables,
    )

    base = dict(
        vocab_size=40, embed_dim=16, hidden=16, encoding_dim=8,
        cell="transformer", num_layers=2, num_heads=2, readout="mean",
        max_len=32,
    )
    cfg = TowerConfig(**base, pos_encoding="rope")
    p = init_tower(jax.random.PRNGKey(0), cfg)
    assert "pos_embed" not in p  # rope adds no parameters

    toks = jnp.asarray(
        np.random.default_rng(1).integers(2, 40, (3, 8)), jnp.int32
    )
    lens = jnp.asarray([8, 6, 3], jnp.int32)
    out = encode_raw(p, cfg, toks, lens)
    assert out.shape == (3, 8)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=-1)), 1.0, rtol=1e-5
    )
    # order sensitivity: swapping two tokens must move the encoding
    swapped = toks.at[0, 0].set(toks[0, 1]).at[0, 1].set(toks[0, 0])
    out2 = encode_raw(p, cfg, swapped, lens)
    assert float(jnp.abs(out[0] - out2[0]).max()) > 1e-4

    # relative-offset property of the rotation itself: for head vectors
    # a (at position m) and b (at position n), rotated dot depends only
    # on m − n
    hd = 8
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(1, 1, 1, hd)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 1, 1, hd)), jnp.float32)

    def rdot(m, n):
        cm, sm = _rope_tables(jnp.asarray([m], jnp.int32), hd)
        cn, sn = _rope_tables(jnp.asarray([n], jnp.int32), hd)
        ra = _rope_rotate(a, cm, sm)
        rb = _rope_rotate(b, cn, sn)
        return float(jnp.sum(ra * rb))

    np.testing.assert_allclose(rdot(3, 1), rdot(9, 7), rtol=1e-5)
    np.testing.assert_allclose(rdot(5, 5), float(jnp.sum(a * b)), rtol=1e-5)
    assert abs(rdot(3, 1) - rdot(1, 3)) > 1e-6  # direction-sensitive


@pytest.mark.parametrize(
    "impl", ["segment", "sort_segment", "onehot", "take_bf16", "spread8"]
)
def test_embed_grad_impls_match_take(impl):
    """TowerConfig.embed_grad changes only the embedding-table cotangent
    computation: forwards are bit-identical, and every impl's dTable
    matches autodiff's scatter-add (exactly for the integer-permutation
    impls; to bf16-rounding tolerance for the MXU one-hot matmul)."""
    from sse_tpu.models.towers import encode_raw

    cfg_take = tower("gru", num_layers=1)
    cfg_alt = tower("gru", num_layers=1, embed_grad=impl)
    from sse_tpu.models.towers import init_tower

    p = init_tower(jax.random.PRNGKey(0), cfg_take)
    tokens, lengths = rand_batch(jax.random.PRNGKey(1))
    # duplicate tokens across rows to exercise colliding scatter indices
    tokens = tokens.at[1].set(tokens[0])

    out_take = encode_raw(p, cfg_take, tokens, lengths)
    out_alt = encode_raw(p, cfg_alt, tokens, lengths)
    np.testing.assert_array_equal(np.asarray(out_take), np.asarray(out_alt))

    def loss(params, cfg):
        out = encode_raw(params, cfg, tokens, lengths)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_take = jax.grad(loss)(p, cfg_take)["embed"]
    g_alt = jax.grad(loss)(p, cfg_alt)["embed"]
    if impl in ("onehot", "take_bf16"):
        # atol covers bf16 cancellation on near-zero accumulated sums
        np.testing.assert_allclose(
            np.asarray(g_alt), np.asarray(g_take), rtol=0.02, atol=5e-3
        )
    elif impl == "spread8":
        # exact up to fp32 re-association of colliding adds
        np.testing.assert_allclose(
            np.asarray(g_alt), np.asarray(g_take), rtol=1e-5, atol=1e-6
        )
    else:
        np.testing.assert_allclose(
            np.asarray(g_alt), np.asarray(g_take), rtol=1e-6, atol=1e-7
        )
    # rows of untouched vocab ids must stay exactly zero
    touched = np.zeros(V, bool)
    touched[np.asarray(tokens).reshape(-1)] = True
    assert np.all(np.asarray(g_alt)[~touched] == 0.0)
