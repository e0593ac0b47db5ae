"""Distributed-without-cluster tests on 8 fake CPU devices
(SURVEY.md §4): mesh construction, distributed exact top-k == argsort,
sharded data-parallel train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sse_tpu.parallel import batch_sharding, index_sharding, make_mesh, param_shardings
from sse_tpu.parallel.topk import distributed_topk


def test_eight_fake_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m = make_mesh(model=4)
    assert m.shape == {"data": 2, "model": 4}
    m = make_mesh(data=1, model=8)
    assert m.shape == {"data": 1, "model": 8}


@pytest.mark.parametrize("k", [1, 5, 32])
@pytest.mark.parametrize("t", [64, 1000])
def test_distributed_topk_exact(k, t):
    """Exactness harness: distributed merge == single-device argsort."""
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(0)
    b = 4
    t_pad = -(-t // 8) * 8
    scores = rng.normal(size=(b, t_pad)).astype(np.float32)
    sharded = jax.device_put(
        jnp.asarray(scores), NamedSharding(mesh, P(None, "model"))
    )
    vals, idx = distributed_topk(sharded, k, mesh)
    vals, idx = np.asarray(vals), np.asarray(idx)
    expect_idx = np.argsort(-scores, axis=1)[:, :k]
    expect_vals = np.take_along_axis(scores, expect_idx, axis=1)
    np.testing.assert_allclose(vals, expect_vals, rtol=1e-6)
    np.testing.assert_array_equal(idx, expect_idx)


def test_distributed_topk_k_larger_than_shard():
    """k bigger than a shard's row count still exact (pad path)."""
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(1)
    scores = rng.normal(size=(2, 16)).astype(np.float32)  # 2 rows/shard
    sharded = jax.device_put(
        jnp.asarray(scores), NamedSharding(mesh, P(None, "model"))
    )
    vals, idx = distributed_topk(sharded, 8, mesh)
    expect_idx = np.argsort(-scores, axis=1)[:, :8]
    np.testing.assert_array_equal(np.asarray(idx), expect_idx)


def test_data_parallel_train_step_matches_single_device():
    """Same batch, sharded over 8 devices vs 1 device → same loss/params."""
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig
    from sse_tpu.train import LossConfig, TrainConfig, init_train_state, make_train_step

    model_cfg = SSEConfig(
        mode=NetworkMode.SOURCE_ENCODER_ONLY,
        src_tower=TowerConfig(
            vocab_size=50, embed_dim=16, hidden=16, encoding_dim=8
        ),
        num_targets=12,
    )
    cfg = TrainConfig(batch_size=16, loss=LossConfig(kind="full"))
    rng = np.random.default_rng(2)
    src = rng.integers(2, 50, size=(16, 10)).astype(np.int32)
    src_len = rng.integers(2, 11, size=(16,)).astype(np.int32)
    labels = rng.integers(0, 12, size=(16,)).astype(np.int32)
    weight = np.ones((16,), np.float32)
    dummy_t = np.zeros((12, 10), np.int32)
    dummy_l = np.ones((12,), np.int32)

    def run(mesh):
        state = init_train_state(jax.random.PRNGKey(0), model_cfg, cfg)
        step = make_train_step(model_cfg, cfg, donate=False)
        args = [src, src_len, labels, weight]
        if mesh is not None:
            bs = batch_sharding(mesh)
            args = [jax.device_put(jnp.asarray(a), bs) for a in args]
            state = jax.device_put(state, param_shardings(mesh, state))
        else:
            args = [jnp.asarray(a) for a in args]
        new_state, metrics = step(
            state, *args, jnp.asarray(dummy_t), jnp.asarray(dummy_l)
        )
        return float(metrics["loss"]), np.asarray(
            new_state.params["target_table"]
        )

    loss_1, table_1 = run(None)
    mesh = make_mesh(data=8, model=1)
    loss_8, table_8 = run(mesh)
    np.testing.assert_allclose(loss_1, loss_8, rtol=2e-4)
    np.testing.assert_allclose(table_1, table_8, rtol=3e-3, atol=3e-5)


def test_model_sharded_target_table_full_softmax():
    """Target table sharded over 'model' (TP for the big matrix) still
    trains: loss matches the replicated run."""
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig
    from sse_tpu.train import LossConfig, TrainConfig, init_train_state, make_train_step

    model_cfg = SSEConfig(
        mode=NetworkMode.SOURCE_ENCODER_ONLY,
        src_tower=TowerConfig(
            vocab_size=50, embed_dim=16, hidden=16, encoding_dim=8
        ),
        num_targets=16,
    )
    cfg = TrainConfig(batch_size=8, loss=LossConfig(kind="full"))
    rng = np.random.default_rng(3)
    src = rng.integers(2, 50, size=(8, 10)).astype(np.int32)
    src_len = rng.integers(2, 11, size=(8,)).astype(np.int32)
    labels = rng.integers(0, 16, size=(8,)).astype(np.int32)
    weight = np.ones((8,), np.float32)
    dummy_t = np.zeros((16, 10), np.int32)
    dummy_l = np.ones((16,), np.int32)

    state = init_train_state(jax.random.PRNGKey(0), model_cfg, cfg)
    step = make_train_step(model_cfg, cfg, donate=False)
    ref_state, ref_metrics = step(
        state,
        jnp.asarray(src),
        jnp.asarray(src_len),
        jnp.asarray(labels),
        jnp.asarray(weight),
        jnp.asarray(dummy_t),
        jnp.asarray(dummy_l),
    )

    mesh = make_mesh(data=2, model=4)
    state2 = init_train_state(jax.random.PRNGKey(0), model_cfg, cfg)
    state2 = jax.device_put(state2, param_shardings(mesh, state2))
    assert state2.params["target_table"].sharding.spec == P("model", None)
    bs = batch_sharding(mesh)
    sh_state, sh_metrics = step(
        state2,
        jax.device_put(jnp.asarray(src), bs),
        jax.device_put(jnp.asarray(src_len), bs),
        jax.device_put(jnp.asarray(labels), bs),
        jax.device_put(jnp.asarray(weight), bs),
        jnp.asarray(dummy_t),
        jnp.asarray(dummy_l),
    )
    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(sh_metrics["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref_state.params["target_table"]),
        np.asarray(sh_state.params["target_table"]),
        rtol=3e-3,
        atol=3e-5,
    )


# ---------------------------------------------------- context parallelism
def test_context_parallel_transformer_matches_unsharded():
    """Gather-based CP attention (SURVEY §2.2 SP/CP row): the transformer
    tower with tokens SEQUENCE-sharded over 4 devices must reproduce the
    unsharded encode — positions, masking (incl. rows whose padding
    spans whole shards), attention over global keys, pooled readout."""
    from sse_tpu.models.towers import TowerConfig, init_tower, encode_raw
    from sse_tpu.parallel import encode_context_parallel, make_mesh

    cfg = TowerConfig(
        vocab_size=50, embed_dim=16, hidden=16, encoding_dim=8,
        cell="transformer", num_layers=2, num_heads=2, readout="mean",
        max_len=64,
    )
    params = init_tower(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, L = 6, 16  # 4 shards x 4 tokens
    tokens = jnp.asarray(rng.integers(2, 50, size=(B, L)), jnp.int32)
    # lengths hit every regime: full, mid-shard cut, < one shard, 1 token
    lengths = jnp.asarray([16, 11, 8, 3, 1, 13], jnp.int32)

    ref = encode_raw(params, cfg, tokens, lengths)
    mesh = make_mesh(data=2, model=4)
    out = encode_context_parallel(
        params, cfg, tokens, lengths, mesh, axis="model"
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6,
        err_msg="context-parallel encode != unsharded encode",
    )

    # rope under CP: queries rotate by shard-offset GLOBAL positions and
    # gathered keys take the full-range table — must still equal the
    # unsharded rope encode
    cfg_r = TowerConfig(
        vocab_size=50, embed_dim=16, hidden=16, encoding_dim=8,
        cell="transformer", num_layers=2, num_heads=2, readout="mean",
        max_len=64, pos_encoding="rope",
    )
    params_r = init_tower(jax.random.PRNGKey(1), cfg_r)
    ref_r = encode_raw(params_r, cfg_r, tokens, lengths)
    out_r = encode_context_parallel(
        params_r, cfg_r, tokens, lengths, mesh, axis="model"
    )
    np.testing.assert_allclose(
        np.asarray(out_r), np.asarray(ref_r), rtol=2e-5, atol=2e-6,
        err_msg="context-parallel ROPE encode != unsharded encode",
    )

    # guard rails: RNN cells and non-poolable readouts refuse CP
    rcfg = TowerConfig(vocab_size=50, embed_dim=16, hidden=16,
                       encoding_dim=8, cell="gru")
    with pytest.raises(ValueError, match="sequential"):
        encode_context_parallel(params, rcfg, tokens, lengths, mesh)
    acfg = TowerConfig(
        vocab_size=50, embed_dim=16, hidden=16, encoding_dim=8,
        cell="transformer", readout="attention",
    )
    with pytest.raises(ValueError, match="mean"):
        encode_context_parallel(params, acfg, tokens, lengths, mesh)


def test_context_parallel_grads_match():
    """shard_map transposes the CP gathers/psums, so gradients flow
    through the sequence-sharded encode — pinned here so the
    inference-first scope note in context.py is a design choice, not a
    correctness gap: d(loss)/d(params) through the CP encoder must equal
    the unsharded tower's gradients."""
    from sse_tpu.models.towers import TowerConfig, encode_raw, init_tower
    from sse_tpu.parallel import cp_mesh, make_cp_encoder

    cfg = TowerConfig(
        vocab_size=50, embed_dim=16, hidden=16, encoding_dim=8,
        cell="transformer", num_layers=2, num_heads=2, readout="mean",
        max_len=64, pos_encoding="rope",
    )
    params = init_tower(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    B, L = 4, 16
    tokens = jnp.asarray(rng.integers(2, 50, size=(B, L)), jnp.int32)
    lengths = jnp.asarray([16, 9, 3, 12], jnp.int32)
    v = jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32))

    enc = make_cp_encoder(cfg, cp_mesh(4))
    g_cp = jax.grad(lambda p: jnp.sum(enc(p, tokens, lengths) * v))(params)
    g_ref = jax.grad(
        lambda p: jnp.sum(encode_raw(p, cfg, tokens, lengths) * v)
    )(params)
    flat_cp, _ = jax.tree_util.tree_flatten_with_path(g_cp)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_cp) == len(flat_ref)
    for (path, a), b in zip(flat_cp, flat_ref):
        a, b = np.asarray(a), np.asarray(b)
        # tolerance: bf16-matmul cotangents reduce in a different order
        # under the psum'd transpose (ulp-scale, ~2^-7 relative); a
        # MISSING psum — the failure this test pins — is a 4x/0.25x
        # error, three orders of magnitude past this band
        tol = 1e-2 * max(1.0, float(np.abs(b).max()))
        assert float(np.abs(a - b).max()) <= tol, (
            f"CP gradient diverged at {jax.tree_util.keystr(path)}: "
            f"max|Δ|={np.abs(a - b).max():.4g} > {tol:.4g}"
        )


def test_build_index_cp_matches_and_composes_with_model_sharding():
    """r4 verdict item 3: CP as a PATH — build_index(cp_shards=4)
    encodes targets on a dedicated {'seq':4} mesh and must produce the
    same index as the plain builder, INCLUDING when the index buffer is
    simultaneously row-sharded over a separate {'model'} mesh (the axis
    contract in context.py: CP never claims the index's 'model' axis)."""
    from sse_tpu.data.corpus import TargetSpace
    from sse_tpu.index.sharded_index import build_index
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig, init_params

    cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=TowerConfig(
            vocab_size=50, embed_dim=16, hidden=16, encoding_dim=8,
            cell="transformer", num_layers=2, num_heads=2, readout="mean",
            max_len=64,
        ),
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    T, L = 23, 14  # L NOT divisible by 4: exercises the cp pad path
    toks = rng.integers(2, 50, size=(T, L)).astype(np.int32)
    lens = rng.integers(1, L + 1, size=(T,)).astype(np.int32)
    for i in range(T):
        toks[i, lens[i]:] = 0
    tspace = TargetSpace(
        ids=[f"t{i}" for i in range(T)],
        texts=[f"doc {i}" for i in range(T)],
        tokens=toks,
        lengths=lens,
        id_to_row={f"t{i}": i for i in range(T)},
    )

    ref = build_index(params, cfg, tspace, mesh=None, batch_size=8)
    out = build_index(params, cfg, tspace, mesh=None, batch_size=8,
                      cp_shards=4)
    np.testing.assert_allclose(
        np.asarray(out.emb)[:T], np.asarray(ref.emb)[:T],
        rtol=2e-5, atol=2e-6,
        err_msg="cp_shards index != plain index",
    )

    # composition: index rows TP-sharded over {'model':2} while the
    # encode runs CP over a {'seq':4} mesh of the same devices
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    out2 = build_index(params, cfg, tspace, mesh=mesh, batch_size=8,
                       cp_shards=4)
    assert out2.emb.sharding.spec[0] == "model"
    np.testing.assert_allclose(
        np.asarray(out2.emb)[:T], np.asarray(ref.emb)[:T],
        rtol=2e-5, atol=2e-6,
        err_msg="cp encode composed with model-sharded index diverged",
    )


def test_2d_mesh_fused_query_matches_single_device():
    """r4 verdict item 5: the north-star 8-chip serving topology — query
    DP over 'data' × index TP over 'model' in ONE fused program
    ({data:2, model:4}), rows/values == the single-device program."""
    from sse_tpu.index.sharded_index import from_embeddings
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig, init_params
    from sse_tpu.serve.engine import build_fused_query_fn

    mesh = make_mesh(data=2, model=4)
    cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=TowerConfig(
            vocab_size=64, embed_dim=16, hidden=16, num_layers=1,
            encoding_dim=16,
        ),
    )
    from sse_tpu.models import sse as _sse

    params = _sse.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(37, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"t{i}" for i in range(37)]
    sidx = from_embeddings(emb, ids, ids, mesh=mesh)
    fused = build_fused_query_fn(cfg, k=5, num_real=sidx.num_real, mesh=mesh)
    qtok = jnp.asarray(rng.integers(2, 64, size=(8, 10)), jnp.int32)
    qlen = jnp.asarray(rng.integers(3, 11, size=(8,)), jnp.int32)
    vals, rows = fused(params, sidx.emb, qtok, qlen)

    ref_idx = from_embeddings(emb, ids, ids, mesh=None)
    ref = build_fused_query_fn(cfg, k=5, num_real=ref_idx.num_real, mesh=None)
    rv, rr = ref(params, ref_idx.emb, qtok, qlen)
    assert (np.asarray(rows) == np.asarray(rr)).all()
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(rv), rtol=2e-4, atol=2e-5
    )


def test_data_only_mesh_fused_query():
    """Query-DP serving with a replicated index ({data:8, model:1}):
    each replica serves its batch slice; == single-device."""
    from sse_tpu.index.sharded_index import from_embeddings
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig
    from sse_tpu.models import sse as _sse
    from sse_tpu.serve.engine import build_fused_query_fn

    mesh = make_mesh(data=8, model=1)
    cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=TowerConfig(
            vocab_size=64, embed_dim=16, hidden=16, num_layers=1,
            encoding_dim=16,
        ),
    )
    params = _sse.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(21, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"t{i}" for i in range(21)]
    sidx = from_embeddings(emb, ids, ids, mesh=mesh)
    fused = build_fused_query_fn(cfg, k=3, num_real=sidx.num_real, mesh=mesh)
    qtok = jnp.asarray(rng.integers(2, 64, size=(16, 6)), jnp.int32)
    qlen = jnp.full((16,), 6, jnp.int32)
    vals, rows = fused(params, sidx.emb, qtok, qlen)
    ref_idx = from_embeddings(emb, ids, ids, mesh=None)
    ref = build_fused_query_fn(cfg, k=3, num_real=ref_idx.num_real, mesh=None)
    rv, rr = ref(params, ref_idx.emb, qtok, qlen)
    assert (np.asarray(rows) == np.asarray(rr)).all()
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(rv), rtol=2e-4, atol=2e-5
    )
