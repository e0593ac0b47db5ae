"""int8 index mode: symmetric 127-scale quantization of L2-normalized
rows, exact int32 MXU accumulation rescaled to cosine range. 4x index
rows per chip vs float32. (Reference analog: none — the reference's
index is a float TSV on CPU, SURVEY.md §2.2; this is a beyond-parity
capacity feature in the same spirit as the bf16 mode.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sse_tpu.index.sharded_index import (
    INT8_SCALE,
    from_embeddings,
    quantize_rows,
)
from sse_tpu.ops.fused_topk import fused_score_topk, quantize_queries_int8


def _rows(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _int8_reference(q, emb_i8, k, num_real):
    """EXACT integer scoring reference: int32 accumulation is exact, so
    ordering is fully deterministic (ties = truly equal integer scores,
    broken toward the lower index like lax.top_k) — no matmul-precision
    trap (unlike the float paths, tests/test_ops.py::_bf16r). Since r4
    the packed kernel selects on unquantized integer keys, so it must
    match this reference bit-for-bit (no 12-bit clearing here anymore)."""
    if np.asarray(q).dtype == np.int8:
        qi = np.asarray(q).astype(np.int32)
    else:
        qi = np.clip(np.round(np.asarray(q) * 127.0), -127, 127).astype(
            np.int32
        )
    si = qi @ np.asarray(emb_i8).astype(np.int32).T
    si[:, num_real:] = np.int32(-(1 << 30))
    idx = np.lexsort(
        (np.broadcast_to(np.arange(si.shape[1]), si.shape), -si), axis=1
    )[:, :k]
    vals = np.take_along_axis(si, idx, axis=1).astype(np.float32) * (
        1.0 / (127 * 127)
    )
    return vals, idx


def test_quantize_rows_int8():
    rng = np.random.default_rng(0)
    x = _rows(rng, 64, 16)
    q = np.asarray(quantize_rows(x, jnp.int8))
    assert q.dtype == np.int8
    assert np.abs(q).max() <= 127
    # dequantized rows stay close to the originals (quantization step 1/127)
    np.testing.assert_allclose(q / INT8_SCALE, x, atol=0.5 / INT8_SCALE + 1e-7)
    # float dtypes remain a plain cast
    assert np.asarray(quantize_rows(x, jnp.float32)).dtype == np.float32


@pytest.mark.parametrize("variant", ["exact", "packed"])
def test_fused_topk_int8_interpret(variant):
    rng = np.random.default_rng(3)
    b, d, t, k = 8, 32, 1024, 10
    q = jnp.asarray(_rows(rng, b, d))
    emb = quantize_rows(_rows(rng, t, d), jnp.int8)
    for num_real in (t, t - 7):
        vals, idx = fused_score_topk(
            q, emb, k, num_real, block_t=256, interpret=True, variant=variant
        )
        evals, eidx = _int8_reference(q, emb, k, num_real)
        if variant == "packed":
            # r4: integer keys — selection AND values bit-exact
            np.testing.assert_array_equal(np.asarray(idx), eidx)
            np.testing.assert_array_equal(np.asarray(vals), evals)
        else:
            # exact variant: full-precision keys, same winners, argsort ties
            sv = np.asarray(vals)
            np.testing.assert_allclose(sv, evals, rtol=1e-6)
        # returned values are cosine-range floats
        assert np.abs(np.asarray(vals)).max() <= 1.2


def test_fused_topk_int8_near_ties_exact():
    """Adversarial exactness: integer scores differing by exactly ONE
    unit at |score| ≈ 15k, where the pre-r4 11-mantissa-bit keys had
    granularity 8 (ties collapsed, ~0.6% row disagreement vs lax.top_k
    at 40M rows — the deleted BASELINE.md footnote). The integer-key
    path must rank every one of them exactly, through consolidations
    (slots=k forces a merge nearly every block) and the multi-crosser
    fallback (each block holds many within-old-bucket crossers)."""
    rng = np.random.default_rng(11)
    b, d, t, k = 8, 128, 2048, 10
    q = np.zeros((b, d), np.int8)
    q[:, 0] = 127
    q[:, 1] = 1
    emb = np.zeros((t, d), np.int8)
    emb[:, 0] = 120  # base score 127*120 = 15240 for every row
    # distinct ±1-unit perturbations, shuffled so later blocks beat
    # earlier ones and every block is dense with near-ties
    perturb = rng.permutation(t) % 127 - 63
    emb[:, 1] = perturb.astype(np.int8)  # score = 15240 + perturb
    vals, idx = fused_score_topk(
        jnp.asarray(q), jnp.asarray(emb), k, t,
        block_t=256, interpret=True, slots=k,
    )
    evals, eidx = _int8_reference(q, emb, k, t)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_array_equal(np.asarray(vals), evals)


def test_fused_topk_int8_accepts_prequantized_queries():
    rng = np.random.default_rng(5)
    b, d, t, k = 4, 16, 512, 5
    qf = jnp.asarray(_rows(rng, b, d))
    emb = quantize_rows(_rows(rng, t, d), jnp.int8)
    v1, i1 = fused_score_topk(qf, emb, k, t, block_t=256, interpret=True)
    v2, i2 = fused_score_topk(
        quantize_queries_int8(qf), emb, k, t, block_t=256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_int8_engine_end_to_end():
    """Build an int8 index from tower embeddings, query through the full
    fused path (XLA backend on CPU), and compare winners against a
    float32 index on well-separated synthetic targets."""
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig, init_params
    from sse_tpu.serve.engine import build_fused_query_fn

    model_cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=TowerConfig(
            vocab_size=60, embed_dim=16, hidden=16, encoding_dim=16
        ),
    )
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    rng = np.random.default_rng(7)
    emb_f = _rows(rng, 256, 16)
    idx8 = from_embeddings(emb_f, [str(i) for i in range(256)],
                           [f"t{i}" for i in range(256)], dtype=jnp.int8)
    idxf = from_embeddings(emb_f, [str(i) for i in range(256)],
                           [f"t{i}" for i in range(256)], dtype=jnp.float32)
    assert np.asarray(idx8.emb).dtype == np.int8
    tokens = jnp.asarray(rng.integers(2, 60, size=(8, 12)), jnp.int32)
    lengths = jnp.full((8,), 12, jnp.int32)

    f8 = build_fused_query_fn(model_cfg, k=5, num_real=idx8.num_real,
                              emb_dtype=jnp.int8, use_pallas=False)
    ff = build_fused_query_fn(model_cfg, k=5, num_real=idxf.num_real,
                              use_pallas=False)
    v8, i8 = f8(params, idx8.emb, tokens, lengths)
    vf, if_ = ff(params, idxf.emb, tokens, lengths)
    # int8 quantization noise (~0.8% on scores) may reorder near-ties;
    # demand strong overlap of the winner sets plus top-1 agreement on a
    # majority of queries, and cosine-range values
    overlap = np.mean([
        len(set(np.asarray(i8)[r]) & set(np.asarray(if_)[r])) / 5.0
        for r in range(8)
    ])
    assert overlap >= 0.8, overlap
    assert np.abs(np.asarray(v8)).max() <= 1.2


def test_int8_live_add_and_tsv_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    emb_f = _rows(rng, 32, 8)
    idx = from_embeddings(
        emb_f[:24], [str(i) for i in range(24)],
        [f"t{i}" for i in range(24)], dtype=jnp.int8, capacity=32,
    )
    idx.add(emb_f[24:], [str(i) for i in range(24, 32)],
            [f"t{i}" for i in range(24, 32)])
    assert idx.num_real == 32
    assert np.asarray(idx.emb).dtype == np.int8
    # appended rows carry the same quantization as built rows
    np.testing.assert_array_equal(
        np.asarray(idx.emb)[24:32],
        np.asarray(quantize_rows(emb_f[24:], jnp.int8)),
    )
    # TSV export dequantizes; import reconstructs a float index whose rows
    # match the dequantized int8 rows
    p = tmp_path / "idx.tsv"
    idx.export_tsv(str(p))
    from sse_tpu.index.sharded_index import ShardedIndex

    back = ShardedIndex.import_tsv(str(p))
    np.testing.assert_allclose(
        np.asarray(back.emb)[:32],
        np.asarray(idx.emb)[:32].astype(np.float32) / INT8_SCALE,
        atol=1e-5,
    )


def test_int8_save_load_orbax(tmp_path):
    rng = np.random.default_rng(13)
    emb_f = _rows(rng, 16, 8)
    idx = from_embeddings(emb_f, [str(i) for i in range(16)],
                          [f"t{i}" for i in range(16)], dtype=jnp.int8)
    d = str(tmp_path / "idx")
    idx.save(d)
    from sse_tpu.index.sharded_index import ShardedIndex

    back = ShardedIndex.load(d)
    assert np.asarray(back.emb).dtype == np.int8
    np.testing.assert_array_equal(np.asarray(back.emb), np.asarray(idx.emb))
    assert back.num_real == 16 and back.ids == idx.ids


def test_build_index_tower_mode_on_mesh():
    """Regression (r2.5, found driving the CLI on 8 fake devices):
    tower-mode build_index on a multi-device mesh crashed — encoded
    chunks and params committed to the default device while the index
    buffer spanned the mesh. Single-chip runs masked it."""
    from jax.sharding import Mesh
    from sse_tpu.data.corpus import TargetSpace
    from sse_tpu.index.sharded_index import build_index
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig, init_params

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    model_cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=TowerConfig(
            vocab_size=60, embed_dim=16, hidden=16, encoding_dim=16
        ),
    )
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    rng = np.random.default_rng(3)
    n, l = 24, 10
    tspace = TargetSpace(
        ids=[str(i) for i in range(n)],
        texts=[f"t{i}" for i in range(n)],
        tokens=rng.integers(2, 60, size=(n, l)).astype(np.int32),
        lengths=np.full((n,), l, np.int32),
        id_to_row={str(i): i for i in range(n)},
    )
    for dt in (jnp.float32, jnp.int8):
        idx = build_index(params, model_cfg, tspace, mesh=mesh, dtype=dt)
        assert idx.num_real == n
        assert np.asarray(idx.emb).dtype == np.dtype(dt)
        # rows match the mesh-free build exactly
        ref = build_index(params, model_cfg, tspace, mesh=None, dtype=dt)
        np.testing.assert_array_equal(
            np.asarray(idx.emb)[:n], np.asarray(ref.emb)[:n]
        )
