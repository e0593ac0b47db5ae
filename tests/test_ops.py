"""Pallas kernel tests (interpret mode on CPU — SURVEY.md §4; real-TPU
numerics are cross-checked in the benchmark harness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sse_tpu.ops.fused_topk import fused_score_topk, pick_block_t


def _bf16r(x):
    """bf16-representable fp32: jax's default-precision matmul truncates
    operands to bf16 (even on the CPU backend in this build), so exact
    index comparison against a numpy fp32 reference requires inputs for
    which that truncation is lossless."""
    return np.asarray(
        jnp.asarray(np.asarray(x)).astype(jnp.bfloat16).astype(jnp.float32)
    )


def _reference(q, emb, k, num_real, quantized=False, idx_mask=0xFFF):
    """argsort reference; quantized=True reproduces the packed variant's
    selection keys (sortable-int transform + low-bit truncation:
    log2(block_t) bits, 12 minimum; ties → lower index)."""
    s = (np.asarray(q) @ np.asarray(emb).T).astype(np.float32)
    s[:, num_real:] = -np.inf
    if quantized:
        bits = s.view(np.int32)
        key = bits ^ ((bits >> 31) & np.int32(0x7FFFFFFF))
        key &= ~np.int32(idx_mask)
        idx = np.lexsort(
            (np.broadcast_to(np.arange(s.shape[1]), s.shape), -key), axis=1
        )[:, :k]
    else:
        idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(s, idx, axis=1)
    return vals, idx


@pytest.mark.parametrize("variant", ["exact", "packed"])
@pytest.mark.parametrize("num_real_off", [0, 3])
@pytest.mark.parametrize("k", [1, 10])
def test_fused_topk_interpret(k, num_real_off, variant):
    b, d, t = 8, 32, 1024
    rng = np.random.default_rng(0)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))
    num_real = t - num_real_off
    vals, idx = fused_score_topk(
        q, emb, k, num_real, block_t=512, interpret=True, variant=variant
    )
    evals, eidx = _reference(
        q, emb, k, num_real, quantized=(variant == "packed")
    )
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=2e-2)


def test_fused_topk_tie_breaking_interpret():
    """Duplicate max values → lowest row index first (lax.top_k parity)."""
    b, d, t = 8, 16, 256
    q = jnp.ones((b, d), jnp.float32)
    emb = np.zeros((t, d), np.float32)
    emb[7] = 1.0
    emb[100] = 1.0  # identical row → identical score
    emb[42] = 0.5
    vals, idx = fused_score_topk(
        q, jnp.asarray(emb), 3, t, block_t=128, interpret=True
    )
    assert list(np.asarray(idx)[0]) == [7, 100, 42]


def test_fused_topk_num_real_traced_interpret():
    """num_real as a traced scalar (the shard_map path passes one)."""
    b, d, t = 8, 16, 512
    rng = np.random.default_rng(1)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))

    @jax.jit
    def run(q, emb, nr):
        return fused_score_topk(q, emb, 5, nr, block_t=256, interpret=True)

    vals, idx = run(q, emb, jnp.int32(300))
    evals, eidx = _reference(q, emb, 5, 300)
    np.testing.assert_array_equal(np.asarray(idx), eidx)


def test_fused_topk_large_k_interpret():
    """k=64 (deep retrieval): slot-buffer consolidations cycle many times
    and the fallback pass loop runs 64 deep — selection must still match
    the quantized reference exactly."""
    b, d, t = 8, 32, 2048
    rng = np.random.default_rng(11)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))
    vals, idx = fused_score_topk(
        q, emb, 64, t, block_t=256, interpret=True, variant="packed"
    )
    evals, eidx = _reference(q, emb, 64, t, quantized=True)
    np.testing.assert_array_equal(np.asarray(idx), eidx)


def test_fused_topk_k_exceeds_slot_buffer_interpret():
    """k larger than the default 64-slot candidate buffer: the kernel
    must widen the buffer (slots >= k invariant) — with slots pinned at
    64 the consolidation schedule can't guarantee k free appends and a
    crowded block would silently drop candidates past the buffer cap."""
    b, d, t = 4, 32, 1024
    rng = np.random.default_rng(12)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))
    vals, idx = fused_score_topk(
        q, emb, 96, t, block_t=256, interpret=True, variant="packed"
    )
    evals, eidx = _reference(q, emb, 96, t, quantized=True)
    np.testing.assert_array_equal(np.asarray(idx), eidx)


@pytest.mark.parametrize("variant", ["exact", "packed"])
def test_fused_topk_fully_padded_shard_interpret(variant):
    """num_real=0 (a fully-padded shard — possible with from_embeddings
    capacity headroom): results must be FINITE large-negative values with
    in-range indices, so the cross-shard merge can never crash on a
    decoded-NaN key or an ids[2**30] lookup (ADVICE.md r1)."""
    b, d, t = 8, 16, 512
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(t, d)).astype(np.float32))
    vals, idx = fused_score_topk(
        q, emb, 5, 0, block_t=256, interpret=True, variant=variant
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert np.isfinite(vals).all()
    assert (vals < -1e37).all()  # always loses a merge vs any real score
    assert ((idx >= 0) & (idx < t)).all()


def test_pick_kernel_config():
    """The r3 MEASURED policy (docs/kernels.md bisect): scores tile
    B*block_t capped at 1M fp32 elements — the v5e pipelining knee —
    and the batch is never row-group-split at block_t=4096."""
    from sse_tpu.ops.fused_topk import pick_kernel_config

    assert pick_block_t(4096 * 305, 256, 128, 4) == 4096
    assert pick_block_t(4096 * 305, 256, 128, 2) == 4096
    # exact variant has no key/harvest buffers
    assert pick_block_t(4096 * 305, 256, 128, 4, packed=False) == 4096
    assert pick_block_t(4096 * 305, 64, 128, 4) == 4096
    assert pick_block_t(1000, 8, 128, 4) is None  # no pow2 divisor
    assert pick_block_t(512, 8, 128, 4) == 512
    # large batches shrink block_t to hold the scores tile at 1M elems
    # (B=512/bt=2048 measured 99k QPS vs 40-73k for every bt=4096 shape)
    assert pick_kernel_config(4096 * 16, 512, 128, 4) == (2048, 256)
    assert pick_kernel_config(4096 * 16, 1024, 128, 4) == (1024, 256)
    assert pick_kernel_config(4096 * 16, 2048, 128, 4) == (512, 256)
    # no batch splitting at 4096 (B=512 split measured 12.8 vs 7.0 ms)
    assert pick_kernel_config(4096 * 305, 256, 128, 2) == (4096, 256)
    assert pick_kernel_config(4096 * 16, 128, 128, 2) == (4096, 128)


@pytest.mark.parametrize("group", [4, 8, 16, 32])  # 16: tail group of 8
def test_fused_topk_row_groups_interpret(group):
    """The r3 row-group kernel must be EXACT for every group size,
    including groups that don't divide the batch (tail group) and
    num_real boundaries (per-group fallback masking)."""
    b, d, t = 24, 32, 1024
    rng = np.random.default_rng(7)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))
    for num_real in (t, t - 100):
        vals, idx = fused_score_topk(
            q, emb, 10, num_real, block_t=256, interpret=True,
            variant="packed", group=group,
        )
        evals, eidx = _reference(q, emb, 10, num_real, quantized=True)
        np.testing.assert_array_equal(np.asarray(idx), eidx)
        np.testing.assert_allclose(np.asarray(vals), evals, rtol=2e-2)


def test_engine_pallas_flag_cpu_interpret():
    """use_pallas + interpret path through build_fused_query_fn matches the
    XLA path end-to-end (single device)."""
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig, init_params
    from sse_tpu.serve.engine import build_fused_query_fn

    model_cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=TowerConfig(
            vocab_size=60, embed_dim=16, hidden=16, encoding_dim=16
        ),
    )
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(512, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb = jnp.asarray(emb)
    tokens = jnp.asarray(rng.integers(2, 60, size=(8, 12)), jnp.int32)
    lengths = jnp.full((8,), 12, jnp.int32)

    xla_fn = build_fused_query_fn(model_cfg, k=5, num_real=500, use_pallas=False)
    pl_fn = build_fused_query_fn(
        model_cfg, k=5, num_real=500, use_pallas=True, interpret=True,
        pallas_variant="exact",  # plumbing test: compare bit-equal to XLA
    )
    xv, xi = xla_fn(params, emb, tokens, lengths)
    pv, pi = pl_fn(params, emb, tokens, lengths)
    np.testing.assert_array_equal(np.asarray(xi), np.asarray(pi))
    np.testing.assert_allclose(np.asarray(xv), np.asarray(pv), rtol=1e-5)


def test_fused_topk_massive_ties_interpret():
    """Adversarial ties: low-cardinality scores force equal keys across
    blocks and within blocks; both variants must stay consistent with
    their references (packed keys remain unique by construction)."""
    b, d, t = 8, 16, 768
    rng = np.random.default_rng(7)
    # embeddings quantized to +-1 → many exactly-equal dot products
    q = jnp.asarray(np.sign(rng.normal(size=(b, d))).astype(np.float32))
    emb = jnp.asarray(np.sign(rng.normal(size=(t, d))).astype(np.float32))
    for variant in ("exact", "packed"):
        vals, idx = fused_score_topk(
            q, emb, 10, t, block_t=256, interpret=True, variant=variant
        )
        evals, eidx = _reference(q, emb, 10, t, quantized=(variant == "packed"))
        np.testing.assert_array_equal(np.asarray(idx), eidx)
        # no duplicate rows within any result
        for r in np.asarray(idx):
            assert len(set(r)) == 10


def test_fused_topk_matmul_precision_seed2_interpret():
    """Regression pin for a latent test-harness flake found in r2.5: jax's
    DEFAULT matmul precision truncates fp32 operands to bfloat16 (on this
    build even on CPU), so kernel-vs-numpy exact index comparisons only
    hold for bf16-representable inputs. With raw fp32 inputs this exact
    seed/shape flips a rank near a quantization-bucket boundary (col 120
    vs 1414 at b=2, t=2048, k=4) for the kernel AND any other
    default-precision consumer — which is why every exact-compare test in
    this file rounds its inputs through bf16 first."""
    rng = np.random.default_rng(2)
    b, d, t, k = 2, 32, 2048, 4
    q = _bf16r(rng.normal(size=(b, d)).astype(np.float32))
    emb = _bf16r(rng.normal(size=(t, d)).astype(np.float32))
    vals, idx = fused_score_topk(
        jnp.asarray(q), jnp.asarray(emb), k, t, block_t=1024, interpret=True
    )
    evals, eidx = _reference(q, emb, k, t, quantized=True)
    np.testing.assert_array_equal(np.asarray(idx), eidx)


@pytest.mark.parametrize("num_real_frac", ["full", "boundary", "half"])
def test_sharded_pallas_serving_program_interpret(num_real_frac):
    """The north-star 8-chip serving composition — the Pallas kernel
    running PER-SHARD inside shard_map over a {model:8} mesh with the
    cross-shard exact merge — executed end to end (r2 verdict item 2:
    this composition had never run; every sharded test used the XLA
    backend). Asserts == the single-device Pallas program, covering
    per-shard num_real clipping: 'boundary' puts the real/padding edge
    inside shard 7, 'half' leaves shards 4-7 fully padded."""
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig, init_params
    from sse_tpu.parallel import make_mesh
    from sse_tpu.serve.engine import build_fused_query_fn
    from jax.sharding import NamedSharding, PartitionSpec as P

    model_cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=TowerConfig(
            vocab_size=60, embed_dim=16, hidden=16, encoding_dim=16
        ),
    )
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    rng = np.random.default_rng(11)
    t_pad = 8 * 512  # 512 rows/shard = the kernel's smallest block
    num_real = {"full": t_pad, "boundary": t_pad - 300, "half": t_pad // 2}[
        num_real_frac
    ]
    emb = np.zeros((t_pad, 16), np.float32)
    emb[:num_real] = rng.normal(size=(num_real, 16))
    emb[:num_real] /= np.linalg.norm(emb[:num_real], axis=1, keepdims=True)
    emb = jnp.asarray(_bf16r(emb))
    tokens = jnp.asarray(rng.integers(2, 60, size=(8, 12)), jnp.int32)
    lengths = jnp.full((8,), 12, jnp.int32)

    mesh = make_mesh(data=1, model=8)
    emb_sharded = jax.device_put(emb, NamedSharding(mesh, P("model", None)))
    sharded_fn = build_fused_query_fn(
        model_cfg, k=5, num_real=num_real, mesh=mesh, use_pallas=True,
        interpret=True, pallas_variant="packed",
    )
    sv, si = sharded_fn(params, emb_sharded, tokens, lengths)

    single_fn = build_fused_query_fn(
        model_cfg, k=5, num_real=num_real, use_pallas=True,
        interpret=True, pallas_variant="packed",
    )
    rv, ri = single_fn(params, emb, tokens, lengths)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))
    np.testing.assert_allclose(
        np.asarray(sv), np.asarray(rv), rtol=1e-5, atol=1e-6
    )
    # and against the quantized argsort reference (the packed variant
    # selects on 11-mantissa-bit keys, so near-ties may legitimately
    # swap vs the exact XLA ranking — compare like with like)
    from sse_tpu.models import sse as _sse

    q = np.asarray(
        _sse.encode_source(params, model_cfg, tokens, lengths)
    ).astype(np.float32)
    _, eidx = _reference(
        q, np.asarray(emb, np.float32), 5, num_real, quantized=True
    )
    np.testing.assert_array_equal(np.asarray(si), eidx)


@pytest.mark.parametrize("variant", ["exact", "packed"])
@pytest.mark.parametrize("dma_span", [2, 4])
def test_fused_topk_dma_span_interpret(dma_span, variant):
    """dma_span streams several block_t chunks per grid step (per-transfer
    DMA issue amortization); selection must be identical to span=1,
    including the num_real boundary landing mid-span."""
    b, d, t = 8, 32, 2048
    rng = np.random.default_rng(21)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))
    for num_real in (t, t - 300):
        v1, i1 = fused_score_topk(
            q, emb, 10, num_real, block_t=256, interpret=True,
            variant=variant,
        )
        vs, is_ = fused_score_topk(
            q, emb, 10, num_real, block_t=256, interpret=True,
            variant=variant, dma_span=dma_span,
        )
        np.testing.assert_array_equal(np.asarray(is_), np.asarray(i1))
        np.testing.assert_allclose(
            np.asarray(vs), np.asarray(v1), rtol=1e-6
        )


@pytest.mark.parametrize("group", [4, 8])
def test_fused_topk_multigroup_interpret(group):
    """Multi-row-group path with the r4 per-group matmul + shared scores
    scratch + fori_loop fallback: results must equal the reference at
    ngroups in {2, 4}, including duplicate rows (deep fallback passes)
    and a padding boundary (boundary blocks route into the fallback)."""
    b, d, t = 16, 32, 1024
    rng = np.random.default_rng(3)
    qa = np.array(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    qa[7] = qa[3]  # duplicate query rows → identical harvests
    q = jnp.asarray(qa)
    ea = np.array(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))
    ea[500:508] = ea[100:108]  # duplicate index rows → cross-block ties
    emb = jnp.asarray(ea)
    num_real = t - 5
    vals, idx = fused_score_topk(
        q, emb, 10, num_real, block_t=256, interpret=True,
        variant="packed", group=group,
    )
    evals, eidx = _reference(q, emb, 10, num_real, quantized=True)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=2e-2)


# ---------------------------------------------------- two-phase (r5)


def _tp(q, emb, k, num_real, **kw):
    """One-jit wrapper: the mid-pass is plain XLA and compiles per-op
    (slowly) in eager mode; tests always run it jitted."""
    from sse_tpu.ops.fused_topk import fused_score_topk_twophase

    return jax.jit(
        lambda q, e: fused_score_topk_twophase(
            q, e, k, num_real, interpret=True, **kw
        )
    )(q, emb)


@pytest.mark.parametrize("num_real_off", [0, 3, 100])
@pytest.mark.parametrize("k", [1, 10])
def test_twophase_matches_packed_interpret(k, num_real_off):
    """The two-phase block-max kernel selects IDENTICALLY to the
    streaming packed kernel (same quantized keys, same tie order)."""
    b, d, t = 8, 32, 1024
    rng = np.random.default_rng(0)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))
    num_real = t - num_real_off
    vals, idx = _tp(q, emb, k, num_real, block_t=64)
    evals, eidx = fused_score_topk(
        q, emb, k, num_real, block_t=64, interpret=True, variant="packed"
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(eidx))
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(evals))


@pytest.mark.parametrize("span", [2, 4])
def test_twophase_span_matches_span1_interpret(span):
    """Phase-1 `span` (blocks per grid step, one DMA of span*block_t
    rows) is a pure scheduling knob: selection AND values are
    bit-identical to span=1 — incl. the padded tail block, whose
    masking depends on the per-sub-block row0 the span loop computes."""
    b, d, t = 8, 32, 1024
    rng = np.random.default_rng(7)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))
    num_real = t - 37
    v1, i1 = _tp(q, emb, 10, num_real, block_t=64)
    vs, ixs = _tp(q, emb, 10, num_real, block_t=64, span=span)
    np.testing.assert_array_equal(np.asarray(ixs), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(v1))


def test_twophase_massive_ties_interpret():
    """Tied quantized keys resolve to the earliest block then the lowest
    column — the streaming kernel's contract."""
    b, d, t = 8, 32, 1024
    rng = np.random.default_rng(3)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(
        np.tile(_bf16r(rng.normal(size=(16, d)).astype(np.float32)), (64, 1))
    )
    vals, idx = _tp(q, emb, 10, t, block_t=64)
    evals, eidx = fused_score_topk(
        q, emb, 10, t, block_t=64, interpret=True, variant="packed"
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(eidx))


def test_twophase_int8_near_ties_exact_interpret():
    """int8 selection stays UNCONDITIONALLY exact through the two-phase
    path (integer keys in both phases): +/-1-unit near-ties agree with
    argsort over the exact int32 scores, values included."""
    from sse_tpu.ops.fused_topk import quantize_queries_int8

    d = 8
    base = jnp.zeros((256, d), jnp.int8).at[:, 0].set(127)
    pert = jax.random.randint(jax.random.PRNGKey(9), (256, d), -1, 2, jnp.int32)
    emb = jnp.clip(base.astype(jnp.int32) + pert, -127, 127).astype(jnp.int8)
    q = jnp.zeros((4, d), jnp.float32).at[:, 0].set(1.0)
    s = np.asarray(
        jnp.dot(
            quantize_queries_int8(q).astype(jnp.int32),
            emb.astype(jnp.int32).T,
        )
    )
    order = np.argsort(-s, axis=1, kind="stable")[:, :10]
    vals, idx = _tp(q, emb, 10, 256, block_t=16)
    np.testing.assert_array_equal(np.asarray(idx), order)
    np.testing.assert_allclose(
        np.asarray(vals),
        np.take_along_axis(s, order, axis=1) / (127.0 * 127.0),
        rtol=0,
        atol=0,
    )


def test_twophase_fully_padded_and_traced_num_real_interpret():
    b, d, t = 4, 32, 512
    rng = np.random.default_rng(1)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))
    # fully padded shard: in-range ids, sink values
    vals, idx = _tp(q, emb, 5, 0, block_t=64)
    assert int(jnp.max(idx)) < t
    assert float(jnp.max(vals)) < -1e30
    # traced num_real matches the static streaming kernel
    from sse_tpu.ops.fused_topk import fused_score_topk_twophase

    f = jax.jit(
        lambda q, e, nr: fused_score_topk_twophase(
            q, e, 5, nr, block_t=64, interpret=True
        )
    )
    v3, i3 = f(q, emb, jnp.asarray(300, jnp.int32))
    v4, i4 = fused_score_topk(
        q, emb, 5, 300, block_t=64, interpret=True, variant="packed"
    )
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i4))


def test_twophase_k_equals_nblocks_and_validation():
    from sse_tpu.ops.fused_topk import fused_score_topk_twophase

    b, d, t = 4, 32, 512
    rng = np.random.default_rng(2)
    q = jnp.asarray(_bf16r(rng.normal(size=(b, d)).astype(np.float32)))
    emb = jnp.asarray(_bf16r(rng.normal(size=(t, d)).astype(np.float32)))
    # k == nblocks: every block is a candidate — trivially exact
    vals, idx = _tp(q, emb, 8, t, block_t=64)
    evals, eidx = fused_score_topk(
        q, emb, 8, t, block_t=64, interpret=True, variant="packed"
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(eidx))
    with pytest.raises(ValueError, match="k <= nblocks"):
        fused_score_topk_twophase(q, emb, 9, t, block_t=64, interpret=True)
    with pytest.raises(ValueError, match="not a multiple"):
        fused_score_topk_twophase(q, emb, 4, t, block_t=100, interpret=True)
