"""Worker for the 2-process jax.distributed integration test.

Spawned by tests/test_multiprocess.py as:
    python tests/_mp_worker.py <process_id> <num_processes> <coordinator>

Each process owns 2 fake CPU devices; together they form one global
4-device mesh. The worker trains a tiny deterministic model through the
REAL sse_tpu.train.train() multi-host path and runs a cross-process
distributed top-k, then prints one JSON line the parent compares across
processes and against a single-process reference.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if __name__ == "__main__":  # worker process only: the parent pytest
    # process imports this module for build_problem/params_sums and must
    # not have its own (8-device) backend config clobbered
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

from sse_tpu.parallel import distributed, make_mesh  # noqa: E402


def build_problem(mode: str):
    """Deterministic tiny problem, identical on every process.

    mode='full':     source-encoder-only + full softmax (the r2 test).
    mode='flagship': the SHIPPED ranking-preset loss path — dual-encoder
    towers, sampled softmax + mined hard negatives (whose tgt_emb_cache
    must stay consistent across processes), multi-label rows exercising
    the packed labels_multi columns (r2 verdict item 5)."""
    from sse_tpu.data.corpus import EncodedPairs, TargetSpace
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig
    from sse_tpu.train import LossConfig, TrainConfig

    rng = np.random.default_rng(0)
    n, l, v, t = 64, 8, 40, 12
    src = rng.integers(2, v, size=(n, l)).astype(np.int32)
    src_len = rng.integers(2, l + 1, size=(n,)).astype(np.int32)
    labels = rng.integers(0, t, size=(n,)).astype(np.int32)
    labels_multi = None
    if mode == "flagship":
        # a quarter of the rows carry a second label (label-set masking)
        labels_multi = np.full((n, 2), -1, np.int32)
        labels_multi[:, 0] = labels
        second = rng.integers(0, t, size=(n,)).astype(np.int32)
        take = rng.random(n) < 0.25
        labels_multi[take, 1] = second[take]
    pairs = EncodedPairs(
        src=src,
        src_len=src_len,
        labels=labels,
        label_sets=[(int(x),) for x in labels],
        labels_multi=labels_multi,
    )
    tok = (
        rng.integers(2, v, size=(t, l)).astype(np.int32)
        if mode == "flagship"
        else np.zeros((t, l), np.int32)
    )
    tspace = TargetSpace(
        ids=[f"t{i}" for i in range(t)],
        texts=["x"] * t,
        tokens=tok,
        lengths=np.full((t,), l if mode == "flagship" else 1, np.int32),
        id_to_row={f"t{i}": i for i in range(t)},
    )
    tw = TowerConfig(vocab_size=v, embed_dim=8, hidden=8, encoding_dim=8)
    if mode == "flagship":
        model_cfg = SSEConfig(
            mode=NetworkMode.DUAL_ENCODER, src_tower=tw, tgt_tower=tw
        )
        cfg = TrainConfig(
            batch_size=16,
            max_epochs=2,
            loss=LossConfig(
                kind="sampled", num_negatives=16, num_hard_negatives=4
            ),
            hard_negative_refresh=3,  # several cache refreshes in 8 steps
            steps_per_checkpoint=10_000,
        )
    else:
        model_cfg = SSEConfig(
            mode=NetworkMode.SOURCE_ENCODER_ONLY,
            src_tower=tw,
            num_targets=t,
        )
        cfg = TrainConfig(
            batch_size=16,
            max_epochs=2,
            loss=LossConfig(kind="full"),
            steps_per_checkpoint=10_000,
        )
    return pairs, tspace, model_cfg, cfg


def serve_problem():
    """Deterministic serving problem, identical on every process AND in
    the parent's single-process reference run: a dual-encoder model with
    random-but-seeded params, a 50-row float32 index, 8 queries."""
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig
    from sse_tpu.models.sse import init_params

    rng = np.random.default_rng(7)
    tw = TowerConfig(vocab_size=40, embed_dim=8, hidden=8, encoding_dim=16)
    model_cfg = SSEConfig(
        mode=NetworkMode.DUAL_ENCODER, src_tower=tw, tgt_tower=tw
    )
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    emb = rng.standard_normal((50, 16)).astype(np.float32)
    ids = [f"d{i}" for i in range(50)]
    texts = [f"doc {i}" for i in range(50)]
    tokens = rng.integers(2, 40, size=(8, 6)).astype(np.int32)
    lengths = np.full((8,), 6, np.int32)
    return emb, ids, texts, model_cfg, params, tokens, lengths


def params_sums(params):
    leaves = jax.tree.leaves(params)
    return (
        float(sum(np.asarray(x).sum() for x in leaves)),
        float(sum(np.abs(np.asarray(x)).sum() for x in leaves)),
    )


def main() -> int:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "full"
    distributed.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from sse_tpu.parallel.topk import distributed_topk
    from sse_tpu.train import train

    if mode == "serve":
        # SERVING over a multi-process mesh (VERDICT r3 item 6): the index
        # rows live sharded across BOTH processes' devices, the fused
        # query program (encode → per-shard top-k → all_gather merge)
        # runs over the global mesh, and every process must see the SAME
        # (vals, rows) — which the parent then checks against a
        # single-process run of the identical problem.
        import jax.numpy as jnp
        from jax.sharding import NamedSharding

        from sse_tpu.index.sharded_index import from_embeddings
        from sse_tpu.serve.engine import build_fused_query_fn

        mesh_t = make_mesh(data=1, model=2 * nproc)
        emb, ids, texts, model_cfg, params, tokens, lengths = serve_problem()
        rep = NamedSharding(mesh_t, P())
        params = jax.device_put(params, rep)
        tokens = jax.device_put(jnp.asarray(tokens), rep)
        lengths = jax.device_put(jnp.asarray(lengths), rep)
        idx = from_embeddings(emb, ids, texts, mesh=mesh_t)
        fused = build_fused_query_fn(
            model_cfg, k=5, num_real=idx.num_real, mesh=mesh_t
        )
        vals, rows = fused(params, idx.emb, tokens, lengths)
        print(
            "RESULT "
            + json.dumps(
                {
                    "pid": pid,
                    "vals": np.asarray(vals).tolist(),
                    "rows": np.asarray(rows).tolist(),
                }
            ),
            flush=True,
        )
        return 0

    if mode == "indexsave":
        # multi-process npy save: every process writes its own shards,
        # process 0 the metadata; the PARENT reloads single-process and
        # compares against this deterministic matrix
        from sse_tpu.index.sharded_index import from_embeddings

        out_dir = sys.argv[5]
        mesh_t = make_mesh(data=1, model=2 * nproc)
        emb = (
            np.random.default_rng(42)
            .standard_normal((50, 16))
            .astype(np.float32)
        )
        idx = from_embeddings(
            emb,
            [f"d{i}" for i in range(50)],
            [f"text\t{i}\n" for i in range(50)],  # exercise escaping too
            mesh=mesh_t,
        )
        idx.save(out_dir)
        print("RESULT " + json.dumps({"pid": pid, "saved": True}), flush=True)
        return 0

    pairs, tspace, model_cfg, cfg = build_problem(mode)

    mesh = make_mesh(data=2 * nproc, model=1)
    state = train(
        model_cfg,
        cfg,
        pairs,
        tspace,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        mesh=mesh,
    )
    table_sum, table_abs = params_sums(state.params)

    # ---- cross-process distributed exact top-k -------------------------
    mesh_t = make_mesh(data=1, model=2 * nproc)
    scores = np.random.default_rng(1).normal(size=(4, 32)).astype(np.float32)
    cols = 32 // nproc
    local = scores[:, pid * cols : (pid + 1) * cols]
    gscores = multihost_utils.host_local_array_to_global_array(
        local, mesh_t, P(None, "model")
    )
    vals, idx = distributed_topk(gscores, 5, mesh_t)
    expect = np.argsort(-scores, axis=1)[:, :5]

    print(
        "RESULT "
        + json.dumps(
            {
                "pid": pid,
                "table_sum": table_sum,
                "table_abs": table_abs,
                "step": int(state.step),
                "topk_ok": bool((np.asarray(idx) == expect).all()),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
