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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from sse_tpu.parallel import distributed, make_mesh  # noqa: E402


def main() -> int:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    distributed.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from sse_tpu.data.corpus import EncodedPairs, TargetSpace
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig
    from sse_tpu.parallel.topk import distributed_topk
    from sse_tpu.train import LossConfig, TrainConfig, train

    # ---- deterministic tiny corpus (identical on every process) --------
    rng = np.random.default_rng(0)
    n, l, v, t = 64, 8, 40, 12
    src = rng.integers(2, v, size=(n, l)).astype(np.int32)
    src_len = rng.integers(2, l + 1, size=(n,)).astype(np.int32)
    labels = rng.integers(0, t, size=(n,)).astype(np.int32)
    pairs = EncodedPairs(
        src=src,
        src_len=src_len,
        labels=labels,
        label_sets=[(int(x),) for x in labels],
    )
    tspace = TargetSpace(
        ids=[f"t{i}" for i in range(t)],
        texts=["x"] * t,
        tokens=np.zeros((t, l), np.int32),
        lengths=np.ones((t,), np.int32),
        id_to_row={f"t{i}": i for i in range(t)},
    )
    model_cfg = SSEConfig(
        mode=NetworkMode.SOURCE_ENCODER_ONLY,
        src_tower=TowerConfig(
            vocab_size=v, embed_dim=8, hidden=8, encoding_dim=8
        ),
        num_targets=t,
    )
    cfg = TrainConfig(
        batch_size=16,
        max_epochs=2,
        loss=LossConfig(kind="full"),
        steps_per_checkpoint=10_000,
    )

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
    table = np.asarray(state.params["target_table"])  # replicated → host ok

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
                "table_sum": float(table.sum()),
                "table_abs": float(np.abs(table).sum()),
                "step": int(state.step),
                "topk_ok": bool((np.asarray(idx) == expect).all()),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
