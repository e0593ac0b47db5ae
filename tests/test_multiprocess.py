"""Real multi-PROCESS integration (VERDICT r1 item 3): two OS processes,
each with 2 fake CPU devices, joined by jax.distributed into one 4-device
mesh. Verifies the whole §2.3 stack — coordinator bring-up, global-array
assembly from per-process batch slices, SPMD train step, cross-process
distributed top-k — and that the result matches a single-process run."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_topk():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=_REPO,
        )
        for i in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r

    r0, r1 = results[0], results[1]
    # both processes computed the SAME globally-reduced model
    assert r0["step"] == r1["step"] == 8  # 64 pairs / batch 16 * 2 epochs
    assert r0["table_sum"] == pytest.approx(r1["table_sum"], rel=1e-6)
    assert r0["topk_ok"] and r1["topk_ok"]

    # ... and it matches a single-process run of the same global batches
    from sse_tpu.data.corpus import EncodedPairs, TargetSpace
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig
    from sse_tpu.train import LossConfig, TrainConfig, train

    rng = np.random.default_rng(0)
    n, l, v, t = 64, 8, 40, 12
    src = rng.integers(2, v, size=(n, l)).astype(np.int32)
    src_len = rng.integers(2, l + 1, size=(n,)).astype(np.int32)
    labels = rng.integers(0, t, size=(n,)).astype(np.int32)
    pairs = EncodedPairs(
        src=src, src_len=src_len, labels=labels,
        label_sets=[(int(x),) for x in labels],
    )
    tspace = TargetSpace(
        ids=[f"t{i}" for i in range(t)], texts=["x"] * t,
        tokens=np.zeros((t, l), np.int32), lengths=np.ones((t,), np.int32),
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
        batch_size=16, max_epochs=2, loss=LossConfig(kind="full"),
        steps_per_checkpoint=10_000,
    )
    state = train(model_cfg, cfg, pairs, tspace)
    table = np.asarray(state.params["target_table"])
    assert r0["table_sum"] == pytest.approx(float(table.sum()), rel=2e-4)
    assert r0["table_abs"] == pytest.approx(
        float(np.abs(table).sum()), rel=2e-4
    )
