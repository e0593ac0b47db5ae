"""CLI smoke test: the reference's `make train` demo flow end-to-end
through the real command surface (subprocess), SURVEY.md §4 item 2."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["SSE_PLATFORM"] = "cpu:8"
    return subprocess.run(
        [sys.executable, "-m", "sse_tpu.cli", *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.slow
def test_cli_full_flow(tmp_path):
    wd = str(tmp_path)
    r = run_cli(
        [
            "demo-data", "--task", "classification", "--out_dir", "data",
            "--num_targets", "8", "--train_per_target", "8",
        ],
        wd,
    )
    assert r.returncode == 0, r.stderr
    assert os.path.exists(tmp_path / "data" / "TrainPairs")

    r = run_cli(
        [
            "train", "--task_type", "classification", "--data_dir", "data",
            "--model_dir", "run", "--max_epochs", "4", "--batch_size", "16",
            "--embed_dim", "16", "--hidden", "16", "--encoding_dim", "16",
            "--vocab_size", "200", "--max_seq_length", "12",
            "--steps_per_checkpoint", "8", "--learning_rate", "0.05",
        ],
        wd,
    )
    assert r.returncode == 0, r.stderr
    assert "final eval" in r.stdout
    assert os.path.exists(tmp_path / "run" / "config.json")
    assert os.path.exists(tmp_path / "run" / "metrics.jsonl")

    r = run_cli(
        ["index", "--model_dir", "run", "--data_dir", "data",
         "--export_tsv", "run/idx.tsv"],
        wd,
    )
    assert r.returncode == 0, r.stderr
    assert "built index: 8 targets" in r.stdout
    assert os.path.exists(tmp_path / "run" / "idx.tsv")

    r = run_cli(["eval", "--model_dir", "run", "--data_dir", "data"], wd)
    assert r.returncode == 0, r.stderr
    result = json.loads(r.stdout.strip().splitlines()[-1].replace("[sse] ", ""))
    assert "recall@1" in result and result["recall@1"] >= 0

    # error path: new model_dir without --task_type
    r = run_cli(["train", "--data_dir", "data", "--model_dir", "fresh"], wd)
    assert r.returncode == 2
    assert "task_type" in r.stderr

    # --- the r1-untested subcommands (VERDICT r1 item 8), reusing the
    # trained model_dir from above ---

    # eval --use_index: score through the built sharded index
    r = run_cli(
        ["eval", "--model_dir", "run", "--data_dir", "data", "--use_index"],
        wd,
    )
    assert r.returncode == 0, r.stderr
    result = json.loads(
        r.stdout.strip().splitlines()[-1].replace("[sse] ", "")
    )
    assert "recall@1" in result

    # visualize: projector TSV export
    r = run_cli(
        ["visualize", "--model_dir", "run", "--out_dir", "viz"], wd
    )
    assert r.returncode == 0, r.stderr
    tensors = (tmp_path / "viz" / "tensors.tsv").read_text().splitlines()
    meta = (tmp_path / "viz" / "metadata.tsv").read_text().splitlines()
    assert len(tensors) == 8 and len(meta) == 9  # header + 8 rows
    assert len(tensors[0].split("\t")) == 16  # encoding_dim

    # bench kinds run end-to-end on the CPU backend and emit JSON
    for kind, extra in (
        ("query", ["--num_targets", "512", "--batch", "4",
                   "--encoding_dim", "16"]),
        ("index", ["--num_targets", "256", "--batch", "32",
                   "--encoding_dim", "16"]),
        ("train", ["--num_targets", "256", "--batch", "8",
                   "--encoding_dim", "16"]),
    ):
        r = run_cli(["bench", "--kind", kind, *extra], wd)
        assert r.returncode == 0, f"bench {kind}: {r.stderr[-800:]}"
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["value"] > 0, (kind, out)

    # crash recovery (SURVEY §5 failure-detection row): SIGKILL the
    # training process mid-run, restart the same command, and training
    # resumes from the latest checkpoint toward the same max_epochs
    import signal
    import subprocess as sp
    import time as _time

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["SSE_PLATFORM"] = "cpu:8"
    crash_args = [
        sys.executable, "-m", "sse_tpu.cli", "train",
        "--task_type", "classification", "--data_dir", "data",
        "--model_dir", "crashrun", "--max_epochs", "200",
        "--batch_size", "16", "--embed_dim", "16", "--hidden", "16",
        "--encoding_dim", "16", "--vocab_size", "200",
        "--max_seq_length", "12", "--steps_per_checkpoint", "4",
    ]
    p = sp.Popen(crash_args, cwd=wd, env=env, stdout=sp.PIPE,
                 stderr=sp.STDOUT, text=True)
    deadline = _time.time() + 300
    ckpt_dir = tmp_path / "crashrun" / "ckpt"
    while _time.time() < deadline:
        steps = [d for d in ckpt_dir.glob("*") if d.name.isdigit()]
        if steps:
            break
        _time.sleep(1)
    else:
        p.kill()
        raise AssertionError("no checkpoint appeared before kill")
    p.send_signal(signal.SIGKILL)  # hard crash, no cleanup
    p.wait()
    killed_at = max(int(d.name) for d in ckpt_dir.glob("*") if d.name.isdigit())
    r = run_cli(
        ["train", "--data_dir", "data", "--model_dir", "crashrun",
         "--max_epochs", str(killed_at // 4 + 2)],  # resume, finish soon
        wd,
    )
    assert r.returncode == 0, r.stderr
    assert "restored checkpoint" in r.stdout
    assert "final eval" in r.stdout

    # bool-flag overrides parse in both spellings (regression: a4c7685)
    r = run_cli(
        [
            "train", "--task_type", "ranking", "--data_dir", "data",
            "--model_dir", "boolrun", "--max_epochs", "1",
            "--batch_size", "16", "--embed_dim", "16", "--hidden", "16",
            "--encoding_dim", "16", "--vocab_size", "200",
            "--max_seq_length", "12", "--bidirectional", "False",
            "--streaming", "true", "--num_hard_negatives", "0",
        ],
        wd,
    )
    assert r.returncode == 0, r.stderr
    cfg = json.loads((tmp_path / "boolrun" / "config.json").read_text())
    assert cfg["bidirectional"] is False and cfg["streaming"] is True


@pytest.mark.slow
def test_cli_scale_protocol_flow(tmp_path):
    """The 10M capstone protocol (BASELINE.md r3 / `make capstone`) at CI
    scale: scale-profile gen → shared-encoder train (merged-scan path,
    no mining) → int8 index (npy-v1 save) → eval through the index."""
    wd = str(tmp_path)
    r = run_cli(
        ["demo-data", "--profile", "scale", "--out_dir", "data",
         "--num_targets", "400", "--train_per_target", "2048",
         "--eval_per_target", "256"],
        wd,
    )
    assert r.returncode == 0, r.stderr
    r = run_cli(
        ["train", "--task_type", "ranking", "--network_mode",
         "shared-encoder", "--data_dir", "data", "--model_dir", "run",
         "--max_seq_length", "24", "--max_epochs", "4",
         "--num_hard_negatives", "0", "--index_dtype", "int8",
         "--steps_per_checkpoint", "1000"],
        wd,
    )
    assert r.returncode == 0, r.stderr
    r = run_cli(["index", "--model_dir", "run", "--data_dir", "data"], wd)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(tmp_path / "run" / "index" / "sidecar.json")
    assert os.path.exists(tmp_path / "run" / "index" / "docs.tsv")
    r = run_cli(
        ["eval", "--model_dir", "run", "--data_dir", "data", "--use_index"],
        wd,
    )
    assert r.returncode == 0, r.stderr
    metrics = json.loads(r.stdout.strip().splitlines()[-1].split("] ", 1)[1])
    # word-subset sources over 400 int8-indexed targets: near-perfect
    assert metrics["recall@10"] > 0.9, metrics
