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
