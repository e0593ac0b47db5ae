"""Reference-format data ingest runbook test (VERDICT r3 item 8).

The reference's demo corpora (SURVEY.md §2.1 L7 row: `rawdata-*/` with
`TrainPairs`, `EvalPairs`, `targetIDs` TSVs) are unreachable in this
environment, so this fixture is the CONTRACT: a hand-authored corpus in
the exact reference file format — including the edge cases real dumps
carry (multi-label `tid1|tid2` and comma-separated target ids, unicode
source/target text, CRLF line endings, blank lines, malformed rows) —
driven end-to-end through the real CLI (train → index → eval → export).
The day real reference data appears, `make parity-real DATA_DIR=...`
runs this exact path on it (docs/real_data.md).
"""

import json
import os
import subprocess
import sys

import numpy as np
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


# 12 targets; texts exercise unicode (CJK, umlauts, accents) — the
# reference corpora were eBay multilingual listing data
_TARGETS = [
    ("cat_0", "phone case for iphone"),
    ("cat_1", "laptop sleeve neoprene"),
    ("cat_2", "usb c charging cable"),
    ("cat_3", "wireless bluetooth earbuds"),
    ("cat_4", "Schraubendreher Satz Werkzeug"),  # de
    ("cat_5", "étui coque téléphone"),  # fr accents
    ("cat_6", "手机 保护 壳"),  # zh
    ("cat_7", "mechanical keyboard switches"),
    ("cat_8", "garden hose nozzle sprayer"),
    ("cat_9", "running shoes women"),
    ("cat_10", "coffee grinder burr manual"),
    ("cat_11", "dog leash retractable nylon"),
]

# source → label(s); a few rows are multi-label in BOTH reference
# spellings (pipe and comma), plus noise rows the reader must skip
_TRAIN = [
    ("new phone case cover", "cat_0"),
    ("iphone protective case", "cat_0"),
    ("neoprene laptop bag sleeve", "cat_1"),
    ("13 inch laptop sleeve", "cat_1"),
    ("usb type c cable fast", "cat_2"),
    ("charging cable braided", "cat_2"),
    ("bluetooth earbuds wireless", "cat_3"),
    ("true wireless earphones", "cat_3"),
    ("werkzeug schraubendreher set", "cat_4"),
    ("präzisions schraubendreher", "cat_4"),
    ("coque pour téléphone", "cat_5"),
    ("étui portable rouge", "cat_5"),
    ("手机 壳 透明", "cat_6"),
    ("保护 壳 手机 新", "cat_6"),
    ("keyboard switches tactile", "cat_7"),
    ("mechanical keyboard kit", "cat_7"),
    ("hose nozzle garden water", "cat_8"),
    ("sprayer nozzle adjustable", "cat_8"),
    ("women running shoes mesh", "cat_9"),
    ("lightweight running sneakers", "cat_9"),
    ("manual coffee grinder", "cat_10"),
    ("burr grinder ceramic", "cat_10"),
    ("retractable dog leash", "cat_11"),
    ("nylon leash for dogs", "cat_11"),
    # multi-label: phone-case query relevant to two categories
    ("téléphone case étui iphone", "cat_0|cat_5"),
    ("phone 手机 case 壳", "cat_0,cat_6"),
] * 3  # enough rows for a few batches

_EVAL = [
    ("case for my iphone", "cat_0"),
    ("laptop sleeve 15 inch", "cat_1"),
    ("fast usb c cable", "cat_2"),
    ("wireless earbuds bluetooth", "cat_3"),
    ("schraubendreher werkzeug", "cat_4"),
    ("étui téléphone", "cat_5"),
    ("手机 保护", "cat_6"),
    ("keyboard mechanical", "cat_7"),
    ("garden sprayer nozzle", "cat_8"),
    ("running shoes", "cat_9"),
    ("coffee burr grinder", "cat_10"),
    ("dog leash nylon", "cat_11"),
    ("iphone étui case", "cat_0|cat_5"),  # multi-label eval row
]


def write_fixture(data_dir: str) -> None:
    """Write the corpus in the EXACT reference layout, deliberately
    messy: CRLF endings on targetIDs, blank lines, a tab-less row."""
    os.makedirs(data_dir, exist_ok=True)
    with open(
        os.path.join(data_dir, "TrainPairs"), "w", encoding="utf-8"
    ) as f:
        f.write("\n")  # leading blank line
        for src, tid in _TRAIN:
            f.write(f"{src}\t{tid}\n")
        f.write("malformed row with no tab\n")
        f.write("\n")
    # CRLF endings: real-world dumps carry them; ids must not keep \r
    with open(
        os.path.join(data_dir, "EvalPairs"), "w", encoding="utf-8",
        newline="",
    ) as f:
        for src, tid in _EVAL:
            f.write(f"{src}\t{tid}\r\n")
    with open(
        os.path.join(data_dir, "targetIDs"), "w", encoding="utf-8",
        newline="",
    ) as f:
        for tid, text in _TARGETS:
            f.write(f"{tid}\t{text}\r\n")


def test_readers_handle_reference_edge_cases(tmp_path):
    """Unit level: the TSV readers on the messy fixture."""
    from sse_tpu.data.corpus import read_pairs_tsv, read_targets_tsv

    data = str(tmp_path / "data")
    write_fixture(data)
    train = read_pairs_tsv(os.path.join(data, "TrainPairs"))
    assert len(train) == len(_TRAIN)  # blanks + malformed row skipped
    # pipe AND comma multi-label spellings both split
    multi = [ids for _, ids in train if len(ids) > 1]
    assert multi and all(len(ids) == 2 for ids in multi)
    assert ["cat_0", "cat_5"] in multi and ["cat_0", "cat_6"] in multi

    targets = read_targets_tsv(os.path.join(data, "targetIDs"))
    assert [t for t, _ in targets] == [t for t, _ in _TARGETS]
    # CRLF never leaks into ids or text; unicode intact
    assert targets[6][1] == "手机 保护 壳"
    assert not any("\r" in t or "\r" in x for t, x in targets)

    ev = read_pairs_tsv(os.path.join(data, "EvalPairs"))
    assert ev[-1][1] == ["cat_0", "cat_5"]


@pytest.mark.slow
def test_reference_format_end_to_end(tmp_path):
    """The `make parity-real DATA_DIR=...` path: reference-format TSVs
    (no demo-data step) through train → index → eval → TSV export."""
    wd = str(tmp_path)
    write_fixture(os.path.join(wd, "data"))

    r = run_cli(
        [
            "train", "--task_type", "classification", "--data_dir", "data",
            "--model_dir", "run", "--max_epochs", "6", "--batch_size", "16",
            "--embed_dim", "16", "--hidden", "16", "--encoding_dim", "16",
            "--vocab_size", "300", "--max_seq_length", "12",
            "--steps_per_checkpoint", "50", "--learning_rate", "0.05",
        ],
        wd,
    )
    assert r.returncode == 0, r.stderr
    assert "final eval" in r.stdout

    r = run_cli(
        ["index", "--model_dir", "run", "--data_dir", "data",
         "--export_tsv", "run/targetEncodingIndex.tsv"],
        wd,
    )
    assert r.returncode == 0, r.stderr
    assert "built index: 12 targets" in r.stdout
    # export keeps unicode ids/texts intact (reference
    # targetEncodingIndex.tsv format: id \t text \t space-separated vec)
    lines = (
        (tmp_path / "run" / "targetEncodingIndex.tsv")
        .read_text(encoding="utf-8")
        .splitlines()
    )
    assert len(lines) == 12
    by_id = {l.split("\t")[0]: l.split("\t") for l in lines}
    assert by_id["cat_6"][1] == "手机 保护 壳"
    vec = np.asarray([float(x) for x in by_id["cat_6"][2].split()])
    assert vec.shape == (16,) and np.isfinite(vec).all()

    r = run_cli(["eval", "--model_dir", "run", "--data_dir", "data"], wd)
    assert r.returncode == 0, r.stderr
    metrics = json.loads(
        r.stdout.strip().splitlines()[-1].replace("[sse] ", "")
    )
    # the multi-label eval row counts a hit on EITHER label; 12 easy
    # targets must be essentially solved
    assert metrics["recall@1"] >= 0.75, metrics
    assert metrics["recall@10"] >= 0.9, metrics
