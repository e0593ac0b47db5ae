"""Synthetic corpora with reference-schema files.

SURVEY.md §6 risk note: the reference's demo datasets were downloaded from
eBay hosting and are unavailable here (empty mount, no egress). This module
implements the documented fallback: synthetic corpora with the exact
TrainPairs / EvalPairs / targetIDs schema and enough learnable structure
that recall@k provably improves over random — one generator per task mode.

Structure: each target owns a pool of characteristic words; a source is a
bag of words sampled mostly from its target's pool plus noise. Cross-lingual
sources are drawn from a disjoint "source-language" word list related to the
target words by a fixed bijection, so only a model that learns the mapping
(not string overlap) scores well. QnA targets are longer passages.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Sequence, Tuple

_CONSONANTS = "bcdfghjklmnpqrstvwz"
_VOWELS = "aeiou"


def _word(rng: random.Random, syllables: int = 2) -> str:
    return "".join(
        rng.choice(_CONSONANTS) + rng.choice(_VOWELS)
        for _ in range(syllables)
    )


def _word_bank(rng: random.Random, n: int, syllables: int = 2) -> List[str]:
    bank: List[str] = []
    seen = set()
    while len(bank) < n:
        w = _word(rng, syllables)
        if w not in seen:
            seen.add(w)
            bank.append(w)
    return bank


def make_corpus(
    task: str = "classification",
    num_targets: int = 32,
    train_per_target: int = 20,
    eval_per_target: int = 4,
    words_per_target: int = 6,
    src_words: int = 5,
    noise_words: int = 1,
    seed: int = 0,
) -> Tuple[List[Tuple[str, List[str]]], List[Tuple[str, List[str]]], List[Tuple[str, str]]]:
    """Return (train_pairs, eval_pairs, target_rows) in the reference's
    row shapes (see corpus.read_pairs_tsv / read_targets_tsv)."""
    if task not in ("classification", "ranking", "crosslingual", "qna"):
        raise ValueError(f"unknown task {task!r}")
    rng = random.Random(seed)
    tgt_bank = _word_bank(rng, num_targets * words_per_target)
    noise_bank = _word_bank(rng, 50, syllables=3)
    # Cross-lingual: sources use a disjoint language; bijective word map.
    if task == "crosslingual":
        src_bank = _word_bank(rng, len(tgt_bank), syllables=4)
        translate: Dict[str, str] = dict(zip(tgt_bank, src_bank))
    else:
        translate = {w: w for w in tgt_bank}

    pools = [
        tgt_bank[i * words_per_target : (i + 1) * words_per_target]
        for i in range(num_targets)
    ]
    target_rows: List[Tuple[str, str]] = []
    for i, pool in enumerate(pools):
        if task == "qna":  # longer answer passages
            text = " ".join(pool + rng.sample(noise_bank, 3))
        elif task == "classification":  # category-name-like targets
            text = " ".join(pool[:3])
        else:  # ranking / crosslingual: listing-title-like targets
            text = " ".join(pool)
        target_rows.append((f"t{i:05d}", text))

    def sample_pairs(count_per_target: int, rng: random.Random):
        pairs = []
        for i, pool in enumerate(pools):
            for _ in range(count_per_target):
                words = [
                    translate[w]
                    for w in rng.choices(pool, k=src_words)
                ] + rng.sample(noise_bank, noise_words)
                rng.shuffle(words)
                pairs.append((" ".join(words), [f"t{i:05d}"]))
        rng.shuffle(pairs)
        return pairs

    train_pairs = sample_pairs(train_per_target, random.Random(seed + 1))
    eval_pairs = sample_pairs(eval_per_target, random.Random(seed + 2))
    return train_pairs, eval_pairs, target_rows


def write_corpus(
    out_dir: str,
    train_pairs: Sequence[Tuple[str, List[str]]],
    eval_pairs: Sequence[Tuple[str, List[str]]],
    target_rows: Sequence[Tuple[str, str]],
) -> None:
    """Write TrainPairs / EvalPairs / targetIDs TSVs (reference filenames,
    SURVEY.md §2.1 demo-datasets row)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "TrainPairs"), "w", encoding="utf-8") as f:
        for src, tids in train_pairs:
            f.write(f"{src}\t{','.join(tids)}\n")
    with open(os.path.join(out_dir, "EvalPairs"), "w", encoding="utf-8") as f:
        for src, tids in eval_pairs:
            f.write(f"{src}\t{','.join(tids)}\n")
    with open(os.path.join(out_dir, "targetIDs"), "w", encoding="utf-8") as f:
        for tid, text in target_rows:
            f.write(f"{tid}\t{text}\n")
