"""Typed per-task config presets.

Reference parity (SURVEY.md §5 config row): the reference's tf.app.flags
global FLAGS + the Makefile's four per-task flag bundles become four
checked-in presets of one typed dataclass. JSON (de)serialization makes a
model_dir self-describing (config.json), replacing the reference's
convention of re-passing identical flags to sse_index/webserver.
"""

from __future__ import annotations

import dataclasses
import json
from sse_tpu.models.sse import NetworkMode, SSEConfig
from sse_tpu.models.towers import TowerConfig
from sse_tpu.train.losses import LossConfig
from sse_tpu.train.loop import TrainConfig


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    """Everything needed to train/index/eval/serve one task
    (the reference's FLAGS surface, SURVEY.md §2.1 sse_main row)."""

    task_type: str = "classification"  # classification|ranking|crosslingual|qna
    network_mode: str = "source-encoder-only"
    # text/data
    vocab_size: int = 8000
    # subword (SubwordTextEncoder analog) | word (TokenTextEncoder analog:
    # top-N whole tokens + OOV — the reference's word-level mode)
    vocab_mode: str = "subword"
    max_seq_length: int = 50
    max_subtoken_length: int = 20  # bounds vocab-builder cost on big corpora
    # towers (reference: embedding_size, src/tgt_cell_size, num_layers,
    # encoding_size) — defaults are MXU-friendly multiples of 128
    embed_dim: int = 128
    hidden: int = 128
    tgt_hidden: int = 0  # 0 → same as `hidden` (overriding one flag must
    #                      not silently unbalance the two towers)
    num_layers: int = 1
    encoding_dim: int = 128
    # gru | lstm | transformer | bow. NOTE: the transformer tower wants a
    # ~10x lower learning_rate than the RNNs (0.003 vs 0.03 at demo scale;
    # it plateaus with collapsed embeddings at RNN-tuned rates).
    cell: str = "gru"
    readout: str = "final"  # final | mean | attention (towers.TowerConfig)
    # identity skips between stacked RNN layers — required for
    # num_layers ≥ 3 (a bare 3-layer GRU collapses; BASELINE.md r3)
    residual: bool = False
    # transformer position encoding: rope | learned | sinusoid
    # (towers.TowerConfig). Default is ROPE — the r4 compositional wave
    # measured sinusoid strictly worst at every tested shape (0.3157 vs
    # RoPE's 0.8198, BASELINE.md r4); RNN/bow cells ignore this field.
    pos_encoding: str = "rope"
    # embedding-table gradient implementation: take | segment |
    # sort_segment | onehot (towers.TowerConfig.embed_grad — forward
    # identical, only the [V, E] cotangent path differs; default follows
    # the r5 roofline measurement in BASELINE.md)
    embed_grad: str = "take"
    # training
    batch_size: int = 128
    learning_rate: float = 0.01
    learning_rate_decay_factor: float = 0.9
    max_gradient_norm: float = 5.0
    optimizer: str = "adam"
    loss_kind: str = "full"  # full | inbatch | sampled
    loss_scale: float = 20.0
    num_negatives: int = 128
    margin: float = 0.0  # additive margin softmax (PAPERS.md 1902.08564)
    bidirectional: bool = False  # t→s direction averaged in (same paper)
    num_hard_negatives: int = 0  # dynamic mining (PAPERS.md 2303.15311)
    hard_negative_refresh: int = 500
    # regularization / averaging (reference has neither; measured on the
    # hard benchmark — BASELINE.md)
    dropout: float = 0.0  # train-time tower dropout; eval/serving inert
    ema_decay: float = 0.0  # >0: Polyak-average params for inference
    steps_per_checkpoint: int = 200
    # consecutive train steps dispatched as ONE jitted program (lax.scan
    # over stacked batches) — amortizes per-dispatch host/link latency;
    # bit-identical step sequence (see TrainConfig.steps_per_dispatch)
    steps_per_dispatch: int = 8
    max_epochs: int = 20
    seed: int = 0
    # >0: per-checkpoint eval scores against a SAMPLED target subset of
    # this size (all eval labels + random distractors) instead of
    # re-encoding the full space — the guard for web-scale target spaces
    # where a full eval per checkpoint costs an index build. Recall on a
    # subset is an optimistic bound; report final numbers on the full
    # space (eval --use_index).
    eval_sample_targets: int = 0
    # index storage precision: float32 | bfloat16 | int8. bf16 halves HBM
    # (2x index rows per chip; fp32 MXU accumulation). int8 quarters it
    # (4x rows per chip): symmetric 127-scale quantization of the
    # L2-normalized rows, EXACT int32 MXU accumulation rescaled to cosine
    # range — recall parity measured on the hard benchmark (BASELINE.md)
    index_dtype: str = "float32"
    # corpus-scale data path: stream TrainPairs through the encoder into
    # memmapped caches (training sets >> RAM under a fixed memory cap);
    # shuffling then permutes within windows for memmap page locality
    streaming: bool = False
    shuffle_window: int = 262144
    # parallelism (reference: none; SURVEY.md §2.2)
    mesh_data: int = -1
    mesh_model: int = 1

    # ------------------------------------------------------------ builders
    def model_config(self, vocab_size: int, num_targets: int) -> SSEConfig:
        """Concrete SSEConfig once the real vocab/target sizes are known."""
        src = TowerConfig(
            vocab_size=vocab_size,
            embed_dim=self.embed_dim,
            hidden=self.hidden,
            num_layers=self.num_layers,
            encoding_dim=self.encoding_dim,
            cell=self.cell,
            readout=self.readout,
            max_len=max(self.max_seq_length, 512),
            dropout=self.dropout,
            residual=self.residual,
            pos_encoding=self.pos_encoding,
            embed_grad=self.embed_grad,
        )
        mode = NetworkMode(self.network_mode)
        if mode == NetworkMode.SOURCE_ENCODER_ONLY:
            return SSEConfig(mode=mode, src_tower=src, num_targets=num_targets)
        if mode == NetworkMode.SHARED_ENCODER:
            return SSEConfig(mode=mode, src_tower=src)
        tgt = dataclasses.replace(src, hidden=self.tgt_hidden or self.hidden)
        return SSEConfig(mode=mode, src_tower=src, tgt_tower=tgt)

    def train_config(self) -> TrainConfig:
        return TrainConfig(
            batch_size=self.batch_size,
            learning_rate=self.learning_rate,
            learning_rate_decay_factor=self.learning_rate_decay_factor,
            max_gradient_norm=self.max_gradient_norm,
            optimizer=self.optimizer,
            loss=LossConfig(
                kind=self.loss_kind,
                scale=self.loss_scale,
                num_negatives=self.num_negatives,
                margin=self.margin,
                bidirectional=self.bidirectional,
                num_hard_negatives=self.num_hard_negatives,
            ),
            steps_per_checkpoint=self.steps_per_checkpoint,
            steps_per_dispatch=self.steps_per_dispatch,
            max_epochs=self.max_epochs,
            seed=self.seed,
            hard_negative_refresh=self.hard_negative_refresh,
            shuffle_window=self.shuffle_window if self.streaming else 0,
            ema_decay=self.ema_decay,
        )

    # -------------------------------------------------------------- persist
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "TaskConfig":
        raw = json.loads(text)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "TaskConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_json(f.read())


# The four reference demo tasks (BASELINE.json configs[0..3]); demo-scale
# hyperparameters so each runs on CPU in minutes, TPU in seconds.
#
# r3 capacity-scaling guidance (BASELINE.md r3 section): these presets are
# tuned for the DEFAULT hard-profile corpus (8 train pairs/target). With
# 4x+ the data (`demo-data --profile hard --train_per_target 32`), every
# preset gains 5-9pp recall@1 UNCHANGED, and the following re-tunes win
# further: hidden 256 stops overfitting (ranking 0.7783), a 2-layer GRU
# wants lr 0.003 + dropout 0.1 (0.7795 — the measured instrument ceiling),
# and `--cell bow` matches the ceiling outright on in-vocabulary tasks
# (0.7803) because word identity carries all of this corpus's signal.
# r2.5: the 20-epoch stock schedule underfits once dropout regularizes
# the tower — 40 epochs + dropout 0.1 measured 0.702 → 0.729 recall@1 on
# the hard benchmark, EMA adds recall@10 (0.898 → 0.911); EMA alone (no
# dropout, 20 epochs) was neutral-negative (0.696).
CLASSIFICATION = TaskConfig(
    task_type="classification",
    network_mode="source-encoder-only",
    loss_kind="full",
    max_epochs=40,
    dropout=0.1,
    ema_decay=0.999,
)
# Dual-encoder presets: tuned on the r2 HARD benchmark (confusable
# clusters — sse_tpu/data/synthetic.py make_hard_corpus), where quality
# differences are visible. Measured there (recall@1, ranking task):
#   margin 0.2 + bidirectional (r1 preset)   0.435
#   plain sampled softmax                    0.632
#   + 16 mined hard negatives                0.712   ← shipped
# The additive margin (PAPERS.md 1902.08564) HURTS when confusable
# targets are a few tokens apart (r1 claimed the opposite — but its easy
# corpora saturated at 1.000 and couldn't falsify it); dynamic
# hard-negative mining (PAPERS.md 2303.15311) is what actually separates
# cluster siblings. margin/bidirectional remain available as flags.
#
# EMA averaging (r2.5, BASELINE.md regularization study): the shipped
# bias-corrected estimator at ema_decay=0.999 lifts ranking
# 0.712→0.719 recall@1 / 0.905→0.925 recall@10 and qna 0.733→0.740 /
# 0.844→0.867 at the 20-epoch schedules, so those presets ship it. It is
# SCHEDULE-SENSITIVE: at 40 epochs EMA alone amplifies overfitting
# (ranking 0.678→0.632, crosslingual 0.674→0.559) unless paired with
# --dropout 0.1 — extending --max_epochs on an EMA preset should add
# dropout (cf. the 40/60-epoch classification/crosslingual presets).
RANKING = TaskConfig(
    task_type="ranking",
    network_mode="dual-encoder",
    loss_kind="sampled",
    num_negatives=128,
    num_hard_negatives=16,
    ema_decay=0.999,
)
# Cross-lingual needs more epochs (no lexical shortcut: the word mapping
# itself must be learned); hard negatives lift hard-benchmark recall@1
# 0.18 → 0.67 together with the longer schedule. r2.5: EMA alone at this
# long schedule is harmful (0.674 → 0.559) and dropout alone too (0.636),
# but the 60-epoch schedule with BOTH beats stock on both metrics
# (0.682/0.925 vs 0.674/0.905) — the regularizers buy the extra epochs.
CROSSLINGUAL = TaskConfig(
    task_type="crosslingual",
    network_mode="dual-encoder",
    loss_kind="sampled",
    num_negatives=128,
    num_hard_negatives=16,
    max_epochs=60,
    dropout=0.1,
    ema_decay=0.999,
)
# QnA keeps the attention readout (BASELINE.json configs[3]) — with the
# summary-residual fix (towers.py::_attention_readout) — and the LSTM
# cell at a 3x lower lr: attention readouts collapse onto token 0 at the
# RNN-tuned 0.01 (hard-benchmark recall@1 0.077); at 0.003 the same model
# reaches 0.717.
QNA = TaskConfig(
    task_type="qna",
    network_mode="dual-encoder",
    cell="lstm",
    readout="attention",
    loss_kind="sampled",
    num_negatives=128,
    num_hard_negatives=16,
    learning_rate=0.003,
    ema_decay=0.999,
)

PRESETS = {
    "classification": CLASSIFICATION,
    "ranking": RANKING,
    "crosslingual": CROSSLINGUAL,
    "qna": QNA,
}

# Named RECIPES: measured architecture/schedule bundles applied ON TOP of
# a task preset (`--recipe <name>`; explicit flags still win). These are
# the flag incantations the r3/r4 waves proved out (BASELINE.md) —
# shipped as presets per the r4 verdict so the best measured configs are
# one flag away instead of five.
RECIPES = {
    # The wave-6 flagship: 3-layer residual LSTM. ONE recipe lands
    # 95–96% of the measured Bayes ceiling on ALL FOUR compositional
    # tasks (ranking 0.8611, classification 0.8606, crosslingual 0.8660,
    # qna 0.8569 — BASELINE.md wave-6 table) and is competitive on the
    # hard benchmark. Depth peaks at 3; the identity skips are what make
    # depth>2 trainable.
    "compositional": {
        "cell": "lstm",
        "num_layers": 3,
        "residual": True,
        "learning_rate": 0.003,
        "dropout": 0.1,
        "max_epochs": 40,
    },
    # The r4 transformer recipe: 4 layers, RoPE, lr 1e-3 — 0.8198 =
    # 91.2% of the compositional ceiling (BASELINE.md r4 wave). NOTE the
    # falsified variants recorded there: dropout HURTS transformers at
    # this corpus scale (−13pp), and depth at the RNN lr collapses —
    # hence dropout 0 and ⅓ the RNN recipe's lr.
    "transformer": {
        "cell": "transformer",
        "num_layers": 4,
        "pos_encoding": "rope",
        "learning_rate": 0.001,
        "dropout": 0.0,
        "max_epochs": 40,
    },
}


def preset(task_type: str, recipe: "str | None" = None, **overrides) -> TaskConfig:
    """Task preset + optional named recipe bundle + explicit overrides
    (later wins)."""
    base = PRESETS[task_type]
    merged = dict(RECIPES[recipe]) if recipe else {}
    merged.update(overrides)
    return dataclasses.replace(base, **merged) if merged else base
