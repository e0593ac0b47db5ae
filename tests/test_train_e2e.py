"""End-to-end integration: tiny synthetic corpus → train → recall@k beats
random by a wide margin (SURVEY.md §4 integration row — the 'make train on
CPU' parity gate), for each network mode. Plus checkpoint save/restore."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sse_tpu.data import synthetic
from sse_tpu.data.corpus import encode_pairs, encode_target_space
from sse_tpu.data.batching import BatchIterator
from sse_tpu.evals import Evaluator
from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig
from sse_tpu.text.subword import SubwordVocab, token_counts_from_lines
from sse_tpu.train import LossConfig, TrainConfig, init_train_state, train
from sse_tpu.train.checkpoint import CheckpointManager

L = 12
NUM_TARGETS = 8


def build_task(task="classification", seed=0):
    train_pairs_raw, eval_pairs_raw, target_rows = synthetic.make_corpus(
        task=task,
        num_targets=NUM_TARGETS,
        train_per_target=24,
        eval_per_target=4,
        seed=seed,
    )
    lines = [s for s, _ in train_pairs_raw] + [t for _, t in target_rows]
    vocab = SubwordVocab.build_to_target_size(
        400, token_counts_from_lines(lines)
    )
    tspace = encode_target_space(vocab, target_rows, L)
    train_pairs = encode_pairs(vocab, train_pairs_raw, tspace, L)
    eval_pairs = encode_pairs(vocab, eval_pairs_raw, tspace, L)
    return vocab, tspace, train_pairs, eval_pairs


def tower(vocab_size, cell="gru"):
    return TowerConfig(
        vocab_size=vocab_size,
        embed_dim=32,
        hidden=32,
        num_layers=1,
        encoding_dim=16,
        cell=cell,
    )


def run_training(model_cfg, loss_cfg, tspace, train_pairs, eval_pairs, epochs=30):
    cfg = TrainConfig(
        batch_size=32,
        learning_rate=0.05,
        optimizer="adam",
        loss=loss_cfg,
        steps_per_checkpoint=10_000,  # no mid-train eval; keep the test fast
        max_epochs=epochs,
        seed=0,
    )
    evaluator = Evaluator(model_cfg, eval_pairs, tspace, batch_size=32, ks=(1, 5))
    state = init_train_state(jax.random.PRNGKey(0), model_cfg, cfg)
    before = evaluator.evaluate(state.params)
    state = train(model_cfg, cfg, train_pairs, tspace)
    after = evaluator.evaluate(state.params)
    return before, after


def test_classification_source_encoder_only_full_softmax():
    vocab, tspace, tr, ev = build_task("classification")
    model_cfg = SSEConfig(
        mode=NetworkMode.SOURCE_ENCODER_ONLY,
        src_tower=tower(vocab.vocab_size),
        num_targets=NUM_TARGETS,
    )
    before, after = run_training(model_cfg, LossConfig(kind="full"), tspace, tr, ev)
    # random recall@1 = 1/8; the structured corpus should be near-solved
    assert after["recall@1"] > 0.8, (before, after)


def test_ranking_dual_encoder_inbatch():
    vocab, tspace, tr, ev = build_task("ranking")
    model_cfg = SSEConfig(
        mode=NetworkMode.DUAL_ENCODER,
        src_tower=tower(vocab.vocab_size),
        tgt_tower=tower(vocab.vocab_size, cell="lstm"),
    )
    before, after = run_training(model_cfg, LossConfig(kind="inbatch"), tspace, tr, ev)
    assert after["recall@1"] > 0.7, (before, after)


def test_crosslingual_shared_encoder_sampled_softmax():
    vocab, tspace, tr, ev = build_task("crosslingual")
    model_cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=tower(vocab.vocab_size),
    )
    before, after = run_training(
        model_cfg,
        LossConfig(kind="sampled", num_negatives=16),
        tspace,
        tr,
        ev,
        epochs=40,
    )
    assert after["recall@1"] > 0.6, (before, after)


def test_plateau_lr_decay_and_eval_hook():
    vocab, tspace, tr, ev = build_task("classification")
    model_cfg = SSEConfig(
        mode=NetworkMode.SOURCE_ENCODER_ONLY,
        src_tower=tower(vocab.vocab_size),
        num_targets=NUM_TARGETS,
    )
    cfg = TrainConfig(
        batch_size=32,
        learning_rate=0.05,
        learning_rate_decay_factor=0.5,
        loss=LossConfig(kind="full"),
        steps_per_checkpoint=3,
        max_epochs=2,
        seed=0,
    )
    logs = []
    # an eval_fn that never improves → lr must decay every checkpoint
    state = train(
        model_cfg,
        cfg,
        tr,
        tspace,
        eval_fn=lambda p: {"recall@1": 0.0},
        log_fn=logs.append,
    )
    assert logs and all("recall@1" in r for r in logs)
    assert float(state.lr) < 0.05 * 0.5 ** (len(logs) - 2)


def test_checkpoint_round_trip(tmp_path):
    vocab, tspace, tr, ev = build_task("classification")
    model_cfg = SSEConfig(
        mode=NetworkMode.SOURCE_ENCODER_ONLY,
        src_tower=tower(vocab.vocab_size),
        num_targets=NUM_TARGETS,
    )
    cfg = TrainConfig(batch_size=32, loss=LossConfig(kind="full"), max_epochs=1)
    state = init_train_state(jax.random.PRNGKey(1), model_cfg, cfg)
    state = dataclasses.replace(state, lr=jnp.asarray(0.123, jnp.float32))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, 7, extra={"epoch": 3})
    mgr.wait()
    assert mgr.latest_step() == 7
    template = init_train_state(jax.random.PRNGKey(2), model_cfg, cfg)
    restored = mgr.restore(template)
    assert float(restored.lr) == pytest.approx(0.123)
    np.testing.assert_allclose(
        np.asarray(restored.params["target_table"]),
        np.asarray(state.params["target_table"]),
    )
    mgr.close()


def test_mid_epoch_resume_matches_uninterrupted():
    """Resuming from a MID-epoch checkpoint continues at the exact next
    batch (deterministic iterator), so the final params equal the
    uninterrupted run — at 10M-pair scale an epoch is ~40k steps and
    restarting it from batch 0 would retrain up to an epoch of data."""
    vocab, tspace, tr, ev = build_task("classification")
    model_cfg = SSEConfig(
        mode=NetworkMode.SOURCE_ENCODER_ONLY,
        src_tower=tower(vocab.vocab_size),
        num_targets=NUM_TARGETS,
    )
    cfg = TrainConfig(
        batch_size=32,
        learning_rate=0.05,
        loss=LossConfig(kind="full"),
        max_epochs=2,
        steps_per_checkpoint=10_000,
        seed=3,
    )
    straight = train(model_cfg, cfg, tr, tspace)

    # capture the state mid-way through epoch 1 (not at an epoch edge)
    spe = BatchIterator(tr, 32).steps_per_epoch
    assert spe >= 2
    mid_step = spe + spe // 2
    mid_cfg = dataclasses.replace(
        cfg, steps_per_checkpoint=mid_step
    )
    captured = {}

    def capture(state, step, rec):
        if step == mid_step and "state" not in captured:
            # host copy: the live state's buffers are DONATED to the next
            # step (checkpointing copies the same way via Orbax)
            captured["state"] = jax.tree.map(np.asarray, state)

    train(model_cfg, mid_cfg, tr, tspace, checkpoint_fn=capture)
    assert int(captured["state"].step) == mid_step
    resumed = train(model_cfg, cfg, tr, tspace, state=captured["state"])
    assert int(resumed.step) == int(straight.step)
    np.testing.assert_allclose(
        np.asarray(resumed.params["target_table"]),
        np.asarray(straight.params["target_table"]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_best_checkpoint_retention(tmp_path):
    """best_metric keeps the highest-recall checkpoint even after worse
    later saves."""
    vocab, tspace, tr, ev = build_task("classification")
    model_cfg = SSEConfig(
        mode=NetworkMode.SOURCE_ENCODER_ONLY,
        src_tower=tower(vocab.vocab_size),
        num_targets=NUM_TARGETS,
    )
    cfg = TrainConfig(batch_size=32, loss=LossConfig(kind="full"))
    state = init_train_state(jax.random.PRNGKey(0), model_cfg, cfg)
    mgr = CheckpointManager(
        str(tmp_path / "best"), max_to_keep=1, best_metric="recall@1"
    )
    mgr.save(state, 1, metrics={"recall@1": 0.9})
    mgr.save(state, 2, metrics={"recall@1": 0.4})  # regression
    mgr.wait()
    assert mgr.best_step() == 1
    mgr.close()


def test_hard_negative_mining_trains():
    """num_hard_negatives path: cache refresh + mining inside the step
    compiles and learns (SURVEY-adjacent: PAPERS.md 2303.15311)."""
    vocab, tspace, tr, ev = build_task("ranking")
    model_cfg = SSEConfig(
        mode=NetworkMode.DUAL_ENCODER,
        src_tower=tower(vocab.vocab_size),
        tgt_tower=tower(vocab.vocab_size),
    )
    cfg = TrainConfig(
        batch_size=32,
        learning_rate=0.02,  # margin+bidirectional roughly doubles the
        #                       gradient signal — needs a lower lr than the
        #                       plain-sampled tests at these tiny sizes
        loss=LossConfig(
            kind="sampled", num_negatives=8, num_hard_negatives=2,
            margin=0.1, bidirectional=True,
        ),
        max_epochs=12,
        hard_negative_refresh=10,
        seed=0,
    )
    state = train(model_cfg, cfg, tr, tspace)
    result = Evaluator(model_cfg, ev, tspace, batch_size=32, ks=(1,)).evaluate(
        state.params
    )
    assert result["recall@1"] > 0.7, result


def test_merged_scan_matches_separate_encodes():
    """The shared-encoder merged-scan fast path (src + candidates in ONE
    tower scan — sse_tpu/train/loop.py) must produce exactly the loss
    the two-call formulation does (dropout off ⇒ bit-level math match up
    to reduction order)."""
    from sse_tpu.models import sse
    from sse_tpu.train import losses as losses_lib
    from sse_tpu.train import make_train_step

    vocab, tspace, train_pairs, eval_pairs = build_task("ranking")
    model_cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER, src_tower=tower(vocab.vocab_size)
    )
    loss_cfg = LossConfig(kind="sampled", num_negatives=8,
                          num_hard_negatives=0)
    cfg = TrainConfig(batch_size=16, learning_rate=0.05, loss=loss_cfg,
                      max_epochs=1, seed=3)
    state = init_train_state(jax.random.PRNGKey(1), model_cfg, cfg)
    batch = next(BatchIterator(
        train_pairs, global_batch_size=16, seed=0).epoch_batches(0))
    step_fn = make_train_step(model_cfg, cfg, donate=False)
    _, metrics = step_fn(
        state, batch.src, batch.src_len, batch.labels, batch.weight,
        tspace.tokens, tspace.lengths,
    )
    # the unmerged formulation, recomputed from first principles with
    # the same negative-sampling stream (base_key=seed, folded by step)
    key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), state.step)
    negs = losses_lib.sample_negative_rows(
        key, tspace.tokens.shape[0], loss_cfg.num_negatives
    )
    cand_rows = jnp.concatenate([jnp.asarray(batch.labels), negs])
    src_emb = sse.encode_source(
        state.params, model_cfg, jnp.asarray(batch.src),
        jnp.asarray(batch.src_len),
    )
    cand_emb = sse.target_embeddings(
        state.params, model_cfg,
        tokens=jnp.take(tspace.tokens, cand_rows, axis=0),
        lengths=jnp.take(tspace.lengths, cand_rows, axis=0),
    )
    want, _ = losses_lib.similarity_loss(
        loss_cfg, src_emb, jnp.asarray(batch.labels),
        jnp.asarray(batch.weight), cand_emb=cand_emb, cand_rows=cand_rows,
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(want), rtol=1e-5
    )


def test_ema_averaging_and_checkpoint(tmp_path):
    """EMA (Polyak) averaging: ema_params track the configured decay
    exactly, checkpoint-roundtrip with the averaged tree, and
    inference_params() selects them; resuming a pre-EMA checkpoint with
    ema_decay newly enabled seeds the average from the restored params
    instead of crashing on a structure mismatch."""
    from sse_tpu.train import inference_params, make_train_step
    from sse_tpu.train.loop import TrainState

    vocab, tspace, train_pairs, eval_pairs = build_task("ranking")
    model_cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER, src_tower=tower(vocab.vocab_size)
    )
    d = 0.9
    cfg = TrainConfig(
        batch_size=16, learning_rate=0.05, loss=LossConfig(kind="inbatch"),
        max_epochs=1, ema_decay=d,
    )
    state = init_train_state(jax.random.PRNGKey(0), model_cfg, cfg)
    # at init the average IS the params
    np.testing.assert_array_equal(
        np.asarray(state.ema_params["src_tower"]["proj_b"]),
        np.asarray(state.params["src_tower"]["proj_b"]),
    )
    step_fn = make_train_step(model_cfg, cfg, donate=False)
    it = BatchIterator(train_pairs, global_batch_size=16, seed=0)
    batch = next(it.epoch_batches(0))
    # bias-corrected EMA: the state holds the EXACT d-weighted average
    # of the post-step params seen so far (ema_1 = params_1, no init
    # anchor) — recompute it from first principles and compare
    s = state
    history = []
    for t in range(3):
        s, _ = step_fn(
            s, batch.src, batch.src_len, batch.labels, batch.weight,
            tspace.tokens, tspace.lengths,
        )
        history.append(jax.tree.map(np.asarray, s.params))
    weights = np.array([d ** (len(history) - 1 - i) for i in range(len(history))])
    weights /= weights.sum()
    manual = jax.tree.map(
        lambda *ps: sum(w * p for w, p in zip(weights, ps)), *history
    )
    # after ONE step the average must equal the params exactly
    s1, _ = step_fn(
        state, batch.src, batch.src_len, batch.labels, batch.weight,
        tspace.tokens, tspace.lengths,
    )
    np.testing.assert_allclose(
        np.asarray(s1.ema_params["src_tower"]["proj_w"]),
        np.asarray(s1.params["src_tower"]["proj_w"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s.ema_params["src_tower"]["proj_w"]),
        manual["src_tower"]["proj_w"],
        rtol=2e-5,
    )
    assert not np.allclose(
        np.asarray(s.ema_params["src_tower"]["proj_w"]),
        np.asarray(s.params["src_tower"]["proj_w"]),
    )
    assert inference_params(s) is s.ema_params
    # checkpoint roundtrip keeps the average
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(s, 3)
    mgr.wait()
    abstract = init_train_state(jax.random.PRNGKey(1), model_cfg, cfg)
    restored = mgr.restore(abstract)
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["src_tower"]["proj_w"]),
        np.asarray(s.ema_params["src_tower"]["proj_w"]),
    )
    mgr.close()
    # pre-EMA checkpoint + ema newly enabled → Workspace fallback seeds
    # the average from restored params (exercised via restore_state)
    import dataclasses as _dc
    from sse_tpu.configs import preset
    from sse_tpu.workspace import Workspace

    no_ema = _dc.replace(s, ema_params=None)
    mgr2 = CheckpointManager(str(tmp_path / "ckpt2"))
    mgr2.save(no_ema, 3)
    mgr2.wait()
    mgr2.close()
    ws = Workspace.create(
        str(tmp_path / "model"),
        preset(
            "ranking", vocab_size=vocab.vocab_size, ema_decay=0.99,
            embed_dim=32, hidden=32, encoding_dim=16, num_layers=1,
            network_mode="shared-encoder", max_seq_length=L,
        ),
    )
    import os, shutil
    shutil.rmtree(ws.ckpt_dir, ignore_errors=True)
    shutil.copytree(str(tmp_path / "ckpt2"), ws.ckpt_dir)
    state2, mgr3 = ws.restore_state(model_cfg)
    mgr3.close()
    assert state2.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(state2.ema_params["src_tower"]["proj_w"]),
        np.asarray(state2.params["src_tower"]["proj_w"]),
    )
    # the REVERSE migration: checkpoints carry ema_params but ema_decay
    # is turned OFF → restore must drop the averaged subtree (raw params
    # win), not crash on the structure mismatch
    ws_off = Workspace.create(
        str(tmp_path / "model_off"),
        preset(
            "ranking", vocab_size=vocab.vocab_size, ema_decay=0.0,
            embed_dim=32, hidden=32, encoding_dim=16, num_layers=1,
            network_mode="shared-encoder", max_seq_length=L,
        ),
    )
    shutil.rmtree(ws_off.ckpt_dir, ignore_errors=True)
    shutil.copytree(str(tmp_path / "ckpt"), ws_off.ckpt_dir)  # HAS ema
    state3, mgr4 = ws_off.restore_state(model_cfg)
    mgr4.close()
    assert state3.ema_params is None
    np.testing.assert_array_equal(
        np.asarray(state3.params["src_tower"]["proj_w"]),
        np.asarray(s.params["src_tower"]["proj_w"]),
    )


def test_train_with_dropout_and_ema_e2e():
    """A short dropout+EMA run trains (loss finite, recall above chance)
    and returns EMA params for inference."""
    vocab, tspace, train_pairs, eval_pairs = build_task("ranking")
    model_cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=dataclasses.replace(tower(vocab.vocab_size), dropout=0.1),
    )
    cfg = TrainConfig(
        batch_size=32, learning_rate=0.05, loss=LossConfig(kind="inbatch"),
        max_epochs=20, ema_decay=0.98, steps_per_checkpoint=10_000,
    )
    evaluator = Evaluator(model_cfg, eval_pairs, tspace, batch_size=32, ks=(1, 5))
    state = train(model_cfg, cfg, train_pairs, tspace)
    from sse_tpu.train import inference_params

    after = evaluator.evaluate(inference_params(state))
    assert after["recall@1"] > 0.5  # far above the 1/8 chance floor


def test_ema_decay_validation():
    """ema_decay=1.0 would make the bias-corrected update 0/0 → NaN
    served silently; init must reject it."""
    vocab, tspace, train_pairs, eval_pairs = build_task("ranking")
    model_cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER, src_tower=tower(vocab.vocab_size)
    )
    with pytest.raises(ValueError, match="ema_decay"):
        init_train_state(
            jax.random.PRNGKey(0), model_cfg, TrainConfig(ema_decay=1.0)
        )


def test_multi_label_train_pairs_end_to_end():
    """Multi-label TRAIN rows flow through encode_pairs (labels_multi),
    the packed train step (extra label columns), and the label-set-aware
    loss — end to end on a tiny hard corpus with ambiguous rows."""
    tr_raw, ev_raw, tg = synthetic.make_hard_corpus(
        task="ranking",
        num_targets=16,
        cluster_size=4,
        train_per_target=12,
        eval_per_target=4,
        train_multi_label_frac=0.4,
        seed=3,
    )
    assert any(len(ls) > 1 for _, ls in tr_raw)  # ambiguous train rows
    lines = [s for s, _ in tr_raw] + [t for _, t in tg]
    vocab = SubwordVocab.build_to_target_size(
        400, token_counts_from_lines(lines)
    )
    tspace = encode_target_space(vocab, tg, L)
    train_pairs = encode_pairs(vocab, tr_raw, tspace, L)
    assert train_pairs.labels_multi is not None
    assert train_pairs.labels_multi.shape[1] == 2
    np.testing.assert_array_equal(
        train_pairs.labels_multi[:, 0], train_pairs.labels
    )
    eval_pairs = encode_pairs(vocab, ev_raw, tspace, L)
    model_cfg = SSEConfig(
        mode=NetworkMode.DUAL_ENCODER,
        src_tower=tower(vocab.vocab_size),
        tgt_tower=tower(vocab.vocab_size),
    )
    before, after = run_training(
        model_cfg,
        LossConfig(kind="sampled", num_negatives=8),
        tspace,
        train_pairs,
        eval_pairs,
        epochs=40,
    )
    # hard-profile tiny corpus: the bar is beating random (1/16) and the
    # untrained model by a wide margin, not saturation
    assert after["recall@1"] > max(3 * before["recall@1"], 0.2)


def test_dispatch_chaining_bit_identical():
    """steps_per_dispatch=K (lax.scan chained dispatch) runs the EXACT
    same step sequence as K single dispatches: final params equal, and
    checkpoint-window boundaries (mid-chain clamping) still fire the
    eval hook the same number of times (r4 train-throughput lever)."""
    vocab, tspace, train_pairs, eval_pairs = build_task("ranking")
    t = tower(vocab.vocab_size)
    model_cfg = SSEConfig(mode=NetworkMode.SHARED_ENCODER, src_tower=t)
    records = {1: [], 4: []}

    def run(k):
        cfg = TrainConfig(
            batch_size=32,
            learning_rate=0.05,
            optimizer="adam",
            loss=LossConfig(kind="inbatch"),
            steps_per_checkpoint=5,  # NOT a multiple of the chain width
            steps_per_dispatch=k,
            max_epochs=4,
            seed=7,
        )
        state = train(
            model_cfg, cfg, train_pairs, tspace,
            log_fn=lambda r: records[k].append(r["step"]),
        )
        return state

    s1 = run(1)
    s4 = run(4)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s1.params,
        s4.params,
    )
    assert int(s1.step) == int(s4.step)
    assert records[1] == records[4]  # same checkpoint-window steps


def test_norm_metric_modes_identical_training_math():
    """norm_metric only changes the ADVISORY grad_norm metric (r5 tail
    study, BASELINE.md): params after a step are bit-identical under
    'grad' (default), 'update' (r1-r4 behavior), and 'none'; the metric
    itself differs ('none' reports 0; clipped-adam update norms and raw
    grad norms are different signals)."""
    from sse_tpu.train import init_train_state, make_train_step

    t = tower(257)
    model_cfg = SSEConfig(mode=NetworkMode.DUAL_ENCODER, src_tower=t,
                          tgt_tower=t)
    key = jax.random.PRNGKey(3)
    src_toks = jax.random.randint(key, (8, 12), 2, 257, dtype=jnp.int32)
    lengths = jnp.full((8,), 12, jnp.int32)
    labels = jnp.arange(8, dtype=jnp.int32)
    weight = jnp.ones((8,), jnp.float32)
    tgt_toks = jax.random.randint(
        jax.random.PRNGKey(4), (16, 12), 2, 257, dtype=jnp.int32)
    tgt_lens = jnp.full((16,), 12, jnp.int32)

    outs = {}
    for nm in ("grad", "update", "none"):
        cfg = TrainConfig(
            batch_size=8,
            loss=LossConfig(kind="inbatch"),
            norm_metric=nm,
        )
        state = init_train_state(jax.random.PRNGKey(0), model_cfg, cfg)
        step_fn = make_train_step(model_cfg, cfg, donate=False)
        new_state, metrics = step_fn(
            state, src_toks, lengths, labels, weight, tgt_toks, tgt_lens)
        outs[nm] = (new_state.params, float(metrics["grad_norm"]))

    for nm in ("update", "none"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            outs["grad"][0], outs[nm][0],
        )
    assert outs["none"][1] == 0.0
    assert outs["grad"][1] > 0.0
    assert abs(outs["grad"][1] - outs["update"][1]) > 1e-9
