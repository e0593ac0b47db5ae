"""Model-dir workspace: the glue between CLI commands.

Reference parity: sse_main.py's create_model()/train() orchestration plus
the model_dir conventions (SURVEY.md §3.1): a self-describing directory
holding config.json, vocab, encoded-target cache, orbax checkpoints,
metrics JSONL, and the built index — so `index`, `eval`, and `serve` need
only --model_dir (the reference re-passed flags instead).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sse_tpu.configs import TaskConfig
from sse_tpu.data.corpus import (
    build_vocab_streaming,
    encode_pairs_streaming,
    EncodedPairs,
    TargetSpace,
    build_vocab,
    encode_pairs,
    encode_target_space,
    read_pairs_tsv,
    read_targets_tsv,
)
from sse_tpu.evals import Evaluator
from sse_tpu.index import ShardedIndex, build_index
from sse_tpu.models.sse import SSEConfig
from sse_tpu.parallel import make_mesh, param_shardings
from sse_tpu.serve import QueryEngine
from sse_tpu.text.subword import SubwordVocab
from sse_tpu.train import (
    TrainState,
    inference_params,
    init_train_state,
    train as train_loop,
)
from sse_tpu.train.checkpoint import CheckpointManager
from sse_tpu.train.metrics import MetricWriter


class Workspace:
    def __init__(self, model_dir: str, cfg: TaskConfig):
        self.model_dir = os.path.abspath(model_dir)
        self.cfg = cfg

    # ------------------------------------------------------------- layout
    @property
    def config_path(self) -> str:
        return os.path.join(self.model_dir, "config.json")

    @property
    def vocab_path(self) -> str:
        return os.path.join(self.model_dir, "vocab.txt")

    @property
    def ckpt_dir(self) -> str:
        return os.path.join(self.model_dir, "ckpt")

    @property
    def index_dir(self) -> str:
        return os.path.join(self.model_dir, "index")

    @property
    def metrics_path(self) -> str:
        return os.path.join(self.model_dir, "metrics.jsonl")

    # ------------------------------------------------------------ open/new
    @classmethod
    def create(cls, model_dir: str, cfg: TaskConfig) -> "Workspace":
        ws = cls(model_dir, cfg)
        os.makedirs(model_dir, exist_ok=True)
        cfg.save(ws.config_path)
        return ws

    @classmethod
    def open(cls, model_dir: str) -> "Workspace":
        ws = cls(model_dir, TaskConfig.load(os.path.join(model_dir, "config.json")))
        return ws

    # ---------------------------------------------------------------- data
    def prepare_data(
        self, data_dir: str, need_eval: bool = True
    ) -> Tuple[SubwordVocab, TargetSpace, Optional[EncodedPairs], Optional[EncodedPairs]]:
        """Vocab build/load + full-target-space encode + pair encode
        (reference data_utils prep stack, SURVEY.md §3.5), all cached in
        model_dir."""
        cfg = self.cfg
        train_path = os.path.join(data_dir, "TrainPairs")
        eval_path = os.path.join(data_dir, "EvalPairs")
        target_path = os.path.join(data_dir, "targetIDs")
        target_rows = read_targets_tsv(target_path)
        if cfg.streaming:
            # corpus-scale path: TrainPairs is never materialized in RAM —
            # vocab counting streams the file, pair encoding streams into
            # memmaps (VERDICT r1 item 6)
            train_rows = []
            vocab = build_vocab_streaming(
                cfg.vocab_size,
                train_path if os.path.exists(train_path) else None,
                target_rows,
                self.vocab_path,
                max_subtoken_length=cfg.max_subtoken_length,
                vocab_mode=cfg.vocab_mode,
            )
        else:
            train_rows = (
                read_pairs_tsv(train_path)
                if os.path.exists(train_path)
                else []
            )
            vocab = build_vocab(
                cfg.vocab_size,
                train_rows,
                target_rows,
                self.vocab_path,
                max_subtoken_length=cfg.max_subtoken_length,
                vocab_mode=cfg.vocab_mode,
            )
        tspace = encode_target_space(
            vocab,
            target_rows,
            cfg.max_seq_length,
            os.path.join(self.model_dir, "targets.npz"),
        )
        if cfg.streaming and os.path.exists(train_path):
            train_pairs = encode_pairs_streaming(
                vocab, train_path, tspace, cfg.max_seq_length,
                cache_dir=self.model_dir,
            )
        else:
            train_pairs = (
                encode_pairs(vocab, train_rows, tspace, cfg.max_seq_length)
                if train_rows
                else None
            )
        eval_pairs = None
        if need_eval and os.path.exists(eval_path):
            eval_pairs = encode_pairs(
                vocab, read_pairs_tsv(eval_path), tspace, cfg.max_seq_length
            )
        return vocab, tspace, train_pairs, eval_pairs

    # --------------------------------------------------------------- model
    def mesh(self):
        n = len(jax.devices())
        if n == 1:
            return None
        return make_mesh(self.cfg.mesh_data, self.cfg.mesh_model)

    def model_config(self, vocab: SubwordVocab, tspace: TargetSpace) -> SSEConfig:
        return self.cfg.model_config(vocab.vocab_size, tspace.num_targets)

    def restore_state(
        self, model_cfg: SSEConfig, quiet: bool = False
    ) -> Tuple[TrainState, CheckpointManager]:
        """create_model() analog: init fresh, restore latest if present."""
        train_cfg = self.cfg.train_config()
        state = init_train_state(
            jax.random.PRNGKey(train_cfg.seed), model_cfg, train_cfg
        )
        mgr = CheckpointManager(self.ckpt_dir)
        import dataclasses as _dc

        try:
            restored = mgr.restore(state)
        except Exception:
            if state.ema_params is not None:
                # ema_decay turned ON for a run whose checkpoints predate
                # averaging: restore the pre-EMA structure and seed the
                # average from the restored params
                restored = mgr.restore(_dc.replace(state, ema_params=None))
                if restored is not None:
                    restored = _dc.replace(
                        restored,
                        ema_params=jax.tree.map(jnp.array, restored.params),
                    )
            else:
                # ema_decay turned OFF on checkpoints that carry
                # ema_params: restore WITH the averaged subtree, then
                # drop it (raw params win when averaging is disabled)
                restored = mgr.restore(
                    _dc.replace(
                        state,
                        ema_params=jax.tree.map(jnp.array, state.params),
                    )
                )
                if restored is not None:
                    restored = _dc.replace(restored, ema_params=None)
        if restored is not None:
            state = restored
            if not quiet:
                print(f"[sse] restored checkpoint step={mgr.latest_step()}")
        return state, mgr

    # ---------------------------------------------------------------- ops
    def train(self, data_dir: str) -> Dict[str, float]:
        vocab, tspace, train_pairs, eval_pairs = self.prepare_data(data_dir)
        if train_pairs is None:
            raise FileNotFoundError(f"no TrainPairs under {data_dir}")
        model_cfg = self.model_config(vocab, tspace)
        state, mgr = self.restore_state(model_cfg)
        evaluator = (
            Evaluator(
                model_cfg,
                eval_pairs,
                tspace,
                sample_targets=self.cfg.eval_sample_targets or None,
            )
            if eval_pairs
            else None
        )
        # retain the best-recall checkpoint when we have an eval signal
        if evaluator is not None:
            mgr.close()
            mgr = CheckpointManager(self.ckpt_dir, best_metric="recall@1")
        # multi-host: only process 0 writes metrics; every process saves
        # checkpoints (Orbax is a collective) and computes eval (identical
        # replicated math — cheap next to cross-host coordination).
        p0 = jax.process_index() == 0
        if jax.process_count() > 1:
            # Checkpoint saves are COLLECTIVE (Orbax barriers across
            # processes): diverging model_dirs would deadlock at the first
            # save. Fail fast instead.
            from jax.experimental import multihost_utils
            import zlib

            digest = np.asarray(
                [zlib.crc32(os.path.abspath(self.model_dir).encode())],
                np.uint32,
            )
            multihost_utils.assert_equal(
                digest, "model_dir must be the SAME (shared) path on every "
                "process: checkpointing is a cross-process collective",
            )
        writer = MetricWriter(self.metrics_path if p0 else os.devnull)
        mesh = self.mesh()
        if mesh is not None:
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                shardings = param_shardings(mesh, state)
                state = jax.tree.map(
                    lambda x, s: multihost_utils
                    .host_local_array_to_global_array(
                        np.asarray(x), mesh, s.spec
                    ),
                    state,
                    shardings,
                )
            else:
                state = jax.device_put(state, param_shardings(mesh, state))
        state = train_loop(
            model_cfg,
            self.cfg.train_config(),
            train_pairs,
            tspace,
            eval_fn=(lambda p: evaluator.evaluate(p)) if evaluator else None,
            checkpoint_fn=lambda s, step, rec: mgr.save(
                s, step, metrics={k: v for k, v in rec.items()
                                  if isinstance(v, (int, float))}
            ),
            log_fn=writer.write if p0 else None,
            state=state,  # resume from the restored checkpoint
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            mesh=mesh,
        )
        final = evaluator.evaluate(inference_params(state)) if evaluator else {}
        mgr.save(state, int(state.step), metrics=final or None)
        mgr.wait()
        mgr.close()
        writer.write({"step": int(state.step), "final": 1, **final})
        writer.close()
        return final

    def build_index(
        self,
        data_dir: str,
        export_tsv: Optional[str] = None,
        capacity: Optional[int] = None,
        phase_times: Optional[Dict[str, float]] = None,
        cp_shards: int = 0,
    ) -> ShardedIndex:
        """Build + persist the sharded index. ``phase_times`` (if passed)
        receives a wall-clock breakdown — at 10M docs the non-encode
        phases (TSV parse + content hash, checkpoint restore, Orbax
        save over the device link) dominate the `index` CLI's end-to-end
        docs/sec, so the breakdown is what makes that number actionable
        (r2 VERDICT item 6 follow-up)."""
        t = time.perf_counter
        t0 = t()
        vocab, tspace, _, _ = self.prepare_data(data_dir, need_eval=False)
        t1 = t()
        model_cfg = self.model_config(vocab, tspace)
        state, mgr = self.restore_state(model_cfg)
        mgr.close()
        t2 = t()
        import jax.numpy as _jnp

        index = build_index(
            inference_params(state),
            model_cfg,
            tspace,
            mesh=self.mesh(),
            dtype={"bfloat16": _jnp.bfloat16, "int8": _jnp.int8}.get(
                self.cfg.index_dtype, _jnp.float32
            ),
            capacity=capacity,
            cp_shards=cp_shards,
        )
        jax.block_until_ready(index.emb)
        t3 = t()
        index.save(self.index_dir)
        t4 = t()
        if export_tsv:
            index.export_tsv(export_tsv)
        if phase_times is not None:
            phase_times.update(
                prepare_data=t1 - t0,
                restore=t2 - t1,
                encode=t3 - t2,
                save=t4 - t3,
            )
        return index

    def evaluate(self, data_dir: str) -> Dict[str, float]:
        vocab, tspace, _, eval_pairs = self.prepare_data(data_dir)
        if eval_pairs is None:
            raise FileNotFoundError(f"no EvalPairs under {data_dir}")
        model_cfg = self.model_config(vocab, tspace)
        state, mgr = self.restore_state(model_cfg)
        mgr.close()
        return Evaluator(model_cfg, eval_pairs, tspace).evaluate(
            inference_params(state)
        )

    def engine(
        self,
        data_dir: Optional[str] = None,
        k: int = 10,
        max_batch: int = 8,
        bulk_batch: Optional[int] = None,
    ) -> QueryEngine:
        """Load everything needed for serving. Uses the saved index if
        present, else builds one (requires data_dir)."""
        from sse_tpu.text.subword import load_vocab

        vocab = load_vocab(self.vocab_path)  # marker-dispatches word mode
        mesh = self.mesh()
        if os.path.isdir(self.index_dir):
            index = ShardedIndex.load(self.index_dir, mesh)
            # model cfg needs num_targets for source-encoder-only mode
            num_targets = index.num_real
        elif data_dir:
            index = self.build_index(data_dir)
            num_targets = index.num_real
        else:
            raise FileNotFoundError(
                "no built index in model_dir and no --data_dir to build from"
            )
        model_cfg = self.cfg.model_config(vocab.vocab_size, num_targets)
        state, mgr = self.restore_state(model_cfg, quiet=True)
        mgr.close()
        return QueryEngine(
            inference_params(state),
            model_cfg,
            vocab,
            index,
            max_seq_length=self.cfg.max_seq_length,
            max_batch=max_batch,
            bulk_batch=bulk_batch,
            k=k,
        )
