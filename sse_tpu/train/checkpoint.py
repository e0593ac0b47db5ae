"""Orbax checkpointing: params + optimizer state + lr + step (+ iterator
epoch), restore-if-exists on startup.

Reference parity (SURVEY.md §5 checkpoint row): tf.train.Saver every
steps_per_checkpoint into model_dir, restore latest at create_model time,
LR variable and global_step saved in-graph. Here the whole TrainState is
one pytree, saved asynchronously, and sharded arrays (e.g. the 'model'-
sharded target table) checkpoint natively.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from sse_tpu.train.loop import TrainState


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        best_metric: Optional[str] = None,
    ):
        """`best_metric` (e.g. "recall@1"): keep the max_to_keep BEST
        checkpoints by that metric (passed via save(..., metrics=...))
        instead of the most recent — so a recall regression late in
        training never evicts the best model."""
        os.makedirs(directory, exist_ok=True)
        opts = dict(max_to_keep=max_to_keep, enable_async_checkpointing=True)
        if best_metric:
            opts.update(
                best_fn=lambda m: m.get(best_metric, -float("inf")),
                best_mode="max",
            )
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(**opts),
        )

    def save(
        self,
        state: TrainState,
        step: int,
        extra: Optional[dict] = None,
        metrics: Optional[dict] = None,
    ):
        """`extra` carries host-side loop state (e.g. data-iterator epoch) —
        the reference's analog was implicit in global_step (SURVEY.md §5).
        `metrics` feeds best-checkpoint retention (see __init__)."""
        self._mgr.save(
            step,
            metrics=metrics,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                extra=ocp.args.JsonSave(extra or {}),
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(
        self, abstract_state: TrainState, step: Optional[int] = None
    ) -> Optional[TrainState]:
        """Restore latest (or `step`) into the structure of
        `abstract_state`; None if no checkpoint exists."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state)
            ),
        )
        return restored["state"]

    def restore_extra(self, step: Optional[int] = None) -> Optional[dict]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
        )
        return restored["extra"]

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
