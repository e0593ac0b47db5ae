"""Training layer: losses, train step, schedules, checkpointing, metrics.

Rebuilds the reference's sse_main.py train loop + sse_model.py loss/opt
graph (SURVEY.md §3.1) as a single donated, jitted (pjit-able) train_step:
both towers forward, scaled-cosine similarity, softmax-with-negatives loss,
backward, clipped update — one XLA program per step instead of the
reference's feed_dict → session.run round trip.
"""

from sse_tpu.train.losses import LossConfig, similarity_loss
from sse_tpu.train.loop import (
    TrainState,
    TrainConfig,
    inference_params,
    init_train_state,
    make_train_step,
    train,
)

__all__ = [
    "LossConfig",
    "similarity_loss",
    "TrainState",
    "TrainConfig",
    "inference_params",
    "init_train_state",
    "make_train_step",
    "train",
]
