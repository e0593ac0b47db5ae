"""Parallelism layer: mesh construction, sharding rules, distributed top-k.

The reference has NO parallelism of any kind (SURVEY.md §2.2/§2.3: single
tf.Session, one device, no collectives). This layer is new design surface:

  * ``mesh``        — ('data', 'model') device mesh over ICI; DP shards the
                      batch, 'model' shards the target table / index rows.
  * ``topk``        — distributed exact top-k merge across index shards
                      (SURVEY.md §2.2 "index/shard parallelism" row — the
                      heart of the north star's query path).
  * ``context``     — gather-based sequence/context parallelism for the
                      transformer tower (SURVEY.md §2.2 SP/CP row).
  * multi-host bring-up is `jax.distributed.initialize()` + per-host data
    slicing (sse_tpu.data.batching); collectives are compiled by XLA, never
    hand-written transports.
"""

from sse_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
    replicated,
    index_sharding,
)
from sse_tpu.parallel.context import (
    cp_mesh,
    encode_context_parallel,
    make_cp_encoder,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "index_sharding",
    "cp_mesh",
    "encode_context_parallel",
    "make_cp_encoder",
]
