"""L1 data layer: corpus schema, encoding, batching.

Rebuilds the reference's ``data_utils.py`` capability (SURVEY.md §2.1):
TrainPairs / EvalPairs / targetIDs TSV schema, vocab build, full-target-space
encoding with on-disk caching, and padded batch generation — plus what the
reference never had: per-host sharding for SPMD input (SURVEY.md §2.2 DP row)
and static-shape batches that keep XLA from recompiling.
"""

from sse_tpu.data.corpus import (
    EncodedPairs,
    TargetSpace,
    read_pairs_tsv,
    read_targets_tsv,
    build_vocab,
    encode_pairs,
    encode_target_space,
)
from sse_tpu.data.batching import BatchIterator, pad_batch
from sse_tpu.data import synthetic

__all__ = [
    "EncodedPairs",
    "TargetSpace",
    "read_pairs_tsv",
    "read_targets_tsv",
    "build_vocab",
    "encode_pairs",
    "encode_target_space",
    "BatchIterator",
    "pad_batch",
    "synthetic",
]
