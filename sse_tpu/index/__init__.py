"""Index subsystem: the target-embedding index as a first-class,
device-resident, mesh-sharded array.

Reference analog: sse_index.py streaming the target tower into
``targetEncodingIndex.tsv`` (SURVEY.md §3.2), then loading it back as a CPU
numpy matrix for eval/serving. Here the index lives on-device, row-sharded
over the mesh's 'model' axis; persistence is Orbax (sharded-native) with a
TSV export/import for reference-format compatibility.
"""

from sse_tpu.index.sharded_index import ShardedIndex, build_index

__all__ = ["ShardedIndex", "build_index"]
