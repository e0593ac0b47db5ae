"""sse_tpu — a TPU-native sequence semantic embedding engine.

A from-scratch JAX / XLA / Pallas / pjit framework with the capability set of
eBay/Sequence-Semantic-Embedding (reference layer map in /root/repo/SURVEY.md §1):
dual-encoder training, target-space indexing, top-N retrieval evaluation and
online query serving, across four task modes (classification, ranking,
cross-lingual retrieval, question answering) and three network modes
(source-encoder-only, shared-encoder, dual-encoder).

Unlike the reference (single-process TF1; CPU numpy retrieval), the target
embedding index here is a sharded device-resident matrix over a
``jax.sharding.Mesh`` and the query path is one fused
encode + matmul + distributed-exact-top-k XLA program.

Layer map (→ SURVEY.md §7):
    text/      L0 tokenization: invertible tokenizer + clean-room subword vocab
    data/      L1 corpus schema (TrainPairs / EvalPairs / targetIDs), batching
    models/    L2 encoder towers (GRU / LSTM / transformer) + SSE dual-encoder
    ops/       Pallas + XLA kernels: rnn scan, top-k, fused query scoring
    parallel/  mesh construction, sharding rules, distributed top-k merge
    train/     losses, schedules, train loop, orbax checkpointing, metrics
    index/     sharded device-resident target index; build / persist / export
    evals/     on-device recall@k (the reference's parity metric)
    serve/     fused query engine + HTTP front end
    configs/   typed per-task presets (the reference's Makefile flag bundles)
"""

__version__ = "0.1.0"
