"""Benchmark harness: query-path QPS and index-build docs/sec.

Measures the two north-star metrics (BASELINE.json: "queries/sec/chip
exact top-K; index docs/sec") with `block_until_ready` timing
(SURVEY.md §5 tracing row). Used by `python -m sse_tpu.cli bench` and the
repo-root bench.py the driver runs on real TPU hardware.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sse_tpu.index.sharded_index import from_embeddings
from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig, init_params
from sse_tpu.serve.engine import QueryEngine


def _default_model(vocab_size: int = 8000, encoding_dim: int = 128) -> SSEConfig:
    """Flagship demo tower: 1-layer GRU, MXU-friendly dims."""
    return SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=TowerConfig(
            vocab_size=vocab_size,
            embed_dim=128,
            hidden=128,
            num_layers=1,
            encoding_dim=encoding_dim,
            cell="gru",
        ),
    )


def run_query_bench(
    model_dir: Optional[str] = None,
    num_targets: int = 100_000,
    encoding_dim: int = 128,
    batch: int = 64,
    k: int = 10,
    seconds: float = 5.0,
    max_seq_length: int = 50,
    mesh=None,
) -> Dict[str, Any]:
    """End-to-end fused query path (tokenized input → encode → scores →
    exact top-k) queries/sec. With model_dir: the trained engine; without:
    a random-param flagship model over a random index (the kernel cost is
    param-value-independent)."""
    if model_dir:
        from sse_tpu.workspace import Workspace

        engine = Workspace.open(model_dir).engine(k=k, max_batch=batch)
        num_targets = engine.index.num_real
        vocab_size = engine.model_cfg.src_tower.vocab_size
        max_seq_length = engine.max_seq_length
    else:
        model_cfg = _default_model(encoding_dim=encoding_dim)
        vocab_size = model_cfg.src_tower.vocab_size
        params = init_params(jax.random.PRNGKey(0), model_cfg)
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(num_targets, encoding_dim)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        index = from_embeddings(
            emb,
            [f"t{i}" for i in range(num_targets)],
            [f"target {i}" for i in range(num_targets)],
            mesh,
        )

        class _NoVocab:  # bench drives the device path with raw tokens
            pass

        engine = QueryEngine(
            params,
            model_cfg,
            _NoVocab(),
            index,
            max_seq_length=max_seq_length,
            max_batch=batch,
            k=k,
        )

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(
        rng.integers(2, vocab_size, size=(batch, max_seq_length)), jnp.int32
    )
    lengths = jnp.full((batch,), max_seq_length, jnp.int32)

    fused = engine._fused
    emb_arr = engine.index.emb
    params = engine.params
    # warmup + compile
    v, i = fused(params, emb_arr, tokens, lengths)
    jax.block_until_ready((v, i))
    # Windowed timing: dispatch WINDOW async steps then drain, so the device
    # pipeline stays full but the queue depth stays bounded (a free-running
    # enqueue loop would race arbitrarily far ahead of the device).
    WINDOW = 8
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < seconds:
        for _ in range(WINDOW):
            v, i = fused(params, emb_arr, tokens, lengths)
        jax.block_until_ready((v, i))
        iters += WINDOW
    dt = time.perf_counter() - t0
    qps = iters * batch / dt
    return {
        "metric": "queries_per_sec_exact_topk",
        "value": round(qps, 1),
        "unit": f"qps (batch={batch}, k={k}, T={num_targets}, "
        f"D={encoding_dim}, L={max_seq_length})",
        "num_targets": num_targets,
        "batch": batch,
        "k": k,
        "iters": iters,
        "elapsed_sec": round(dt, 3),
    }


def run_index_bench(
    num_targets: int = 50_000,
    encoding_dim: int = 128,
    batch_size: int = 512,
    max_seq_length: int = 50,
    seconds: float = 5.0,
) -> Dict[str, Any]:
    """Index-build throughput: target-tower encode docs/sec (the
    sse_index.py stack, SURVEY.md §3.2)."""
    model_cfg = _default_model(encoding_dim=encoding_dim)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(
            2, model_cfg.src_tower.vocab_size, size=(batch_size, max_seq_length)
        ),
        jnp.int32,
    )
    lengths = jnp.full((batch_size,), max_seq_length, jnp.int32)

    from sse_tpu.models import sse as sse_mod

    @jax.jit
    def encode(p, t, l):
        return sse_mod.target_embeddings(p, model_cfg, tokens=t, lengths=l)

    jax.block_until_ready(encode(params, tokens, lengths))
    t0 = time.perf_counter()
    docs = 0
    out = None
    while time.perf_counter() - t0 < seconds:
        out = encode(params, tokens, lengths)
        docs += batch_size
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {
        "metric": "index_docs_per_sec",
        "value": round(docs / dt, 1),
        "unit": f"docs/sec (batch={batch_size}, L={max_seq_length})",
        "elapsed_sec": round(dt, 3),
    }
