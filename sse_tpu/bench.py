"""Benchmark harness: query-path QPS and index-build docs/sec.

Measures the two north-star metrics (BASELINE.json: "queries/sec/chip
exact top-K; index docs/sec"). Timing method: the measured step runs
inside a jitted `lax.fori_loop` with an iteration-to-iteration data
dependency, at two different trip counts; per-iter time is the
difference quotient. This is robust against async/fire-ahead runtimes
where per-call `block_until_ready` timing lies (observed on tunneled
backends), and against result caching (each iteration's input differs).

All benchmark data is generated ON DEVICE (jax.random) — host→device
uploads of GB-scale arrays are not part of the measured path and can be
pathologically slow over tunneled links.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig, init_params, sse


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


def _device_index(num_targets: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Random L2-normalized index generated on device (no host upload)."""
    from sse_tpu.index.sharded_index import quantize_rows

    emb = jax.random.normal(
        jax.random.PRNGKey(0), (num_targets, dim), jnp.float32
    )
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    return quantize_rows(emb, dtype)


def _throughput_time(
    call, variants, seconds: float = 8.0, window: int = 32
) -> "tuple[float, float]":
    """Per-call seconds of `call(variant)` under steady pipelined load.

    Every dispatch uses a DISTINCT input (rotating `variants`) so runtimes
    that memoize (executable, args) can't serve cached results; windows of
    `window` async dispatches end in a blocking drain so the device queue
    stays bounded and each window's time covers all of its executions.

    Returns ``(best, mean)`` per-call seconds: `best` is the FASTEST
    window, `mean` the whole-stream average. The TPU here sits behind a
    proxied tunnel that injects multi-ms stalls unrelated to device
    execution (measured spread across 128 ms windows of identical work:
    17k-65k QPS within ONE process); a window is `window` consecutive
    real executions ending in a full drain, so its rate cannot exceed
    true device throughput — the best window is the device-capability
    number, the whole-stream mean measures the link. Report BOTH
    (r2 advisor): headline = best window, labeled as such.
    """
    def drain(out):
        # jax.device_get of the (small) result is the ONLY reliable
        # completion barrier on some proxied runtimes, where
        # block_until_ready acks the dispatch rather than the execution.
        jax.tree.map(lambda a: np.asarray(a).ravel()[0], out)

    out = call(variants[0])
    drain(out)  # compile + settle
    n = len(variants)
    t0 = time.perf_counter()
    vi = 1
    best = float("inf")
    dispatches = 0
    while time.perf_counter() - t0 < seconds:
        w0 = time.perf_counter()
        for _ in range(window):
            out = call(variants[vi % n])
            vi += 1
        drain(out)
        best = min(best, (time.perf_counter() - w0) / window)
        dispatches += window
    mean = (time.perf_counter() - t0) / max(dispatches, 1)
    return best, mean


# Public per-chip spec sheet numbers (bf16 peak TFLOP/s, HBM GB/s) for
# roofline context in bench artifacts (r2 verdict: report achieved GB/s /
# GFLOP/s / utilization next to QPS so the gap to hardware is tracked,
# not re-derived each round). Longest prefix wins ("TPU v5" must not
# shadow "TPU v5 lite").
_CHIP_SPECS = (
    ("TPU v5 lite", (197.0, 819.0)),  # v5e
    ("TPU v5p", (459.0, 2765.0)),
    ("TPU v5", (459.0, 2765.0)),
    ("TPU v4", (275.0, 1228.0)),
    ("TPU v6", (918.0, 1640.0)),  # trillium
)


def _chip_spec():
    kind = jax.devices()[0].device_kind
    for prefix, spec in _CHIP_SPECS:
        if kind.startswith(prefix):
            return spec
    return None


def _roofline_fields(
    per_iter: float, flops: float, hbm_bytes: float
) -> Dict[str, Any]:
    """Achieved GFLOP/s + GB/s and %-of-spec for a measured per-call time.

    `flops`/`hbm_bytes` are the MINIMUM algorithmic work/traffic models
    (not XLA's padded estimates), so utilization is honest-or-pessimistic."""
    out: Dict[str, Any] = {
        "achieved_gflops": round(flops / per_iter / 1e9, 1),
        "achieved_hbm_gbps": round(hbm_bytes / per_iter / 1e9, 1),
    }
    spec = _chip_spec()
    if spec is not None:
        peak_tflops, hbm_gbps = spec
        out["mfu_pct"] = round(
            100.0 * flops / per_iter / (peak_tflops * 1e12), 2
        )
        out["hbm_pct_of_spec"] = round(
            100.0 * hbm_bytes / per_iter / (hbm_gbps * 1e9), 1
        )
    return out


def run_query_bench(
    model_dir: Optional[str] = None,
    num_targets: int = 100_000,
    encoding_dim: int = 128,
    batch: int = 64,
    k: int = 10,
    seconds: float = 0.0,  # kept for CLI compat; unused by the loop method
    max_seq_length: int = 50,
    mesh=None,
    use_pallas: Optional[bool] = None,
    index_dtype=jnp.float32,
    iters: tuple = (4, 24),
) -> Dict[str, Any]:
    """End-to-end fused query path (token ids → encode → scores → exact
    top-k) queries/sec."""
    if model_dir:
        from sse_tpu.workspace import Workspace

        engine = Workspace.open(model_dir).engine(k=k, max_batch=batch)
        num_targets = engine.index.num_real
        model_cfg = engine.model_cfg
        params = engine.params
        emb = engine.index.emb
        vocab_size = model_cfg.src_tower.vocab_size
        max_seq_length = engine.max_seq_length
        fused = engine._fused
    else:
        model_cfg = _default_model(encoding_dim=encoding_dim)
        vocab_size = model_cfg.src_tower.vocab_size
        params = init_params(jax.random.PRNGKey(0), model_cfg)
        emb = _device_index(num_targets, encoding_dim, index_dtype)

        from sse_tpu.serve.engine import build_fused_query_fn

        fused = build_fused_query_fn(
            model_cfg,
            k=k,
            num_real=num_targets,
            mesh=mesh,
            use_pallas=use_pallas,
        )

    lengths = jnp.full((batch,), max_seq_length, jnp.int32)
    variants = [
        jax.random.randint(
            jax.random.PRNGKey(100 + i), (batch, max_seq_length), 2,
            vocab_size, dtype=jnp.int32,
        )
        for i in range(16)
    ]
    jax.block_until_ready(variants)

    per_iter, per_iter_mean = _throughput_time(
        lambda toks: fused(params, emb, toks, lengths), variants
    )
    qps = batch / per_iter
    d = model_cfg.encoding_dim
    tower = model_cfg.src_tower
    # minimum algorithmic work: scoring matmul + recurrent encode
    # (3-gate cell: input + hidden matmuls per step, both towers' other
    # costs are noise at serving shapes)
    encode_flops = (
        batch * max_seq_length * 2
        * (tower.embed_dim * 3 * tower.hidden + tower.hidden * 3 * tower.hidden)
        * tower.num_layers
        + batch * 2 * tower.hidden * d
    )
    flops = 2 * batch * num_targets * d + encode_flops
    hbm_bytes = num_targets * d * jnp.dtype(emb.dtype).itemsize
    out = {
        "metric": "queries_per_sec_exact_topk",
        "value": round(qps, 1),
        "unit": f"qps, best sustained window (batch={batch}, k={k}, "
        f"T={num_targets}, D={encoding_dim}, L={max_seq_length})",
        "num_targets": num_targets,
        "batch": batch,
        "k": k,
        "ms_per_batch": round(per_iter * 1000, 3),
        # whole-stream mean includes tunnel/link stalls (see
        # _throughput_time); on directly-attached hosts the two converge
        "qps_stream_mean": round(batch / per_iter_mean, 1),
        "ms_per_batch_stream_mean": round(per_iter_mean * 1000, 3),
    }
    out.update(_roofline_fields(per_iter, flops, hbm_bytes))
    return out


def run_train_bench(
    batch: int = 256,
    num_targets: int = 10_000,
    max_seq_length: int = 50,
    num_negatives: int = 128,
    encoding_dim: int = 128,
    chain: int = 8,
    embed_grad: str = "take",
    norm_metric: str = "grad",
    optimizer: str = "adam",
) -> Dict[str, Any]:
    """Training throughput: donated jitted train step (dual-encoder GRU,
    sampled-softmax negatives) steps/sec and examples/sec. Measures the
    REAL loop protocol (r4): fused Pallas recurrence (auto on TPU) +
    `chain`-step dispatch chaining (TrainConfig.steps_per_dispatch);
    the single-dispatch rate is reported alongside."""
    from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig
    from sse_tpu.train import LossConfig, TrainConfig, init_train_state, make_train_step

    tower = TowerConfig(
        vocab_size=8000, embed_dim=128, hidden=128, num_layers=1,
        encoding_dim=encoding_dim, cell="gru", embed_grad=embed_grad,
    )
    model_cfg = SSEConfig(
        mode=NetworkMode.DUAL_ENCODER, src_tower=tower, tgt_tower=tower
    )
    cfg = TrainConfig(
        batch_size=batch,
        loss=LossConfig(kind="sampled", num_negatives=num_negatives),
        steps_per_dispatch=chain,
        norm_metric=norm_metric,
        optimizer=optimizer,
    )
    state = init_train_state(jax.random.PRNGKey(0), model_cfg, cfg)
    step_fn = make_train_step(model_cfg, cfg, donate=False)

    tgt_tokens = jax.random.randint(
        jax.random.PRNGKey(1), (num_targets, max_seq_length), 2, 8000,
        dtype=jnp.int32,
    )
    tgt_lens = jnp.full((num_targets,), max_seq_length, jnp.int32)
    lengths = jnp.full((batch,), max_seq_length, jnp.int32)
    weight = jnp.ones((batch,), jnp.float32)
    variants = [
        (
            jax.random.randint(
                jax.random.PRNGKey(300 + i), (batch, max_seq_length), 2,
                8000, dtype=jnp.int32,
            ),
            jax.random.randint(
                jax.random.PRNGKey(400 + i), (batch,), 0, num_targets,
                dtype=jnp.int32,
            ),
        )
        for i in range(16)
    ]
    jax.block_until_ready(variants)

    def call(v):
        src, labels = v
        _, metrics = step_fn(
            state, src, lengths, labels, weight, tgt_tokens, tgt_lens
        )
        return metrics["loss"]

    single_iter, _ = _throughput_time(call, variants, seconds=5.0)

    if chain > 1:
        chain_fn = make_train_step(
            model_cfg, cfg, donate=False,
            packed_width=max_seq_length, chain=chain,
        )
        wcol = jax.lax.bitcast_convert_type(weight, jnp.int32)[:, None]
        packed_variants = []
        for i in range(4):
            rows = []
            for j in range(chain):
                src, labels = variants[(i * chain + j) % len(variants)]
                rows.append(
                    jnp.concatenate(
                        [src, lengths[:, None], labels[:, None], wcol],
                        axis=1,
                    )
                )
            packed_variants.append(jnp.stack(rows))
        jax.block_until_ready(packed_variants)

        def call_chain(pk):
            _, metrics = chain_fn(state, pk, tgt_tokens, tgt_lens)
            return metrics["loss"]

        best_c, mean_c = _throughput_time(
            call_chain, packed_variants, seconds=8.0
        )
        per_iter, per_iter_mean = best_c / chain, mean_c / chain
    else:
        per_iter, per_iter_mean = single_iter, single_iter
    # FLOP model of the step (fwd + ~2x bwd), minimum algorithmic work:
    # src tower over batch rows + tgt tower over (batch + num_negatives)
    # sampled rows, 3-gate recurrent cells, plus the [B, B+N] loss matmul.
    def tower_flops(rows, tw):
        return rows * max_seq_length * 2 * tw.num_layers * (
            tw.embed_dim * 3 * tw.hidden + tw.hidden * 3 * tw.hidden
        ) + rows * 2 * tw.hidden * encoding_dim
    fwd = (
        tower_flops(batch, model_cfg.src_tower)
        + tower_flops(batch + num_negatives, model_cfg.tgt_tower)
        + 2 * batch * (batch + num_negatives) * encoding_dim
    )
    flops = 3 * fwd  # bwd ≈ 2x fwd
    out = {
        "metric": "train_steps_per_sec",
        "value": round(1.0 / per_iter, 2),
        "examples_per_sec": round(batch / per_iter, 1),
        "unit": f"steps/sec, best sustained window (dual-encoder GRU, "
        f"batch={batch}, L={max_seq_length}, {num_negatives} sampled "
        f"negatives, fused Pallas recurrence, {chain}-step dispatch "
        f"chain)",
        "ms_per_step": round(per_iter * 1000, 3),
        "steps_per_sec_stream_mean": round(1.0 / per_iter_mean, 2),
        "steps_per_sec_single_dispatch": round(1.0 / single_iter, 2),
    }
    out.update(_roofline_fields(per_iter, flops, hbm_bytes=0))
    out.pop("achieved_hbm_gbps", None)  # no meaningful traffic floor here
    out.pop("hbm_pct_of_spec", None)
    return out


def run_index_bench(
    num_targets: int = 50_000,
    encoding_dim: int = 128,
    batch_size: int = 512,
    max_seq_length: int = 50,
    iters: tuple = (4, 16),
) -> Dict[str, Any]:
    """Index-build throughput: target-tower encode docs/sec (the
    sse_index.py stack, SURVEY.md §3.2)."""
    model_cfg = _default_model(encoding_dim=encoding_dim)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    vocab = model_cfg.src_tower.vocab_size
    lengths = jnp.full((batch_size,), max_seq_length, jnp.int32)
    variants = [
        jax.random.randint(
            jax.random.PRNGKey(200 + i), (batch_size, max_seq_length), 2,
            vocab, dtype=jnp.int32,
        )
        for i in range(16)
    ]
    jax.block_until_ready(variants)

    @jax.jit
    def encode(p, t, l):
        return sse.target_embeddings(p, model_cfg, tokens=t, lengths=l)

    per_iter, per_iter_mean = _throughput_time(
        lambda toks: encode(params, toks, lengths), variants
    )
    return {
        "metric": "index_docs_per_sec",
        "value": round(batch_size / per_iter, 1),
        "unit": f"docs/sec, best sustained window "
        f"(batch={batch_size}, L={max_seq_length})",
        "ms_per_batch": round(per_iter * 1000, 3),
        "docs_per_sec_stream_mean": round(batch_size / per_iter_mean, 1),
    }
