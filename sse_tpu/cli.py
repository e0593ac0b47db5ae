"""CLI: train | index | eval | serve | demo-data | bench.

Reference parity: sse_main.py's flag surface + mode dispatch
(SURVEY.md §2.1, §3.1) plus sse_index.py and webserver.py entry points,
unified. `demo-data` replaces the reference Makefile's dataset downloads
(unavailable here — SURVEY.md §6 risk note) with the synthetic corpora.

Usage:
    python -m sse_tpu.cli demo-data --task classification --out_dir data/
    python -m sse_tpu.cli train --task_type classification \
        --data_dir data/ --model_dir runs/clf
    python -m sse_tpu.cli index --model_dir runs/clf --data_dir data/
    python -m sse_tpu.cli eval  --model_dir runs/clf --data_dir data/
    python -m sse_tpu.cli serve --model_dir runs/clf --port 8080
    python -m sse_tpu.cli bench --model_dir runs/clf
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def _parse_bool(s: str) -> bool:
    if s.lower() in ("1", "true", "yes", "on"):
        return True
    if s.lower() in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {s!r}")


def _add_task_overrides(p: argparse.ArgumentParser) -> None:
    """Expose every TaskConfig field as a --flag (the reference's
    tf.app.flags surface)."""
    from sse_tpu.configs import TaskConfig

    for f in dataclasses.fields(TaskConfig):
        if f.name == "task_type":
            continue
        # NB: bare type=bool would make --flag False truthy
        typ = _parse_bool if f.type == "bool" or isinstance(f.default, bool) else type(f.default)
        p.add_argument(f"--{f.name}", type=typ, default=None)


def _build_cfg(args) -> "TaskConfig":
    from sse_tpu.configs import TaskConfig, preset

    overrides = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(TaskConfig)
        if f.name != "task_type"
        and getattr(args, f.name, None) is not None
    }
    return preset(
        args.task_type, recipe=getattr(args, "recipe", None), **overrides
    )


def cmd_demo_data(args) -> int:
    from sse_tpu.data import synthetic

    def val(name, easy_default, hard_default):
        v = getattr(args, name, None)
        return v if v is not None else (
            easy_default if args.profile == "easy" else hard_default
        )

    if args.profile == "scale":
        n = val("num_targets", 64, 10_000_000) or 10_000_000
        synthetic.write_scale_corpus(
            args.out_dir,
            num_targets=n,
            train_rows=args.train_per_target or 16_384,
            eval_rows=args.eval_per_target or 4_096,
            seed=args.seed,
        )
        print(f"[sse] wrote scale corpus ({n} targets) to {args.out_dir}")
        return 0
    if args.profile == "compositional":
        train, ev, targets = synthetic.make_compositional_corpus(
            task=args.task,
            num_targets=val("num_targets", 64, 2048),
            cluster_size=args.cluster_size or 8,
            train_per_target=val("train_per_target", 24, 32),
            eval_per_target=val("eval_per_target", 4, 2),
            seed=args.seed,
        )
    elif args.profile == "hard":
        train, ev, targets = synthetic.make_hard_corpus(
            task=args.task,
            num_targets=val("num_targets", 64, 2048),
            cluster_size=args.cluster_size or 16,
            train_per_target=val("train_per_target", 24, 8),
            eval_per_target=val("eval_per_target", 4, 2),
            train_multi_label_frac=args.train_multi_label_frac,
            seed=args.seed,
        )
    else:
        train, ev, targets = synthetic.make_corpus(
            task=args.task,
            num_targets=val("num_targets", 64, 2048),
            train_per_target=val("train_per_target", 24, 8),
            eval_per_target=val("eval_per_target", 4, 2),
            seed=args.seed,
        )
    synthetic.write_corpus(args.out_dir, train, ev, targets)
    print(
        f"[sse] wrote {len(train)} TrainPairs, {len(ev)} EvalPairs, "
        f"{len(targets)} targetIDs to {args.out_dir}"
    )
    return 0


def cmd_train(args) -> int:
    from sse_tpu.workspace import Workspace

    cfg_path = os.path.join(args.model_dir, "config.json")
    if args.task_type is not None:
        ws = Workspace.create(args.model_dir, _build_cfg(args))
    elif os.path.exists(cfg_path):
        ws = Workspace.open(args.model_dir)  # resume with saved config
        # explicitly-passed flags still apply on resume (the common case:
        # extending --max_epochs); they persist back into config.json
        from sse_tpu.configs import TaskConfig

        overrides = {
            f.name: getattr(args, f.name)
            for f in dataclasses.fields(TaskConfig)
            if f.name != "task_type"
            and getattr(args, f.name, None) is not None
        }
        if overrides:
            ws = Workspace.create(
                args.model_dir, dataclasses.replace(ws.cfg, **overrides)
            )
    else:
        print("error: new model_dir needs --task_type", file=sys.stderr)
        return 2
    if getattr(args, "profile_dir", None):
        # device trace of the whole run, viewable in TensorBoard/Perfetto
        from sse_tpu.utils import trace

        with trace(args.profile_dir):
            final = ws.train(args.data_dir)
    else:
        final = ws.train(args.data_dir)
    print("[sse] final eval: " + json.dumps(final))
    return 0


def cmd_index(args) -> int:
    from sse_tpu.workspace import Workspace

    ws = Workspace.open(args.model_dir)
    if args.index_dtype:
        # transient override: rebuild an existing model's index at a
        # different precision (e.g. int8 for 4x rows/chip) without
        # retraining; the saved config is NOT rewritten — the built
        # index carries its dtype in its own sidecar
        import dataclasses as _dc

        ws.cfg = _dc.replace(ws.cfg, index_dtype=args.index_dtype)
    t0 = time.perf_counter()
    phases: dict = {}
    index = ws.build_index(
        args.data_dir, export_tsv=args.export_tsv, capacity=args.capacity,
        phase_times=phases, cp_shards=args.cp_shards,
    )
    dt = time.perf_counter() - t0
    breakdown = " ".join(f"{k}={v:.1f}s" for k, v in phases.items())
    print(
        f"[sse] built index: {index.num_real} targets, dim {index.dim}, "
        f"{index.num_real / dt:.1f} docs/sec → {ws.index_dir}\n"
        f"[sse] index phases: {breakdown} "
        f"(encode-only rate {index.num_real / max(phases.get('encode', dt), 1e-9):.1f} docs/sec)"
    )
    return 0


def cmd_eval(args) -> int:
    from sse_tpu.workspace import Workspace

    ws = Workspace.open(args.model_dir)
    if args.use_index:
        # score through the serving path (built sharded index + fused
        # kernel) — the right mode at large target-space scale
        from sse_tpu.evals import evaluate_against_index
        from sse_tpu.index import ShardedIndex

        from sse_tpu.train import inference_params

        vocab, tspace, _, eval_pairs = ws.prepare_data(args.data_dir)
        model_cfg = ws.model_config(vocab, tspace)
        state, mgr = ws.restore_state(model_cfg)
        mgr.close()
        index = ShardedIndex.load(ws.index_dir, ws.mesh())
        result = evaluate_against_index(
            inference_params(state), model_cfg, eval_pairs, index
        )
    else:
        result = ws.evaluate(args.data_dir)
    print("[sse] " + json.dumps(result))
    return 0


def cmd_visualize(args) -> int:
    """Export target embeddings in TensorBoard-projector TSV format
    (the reference main()'s visualize mode analog — SURVEY.md §2.1)."""
    from sse_tpu.index import ShardedIndex
    from sse_tpu.workspace import Workspace

    import numpy as np

    ws = Workspace.open(args.model_dir)
    if os.path.isdir(ws.index_dir):
        index = ShardedIndex.load(ws.index_dir)
    elif args.data_dir:
        index = ws.build_index(args.data_dir)
    else:
        print("error: no built index; pass --data_dir", file=sys.stderr)
        return 2
    os.makedirs(args.out_dir, exist_ok=True)
    emb = np.asarray(index.emb)[: index.num_real]
    with open(os.path.join(args.out_dir, "tensors.tsv"), "w") as f:
        for row in emb:
            f.write("\t".join(f"{v:.6f}" for v in row) + "\n")
    with open(
        os.path.join(args.out_dir, "metadata.tsv"), "w", encoding="utf-8"
    ) as f:
        f.write("targetId\ttargetText\n")
        for tid, text in zip(index.ids, index.texts):
            f.write(f"{tid}\t{text}\n")
    print(
        f"[sse] wrote {emb.shape[0]}x{emb.shape[1]} embeddings to "
        f"{args.out_dir}/tensors.tsv (+ metadata.tsv) — load in the "
        "TensorBoard Embedding Projector"
    )
    return 0


def cmd_serve(args) -> int:
    from sse_tpu.serve import serve_http
    from sse_tpu.workspace import Workspace

    ws = Workspace.open(args.model_dir)
    if not os.environ.get("SSE_COMPILATION_CACHE"):
        # persistent XLA cache under the model_dir: server restarts (and
        # /api/reload engine rebuilds) skip the cold serving-program
        # compile — minutes on remote-compile runtimes
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(ws.model_dir, "xla_cache"),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    engine = ws.engine(
        data_dir=args.data_dir,
        k=args.k,
        max_batch=args.max_batch,
        bulk_batch=args.bulk_batch or None,
    )
    print("[sse] warming serving programs ...", flush=True)
    dt = engine.warmup()
    print(
        f"[sse] serving {engine.index.num_real} targets "
        f"on http://{args.host}:{args.port}  (warmup {dt:.1f}s; "
        "Ctrl-C to stop)",
        flush=True,
    )
    serve_http(
        engine,
        host=args.host,
        port=args.port,
        index_dir=ws.index_dir,
        model_dir=ws.model_dir,
    )
    return 0


def cmd_bench(args) -> int:
    from sse_tpu import bench as bench_lib

    if args.kind == "query":
        import jax.numpy as jnp

        result = bench_lib.run_query_bench(
            model_dir=args.model_dir,
            num_targets=args.num_targets,
            encoding_dim=args.encoding_dim,
            batch=args.batch or 64,
            k=args.k,
            index_dtype={
                "bfloat16": jnp.bfloat16, "int8": jnp.int8
            }.get(args.index_dtype, jnp.float32),
        )
    elif args.kind == "index":
        result = bench_lib.run_index_bench(
            num_targets=args.num_targets,
            encoding_dim=args.encoding_dim,
            batch_size=args.batch or 512,
        )
    else:
        result = bench_lib.run_train_bench(
            num_targets=args.num_targets,
            encoding_dim=args.encoding_dim,
            batch=args.batch or 256,
        )
    print(json.dumps(result))
    return 0


def _apply_platform_env() -> None:
    """SSE_PLATFORM=cpu[:N] — force backend before first jax use (this
    environment's TPU plugin ignores JAX_PLATFORMS, but honors jax.config).
    SSE_COMPILATION_CACHE=<dir> — persistent XLA compilation cache, so
    serve/eval cold-starts skip the 20-40s first-compile on restarts."""
    cache = os.environ.get("SSE_COMPILATION_CACHE")
    spec = os.environ.get("SSE_PLATFORM")
    if not (cache or spec):
        return
    import jax

    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if spec:
        platform, _, n = spec.partition(":")
        jax.config.update("jax_platforms", platform)
        if n:
            jax.config.update("jax_num_cpu_devices", int(n))


def _add_dist_flags(p) -> None:
    """Multi-host bring-up (SURVEY.md §2.3): one process per host. On TPU
    pods with standard env vars all three auto-detect — pass
    --num_processes alone to opt in. Env fallbacks: SSE_COORDINATOR,
    SSE_NUM_PROCESSES, SSE_PROCESS_ID."""
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (process 0's)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def _maybe_init_distributed(args) -> None:
    coord = getattr(args, "coordinator", None) or os.environ.get(
        "SSE_COORDINATOR"
    )
    nproc = getattr(args, "num_processes", None)
    if nproc is None and os.environ.get("SSE_NUM_PROCESSES"):
        nproc = int(os.environ["SSE_NUM_PROCESSES"])
    pid = getattr(args, "process_id", None)
    if pid is None and os.environ.get("SSE_PROCESS_ID"):
        pid = int(os.environ["SSE_PROCESS_ID"])
    if (nproc and nproc > 1) or coord:
        from sse_tpu.parallel import distributed

        distributed.initialize(coord, nproc, pid)


def main(argv=None) -> int:
    _apply_platform_env()
    parser = argparse.ArgumentParser(prog="sse_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("demo-data", help="generate synthetic demo corpora")
    p.add_argument(
        "--task",
        default="classification",
        choices=["classification", "ranking", "crosslingual", "qna"],
    )
    p.add_argument("--out_dir", required=True)
    p.add_argument("--num_targets", type=int, default=None)
    p.add_argument("--train_per_target", type=int, default=None)
    p.add_argument("--eval_per_target", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--profile",
        default="easy",
        choices=["easy", "hard", "compositional", "scale"],
        help="easy: r1 demo corpora (saturate at recall 1.0); hard: the "
        "discriminative benchmark (confusable clusters, Zipf words, "
        "multi-label eval rows — recall@1 ceiling 0.7795); "
        "compositional: the ORDER-SENSITIVE benchmark (siblings share "
        "identical word bags, signal lives in word order — a BoW scorer "
        "is at 1/cluster_size within the cluster); scale: 10M+ "
        "targets streamed to disk for index/serving capstones "
        "(--train_per_target/--eval_per_target become absolute row "
        "counts)",
    )
    p.add_argument(
        "--cluster_size", type=int, default=None,
        help="targets per confusable cluster (default: 16 hard, "
        "8 compositional)",
    )
    p.add_argument(
        "--train_multi_label_frac", type=float, default=0.0,
        help="hard profile: fraction of TRAIN rows that are ambiguous "
        "multi-label (matches the eval distribution; exercises the "
        "label-set-aware loss masking)",
    )
    p.set_defaults(fn=cmd_demo_data)

    p = sub.add_parser("train", help="train a model (reference: sse_main train)")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--model_dir", required=True)
    p.add_argument(
        "--task_type",
        default=None,
        choices=["classification", "ranking", "crosslingual", "qna"],
    )
    p.add_argument(
        "--recipe",
        default=None,
        choices=["compositional", "transformer"],
        help="named measured-config bundle applied on top of the task "
        "preset (configs.RECIPES; explicit flags still win): "
        "'compositional' = 3-layer residual LSTM lr 3e-3 dropout 0.1 "
        "(95-96%% of the Bayes ceiling on all four compositional "
        "tasks), 'transformer' = 4-layer RoPE lr 1e-3 (BASELINE.md)",
    )
    _add_task_overrides(p)
    _add_dist_flags(p)
    p.add_argument(
        "--profile_dir", default=None,
        help="capture a jax.profiler device trace of the run "
        "(TensorBoard/Perfetto) into this directory",
    )
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("index", help="build the target index (reference: sse_index)")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--export_tsv", default=None, help="also write reference-format TSV")
    p.add_argument(
        "--capacity", type=int, default=None,
        help="reserve index rows for live POST /api/add growth",
    )
    p.add_argument(
        "--index_dtype", default=None,
        choices=["float32", "bfloat16", "int8"],
        help="override the trained config's index precision for THIS "
        "build (e.g. int8 = 4x rows/chip) without retraining",
    )
    p.add_argument(
        "--cp_shards", type=int, default=0,
        help="encode each target document with CONTEXT PARALLELISM over "
        "this many devices (transformer towers, mean readout): shards "
        "the sequence dim over a dedicated {'seq'} mesh so documents "
        "longer than one chip's attention budget still index",
    )
    p.set_defaults(fn=cmd_index)

    p = sub.add_parser("eval", help="top-N recall eval (reference: sse_evaluator)")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument(
        "--use_index", action="store_true",
        help="score via the built sharded index + serving kernel",
    )
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser(
        "visualize",
        help="export embeddings for the TensorBoard projector "
        "(reference: visualize mode)",
    )
    p.add_argument("--model_dir", required=True)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--out_dir", required=True)
    p.set_defaults(fn=cmd_visualize)

    p = sub.add_parser("serve", help="HTTP query serving (reference: webserver)")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--k", type=int, default=10)
    p.add_argument(
        "--max_batch", type=int, default=8,
        help="low-latency device batch tier (interactive queries pad to "
        "this; micro-batcher coalesces up to it under load)",
    )
    p.add_argument(
        "--bulk_batch", type=int, default=256,
        help="second warmed batch tier for bulk POST traffic "
        "(0 disables; interactive queries keep the low-latency tier)",
    )
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("bench", help="throughput microbenchmarks")
    p.add_argument(
        "--kind", default="query", choices=["query", "index", "train"]
    )
    p.add_argument("--model_dir", default=None)
    p.add_argument("--num_targets", type=int, default=100_000)
    p.add_argument("--encoding_dim", type=int, default=128)
    p.add_argument("--batch", type=int, default=None)  # per-kind default
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument(
        "--index_dtype", default="float32",
        choices=["float32", "bfloat16", "int8"],
        help="query bench: index storage precision (serving flagship "
        "uses bfloat16)",
    )
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    _maybe_init_distributed(args)  # before first backend touch
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
