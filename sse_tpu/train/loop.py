"""Train state + jitted train step + the outer training driver.

Reference call-stack parity (SURVEY.md §3.1): the whole hot-loop body —
both towers forward, similarity, softmax-negatives loss, backward, clipped
update — is ONE donated XLA program. The outer Python loop only feeds
batches, logs, checkpoints, evaluates every `steps_per_checkpoint`, and
applies the reference's plateau LR decay (decay `lr` by
`lr_decay_factor` when eval recall stops improving — the reference kept an
in-graph decayable learning_rate variable; here `lr` is a state leaf so it
checkpoints the same way).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sse_tpu.data.batching import Batch, BatchIterator
from sse_tpu.data.corpus import EncodedPairs, TargetSpace
from sse_tpu.models import sse
from sse_tpu.models.sse import NetworkMode, SSEConfig
from sse_tpu.train import losses as losses_lib
from sse_tpu.train.losses import LossConfig


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["params", "opt_state", "step", "lr", "ema_params"],
    meta_fields=[],
)
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar
    lr: jax.Array  # float32 scalar (plateau-decayed, checkpointed)
    # Polyak/EMA-averaged params (TrainConfig.ema_decay > 0); None when
    # averaging is off. Inference (eval/index/serving) uses these when
    # present — see inference_params().
    ema_params: Any = None


def inference_params(state: TrainState) -> Any:
    """The params every inference consumer (eval, index build, serving)
    should use: the EMA average when training keeps one, else the raw
    optimization params."""
    return state.params if state.ema_params is None else state.ema_params


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Reference flag-bundle analog (SURVEY.md §2.1 sse_main.py row)."""

    batch_size: int = 64  # global batch
    learning_rate: float = 0.5
    learning_rate_decay_factor: float = 0.9
    max_gradient_norm: float = 5.0
    optimizer: str = "adam"  # adam | sgd
    loss: LossConfig = LossConfig()
    steps_per_checkpoint: int = 100
    max_epochs: int = 10
    seed: int = 0
    # hard-negative mining cache refresh cadence (steps); only used when
    # loss.num_hard_negatives > 0 (see sse_tpu/train/losses.py)
    hard_negative_refresh: int = 500
    # >0: shuffle within windows of this many examples (memmap locality
    # for streaming corpora); 0 = full-corpus permutation
    shuffle_window: int = 0
    # >0: keep a Polyak/EMA average of params (decay per step, e.g.
    # 0.999) and use it for eval/index/serving — smooths SGD noise at
    # convergence (beyond-reference quality lever, measured on the hard
    # benchmark in BASELINE.md)
    ema_decay: float = 0.0
    # Which norm the per-step `grad_norm` metric reports (r5 tail
    # study, BASELINE.md): 'update' = the post-clip post-adam update
    # norm (r1-r4 behavior; costs ONE extra full-parameter-tree
    # reduction every step — measured -3.5% steps/s at B=256, noise at
    # B=1024), 'grad' = the raw gradient norm — the SAME reduction
    # clip_by_global_norm already computes, so XLA CSE makes it free —
    # or 'none' (metric reports 0; measurement use). Training math is
    # identical under all three; the metric is advisory (logged only).
    norm_metric: str = "grad"  # grad | update | none
    # Dispatch chaining (r4): run this many consecutive train steps as
    # ONE jitted program (lax.scan over pre-stacked packed batches) so
    # per-dispatch host/link overhead amortizes K-fold. Bit-identical to
    # single-step dispatch — the chain never crosses a checkpoint /
    # mining-refresh / epoch boundary (the loop clamps it), so logging,
    # plateau decay, and cache refresh semantics are unchanged. Measured
    # on the tunneled v5e: 624 -> 1367 steps/s at B=256/L=50 (the link
    # adds ~1 ms per dispatch; real hosts see a smaller but real win —
    # per-step launch overhead is never zero). 1 disables.
    steps_per_dispatch: int = 8


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Direction-only transform; the (decayable) lr multiplies updates in
    the step so plateau decay needs no opt_state rebuild."""
    base = (
        optax.scale_by_adam() if cfg.optimizer == "adam" else optax.identity()
    )
    return optax.chain(optax.clip_by_global_norm(cfg.max_gradient_norm), base)


def init_train_state(
    key: jax.Array, model_cfg: SSEConfig, cfg: TrainConfig
) -> TrainState:
    if not 0.0 <= cfg.ema_decay < 1.0:
        # d=1.0 would make the bias-corrected update 0/0 -> NaN from
        # step 1, silently poisoning every inference consumer
        raise ValueError(
            f"ema_decay must be in [0, 1), got {cfg.ema_decay}"
        )
    params = sse.init_params(key, model_cfg)
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        lr=jnp.asarray(cfg.learning_rate, jnp.float32),
        # the seed value is mathematically irrelevant (the bias-corrected
        # update gives it zero weight at t=1); a params-shaped copy just
        # fixes the pytree structure for sharding/checkpointing
        ema_params=jax.tree.map(jnp.array, params)
        if cfg.ema_decay > 0
        else None,
    )


def make_train_step(
    model_cfg: SSEConfig,
    cfg: TrainConfig,
    donate: bool = True,
    packed_width: Optional[int] = None,
    num_label_cols: int = 1,
    chain: int = 1,
) -> Callable[..., Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted train step.

    Signature of the returned fn:
        step_fn(state, src, src_len, labels, weight, tgt_tokens, tgt_lens
                [, tgt_emb_cache, labels_multi])
    `tgt_tokens`/`tgt_lens` are the full device-resident target space (tower
    modes gather candidates from them); pass zeros-shaped dummies in
    source-encoder-only mode. `labels_multi` ([B, M] -1-padded label
    sets, col 0 == labels) enables label-set-aware false-negative
    masking for multi-label train rows. Shardings follow the input
    arrays, so the same step runs single-chip or pjit-sharded over a
    mesh unchanged.

    With ``packed_width=L`` the returned fn instead takes ONE
    ``[B, L+3+(M-1)]`` int32 operand per batch (src | src_len | labels |
    bitcast weight | extra label cols, M = num_label_cols) and splits it
    inside the jit: the hot loop then does a single host→device upload
    per step instead of four — on high-latency links (tunneled runtimes,
    DCN-attached hosts) the per-transfer latency is what bounds an async
    training loop.
    """
    tx = make_optimizer(cfg)
    loss_cfg = cfg.loss
    base_key = jax.random.PRNGKey(cfg.seed)
    # Dropout keys come from a stream DISJOINT from the negative-sampling
    # stream (both fold in `step`; sharing base_key would correlate them).
    drop_base = jax.random.PRNGKey(cfg.seed ^ 0x0D0D0D)
    use_dropout = model_cfg.src_tower.dropout > 0 or (
        model_cfg.tgt_tower is not None and model_cfg.tgt_tower.dropout > 0
    )

    # Merged-scan fast path: in shared-encoder mode WITHOUT hard-negative
    # mining, the candidate rows don't depend on src_emb (mining does:
    # it scores src_emb against the cache), so source and candidate
    # batches can ride ONE tower scan of [B+C] rows instead of two
    # sequential ones. The recurrence is latency-bound (BASELINE.md
    # roofline: 4x rows ≈ 1.6x time), so halving the serialized chain
    # count is a step-time win — UP TO a row count: measured on v5e
    # (GRU h=128, sampled 128 negs), 640 merged rows = 1.17–1.21x
    # faster, but 2176 rows = 0.92x (the per-step matmul leaves the
    # latency-bound regime and two smaller scans pipeline better), so
    # the merge is gated at 1024 rows — conservative in the unmeasured
    # middle. Numerically identical when dropout is off (row-independent
    # masked scan; trailing pad columns are masked — the pad-trim
    # equality tests pin this); with dropout on, rows draw from one
    # merged stream instead of two (a different but equally valid
    # sample).
    merged_rows = 2 * cfg.batch_size + (
        loss_cfg.num_negatives if loss_cfg.kind == "sampled" else 0
    )
    merged_scan = (
        model_cfg.mode == NetworkMode.SHARED_ENCODER  # one weight set
        and loss_cfg.kind in ("inbatch", "sampled")
        and loss_cfg.num_hard_negatives == 0
        and merged_rows <= 1024
    )

    def _merged_loss(params, src, src_len, labels, weight, tgt_tokens,
                     tgt_lens, step, labels_multi, dropout_rng):
        cand_rows = labels
        if loss_cfg.kind == "sampled":
            key = jax.random.fold_in(base_key, step)
            negs = losses_lib.sample_negative_rows(
                key, tgt_tokens.shape[0], loss_cfg.num_negatives
            )
            cand_rows = jnp.concatenate([cand_rows, negs])
        ct = jnp.take(tgt_tokens, cand_rows, axis=0)
        cl = jnp.take(tgt_lens, cand_rows, axis=0)
        width = max(src.shape[1], ct.shape[1])
        pad = lambda t: jnp.pad(t, ((0, 0), (0, width - t.shape[1])))
        both = jnp.concatenate([pad(src), pad(ct)])
        emb = sse.encode_source(
            params, model_cfg, both,
            jnp.concatenate([src_len, cl]), dropout_rng=dropout_rng,
        )
        b = src.shape[0]
        return losses_lib.similarity_loss(
            loss_cfg, emb[:b], labels, weight,
            cand_emb=emb[b:], cand_rows=cand_rows,
            labels_multi=labels_multi,
        )

    def loss_fn(params, src, src_len, labels, weight, tgt_tokens, tgt_lens,
                step, tgt_emb_cache, labels_multi):
        d_src = d_tgt = None
        if use_dropout:
            d_src, d_tgt = jax.random.split(
                jax.random.fold_in(drop_base, step)
            )
        if merged_scan:
            return _merged_loss(
                params, src, src_len, labels, weight, tgt_tokens,
                tgt_lens, step, labels_multi, d_src,
            )
        src_emb = sse.encode_source(
            params, model_cfg, src, src_len, dropout_rng=d_src
        )
        if loss_cfg.kind == "full":
            tgt_all = sse.target_embeddings(params, model_cfg)
            return losses_lib.similarity_loss(
                loss_cfg, src_emb, labels, weight, tgt_all=tgt_all,
                labels_multi=labels_multi,
            )
        # inbatch / sampled: candidates = batch positives ∪ mined hard
        # negatives ∪ K uniform rows
        cand_rows = labels
        if loss_cfg.num_hard_negatives > 0 and tgt_emb_cache is not None:
            hard = losses_lib.mine_hard_negative_rows(
                src_emb, tgt_emb_cache, labels,
                loss_cfg.num_hard_negatives, labels_multi=labels_multi,
            )
            cand_rows = jnp.concatenate([cand_rows, hard])
        if loss_cfg.kind == "sampled":
            key = jax.random.fold_in(base_key, step)
            negs = losses_lib.sample_negative_rows(
                key, tgt_tokens.shape[0], loss_cfg.num_negatives
            )
            cand_rows = jnp.concatenate([cand_rows, negs])
        if model_cfg.mode == NetworkMode.SOURCE_ENCODER_ONLY:
            cand_emb = sse.target_embeddings(
                params, model_cfg, rows=cand_rows
            )
        else:
            cand_emb = sse.target_embeddings(
                params,
                model_cfg,
                tokens=jnp.take(tgt_tokens, cand_rows, axis=0),
                lengths=jnp.take(tgt_lens, cand_rows, axis=0),
                dropout_rng=d_tgt,
            )
        return losses_lib.similarity_loss(
            loss_cfg,
            src_emb,
            labels,
            weight,
            cand_emb=cand_emb,
            cand_rows=cand_rows,
            labels_multi=labels_multi,
        )

    def step_fn(state, src, src_len, labels, weight, tgt_tokens, tgt_lens,
                tgt_emb_cache=None, labels_multi=None):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params,
            src,
            src_len,
            labels,
            weight,
            tgt_tokens,
            tgt_lens,
            state.step,
            tgt_emb_cache,
            labels_multi,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if cfg.norm_metric == "update":
            gnorm = optax.global_norm(updates)
        elif cfg.norm_metric == "grad":
            # same subgraph clip_by_global_norm evaluates inside
            # tx.update → XLA CSE collapses the two, so this is free
            gnorm = optax.global_norm(grads)
        else:
            gnorm = jnp.zeros((), jnp.float32)
        params = jax.tree.map(
            lambda p, u: p - state.lr * u, state.params, updates
        )
        ema = state.ema_params
        if ema is not None:
            # BIAS-CORRECTED EMA (Adam-style), stored in corrected form:
            # the state always holds the exact d-weighted average of the
            # params seen so far, with ema_1 = params. A plain constant-d
            # average seeded at init keeps ~d^t of its weight on the INIT
            # params — a run shorter than the ~1/(1-d) horizon would
            # serve a near-untrained model (observed: recall 0.06 on an
            # 8-epoch demo run). The correction removes the init anchor
            # while keeping the full 1/(1-d) window on long runs (the
            # num-updates schedule tried first shrank the window to ~t/9
            # and measurably cost recall@10 — BASELINE.md).
            d = cfg.ema_decay
            t = state.step.astype(jnp.float32) + 1.0  # updates incl. this
            w_old = d * (1.0 - jnp.power(d, t - 1.0))
            denom = 1.0 - jnp.power(d, t)
            ema = jax.tree.map(
                lambda e, p: (w_old * e + (1.0 - d) * p) / denom,
                ema,
                params,
            )
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            lr=state.lr,
            ema_params=ema,
        )
        metrics = {"loss": loss, "accuracy": acc, "grad_norm": gnorm}
        return new_state, metrics

    if packed_width is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    l = packed_width
    extra = num_label_cols - 1

    def packed_step(state, packed, tgt_tokens, tgt_lens,
                    tgt_emb_cache=None):
        src = packed[:, :l]
        src_len = packed[:, l]
        labels = packed[:, l + 1]
        weight = jax.lax.bitcast_convert_type(
            packed[:, l + 2], jnp.float32
        )
        labels_multi = None
        if extra > 0:
            labels_multi = jnp.concatenate(
                [labels[:, None], packed[:, l + 3 : l + 3 + extra]], axis=1
            )
        return step_fn(
            state, src, src_len, labels, weight, tgt_tokens, tgt_lens,
            tgt_emb_cache, labels_multi,
        )

    if chain <= 1:
        return jax.jit(packed_step, donate_argnums=(0,) if donate else ())

    def chained_step(state, packed_k, tgt_tokens, tgt_lens,
                     tgt_emb_cache=None):
        """`chain` consecutive steps as ONE program: packed_k is
        [chain, B, W] (stacked pack_batch outputs), metrics are stacked
        [chain]-leading. Identical step sequence to `chain` single
        dispatches (asserted in tests/test_train_e2e.py)."""

        def body(st, pk):
            st, metrics = packed_step(
                st, pk, tgt_tokens, tgt_lens, tgt_emb_cache
            )
            return st, metrics

        return jax.lax.scan(body, state, packed_k)

    return jax.jit(chained_step, donate_argnums=(0,) if donate else ())


def pack_batch(batch: Batch) -> np.ndarray:
    """Fuse one batch into the single [B, L+3+(M-1)] int32 operand that
    the packed train step splits on device (see make_train_step)."""
    parts = [
        batch.src,
        batch.src_len[:, None],
        batch.labels[:, None],
        np.ascontiguousarray(batch.weight, np.float32)
        .view(np.int32)
        .reshape(-1, 1),
    ]
    if batch.labels_multi is not None and batch.labels_multi.shape[1] > 1:
        parts.append(batch.labels_multi[:, 1:])
    return np.concatenate(parts, axis=1)


def train(
    model_cfg: SSEConfig,
    cfg: TrainConfig,
    train_pairs: EncodedPairs,
    target_space: TargetSpace,
    *,
    eval_fn: Optional[Callable[[Any], Dict[str, float]]] = None,
    eval_metric: str = "recall@1",
    checkpoint_fn: Optional[
        Callable[[TrainState, int, Dict[str, Any]], None]
    ] = None,  # (state, step, metrics-record)
    log_fn: Optional[Callable[[Dict[str, Any]], None]] = None,
    state: Optional[TrainState] = None,
    process_index: int = 0,
    process_count: int = 1,
    mesh=None,  # Optional[jax.sharding.Mesh]; REQUIRED when process_count>1
) -> TrainState:
    """The reference's sse_main.train() analog (SURVEY.md §3.1).

    Multi-host (SURVEY.md §2.3): with ``process_count > 1`` each process
    feeds its per-host slice of the global batch (BatchIterator slices
    deterministically) and the slices are assembled into GLOBAL arrays
    over ``mesh`` — the jitted step is then one SPMD program across all
    hosts, grads reduced over ICI/DCN by XLA. Identical numerics to the
    single-process run on the same global batch (asserted by
    tests/test_multiprocess.py).
    """
    if state is None:
        state = init_train_state(
            jax.random.PRNGKey(cfg.seed), model_cfg, cfg
        )
    multi = process_count > 1
    if multi and mesh is None:
        raise ValueError("multi-process training requires a mesh")
    if multi:
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as _P

        def _batch_global(x):
            # per-process slice → one global array, rows over 'data'
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, _P("data")
            )

        def _replicated_global(x):
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, _P()
            )

        def _chain_global(x):  # [K, B_local, W] → rows (dim 1) over 'data'
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, _P(None, "data")
            )

    elif mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P2

        from sse_tpu.parallel import batch_sharding, replicated

        _bsh, _rep = batch_sharding(mesh), replicated(mesh)
        _csh = NamedSharding(mesh, _P2(None, "data"))
        _batch_global = lambda x: jax.device_put(jnp.asarray(x), _bsh)
        _replicated_global = lambda x: jax.device_put(jnp.asarray(x), _rep)
        _chain_global = lambda x: jax.device_put(jnp.asarray(x), _csh)
    else:
        _batch_global = _replicated_global = _chain_global = jnp.asarray
    lm = getattr(train_pairs, "labels_multi", None)
    step_fn = make_train_step(
        model_cfg,
        cfg,
        packed_width=train_pairs.src.shape[1],
        num_label_cols=1 if lm is None else int(lm.shape[1]),
    )
    chain_k = max(1, cfg.steps_per_dispatch)
    chain_fn = (
        make_train_step(
            model_cfg,
            cfg,
            packed_width=train_pairs.src.shape[1],
            num_label_cols=1 if lm is None else int(lm.shape[1]),
            chain=chain_k,
        )
        if chain_k > 1
        else None
    )
    it = BatchIterator(
        train_pairs,
        cfg.batch_size,
        seed=cfg.seed,
        process_index=process_index,
        process_count=process_count,
        shuffle_window=cfg.shuffle_window or None,
    )
    tgt_tokens = _replicated_global(target_space.tokens)
    tgt_lens = _replicated_global(target_space.lengths)

    # hard-negative mining: periodically refreshed target-embedding cache
    mine = cfg.loss.num_hard_negatives > 0 and cfg.loss.kind != "full"
    encode_cache = None
    tgt_emb_cache = None
    if mine:
        # tokens/lengths must be jit ARGUMENTS: a closed-over device array
        # becomes an HLO constant (GB-scale for big target spaces).
        if model_cfg.mode != NetworkMode.SOURCE_ENCODER_ONLY:
            encode_all = jax.jit(
                lambda p, t, l: sse.target_embeddings(
                    p, model_cfg, tokens=t, lengths=l
                )
            )
            encode_cache = lambda p: encode_all(p, tgt_tokens, tgt_lens)
        else:
            encode_cache = jax.jit(
                lambda p: sse.target_embeddings(p, model_cfg)
            )
        tgt_emb_cache = encode_cache(state.params)

    best = -float("inf")
    window_losses = []
    t0 = time.perf_counter()
    # Host-side step counter: the device `state.step` exists for
    # checkpoint/restore and the loss PRNG fold-in, but reading it back
    # every iteration (`int(state.step)`) would force a device round-trip
    # per step and defeat async dispatch — the loop would run at host
    # latency, not device throughput. The counter is deterministic
    # (one increment per step_fn call), so the host shadow is exact; the
    # only per-window sync is the loss-mean readback at checkpoints.
    step = int(state.step)  # ONE sync, before the hot loop
    # Resume semantics: a restored state's step count implies how many
    # epochs (and, since the iterator is deterministic in (seed, epoch),
    # how many batches WITHIN the current epoch) already ran — training
    # continues toward the SAME max_epochs target, skipping exactly the
    # batches already consumed. Mid-epoch resume matters at corpus scale:
    # a 10M-pair epoch is ~40k steps, and restarting it from batch 0
    # would retrain up to an epoch's worth of data.
    spe = max(it.steps_per_epoch, 1)
    start_epoch = min(step // spe, cfg.max_epochs)
    skip_batches = step % spe if start_epoch < cfg.max_epochs else 0
    def _boundaries(epoch):
        """Per-step boundary work (mining refresh, checkpoint window).
        With dispatch chaining the chunker clamps every chain at these
        boundaries, so checking once per chunk is step-exact."""
        nonlocal tgt_emb_cache, window_losses, best, state, t0
        if mine and step % cfg.hard_negative_refresh == 0:
            tgt_emb_cache = encode_cache(state.params)
        if step % cfg.steps_per_checkpoint == 0:
            mean_loss = float(
                jnp.mean(jnp.concatenate([jnp.ravel(x) for x in window_losses]))
            ) if window_losses else float("nan")
            window_losses = []
            record: Dict[str, Any] = {
                "step": step,
                "epoch": epoch,
                "loss": mean_loss,
                "lr": float(state.lr),
                "steps_per_sec": cfg.steps_per_checkpoint
                / max(time.perf_counter() - t0, 1e-9),
            }
            t0 = time.perf_counter()
            if eval_fn is not None:
                evals = eval_fn(inference_params(state))
                record.update(evals)
                score = evals.get(eval_metric, mean_loss)
                if score > best:
                    best = score
                else:  # reference plateau decay (SURVEY.md §3.1)
                    state = dataclasses.replace(
                        state,
                        lr=state.lr * cfg.learning_rate_decay_factor,
                    )
            if checkpoint_fn is not None:
                checkpoint_fn(state, step, record)
            if log_fn is not None:
                log_fn(record)

    for epoch in range(start_epoch, cfg.max_epochs):
        # skipping happens inside the iterator (index arithmetic on the
        # epoch's fixed permutation) — materializing ~skip_batches gathers
        # from a memmapped corpus just to discard them costs minutes at
        # 40k-step epochs
        start = skip_batches if epoch == start_epoch else 0
        batches = iter(it.epoch_batches(epoch, start=start))
        while True:
            # a chain must end exactly AT the next boundary, never cross
            # it — then chunk-granular boundary checks are step-exact
            room = chain_k
            if chain_k > 1:
                room = min(
                    room,
                    cfg.steps_per_checkpoint
                    - step % cfg.steps_per_checkpoint,
                )
                if mine:
                    room = min(
                        room,
                        cfg.hard_negative_refresh
                        - step % cfg.hard_negative_refresh,
                    )
            chunk = list(itertools.islice(batches, room))
            if not chunk:
                break
            if chain_fn is not None and len(chunk) == chain_k:
                packed = np.stack([pack_batch(b) for b in chunk])
                state, metrics = chain_fn(
                    state,
                    _chain_global(packed),  # ONE upload per chain
                    tgt_tokens,
                    tgt_lens,
                    tgt_emb_cache=tgt_emb_cache,
                )
                window_losses.append(metrics["loss"])  # [chain_k]
                step += chain_k
            else:  # epoch tail / boundary remainder / chaining off
                for batch in chunk:
                    state, metrics = step_fn(
                        state,
                        _batch_global(pack_batch(batch)),
                        tgt_tokens,
                        tgt_lens,
                        tgt_emb_cache=tgt_emb_cache,
                    )
                    window_losses.append(metrics["loss"])
                step += len(chunk)
            _boundaries(epoch)
    return state
